"""dbscan_clusters: hand-constructed core/border/noise fixture.

Five 2-d vectors at eps_sim=0.9, min_pts=3: A,B,C mutually within the
cosine neighborhood (all core, one cluster labelled min id), D inside
only A's neighborhood (border, attaches to A's cluster), E orthogonal
to everything (noise, cluster -1).  Checked against the worked-out
expectation, independent of the DuckDB oracle mirror.
"""

from pyspark.sql import types as T

from file_d_spark.functions.similarity import dbscan_clusters

VECS = [
    (1, [1.0, 0.0]),      # A: neighbors B, C, D -> core
    (2, [0.95, 0.31]),    # B: neighbors A, C    -> core
    (3, [0.9, 0.43]),     # C: neighbors A, B    -> core
    (4, [0.95, -0.31]),   # D: neighbor A only   -> border of A's cluster
    (5, [0.0, 1.0]),      # E: no neighbors      -> noise
]

EXPECTED = {
    1: (1, "core"),
    2: (1, "core"),
    3: (1, "core"),
    4: (1, "border"),
    5: (-1, "noise"),
}


def test_dbscan_hand_fixture(spark):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame(VECS, schema)
    got = {
        r["vec_id"]: (r["cluster_id"], r["role"])
        for r in dbscan_clusters(df, eps_sim=0.9, min_pts=3).collect()
    }
    assert got == EXPECTED
