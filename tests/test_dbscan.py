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


def _sf():
    from conftest import SF_DIR  # single source of the fixture path

    return SF_DIR


def test_banded_pairs_equal_exact_at_fixture_scale(spark):
    """banded_cosine_pairs is the 100 TB candidate generator for the
    eps-neighbor relation: in the RECALL-COMPLETE parity regime
    (per_band=1 — 16 bands x 1 bit, passed explicitly since r12's
    defaults are the pruning 48/12 regime) a pair at cosine >= 0.35
    escapes every band with P < 1e-6, so at fixture scale the banded
    pair set must EQUAL the exact one — same ids, same rounded
    sims."""
    from file_d_spark.functions.similarity import (
        banded_cosine_pairs,
        cosine_pairs,
    )

    e = spark.read.parquet(f"{_sf()}/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b): r.sim
        for r in cosine_pairs(e, 0.35).collect()
    }
    banded = {
        (r.id_a, r.id_b): r.sim
        for r in banded_cosine_pairs(
            e, 0.35, dim=64, planes=16, bands=16
        ).collect()
    }
    assert exact, "fixture produced no qualifying pairs"
    assert banded == exact


def test_dbscan_banded_pairs_fn_matches_exact(spark):
    """The pairs_fn seam: dbscan over LSH-banded candidates in the
    recall-complete parity regime (per_band=1, passed explicitly) must
    label every node exactly like the default exact generator (banding
    is complete at the fixture's eps — previous test)."""
    from file_d_spark.functions.similarity import banded_cosine_pairs

    e = spark.read.parquet(f"{_sf()}/embeddings.parquet")
    want = {
        r.vec_id: (r.cluster_id, r.role)
        for r in dbscan_clusters(e, eps_sim=0.35, min_pts=3).collect()
    }
    got = {
        r.vec_id: (r.cluster_id, r.role)
        for r in dbscan_clusters(
            e,
            eps_sim=0.35,
            min_pts=3,
            pairs_fn=lambda c: banded_cosine_pairs(
                c, 0.35, dim=64, planes=16, bands=16
            ),
        ).collect()
    }
    assert len({v[0] for v in want.values()}) > 1, "degenerate fixture"
    assert got == want


def test_banded_pairs_always_subset_of_exact(spark):
    """Invariant, not a recall claim: whatever the banding parameters,
    every banded pair must appear in the exact pair set WITH THE SAME
    rounded sim (candidates are exact-reranked, so false positives are
    impossible; only misses are).  Random corpus, fixed seed; a
    selective parameterization (few bands, many bits) guarantees some
    misses so the test can't silently degenerate into the equality
    case."""
    import numpy as np

    from file_d_spark.functions.similarity import (
        banded_cosine_pairs,
        cosine_pairs,
    )

    rng = np.random.default_rng(7)
    dim, n = 16, 120
    base = rng.normal(size=(8, dim))
    rows = []
    for i in range(n):
        # cluster around 8 anchors so plenty of pairs clear 0.6
        v = base[i % 8] + 0.35 * rng.normal(size=dim)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r.id_a, r.id_b): r.sim for r in cosine_pairs(df, 0.6).collect()
    }
    banded = {
        (r.id_a, r.id_b): r.sim
        for r in banded_cosine_pairs(
            df, 0.6, dim=dim, planes=16, bands=2  # 8-bit bands: selective
        ).collect()
    }
    assert exact, "fixture produced no qualifying pairs"
    assert set(banded) <= set(exact)
    assert all(banded[k] == exact[k] for k in banded)
    # STRICT subset — the selective parameterization must actually
    # miss pairs, or this degenerates into the equality test above
    assert set(banded) != set(exact), "banding missed nothing; not selective"
