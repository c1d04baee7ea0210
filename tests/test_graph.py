"""graph.pagerank: hand-computed fixed-point fixture.

Covers parallel edges acting as weights (A->B twice), a dangling node
(E: inbound only, its mass drops), a no-inbound node (D: base mass
only), and two exact iterations worked by hand in the 1e9 fixed-point
arithmetic — independent of the DuckDB oracle mirror, so an
identical-on-both-sides mistake cannot hide here.
"""

from pyspark.sql import types as T

from file_d_spark.functions.graph import pagerank

EDGES = [
    ("A", "B"), ("A", "B"), ("B", "C"), ("B", "E"),
    ("C", "A"), ("D", "A"),
]

# iter1: s(A)=2e9, s(B)=1e9, s(C)=s(E)=5e8, s(D)=0
#   -> r1 = {A:1.85e9, B:1.0e9, C:5.75e8, D:1.5e8, E:5.75e8}
# iter2: s(A)=575e6+150e6=725e6, s(B)=2*(1.85e9 div 2)=1.85e9,
#        s(C)=s(E)=1e9 div 2=5e8, s(D)=0
#   -> r2 = {A:766.25e6, B:1.7225e9, C:5.75e8, D:1.5e8, E:5.75e8}
EXPECTED = {"A": 0.76625, "B": 1.7225, "C": 0.575, "D": 0.15, "E": 0.575}


def test_pagerank_hand_fixture(spark):
    schema = T.StructType(
        [T.StructField("src", T.StringType()), T.StructField("dst", T.StringType())]
    )
    edges = spark.createDataFrame(EDGES, schema)
    got = {r["node"]: r["rank"] for r in pagerank(edges, iters=2).collect()}
    assert got == EXPECTED
