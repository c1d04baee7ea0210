"""Distributed graph centrality for corpus curation.

PageRank over an edge frame — the canonical-document selector for a
near-duplicate graph (rank the dup-cluster members by centrality,
keep the hub) and the link-graph quality prior a web-scale corpus
pipeline feeds into its quality mix (OPIC/Common-Crawl-style).

All arithmetic is FIXED-POINT bigint (the kmeans/bpe discipline):
ranks live at 1e9 scale, per-edge contributions use truncating
integer division (Spark ``div`` == DuckDB ``//`` on the positive
values that occur here), and the damping step is ``85 * s div 100``
— every intermediate is exact, so any engine that runs the same
unrolled iterations reproduces the ranks bit-for-bit regardless of
shuffle or summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000
BASE = 150_000_000  # (1 - 0.85) * SCALE


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Damped PageRank (d = 0.85) in exact fixed-point arithmetic.

    ``edges`` is a (src, dst) frame; parallel edges act as weights
    (each occurrence contributes ``rank div out_degree`` where the
    degree counts multiplicity).  Uses the unnormalized per-node
    teleport formulation (every node gets 0.15 base mass; dangling
    mass is dropped, the standard simplification).  Returns
    (node, rank) with rank descaled to a double, rounded to 6.

    Scale shape: each iteration is one keyed equi-join
    (edges ⋈ ranks on src) and one dst-keyed aggregation — the
    minimum data motion PageRank admits.  The degree join is computed
    once and folded INTO the edge frame so iterations reuse one
    pre-joined frame; ranks are the only frame that changes per round.
    Iterations are plan-unrolled (a few rounds suffice for a quality
    prior; convergence-loop variants should localCheckpoint ranks
    every few rounds to cut lineage).  At extreme node counts shrink
    SCALE so ``85 * sum(contrib)`` stays inside int64.

    The loop-invariant ``nodes``/``e_deg`` frames are deliberately NOT
    cached here: at bench scale recomputing them per iteration beats
    the cache's materialization barriers (r13 A/B: 1.88 s vs 2.72 s
    min at sf0.1).  When ``edges`` derives from an expensive subtree
    (a windowed event stream, a 100 TB join), pass a checkpointed /
    pre-materialized edge frame instead — each unrolled iteration
    re-executes the edge lineage once per reference otherwise.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # degree folded into the edge frame once; every iteration reuses it
    e_deg = e.join(deg, "src")
    ranks = nodes.select("node", F.lit(SCALE).cast("long").alias("rank_fp"))
    for _ in range(iters):
        contribs = (
            e_deg.join(ranks, e_deg["src"] == ranks["node"])
            .select(
                "dst",
                F.expr("rank_fp div out_deg").alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(BASE).cast("long")
                    + F.expr("(85 * coalesce(s, 0)) div 100")
                ).alias("rank_fp"),
            )
        )
    return ranks.select(
        "node",
        F.round(F.col("rank_fp").cast("double") / F.lit(float(SCALE)), 6).alias(
            "rank"
        ),
    )
