"""Stateless streaming twins: per-row transforms that need no state
store — the Spark-native form is a narrow in-row plan that runs
unchanged under a streaming source in append mode (no watermark, no
shuffle, restart-safe by construction because output is a pure
function of each input row)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def decontaminate_stream(
    df: DataFrame,
    eval_set: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """Streaming twin of :func:`file_d_spark.functions.corpus.
    decontaminate`: flag streamed documents sharing any word n-gram
    with the eval set, emitting ``(id, n_hits, contaminated)`` per
    document — BIT-IDENTICAL to the batch operator over the same rows
    (both count DISTINCT shared n-grams; ``array_intersect`` here is
    set-semantics like the batch ``array_distinct`` + digest
    semi-join + count).

    Shape: the eval side is collapsed to its distinct xxhash64 gram
    digests AT PLAN BUILD — a bounded driver model, the same envelope
    as the batch operator's broadcast (benchmarks are MBs at any
    corpus scale; inventoried in SCALE.md "Driver-side state") —
    shipped as ONE broadcast one-row frame.  The stream side is a
    narrow in-row pass: tokenize, n-gram, hash, intersect.  No state,
    no watermark, no shuffle — append mode, trivially restart-safe
    (contrast the stateful twins, which checkpoint their stores).

    Cost envelope: ``array_intersect`` hashes one side per row, so
    per-row work is O(|doc grams| + |eval digests|).  That suits the
    streaming regime (eval sets are 10^4-10^6 grams, stream rates are
    bounded); the BULK path over a 100 TB corpus stays the batch
    operator's broadcast-hash semi-join, which amortizes the eval set
    across a whole scan instead of per row."""
    from file_d_spark.functions.corpus import _ngram_col, tokens

    grams = F.array_distinct(_ngram_col(tokens(F.col(text_col)), n))
    digests = F.transform(grams, lambda g: F.xxhash64(g))

    eval_digests = [
        r[0]
        for r in eval_set.select(
            F.explode(
                F.array_distinct(_ngram_col(tokens(F.col(text_col)), n))
            ).alias("g")
        )
        .select(F.xxhash64("g").alias("d"))
        .distinct()
        .collect()
    ]
    model = df.sparkSession.createDataFrame(
        [(sorted(eval_digests),)], "__eval__ array<bigint>"
    )
    # null text: batch drops the null gram row from hits and the spine
    # left-join coalesces to (0, false) — mirror with a coalesce here,
    # or size(null) would emit null n_hits; cast long = batch's count
    hits = F.coalesce(
        F.size(F.array_intersect(digests, F.col("__eval__"))), F.lit(0)
    ).cast("long")
    return (
        df.crossJoin(F.broadcast(model))
        .select(
            F.col(id_col),
            hits.alias("n_hits"),
            (hits > 0).alias("contaminated"),
        )
    )
