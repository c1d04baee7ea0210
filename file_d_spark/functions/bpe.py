"""Byte-pair-encoding tokenizer: corpus-trained merges + application.

A training-data pipeline needs token counts from the ACTUAL tokenizer
family it feeds (sequence packing, token budgets, fertility audits) —
a regex proxy drifts on exactly the high-frequency words BPE
compresses.  This module trains a small merge table on the corpus and
re-tokenizes with it, using the fixed-point iterative shape proven by
kmeans_embeddings: per round, ONE keyed aggregation over a bounded
frame produces the statistics, the driver only picks an argmax, and
the pick is broadcast back — nothing corpus-sized ever reaches the
driver.

Scale shape
-----------
* The corpus contributes exactly ONE word-histogram shuffle
  (explode → groupBy(word)); training then runs on the bounded
  top-``vocab_size`` slice of it (classic BPE trains on the word
  histogram, not on running text).
* Each merge round is a pair-count groupBy over that bounded vocab
  frame (V rows, ≤ V·max_word_len pairs) + a driver top-1 + one
  ``replace`` projection.  The vocab frame is checkpointed ONCE (and
  collapsed to a single partition) below; each round then adds only a
  tiny nested replace to the lineage.  Rounds are O(num_merges) tiny
  jobs — the 100 TB corpus is NOT rescanned per round.
* Application is a broadcast join of the trained (word → segmentation)
  map against exploded corpus words, with a character-split fallback
  for out-of-vocabulary words — one narrow corpus pass, one keyed
  aggregate back to documents.

Engine portability (the oracle contract): segmentations are strings
joined by the unit separator chr(31); a merge of pair (a, b) runs
over a BOUNDARY-DECORATED rendering — symbols joined by a double
separator with double-separator sentinels at both ends — replacing
``SEP+a+SEP+SEP+b+SEP`` with ``SEP+ab+SEP`` and collapsing back.
Anchoring both symbols between separators means a merged symbol can
never be split by a later merge (a plain ``replace(seg, a+SEP+b,
a+b)`` merges (xa, b) when asked for (a, b) — the seg ``xa␟b``
contains the substring ``a␟b``), and because each replacement leaves
one separator on each side, consecutive matches re-form each other's
boundaries: one left-to-right non-overlapping replace IS greedy
left-to-right BPE merge application (model-checked exhaustively in
test_bpe.py: all ≤4-symbol sequences over a 6-symbol
boundary-adversarial alphabet, plus all 5-6-symbol sequences over the
chain-adversarial {a, b, aa}).  Replace semantics are
identical in Spark and DuckDB, so the whole iterative train+apply is
bit-checkable against SQL with the merge rounds unrolled as CTEs
(the kmeans oracle pattern).  Ties in pair frequency break on
(count DESC, a ASC, b ASC) — plain ASCII compare, identical in both
engines because words are restricted to [a-z]+.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: symbol separator inside a segmentation string — cannot collide with
#: the [a-z]-only symbol alphabet
SEP = chr(31)


def word_histogram(df: DataFrame, text_col: str) -> DataFrame:
    """(w, f) frequency of lowercase latin words — the one corpus
    shuffle of the whole train pipeline."""
    words = F.split(F.lower(F.col(text_col)), "[^a-z]+")
    return (
        df.select(F.explode(words).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )


def _char_seg(col):
    return F.array_join(F.split(col, ""), SEP)


def _apply_merge(seg_col, a: str, b: str):
    """One merge round over a segmentation string, symbol-boundary
    anchored (see the module docstring): decorate with double
    separators, replace the bounded pair, collapse back."""
    decorated = F.concat(
        F.lit(SEP * 2),
        F.replace(seg_col, F.lit(SEP), F.lit(SEP * 2)),
        F.lit(SEP * 2),
    )
    merged = F.replace(
        decorated, F.lit(SEP + a + SEP + SEP + b + SEP), F.lit(SEP + a + b + SEP)
    )
    return F.btrim(
        F.replace(merged, F.lit(SEP * 2), F.lit(SEP)), F.lit(SEP)
    ).alias("seg")


def train_bpe(
    hist: DataFrame, vocab_size: int = 50, num_merges: int = 6
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Train ``num_merges`` BPE merges on the top-``vocab_size`` words.

    Returns (merges in rank order, final (w, f, seg) segmentation
    frame).  The vocab frame is bounded by construction, so each
    round's pair count is a small keyed aggregate; only the single
    argmax row crosses to the driver per round."""
    from file_d_spark.cachereg import register as _register_cache

    vocab = hist.orderBy(F.col("f").desc(), "w").limit(vocab_size)
    seg = vocab.select("w", "f", _char_seg(F.col("w")).alias("seg"))
    # checkpoint ONCE to cut the corpus-histogram lineage; the frame is
    # vocab_size rows, so collapse to one partition — every round's
    # pair-count job then runs single-task instead of fanning 32 shuffle
    # partitions over 50 rows (measured 10s -> ~2s for 6 rounds).
    # Rounds themselves add only one tiny nested `replace` projection
    # each, so per-round checkpoints would cost more (an eager job per
    # round) than the lineage they truncate.
    seg = _register_cache(seg.coalesce(1).localCheckpoint(eager=True))

    pair_expr = F.expr(
        "transform(slice(split(seg, '\\u001f'), 1,"
        " size(split(seg, '\\u001f')) - 1),"
        " (s, i) -> struct(s as a,"
        " element_at(split(seg, '\\u001f'), i + 2) as b))"
    )
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        top = (
            seg.select("f", F.explode(pair_expr).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("f").alias("c"))
            .orderBy(F.col("c").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break  # every word fully merged — no pairs left
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        seg = seg.select("w", "f", _apply_merge(F.col("seg"), a, b))
    return merges, seg


def bpe_token_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab_size: int = 50,
    num_merges: int = 6,
) -> DataFrame:
    """Per-document BPE token statistics: train on the corpus word
    histogram, apply via a broadcast (word → seg) map with char-split
    fallback for OOV words.  Returns (id, n_words, n_bpe_tokens)."""
    hist = word_histogram(df, text_col)
    _, seg = train_bpe(hist, vocab_size=vocab_size, num_merges=num_merges)

    words = F.split(F.lower(F.col(text_col)), "[^a-z]+")
    inst = df.select(
        F.col(id_col), F.explode(words).alias("w")
    ).filter(F.col("w") != "")
    applied = inst.join(
        F.broadcast(seg.select("w", "seg")), "w", "left"
    ).select(
        id_col,
        F.coalesce("seg", _char_seg(F.col("w"))).alias("seg"),
    )
    return applied.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.size(F.split("seg", SEP))).cast("long").alias("n_bpe_tokens"),
    )


def bpe_fertility(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    vocab_size: int = 50,
    num_merges: int = 6,
) -> DataFrame:
    """Per-group tokenizer fertility (BPE tokens per word) with the
    corpus-trained merges — the real-tokenizer upgrade of the
    bpe_ish regex proxy behind token_fertility.  One extra doc-keyed
    equi-join over bpe_token_stats' per-document output (doc-count
    sized, not corpus sized), then a group-keyed aggregate; fertility
    divides the exact bigint sums once at the end, so the double is
    identical cross-engine."""
    stats = bpe_token_stats(
        df, id_col, text_col, vocab_size=vocab_size, num_merges=num_merges
    )
    return (
        stats.join(df.select(id_col, group_col), id_col)
        .groupBy(group_col)
        .agg(
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        )
        .withColumn(
            "fertility",
            F.round(
                F.col("n_bpe_tokens").cast("double") / F.col("n_words"), 6
            ),
        )
    )
