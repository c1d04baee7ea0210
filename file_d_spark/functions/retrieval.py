"""Ranked retrieval over a document corpus — BM25 scoring.

The reference engine has no retrieval operator; this belongs to the
training-data-pipeline surface (query-relevance curation, contamination
triage, RAG-corpus pruning all start with "score every doc against a
term set and keep the top k").

Scale design (100 TB): term frequencies are computed IN-ROW (one
``size(filter(tokens, = term))`` per query term), so there is no
posting-list explode, no (doc, term) shuffle, and no pivot — the
corpus never enters a wide dependency at all.  ONE global aggregation
derives every model statistic (doc count, average length, per-term
document frequencies) as a single broadcast row (partial map-side agg
-> one row; no driver collect, no literal model).  Scoring is then a
narrow projection over the candidate docs (any tf > 0), and the final
top-k is TakeOrderedAndProject (distributed heap, no global sort).
Total: two narrow corpus scans (stats + scoring) and one broadcast
join — the r6 first cut (explode -> groupBy -> pivot + separate
dl/stats/df frames) planned 12 exchanges and four corpus scans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from file_d_spark.cachereg import register as _register_cache
from file_d_spark.functions.text import tokens

__all__ = ["bm25_topk", "bm25_multi_topk"]


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_dp: int = 5,
) -> DataFrame:
    """Top-``k`` documents by BM25 score against ``terms``.

    score(d) = sum over query terms t of
        idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    with the Lucene/ATIRE idf ``ln((N - df + 0.5)/(df + 0.5) + 1)``
    (never negative; tf = 0 contributes an exact 0.0).

    Engine-portability: the per-term contributions are summed in FIXED
    alphabetical term order via an explicit left-associated chain,
    never a float ``sum()`` whose accumulation order the engine picks;
    the final score is rounded to ``round_dp`` so a last-ulp ``ln``
    difference between libm implementations cannot flip a rank.  Ties
    break on the document id.

    Returns ``(id_col, score, rank)`` with rank 1..k.
    """
    if k <= 0:
        raise ValueError("bm25_topk: k must be positive")
    if not terms:
        raise ValueError("bm25_topk: at least one query term required")
    terms = sorted(set(terms))
    # per-term expressions ship as SQL text (r14): the Column-per-term
    # loops cost ~700 py4j trips per plan build; the parsed trees are
    # identical (same filter/size, same cast chain, same float literal
    # order), so scores are bit-equal.  Terms are embedded as escaped
    # string literals; column aliases are backtick-quoted so any token
    # value is a legal alias.
    from file_d_spark.functions.sqlexpr import d_sql

    def esc(t: str) -> str:
        return t.replace("\\", "\\\\").replace("'", "\\'")

    def tf_sql(t: str) -> str:
        return f"CAST(size(filter(__t__, x -> x = '{esc(t)}')) AS DOUBLE)"

    base = df.select(
        F.col(id_col).alias("__id__"),
        tokens(F.col(text_col)).alias("__t__"),
    ).selectExpr(
        "__id__",
        "size(__t__) AS __dl__",
        *[f"{tf_sql(t)} AS `__tf_{t}__`" for t in terms],
    )
    # ONE aggregation yields the whole scoring model as a broadcast row
    stats = base.agg(
        F.expr("CAST(sum(__dl__) AS DOUBLE) / count(1)").alias("__avgdl__"),
        F.expr("CAST(count(1) AS DOUBLE)").alias("__nd__"),
        *[
            F.expr(
                f"CAST(sum(CAST((`__tf_{t}__` > 0) AS BIGINT)) AS DOUBLE)"
            ).alias(f"__df_{t}__")
            for t in terms
        ],
    )
    cand = base.filter(
        F.expr(" OR ".join(f"(`__tf_{t}__` > 0)" for t in terms))
    )
    scored = cand.crossJoin(F.broadcast(stats))

    def term_score_sql(t: str) -> str:
        tf = f"`__tf_{t}__`"
        dfc = f"`__df_{t}__`"
        idf = f"ln((__nd__ - {dfc} + 0.5D) / ({dfc} + 0.5D) + 1.0D)"
        denom = (
            f"({tf} + {d_sql(k1)} * ({d_sql(1.0 - b)}"
            f" + {d_sql(b)} * __dl__ / __avgdl__))"
        )
        return (
            f"coalesce({idf} * ({tf} * {d_sql(k1 + 1.0)}) / {denom}, 0.0D)"
        )

    score_sql = term_score_sql(terms[0])
    for t in terms[1:]:
        score_sql = f"({score_sql} + {term_score_sql(t)})"
    ranked = (
        scored.selectExpr(
            f"__id__ AS `{id_col}`",
            f"round({score_sql}, {int(round_dp)}) AS score",
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
    # rank the k survivors; the window runs on <= k rows
    return ranked.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("score").desc(), F.col(id_col))
        ),
    )


def bm25_multi_topk(
    corpus: DataFrame,
    queries: DataFrame | None,
    id_col: str,
    text_col: str,
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_dp: int = 5,
    query_rows: Sequence[tuple[str, Sequence[str]]] | None = None,
) -> DataFrame:
    """Top-``k`` documents per QUERY for a whole query TABLE
    (``query_id``, ``terms array<string>``) — the real curation shape:
    thousands of relevance queries scored against the corpus at once.

    Scale design (100 TB): the corpus is shuffled ONCE, regardless of
    how many queries run.  The union vocabulary of all query terms
    broadcasts onto the exploded corpus tokens (broadcast semi join —
    narrow), and the single keyed shuffle is the (doc, term) tf
    aggregation over MATCHED tokens only.  Everything derived from it
    — per-term document frequencies, the (term -> query) fan-out, the
    (N, avgdl) stats row — joins back as broadcasts, so adding queries
    adds broadcast rows, never corpus passes or exchanges; the matched
    frame persists so its one shuffle also feeds the df aggregation.

    Engine-portability: a grouped float ``sum()`` would accumulate in
    whatever order the engine picks, so each term contribution is
    quantized to a 1e-7 fixed-point BIGINT and the per-(query, doc)
    sum runs in exact integer arithmetic (commutative, order-free),
    then unscales and rounds to ``round_dp`` — the same discipline the
    k-means op uses for its centroid sums.  Duplicate terms within a
    query count once (set-of-terms BM25, as in the single-query form).

    Per-query ranking is a row_number window partitioned by query_id
    over that query's CANDIDATE docs (docs sharing >= 1 term).  A
    query matching most of the corpus concentrates its candidates in
    one window partition — callers scoring stop-word-ish terms at
    100 TB should pre-prune the term list (idf ~ 0 terms add nothing).

    Returns ``(query_id, id_col, score, rank)`` with rank 1..k per
    query; queries with zero matching documents emit no rows.

    ``query_rows`` — the query table as a Python literal
    ``[(query_id, [term, ...]), ...]`` for callers whose queries are
    known at plan-build (the bench/oracle rows; the ann ``seed_rows``
    pattern).  The (query, term) fan-out becomes a LOCAL relation (no
    distinct exchange, no job to build its broadcast input) and the
    vocabulary membership test becomes an IN-list predicate on the
    exploded tokens — the broadcast-join form only exists to serve a
    DISTRIBUTED query table, and for a literal one it costs two extra
    driver jobs per plan for nothing.  Matched rows are identical
    (inner join against a distinct vocab == membership filter).
    Exactly one of ``queries`` / ``query_rows`` must be given.
    """
    if k <= 0:
        raise ValueError("bm25_multi_topk: k must be positive")
    if (queries is None) == (query_rows is None):
        raise ValueError(
            "bm25_multi_topk: pass exactly one of queries / query_rows"
        )
    toks = corpus.select(
        F.col(id_col).alias("__id__"),
        tokens(F.col(text_col)).alias("__t__"),
    )
    # (N, avgdl): one narrow scan, one broadcast row
    stats = toks.select(F.size("__t__").alias("__dl__")).agg(
        (F.sum("__dl__").cast("double") / F.count(F.lit(1))).alias("__avgdl__"),
        F.count(F.lit(1)).cast("double").alias("__nd__"),
    )
    if query_rows is not None:
        pairs = sorted(
            {(qid, t) for qid, ts in query_rows for t in ts}
        )
        q_terms = corpus.sparkSession.createDataFrame(
            pairs, "__qid__ string, __term__ string"
        )
        vocab_pred = F.col("__term__").isin(
            sorted({t for _, t in pairs})
        )
        matched_src = toks.select(
            "__id__",
            F.size("__t__").alias("__dl__"),
            F.explode("__t__").alias("__term__"),
        ).filter(vocab_pred)
    else:
        q_terms = (
            queries.select(
                F.col(query_id_col).alias("__qid__"),
                F.explode(terms_col).alias("__term__"),
            ).distinct()
        )
        vocab = q_terms.select("__term__").distinct()
        matched_src = toks.select(
            "__id__",
            F.size("__t__").alias("__dl__"),
            F.explode("__t__").alias("__term__"),
        ).join(F.broadcast(vocab), "__term__")
    # the ONE corpus shuffle: (doc, term) tf over matched tokens only
    matched = (
        matched_src
        .groupBy("__id__", "__dl__", "__term__")
        .agg(F.count(F.lit(1)).cast("double").alias("__tf__"))
        .persist()
    )
    _register_cache(matched)
    # matched has one row per (doc, term-with-tf>0): count == df
    df_t = matched.groupBy("__term__").agg(
        F.count(F.lit(1)).cast("double").alias("__df__")
    )
    cand = (
        matched.join(F.broadcast(q_terms), "__term__")
        .join(F.broadcast(df_t), "__term__")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("__nd__") - F.col("__df__") + F.lit(0.5))
        / (F.col("__df__") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("__tf__") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("__dl__") / F.col("__avgdl__")
    )
    contrib = idf * (F.col("__tf__") * F.lit(k1 + 1.0)) / denom
    quant = F.round(contrib * F.lit(1e7), 0).cast("long")
    scores = (
        cand.select("__qid__", "__id__", quant.alias("__c__"))
        .groupBy("__qid__", "__id__")
        .agg(
            F.round(
                F.sum("__c__").cast("double") / F.lit(1e7), round_dp
            ).alias("score")
        )
    )
    return (
        scores.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("__qid__").orderBy(
                    F.col("score").desc(), F.col("__id__")
                )
            ),
        )
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid__").alias(query_id_col),
            F.col("__id__").alias(id_col),
            "score",
            "rank",
        )
    )
