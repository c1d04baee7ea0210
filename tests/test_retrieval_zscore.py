"""Unit tests for BM25 retrieval (functions/retrieval.py), ExactSubstr
duplicate-span removal (corpus.remove_dup_spans) and the rolling
z-score query — hand-computed expectations plus an independent pure-
Python recomputation over the testdata parquet."""

from __future__ import annotations

import math

import pytest

from file_d_spark.functions import corpus, retrieval
from file_d_spark.queries import QUERIES


# --------------------------------------------------------------------------
# BM25
# --------------------------------------------------------------------------


def _bm25_expected(tf, dl, avgdl, n_docs, df, k1=1.2, b=0.75):
    idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def test_bm25_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "cat dog"), (2, "cat cat cat fish"), (3, "bird")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in retrieval.bm25_topk(docs, "doc_id", "text", ["cat"]).collect()
    }
    avgdl = (2 + 4 + 1) / 3
    want1 = round(_bm25_expected(1, 2, avgdl, 3.0, 2.0), 5)
    want2 = round(_bm25_expected(3, 4, avgdl, 3.0, 2.0), 5)
    assert out[1]["score"] == pytest.approx(want1, abs=1e-9)
    assert out[2]["score"] == pytest.approx(want2, abs=1e-9)
    assert 3 not in out  # no query term -> no candidate row
    # tf=3 beats tf=1 here despite the longer doc
    assert out[2]["rank"] == 1 and out[1]["rank"] == 2


def test_bm25_multi_term_fixed_order_sum(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha alpha"), (3, "beta")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["score"]
        for r in retrieval.bm25_topk(
            docs, "doc_id", "text", ["beta", "alpha"]
        ).collect()
    }
    avgdl = (2 + 2 + 1) / 3
    e = _bm25_expected
    assert out[1] == pytest.approx(
        round(e(1, 2, avgdl, 3.0, 2.0) + e(1, 2, avgdl, 3.0, 2.0), 5), abs=1e-9
    )
    assert out[2] == pytest.approx(round(e(2, 2, avgdl, 3.0, 2.0), 5), abs=1e-9)
    # doc 3 is shorter than average -> its single-term score beats the
    # same tf at avg length; it still has only one matching term
    assert out[3] == pytest.approx(round(e(1, 1, avgdl, 3.0, 2.0), 5), abs=1e-9)


def test_bm25_k_bound_and_tie_break(spark):
    docs = spark.createDataFrame(
        [(i, "same text here") for i in range(6)], ["doc_id", "text"]
    )
    out = retrieval.bm25_topk(docs, "doc_id", "text", ["same"], k=4).collect()
    assert [r["doc_id"] for r in out] == [0, 1, 2, 3]  # equal scores: id asc
    assert [r["rank"] for r in out] == [1, 2, 3, 4]


def test_bm25_validation(spark):
    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        retrieval.bm25_topk(docs, "doc_id", "text", [])
    with pytest.raises(ValueError):
        retrieval.bm25_topk(docs, "doc_id", "text", ["x"], k=0)


# --------------------------------------------------------------------------
# ExactSubstr duplicate-span removal
# --------------------------------------------------------------------------


def _spans(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {
        r["doc_id"]: r
        for r in corpus.remove_dup_spans(df, "doc_id", "text", **kw).collect()
    }


def test_remove_dup_spans_cross_doc(spark):
    out = _spans(
        spark,
        [(1, "x1 x2 a b c x3 x4"), (2, "y1 a b c y2")],
        n=3,
    )
    assert out[1]["clean_text"] == "x1 x2 x3 x4"
    assert out[1]["n_tokens"] == 7 and out[1]["n_removed"] == 3
    assert out[2]["clean_text"] == "y1 y2"
    assert out[2]["n_removed"] == 3


def test_remove_dup_spans_in_doc_repeat_fully_covers(spark):
    # "p q r s p q r s": 3-grams (p q r) and (q r s) each occur twice,
    # covering every position -> the whole doc is cut
    out = _spans(spark, [(1, "p q r s p q r s")], n=3)
    assert out[1]["clean_text"] == ""
    assert out[1]["n_removed"] == 8


def test_remove_dup_spans_passthrough(spark):
    out = _spans(spark, [(1, "a b"), (2, "u v w x")], n=3)
    assert out[1]["clean_text"] == "a b" and out[1]["n_removed"] == 0
    assert out[2]["clean_text"] == "u v w x" and out[2]["n_removed"] == 0


def test_remove_dup_spans_validation(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        corpus.remove_dup_spans(df, "doc_id", "text", n=1)
    with pytest.raises(ValueError):
        corpus.remove_dup_spans(df, "doc_id", "text", min_count=1)


# --------------------------------------------------------------------------
# rolling z-score
# --------------------------------------------------------------------------


def test_rolling_zscore_matches_pure_python(spark, sf_dir):
    """Independent recomputation: the whole sf0.001 result from first
    principles with Python ints (trailing <=20-row window per
    (user_id, event_type), exact integer z^2*100)."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT event_id, user_id, event_type, ts, "
        f"CAST(round(value * 100) AS BIGINT) v "
        f"FROM read_parquet('{sf_dir}/events.parquet') "
        f"ORDER BY user_id, event_type, ts, event_id"
    ).fetchall()
    want: dict[int, tuple] = {}
    hist: list[int] = []
    prev_key = None
    for event_id, user_id, event_type, _ts, v in rows:
        key = (user_id, event_type)
        if key != prev_key:
            hist, prev_key = [], key
        base = hist[-20:]
        n = len(base)
        if n >= 8:
            s, q2 = sum(base), sum(x * x for x in base)
            den = n * q2 - s * s
            zsq = (100 * (n * v - s) ** 2) // den if den > 0 else None
            want[event_id] = (user_id, event_type, v, n, zsq)
        hist.append(v)

    got = {
        r["event_id"]: (
            r["user_id"], r["event_type"], r["v_cents"], r["n"], r["zsq_x100"]
        )
        for r in QUERIES["rolling_zscore"](spark, sf_dir).collect()
    }
    assert got == want
    assert want, "fixture produced no windows with >=8 rows of history"


# ---------------------------------------------------------------------------
# bm25_multi_topk: query-table BM25
# ---------------------------------------------------------------------------


def test_bm25_multi_matches_single_query(spark):
    """A one-row query table must reproduce bm25_topk exactly (same
    formula, same rounding discipline)."""
    docs = spark.createDataFrame(
        [
            (1, "cat dog cat"),
            (2, "cat cat cat fish"),
            (3, "bird dog"),
            (4, "fish bird cat dog"),
        ],
        ["doc_id", "text"],
    )
    single = {
        r["doc_id"]: r
        for r in retrieval.bm25_topk(
            docs, "doc_id", "text", ["cat", "dog"], k=10
        ).collect()
    }
    qdf = spark.createDataFrame(
        [("q0", ["cat", "dog"])], "query_id string, terms array<string>"
    )
    multi = {
        r["doc_id"]: r
        for r in retrieval.bm25_multi_topk(
            docs, qdf, "doc_id", "text", k=10
        ).collect()
    }
    assert set(single) == set(multi)
    for d in single:
        # the multi-query path sums 1e-7-quantized contributions
        # (order-free across engines); at a 5dp rounding boundary this
        # may differ from the float chain by one final-digit ulp
        assert multi[d]["score"] == pytest.approx(single[d]["score"], abs=1.1e-5)
        assert multi[d]["rank"] == single[d]["rank"]


def test_bm25_multi_per_query_isolation(spark):
    """Each query ranks independently; a query with no matching term
    emits nothing; duplicate terms in one query count once."""
    docs = spark.createDataFrame(
        [(1, "cat dog"), (2, "dog dog"), (3, "fish")],
        ["doc_id", "text"],
    )
    qdf = spark.createDataFrame(
        [
            ("qc", ["cat"]),
            ("qd", ["dog", "dog"]),
            ("qz", ["zebra"]),
        ],
        "query_id string, terms array<string>",
    )
    rows = retrieval.bm25_multi_topk(docs, qdf, "doc_id", "text", k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {"qc", "qd"}  # qz: no rows
    assert [r["doc_id"] for r in sorted(by_q["qc"], key=lambda r: r["rank"])] == [1]
    qd = sorted(by_q["qd"], key=lambda r: r["rank"])
    assert [r["doc_id"] for r in qd] == [2, 1]  # tf=2 beats tf=1
    # duplicate 'dog' did not double the score: same as a single term
    qdf1 = spark.createDataFrame(
        [("qd", ["dog"])], "query_id string, terms array<string>"
    )
    once = {
        r["doc_id"]: r["score"]
        for r in retrieval.bm25_multi_topk(docs, qdf1, "doc_id", "text").collect()
    }
    for r in qd:
        assert r["score"] == pytest.approx(once[r["doc_id"]], abs=1e-9)


def test_bm25_multi_no_corpus_reshuffle_per_query(spark, sf_dir):
    """The 100 TB claim, plan-asserted: the number of exchanges and
    corpus scans does not grow with the number of queries, and every
    query/model join is a broadcast (no SortMergeJoin anywhere)."""
    import re

    from file_d_spark.queries import load_table, release_caches

    d = load_table(spark, sf_dir, "documents")

    def plan_for(n_queries):
        qdf = spark.createDataFrame(
            [(f"q{i}", ["merge", "spark"]) for i in range(n_queries)],
            "query_id string, terms array<string>",
        )
        out = retrieval.bm25_multi_topk(d, qdf, "doc_id", "text", k=5)
        return out._jdf.queryExecution().executedPlan().toString()

    try:
        p2, p32 = plan_for(2), plan_for(32)
        for plan in (p2, p32):
            assert "SortMergeJoin" not in plan
            assert "BroadcastHashJoin" in plan
        n_ex2 = len(re.findall(r"Exchange hashpartitioning", p2))
        n_ex32 = len(re.findall(r"Exchange hashpartitioning", p32))
        assert n_ex2 == n_ex32, "exchange count grew with query count"
        n_scan2 = len(re.findall(r"FileScan parquet", p2))
        n_scan32 = len(re.findall(r"FileScan parquet", p32))
        assert n_scan2 == n_scan32, "corpus scan count grew with query count"
    finally:
        release_caches()
