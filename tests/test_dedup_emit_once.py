"""minhash_candidates_emit_once: the emit-once candidate stream must
equal the groupBy-deduped candidate set of minhash_lsh_pairs, and the
verified pairs through _verify_pairs must match the registered
operator's output exactly.  The swap into the registered operators
was MEASURED AND REJECTED (sparse candidates -> groupBy faster; see
COVERAGE.md "Registry capacity"); these tests keep the dense-regime
variants honest for callers that do need them."""

from pyspark.sql import functions as F

from file_d_spark.functions.dedup import (
    _banded_signatures,
    _shingle_frame,
    _verify_pairs,
    minhash_candidates_emit_once,
    minhash_lsh_pairs,
)


def _sf():
    from conftest import SF_DIR

    return SF_DIR


def test_emit_once_candidates_equal_groupby_dedup(spark):
    d = spark.read.parquet(f"{_sf()}/documents.parquet")
    sh = _shingle_frame(d, "doc_id", "text", 2)
    banded = _banded_signatures(sh, 64, 16)
    grouped = {
        (r.doc_a, r.doc_b)
        for r in (
            banded.alias("a")
            .join(banded.alias("b"), ["band", "bucket"])
            .filter(F.col("a.doc") < F.col("b.doc"))
            .select(
                F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b")
            )
            .distinct()
            .collect()
        )
    }
    rows = minhash_candidates_emit_once(sh, 64, 16).collect()
    assert grouped, "fixture produced no candidates"
    assert {(r.doc_a, r.doc_b) for r in rows} == grouped
    # exactly-once by construction: the raw row count has no dups
    assert len(rows) == len(grouped)


def test_emit_once_verified_pairs_match_registered_operator(spark):
    d = spark.read.parquet(f"{_sf()}/documents.parquet")
    want = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(
            d, "doc_id", "text", n=2, threshold=0.7
        ).collect()
    }
    sh = _shingle_frame(d, "doc_id", "text", 2)
    cands = minhash_candidates_emit_once(sh, 64, 16)
    got = {
        (r.doc_a, r.doc_b)
        for r in _verify_pairs(sh, cands, 0.7).collect()
    }
    assert got == want


def test_emit_once_two_table_matches_groupby(spark):
    """The broadcast two-table variant must produce exactly the
    candidate set fuzzy_decontaminate's groupBy stage dedups to."""
    d = spark.read.parquet(f"{_sf()}/documents.parquet")
    corpus = d.filter(F.col("doc_id") % 7 != 0)
    ev = d.filter(F.col("doc_id") % 7 == 0).limit(30)
    sh_c = _shingle_frame(corpus, "doc_id", "text", 3)
    sh_e = _shingle_frame(ev, "doc_id", "text", 3)
    banded_c = _banded_signatures(sh_c, 64, 16, cache=False)
    banded_e = _banded_signatures(sh_e, 64, 16, cache=False)
    grouped = {
        (r.doc_a, r.doc_b)
        for r in (
            banded_c.alias("a")
            .join(F.broadcast(banded_e.alias("b")), ["band", "bucket"])
            .select(
                F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b")
            )
            .distinct()
            .collect()
        )
    }
    from file_d_spark.functions.dedup import minhash_candidates_emit_once_vs

    emit = minhash_candidates_emit_once_vs(sh_c, sh_e, 64, 16)
    rows = emit.collect()
    assert grouped, "fixture produced no cross-table candidates"
    assert {(r.doc_a, r.doc_b) for r in rows} == grouped
    assert len(rows) == len(grouped), "duplicate emissions"
