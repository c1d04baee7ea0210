"""Staged query/oracle pairs — the validated spare pool.

Round 8 promoted funnel_steps, domain_cap, dedup_incremental_fuzzy,
cohort_retention and unimax_mixture into ``queries.py``, then executed
the registry-capacity consolidation (COVERAGE.md "Registry capacity"):
the six standalone decoder rows folded into two combined rows
(``decoder_lineformats`` / ``decoder_structured``), freeing slots that
registered ``bpe_train_apply`` and the former spare
``quantile_normalize``.  The registry sits at 98 of the sustainable
100 (= the driver's 50 correctness rows/round × the ≤2-round
evidence-freshness budget).

Stage the next implemented-ahead operator here as ``name: (query fn,
oracle SQL)`` — the exact shape ``queries.py`` registers — and
``tests/test_staged_queries.py`` will run the driver's compare against
DuckDB at sf0.001 + sf0.01 on every pytest run until a slot opens.

Round 9 promoted ``graph_pagerank`` and ``bitext_mine`` (family
diversity: graph + cross-lingual mining), filling the registry at the
sustainable 100.  Round 10 freed three slots by folding the four ANN
rows into ``ann_methods`` and the two join_template rows into
``join_template_blocks`` (the r8 decoder pattern), then promoted
``sketch_hll_distinct`` + ``sketch_overlap`` (approximate analytics
had no registered row).  Round 11 staged the r12 fold combos and two
promotion candidates but registered nothing (zero-slack window after
CORRECTNESS_r10 failed to land).  Current spares (wait for r13+
slots or a retirement):

- ``weighted_sample`` — Efraimidis-Spirakis weighted sampling
  without replacement, k per group (``corpus.weighted_sample``).
- ``sketch_kmv_distinct`` / ``sketch_cms_topk`` /
  ``sketch_f2_moment`` — the rest of the sketch family
  (``functions/sketch.py``): bottom-k distinct estimates per
  language, a Count-Min heavy-hitter readout, and the AMS
  second-frequency-moment / self-join-size estimate — all
  engine-portable (md5-32 hashes, exact-integer folds).  Siblings
  ``sketch_hll_distinct`` / ``sketch_overlap`` registered at r10.
- ``jl_project`` — Johnson-Lindenstrauss 64→16 projection
  (``similarity.jl_project``), LCG planes as folded literals,
  fixed-point long-format output.
- ``quantile_thresholds`` — exact per-language quantile cutpoints
  (the filtering-threshold calibration pass).
- ``vocab_coverage`` — OOV/coverage audit of a fixed vocabulary over
  the corpus tokens.
- ``decontaminate_spans`` — span-level eval-overlap removal (the
  surgical variant of the doc-level ``decontaminate`` row).
- ``dedup_keep_best`` — cluster-aware canonical-doc selection
  (keep the highest-quality member per duplicate cluster).
- ``embedding_stats`` — NEW r12: per-dimension embedding
  distribution audit (``similarity.embedding_stats``) — dead-dim /
  collapsed-encoder / norm-drift QC; exact power-of-two fixed-point
  aggregates (floor(v·2^20) — no decimal-round boundary), derived
  mean/std engine-identical; dead-dim teeth test in test_quantize.

Round 12 executed the pre-planned registration day: the three family
folds (``bm25_suite`` / ``convert_suite`` / ``filter_suite``, staged
r11) registered and retired the seven standalone rows they absorb, and
``hard_negatives`` + ``mmr_diversify`` (staged r11) promoted into the
two freed window slots.

Round 13 executed its registration day as staged: ``sketch_suite``
(kmv+cms+f2 folded — the whole remaining sketch family for ONE slot),
``jl_project`` and ``quantile_thresholds`` moved to ``queries.py``
(every pair re-oracle-checked at sf0.001 AND sf0.01 immediately
before the move — the r12 mmr lesson), and the three standalone
sketch singles retired with the fold.  Remaining spare pool (6):
``weighted_sample`` / ``vocab_coverage`` / ``decontaminate_spans`` /
``dedup_keep_best`` / ``embedding_stats`` / ``assoc_audit`` (NEW
r13: chi-square + Cramér's V split-leakage audit,
``corpus.assoc_audit`` — statistical data QC with a deliberately
ln-free fixed-point construction; r15 candidate alongside
embedding_stats) — all sf0.01-prechecked green at r13
(assoc_audit at sf0.1 too).  r13 also staged THREE r14 fold
combos over registered rows (``tpch_suite`` / ``json_suite`` /
``dedup_incremental_suite``, bottom of this file, composed from
queries.ORACLES so they cannot drift): the r14 schedule is fold the
8 legs → register the 3 combos + 4 spares → window = 43 r12-stale +
7 never-green = exactly 50 (full arithmetic in the combo block's
comment; re-check at round start).

Nothing imports this module at runtime.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from file_d_spark.tables import load_table


def q_weighted_sample(spark, sf_dir):
    """Efraimidis-Spirakis weighted sample: 5 docs per language,
    weight = n_chars, deterministic md5 uniform."""
    from file_d_spark.functions import corpus

    d = load_table(spark, sf_dir, "documents")
    return corpus.weighted_sample(
        d, "lang", "n_chars", "doc_id", k=5, salt="v1"
    )


_WEIGHTED_SAMPLE_ORACLE = """
    WITH keyed AS (
      SELECT lang, doc_id, n_chars AS weight,
             -ln((('0x' || substr(md5(doc_id::VARCHAR || 'v1'), 1, 8))
                    ::UBIGINT::DOUBLE + 1.0) / 4294967296.0)
               / n_chars::DOUBLE AS es_key
      FROM documents WHERE n_chars > 0)
    SELECT lang, doc_id, weight, round(es_key, 6) AS es_key, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY lang
                                   ORDER BY es_key, doc_id) AS rank
      FROM keyed)
    WHERE rank <= 5
"""



# name -> (query fn, oracle SQL)
STAGED: dict = {
    "weighted_sample": (q_weighted_sample, _WEIGHTED_SAMPLE_ORACLE),
}




def q_vocab_coverage(spark, sf_dir):
    """Per-language OOV-rate audit against the top-500 global word
    vocabulary (count desc, word asc — fully deterministic), staged
    r10: the vocabulary-freeze sanity check a multilingual tokenizer
    needs."""
    from file_d_spark.functions import corpus

    d = load_table(spark, sf_dir, "documents")
    return corpus.vocab_coverage(d, "lang", "text", vocab_size=500)


_VOCAB_COVERAGE_ORACLE = """
    WITH words AS (
      SELECT lang, unnest(list_filter(
               string_split_regex(lower(text), '[^a-z]+'),
               x -> x <> '')) AS w
      FROM documents),
    vocab AS (
      SELECT w FROM (
        SELECT w, count(*) AS c FROM words GROUP BY w
        ORDER BY c DESC, w LIMIT 500)),
    flagged AS (
      SELECT lang, CASE WHEN v.w IS NULL THEN 0 ELSE 1 END AS inv
      FROM words LEFT JOIN vocab v USING (w))
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(inv) AS BIGINT) AS in_vocab,
           round(1.0 - sum(inv)::DOUBLE / count(*), 6) AS oov_rate
    FROM flagged GROUP BY lang
"""

STAGED["vocab_coverage"] = (q_vocab_coverage, _VOCAB_COVERAGE_ORACLE)


def q_decontaminate_spans(spark, sf_dir):
    """Cross-corpus exact-span decontamination (staged r10): cut every
    8-gram of the train slice (doc_id % 10 != 0) that appears verbatim
    in the eval slice (doc_id % 10 = 0) — the span-level companion of
    fuzzy_decontaminate's doc-level flags."""
    from file_d_spark.functions import corpus

    d = load_table(spark, sf_dir, "documents")
    return corpus.decontaminate_spans(
        d.filter(F.col("doc_id") % 10 != 0),
        d.filter(F.col("doc_id") % 10 == 0),
        "doc_id",
        "text",
        n=8,
    )


_DECONTAM_SPANS_ORACLE = r"""
    WITH t AS (
      SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 x -> x <> '') AS tk
      FROM documents),
    tr AS (SELECT * FROM t WHERE doc_id % 10 != 0),
    ev AS (SELECT * FROM t WHERE doc_id % 10 = 0),
    trg AS (SELECT doc_id, s,
                   ('0x' || substr(md5(array_to_string(tk[s:s+7], ' ')), 1, 15))::UBIGINT AS h
            FROM (SELECT doc_id, unnest(range(1, len(tk) - 6)) AS s, tk FROM tr)),
    evh AS (SELECT DISTINCT
                   ('0x' || substr(md5(array_to_string(tk[s:s+7], ' ')), 1, 15))::UBIGINT AS h
            FROM (SELECT unnest(range(1, len(tk) - 6)) AS s, tk FROM ev)),
    ds AS (SELECT doc_id, s FROM trg JOIN evh USING (h)),
    cov AS (SELECT DISTINCT doc_id, unnest(range(s, s + 8)) AS p FROM ds),
    tokpos AS (SELECT doc_id, unnest(range(1, len(tk) + 1)) AS p, tk FROM tr),
    kept AS (SELECT tp.doc_id, tp.p, tp.tk[tp.p] AS w
             FROM tokpos tp LEFT JOIN cov
               ON tp.doc_id = cov.doc_id AND tp.p = cov.p
             WHERE cov.p IS NULL),
    agg AS (SELECT doc_id, count(*) AS n_kept,
                   string_agg(w, ' ' ORDER BY p) AS txt
            FROM kept GROUP BY doc_id)
    SELECT tr.doc_id,
           len(tr.tk) AS n_tokens,
           len(tr.tk) - coalesce(a.n_kept, 0) AS n_removed,
           coalesce(a.txt, '') AS clean_text
    FROM tr LEFT JOIN agg a ON tr.doc_id = a.doc_id
"""

STAGED["decontaminate_spans"] = (q_decontaminate_spans, _DECONTAM_SPANS_ORACLE)


def q_dedup_keep_best(spark, sf_dir):
    """Quality-aware near-dup survivor selection (staged r10): same
    0.7-Jaccard clusters as dedup_cluster, but the kept representative
    is the cluster's LONGEST member (n_chars, ties to smallest id) —
    one keyed max(struct) aggregate, no per-cluster rank window."""
    from file_d_spark.functions import dedup as _dedup

    d = load_table(spark, sf_dir, "documents")
    pairs = _dedup.jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.7)
    return _dedup.keep_best_representative(
        d, pairs, id_col="doc_id", score_col="n_chars"
    ).select(
        "doc_id", "cluster_id", "n_chars", "csize",
        F.col("kept").cast("int").alias("kept"),
    )


_KEEP_BEST_ORACLE = """
    WITH RECURSIVE
    t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
    sh AS MATERIALIZED (SELECT doc_id,
                  list_distinct(list_transform(range(1, len(w) - 1),
                                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) ws
           FROM t WHERE len(w) >= 3),
    pairs AS MATERIALIZED (
      SELECT da, db FROM (
        SELECT a.doc_id AS da, b.doc_id AS db,
               len(list_intersect(a.ws, b.ws)) AS ix,
               len(a.ws) AS na, len(b.ws) AS nb
        FROM sh a, sh b
        WHERE a.doc_id < b.doc_id
          AND least(len(a.ws), len(b.ws))::DOUBLE
              / greatest(len(a.ws), len(b.ws)) >= 0.7)
      WHERE ix::DOUBLE / (na + nb - ix) >= 0.7),
    edges AS (SELECT da AS a, db AS b FROM pairs
              UNION SELECT db, da FROM pairs),
    cc(id, lbl) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, cc.lbl FROM edges e JOIN cc ON cc.id = e.b),
    lab AS (SELECT id, min(lbl) AS cluster_id FROM cc GROUP BY id),
    assigned AS (
      SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id,
             d.n_chars
      FROM documents d LEFT JOIN lab l ON l.id = d.doc_id),
    best AS (
      SELECT cluster_id,
             CAST(count(*) AS BIGINT) AS csize,
             first(doc_id ORDER BY n_chars DESC, doc_id) AS keep_id
      FROM assigned GROUP BY cluster_id)
    SELECT a.doc_id, a.cluster_id, a.n_chars, b.csize,
           (a.doc_id = b.keep_id)::INT AS kept
    FROM assigned a JOIN best b USING (cluster_id)
"""

STAGED["dedup_keep_best"] = (q_dedup_keep_best, _KEEP_BEST_ORACLE)


# ---------------------------------------------------------------------------
# r12 registration day EXECUTED: the three family folds (bm25_suite /
# convert_suite / filter_suite) and the two promotions (hard_negatives
# / mmr_diversify) moved to queries.py — the fold helpers went with
# them as queries._suite_df/_suite_sql, re-parameterized over the
# demoted leg functions/oracle constants instead of registry names.
# ---------------------------------------------------------------------------



def q_embedding_stats(spark, sf_dir):
    """Per-dimension embedding distribution audit
    (similarity.embedding_stats) — exact power-of-two fixed-point
    aggregates + engine-identical derived mean/std; one 64-key
    partially-aggregated groupBy, no window/join/Python (staged r12,
    new family: embedding-pipeline data QC)."""
    from file_d_spark.functions import similarity

    e = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_stats(e, "embedding")


def _embedding_stats_oracle():
    from file_d_spark.functions import similarity

    return similarity.embedding_stats_oracle_sql(
        "SELECT embedding FROM embeddings", "embedding"
    )


STAGED["embedding_stats"] = (q_embedding_stats, _embedding_stats_oracle())


# ---------------------------------------------------------------------------
# r14 fold combos, staged at r13 (the proven one-round-ahead pattern):
# three family folds over REGISTERED rows, each composed from
# queries.QUERIES leg functions and queries.ORACLES oracle constants
# via the shared _suite_df/_suite_sql machinery — the combo cannot
# drift from the legs it will absorb.
#
# r14 registration-day arithmetic (re-check at round start): the 50
# r12-green rows go 2-rounds stale at r14 and the registry sits at
# the sustainable 100, so slots come ONLY from retirement.  Folding
# tpch_q1+q3+q5 -> tpch_suite, json_extract_props +
# json_variant_extract + json_encode_roundtrip -> json_suite, and
# dedup_incremental_bucketed + dedup_incremental_bloom ->
# dedup_incremental_suite retires 8 rows (7 r12-stale + tpch_q5,
# r13-green) and registers 3 combos; promoting 4 spares then gives
# window = 43 r12-stale + 7 never-green = exactly 50, registry
# 100 - 8 + 3 + 4 = 99 with one spare (and one slot) left for r15.
# Promotion order = LONGEST-STAGED FIRST (the VERDICT r12 rot rule):
# weighted_sample, vocab_coverage, decontaminate_spans,
# dedup_keep_best (all r10); embedding_stats (r12, newest) waits
# for r15 unless an extra slot opens.
# Oracle-check every promotion at sf0.01 BEFORE registration day
# (the r12 mmr lesson — the pytest staged gate runs only at the
# SPARK_GRAFT_TEST_SF_DIR fixture, sf0.001 by default).  r13 already
# pre-checked all five spares at sf0.001 AND sf0.01, and all three
# combos below at sf0.001 (pytest) AND sf0.01 AND sf0.1 — green
# everywhere, so r14 registration day is pure bookkeeping.
# ---------------------------------------------------------------------------

_TPCH_SUITE_COLS = [
    ("l_returnflag", "string", "VARCHAR"),
    ("l_linestatus", "string", "VARCHAR"),
    ("sum_qty", "double", "DOUBLE"),
    ("sum_base_price", "double", "DOUBLE"),
    ("sum_disc_price", "double", "DOUBLE"),
    ("sum_charge", "double", "DOUBLE"),
    ("avg_qty", "double", "DOUBLE"),
    ("avg_price", "double", "DOUBLE"),
    ("avg_disc", "double", "DOUBLE"),
    ("count_order", "bigint", "BIGINT"),
    ("o_orderkey", "bigint", "BIGINT"),
    ("revenue", "double", "DOUBLE"),
    ("orderdate", "string", "VARCHAR"),
    ("n_name", "string", "VARCHAR"),
]


def q_tpch_suite(spark, sf_dir):
    """tpch_q1 + q3 + q5 in one driver row — each leg the unchanged
    registered query, typed-NULL-padded to the superset layout
    (staged r13 for the r14 fold)."""
    from file_d_spark.queries import QUERIES, _suite_df

    return _suite_df(
        spark, sf_dir,
        [
            ("q1", QUERIES["tpch_q1"]),
            ("q3", QUERIES["tpch_q3"]),
            ("q5", QUERIES["tpch_q5"]),
        ],
        _TPCH_SUITE_COLS,
    )


def _tpch_suite_sql() -> str:
    from file_d_spark.queries import ORACLES, _suite_sql

    return _suite_sql(
        [
            ("q1", ORACLES["tpch_q1"],
             {"l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
              "sum_disc_price", "sum_charge", "avg_qty", "avg_price",
              "avg_disc", "count_order"}),
            ("q3", ORACLES["tpch_q3"],
             {"o_orderkey", "revenue", "orderdate"}),
            ("q5", ORACLES["tpch_q5"], {"n_name", "revenue"}),
        ],
        _TPCH_SUITE_COLS,
    )


STAGED["tpch_suite"] = (q_tpch_suite, _tpch_suite_sql())


_JSON_SUITE_COLS = [
    ("event_id", "bigint", "BIGINT"),
    ("p_k", "string", "VARCHAR"),
    ("enc", "string", "VARCHAR"),
]


def q_json_suite(spark, sf_dir):
    """json_extract_props + json_variant_extract +
    json_encode_roundtrip in one driver row (staged r13 for the r14
    fold): schema-on-read extraction, variant-typed extraction, and
    the encode round trip, every (event_id, value) still value-hashed
    per leg."""
    from file_d_spark.queries import QUERIES, _suite_df

    return _suite_df(
        spark, sf_dir,
        [
            ("props", QUERIES["json_extract_props"]),
            ("variant", QUERIES["json_variant_extract"]),
            ("encode", QUERIES["json_encode_roundtrip"]),
        ],
        _JSON_SUITE_COLS,
    )


def _json_suite_sql() -> str:
    from file_d_spark.queries import ORACLES, _suite_sql

    return _suite_sql(
        [
            ("props", ORACLES["json_extract_props"], {"event_id", "p_k"}),
            ("variant", ORACLES["json_variant_extract"],
             {"event_id", "p_k"}),
            ("encode", ORACLES["json_encode_roundtrip"],
             {"event_id", "enc"}),
        ],
        _JSON_SUITE_COLS,
    )


STAGED["json_suite"] = (q_json_suite, _json_suite_sql())


_DEDUP_INC_SUITE_COLS = [
    ("doc_id", "bigint", "BIGINT"),
    ("lang", "string", "VARCHAR"),
    ("source", "string", "VARCHAR"),
]


def q_dedup_incremental_suite(spark, sf_dir):
    """dedup_incremental_bucketed + dedup_incremental_bloom in one
    driver row (staged r13 for the r14 fold): the two
    new-batch-vs-seen-corpus admission strategies over identical
    column layouts — the leg tag alone separates their survivors
    under the combined value-hash."""
    from file_d_spark.queries import QUERIES, _suite_df

    return _suite_df(
        spark, sf_dir,
        [
            ("bucketed", QUERIES["dedup_incremental_bucketed"]),
            ("bloom", QUERIES["dedup_incremental_bloom"]),
        ],
        _DEDUP_INC_SUITE_COLS,
    )


def _dedup_inc_suite_sql() -> str:
    from file_d_spark.queries import ORACLES, _suite_sql

    cols = {"doc_id", "lang", "source"}
    return _suite_sql(
        [
            ("bucketed", ORACLES["dedup_incremental_bucketed"], cols),
            ("bloom", ORACLES["dedup_incremental_bloom"], cols),
        ],
        _DEDUP_INC_SUITE_COLS,
    )


STAGED["dedup_incremental_suite"] = (
    q_dedup_incremental_suite, _dedup_inc_suite_sql()
)


def q_assoc_audit(spark, sf_dir):
    """Split-leakage / metadata-association audit (staged r13, new
    family: statistical data QC): Cramér's V between lang, source,
    and the md5 train/val/test assignment — a split correlating with
    metadata (V meaningfully above 0) biases every downstream eval.
    chi-square on exact counts, per-cell power-of-two fixed point,
    no libm ln anywhere (see corpus.assoc_audit)."""
    from file_d_spark.functions import corpus

    d = load_table(spark, sf_dir, "documents")
    s = corpus.hash_split(
        d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return corpus.assoc_audit(s, ["lang", "source", "split"])


_ASSOC_AUDIT_ORACLE = """
    WITH src AS (
      SELECT coalesce(lang::VARCHAR, '') AS lang,
             coalesce(source::VARCHAR, '') AS source,
             CASE WHEN substr(md5(doc_id::VARCHAR), 1, 8) < 'cccccccd'
                    THEN 'train'
                  WHEN substr(md5(doc_id::VARCHAR), 1, 8) < 'e6666667'
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM documents),
    cell AS (
      SELECT 'lang|source' AS pair, lang AS va, source AS vb FROM src
      UNION ALL
      SELECT 'lang|split', lang, split FROM src
      UNION ALL
      SELECT 'source|split', source, split FROM src),
    hist AS (SELECT pair, va, vb, count(*)::DOUBLE AS n_ab
             FROM cell GROUP BY pair, va, vb),
    m AS (SELECT pair, va, vb, n_ab,
                 sum(n_ab) OVER (PARTITION BY pair, va) AS na,
                 sum(n_ab) OVER (PARTITION BY pair, vb) AS nb,
                 sum(n_ab) OVER (PARTITION BY pair) AS n
          FROM hist),
    s AS (SELECT pair, va, vb, n,
                 CAST(floor((n_ab * n_ab) / (na * nb / n) * 1048576.0)
                      AS BIGINT) AS term_fp
          FROM m),
    a AS (SELECT pair,
                 CAST(first(n) AS BIGINT) AS n,
                 CAST(count(DISTINCT va) AS BIGINT) AS k_a,
                 CAST(count(DISTINCT vb) AS BIGINT) AS k_b,
                 CAST(sum(term_fp) AS BIGINT) AS chi2_fp
          FROM s GROUP BY pair)
    SELECT split_part(pair, '|', 1) AS col_a,
           split_part(pair, '|', 2) AS col_b,
           n, k_a, k_b, chi2_fp,
           round(greatest(chi2_fp::DOUBLE / 1048576.0 - n::DOUBLE, 0.0),
                 6) AS chi2,
           CASE WHEN least(k_a, k_b) - 1 > 0
                THEN round(sqrt(
                       greatest(chi2_fp::DOUBLE / 1048576.0 - n::DOUBLE,
                                0.0)
                       / (n::DOUBLE * (least(k_a, k_b) - 1)::DOUBLE)), 6)
                ELSE 0.0 END AS cramers_v
    FROM a
"""

STAGED["assoc_audit"] = (q_assoc_audit, _ASSOC_AUDIT_ORACLE)
