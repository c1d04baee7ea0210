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
had no registered row).  Current spares (wait for r11+ slots or a
retirement):

- ``bpe_fertility`` — per-language tokenizer fertility with the REAL
  corpus-trained BPE merges (the fidelity upgrade over
  ``token_fertility``'s regex proxy), sharing ``functions/bpe.py``
  and the unrolled-CTE oracle generator with ``bpe_train_apply``.
- ``bigram_logprob`` — interpolated-bigram KenLM-proxy quality
  score (``corpus.bigram_logprob``).
- ``weighted_sample`` — Efraimidis-Spirakis weighted sampling
  without replacement, k per group (``corpus.weighted_sample``).
- ``dbscan_clusters`` — density-based clustering over embeddings
  (``similarity.dbscan_clusters``: cosine neighborhoods, core/border/
  noise, components via the dedup star-contraction machinery).
- ``sketch_kmv_distinct`` / ``sketch_cms_topk`` — the rest of the
  round-9 sketch family (``functions/sketch.py``): bottom-k distinct
  estimates per language and a Count-Min heavy-hitter readout, both
  engine-portable (md5-32 hashes, exact-integer folds).  Their
  siblings ``sketch_hll_distinct`` / ``sketch_overlap`` were
  registered at r10.
- ``pmi_phrases`` — top-k two-word collocations by pointwise mutual
  information (``corpus.pmi_phrases``): the phrase-mining primitive
  for multi-word tokenizer vocab entries.
- ``sketch_f2_moment`` — NEW r10: AMS second-frequency-moment /
  self-join-size estimate (``sketch.f2_moment``), exact-bigint X_r
  per rep, randomized differential + mutation teeth in
  test_sketch_random.py.
- ``jl_project`` — NEW r10: Johnson-Lindenstrauss 64→16 projection
  (``similarity.jl_project``), LCG planes as folded literals,
  fixed-point long-format output.
- ``bm25_suite`` / ``convert_suite`` / ``filter_suite`` — NEW r11:
  the pre-planned r12 family folds (see the section at the bottom);
  r11 itself registered nothing (zero-slack window, COVERAGE.md).
- ``hard_negatives`` — NEW r11: contrastive-training hard-negative
  mining (``similarity.hard_negatives``): top-k most similar corpus
  vectors per query EXCLUDING the near-duplicate band, the
  false-negative guard every retrieval-finetuning pipeline needs;
  band-bites teeth test in tests/test_hard_negatives.py.
- ``mmr_diversify`` — NEW r11: Maximal Marginal Relevance diversified
  top-5 per query (``similarity.mmr_diversify``): greedy
  relevance-vs-redundancy selection unrolled into pure-JVM stages,
  exact integer fixed-point scores, oracle = the same unrolled
  sel1..sel5 CTEs (``mmr_oracle_sql``); diversity teeth in
  tests/test_hard_negatives.py.

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


_WORDS_SRC_SPARK = None  # built inline in each query fn

_WORDS_SRC_SQL = (
    "SELECT lang, unnest(list_filter("
    "string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) AS w "
    "FROM documents"
)


def _words(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "lang",
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"),
    ).filter(F.col("w") != "")


def q_sketch_kmv(spark, sf_dir):
    """Bottom-k (KMV) distinct-words-per-language estimate (k=64)."""
    from file_d_spark.functions import sketch

    return sketch.kmv_distinct(_words(spark, sf_dir), "lang", "w", k=64)


def q_sketch_cms(spark, sf_dir):
    """Count-Min heavy hitters over the global word stream (4x1024
    counters): top-10 exact counts vs their sketch estimates."""
    from file_d_spark.functions import sketch

    return sketch.cms_topk(
        _words(spark, sf_dir).select("w"), "w", depth=4, width=1024, k=10
    )


def _sketch_oracles():
    from file_d_spark.functions import sketch

    return {
        "sketch_kmv_distinct": sketch.kmv_oracle_sql(
            _WORDS_SRC_SQL, "lang", "w", k=64
        ),
        "sketch_cms_topk": sketch.cms_oracle_sql(
            _WORDS_SRC_SQL, "w", "w", depth=4, width=1024, k=10
        ),
    }


_SK = _sketch_oracles()
STAGED.update(
    {
        "sketch_kmv_distinct": (q_sketch_kmv, _SK["sketch_kmv_distinct"]),
        "sketch_cms_topk": (q_sketch_cms, _SK["sketch_cms_topk"]),
    }
)



def q_sketch_f2(spark, sf_dir):
    """AMS F2 / self-join-size estimate over the global word stream —
    the join-size primitive a planner consults before committing a
    100 TB shuffle (staged r10)."""
    from file_d_spark.functions import sketch

    return sketch.f2_moment(
        _words(spark, sf_dir).select("w"), "w", reps=16
    )


def _f2_oracle():
    from file_d_spark.functions import sketch

    return sketch.f2_oracle_sql(_WORDS_SRC_SQL, "w", reps=16)


STAGED["sketch_f2_moment"] = (q_sketch_f2, _f2_oracle())


def q_jl_project(spark, sf_dir):
    """Johnson-Lindenstrauss 64→16 projection of the embeddings in
    fixed-point long format — the dim-reduction front end for the ANN
    path (staged r10)."""
    from file_d_spark.functions import similarity

    e = load_table(spark, sf_dir, "embeddings")
    return similarity.jl_project(e, "vec_id", "embedding", dim=64, out_dim=16)


def _jl_oracle():
    from file_d_spark.functions import similarity

    return similarity.jl_project_oracle_sql(
        "SELECT vec_id, embedding FROM embeddings",
        "vec_id", "embedding", dim=64, out_dim=16,
    )


STAGED["jl_project"] = (q_jl_project, _jl_oracle())


def q_quantile_thresholds(spark, sf_dir):
    """Per-language exact quantile thresholds of n_chars (1/4, 1/2,
    9/10) in long format — the batch pair of the r10
    ``quantile_stream`` streaming twin (staged r10; bit-parity with
    the twin asserted in tests/test_streaming.py)."""
    from file_d_spark.functions import corpus

    d = load_table(spark, sf_dir, "documents")
    return corpus.quantile_thresholds(d, "lang", "n_chars")


_QUANTILE_THRESHOLDS_ORACLE = """
    WITH h AS (
      SELECT lang, CAST(n_chars AS BIGINT) AS s, count(*) AS n
      FROM documents WHERE n_chars IS NOT NULL GROUP BY lang, n_chars),
    c AS (
      SELECT lang, s,
             CAST(sum(n) OVER (PARTITION BY lang ORDER BY s) AS BIGINT) AS cum,
             CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS tot
      FROM h),
    q(num, den) AS (VALUES (1, 4), (1, 2), (9, 10))
    SELECT lang, CAST(num AS BIGINT) AS num, CAST(den AS BIGINT) AS den,
           CAST(max(tot) AS BIGINT) AS n_rows,
           CAST(min(s) AS BIGINT) AS threshold
    FROM c JOIN q ON cum * den >= tot * num
    GROUP BY lang, num, den
"""

STAGED["quantile_thresholds"] = (q_quantile_thresholds, _QUANTILE_THRESHOLDS_ORACLE)


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
# r12 fold combos (COVERAGE.md "Registry capacity", re-computed r11
# arithmetic): the three pre-planned family folds, staged NOW so r12's
# registration day is bookkeeping.  Each leg is the UNCHANGED
# registered query called by name, padded to a superset layout with
# typed NULLs (the token_stats_suite pattern); each oracle is the
# UNION ALL of the legs' REGISTERED oracles wrapped as subqueries —
# the fold oracle can never drift from the per-leg oracles it will
# replace.  On r12 registration day: register these three, retire the
# seven standalone rows they absorb (net -4), and promote staged
# spares into the freed slots.
# ---------------------------------------------------------------------------


def _fold_df(spark, sf_dir, legs, all_cols):
    from file_d_spark.queries import QUERIES

    out = None
    for tag, qname in legs:
        df = QUERIES[qname](spark, sf_dir)
        have = set(df.columns)
        cols = [F.lit(tag).alias("leg")] + [
            (
                F.col(name)
                if name in have
                else F.lit(None).cast(spark_t).alias(name)
            )
            for name, spark_t, _duck_t in all_cols
        ]
        leg_df = df.select(*cols)
        out = leg_df if out is None else out.unionByName(leg_df)
    return out


def _fold_sql(legs, all_cols):
    from file_d_spark.queries import ORACLES

    parts = []
    for tag, qname, present in legs:
        sel = [f"'{tag}' AS leg"] + [
            (name if name in present else f"NULL::{duck_t} AS {name}")
            for name, _spark_t, duck_t in all_cols
        ]
        parts.append(
            "SELECT " + ", ".join(sel) + " FROM (\n" + ORACLES[qname] + "\n)"
        )
    return "\nUNION ALL\n".join(parts)


_BM25_SUITE_COLS = [
    ("query_id", "string", "VARCHAR"),
    ("doc_id", "bigint", "BIGINT"),
    ("score", "double", "DOUBLE"),
    ("rank", "bigint", "BIGINT"),
]


def q_bm25_suite(spark, sf_dir):
    """bm25_topk + bm25_multi_query in one row: single-query top-10
    (no query_id) and the six-query table, every (doc, score, rank)
    still value-hashed per leg."""
    df = _fold_df(
        spark, sf_dir,
        [("topk", "bm25_topk"), ("multi", "bm25_multi_query")],
        _BM25_SUITE_COLS,
    )
    # row_number() is int on the Spark side, BIGINT in DuckDB — align
    return df.withColumn("rank", F.col("rank").cast("bigint"))


STAGED["bm25_suite"] = (
    q_bm25_suite,
    _fold_sql(
        [
            ("topk", "bm25_topk", {"doc_id", "score", "rank"}),
            ("multi", "bm25_multi_query",
             {"query_id", "doc_id", "score", "rank"}),
        ],
        _BM25_SUITE_COLS,
    ),
)


_CONVERT_SUITE_COLS = [
    ("event_id", "bigint", "BIGINT"),
    ("ts_unix", "bigint", "BIGINT"),
    ("level", "string", "VARCHAR"),
    ("cnt", "bigint", "BIGINT"),
    ("decoded", "string", "VARCHAR"),
]


def q_convert_suite(spark, sf_dir):
    """convert_date + convert_log_level + convert_utf8_escapes in one
    row — the three convert-action legs (SURVEY §2.3 #4/#5/#6), each
    the unchanged standalone query."""
    return _fold_df(
        spark, sf_dir,
        [
            ("date", "convert_date"),
            ("log_level", "convert_log_level"),
            ("utf8", "convert_utf8_escapes"),
        ],
        _CONVERT_SUITE_COLS,
    )


STAGED["convert_suite"] = (
    q_convert_suite,
    _fold_sql(
        [
            ("date", "convert_date", {"event_id", "ts_unix"}),
            ("log_level", "convert_log_level", {"level", "cnt"}),
            ("utf8", "convert_utf8_escapes", {"event_id", "decoded"}),
        ],
        _CONVERT_SUITE_COLS,
    ),
)


_FILTER_SUITE_COLS = [
    ("event_id", "bigint", "BIGINT"),
    ("event_type", "string", "VARCHAR"),
    ("value", "double", "DOUBLE"),
    ("doc_id", "bigint", "BIGINT"),
    ("n_chars", "bigint", "BIGINT"),
]


def q_filter_suite(spark, sf_dir):
    """filter_doif + filter_len_cmp in one row — the discard/do_if
    legs over events and documents (SURVEY §2.3 #9, §2.4)."""
    return _fold_df(
        spark, sf_dir,
        [("doif", "filter_doif"), ("len_cmp", "filter_len_cmp")],
        _FILTER_SUITE_COLS,
    )


STAGED["filter_suite"] = (
    q_filter_suite,
    _fold_sql(
        [
            ("doif", "filter_doif", {"event_id", "event_type", "value"}),
            ("len_cmp", "filter_len_cmp", {"doc_id", "n_chars"}),
        ],
        _FILTER_SUITE_COLS,
    ),
)


def q_hard_negatives(spark, sf_dir):
    """Hard-negative mining (similarity.hard_negatives): top-10 most
    similar corpus vectors per query EXCLUDING the near-duplicate band
    (sim >= 0.3 at this synthetic fixture's sim scale, where the
    queries' top sims run 0.33-0.39 — the exclusion provably bites,
    asserted in tests/test_hard_negatives.py).  The contrastive-
    training companion of the ANN family: same broadcast + narrow-pass
    + per-query-window shape as brute_force_topk."""
    from file_d_spark.functions import similarity
    from file_d_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    return similarity.hard_negatives(e, queries, k=10, dup_sim=0.3)


_HARD_NEG_ORACLE = """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, len(c.embedding)+1),
               i -> c.embedding[i]::DOUBLE * q.qv[i]::DOUBLE))
             / (sqrt(list_sum(list_transform(range(1, len(c.embedding)+1),
                  i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))
              * sqrt(list_sum(list_transform(range(1, len(q.qv)+1),
                  i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))) AS sim
      FROM embeddings c, q WHERE c.vec_id != q.query_id)
    SELECT query_id, neighbor_id, rank, round(sim, 6) AS sim FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id) AS rank
      FROM scored WHERE sim < 0.3) WHERE rank <= 10
    """

STAGED["hard_negatives"] = (q_hard_negatives, _HARD_NEG_ORACLE)


def q_mmr_diversify(spark, sf_dir):
    """MMR diversified top-5 per query over a 20-candidate exact pool
    (similarity.mmr_diversify, λ=7/10): exact integer fixed-point
    greedy selection, unrolled into pure-JVM stages — no Python in the
    plan.  Diversity teeth in tests/test_hard_negatives.py."""
    from file_d_spark.functions import similarity
    from file_d_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    return similarity.mmr_diversify(e, queries, k=5, pool=20)


def _mmr_oracle() -> str:
    from file_d_spark.functions import similarity

    return similarity.mmr_oracle_sql(k=5, pool=20)


STAGED["mmr_diversify"] = (q_mmr_diversify, _mmr_oracle())
