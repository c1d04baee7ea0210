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

Nothing imports this module at runtime.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from file_d_spark.tables import load_table


def q_bpe_fertility(spark, sf_dir):
    """Per-language BPE fertility from the same trained merges as
    bpe_train_apply: one doc-keyed join over the per-doc stats, then a
    lang-keyed aggregate; fertility divides exact bigint sums once."""
    from file_d_spark.functions import bpe

    d = load_table(spark, sf_dir, "documents")
    return bpe.bpe_fertility(
        d, "doc_id", "text", "lang", vocab_size=50, num_merges=6
    )


def _fertility_oracle() -> str:
    from file_d_spark.queries import _bpe_oracle

    return _bpe_oracle(
        final_select="""
    SELECT doc.lang AS lang,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(len(string_split(seg, chr(31)))) AS BIGINT)
             AS n_bpe_tokens,
           round(sum(len(string_split(seg, chr(31))))::DOUBLE / count(*), 6)
             AS fertility
    FROM applied JOIN documents doc ON applied.doc_id = doc.doc_id
    GROUP BY doc.lang"""
    )


def q_bigram_logprob(spark, sf_dir):
    """Interpolated-bigram mean log-probability per document — the
    fidelity step past quality_unigram_logprob toward the KenLM-style
    CCNet filter."""
    from file_d_spark.functions import corpus

    d = load_table(spark, sf_dir, "documents")
    return corpus.bigram_logprob(d, "doc_id", "text")


def _bigram_oracle(lam: float = 0.9) -> str:
    """Mirror of corpus.bigram_logprob; the interpolation literals are
    repr'd from the SAME Python floats the Spark plan embeds (1 - 0.9
    is not the double 0.1)."""
    return rf"""
    WITH docs AS (
      SELECT doc_id, list_filter(
               regexp_split_to_array(trim(text), '\s+'),
               x -> x <> '') AS toks
      FROM documents),
    bi AS (
      SELECT doc_id, toks[i] AS a, toks[i+1] AS b
      FROM docs, UNNEST(range(1, len(toks))) AS u(i)),
    big AS (SELECT a, b, count(*) AS c_ab FROM bi GROUP BY a, b),
    hist AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a
             FROM big GROUP BY a),
    tok AS (SELECT unnest(toks) AS t FROM docs),
    uni AS (SELECT t AS b, count(*) AS c_b FROM tok GROUP BY t),
    tot AS (SELECT sum(c_b)::DOUBLE AS n FROM uni),
    model AS (
      SELECT big.a, big.b,
             log10({lam!r} * c_ab / c_a
                   + {1.0 - lam!r} * c_b / (SELECT n FROM tot)) AS lp
      FROM big JOIN hist USING (a) JOIN uni USING (b))
    SELECT doc_id, count(*) AS n_bigrams, round(avg(lp), 4) AS mean_logp
    FROM bi JOIN model USING (a, b)
    GROUP BY doc_id
"""


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


def q_dbscan(spark, sf_dir):
    """DBSCAN over the embeddings (cosine >= 0.35 neighborhoods,
    min_pts 3 — at sf0.01 that is 142 cores / ~200 borders / ~160
    noise, so every role and the labelling stay hash-checked):
    core/border/noise roles, clusters = components of the core-core
    graph labelled by min id."""
    from file_d_spark.functions import similarity

    e = load_table(spark, sf_dir, "embeddings")
    return similarity.dbscan_clusters(e, eps_sim=0.35, min_pts=3)


_DBSCAN_ORACLE = """
    WITH RECURSIVE
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve
          FROM embeddings),
    pairs AS MATERIALIZED (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM v a, v b
      WHERE a.vec_id < b.vec_id
        AND list_sum(list_transform(range(1, len(a.ve)+1),
              i -> a.ve[i] * b.ve[i]))
            / (sqrt(list_sum(list_transform(range(1, len(a.ve)+1),
                 i -> a.ve[i] * a.ve[i])))
             * sqrt(list_sum(list_transform(range(1, len(b.ve)+1),
                 i -> b.ve[i] * b.ve[i])))) >= 0.35),
    sym AS (SELECT id_a, id_b FROM pairs
            UNION ALL SELECT id_b, id_a FROM pairs),
    deg AS (SELECT id_a AS node, count(*) AS d FROM sym GROUP BY id_a),
    core AS (SELECT node FROM deg WHERE d + 1 >= 3),
    ce AS (SELECT s.id_a, s.id_b FROM sym s
           JOIN core c1 ON s.id_a = c1.node
           JOIN core c2 ON s.id_b = c2.node
           WHERE s.id_a < s.id_b),
    edges AS (SELECT id_a AS a, id_b AS b FROM ce
              UNION SELECT id_b, id_a FROM ce),
    cc(id, lbl) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, cc.lbl FROM edges e JOIN cc ON cc.id = e.b),
    lab AS (SELECT id, min(lbl) AS cluster_id FROM cc GROUP BY id),
    core_labels AS (
      SELECT c.node, coalesce(l.cluster_id, c.node) AS cluster_id
      FROM core c LEFT JOIN lab l ON l.id = c.node),
    border AS (
      SELECT s.id_b AS node, min(cl.cluster_id) AS cluster_id
      FROM sym s JOIN core c1 ON s.id_a = c1.node
           JOIN core_labels cl ON cl.node = s.id_a
      WHERE s.id_b NOT IN (SELECT node FROM core)
      GROUP BY s.id_b),
    labelled AS (
      SELECT node, cluster_id, 'core' AS role FROM core_labels
      UNION ALL
      SELECT node, cluster_id, 'border' AS role FROM border)
    SELECT e.vec_id, coalesce(lb.cluster_id, -1) AS cluster_id,
           coalesce(lb.role, 'noise') AS role
    FROM embeddings e LEFT JOIN labelled lb ON lb.node = e.vec_id
"""


# name -> (query fn, oracle SQL)
STAGED: dict = {
    "bpe_fertility": (q_bpe_fertility, _fertility_oracle()),
    "bigram_logprob": (q_bigram_logprob, _bigram_oracle()),
    "weighted_sample": (q_weighted_sample, _WEIGHTED_SAMPLE_ORACLE),
    "dbscan_clusters": (q_dbscan, _DBSCAN_ORACLE),
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


def q_pmi_phrases(spark, sf_dir):
    """Top-20 two-word collocations by PMI (min bigram count 5) —
    the phrase-mining primitive for multi-word tokenizer vocab
    entries."""
    from file_d_spark.functions import corpus

    d = load_table(spark, sf_dir, "documents")
    return corpus.pmi_phrases(d, "text", min_count=5, k=20)


_PMI_ORACLE = r"""
    WITH docs AS (
      SELECT list_filter(regexp_split_to_array(trim(text), '\s+'),
                         x -> x <> '') AS toks
      FROM documents),
    bi AS (
      SELECT toks[i] AS a, toks[i+1] AS b,
             CAST(count(*) AS BIGINT) AS c_ab
      FROM docs, UNNEST(range(1, len(toks))) AS u(i)
      GROUP BY 1, 2),
    uni AS (
      SELECT t, CAST(count(*) AS BIGINT) AS c_t
      FROM (SELECT unnest(toks) AS t FROM docs) GROUP BY t),
    nu AS (SELECT sum(c_t)::DOUBLE AS n FROM uni),
    nb AS (SELECT sum(c_ab)::DOUBLE AS n FROM bi)
    SELECT a, b, c_ab,
           round(ln((CAST(c_ab AS DOUBLE) / (SELECT n FROM nb))
                    / ((CAST(ua.c_t AS DOUBLE) / (SELECT n FROM nu))
                       * (CAST(ub.c_t AS DOUBLE) / (SELECT n FROM nu)))),
                 6) AS pmi
    FROM bi JOIN uni ua ON bi.a = ua.t JOIN uni ub ON bi.b = ub.t
    WHERE c_ab >= 5
    ORDER BY pmi DESC, a, b LIMIT 20
"""

STAGED["pmi_phrases"] = (q_pmi_phrases, _PMI_ORACLE)


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
