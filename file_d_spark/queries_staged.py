"""Round-8 query registrations, staged.

This round's 50-row driver verification window is exactly full (see
``queries.py::_SWEEP_WINDOW``): registering more oracle-paired queries
now would evict entries whose driver evidence is already two rounds
old.  The six operators below are therefore implemented and
unit-tested THIS round, with their ``(query fn, oracle SQL)`` pairs
validated against DuckDB by ``tests/test_staged_queries.py``.

Registration plan: the sustainable registry size is 100 (the driver
records 50 rows per round; every query must re-verify within two
rounds), so at the next round FIVE of the six move into ``queries.py``
proper (one ``@query`` block each, plus ``_SWEEP_CHANGED``
bookkeeping): funnel_steps, domain_cap, dedup_incremental_fuzzy,
cohort_retention, unimax_mixture.  ``quantile_normalize`` stays staged
as the validated spare, to swap in if a registered query is ever
retired.

Nothing imports this module at runtime; it exists so the staged
oracles are exercised continuously instead of bit-rotting until
registration day.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from file_d_spark.functions import corpus, dedup
from file_d_spark.functions.funnel import cohort_retention, funnel_steps
from file_d_spark.functions import text
from file_d_spark.tables import load_table


def q_domain_cap(spark, sf_dir):
    """Per-source corpus cap at 10 docs, deterministic md5 selection —
    salted two-level exact top-K, no hot-domain window."""
    d = load_table(spark, sf_dir, "documents")
    out = corpus.domain_cap(d, "doc_id", "source", cap=10, salt="dc1")
    return out.select(
        "doc_id", "source", F.col("rank").cast("long").alias("rank")
    )


ORACLE_DOMAIN_CAP = """
SELECT doc_id, source, rank FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(doc_id::VARCHAR || 'dc1'), doc_id)
           AS rank
  FROM documents)
WHERE rank <= 10
"""


def q_unimax_mixture(spark, sf_dir):
    """Temperature-2 (UniMax) language rebalancing — sqrt-only weight
    arithmetic, bit-portable across engines."""
    d = load_table(spark, sf_dir, "documents")
    return corpus.unimax_mixture(
        d, "doc_id", "lang", temperature=2, salt="um1"
    ).select("doc_id", "lang")


ORACLE_UNIMAX = """
WITH n AS (SELECT lang, count(*)::DOUBLE AS n_g FROM documents GROUP BY lang),
t AS (SELECT min(n_g / sqrt(n_g)) AS total FROM n),
r AS (SELECT n.lang, least(1.0, sqrt(n.n_g) * t.total / n.n_g) AS keep
      FROM n, t)
SELECT d.doc_id, d.lang
FROM documents d JOIN r ON d.lang = r.lang
WHERE ('0x' || substr(md5(d.doc_id::VARCHAR || 'um1'), 1, 8))::UBIGINT
      / 4294967296.0 < r.keep
"""


def q_quantile_normalize(spark, sf_dir):
    """Within-language percentile rank of each document's token count."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "lang",
        text.token_count(F.col("text")).cast("long").alias("wc"),
    )
    out = corpus.quantile_normalize(scored, "lang", "wc")
    return out.select(
        "doc_id", "lang", "wc",
        F.col("cum_count").cast("long").alias("cum_count"),
        F.col("group_total").cast("long").alias("group_total"),
        "pct_rank",
    )


ORACLE_QUANTILE_NORMALIZE = r"""
WITH d AS (
  SELECT doc_id, lang,
         len(list_filter(string_split_regex(trim(text), '\s+'),
                         t -> t <> '')) AS wc
  FROM documents),
h AS (SELECT lang, wc, count(*) AS n FROM d GROUP BY lang, wc),
c AS (SELECT lang, wc,
             CAST(sum(n) OVER (PARTITION BY lang ORDER BY wc) AS BIGINT)
               AS cum,
             CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS tot
      FROM h)
SELECT d.doc_id, d.lang, CAST(d.wc AS BIGINT) AS wc,
       c.cum AS cum_count, c.tot AS group_total,
       c.cum::DOUBLE / c.tot::DOUBLE AS pct_rank
FROM d JOIN c ON d.lang = c.lang AND d.wc = c.wc
"""


def q_fuzzy_incremental(spark, sf_dir):
    """New-batch docs near-dup (Jaccard >= 0.7) against the seen
    slice — banded both sides, nothing broadcast by assumption."""
    d = load_table(spark, sf_dir, "documents")
    seen = d.filter(F.col("doc_id") % 50 == 0)
    new = d.filter(F.col("doc_id") % 50 != 0)
    out = dedup.fuzzy_incremental_dedup(
        new, seen, "doc_id", "text", n=3, num_hashes=64, bands=16,
        threshold=0.7,
    )
    return out.select(
        "doc_id", "n_near_dups", F.col("kept").cast("int").alias("kept")
    )


ORACLE_FUZZY_INCREMENTAL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
sh AS MATERIALIZED (SELECT doc_id,
              list_distinct(list_transform(range(1, len(w) - 1),
                            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) ws
       FROM t WHERE len(w) >= 3),
hits AS (
  SELECT doc_a, count(*) AS n FROM (
    SELECT a.doc_id AS doc_a,
           len(list_intersect(a.ws, b.ws)) AS ix,
           len(a.ws) AS na, len(b.ws) AS nb
    FROM (SELECT * FROM sh WHERE doc_id % 50 != 0) a,
         (SELECT * FROM sh WHERE doc_id % 50 = 0) b
    WHERE least(len(a.ws), len(b.ws))::DOUBLE
          / greatest(len(a.ws), len(b.ws)) >= 0.7)
  WHERE ix::DOUBLE / (na + nb - ix) >= 0.7
  GROUP BY doc_a)
SELECT d.doc_id, coalesce(h.n, 0) AS n_near_dups,
       (coalesce(h.n, 0) = 0)::INT AS kept
FROM (SELECT doc_id FROM documents WHERE doc_id % 50 != 0) d
LEFT JOIN hits h ON h.doc_a = d.doc_id
"""


def q_funnel_steps(spark, sf_dir):
    """view -> click -> purchase per-user earliest strict-order
    completion over the events table."""
    e = load_table(spark, sf_dir, "events")
    out = funnel_steps(
        e, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    )
    return out.select(
        "user_id", "t_1", "t_2", "t_3",
        F.col("completed").cast("int").alias("completed"),
    )


ORACLE_FUNNEL = """
WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t_1
            FROM events WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t_2
       FROM events e JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t_1
       GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t_3
       FROM events e JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t_2
       GROUP BY e.user_id)
SELECT s1.user_id, s1.t_1, s2.t_2, s3.t_3,
       (s3.t_3 IS NOT NULL)::INT AS completed
FROM s1
LEFT JOIN s2 ON s1.user_id = s2.user_id
LEFT JOIN s3 ON s1.user_id = s3.user_id
"""


def q_cohort_retention(spark, sf_dir):
    """Weekly first-seen cohorts x period offsets over events."""
    e = load_table(spark, sf_dir, "events")
    return cohort_retention(e, "user_id", "ts", period="week")


ORACLE_COHORT = """
WITH ev AS (SELECT user_id, epoch_us(ts) // 604800000000 AS p FROM events),
f AS (SELECT user_id, min(p) AS cohort FROM ev GROUP BY user_id),
a AS (SELECT DISTINCT user_id, p FROM ev),
j AS (SELECT f.cohort, a.p - f.cohort AS k
      FROM a JOIN f ON a.user_id = f.user_id),
s AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
      FROM f GROUP BY cohort)
SELECT j.cohort AS cohort_period, j.k AS periods_since,
       CAST(count(*) AS BIGINT) AS n_active, s.cohort_size,
       count(*)::DOUBLE / s.cohort_size::DOUBLE AS retention
FROM j JOIN s ON j.cohort = s.cohort
GROUP BY j.cohort, j.k, s.cohort_size
"""


# name -> (query fn, oracle SQL) — the exact shape queries.py registers
STAGED = {
    "domain_cap": (q_domain_cap, ORACLE_DOMAIN_CAP),
    "unimax_mixture": (q_unimax_mixture, ORACLE_UNIMAX),
    "quantile_normalize": (q_quantile_normalize, ORACLE_QUANTILE_NORMALIZE),
    "dedup_incremental_fuzzy": (q_fuzzy_incremental, ORACLE_FUZZY_INCREMENTAL),
    "funnel_steps": (q_funnel_steps, ORACLE_FUNNEL),
    "cohort_retention": (q_cohort_retention, ORACLE_COHORT),
}
