"""Staged query/oracle pairs — the validated spare pool.

Round 8 promoted funnel_steps, domain_cap, dedup_incremental_fuzzy,
cohort_retention and unimax_mixture into ``queries.py`` proper (the
registry now sits at its sustainable capacity of 100 = the driver's
50 correctness rows/round × the ≤2-round evidence-freshness goal).

``quantile_normalize`` stays here as the validated spare: its
``(query fn, oracle SQL)`` pair is exercised against DuckDB every test
run by ``tests/test_staged_queries.py`` at sf0.001 + sf0.01, so it can
be swapped into the registry (one ``@query`` block) the moment a
registered query is retired or consolidated — see COVERAGE.md
"Registry capacity" for the consolidation policy.

Nothing imports this module at runtime.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from file_d_spark.functions import corpus, text
from file_d_spark.tables import load_table


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


# name -> (query fn, oracle SQL) — the exact shape queries.py registers
STAGED = {
    "quantile_normalize": (q_quantile_normalize, ORACLE_QUANTILE_NORMALIZE),
}
