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

Current spare: ``bpe_fertility`` — per-language tokenizer fertility
with the REAL corpus-trained BPE merges (the fidelity upgrade over
``token_fertility``'s regex proxy), sharing ``functions/bpe.py`` and
the unrolled-CTE oracle generator with the registered
``bpe_train_apply``.

Nothing imports this module at runtime.
"""

from __future__ import annotations

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


# name -> (query fn, oracle SQL)
STAGED: dict = {
    "bpe_fertility": (q_bpe_fertility, _fertility_oracle()),
}
