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

The pool is currently EMPTY.  When the next implemented-ahead operator
lands, stage it here as ``name: (query fn, oracle SQL)`` — the exact
shape ``queries.py`` registers — and ``tests/test_staged_queries.py``
will run the driver's compare against DuckDB at sf0.001 + sf0.01 on
every pytest run until a slot opens.

Nothing imports this module at runtime.
"""

from __future__ import annotations

# name -> (query fn, oracle SQL)
STAGED: dict = {}
