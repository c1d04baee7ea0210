"""Session-wide registry of DataFrames cached INSIDE operator plans.

Library functions (dedup.jaccard_pairs, similarity.semantic_dedup, ...)
cache intermediate frames that outlive the function call — the caller's
returned plan references them.  Harnesses that run many queries in one
session (the driver's 80+-query sweep, bench iterations) must be able
to drop those cached partitions once a result is materialized, without
knowing each operator's internals; otherwise cached shingle/assignment
frames accumulate for the session lifetime.

Every internal ``.cache()`` in the library goes through
:func:`register` so :func:`release` (re-exported as
``queries.release_caches``) covers the whole repo uniformly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CACHED: list[DataFrame] = []


def register(df: DataFrame) -> DataFrame:
    """Record ``df`` (already marked ``.cache()``/``.persist()``, or
    backed by a ``localCheckpoint``) for release; returns it unchanged
    so call sites stay expressions."""
    CACHED.append(df)
    return df


def release() -> None:
    """Unpersist every registered frame; safe after session stop.

    Only call once the registered frames' results are MATERIALIZED and
    their plans are dead: a ``localCheckpoint``-backed frame's blocks
    are its only copy (no lineage to recompute), so unpersisting one
    that is still referenced by a live plan breaks that plan.  Regular
    ``DataFrame.unpersist`` does not touch checkpoint RDDs (they are
    persisted at the RDD layer), so checkpointed frames — analyzed
    plan == LogicalRDD — get their backing RDD unpersisted directly;
    without this they linger in getPersistentRDDs until the JVM
    ContextCleaner happens to GC them."""
    while CACHED:
        df = CACHED.pop()
        try:
            df.unpersist()
        except Exception:
            pass
        try:
            plan = df._jdf.queryExecution().analyzed()
            if plan.getClass().getSimpleName() == "LogicalRDD":
                plan.rdd().unpersist(False)
        except Exception:
            pass
