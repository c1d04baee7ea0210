"""Ordered-funnel analysis over an event stream: for each user, the
earliest strictly-ordered completion of a step sequence (view ->
click -> purchase), the classic product-analytics funnel.

Semantics (the standard "earliest completion" rule): t1 is the user's
earliest step-1 event; t_i (i > 1) is the earliest step-i event
STRICTLY AFTER t_{i-1}.  A user completes the funnel when every t_i
exists.  Greedy-earliest is correct here: taking the earliest
possible t_{i-1} never eliminates a later completion, since any
step-i event usable with a later t_{i-1} is also usable with an
earlier one.

Scale shape: K-1 keyed equi-joins, one per step transition — each
stage joins the (user -> t_{i-1}) frame (ONE row per user, shrinking
every stage) against only the step-i slice of the events (narrow
filter pushed to the scan), then min-aggregates back to one row per
user.  No windows at all, so a bot user with millions of events
never serializes a task: the per-step min condenses map-side, and the
joins are uniform user-keyed shuffles (AQE splits a skewed user).
Timestamps travel as exact epoch-micro bigints — no float time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Per-user earliest strict-order completion times for ``steps``.

    Returns one row per user who performed step 1:
    ``(user, t_1, ..., t_K, completed)`` with ``t_i`` as epoch-micro
    bigints (null once the chain breaks) and ``completed`` true when
    every step matched in order.
    """
    if len(steps) < 2:
        raise ValueError("funnel_steps: need at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel_steps: duplicate steps in {steps}")
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    events = df.select(
        F.col(user_col).alias("__u__"),
        micros.alias("__t__"),
        F.col(type_col).alias("__ty__"),
    )
    stage = (
        events.filter(F.col("__ty__") == steps[0])
        .groupBy("__u__")
        .agg(F.min("__t__").alias("t_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col("__ty__") == step)
            .join(stage.select("__u__", F.col(f"t_{i-1}")), "__u__")
            .filter(F.col("__t__") > F.col(f"t_{i-1}"))
            .groupBy("__u__")
            .agg(F.min("__t__").alias(f"t_{i}"))
        )
        stage = stage.join(nxt, "__u__", "left")
    return stage.select(
        F.col("__u__").alias(user_col),
        *[F.col(f"t_{i}") for i in range(1, len(steps) + 1)],
        F.col(f"t_{len(steps)}").isNotNull().alias("completed"),
    )


_PERIOD_MICROS = {
    "day": 86_400_000_000,
    "week": 7 * 86_400_000_000,
}


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-seen
    period; for each cohort and each later period offset k, how many
    of them came back.

    Returns ``(cohort_period, periods_since, n_active, cohort_size,
    retention)`` — one row per (cohort, offset) that had any activity;
    ``periods_since = 0`` rows carry ``n_active == cohort_size``.
    Periods are integer epoch-micro divisions (``epoch_us div
    period_micros``) — truncating integer arithmetic, identical on any
    engine; ``retention`` is the single double division
    n_active/cohort_size.

    Scale shape: two user-keyed aggregations (first-seen min; distinct
    (user, period) activity), one user-keyed equi-join between them
    (uniform key, AQE-splittable), then a groupBy on (cohort, offset)
    whose cardinality is periods² — tiny.  No windows, no sort: a
    years-long event history with bot users never serializes a task.
    """
    if period not in _PERIOD_MICROS:
        raise ValueError(
            f"cohort_retention: period must be one of "
            f"{sorted(_PERIOD_MICROS)}, got {period!r}"
        )
    ev = df.select(
        F.col(user_col).alias("__u__"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__t__"),
    ).select("__u__", F.expr("__t__ div " + str(_PERIOD_MICROS[period])).alias("__p__"))
    first = ev.groupBy("__u__").agg(F.min("__p__").alias("__cohort__"))
    active = ev.distinct()
    joined = active.join(first, "__u__").select(
        "__cohort__", (F.col("__p__") - F.col("__cohort__")).alias("__k__")
    )
    sizes = first.groupBy("__cohort__").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    out = (
        joined.groupBy("__cohort__", "__k__")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(sizes), "__cohort__")
    )
    return out.select(
        F.col("__cohort__").alias("cohort_period"),
        F.col("__k__").alias("periods_since"),
        "n_active",
        "cohort_size",
        (
            F.col("n_active").cast("double")
            / F.col("cohort_size").cast("double")
        ).alias("retention"),
    )
