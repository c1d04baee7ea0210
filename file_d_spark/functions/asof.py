"""As-of (temporal lookup) join: for each left row, the single right
row with the greatest right_ts <= left_ts (backward; the default) or
the smallest right_ts >= left_ts (forward), per join key.

The reference has no relational joins at all (SURVEY.md §2.5) — its
only join-like structure is the k8s lookup enrichment — but latest-
state-as-of-event-time enrichment is the temporal join every log/
training-data pipeline needs (attach the config/model/price in effect
when the event happened).

Scale design: NOT a range join (which explodes to |L|x|R| candidates
per key before filtering).  Both sides are tagged and unioned, then a
single window per key ordered by (ts, tag) carries the most recent
right payload forward with last(ignorenulls) over an unbounded-
preceding frame.  Cost is ONE shuffle of |L|+|R| rows on the join key
and a linear in-partition scan — the same plan shape at any scale,
skew governed by AQE like any keyed window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str] | str,
    point_ts: str = "ts",
    start_ts: str = "start",
    end_ts: str = "end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join: each point row pairs with every interval
    row of the same key whose [start, end) contains the point's
    timestamp (inner join; a point inside k intervals yields k rows).

    Scale design: NOT an inequality theta-join (Spark would plan a
    BroadcastNestedLoop / cartesian per key and filter |P|x|I| pairs).
    Time is cut into fixed ``bucket_seconds`` buckets; each interval
    explodes over the buckets it covers, points map to one bucket, and
    the match is an EQUI-join on (key, bucket) + the exact range
    predicate.  Shuffle volume is |P| + |I| * avg_buckets_per_interval
    — linear as long as interval length is bounded by a few buckets
    (pick bucket_seconds near the typical interval length).
    """
    keys = [on] if isinstance(on, str) else list(on)
    b = F.lit(bucket_seconds * 1_000_000)

    def bucket(micros: Column) -> Column:
        # floor-div (not cast-truncate) so pre-epoch timestamps bucket
        # consistently on both sides
        return F.floor(micros / b).cast("long")

    p = points.withColumn("__bucket__", bucket(F.unix_micros(F.col(point_ts))))
    i = intervals.withColumn(
        "__bucket__",
        F.explode(
            F.sequence(
                bucket(F.unix_micros(F.col(start_ts))),
                # end is exclusive, but a zero-length tail still needs
                # its bucket: clamp to at least the start bucket
                F.greatest(
                    bucket(F.unix_micros(F.col(end_ts)) - 1),
                    bucket(F.unix_micros(F.col(start_ts))),
                ),
            )
        ),
    )
    joined = p.join(i, keys + ["__bucket__"]).filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    )
    return joined.drop("__bucket__")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join.  Every left row survives (left outer); matched
    right columns arrive suffixed, null when no right row qualifies.

    ``direction='backward'``: latest right row with right_ts <= left_ts.
    ``direction='forward'``:  earliest right row with right_ts >= left_ts.
    ``tolerance_seconds``: match only within the given horizon.

    Right-side determinism: if several right rows share (key, ts) the
    LAST one in right's natural column order wins is not well-defined —
    pre-dedup the right side (e.g. max event id per (key, ts)) for a
    deterministic result; this function asserts nothing about such ties.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: bad direction {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)

    right_payload = [c for c in right.columns if c not in keys]
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__ts__"),
        F.lit(1).alias("__tag__"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l__"),
        F.lit(None).cast(
            right.select(F.struct(*right_payload).alias("s")).schema["s"].dataType
        ).alias("__r__"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__ts__"),
        F.lit(0).alias("__tag__"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__l__"),
        F.struct(*right_payload).alias("__r__"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # backward: right rows must sort BEFORE a left row at equal ts so
    # ts-equality counts as a match (>=); forward mirrors by reversing
    # the scan direction.
    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts__").asc(), F.col("__tag__").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts__").desc(), F.col("__tag__").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    matched = unioned.withColumn(
        "__match__", F.last("__r__", ignorenulls=True).over(w)
    ).withColumn(
        "__match_ts__",
        F.last(F.when(F.col("__tag__") == 0, F.col("__ts__")), ignorenulls=True).over(w),
    )
    out = matched.filter(F.col("__tag__") == 1)
    if tolerance_seconds is not None:
        horizon = F.abs(
            F.unix_micros(F.col("__ts__")) - F.unix_micros(F.col("__match_ts__"))
        ) <= F.lit(int(tolerance_seconds * 1_000_000))
        out = out.withColumn(
            "__match__", F.when(horizon, F.col("__match__"))
        ).withColumn("__match_ts__", F.when(horizon, F.col("__match_ts__")))
    return out.select(
        *[F.col(f"__l__.{c}").alias(c) for c in left.columns],
        *[
            F.col(f"__match__.{c}").alias(f"{c}{suffix}" if c in left.columns else c)
            for c in right_payload
        ],
    )
