"""Batch-mode analogues of the stateful shedding operators: throttle,
cardinality, antispam.  (Streaming versions with true cross-batch
state live in file_d_spark/streaming/stateful.py.)

Reference cites:
  throttle     /root/reference/plugin/action/throttle/throttle.go:60-140,512
               buckets ring /root/reference/plugin/action/throttle/buckets.go:7-33
  cardinality  /root/reference/plugin/action/cardinality/cardinality.go:126-169,259
  antispam     /root/reference/pipeline/antispam/antispammer.go:24-120

Batch semantics:
  throttle     events are bucketed into tumbling windows of
               ``bucket_interval``; within each (key, bucket) the first
               ``limit`` events in arrival order are admitted, the rest
               dropped.  Events older than ``buckets_count *
               bucket_interval`` behind the max timestamp are dropped
               (the reference's dead-time cutoff).  Implemented with a
               single window/row_number — one shuffle on (key, bucket),
               which AQE splits if a key is skewed.
  cardinality  per-key distinct count of a field; keys over ``limit``
               either drop their events, lose the field, or pass.
  antispam     per-(source, maintenance-window) counts; sources over
               ``threshold`` have their events dropped (exceptions by
               prefix/contains/suffix rules pass).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from file_d_spark import xtime
from file_d_spark.actions.base import Action, register
from file_d_spark.fields import get_col_safe, parse_selector


def _parse_duration_seconds(v, default: float) -> float:
    if v is None:
        return default
    if isinstance(v, (int, float)):
        return float(v)
    s = str(v).strip()
    units = {"ns": 1e-9, "us": 1e-6, "ms": 1e-3, "s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0}
    import re

    m = re.fullmatch(r"([\d.]+)\s*([a-z]*)", s)
    if not m:
        return default
    num, unit = float(m.group(1)), m.group(2) or "s"
    return num * units.get(unit, 1.0)


@register("throttle")
class Throttle(Action):
    def apply_impl(self, df: DataFrame, pred: Column | None) -> DataFrame:
        if df.isStreaming:
            from file_d_spark.streaming import throttle_stream

            return throttle_stream(
                df,
                key_col=self.params.get("throttle_field", ""),
                ts_col=self.params.get("time_field", "time"),
                bucket_interval_s=int(
                    _parse_duration_seconds(self.params.get("bucket_interval"), 60.0)
                ),
                buckets_count=int(self.params.get("buckets_count", 60)),
                limit=int(self.params.get("default_limit", 5000)),
            )
        key_field = self.params.get("throttle_field", "")
        time_field = self.params.get("time_field", "time")
        time_fmt = self.params.get("time_field_format", "rfc3339nano")
        bucket_s = _parse_duration_seconds(self.params.get("bucket_interval"), 60.0)
        buckets_count = int(self.params.get("buckets_count", 60))
        limit = int(self.params.get("default_limit", 5000))
        limit_kind = self.params.get("limit_kind", "count")
        size_field = self.params.get("limit_size_field", "")

        key = (
            get_col_safe(parse_selector(key_field), df.schema).cast("string")
            if key_field
            else F.lit("")
        )
        tcol = get_col_safe(parse_selector(time_field), df.schema)
        from pyspark.sql import types as T

        t = df.schema[time_field].dataType if time_field in df.columns else None
        ts = tcol if isinstance(t, T.TimestampType) else xtime.parse_time(tcol, time_fmt)
        ts = F.coalesce(ts, F.current_timestamp())

        bucket = F.floor(F.unix_timestamp(ts) / F.lit(int(bucket_s)))
        df = (
            df.withColumn("__fd_key__", key)
            .withColumn("__fd_bucket__", bucket)
            .withColumn("__fd_ts__", ts)
        )
        # dead-time cutoff: older than the ring horizon vs newest event
        horizon = F.max("__fd_ts__").over(Window.partitionBy(F.lit(1)))
        in_window = F.unix_timestamp("__fd_ts__") > (
            F.unix_timestamp(horizon) - F.lit(int(bucket_s * buckets_count))
        )
        # arrival order within a bucket; extra order_fields give a
        # deterministic tiebreak for equal timestamps (batch mode)
        order_cols = [F.col("__fd_ts__")] + [
            F.col(c) for c in self.params.get("order_fields", [])
        ]
        w = Window.partitionBy("__fd_key__", "__fd_bucket__").orderBy(*order_cols)
        dist_cfg = self.params.get("limit_distribution") or {}
        if dist_cfg.get("field") and dist_cfg.get("ratios"):
            # per-value ratio shares of the limit
            # (/root/reference/plugin/action/throttle/distribution.go:33-90):
            # group i gets round(ratio_i*limit); unlisted values share
            # round((1-sum)*limit)
            dist_field = get_col_safe(
                parse_selector(dist_cfg["field"]), df.schema
            ).cast("string")
            ratios = dist_cfg["ratios"]
            idx_expr = F.lit(-1)
            group_limits = []
            for i, r in enumerate(ratios):
                idx_expr = F.when(
                    dist_field.isin([str(v) for v in r["values"]]), F.lit(i)
                ).otherwise(idx_expr)
                group_limits.append(round(float(r["ratio"]) * limit))
            def_ratio = round(1 - sum(float(r["ratio"]) for r in ratios), 2)
            def_limit = round(def_ratio * limit)
            limit_expr = F.element_at(
                F.array(*[F.lit(x) for x in group_limits + [def_limit]]),
                F.when(idx_expr >= 0, idx_expr + 1).otherwise(len(group_limits) + 1),
            )
            df = df.withColumn("__fd_dist__", F.when(idx_expr >= 0, idx_expr).otherwise(F.lit(-1)))
            wd = Window.partitionBy("__fd_key__", "__fd_bucket__", "__fd_dist__").orderBy(
                *order_cols
            )
            admitted = F.row_number().over(wd) <= limit_expr
        elif limit_kind == "size" and size_field:
            size_col = F.octet_length(
                get_col_safe(parse_selector(size_field), df.schema).cast("string")
            )
            running = F.sum(size_col).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            )
            admitted = running <= F.lit(limit)
        else:
            admitted = F.row_number().over(w) <= F.lit(limit)
        # window exprs can't live in a WHERE clause — materialize first
        out = (
            df.withColumn("__fd_keep__", in_window & admitted)
            .filter(F.col("__fd_keep__"))
        )
        return out.drop(
            "__fd_key__", "__fd_bucket__", "__fd_ts__", "__fd_keep__", "__fd_dist__"
        )


@register("cardinality")
class Cardinality(Action):
    """Limit per-key distinct values of ``fields``.  Batch: exact
    count(distinct) via one aggregation, broadcast back (keys are few
    relative to events).  action: discard|remove_fields|nothing."""

    def apply_impl(self, df: DataFrame, pred: Column | None) -> DataFrame:
        key_field = self.params["key"]
        fields = self.params.get("fields", [])
        limit = int(self.params.get("limit", 1000))
        mode = self.params.get("action", "discard")
        if df.isStreaming:
            from file_d_spark.streaming import cardinality_stream

            return cardinality_stream(df, key_field, fields[0], limit, mode)

        key = get_col_safe(parse_selector(key_field), df.schema).cast("string")
        probe = F.concat_ws(
            "",
            *[
                get_col_safe(parse_selector(f), df.schema).cast("string")
                for f in fields
            ],
        )
        per_key = (
            df.withColumn("__fd_k__", key)
            .withColumn("__fd_v__", probe)
            .groupBy("__fd_k__")
            .agg(F.countDistinct("__fd_v__").alias("__fd_card__"))
            .filter(F.col("__fd_card__") > limit)
            .select("__fd_k__")
        )
        over_limit = F.broadcast(per_key)
        tagged = df.withColumn("__fd_k__", key)
        if mode == "discard":
            out = tagged.join(over_limit, "__fd_k__", "left_anti")
            return out.drop("__fd_k__")
        if mode == "remove_fields":
            flagged = tagged.join(
                over_limit.withColumn("__fd_over__", F.lit(True)),
                "__fd_k__",
                "left",
            )
            for f in fields:
                parts = parse_selector(f)
                old = get_col_safe(parts, df.schema)
                from file_d_spark.fields import set_field

                flagged = set_field(
                    flagged,
                    parts,
                    F.when(F.col("__fd_over__").isNull(), old),
                )
            return flagged.drop("__fd_k__", "__fd_over__")
        return tagged.drop("__fd_k__")


@register("antispam")
class Antispam(Action):
    """Ban sources emitting more than ``threshold`` events per
    ``maintenance_interval`` window; exception rules pass through."""

    def apply_impl(self, df: DataFrame, pred: Column | None) -> DataFrame:
        source_field = self.params.get("source_field", "source_name")
        time_field = self.params.get("time_field", "ts")
        threshold = int(self.params.get("threshold", 0))
        interval_s = _parse_duration_seconds(
            self.params.get("maintenance_interval"), 60.0
        )
        if threshold <= 0:
            return df
        if df.isStreaming:
            from file_d_spark.streaming import antispam_stream

            return antispam_stream(
                df, source_field, threshold, int(interval_s * 1000)
            )
        exceptions = self.params.get("exceptions", [])

        src = get_col_safe(parse_selector(source_field), df.schema).cast("string")
        tcol = get_col_safe(parse_selector(time_field), df.schema)
        from pyspark.sql import types as T

        t = df.schema[time_field].dataType if time_field in df.columns else None
        ts = tcol if isinstance(t, T.TimestampType) else xtime.parse_time(tcol, None)
        win = F.floor(F.unix_timestamp(F.coalesce(ts, F.current_timestamp())) / F.lit(int(interval_s)))

        exc_pred = F.lit(False)
        for rule in exceptions:
            field = rule.get("field", source_field)
            col = get_col_safe(parse_selector(field), df.schema).cast("string")
            values = rule.get("values", [])
            if not rule.get("case_sensitive", True):
                col = F.lower(col)
                values = [str(v).lower() for v in values]
            mode = rule.get("mode", "contains")
            p = F.lit(False)
            for v in values:
                v = str(v)
                if mode == "prefix":
                    p = p | col.startswith(v)
                elif mode == "suffix":
                    p = p | col.endswith(v)
                else:
                    p = p | col.contains(v)
            if rule.get("invert", False):
                p = ~p
            exc_pred = exc_pred | p

        tagged = (
            df.withColumn("__fd_src__", src)
            .withColumn("__fd_win__", win)
            .withColumn("__fd_exc__", exc_pred)
        )
        counts = (
            tagged.filter(~F.col("__fd_exc__"))
            .groupBy("__fd_src__", "__fd_win__")
            .agg(F.count(F.lit(1)).alias("__fd_n__"))
            .filter(F.col("__fd_n__") > threshold)
            .select("__fd_src__", "__fd_win__")
        )
        out = tagged.join(
            F.broadcast(counts), ["__fd_src__", "__fd_win__"], "left_anti"
        ).unionByName(
            tagged.join(F.broadcast(counts), ["__fd_src__", "__fd_win__"], "left_semi").filter(
                F.col("__fd_exc__")
            )
        )
        return out.drop("__fd_src__", "__fd_win__", "__fd_exc__")
