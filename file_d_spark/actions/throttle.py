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
               dropped.  Events outside the ``buckets_count`` ring
               (vs the newest timestamp, the batch analogue of the
               wall clock) are CLAMPED into the latest bucket and
               counted there (buckets.go:231-235 rebuildBuckets).
               Implemented with a single window — one shuffle on
               (key, bucket), which AQE splits if a key is skewed;
               limit_distribution configs switch to an exact
               sequential replay per (key, bucket, rule) because
               default-reserve stealing is order-dependent — since
               r13 a JVM-side generated ``aggregate()`` fold (no
               Python in the plan); an Arrow applyInPandas replay
               remains as the fallback for schemas with unorderable
               column types (maps, variants, …) and as the A/B
               parity harness (``exact_backend: arrow``).
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


def _validate_distribution(dist: dict) -> None:
    """parseLimitDistribution validation (distribution.go:33-90):
    ratios in [0,1], non-empty values, no duplicates, sum <= 1."""
    ratios = dist.get("ratios") or []
    seen: set[str] = set()
    total = 0.0
    for i, r in enumerate(ratios):
        ratio = float(r.get("ratio", -1))
        if ratio < 0 or ratio > 1:
            raise ValueError("'ratio' value must be in range [0.0;1.0]")
        if not r.get("values"):
            raise ValueError(f"empty 'values' in ratio #{i}")
        for v in r["values"]:
            if str(v) in seen:
                raise ValueError(f"value '{v}' is duplicated in 'ratios' list")
            seen.add(str(v))
        total += ratio
    if total > 1 + 1e-9:
        raise ValueError("sum of ratios must be less than or equal to 1")


def _rule_dlims(spec: dict) -> list[int] | None:
    """Per-distribution limits for one rule: [default reserve,
    ratio_1 limit, ..., ratio_m limit] (parseLimitDistribution,
    distribution.go:52-88: each limit = round(ratio * total), the
    default reserve = round(round((1 - sum) * 100) / 100 * total)) —
    or None when the rule has no distribution."""
    d = spec["dist"]
    if not (d.get("field") and d.get("ratios")):
        return None
    ratios = d["ratios"]
    dlims = [round(float(r["ratio"]) * spec["limit"]) for r in ratios]
    def_ratio = round(1 - sum(float(r["ratio"]) for r in ratios), 2)
    return [round(def_ratio * spec["limit"])] + dlims


def _type_unorderable(dt) -> bool:
    """True if the type tree contains a type Catalyst can't order —
    structs with such fields can't go through array_sort, so the JVM
    exact-replay path cannot be planned and the Arrow replay must
    take over.  A WHITELIST mirroring RowOrdering.isOrderable
    (atomic/null orderable; struct/array/UDT recurse; everything
    else — map, variant, calendar-interval, future types — fails
    CLOSED to the Arrow route) rather than a blacklist that each new
    unorderable type would slip past."""
    from pyspark.sql import types as T

    if isinstance(dt, T.StructType):
        return any(_type_unorderable(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _type_unorderable(dt.elementType)
    if isinstance(dt, T.UserDefinedType):
        return _type_unorderable(dt.sqlType())
    # PySpark classes VariantType under AtomicType even though
    # Catalyst has no ordering for it — carve it out of the whitelist
    variant = getattr(T, "VariantType", None)
    if variant is not None and isinstance(dt, variant):
        return True
    return not isinstance(dt, (T.AtomicType, T.NullType))


def _didx_expr(specs: list[dict], schema) -> Column:
    """Per-row distribution index: 0 = the matched rule's default
    group, j+1 = its ratios[j] (idxByKey semantics), -1 for rules
    without a distribution — ONE definition shared by the Arrow
    replay, the JVM fold, and the streaming state path so the three
    backends cannot desynchronize."""
    didx = F.lit(-1)
    for i, s in enumerate(specs):
        d = s["dist"]
        if not (d.get("field") and d.get("ratios")):
            continue
        field_val = get_col_safe(parse_selector(d["field"]), schema).cast(
            "string"
        )
        idx_expr = F.lit(0)
        for j, r in enumerate(d["ratios"]):
            idx_expr = F.when(
                field_val.isin([str(v) for v in r["values"]]), F.lit(j + 1)
            ).otherwise(idx_expr)
        didx = F.when(F.col("__fd_rule__") == i, idx_expr).otherwise(didx)
    return didx


def _counted_expr(specs: list[dict], size_col: Column) -> Column:
    """Per-row counted value: 1 for count-kind rules, the size column
    for size-kind ones — shared by all three admission backends."""
    counted = F.lit(1)
    for i, s in enumerate(specs):
        if s["kind"] == "size":
            counted = F.when(
                F.col("__fd_rule__") == i, size_col
            ).otherwise(counted)
    return counted


def _dist_fold_sql(spec: dict, evs: str = "__evs__") -> str:
    """One rule's sequential-admission replay as a Spark SQL
    ``aggregate()`` fold over the sorted event array — the JVM twin of
    ``_admit_exact``'s Python loop (in_memory_limiter.go isAllowed +
    getDistrData), generated as SQL text (the product_quantize
    pattern: one expr, no py4j Column-building per step).

    Accumulator: (occ array<bigint> — per-distribution bucket
    occupancy, charged by EVERY counted event, admitted or not, like
    the reference's buckets.add-before-check — and kept, the admitted
    events).  A default event over its reserve steals from the
    most-free distribution (ties to the smallest index via
    array_position's first-match, mirroring the reference's strict
    `>` scan); if nothing fits it stays on the default bucket and is
    rejected there.  kept grows only on admission, so the per-step
    array copy is bounded by the CONFIG (≈ sum(dlims) admissions per
    (key, bucket, rule) group), keeping the fold linear in group
    size — with one caveat: size-kind rules count ``octet_length``,
    which is 0 for an empty-string field, and zero-cost events admit
    without consuming budget, so a group flooded with empty-field
    events degrades the kept copy to quadratic (admission results
    stay correct and Arrow-identical; only the linearity bound
    weakens — the Arrow backend is the escape hatch for that shape)."""
    lim = int(spec["limit"])
    if lim < 0:
        return evs  # negative limit = unlimited: every event admitted
    dlims = _rule_dlims(spec)
    if dlims is None:
        # single running counter — same shape the window path uses,
        # expressed as a fold so every rule shares one CASE branch type
        return (
            f"aggregate({evs}, "
            f"named_struct('occ', CAST(0 AS BIGINT), 'kept', slice({evs}, 1, 0)), "
            "(acc, e) -> named_struct("
            "'occ', acc.occ + e.c, "
            f"'kept', IF(acc.occ + e.c <= {lim}L, "
            "concat(acc.kept, array(e)), acc.kept)), "
            "acc -> acc.kept)"
        )
    m = len(dlims) - 1
    dl_arr = "array(" + ", ".join(f"{v}L" for v in dlims) + ")"
    diffs = ", ".join(
        f"{dlims[j]}L - element_at(acc.occ, {j + 1}) - e.c"
        for j in range(1, m + 1)
    )
    steal = (
        f"transform(array(array({diffs})), ds -> "
        "IF(array_max(ds) >= 0L, "
        "CAST(array_position(ds, array_max(ds)) AS INT), 0))[0]"
    )
    idx = (
        "IF(e.d != 0, e.d, "
        f"IF(element_at(acc.occ, 1) + e.c <= {dlims[0]}L, 0, {steal}))"
    )
    merge = (
        f"transform(array({idx}), ix -> named_struct("
        "'occ', transform(acc.occ, (o, oi) -> IF(oi = ix, o + e.c, o)), "
        f"'kept', IF(element_at(acc.occ, ix + 1) + e.c "
        f"<= element_at({dl_arr}, ix + 1), "
        "concat(acc.kept, array(e)), acc.kept)))[0]"
    )
    init = (
        f"named_struct('occ', array_repeat(CAST(0 AS BIGINT), {m + 1}), "
        f"'kept', slice({evs}, 1, 0))"
    )
    return f"aggregate({evs}, {init}, (acc, e) -> {merge}, acc -> acc.kept)"


def _require_ungated_stream(pred: Column | None, name: str) -> None:
    """Streaming statefuls run through applyInPandasWithState keyed on
    the op's own key — a do_if gate would need a second keyed state
    path.  Match the shape-changing actions' behavior: refuse loudly
    rather than silently treating the gate as unconditional
    (/root/reference/pipeline/processor.go:190-243 gates every plugin)."""
    if pred is not None:
        raise ValueError(
            f"action {name!r}: do_if/match_fields gating is not supported "
            "in streaming mode; gate the stream with a discard action or "
            "split the pipeline instead"
        )


@register("throttle")
class Throttle(Action):
    def apply_impl(self, df: DataFrame, pred: Column | None) -> DataFrame:
        if df.isStreaming:
            return self._apply_stream(df, pred)
        key_field = self.params.get("throttle_field", "")
        time_field = self.params.get("time_field", "time")
        time_fmt = self.params.get("time_field_format", "rfc3339nano")
        bucket_s = _parse_duration_seconds(self.params.get("bucket_interval"), 60.0)
        buckets_count = int(self.params.get("buckets_count", 60))
        limit = int(self.params.get("default_limit", 5000))
        limit_kind = self.params.get("limit_kind", "count")
        size_field = self.params.get("limit_size_field", "")

        # rule list: config rules in order, then the implicit default
        # rule (matches everything) — first match wins, and each rule
        # owns its own limiters (throttle.go:117-125,467-475: limiter
        # key embeds the rule index, so counting is per (rule, key))
        specs = []
        for rcfg in self.params.get("rules") or []:
            specs.append(
                {
                    "limit": int(rcfg.get("limit", limit)),
                    "kind": rcfg.get("limit_kind", "count"),
                    "conditions": rcfg.get("conditions") or {},
                    "dist": rcfg.get("limit_distribution") or {},
                }
            )
        specs.append(
            {
                "limit": limit,
                "kind": limit_kind,
                "conditions": {},
                "dist": self.params.get("limit_distribution") or {},
            }
        )
        for s in specs:
            if s["dist"].get("field") or s["dist"].get("ratios"):
                _validate_distribution(s["dist"])

        key = (
            get_col_safe(parse_selector(key_field), df.schema).cast("string")
            if key_field
            else F.lit("")
        )
        tcol = get_col_safe(parse_selector(time_field), df.schema)
        from pyspark.sql import types as T

        t = df.schema[time_field].dataType if time_field in df.columns else None
        # loud on un-timestampable types; parse failures -> null bucket
        # (never backfill wall clock — see round-2 postmortem)
        ts = xtime.ensure_timestamp(tcol, t, time_fmt, context="throttle time_field")

        # first matching rule index (conditions are an AND field map,
        # rule.go:50-59: string equality per field)
        def rule_cond(conditions: dict) -> Column:
            cond = F.lit(True)
            for fld, val in conditions.items():
                col = get_col_safe(parse_selector(str(fld)), df.schema)
                cond = cond & (col.cast("string") == F.lit(str(val)))
            return cond

        rule_idx = F.lit(len(specs) - 1)
        for i in reversed(range(len(specs) - 1)):
            rule_idx = F.when(rule_cond(specs[i]["conditions"]), F.lit(i)).otherwise(
                rule_idx
            )

        size_col = (
            F.octet_length(
                get_col_safe(parse_selector(size_field), df.schema).cast("string")
            )
            if size_field
            else F.lit(1)
        )

        # micros-based buckets so sub-second intervals (100ms in the
        # reference tests) don't truncate to a zero-width bucket
        bucket_us = max(1, int(bucket_s * 1e6))
        bucket = F.floor(F.unix_micros(ts) / F.lit(bucket_us))
        # rows failing the gate bypass the action entirely: always kept,
        # never counted against any limit (processor.go:190-243 semantics)
        match = F.lit(True) if pred is None else pred
        # one projection hop for all five helper columns: the helpers
        # derive only from pre-existing event columns, so the batched
        # withColumns is equivalent to the chained form (r13 — each
        # chained withColumn was a fresh DataFrame + py4j round trips)
        df = df.withColumns(
            {
                "__fd_key__": key,
                "__fd_bucket__": bucket,
                "__fd_ts__": ts,
                "__fd_m__": match,
                "__fd_rule__": rule_idx,
            }
        )
        # bucket-ring clamp (buckets.go:231-235 rebuildBuckets: "events
        # from past or future goes to the latest bucket" — they are
        # counted there, NOT dropped).  The batch analogue of the wall
        # clock is the newest event timestamp; the scalar agg +
        # broadcast cross-join avoids a single-partition global window.
        hmax = df.filter(F.col("__fd_m__")).agg(
            F.max("__fd_ts__").alias("__fd_hmax__")
        )
        df = df.crossJoin(F.broadcast(hmax))
        max_bucket = F.floor(F.unix_micros("__fd_hmax__") / F.lit(bucket_us))
        min_bucket = max_bucket - F.lit(int(buckets_count) - 1)
        df = df.withColumn(
            "__fd_bucket__",
            F.when(
                (F.col("__fd_bucket__") < min_bucket)
                | (F.col("__fd_bucket__") > max_bucket),
                max_bucket,
            ).otherwise(F.col("__fd_bucket__")),
        )
        # arrival order within a bucket; extra order_fields give a
        # deterministic tiebreak for equal timestamps (batch mode)
        order_cols = [F.col("__fd_ts__")] + [
            F.col(c) for c in self.params.get("order_fields", [])
        ]

        helper_cols = [
            "__fd_key__", "__fd_bucket__", "__fd_ts__",
            "__fd_m__", "__fd_hmax__", "__fd_rule__",
        ]
        any_dist = any(
            s["dist"].get("field") and s["dist"].get("ratios") for s in specs
        )
        if any_dist:
            # distributions have sequential semantics — a default-group
            # event over its reserve STEALS from the most-free
            # distribution at that instant (in_memory_limiter.go
            # getDistrData) — which no window expression can replay.
            # Exact replay per (key, bucket, rule) group; parallelism
            # across groups, faithful sequential replay within one.
            # Default backend is a JVM-side aggregate() fold (r13 —
            # no Python in the plan); the Arrow applyInPandas replay
            # stays as the fallback for schemas the fold's struct
            # array_sort can't order (maps, variants) and as the A/B
            # parity harness (exact_backend: arrow).
            backend = self.params.get("exact_backend") or (
                "arrow" if _type_unorderable(df.schema) else "jvm"
            )
            admit = (
                self._admit_exact_jvm if backend == "jvm" else self._admit_exact
            )
            return admit(
                df,
                specs,
                size_col,
                list(self.params.get("order_fields", [])),
                helper_cols,
            )

        # per-row (counted value, limit) from the matched rule — the
        # counted value through the SAME shared projection the
        # dist/stream/Arrow backends use (one definition, no drift)
        counted = _counted_expr(specs, size_col)
        limit_col = F.lit(limit)
        for i, spec in enumerate(specs):
            limit_col = F.when(
                F.col("__fd_rule__") == i, F.lit(spec["limit"])
            ).otherwise(limit_col)

        # shared (cross-pipeline) limits: central overrides fetched at
        # plan-build time — the batch analogue of the reference's
        # periodic updateKeyLimit tick (redis_limiter.go:242-277);
        # bounded driver model (<= max_tracked_values entries), applied
        # as a literal-map lookup so the plan stays a pure projection
        backend_cfg = self.params.get("limiter_backend")
        if isinstance(backend_cfg, str):
            # reference config shape (throttle.go:97-102):
            # limiter_backend selects memory|redis and the options live
            # under redis_backend_config; the dict-valued form of
            # limiter_backend is kept for back-compat
            if backend_cfg not in ("memory", "redis"):
                raise ValueError(
                    f"limiter_backend must be memory|redis, got {backend_cfg!r}"
                )
            backend_cfg = (
                dict(self.params.get("redis_backend_config") or {})
                if backend_cfg == "redis"
                else None
            )
        if backend_cfg:
            from file_d_spark.actions.redis_limiter import fetch_limit_overrides

            # limiter_key_field (throttle.go:246,543-545): the event
            # field's VALUE becomes the redis limit key, overriding the
            # <pipeline>_<field>_<value>_limit naming pattern.  The
            # reference's limitersMap.getOrAdd keys the limiter by
            # (rule, throttleKey) alone (limiters_map.go:266-290), so
            # the FIRST event's override sticks for that key — the
            # lookup below therefore resolves each (key, rule) group to
            # the lkey of its first GATE-MATCHED event (by the same
            # arrival order the admission window uses, with the lkey
            # value itself as a final deterministic tiebreak: when
            # timestamps tie and no order_fields are set, there is no
            # defined arrival order, and without the tiebreak which
            # matched event donates its lkey would vary run to run),
            # not to each event's own — gated-out rows never reach
            # getOrAdd in the reference (processor.go skips the action
            # entirely), so they must not donate the override either.
            # The struct wrap keeps a matched-but-null lkey (field
            # absent) as the governing first: the reference then passes
            # keyLimitOverride="" and the limiter falls back to the
            # <pipeline>_<field>_<value>_limit NAMING-PATTERN fetch
            # keyed by the throttle key (redis_limiter.go keyLimit
            # construction) — mirrored below by the second override map.
            lkf = str(backend_cfg.get("limiter_key_field", "") or "")

            def _lit_map(d: dict):
                return F.create_map(
                    *[
                        x
                        for kv in sorted(d.items())
                        for x in (F.lit(kv[0]), F.lit(kv[1]))
                    ]
                )

            if lkf:
                df = df.withColumn(
                    "__fd_lkey__",
                    get_col_safe(parse_selector(lkf), df.schema).cast("string"),
                )
                helper_cols.append("__fd_lkey__")
                w_lim = Window.partitionBy(
                    "__fd_key__", "__fd_rule__"
                ).orderBy(*order_cols, F.col("__fd_lkey__").asc_nulls_last())
                lookup = F.first(
                    F.when(
                        F.col("__fd_m__"),
                        F.struct(F.col("__fd_lkey__").alias("v")),
                    ),
                    ignorenulls=True,
                ).over(w_lim).getField("v")
                # ONE plan-build Spark job feeds both fetches: the
                # per-COLUMN distincts ride a union tagged by side, so
                # each column keeps its own max_tracked_values cap —
                # a (key, lkey) PAIR distinct would let combinatorial
                # mixes evict a rare key whose own column is well
                # under the cap (review finding, r12).  Each side is
                # capped BEFORE collection by orderBy+limit (a top-k
                # TakeOrdered, bounded per-partition then merged) —
                # never an unbounded collect_set buffer — and asc
                # order keeps the kept set deterministic: the
                # lexicographically smallest cap values, exactly what
                # the previous sort-then-slice produced.  A
                # user-configured `values` list keeps its documented
                # meaning (lkey values, the keys_are_limit_keys
                # semantic); throttle keys always come from the frame.
                cap = int(backend_cfg.get("max_tracked_values", 10000))

                def _side(col, tag: str):
                    return (
                        df.select(col.cast("string").alias("v"))
                        .where(F.col("v").isNotNull())
                        .distinct()
                        .orderBy("v")
                        .limit(cap)
                        .select(F.lit(tag).alias("side"), "v")
                    )

                both_rows = (
                    _side(F.col("__fd_key__"), "k")
                    .unionByName(_side(F.col("__fd_lkey__"), "l"))
                    .collect()
                )
                both = {
                    "ks": sorted(
                        r["v"] for r in both_rows if r["side"] == "k"
                    ),
                    "ls": sorted(
                        r["v"] for r in both_rows if r["side"] == "l"
                    ),
                }
                user_values = backend_cfg.get("values")
                # "" is the reference's keyLimitOverride-absent marker,
                # never a redis limit key — exclude it from the fetch
                # (a user-supplied list is scrubbed the same way;
                # collect_set already drops nulls)
                lkeys = sorted(
                    (
                        set(user_values)
                        if user_values is not None
                        else set(both["ls"])
                    )
                    - {None, ""}
                )[:cap]
                keys = list(both["ks"])
                lk_cfg = {**backend_cfg, "values": lkeys}
                # both fetches keep limits_file persistence; the
                # fallback namespaces its snapshot rows (rule_letter
                # suffixed ':np' for the naming-pattern map) so an
                # lkey-keyed row can't masquerade as a throttle key's
                # central limit across a redis outage — and vice versa
                fb_cfg = dict(backend_cfg)
                fb_cfg["rule_letter"] = (
                    f"{backend_cfg.get('rule_letter', 'a')}:np"
                )
                fb_cfg["values"] = keys
                overrides = fetch_limit_overrides(
                    df.select("__fd_lkey__"), "__fd_lkey__", key_field,
                    lk_cfg, limit, bucket_s,
                    keys_are_limit_keys=True,
                )
                fallback = fetch_limit_overrides(
                    df.select(F.col("__fd_key__")), "__fd_key__", key_field,
                    fb_cfg, limit, bucket_s,
                )
                if overrides or fallback:
                    lk_val = (
                        _lit_map(overrides)[lookup]
                        if overrides
                        else F.lit(None).cast("bigint")
                    )
                    key_val = (
                        _lit_map(fallback)[F.col("__fd_key__")]
                        if fallback
                        else F.lit(None).cast("bigint")
                    )
                    # an EMPTY lkey is the reference's "no override"
                    # exactly like an absent field (keyLimitOverride
                    # == ""): both take the naming-pattern branch
                    limit_col = F.coalesce(
                        F.when(
                            lookup.isNotNull() & (lookup != F.lit("")),
                            lk_val,
                        ).otherwise(key_val),
                        limit_col,
                    )
            else:
                overrides = fetch_limit_overrides(
                    df.select(F.col("__fd_key__")), "__fd_key__", key_field,
                    backend_cfg, limit, bucket_s,
                )
                if overrides:
                    limit_col = F.coalesce(
                        _lit_map(overrides)[F.col("__fd_key__")], limit_col
                    )

        w = Window.partitionBy(
            "__fd_key__", "__fd_bucket__", "__fd_rule__"
        ).orderBy(*order_cols)
        running = F.sum(
            F.when(F.col("__fd_m__"), counted).otherwise(F.lit(0))
        ).over(w.rowsBetween(Window.unboundedPreceding, 0))
        # a negative limit means unlimited (in_memory_limiter.go:66-69
        # returns true before touching the bucket ring)
        admitted = (limit_col < 0) | (running <= limit_col)
        # window exprs can't live in a WHERE clause — materialize first
        out = (
            df.withColumn("__fd_keep__", ~F.col("__fd_m__") | admitted)
            .filter(F.col("__fd_keep__"))
        )
        return out.drop("__fd_keep__", *helper_cols)

    def _apply_stream(self, df: DataFrame, pred: Column | None) -> DataFrame:
        """Streaming throttle with full rule parity: the same specs /
        rule-index / counted-value / distribution-index columns as the
        batch path feed the keyed state function, which owns one bucket
        ring per (key, rule) and replays distribution stealing
        sequentially (the reference's limiter lock scope)."""
        _require_ungated_stream(pred, "throttle")
        from file_d_spark.streaming import throttle_stream

        limit = int(self.params.get("default_limit", 5000))
        limit_kind = self.params.get("limit_kind", "count")
        size_field = self.params.get("limit_size_field", "")
        specs = []
        for rcfg in self.params.get("rules") or []:
            specs.append(
                {
                    "limit": int(rcfg.get("limit", limit)),
                    "kind": rcfg.get("limit_kind", "count"),
                    "conditions": rcfg.get("conditions") or {},
                    "dist": rcfg.get("limit_distribution") or {},
                }
            )
        specs.append(
            {
                "limit": limit,
                "kind": limit_kind,
                "conditions": {},
                "dist": self.params.get("limit_distribution") or {},
            }
        )
        for s in specs:
            if s["dist"].get("field") or s["dist"].get("ratios"):
                _validate_distribution(s["dist"])
        if len(specs) == 1 and limit < 0:
            return df  # negative limit = unlimited (throttle_test.go:153-181)

        def rule_cond(conditions: dict) -> Column:
            cond = F.lit(True)
            for fld, val in conditions.items():
                col = get_col_safe(parse_selector(str(fld)), df.schema)
                cond = cond & (col.cast("string") == F.lit(str(val)))
            return cond

        rule_idx = F.lit(len(specs) - 1)
        for i in reversed(range(len(specs) - 1)):
            rule_idx = F.when(rule_cond(specs[i]["conditions"]), F.lit(i)).otherwise(
                rule_idx
            )
        size_col = (
            F.octet_length(
                get_col_safe(parse_selector(size_field), df.schema).cast("string")
            )
            if size_field
            else F.lit(1)
        )
        counted = _counted_expr(specs, size_col)
        didx = _didx_expr(specs, df.schema)

        rule_cfgs = [
            {"limit": int(s["limit"]), "dlims": _rule_dlims(s)}
            for s in specs
        ]

        # batch parity for timestamps: parse time_field through the
        # same Go-layout machinery (time_field_format, numeric-epoch
        # handling) BEFORE the state function — raw pd.to_datetime in
        # the executor read numeric epoch-seconds as nanoseconds and
        # sorted on unparsed values
        time_field = self.params.get("time_field", "time")
        time_fmt = self.params.get("time_field_format", "rfc3339nano")
        tcol = get_col_safe(parse_selector(time_field), df.schema)
        t = df.schema[time_field].dataType if time_field in df.columns else None
        parsed_ts = xtime.ensure_timestamp(
            tcol, t, time_fmt, context="throttle time_field"
        )
        staged = (
            df.withColumn("__fd_rule__", rule_idx)
            .withColumn("__fd_cnt__", counted)
            .withColumn("__fd_didx__", didx)
            .withColumn("__fd_ts__", parsed_ts)
        )
        return throttle_stream(
            staged,
            key_col=self.params.get("throttle_field", ""),
            ts_col="__fd_ts__",
            bucket_interval_s=int(
                _parse_duration_seconds(self.params.get("bucket_interval"), 60.0)
            ),
            buckets_count=int(self.params.get("buckets_count", 60)),
            limit=limit,
            limiter_expiration_ms=int(
                _parse_duration_seconds(self.params.get("limiter_expiration"), 1800.0)
                * 1000
            ),
            rule_cfgs=rule_cfgs,
            rule_col="__fd_rule__",
            cnt_col="__fd_cnt__",
            didx_col="__fd_didx__",
        )

    def _admit_exact(self, df, specs, size_col, order_fields, helper_cols):
        """Sequential replay of in_memory_limiter.isAllowed per
        (key, bucket, rule) group, including default-distribution
        stealing (getDistrData).  Arrow-batched; the group key carries
        all the state the reference's limiter map keys on, so this
        shards exactly like the reference's per-limiter locks."""
        import pandas as pd

        from pyspark.sql import functions as F

        # per-rule static config for the closure
        rule_cfgs = [
            {"limit": int(s["limit"]), "kind": s["kind"],
             "dlims": _rule_dlims(s)}
            for s in specs
        ]

        df = df.withColumn(
            "__fd_didx__", _didx_expr(specs, df.schema)
        ).withColumn("__fd_cnt__", _counted_expr(specs, size_col))
        order_names = ["__fd_ts__"] + [str(c) for c in order_fields]
        out_schema = df.drop("__fd_didx__", "__fd_cnt__").schema

        def admit(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(order_names, kind="mergesort")
            cfg = rule_cfgs[int(pdf["__fd_rule__"].iloc[0])]
            dlims = cfg["dlims"]
            buckets: dict[int, int] = {}
            keep = []
            for m, cnt, di in zip(
                pdf["__fd_m__"], pdf["__fd_cnt__"], pdf["__fd_didx__"]
            ):
                if not m:
                    keep.append(True)  # gate bypass: never counted
                    continue
                if cfg["limit"] < 0:
                    keep.append(True)  # negative limit = unlimited
                    continue
                cnt = int(cnt)
                if dlims is None:
                    buckets[0] = buckets.get(0, 0) + cnt
                    keep.append(buckets[0] <= cfg["limit"])
                    continue
                idx, lim = int(di), dlims[int(di)]
                if idx == 0 and buckets.get(0, 0) + cnt > lim:
                    # steal reserve from the most-free distribution
                    maxdiff = -1
                    for i in range(1, len(dlims)):
                        diff = dlims[i] - (buckets.get(i, 0) + cnt)
                        if diff > maxdiff:
                            maxdiff, idx, lim = diff, i, dlims[i]
                buckets[idx] = buckets.get(idx, 0) + cnt
                keep.append(buckets[idx] <= lim)
            return pdf[pd.Series(keep, index=pdf.index)].drop(
                columns=["__fd_didx__", "__fd_cnt__"]
            )

        out = df.groupBy("__fd_key__", "__fd_bucket__", "__fd_rule__").applyInPandas(
            admit, schema=out_schema
        )
        return out.drop(*helper_cols)

    def _admit_exact_jvm(self, df, specs, size_col, order_fields, helper_cols):
        """JVM-side exact distribution replay (r13, VERDICT r12 #4):
        the same sequential admission ``_admit_exact`` replays in
        Python, expressed as ONE generated ``aggregate()`` fold per
        rule over the sorted per-(key, bucket, rule) event array — no
        Python in the plan, no Arrow round trip.

        Scale shape: one shuffle (the groupBy that also bounds the
        Arrow path), then a linear interpreted fold per group.  Gated
        rows (do_if mismatch) never enter the fold — they bypass the
        action uncounted (processor.go:190-243) and union back at the
        end — and the fold's kept-array growth is config-bounded
        (≈ sum of the rule's distributed limits per group), so the
        per-step array copy never goes quadratic in group size.  The
        event sort key is (ts, *order_fields, didx, cnt, payload) —
        a TOTAL deterministic order, strictly stronger than the Arrow
        path's stable-mergesort-on-arrival tiebreak."""
        didx = _didx_expr(specs, df.schema)
        counted = _counted_expr(specs, size_col)
        payload_cols = list(df.columns)
        ev = F.struct(
            F.col("__fd_ts__").alias("t"),
            *[
                get_col_safe(parse_selector(str(c)), df.schema).alias(f"o{i}")
                for i, c in enumerate(order_fields)
            ],
            didx.cast("int").alias("d"),
            counted.cast("bigint").alias("c"),
            F.struct(*[F.col(c) for c in payload_cols]).alias("p"),
        )
        gated = df.filter(~F.col("__fd_m__")).select(*payload_cols)
        grouped = (
            df.filter(F.col("__fd_m__"))
            .groupBy("__fd_key__", "__fd_bucket__", "__fd_rule__")
            .agg(F.array_sort(F.collect_list(ev)).alias("__evs__"))
        )
        branches = " ".join(
            f"WHEN __fd_rule__ = {i} THEN ({_dist_fold_sql(s)})"
            for i, s in enumerate(specs)
        )
        out = (
            grouped.select(
                F.explode(F.expr(f"CASE {branches} END")).alias("__e__")
            )
            .select("__e__.p.*")
            .unionByName(gated)
        )
        return out.drop(*helper_cols)


@register("cardinality")
class Cardinality(Action):
    """Limit per-key distinct values of ``fields``
    (cardinality.go:126-169,259).  ``key`` accepts one selector or a
    list (KeyFields, slice:true); defaults match the reference
    (action: nothing, limit: 10000).

    With ``order_fields`` the batch path replays the reference's
    SEQUENTIAL admission exactly (Do: an event is discarded once the
    key has accumulated ``limit`` distinct values BEFORE it, even if
    its own value is already cached) via two windows.  Without an
    order, batch admission is necessarily order-free: keys whose total
    distinct count reaches the limit have all their events acted on
    (documented divergence — a plain DataFrame has no arrival order)."""

    def apply_impl(self, df: DataFrame, pred: Column | None) -> DataFrame:
        key_cfg = self.params["key"]
        key_fields = [key_cfg] if isinstance(key_cfg, str) else list(key_cfg)
        fields = self.params.get("fields", [])
        limit = int(self.params.get("limit", 10000))
        mode = self.params.get("action", "nothing")
        order_fields = list(self.params.get("order_fields", []))
        if df.isStreaming:
            _require_ungated_stream(pred, "cardinality")
            from file_d_spark.streaming import cardinality_stream

            # config ttl (cardinality.go:29, default 1m) -> the state
            # timeout that forgets an idle key's distinct set; batch
            # runs have no time axis inside one frame, so ttl is a
            # streaming-only knob
            ttl_ms = int(
                _parse_duration_seconds(self.params.get("ttl"), 60.0) * 1000
            )
            # multi-key / multi-field parity with batch: composite
            # helper columns (concat_ws over every configured key /
            # field), dropped from the output by the state fn's
            # helper-column exclusion
            skey = F.concat_ws(
                "\x01",
                *[
                    F.coalesce(
                        get_col_safe(parse_selector(k), df.schema).cast(
                            "string"
                        ),
                        F.lit(""),
                    )
                    for k in key_fields
                ],
            )
            sval = F.concat_ws(
                "\x01",
                *[
                    get_col_safe(parse_selector(f), df.schema).cast("string")
                    for f in fields
                ],
            )
            staged = df.withColumn("__fd_ck__", skey).withColumn(
                "__fd_cv__", sval
            )
            return cardinality_stream(
                staged, "__fd_ck__", "__fd_cv__", limit, mode,
                ttl_ms=ttl_ms, strip_cols=list(fields),
            )

        key = F.concat_ws(
            "\x01",
            *[
                F.coalesce(
                    get_col_safe(parse_selector(k), df.schema).cast("string"),
                    F.lit(""),
                )
                for k in key_fields
            ],
        )
        probe = F.concat_ws(
            "\x01",
            *[
                get_col_safe(parse_selector(f), df.schema).cast("string")
                for f in fields
            ],
        )
        if mode == "nothing":
            return df
        if order_fields:
            return self._sequential(df, key, probe, limit, mode, order_fields, fields, pred)
        # gate: non-matching rows bypass — excluded from the distinct
        # count and never dropped / field-stripped
        match = F.lit(True) if pred is None else pred
        tagged = df.withColumn("__fd_k__", key).withColumn("__fd_m__", match)
        per_key = (
            tagged.filter(F.col("__fd_m__"))
            .withColumn("__fd_v__", probe)
            .groupBy("__fd_k__")
            .agg(F.countDistinct("__fd_v__").alias("__fd_card__"))
            # reference trigger is >= limit (cardinality.go:272)
            .filter(F.col("__fd_card__") >= limit)
            .select("__fd_k__")
        )
        over_limit = F.broadcast(per_key.withColumn("__fd_over__", F.lit(True)))
        if mode == "discard":
            flagged = tagged.join(over_limit, "__fd_k__", "left")
            out = flagged.filter(~F.col("__fd_m__") | F.col("__fd_over__").isNull())
            return out.drop("__fd_k__", "__fd_m__", "__fd_over__")
        if mode == "remove_fields":
            flagged = tagged.join(over_limit, "__fd_k__", "left")
            for f in fields:
                parts = parse_selector(f)
                old = get_col_safe(parts, df.schema)
                from file_d_spark.fields import set_field

                flagged = set_field(
                    flagged,
                    parts,
                    F.when(~F.col("__fd_m__") | F.col("__fd_over__").isNull(), old),
                )
            return flagged.drop("__fd_k__", "__fd_m__", "__fd_over__")
        return tagged.drop("__fd_k__", "__fd_m__")

    def _sequential(self, df, key, probe, limit, mode, order_fields, fields, pred):
        """Exact replay of cardinality.go Do in event order: an event
        is acted on iff its key accumulated ``limit`` distinct values
        strictly before it.  Two windows — first-occurrence flag per
        (key, value), then a cumulative distinct count per key — both
        shuffle on the key, which is the same partitioning the
        reference's per-key cache implies."""
        match = F.lit(True) if pred is None else pred
        seq = [F.col(c) for c in order_fields]
        tagged = (
            df.withColumn("__fd_k__", key)
            .withColumn("__fd_v__", probe)
            .withColumn("__fd_m__", match)
        )
        w_first = Window.partitionBy("__fd_k__", "__fd_v__").orderBy(*seq)
        # only gate-matching rows populate the cache
        first_seen = F.when(
            F.col("__fd_m__")
            & (
                F.row_number().over(w_first) == 1
                if pred is None
                else F.sum(F.col("__fd_m__").cast("int")).over(
                    w_first.rowsBetween(Window.unboundedPreceding, 0)
                )
                == 1
            ),
            F.lit(1),
        ).otherwise(F.lit(0))
        tagged = tagged.withColumn("__fd_new__", first_seen)
        w_cum = (
            Window.partitionBy("__fd_k__")
            .orderBy(*seq)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        distinct_before = F.coalesce(
            F.sum("__fd_new__").over(w_cum), F.lit(0)
        )
        over = F.col("__fd_m__") & (distinct_before >= F.lit(limit))
        tagged = tagged.withColumn("__fd_over__", over)
        helpers = ["__fd_k__", "__fd_v__", "__fd_m__", "__fd_new__", "__fd_over__"]
        if mode == "discard":
            return tagged.filter(~F.col("__fd_over__")).drop(*helpers)
        # remove_fields: strip the counted fields from over-limit events
        from file_d_spark.fields import set_field

        for f in fields:
            parts = parse_selector(f)
            old = get_col_safe(parts, tagged.schema)
            tagged = set_field(
                tagged, parts, F.when(~F.col("__fd_over__"), old)
            )
        return tagged.drop(*helpers)


@register("antispam")
class Antispam(Action):
    """Ban sources emitting more than ``threshold`` events per
    ``maintenance_interval`` window.

    Exceptions (antispammer.go:99-112, rules.go Exception): matchrule
    RuleSets matched against the serialized event — or the source name
    when ``check_source_name`` — that bypass counting and banning.

    Rules (antispammer.go:113-141, rules.go Rule): ordered list of
    ``{name, threshold, do_if}``; the FIRST rule whose do_if matches
    picks the event's threshold — ``-1`` passes unconditionally, ``0``
    blocks unconditionally, ``N`` overrides the default for that event
    (the per-source counter is shared across rules).  Rule do_if trees
    address the pseudo-fields ``event`` (serialized JSON),
    ``source_name`` and ``meta.*`` (rules.go antispamData.Get).  When
    rules are set, exceptions are ignored, like the reference.

    Batch shape: per-(source, window) counts vs the per-event
    threshold — the window-level form of the reference's sequential
    counter, same as the oracle-checked base semantics.
    """

    def apply_impl(self, df: DataFrame, pred: Column | None) -> DataFrame:
        source_field = self.params.get("source_field", "source_name")
        time_field = self.params.get("time_field", "ts")
        threshold = int(self.params.get("threshold", 0))
        rules = self.params.get("rules") or []
        interval_s = _parse_duration_seconds(
            self.params.get("maintenance_interval"), 60.0
        )
        if threshold <= 0 and not rules:
            return df
        if df.isStreaming:
            _require_ungated_stream(pred, "antispam")
            if rules or self.params.get("exceptions"):
                raise NotImplementedError(
                    "antispam rules/exceptions are batch-only; pre-filter "
                    "the stream with discard+do_if for the same effect"
                )
            from file_d_spark.streaming import antispam_stream

            return antispam_stream(
                df, source_field, threshold, int(interval_s * 1000)
            )

        src = get_col_safe(parse_selector(source_field), df.schema).cast("string")
        tcol = get_col_safe(parse_selector(time_field), df.schema)

        t = df.schema[time_field].dataType if time_field in df.columns else None
        ts = xtime.ensure_timestamp(tcol, t, None, context="antispam time_field")
        win = F.floor(F.unix_timestamp(ts) / F.lit(int(interval_s)))

        # serialized-event stand-in for the reference's raw event bytes
        event_json = F.to_json(F.struct(*[F.col(c) for c in df.columns]))

        # gate: non-matching rows bypass — not counted, never banned
        match = F.lit(True) if pred is None else pred
        tagged = (
            df.withColumn("__fd_src__", src)
            .withColumn("__fd_win__", win)
            .withColumn("__fd_m__", match)
            # pseudo-fields the reference's rule/exception checkers see
            # (rules.go antispamData.Get); pruned by Catalyst when no
            # rule references them
            .withColumn("__as_event__", event_json)
            .withColumn("__as_src__", src)
        )

        if rules:
            # per-event threshold: first matching rule wins
            thr: Column = F.lit(int(threshold))
            for rule in reversed(rules):
                p = self._rule_pred(rule.get("do_if"), tagged.schema)
                thr = F.when(p, F.lit(int(rule.get("threshold", 0)))).otherwise(thr)
            exc_pred = thr == F.lit(-1)  # unlimited: never counted or banned
            blocked = thr == F.lit(0)
        else:
            exc_pred = self._exceptions_pred(tagged.schema)
            blocked = F.lit(False)
            thr = F.lit(int(threshold))
        tagged = (
            tagged.withColumn("__fd_exc__", exc_pred)
            .withColumn("__fd_blk__", blocked)
            .withColumn("__fd_thr__", thr)
            .drop("__as_event__", "__as_src__")
        )

        counts = (
            tagged.filter(
                F.col("__fd_m__") & ~F.col("__fd_exc__") & ~F.col("__fd_blk__")
            )
            .groupBy("__fd_src__", "__fd_win__")
            .agg(F.count(F.lit(1)).alias("__fd_n__"))
        )
        if not rules:
            # single fixed threshold: ship only over-threshold windows
            counts = counts.filter(F.col("__fd_n__") > threshold)
        # broadcast join: banned-window (or window-count) side is small
        flagged = tagged.join(
            F.broadcast(counts), ["__fd_src__", "__fd_win__"], "left"
        )
        banned = F.col("__fd_m__") & ~F.col("__fd_exc__") & (
            F.col("__fd_blk__")
            | (F.coalesce(F.col("__fd_n__"), F.lit(0)) > F.col("__fd_thr__"))
        )
        out = flagged.filter(~banned)
        return out.drop(
            "__fd_src__", "__fd_win__", "__fd_exc__", "__fd_blk__",
            "__fd_thr__", "__fd_m__", "__fd_n__",
        )

    @staticmethod
    def _pseudo_tree(tree: dict) -> dict:
        """Rewrite antispam pseudo-field selectors (rules.go
        antispamData.Get: event | source_name | meta.*) to the helper
        columns."""
        out = dict(tree)
        if "operands" in out:
            out["operands"] = [Antispam._pseudo_tree(c) for c in out["operands"]]
            return out
        field = out.get("field", "")
        if field == "event":
            out["field"] = "__as_event__"
        elif field == "source_name":
            out["field"] = "__as_src__"
        return out

    def _rule_pred(self, tree: dict | None, schema) -> Column:
        if not tree:
            return F.lit(False)
        from file_d_spark.doif import compile_doif

        return F.coalesce(
            compile_doif(self._pseudo_tree(tree), schema), F.lit(False)
        )

    def _exceptions_pred(self, schema) -> Column:
        from file_d_spark.matchrule import rule_pred, ruleset_pred

        exc_pred = F.lit(False)
        for exc in self.params.get("exceptions", []) or []:
            if "rules" in exc:
                # reference shape: matchrule RuleSet (+check_source_name)
                col = (
                    F.col("__as_src__")
                    if exc.get("check_source_name")
                    else F.col("__as_event__")
                )
                exc_pred = exc_pred | ruleset_pred(col, exc)
                continue
            # legacy single-rule form: {field, mode, values, ...}
            field = exc.get("field", self.params.get("source_field", "source_name"))
            col = get_col_safe(parse_selector(field), schema).cast("string")
            rule = dict(exc)
            rule.setdefault("mode", "contains")
            if not exc.get("case_sensitive", True):
                rule["case_insensitive"] = True
            exc_pred = exc_pred | rule_pred(col, rule)
        return exc_pred
