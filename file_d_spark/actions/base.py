"""Action contract and registry.

The reference's action plugins implement ``Do(event) -> ActionResult``
and are gated by ``match_fields`` or ``do_if``
(/root/reference/pipeline/processor.go:190-243, 331-402).  Here an
action is a compiled ``DataFrame -> DataFrame`` transform; the gate
compiles to a Column predicate handed to :meth:`Action.apply`.

Gating semantics in a typed engine:
  * value-level actions (modify/mask/convert/...) wrap every column
    assignment in ``when(pred, new).otherwise(old)`` — exact parity;
  * row-level actions (discard) filter on the predicate;
  * shape-changing actions (keep_fields/rename/split/...) change the
    schema for ALL rows — a typed DataFrame cannot hold two schemas —
    so they require an unconditional gate (config without do_if) and
    raise otherwise.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from file_d_spark.doif import compile_doif, compile_match_fields
from file_d_spark.fields import get_col_safe, set_field

REGISTRY: dict[str, type["Action"]] = {}

# keys of an action config block that are engine-level, not plugin
# params; the metric_* trio is stripped before plugin parse exactly
# like the reference (fd/util.go:299-323) and consumed by the
# introspection scrape (introspect.PipelineInspector.prometheus)
META_KEYS = {
    "type", "do_if", "match_fields", "match_mode", "match_invert",
    "metric_name", "metric_labels", "metric_skip_status",
}


def register(name: str) -> Callable[[type["Action"]], type["Action"]]:
    def deco(cls: type["Action"]) -> type["Action"]:
        cls.name = name
        REGISTRY[name] = cls
        return cls

    return deco


class Action:
    """Base action: subclasses implement :meth:`apply_impl`, receiving
    the (possibly None) gate predicate."""

    name = "?"
    shape_changing = False

    def __init__(self, cfg: dict[str, Any]):
        self.cfg = cfg
        self.params = {k: v for k, v in cfg.items() if k not in META_KEYS}

    def gate(self, df: DataFrame) -> Column | None:
        """Compile this action's match gate against df's schema; None
        means unconditional."""
        pred: Column | None = None
        if self.cfg.get("do_if"):
            pred = compile_doif(self.cfg["do_if"], df.schema)
        if self.cfg.get("match_fields"):
            mf = compile_match_fields(
                self.cfg["match_fields"],
                df.schema,
                mode=self.cfg.get("match_mode", "and"),
                invert=bool(self.cfg.get("match_invert", False)),
            )
            pred = mf if pred is None else (pred & mf)
        return pred

    def apply(self, df: DataFrame) -> DataFrame:
        pred = self.gate(df)
        if pred is not None and self.shape_changing:
            raise ValueError(
                f"action {self.name!r} changes the schema and cannot be "
                "applied conditionally (do_if/match_fields) in a typed engine"
            )
        return self.apply_impl(df, pred)

    def apply_impl(self, df: DataFrame, pred: Column | None) -> DataFrame:
        raise NotImplementedError

    # -- helper for subclasses -----------------------------------------
    @staticmethod
    def set_gated(
        df: DataFrame, parts: list[str], value: Column, pred: Column | None
    ) -> DataFrame:
        """set_field with when(pred) protection: rows failing the gate
        keep their old value (or NULL if the field did not exist)."""
        if pred is None:
            return set_field(df, parts, value)
        old = get_col_safe(parts, df.schema)
        return set_field(df, parts, F.when(pred, value).otherwise(old))


def build_action(cfg: dict[str, Any]) -> Action:
    typ = cfg.get("type")
    if typ not in REGISTRY:
        raise ValueError(f"unknown action type: {typ!r}; known: {sorted(REGISTRY)}")
    return REGISTRY[typ](cfg)
