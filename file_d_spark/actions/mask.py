"""mask action: regex masking of sensitive substrings.

Reference: /root/reference/plugin/action/mask/mask.go:138-193,267 —
masks are a list of ``{re, groups, replace_word|cut_values}`` rules;
matched groups are replaced with ``*`` runs (default), a literal
``replace_word``, or cut.  ``process_fields`` whitelists fields (else
every string leaf is walked); ``applied_field``/``applied_value`` mark
events where any mask fired; ``ignore_fields`` blacklists.

Spark mapping: per-field ``regexp_replace`` chains.  Group-targeted
replacement ("mask only group 2 of the match") is expressed by
rewriting the pattern so non-target groups are kept via backrefs.
Whole-event dynamic walk applies the chain to every top-level string
column (nested structs: every string leaf).
"""

from __future__ import annotations

import re as _pyre

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from file_d_spark.actions.base import Action, register
from file_d_spark.fields import get_col_safe, parse_selector, set_field


def _string_leaf_paths(schema: T.StructType, prefix: list[str] | None = None) -> list[list[str]]:
    prefix = prefix or []
    out = []
    for f in schema.fields:
        if isinstance(f.dataType, T.StringType):
            out.append(prefix + [f.name])
        elif isinstance(f.dataType, T.StructType):
            out.extend(_string_leaf_paths(f.dataType, prefix + [f.name]))
    return out


def _mask_expr(col: Column, mask_cfg: dict) -> Column:
    pattern = mask_cfg["re"]
    groups = mask_cfg.get("groups", [0])
    replace_word = mask_cfg.get("replace_word")
    cut = bool(mask_cfg.get("cut_values", False)) or mask_cfg.get("mode") == "cut"

    n_groups = _pyre.compile(pattern).groups
    if groups == [0] or not groups or n_groups == 0:
        if cut:
            return F.regexp_replace(col, pattern, "")
        if replace_word is not None:
            return F.regexp_replace(col, pattern, replace_word)
        # default: '*' per masked char — repeat() needs the match length,
        # regexp_replace can't do per-match lengths; use a fixed-run '***'
        return F.regexp_replace(col, pattern, "***")
    # group-targeted: rebuild replacement keeping non-target groups
    repl_parts = []
    for g in range(1, n_groups + 1):
        if g in groups:
            repl_parts.append("" if cut else (replace_word if replace_word is not None else "***"))
        else:
            repl_parts.append(f"${g}")
    return F.regexp_replace(col, pattern, "".join(repl_parts))


@register("mask")
class Mask(Action):
    def apply_impl(self, df: DataFrame, pred: Column | None) -> DataFrame:
        masks = self.params.get("masks", [])
        process_fields = self.params.get("process_fields")
        ignore_fields = set(map(str, self.params.get("ignore_fields", []) or []))
        applied_field = self.params.get("applied_field")
        applied_value = self.params.get("applied_value", "true")

        if process_fields:
            targets = [parse_selector(f) for f in process_fields]
        else:
            targets = [
                p
                for p in _string_leaf_paths(df.schema)
                if ".".join(p) not in ignore_fields
            ]

        changed_any: Column = F.lit(False)
        for parts in targets:
            col = get_col_safe(parts, df.schema)
            masked = col
            for m in masks:
                masked = _mask_expr(masked, m)
            if applied_field:
                changed_any = changed_any | (
                    col.isNotNull() & (masked != col)
                )
            df = self.set_gated(df, parts, masked, pred)
        if applied_field:
            mark = F.when(changed_any, F.lit(str(applied_value)))
            df = self.set_gated(df, parse_selector(applied_field), mark, pred)
        return df
