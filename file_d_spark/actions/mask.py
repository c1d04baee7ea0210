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


def _segment_pattern(pattern: str) -> list[tuple[str, str]] | None:
    """Split a regex into top-level ('lit'|'grp') segments.  Returns
    None when the shape is too complex for safe rewriting (nested
    groups, top-level alternation)."""
    segs: list[tuple[str, str]] = []
    i, depth, start, gstart = 0, 0, 0, 0
    in_class = False
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\":
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
            i += 1
            continue
        if ch == "[":
            in_class = True
        elif ch == "|" and depth == 0:
            return None
        elif ch == "(":
            if depth == 0:
                if i > start:
                    segs.append(("lit", pattern[start:i]))
                gstart = i
            else:
                return None  # nested group
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                segs.append(("grp", pattern[gstart : i + 1]))
                start = i + 1
        i += 1
    if start < len(pattern):
        segs.append(("lit", pattern[start:]))
    return segs


_OPEN = "\x02"  # sentinels wrapping to-be-starred content; control
_CLOSE = "\x03"  # bytes never appear in the reference's log corpora


def _star_fill(col: Column) -> Column:
    """Replace every sentinel-wrapped span with a ``*`` run of the
    SAME length — the reference masks per character (mask.go:138-193).
    regexp_replace cannot emit length-dependent runs, so the masked
    content is wrapped in sentinels by the regex pass and starred out
    here with split + per-piece rebuild (each piece holds at most one
    closing sentinel)."""
    pieces = F.split(col, _OPEN)

    def rebuild(piece: Column) -> Column:
        pos = F.instr(piece, _CLOSE)
        return F.when(
            pos > 0,
            F.concat(
                F.repeat(F.lit("*"), (pos - 1).cast("int")),
                piece.substr(pos + 1, F.length(piece)),
            ),
        ).otherwise(piece)

    return F.when(
        col.contains(_OPEN), F.concat_ws("", F.transform(pieces, rebuild))
    ).otherwise(col)


def _mask_expr(col: Column, mask_cfg: dict) -> Column:
    pattern = mask_cfg["re"]
    groups = mask_cfg.get("groups", [0])
    replace_word = mask_cfg.get("replace_word")
    cut = bool(mask_cfg.get("cut_values", False)) or mask_cfg.get("mode") == "cut"
    # star masking wraps content in sentinels and length-preserves;
    # replace_word/cut substitute the literal directly
    star = replace_word is None and not cut
    fill = "" if cut else (replace_word if replace_word is not None else "")

    def finish(replaced: Column) -> Column:
        return _star_fill(replaced) if star else replaced

    n_groups = _pyre.compile(pattern).groups
    if groups == [0] or not groups or n_groups == 0:
        repl = f"{_OPEN}$0{_CLOSE}" if star else fill
        return finish(F.regexp_replace(col, pattern, repl))

    def group_repl(idx: int) -> str:
        return f"{_OPEN}${idx}{_CLOSE}" if star else fill

    # group-targeted: recapture inter-group literals so they survive
    segs = _segment_pattern(pattern)
    if segs is not None:
        new_pattern, repl, new_idx, orig_idx = [], [], 0, 0
        for kind, text in segs:
            new_idx += 1
            if kind == "lit":
                new_pattern.append(f"({text})")
                repl.append(f"${new_idx}")
            else:
                orig_idx += 1
                new_pattern.append(text)
                repl.append(
                    group_repl(new_idx) if orig_idx in groups else f"${new_idx}"
                )
        return finish(F.regexp_replace(col, "".join(new_pattern), "".join(repl)))
    # complex pattern fallback: keep non-target groups, lose literals
    repl_parts = [
        group_repl(g) if g in groups else f"${g}" for g in range(1, n_groups + 1)
    ]
    return finish(F.regexp_replace(col, pattern, "".join(repl_parts)))


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

        # build every masked expression against the ORIGINAL columns,
        # then apply: the applied_field flag must compare pre-mask values
        masked_by_target: list[tuple[list[str], Column]] = []
        changed_any: Column = F.lit(False)
        for parts in targets:
            col = get_col_safe(parts, df.schema)
            masked = col
            for m in masks:
                masked = _mask_expr(masked, m)
            masked_by_target.append((parts, masked))
            if applied_field:
                changed_any = changed_any | (col.isNotNull() & (masked != col))
        if applied_field:
            mark = F.when(changed_any, F.lit(str(applied_value)))
            df = self.set_gated(df, parse_selector(applied_field), mark, pred)
        for parts, masked in masked_by_target:
            df = self.set_gated(df, parts, masked, pred)
        return df
