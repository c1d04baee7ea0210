"""mask action: regex masking of sensitive substrings.

Reference: /root/reference/plugin/action/mask/mask.go:267-500 and
mask_struct.go — masks are an ordered list of
``{re, groups, max_count, replace_word|cut_values, match_rules,
applied_field, process_fields, ignore_fields, do_if}`` rules.  Per
string leaf (processMask): empty values are skipped entirely; each
mask's ``match_rules`` are checked against the ORIGINAL value while
the regex rewrite chains on the EVOLVING value; a mask rewrites only
when it has both a regex and a non-empty group list; ``applied_field``
is set whenever the mask fired anywhere in the event (for re-masks
that means the regex matched, for rule-only masks that the rules
matched).  Matched groups become ``*`` runs of the same rune length
capped at ``max_count`` (maskSection), a literal ``replace_word``, or
are cut.  Plugin-level ``mask_applied_field`` marks events where any
mask fired; ``process_fields``/``ignore_fields`` (global, overridable
per mask, ignore wins) choose which leaves are walked, with nested
fields inheriting their ancestor's listing.

Spark mapping: per-leaf ``regexp_replace`` chains over temp columns
(one per target leaf, rewritten once per mask so repeated references
stay materialized instead of exploding the expression tree), with
fired-flags accumulated per mask for the applied-field marks.
"""

from __future__ import annotations

import re as _pyre

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from file_d_spark.actions.base import Action, register
from file_d_spark.fields import get_col_safe, parse_selector, set_field
from file_d_spark.matchrule import rulesets_pred


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


def _star_fill(col: Column, max_count: int = 0) -> Column:
    """Replace every sentinel-wrapped span with a ``*`` run of the
    SAME length — the reference masks per rune (maskSection), capping
    the run at ``max_count`` when positive.  regexp_replace cannot
    emit length-dependent runs, so the masked content is wrapped in
    sentinels by the regex pass and starred out here with split +
    per-piece rebuild (each piece holds at most one closing
    sentinel)."""
    pieces = F.split(col, _OPEN)

    def rebuild(piece: Column) -> Column:
        pos = F.instr(piece, _CLOSE)
        n = (pos - 1).cast("int")
        if max_count > 0:
            n = F.least(n, F.lit(max_count))
        return F.when(
            pos > 0,
            F.concat(
                F.repeat(F.lit("*"), n),
                piece.substr(pos + 1, F.length(piece)),
            ),
        ).otherwise(piece)

    return F.when(
        col.contains(_OPEN), F.concat_ws("", F.transform(pieces, rebuild))
    ).otherwise(col)


def _verify_groups(groups: list[int], n_groups: int) -> list[int]:
    """cfg/regexp_groups.go VerifyGroupNumbers: unique, in range,
    0 collapses to whole-match."""
    if len(set(groups)) != len(groups):
        raise ValueError(f"mask groups numbers must be unique: {groups}")
    if len(groups) > max(n_groups, 1):
        raise ValueError(
            f"mask has {len(groups)} groups but the regex only {n_groups}"
        )
    for g in groups:
        if g < 0 or g > n_groups:
            raise ValueError(f"wrong mask group number {g}")
        if g == 0:
            return [0]
    return groups


def _mask_expr(col: Column, mask_cfg: dict) -> Column:
    pattern = mask_cfg["re"]
    groups = mask_cfg.get("groups", [0])
    replace_word = mask_cfg.get("replace_word")
    max_count = int(mask_cfg.get("max_count", 0) or 0)
    cut = bool(mask_cfg.get("cut_values", False)) or mask_cfg.get("mode") == "cut"
    if max_count > 0 and replace_word:
        raise ValueError("mask: max_count and replace_word are incompatible")
    if replace_word and cut:
        raise ValueError("mask: replace mode and cut mode are incompatible")
    # star masking wraps content in sentinels and length-preserves;
    # replace_word/cut substitute the literal directly
    star = replace_word is None and not cut
    fill = "" if cut else (replace_word if replace_word is not None else "")

    def finish(replaced: Column) -> Column:
        return _star_fill(replaced, max_count) if star else replaced

    n_groups = _pyre.compile(pattern).groups
    groups = _verify_groups(list(groups) if groups else [0], n_groups)
    if groups == [0] or n_groups == 0:
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


def _expand_process(schema: T.StructType, selectors: list[str]) -> list[list[str]]:
    """A listed field processes all its nested string leaves
    (mask.go Config docs)."""
    out: list[list[str]] = []
    for sel in selectors:
        parts = parse_selector(str(sel))
        node: T.DataType = schema
        ok = True
        for p in parts:
            if isinstance(node, T.StructType) and p in node.fieldNames():
                node = node[p].dataType
            else:
                ok = False
                break
        if not ok:
            continue
        if isinstance(node, T.StringType):
            out.append(parts)
        elif isinstance(node, T.StructType):
            out.extend(
                parts + sub for sub in _string_leaf_paths(node)
            )
    return out


def _apply_ignore(
    leaves: list[list[str]], ignore: list[str]
) -> list[list[str]]:
    """A listed field ignores all its nested leaves too."""
    pref = [parse_selector(str(s)) for s in ignore]
    return [
        p
        for p in leaves
        if not any(p[: len(ig)] == ig for ig in pref)
    ]


@register("mask")
class Mask(Action):
    def apply_impl(self, df: DataFrame, pred: Column | None) -> DataFrame:
        masks = self.params.get("masks", [])
        plugin_process = self.params.get("process_fields")
        plugin_ignore = self.params.get("ignore_fields")
        # plugin level: reference key mask_applied_field (legacy alias
        # applied_field kept for configs written against round 1)
        plugin_applied = self.params.get(
            "mask_applied_field", self.params.get("applied_field")
        )
        plugin_applied_val = self.params.get(
            "mask_applied_value", self.params.get("applied_value", "true")
        )

        for m in masks:
            if not m.get("re") and not m.get("match_rules"):
                raise ValueError(
                    "mask must have either nonempty regex or ruleset, or both"
                )

        all_leaves = _string_leaf_paths(df.schema)

        def targets_for(m: dict) -> list[list[str]]:
            # per-mask lists override global; ignore wins over process
            # (processMask's switch order)
            if m.get("ignore_fields"):
                return _apply_ignore(all_leaves, m["ignore_fields"])
            if m.get("process_fields"):
                return _expand_process(df.schema, m["process_fields"])
            if plugin_ignore:
                return _apply_ignore(all_leaves, plugin_ignore)
            if plugin_process:
                return _expand_process(df.schema, plugin_process)
            return all_leaves

        mask_targets = [targets_for(m) for m in masks]
        union_targets: list[list[str]] = []
        seen = set()
        for tl in mask_targets:
            for p in tl:
                k = ".".join(p)
                if k not in seen:
                    seen.add(k)
                    union_targets.append(p)

        # mask-level do_if gates the mask for the whole event
        # (mask.go:267-275)
        use_preds: list[Column | None] = []
        for m in masks:
            if m.get("do_if"):
                from file_d_spark.doif import compile_doif

                use_preds.append(compile_doif(m["do_if"], df.schema))
            else:
                use_preds.append(None)

        # evolve each target in a temp column, one projection step per
        # mask, accumulating per-mask fired flags
        tmp_of = {".".join(p): f"__fd_mask_t{i}__" for i, p in enumerate(union_targets)}
        fired_cols = [f"__fd_mask_f{i}__" for i in range(len(masks))]
        for p in union_targets:
            df = df.withColumn(tmp_of[".".join(p)], get_col_safe(p, df.schema))
        for fc in fired_cols:
            df = df.withColumn(fc, F.lit(False))

        for mi, m in enumerate(masks):
            target_keys = {".".join(p) for p in mask_targets[mi]}
            rewrites = bool(m.get("re")) and (
                "groups" not in m or bool(m.get("groups"))
            )
            for p in union_targets:
                k = ".".join(p)
                if k not in target_keys:
                    continue
                orig = get_col_safe(p, df.schema)
                # empty values skip every mask (processMask early return);
                # match_rules check the ORIGINAL value
                gate = (
                    orig.isNotNull()
                    & (F.length(orig) > 0)
                    & rulesets_pred(orig, m.get("match_rules"))
                )
                if use_preds[mi] is not None:
                    gate = gate & use_preds[mi]
                tmp = F.col(tmp_of[k])
                if rewrites:
                    # materialize the fired flag BEFORE rewriting tmp —
                    # it must test the pre-mask value of this step
                    fired = gate & tmp.rlike(m["re"])
                    df = df.withColumn("__fd_fired_now__", fired)
                    df = df.withColumn(
                        tmp_of[k],
                        F.when(
                            F.col("__fd_fired_now__"), _mask_expr(tmp, m)
                        ).otherwise(tmp),
                    )
                    fired = F.col("__fd_fired_now__")
                else:
                    # rule-only mask (or regex with explicit empty
                    # groups): never rewrites, only marks
                    fired = gate & (
                        tmp.rlike(m["re"]) if m.get("re") else F.lit(True)
                    )
                df = df.withColumn(
                    fired_cols[mi], F.col(fired_cols[mi]) | fired
                )
                if rewrites:
                    df = df.drop("__fd_fired_now__")

        # applied-field marks: per-mask first (in mask order), then the
        # plugin-level flag when any mask fired
        for mi, m in enumerate(masks):
            if m.get("applied_field"):
                mark = F.when(
                    F.col(fired_cols[mi]), F.lit(str(m.get("applied_value", "true")))
                )
                df = self.set_gated(
                    df, parse_selector(m["applied_field"]), mark, pred
                )
        if plugin_applied:
            any_fired = F.lit(False)
            for fc in fired_cols:
                any_fired = any_fired | F.col(fc)
            mark = F.when(any_fired, F.lit(str(plugin_applied_val)))
            df = self.set_gated(df, parse_selector(plugin_applied), mark, pred)

        for p in union_targets:
            df = self.set_gated(df, p, F.col(tmp_of[".".join(p)]), pred)
        return df.drop(*tmp_of.values(), *fired_cols)
