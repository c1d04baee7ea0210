"""Substitution templates -> Column expressions.

The reference's ``cfg.Substitution`` renders strings from literal text
plus ``${field.path}`` references, each optionally piped through
filters (/root/reference/cfg/substitution/substitution.go:69-140):

  re(regex, limit, [groups], separator[, emptyOnNotMatched])
      extract up to ``limit`` occurrences (-1 = all) of the regex,
      keep the listed groups, join with separator
      (regex_filter.go)
  trim(mode, cutset)       strip cutset chars: all|left|right (trim_filter.go)
  trim_to(mode, cutset)    cut everything before/after the first/last
                           occurrence of the cutset substring
                           (trim_to_filter.go:14-26)
  cut(mode, count)         keep first/last ``count`` bytes (cut_filter.go:34-46)

Everything compiles to built-in string functions — no UDFs.
"""

from __future__ import annotations

import json
import re as _re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from file_d_spark.fields import get_col_safe, parse_selector


@dataclass
class _Ref:
    selector: str
    filters: list[tuple[str, list]]


def _split_top(s: str, sep: str) -> list[str]:
    """Split on ``sep`` outside of quotes/parens."""
    out, cur, depth, quote = [], [], 0, None
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "\"'":
            quote = ch
            cur.append(ch)
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def _parse_filter(expr: str) -> tuple[str, list]:
    m = _re.match(r"\s*(re|trim_to|trim|cut)\((.*)\)\s*$", expr, _re.S)
    if not m:
        raise ValueError(f"invalid substitution filter: {expr!r}")
    name, argstr = m.group(1), m.group(2)
    args = []
    for raw in _split_top(argstr, ","):
        raw = raw.strip()
        if not raw:
            continue
        try:
            args.append(json.loads(raw))
        except json.JSONDecodeError:
            # regexes are valid Go strings but not valid JSON ("\w");
            # strip the quotes and keep the body verbatim
            if len(raw) >= 2 and raw[0] == raw[-1] and raw[0] in "\"'":
                args.append(raw[1:-1].replace('\\"', '"'))
            else:
                args.append(raw)
    return name, args


def parse_template(template: str) -> list[str | _Ref]:
    """Split a template into literal chunks and ${...} references."""
    parts: list[str | _Ref] = []
    i, n = 0, len(template)
    lit: list[str] = []
    while i < n:
        if template.startswith("$$", i):
            # escaped dollar (substitution_test.go parse_escape:
            # "$$100" renders "$100")
            lit.append("$")
            i += 2
            continue
        if template.startswith("${", i):
            end = template.find("}", i)
            # allow nested braces inside quoted filter args
            depth, j, quote = 0, i + 2, None
            while j < n:
                ch = template[j]
                if quote:
                    if ch == quote:
                        quote = None
                elif ch in "\"'":
                    quote = ch
                elif ch == "{":
                    depth += 1
                elif ch == "}":
                    if depth == 0:
                        end = j
                        break
                    depth -= 1
                j += 1
            if end == -1:
                lit.append(template[i:])
                break
            inner = template[i + 2 : end]
            if lit:
                parts.append("".join(lit))
                lit = []
            pieces = _split_top(inner, "|")
            ref = _Ref(pieces[0].strip(), [_parse_filter(p) for p in pieces[1:]])
            parts.append(ref)
            i = end + 1
            continue
        lit.append(template[i])
        i += 1
    if lit:
        parts.append("".join(lit))
    return parts


def _apply_filter(col: Column, name: str, args: list) -> Column:
    if name == "re":
        regex = str(args[0])
        limit = int(args[1]) if len(args) > 1 else -1
        groups = args[2] if len(args) > 2 else [0]
        sep = str(args[3]) if len(args) > 3 else ","
        empty_on_no_match = bool(args[4]) if len(args) > 4 else False
        if not isinstance(groups, list):
            groups = [groups]
        per_group = [F.regexp_extract_all(col, F.lit(regex), int(g)) for g in groups]
        # ``limit`` counts occurrences (matches), not emitted elements
        occ_n = F.size(per_group[0])
        if limit >= 0:
            occ_n = F.least(occ_n, F.lit(limit))
        if len(per_group) == 1:
            matches = F.slice(per_group[0], 1, occ_n)
        else:
            # interleave group captures per occurrence: occurrence i
            # contributes [g1[i], g2[i], ...].  Built with an index
            # transform (arrays_zip's array<struct> can't cast to
            # array<array<string>>).  Closure factory: HOF lambdas
            # reject default-arg tricks.
            def _occ(pgs):
                return lambda i: F.array(*[F.element_at(pg, i) for pg in pgs])

            idx = F.sequence(F.lit(1), occ_n)
            matches = F.when(
                occ_n > 0,
                F.flatten(F.transform(idx, _occ(per_group))),
            ).otherwise(F.array().cast(T.ArrayType(T.StringType())))
        joined = F.array_join(matches, sep)
        if empty_on_no_match:
            return joined
        return F.when(F.size(matches) > 0, joined).otherwise(col)
    if name == "trim":
        mode, cutset = str(args[0]), str(args[1])
        lit = F.lit(cutset)
        if mode == "left":
            return F.ltrim(col, lit)
        if mode == "right":
            return F.rtrim(col, lit)
        return F.trim(col, lit)
    if name == "trim_to":
        mode, cutset = str(args[0]), str(args[1])
        out = col
        if mode in ("all", "left"):
            pos = F.instr(out, cutset)
            out = F.when(pos > 0, F.substring(out, pos, F.lit(2147483647))).otherwise(out)
        if mode in ("all", "right"):
            # last occurrence: total_len - position of first occurrence in reverse
            rev_pos = F.instr(F.reverse(out), F.reverse(F.lit(cutset)))
            keep_len = F.length(out) - rev_pos - F.lit(len(cutset)) + F.lit(2)
            out = F.when(rev_pos > 0, F.substring(out, 1, keep_len)).otherwise(out)
        return out
    if name == "cut":
        mode, count = str(args[0]), int(args[1])
        if mode == "first":
            return F.when(F.length(col) > count, F.substring(col, 1, count)).otherwise(col)
        return F.when(
            F.length(col) > count, F.substring(col, -count, count)
        ).otherwise(col)
    raise ValueError(f"unknown substitution filter: {name}")


def compile_template(template: str, schema: T.StructType) -> Column:
    """Compile a substitution template to a string Column."""
    parts = parse_template(str(template))
    cols: list[Column] = []
    for p in parts:
        if isinstance(p, str):
            cols.append(F.lit(p))
            continue
        col = get_col_safe(parse_selector(p.selector), schema).cast("string")
        for fname, fargs in p.filters:
            col = _apply_filter(col, fname, fargs)
        cols.append(F.coalesce(col, F.lit("")))
    if not cols:
        return F.lit("")
    if len(cols) == 1:
        return cols[0]
    return F.concat(*cols)
