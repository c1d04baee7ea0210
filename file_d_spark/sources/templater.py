"""Meta-template renderer — column-expression port of the reference's
MetaTemplater (/root/reference/pipeline/metadata/templater.go:59-213).

Supported template grammar (the subset the reference's own tests and
shipped configs use):

  ``{{ .key }}``                        value reference (meta column or
                                        a previously rendered template)
  ``literal {{ .key }} literal``        mixed text
  ``{{ .a.b }}``                        nested struct/map access
  ``{{ index .m "key" }}``              map element / ``{{ index .l 0 }}``
                                        array element (0-based like Go)
  ``{{ EXPR | default "lit" }}``        fallback when EXPR is null/empty
  ``{{ EXPR | default .ref }}``         fallback to another reference
  ``{{ "literal" }}``                   quoted literal
  ``{{ if .x }}A{{ else }}B{{ end }}``  truthiness branch (non-nil,
                                        non-empty string)

Template keys may reference each other; a dependency graph is built
over top-level names and rendered in topological order, so
``b: "{{ .a }}"`` sees ``a``'s rendered value regardless of config
order (templater.go:66-107).  Unlike the reference we render to
columns, so the per-batch LRU cache is unnecessary, and Go
template-execution *error strings* are not reproduced — an
unresolvable reference renders as null (single-value templates with a
statically absent reference are omitted entirely, matching the
reference's log-and-skip).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_EXPR_RE = re.compile(r"\{\{(.*?)\}\}", re.S)
# the reference's single-value fast path requires the exact spaced form
_SINGLE_RE = re.compile(r"^\{\{\ +\.(\w+)\ +\}\}$")


def _resolve_ref(
    path: str, df: DataFrame, rendered: dict[str, Column]
) -> Column | None:
    """``.a.b.c`` -> column.  Top name resolves against rendered
    templates first (hold values), then meta columns ``_a``/``a``."""
    parts = path.lstrip(".").split(".")
    top = parts[0]
    if top in rendered:
        col = rendered[top]
    else:
        name = top.lower()
        if f"_{name}" in df.columns:
            col = F.col(f"_{name}")
        elif name in df.columns:
            col = F.col(name)
        else:
            return None
    for p in parts[1:]:
        col = col.getField(p)  # struct field or map key alike
    return col


def _schema_of(df: DataFrame, path: str) -> T.DataType | None:
    parts = path.lstrip(".").split(".")
    name = parts[0].lower()
    col = f"_{name}" if f"_{name}" in df.columns else name
    if col not in df.columns:
        return None
    t: T.DataType = df.schema[col].dataType
    for p in parts[1:]:
        if isinstance(t, T.StructType):
            if p not in t.fieldNames():
                return None
            t = t[p].dataType
        elif isinstance(t, T.MapType):
            t = t.valueType
        else:
            return None
    return t


def _parse_primary(
    tokens: list[str], df: DataFrame, rendered: dict[str, Column]
) -> Column | None:
    """One primary expression from its whitespace tokens."""
    if not tokens:
        return None
    if tokens[0] == "index" and len(tokens) >= 3:
        base = _resolve_ref(tokens[1], df, rendered)
        if base is None:
            return None
        key = tokens[2]
        if key.startswith('"') and key.endswith('"'):
            return F.try_element_at(base, F.lit(key[1:-1]))
        try:
            i = int(key)
        except ValueError:
            return None
        dt = _schema_of(df, tokens[1])
        if isinstance(dt, T.MapType):
            # Go: integer index into a map is a type error -> the
            # reference stores the error string; we render null
            return F.lit(None).cast("string")
        return F.try_element_at(base, F.lit(i + 1))  # Go 0-based
    tok = tokens[0]
    if tok.startswith('"') and tok.endswith('"'):
        return F.lit(tok[1:-1])
    if tok.startswith("."):
        return _resolve_ref(tok, df, rendered)
    return None


def _parse_expr(
    expr: str, df: DataFrame, rendered: dict[str, Column]
) -> Column | None:
    """A pipe chain: primary | default arg | default arg ..."""
    stages = [s.strip() for s in expr.split("|")]
    col = _parse_primary(stages[0].split(), df, rendered)
    for stage in stages[1:]:
        toks = stage.split()
        if not toks or toks[0] != "default" or len(toks) < 2:
            continue
        fallback = _parse_primary(toks[1:], df, rendered)
        if fallback is None:
            continue
        if col is None:
            col = fallback
        else:
            s = col.cast("string")
            col = F.when(s.isNull() | (s == ""), fallback).otherwise(s)
    return col


def _truthy(col: Column | None) -> Column:
    if col is None:
        return F.lit(False)
    s = col.cast("string")
    return s.isNotNull() & (s != "")


def render_template(
    template: str, df: DataFrame, rendered: dict[str, Column]
) -> Column | None:
    """Render one template string to a string Column (None when a
    single-value reference is statically absent)."""
    single = _SINGLE_RE.match(template)
    if single:
        col = _resolve_ref("." + single.group(1), df, rendered)
        return None if col is None else col.cast("string")

    # split into literal / expression / if-block segments
    segs: list[Column] = []
    pos = 0
    src = template
    while pos < len(src):
        m = _EXPR_RE.search(src, pos)
        if not m:
            segs.append(F.lit(src[pos:]))
            break
        if m.start() > pos:
            segs.append(F.lit(src[pos : m.start()]))
        inner = m.group(1).strip()
        if inner.startswith("if "):
            # find matching {{ else }} / {{ end }} (no nesting)
            rest = src[m.end() :]
            end_m = re.search(r"\{\{\s*end\s*\}\}", rest)
            if not end_m:
                segs.append(F.lit(""))
                pos = m.end()
                continue
            body = rest[: end_m.start()]
            else_m = re.search(r"\{\{\s*else\s*\}\}", body)
            if else_m:
                then_src, else_src = body[: else_m.start()], body[else_m.end() :]
            else:
                then_src, else_src = body, ""
            cond = _truthy(_parse_expr(inner[3:], df, rendered))
            then_col = render_template(then_src, df, rendered)
            else_col = render_template(else_src, df, rendered)
            segs.append(
                F.when(cond, F.coalesce(then_col, F.lit("")))
                .otherwise(F.coalesce(else_col, F.lit("")))
            )
            pos = m.end() + end_m.end()
            continue
        col = _parse_expr(inner, df, rendered)
        segs.append(F.lit("") if col is None else F.coalesce(col.cast("string"), F.lit("")))
        pos = m.end()
    if not segs:
        return F.lit("")
    return F.concat(*segs) if len(segs) > 1 else segs[0].cast("string")


def _topo_order(templates: dict[str, str]) -> list[str]:
    """Topological order over template-key dependencies
    (templater.go:66-107): an edge dep -> name for every top-level
    ``.dep`` reference where dep is itself a template key."""
    deps: dict[str, set[str]] = {k: set() for k in templates}
    for name, template in templates.items():
        for m in _EXPR_RE.finditer(template):
            for comp in m.group(1).split():
                if not comp.startswith("."):
                    continue
                top = comp.lstrip(".").split(".")[0]
                if top in templates and top != name:
                    deps[name].add(top)
    order: list[str] = []
    seen: set[str] = set()

    def visit(k: str, stack: tuple = ()) -> None:
        if k in seen or k in stack:
            return
        for d in sorted(deps[k]):
            visit(d, stack + (k,))
        seen.add(k)
        order.append(k)

    for k in sorted(templates):
        visit(k)
    return order


def compile_meta_templates(
    templates: dict[str, str], df: DataFrame
) -> dict[str, Column]:
    """Render every template in dependency order; returns field ->
    Column (fields whose single-value reference is absent are
    omitted, like the reference's log-and-skip)."""
    rendered: dict[str, Column] = {}
    out: dict[str, Column] = {}
    for k in _topo_order(templates or {}):
        col = render_template(templates[k], df, rendered)
        if col is None:
            continue
        rendered[k] = col
        out[k] = col
    return out
