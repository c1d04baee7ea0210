r"""Dot-path field selectors and nested-column manipulation.

The reference addresses JSON fields with dot-paths and ``\.`` escaping
(cfg.ParseFieldSelector, used by every action — see
/root/reference/pipeline/doif/field_op.go:238 and
/root/reference/pipeline/util.go:120 ``CreateNestedField``).  Here a
selector resolves against a typed DataFrame schema; set/drop/rename on
nested struct fields compile to ``withField`` / ``dropFields`` column
expressions so the whole rewrite stays inside Catalyst.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_selector(path: str) -> list[str]:
    r"""Split ``a.b.c`` into parts honoring ``\.`` escapes.

    Mirrors the reference's cfg.ParseFieldSelector semantics
    (/root/reference/cfg/config.go): ``exception\.type`` is one part.
    An empty path selects the event root (=> []).
    """
    if path == "":
        return []
    parts: list[str] = []
    cur: list[str] = []
    i = 0
    while i < len(path):
        ch = path[i]
        if ch == "\\" and i + 1 < len(path) and path[i + 1] == ".":
            cur.append(".")
            i += 2
            continue
        if ch == ".":
            parts.append("".join(cur))
            cur = []
            i += 1
            continue
        cur.append(ch)
        i += 1
    parts.append("".join(cur))
    return parts


def join_selector(parts: list[str]) -> str:
    return ".".join(p.replace(".", "\\.") for p in parts)


def schema_type_at(schema: T.DataType, parts: list[str]) -> T.DataType | None:
    """Static type of the field at ``parts``, or None if the path cannot
    exist in this schema (the reference's "nil/absent" case).  Paths
    into VariantType resolve to VariantType (dynamic — any sub-path may
    exist at runtime)."""
    cur: T.DataType = schema
    for p in parts:
        if isinstance(cur, T.StructType):
            names = {f.name: f.dataType for f in cur.fields}
            if p not in names:
                return None
            cur = names[p]
        elif isinstance(cur, T.MapType):
            cur = cur.valueType
        elif _is_variant(cur):
            return cur  # everything below a variant is variant
        else:
            return None
    return cur


def _is_variant(t: T.DataType) -> bool:
    return type(t).__name__ == "VariantType"


def has_path(schema: T.DataType, parts: list[str]) -> bool:
    return schema_type_at(schema, parts) is not None


def get_col(parts: list[str], schema: T.StructType | None = None) -> Column:
    """Column for a selector.  Uses getField/getItem chaining so part
    names containing dots (escaped in the selector) are safe.  A path
    crossing a VariantType column finishes with variant_get (dynamic
    JSON access — SURVEY §1.3)."""
    if not parts:
        raise ValueError("empty selector has no column form (event root)")
    col = F.col("`" + parts[0].replace("`", "``") + "`")
    cur_t: T.DataType | None = None
    if schema is not None:
        cur_t = schema_type_at(schema, parts[:1])
    for i, p in enumerate(parts[1:], start=1):
        if cur_t is not None and _is_variant(cur_t):
            rest = parts[i:]
            path = "$." + ".".join(x.replace(".", "\\.") for x in rest)
            return F.try_variant_get(col, path, "string")
        if isinstance(cur_t, T.MapType):
            col = col.getItem(p)
            cur_t = cur_t.valueType
        else:
            col = col.getField(p)
            if schema is not None and cur_t is not None:
                cur_t = schema_type_at(cur_t, [p])
    return col


def get_col_safe(parts: list[str], schema: T.StructType) -> Column:
    """Like get_col, but a path absent from the schema yields NULL
    (typed as string) instead of an analysis error — matches the
    reference treating absent fields as nil."""
    if not parts:
        raise ValueError("empty selector")
    if not has_path(schema, parts):
        return F.lit(None).cast("string")
    return get_col(parts, schema)


def _set_in_struct(
    base: Column | None,
    base_type: T.DataType | None,
    parts: list[str],
    value: Column,
) -> Column:
    """Build a column equal to ``base`` with the nested field at
    ``parts`` created/replaced by ``value``.  Intermediate non-struct
    nodes are overwritten with fresh structs (reference
    CreateNestedField semantics: it converts non-object nodes on the
    way into objects — /root/reference/pipeline/util.go:120)."""
    if not parts:
        return value
    head, rest = parts[0], parts[1:]
    if base is not None and isinstance(base_type, T.StructType):
        field_names = {f.name: f.dataType for f in base_type.fields}
        if head in field_names:
            inner = _set_in_struct(
                base.getField(head), field_names[head], rest, value
            )
        else:
            inner = _set_in_struct(None, None, rest, value)
        return base.withField("`" + head.replace("`", "``") + "`", inner)
    # base missing or not a struct: build a brand-new struct
    inner = _set_in_struct(None, None, rest, value)
    return F.struct(inner.alias(head))


def set_field(df: DataFrame, parts: list[str], value: Column) -> DataFrame:
    """Set (create or replace) the field at ``parts`` to ``value``."""
    if not parts:
        raise ValueError("cannot set the event root")
    top = parts[0]
    if len(parts) == 1:
        return df.withColumn(top, value)
    schema = df.schema
    if has_path(schema, parts[:1]):
        base = get_col(parts[:1])
        base_t = schema_type_at(schema, parts[:1])
        return df.withColumn(top, _set_in_struct(base, base_t, parts[1:], value))
    return df.withColumn(top, _set_in_struct(None, None, parts[1:], value))


def drop_field(df: DataFrame, parts: list[str]) -> DataFrame:
    """Drop the field at ``parts`` if present; no-op otherwise.

    Spark cannot represent an empty struct (CANNOT_DROP_ALL_FIELDS),
    so dropping the last member of a nested struct drops the
    now-empty ancestor instead (closest typed analogue of the
    reference leaving ``{}``)."""
    if not parts:
        raise ValueError("cannot drop the event root")
    if not has_path(df.schema, parts):
        return df
    # walk up while the ancestor struct would become empty
    while len(parts) > 1:
        parent_t = schema_type_at(df.schema, parts[:-1])
        if isinstance(parent_t, T.StructType) and len(parent_t.fields) <= 1:
            parts = parts[:-1]
        else:
            break
    if len(parts) == 1:
        return df.drop(parts[0])
    top = parts[0]
    # dropFields takes a dotted name relative to the struct column
    rel = ".".join("`" + p.replace("`", "``") + "`" for p in parts[1:])
    return df.withColumn(top, get_col(parts[:1]).dropFields(rel))


def rename_field(
    df: DataFrame, src: list[str], dst: list[str], override: bool = True
) -> DataFrame:
    """Move field at ``src`` to ``dst``.  With override=False an
    existing ``dst`` wins and ``src`` is left untouched (reference
    rename action semantics, /root/reference/plugin/action/rename/rename.go:129)."""
    if not has_path(df.schema, src):
        return df
    if not override and has_path(df.schema, dst):
        return df
    val = get_col(src, df.schema)
    df = set_field(df, dst, val)
    return drop_field(df, src)
