"""do_if predicate trees -> Spark Column expressions.

The reference compiles a YAML boolean tree into per-event checkers
(/root/reference/pipeline/doif/ctor.go, do_if.go:37-53).  Node types and
semantics (SURVEY.md §2.4):

  field ops   equal | contains | contains_any | prefix | suffix | regex
              (/root/reference/pipeline/doif/field_op.go:17-26)
  logical     and | or | not   (logical_op.go:148-200)
  length      byte_len_cmp | array_len_cmp | int_val_cmp  (len_cmp_op.go)
  timestamp   ts_cmp with const/now/file_d_start values    (ts_cmp_op.go)
  type        check_type: object/array/number/string/null/nil (check_type_op.go:43-55)

Everything compiles to a pure Column predicate, so Catalyst can push it
into the scan, reorder it, and constant-fold static branches (the
reference's hand-written fast paths — length pre-checks, values-by-size
maps — are exactly what Catalyst does automatically).

``match_fields`` legacy matchers (processor.go:331-402) compile through
the same path via :func:`compile_match_fields`.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from file_d_spark import xtime
from file_d_spark.fields import get_col, has_path, parse_selector, schema_type_at

_CMP_OPS = {
    "lt": lambda a, b: a < b,
    "le": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "ge": lambda a, b: a >= b,
    "eq": lambda a, b: a == b,
    "ne": lambda a, b: a != b,
}


def _field_str_col(schema: T.StructType, field: str) -> tuple[Column | None, bool]:
    """(string-valued column for field, exists) — absent path => (None, False)."""
    parts = parse_selector(field)
    if not parts or not has_path(schema, parts):
        return None, False
    col = get_col(parts, schema)
    t = schema_type_at(schema, parts)
    if not isinstance(t, T.StringType):
        col = col.cast("string")
    return col, True


def _compile_field_op(node: dict[str, Any], schema: T.StructType) -> Column:
    op = node["op"]
    values: list[Any] = node.get("values", [])
    case_sensitive = node.get("case_sensitive", True)
    col, exists = _field_str_col(schema, node.get("field", ""))

    has_null_value = any(v is None for v in values)
    str_values = [str(v) for v in values if v is not None]
    if not case_sensitive:
        str_values = [v.lower() for v in str_values]

    if not exists:
        # absent field: only a null value in the list matches (reference
        # treats absent as nil; null value matches nil for equal op)
        return F.lit(has_null_value and op == "equal")

    if not case_sensitive:
        col = F.lower(col)

    result = F.lit(False)
    if op == "equal":
        # every leaf must be two-valued like the reference's checkers:
        # isin() alone is NULL for a NULL field, and a wrapping `not`
        # would turn that NULL into false instead of true
        if str_values:
            result = col.isin(str_values) & col.isNotNull()
        if has_null_value:
            result = result | col.isNull()
        return result
    if op == "contains":
        for v in str_values:
            result = result | col.contains(F.lit(v))
        return result & col.isNotNull()
    if op == "contains_any":
        # any single character of the value present in the field; the
        # reference allows exactly ONE value (field_op.go:247-249) —
        # accepting several here is a harmless superset
        chars = sorted({ch for v in str_values for ch in v})
        for ch in chars:
            result = result | col.contains(F.lit(ch))
        return result & col.isNotNull()
    if op == "prefix":
        for v in str_values:
            result = result | col.startswith(F.lit(v))
        return result & col.isNotNull()
    if op == "suffix":
        for v in str_values:
            result = result | col.endswith(F.lit(v))
        return result & col.isNotNull()
    if op == "regex":
        # reference compiles Go regexp and uses MatchString (unanchored)
        for v in [str(x) for x in values if x is not None]:
            result = result | col.rlike(v)
        return result & col.isNotNull()
    raise ValueError(f"unknown do_if field op: {op}")


def _variant_node(schema: T.StructType, parts: list[str]) -> Column:
    """The raw VARIANT node at ``parts`` (first part is the variant
    column, the rest a dynamic JSON path)."""
    top = get_col(parts[:1], schema)
    path = "$" + "".join("." + x.replace(".", "\\.") for x in parts[1:])
    return F.try_variant_get(top, path, "variant")


def _compile_len_cmp(node: dict[str, Any], schema: T.StructType) -> Column:
    op = node["op"]
    cmp_op = node["cmp_op"]
    value = int(node["value"])
    if cmp_op not in _CMP_OPS:
        raise ValueError(f"unknown cmp_op: {cmp_op}")
    parts = parse_selector(node.get("field", ""))
    if not has_path(schema, parts):
        return F.lit(False)
    col = get_col(parts, schema)
    t = schema_type_at(schema, parts)
    from file_d_spark.fields import _is_variant

    if op == "byte_len_cmp":
        # Byte length of the raw node value: scalars use their unquoted
        # string rendering, objects/arrays their compact-JSON encoding
        # (len_cmp_op.go:136-176 getNodeBytesSize — quotes, commas and
        # brackets counted; byte SIZE is key-order-invariant, so
        # to_json's ordering is irrelevant).  TestCheckLenCmpLtObject
        # pins the object case.
        if _is_variant(t):
            v = _variant_node(schema, parts)
            type_str = F.schema_of_variant(v)
            probe = F.when(
                type_str.startswith("OBJECT") | type_str.startswith("ARRAY"),
                F.octet_length(F.to_json(v)),
            ).otherwise(F.octet_length(col))
        elif isinstance(t, (T.StructType, T.ArrayType, T.MapType)):
            probe = F.octet_length(F.to_json(col))
        else:
            probe = F.octet_length(col.cast("string"))
    elif op == "array_len_cmp":
        # non-array nodes never match (len_cmp_op.go:200-206)
        if _is_variant(t):
            top = get_col(parts[:1], schema)
            path = "$" + "".join("." + x.replace(".", "\\.") for x in parts[1:])
            probe = F.size(F.try_variant_get(top, path, "array<variant>"))
        elif isinstance(t, (T.ArrayType, T.MapType)):
            probe = F.size(col)
        else:
            return F.lit(False)
    elif op == "int_val_cmp":
        # numbers and numeric strings compare; everything else (arrays,
        # objects, non-numeric strings) never matches (len_cmp_op.go:207-220).
        # Statically-typed container columns must short-circuit here:
        # try_cast('long') on an array/map/struct is an AnalysisException
        # at plan build, not a runtime null (ADVICE r7).
        if not _is_variant(t) and isinstance(
            t, (T.StructType, T.ArrayType, T.MapType)
        ):
            return F.lit(False)
        probe = col.try_cast("long")
    else:
        raise ValueError(f"unknown len cmp op: {op}")
    return _CMP_OPS[cmp_op](probe, F.lit(value)) & probe.isNotNull()


def _compile_ts_cmp(node: dict[str, Any], schema: T.StructType) -> Column:
    cmp_op = node["cmp_op"]
    parts = parse_selector(node.get("field", ""))
    if not has_path(schema, parts):
        return F.lit(False)
    col = get_col(parts, schema)
    t = schema_type_at(schema, parts)
    if isinstance(t, T.TimestampType):
        ts = col
    elif isinstance(t, (T.TimestampNTZType, T.DateType)):
        # exact under the pinned UTC session TZ; keeps the comparison
        # against the LTZ literal/current_timestamp() type-consistent
        ts = col.cast("timestamp")
    else:
        ts = xtime.parse_time(col, node.get("format", "rfc3339nano"))
    raw_value = node.get("value", "now")
    shift_ns = int(node.get("value_shift", 0) or 0)
    if isinstance(raw_value, str) and raw_value.strip().lower() in ("now", "file_d_start"):
        # 'now' is periodically refreshed in the reference; in Spark
        # current_timestamp() is per-query constant — same semantics.
        cmp_val: Column = F.current_timestamp()
    else:
        # the reference parses the constant at tree-build time and
        # errors on garbage (ts_cmp_op.go ctor); a NULL literal here
        # would silently leak three-valued logic through `not`
        import datetime as _dt

        try:
            _dt.datetime.fromisoformat(str(raw_value).replace("Z", "+00:00"))
        except ValueError:
            raise ValueError(
                f"ts_cmp: unparseable constant value: {raw_value!r}"
            ) from None
        cmp_val = F.lit(str(raw_value)).cast("timestamp")
    if shift_ns:
        cmp_val = F.timestamp_micros(F.unix_micros(cmp_val) + F.lit(shift_ns // 1000))
    return _CMP_OPS[cmp_op](ts, cmp_val) & ts.isNotNull()


_TYPE_ALIASES = {
    "obj": "object",
    "arr": "array",
    "num": "number",
    "str": "string",
}


def _static_type_category(t: T.DataType) -> str:
    if isinstance(t, T.StructType) or isinstance(t, T.MapType):
        return "object"
    if isinstance(t, T.ArrayType):
        return "array"
    if isinstance(t, T.StringType):
        return "string"
    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                      T.FloatType, T.DoubleType, T.DecimalType)):
        return "number"
    if isinstance(t, T.BooleanType):
        return "bool"
    if isinstance(t, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "string"  # JSON-encoded timestamps are strings
    return "other"


def _compile_check_type(node: dict[str, Any], schema: T.StructType) -> Column:
    values = [_TYPE_ALIASES.get(str(v).lower(), str(v).lower()) for v in node.get("values", [])]
    parts = parse_selector(node.get("field", ""))
    if not parts:
        return F.lit("object" in values)  # event root is an object
    if not has_path(schema, parts):
        return F.lit("nil" in values)
    t = schema_type_at(schema, parts)
    from file_d_spark.fields import _is_variant

    if _is_variant(t):
        # dynamic JSON: the runtime type comes from the variant itself
        v = _variant_node(schema, parts)
        type_str = F.schema_of_variant(v)
        cat = (
            F.when(v.isNull(), F.lit("nil"))
            .when(type_str.startswith("OBJECT"), F.lit("object"))
            .when(type_str.startswith("ARRAY"), F.lit("array"))
            .when(type_str == "STRING", F.lit("string"))
            .when(type_str.isin("VOID", "NULL"), F.lit("null"))
            .when(
                type_str.rlike("^(BIGINT|INT|SMALLINT|TINYINT|DOUBLE|FLOAT|DECIMAL)"),
                F.lit("number"),
            )
            .otherwise(F.lit("other"))
        )
        return cat.isin(values)
    cat = _static_type_category(t)
    col = get_col(parts, schema)
    static_match = cat in values
    if "null" in values:
        return F.when(col.isNull(), F.lit(True)).otherwise(F.lit(static_match))
    # a NULL value is not of any concrete type
    return F.when(col.isNull(), F.lit(False)).otherwise(F.lit(static_match))


def compile_doif(node: dict[str, Any], schema: T.StructType) -> Column:
    """Compile a do_if tree (parsed YAML dict) against a schema."""
    op = node.get("op")
    if op in ("and", "or", "not"):
        operands = [compile_doif(child, schema) for child in node.get("operands", [])]
        if not operands:
            raise ValueError(f"logical op {op} needs operands")
        if op == "not":
            return ~operands[0]
        result = operands[0]
        for child in operands[1:]:
            result = (result & child) if op == "and" else (result | child)
        return result
    if op in ("equal", "contains", "contains_any", "prefix", "suffix", "regex"):
        return _compile_field_op(node, schema)
    if op in ("byte_len_cmp", "array_len_cmp", "int_val_cmp"):
        return _compile_len_cmp(node, schema)
    if op == "ts_cmp":
        return _compile_ts_cmp(node, schema)
    if op == "check_type":
        return _compile_check_type(node, schema)
    raise ValueError(f"unknown do_if op: {op}")


def compile_match_fields(
    match_fields: dict[str, Any],
    schema: T.StructType,
    mode: str = "and",
    invert: bool = False,
) -> Column:
    """Legacy ``match_fields`` matcher: field -> exact value | /regex/ |
    list of either; AND/OR across fields
    (/root/reference/pipeline/processor.go:331-402, fd/util.go)."""
    preds: list[Column] = []
    for field, want in match_fields.items():
        values = want if isinstance(want, list) else [want]
        col, exists = _field_str_col(schema, field)
        if not exists:
            preds.append(F.lit(False))
            continue
        p = F.lit(False)
        for v in values:
            s = str(v)
            if len(s) >= 2 and s.startswith("/") and s.endswith("/"):
                p = p | col.rlike(s[1:-1])
            else:
                p = p | (col == F.lit(s))
        preds.append(p & col.isNotNull())
    if not preds:
        result = F.lit(True)
    else:
        result = preds[0]
        for p in preds[1:]:
            result = (result & p) if mode.lower() == "and" else (result | p)
    return ~result if invert else result
