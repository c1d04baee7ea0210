"""ClickHouse column-type coercion for the clickhouse sink.

The reference declares target columns as ClickHouse type strings and
insanely-casts each event field to them, strict or non-strict
(/root/reference/plugin/output/clickhouse/clickhouse.go:213-252,
column_gen.go).  Here each CH type compiles to a Column expression:

  Int8..Int64, UInt8..UInt64  integer casts (UInt64 -> long, documented)
  Int128/256, UInt128/256     cast to long (reference does the same)
  Float32/64                  float/double
  String                      string (non-strict: non-strings JSON-encoded)
  Bool                        boolean (non-strict: "1"/1 -> true)
  DateTime                    RFC3339 string OR unix seconds
  DateTime64(3|6|9)           unix millis/micros/nanos (or RFC3339)
  Enum8(...)/Enum16(...)      name kept if in domain; numeric id mapped
                              to its name; else NULL (strict: error)
  IPv4 / IPv6                 dotted/hex string validated; IPv4 also
                              accepts the uint32 form; else NULL
                              (strict: error)
  LowCardinality(T)           unwrapped (dictionary encoding is a
                              storage concern, not a value concern)
  Nullable(T)                 unwrapped (Spark columns are nullable)
  Array(String)               array<string>
  Map(String,String)          map<string,string>

Everything is built-in Column expressions — no UDFs.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_INT_TYPES = {
    "Int8": "tinyint",
    "Int16": "smallint",
    "Int32": "int",
    "Int64": "bigint",
    "Int128": "bigint",
    "Int256": "bigint",
    "UInt8": "smallint",
    "UInt16": "int",
    "UInt32": "bigint",
    "UInt64": "bigint",
    "UInt128": "bigint",
    "UInt256": "bigint",
}

_IPV4_RE = r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)$"
_IPV6_RE = r"^[0-9a-fA-F:]+(:((\d{1,3}\.){3}\d{1,3}))?$"


def _strict_or_null(value: Column, valid: Column, strict: bool, what: str) -> Column:
    if strict:
        return F.when(valid, value).otherwise(
            F.raise_error(F.lit(f"clickhouse strict_types: invalid {what}"))
        )
    return F.when(valid, value)


def parse_enum_domain(spec: str) -> dict[str, str]:
    """``'a' = 1, 'b' = 2`` -> {'a': '1', 'b': '2'}."""
    out = {}
    for m in re.finditer(r"'((?:[^'\\]|\\.)*)'\s*=\s*(-?\d+)", spec):
        out[m.group(1)] = m.group(2)
    return out


def ch_type_to_expr(col: Column, ch_type: str, strict: bool) -> Column:
    """Compile one ClickHouse type string to a coercion expression."""
    t = ch_type.strip()
    m = re.fullmatch(r"(Nullable|LowCardinality)\((.*)\)", t)
    if m:
        return ch_type_to_expr(col, m.group(2), strict)

    if t in ("Float32", "Float64"):
        target = "float" if t == "Float32" else "double"
        if strict:
            return col.cast(target)
        return col.try_cast(target)

    if t in _INT_TYPES:
        target = _INT_TYPES[t]
        src = col.cast("string")
        # non-strict mode floors floats like the reference's AsInt
        num = src.try_cast("decimal(38,9)")
        v = F.floor(num).cast(target)
        if strict:
            return col.cast(target)
        return v

    if t == "String":
        if strict:
            return col.cast("string")
        # non-strict: complex values JSON-encoded (clickhouse.go:247);
        # NULL stays NULL (to_json of a null struct field yields '{}')
        return F.coalesce(
            col.try_cast("string"),
            F.when(col.isNotNull(), F.to_json(F.struct(col))),
        )

    if t == "Bool":
        if strict:
            return col.cast("boolean")
        s = F.lower(col.try_cast("string"))
        return (
            F.when(s.isin("true", "1"), F.lit(True))
            .when(s.isin("false", "0"), F.lit(False))
            .otherwise(col.try_cast("boolean"))
        )

    # the optional timezone argument — DateTime('Europe/Moscow'),
    # DateTime64(3, 'UTC') — is ClickHouse DISPLAY metadata: the stored
    # instant is identical (epoch-based), so coercion ignores it
    if re.fullmatch(r"DateTime(\('[^']+'\))?", t):
        s = col.cast("string")
        # RFC3339Nano or unix seconds (clickhouse.go README: DateTime)
        unix = s.try_cast("bigint")
        parsed = F.coalesce(
            F.try_to_timestamp(s),
            F.when(unix > 0, F.timestamp_seconds(unix)),
        )
        return _strict_or_null(parsed, parsed.isNotNull(), strict, "DateTime")

    m = re.fullmatch(r"DateTime64\((\d)(?:,\s*'[^']+')?\)", t)
    if m:
        prec = int(m.group(1))
        s = col.cast("string")
        unix = s.try_cast("bigint")
        if prec == 3:
            from_unix = F.timestamp_millis(unix)
        elif prec == 6:
            from_unix = F.timestamp_micros(unix)
        elif prec == 9:
            from_unix = F.timestamp_micros(F.floor(unix / 1000).cast("bigint"))
        else:
            from_unix = F.timestamp_seconds(unix)
        parsed = F.coalesce(
            F.try_to_timestamp(s), F.when(unix > 0, from_unix)
        )
        return _strict_or_null(parsed, parsed.isNotNull(), strict, t)

    m = re.fullmatch(r"Enum(8|16)\((.*)\)", t, re.S)
    if m:
        domain = parse_enum_domain(m.group(2))
        s = col.cast("string")
        by_name = s.isin(*domain.keys()) if domain else F.lit(False)
        expr = F.when(by_name, s)
        for name, num in domain.items():
            expr = expr.when(s == num, F.lit(name))
        if strict:
            return expr.otherwise(
                F.raise_error(F.lit(f"clickhouse strict_types: invalid {t}"))
            )
        return expr

    if t == "IPv4":
        s = col.cast("string")
        as_int = s.try_cast("bigint")
        from_int = F.concat_ws(
            ".",
            F.shiftright(as_int, 24).bitwiseAND(F.lit(255)).cast("string"),
            F.shiftright(as_int, 16).bitwiseAND(F.lit(255)).cast("string"),
            F.shiftright(as_int, 8).bitwiseAND(F.lit(255)).cast("string"),
            as_int.bitwiseAND(F.lit(255)).cast("string"),
        )
        dotted = s.rlike(_IPV4_RE)
        in_range = as_int.isNotNull() & (as_int >= 0) & (as_int <= 0xFFFFFFFF)
        value = F.when(dotted, s).when(in_range, from_int)
        return _strict_or_null(value, dotted | in_range, strict, "IPv4")

    if t == "IPv6":
        s = col.cast("string")
        valid = s.rlike(_IPV6_RE) & s.contains(":")
        return _strict_or_null(s, valid, strict, "IPv6")

    m = re.fullmatch(r"Array\((.*)\)", t)
    if m:
        inner = _INT_TYPES.get(m.group(1).strip(), "string")
        target = f"array<{inner}>"
        if strict:
            return col.cast(target)
        return F.coalesce(
            col.try_cast(target),
            # scalar -> JSON-encoded singleton, mirroring non-strict
            F.array(col.try_cast("string")).cast(target),
        )

    m = re.fullmatch(r"Map\((.*),(.*)\)", t)
    if m:
        target = "map<string,string>"
        if strict:
            return col.cast(target)
        return col.try_cast(target)

    if t == "UUID":
        s = F.lower(col.cast("string"))
        ok = s.rlike(
            "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"
        )
        return _strict_or_null(
            F.when(ok, s), ok | s.isNull(), strict, "UUID"
        )

    raise ValueError(f"unsupported ClickHouse type: {ch_type!r}")


def coerce_clickhouse(df, columns: list[dict], strict: bool = False):
    """Project df onto declared ClickHouse columns
    (cfg ``columns: [{name: ..., type: ...}, ...]``)."""
    out = []
    for c in columns:
        name, ch_type = c["name"], c["type"]
        src = F.col(name) if name in df.columns else F.lit(None)
        out.append(ch_type_to_expr(src, ch_type, strict).alias(name))
    return df.select(*out)
