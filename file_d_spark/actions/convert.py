r"""Conversion actions: convert_date, convert_log_level,
convert_utf8_bytes.

Reference cites:
  convert_date       /root/reference/plugin/action/convert_date/convert_date.go:20,80
  convert_log_level  /root/reference/plugin/action/convert_log_level/convert_log_level.go:27,95
                     level table /root/reference/pipeline/util.go:69-108
  convert_utf8_bytes /root/reference/plugin/action/convert_utf8_bytes/convert_utf8_bytes.go:113,149
"""

from __future__ import annotations

from functools import reduce

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from file_d_spark import xtime
from file_d_spark.actions.base import Action, register
from file_d_spark.fields import get_col_safe, parse_selector

# RFC-5424 severity table (pipeline/util.go:69-108): alias -> number
LOG_LEVEL_NUMBERS: dict[str, int] = {
    "0": 0, "emergency": 0, "emerg": 0, "fatal": 0, "panic": 0, "dpanic": 0,
    "1": 1, "alert": 1,
    "2": 2, "critical": 2, "crit": 2,
    "3": 3, "error": 3, "err": 3,
    "4": 4, "warning": 4, "warn": 4,
    "5": 5, "notice": 5,
    "6": 6, "informational": 6, "info": 6,
    "7": 7, "debug": 7,
}
LOG_LEVEL_NAMES = [
    "emergency", "alert", "critical", "error",
    "warning", "notice", "informational", "debug",
]


def log_level_number_col(col: Column) -> Column:
    """Normalized RFC-5424 severity number for a level string; NULL if
    unknown."""
    key = F.lower(F.trim(col.cast("string")))
    mapping = F.create_map(
        *[F.lit(x) for kv in LOG_LEVEL_NUMBERS.items() for x in kv]
    )
    return F.element_at(mapping, key)


def log_level_name_col(col: Column) -> Column:
    num = log_level_number_col(col)
    names = F.array(*[F.lit(n) for n in LOG_LEVEL_NAMES])
    # element_at(arr, NULL) does NOT return NULL in this Spark build —
    # guard the unknown-level case explicitly
    return F.when(num.isNotNull(), F.element_at(names, num + 1))


@register("convert_date")
class ConvertDate(Action):
    """Parse ``field`` with the first matching of ``source_formats``
    and re-emit in ``target_format``.  ``remove_on_fail`` drops the
    field when no format matches (default: leave unchanged)."""

    def apply_impl(self, df: DataFrame, pred: Column | None) -> DataFrame:
        parts = parse_selector(self.params["field"])
        src_formats = self.params.get("source_formats", ["rfc3339nano", "unixtime"])
        target = self.params.get("target_format", "unixtime")
        col = get_col_safe(parts, df.schema)
        parsed = reduce(
            lambda acc, fmt: F.coalesce(acc, xtime.parse_time(col, fmt)),
            src_formats[1:],
            xtime.parse_time(col, src_formats[0]),
        )
        rendered = xtime.format_time(parsed, target)
        on_fail = (
            F.lit(None).cast("string")  # remove_on_fail: NULL the field
            if self.params.get("remove_on_fail", False)
            else col.cast("string")
        )
        value = F.when(parsed.isNotNull(), rendered.cast("string")).otherwise(on_fail)
        return self.set_gated(df, parts, value, pred)


@register("convert_log_level")
class ConvertLogLevel(Action):
    """Normalize ``field`` to RFC-5424 ``style: number|string``.
    Unknown levels: keep original unless ``remove_on_fail``."""

    def apply_impl(self, df: DataFrame, pred: Column | None) -> DataFrame:
        parts = parse_selector(self.params.get("field", "level"))
        style = self.params.get("style", "number")
        default = self.params.get("default_level", "")
        col = get_col_safe(parts, df.schema)
        src = F.when(col.cast("string").isNull() | (col.cast("string") == ""), F.lit(default or None)).otherwise(col.cast("string"))
        out = (
            log_level_number_col(src).cast("string")
            if style == "number"
            else log_level_name_col(src)
        )
        if self.params.get("remove_on_fail", False):
            value = out  # unknown level -> NULL (field removed)
        else:
            value = F.coalesce(out, col.cast("string"))
        return self.set_gated(df, parts, value, pred)


@register("convert_utf8_bytes")
class ConvertUtf8Bytes(Action):
    r"""Decode ``\uXXXX`` / ``\xNN`` / octal escapes embedded in string
    fields into UTF-8 characters.

    No Spark built-in covers the full escape grammar, so this is the
    one sanctioned Pandas-UDF scalar in the action set (SURVEY.md §7.1
    design rules) — Arrow-vectorized, not row-at-a-time.
    """

    def apply_impl(self, df: DataFrame, pred: Column | None) -> DataFrame:
        @F.pandas_udf("string")
        def decode_escapes(s: pd.Series) -> pd.Series:
            import re

            pat = re.compile(
                r"\\u([0-9a-fA-F]{4})|\\x([0-9a-fA-F]{2})|\\([0-7]{3})"
            )

            def one(v):
                if v is None:
                    return None

                out = []
                bytebuf = bytearray()

                def flush():
                    nonlocal bytebuf
                    if bytebuf:
                        out.append(bytes(bytebuf).decode("utf-8", "replace"))
                        bytebuf = bytearray()

                idx = 0
                for m in pat.finditer(v):
                    if m.start() > idx:
                        flush()
                        out.append(v[idx : m.start()])
                    if m.group(1):  # \uXXXX
                        flush()
                        out.append(chr(int(m.group(1), 16)))
                    elif m.group(2):  # \xNN — may be a UTF-8 byte run
                        bytebuf.append(int(m.group(2), 16))
                    else:  # octal
                        bytebuf.append(int(m.group(3), 8))
                    idx = m.end()
                flush()
                out.append(v[idx:])
                return "".join(out)

            return s.map(one)

        for selector in self.params.get("fields", []):
            parts = parse_selector(selector)
            col = get_col_safe(parts, df.schema)
            df = self.set_gated(df, parts, decode_escapes(col.cast("string")), pred)
        return df
