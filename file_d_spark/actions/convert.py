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
    names = F.lit(list(LOG_LEVEL_NAMES))
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
        replace_non_graphic = bool(self.params.get("replace_non_graphic", False))

        @F.pandas_udf("string")
        def decode_escapes(s: pd.Series) -> pd.Series:
            # faithful port of the reference scanner
            # (convert_utf8_bytes.go:171-268): a `\\` pair is a token
            # (so `\\x86` stays literal while `\xD0` decodes), `\u`
            # pairs UTF-16 surrogates, `\U` takes 8 hex digits, octal
            # needs a 0-3 lead digit, and every malformed escape falls
            # back to its literal spelling
            import unicodedata

            REPL = "�".encode()

            def to_rune(u: int) -> int:
                # Go rune(uint64) truncates to int32
                r = u & 0xFFFFFFFF
                return r - (1 << 32) if r >= (1 << 31) else r

            def rune_bytes(r: int) -> bytes:
                if 0 <= r <= 0x10FFFF and not (0xD800 <= r <= 0xDFFF):
                    return chr(r).encode("utf-8")
                return REPL  # Go string(invalid rune) == U+FFFD

            def is_graphic(r: int) -> bool:
                if not (0 <= r <= 0x10FFFF) or (0xD800 <= r <= 0xDFFF):
                    return False
                cat = unicodedata.category(chr(r))
                return cat[0] in "LMNPS" or cat == "Zs"

            def one(v):
                if v is None:
                    return None
                idx = v.find("\\")
                if idx < 0:
                    return v
                buf = bytearray(v[:idx].encode("utf-8"))
                s = v[idx + 1 :]
                while s != "":
                    ch = s[0]
                    if ch == "\\":
                        s = s[1:]
                        buf += b"\\\\"
                    elif ch in ("u", "U"):
                        s = s[1:]
                        size = 8 if ch == "U" else 4
                        if len(s) < size:
                            buf += b"\\" + ch.encode()
                        else:
                            ss = s[:size]
                            try:
                                u = int(ss, 16)
                                if any(c in "+-_ " for c in ss):
                                    raise ValueError
                            except ValueError:
                                buf += b"\\" + ch.encode()
                            else:
                                s = s[size:]
                                r = to_rune(u)
                                if replace_non_graphic and not is_graphic(r):
                                    r = 0xFFFD
                                if size == 8 or not (0xD800 <= r <= 0xDFFF):
                                    buf += rune_bytes(r)
                                elif len(s) < 6 or s[:2] != "\\u":
                                    buf += b"\\u" + ss.encode()
                                else:
                                    try:
                                        u2 = int(s[2:6], 16)
                                        if any(c in "+-_ " for c in s[2:6]):
                                            raise ValueError
                                    except ValueError:
                                        buf += b"\\u" + ss.encode()
                                    else:
                                        # utf16.DecodeRune: FFFD unless
                                        # a valid hi+lo pair
                                        if (
                                            0xD800 <= r <= 0xDBFF
                                            and 0xDC00 <= u2 <= 0xDFFF
                                        ):
                                            cp = (
                                                0x10000
                                                + ((r - 0xD800) << 10)
                                                + (u2 - 0xDC00)
                                            )
                                            buf += chr(cp).encode("utf-8")
                                        else:
                                            buf += REPL
                                        s = s[6:]
                    elif ch == "x":
                        s = s[1:]
                        if len(s) < 2:
                            buf += b"\\x"
                        else:
                            sb = s[:2]
                            pos = 2
                            while len(s) - pos >= 4 and s[pos : pos + 2] == "\\x":
                                sb += s[pos + 2 : pos + 4]
                                pos += 4
                            try:
                                hex_bytes = bytes.fromhex(sb)
                            except ValueError:
                                buf += b"\\x" + s[:pos].encode("utf-8")
                            else:
                                buf += hex_bytes
                            s = s[pos:]
                    elif ch in "0123":
                        if len(s) < 3:
                            buf += b"\\"
                        else:
                            try:
                                if not all(c in "01234567" for c in s[:3]):
                                    raise ValueError
                                byte = int(s[:3], 8)
                            except ValueError:
                                buf += b"\\"
                            else:
                                buf.append(byte)
                                s = s[3:]
                    else:
                        buf += b"\\"
                    j = s.find("\\")
                    if j < 0:
                        buf += s.encode("utf-8")
                        break
                    buf += s[:j].encode("utf-8")
                    s = s[j + 1 :]
                return bytes(buf).decode("utf-8", "replace")

            return s.map(one)

        for selector in self.params.get("fields", []):
            parts = parse_selector(selector)
            col = get_col_safe(parts, df.schema)
            df = self.set_gated(df, parts, decode_escapes(col.cast("string")), pred)
        return df
