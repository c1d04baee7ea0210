"""Datetime format aliases -> Spark datetime patterns.

The reference names ~20 layouts (/root/reference/xtime/parse_format_name.go:10)
and parses Go-layout strings.  We map each alias to the equivalent
JDK DateTimeFormatter pattern Spark uses, and translate Go layouts on
best effort.  ``unixtime*`` variants parse via numeric conversion.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

UNIX_ALIASES = {"unixtime", "unixtimemilli", "unixtimemicro", "unixtimenano"}

_DURATION_UNITS = {
    "ns": 1e-9, "us": 1e-6, "µs": 1e-6, "ms": 1e-3,
    "s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0,
}


def parse_duration_s(s: str | int | float) -> float:
    """Go-style duration string → seconds ("30s", "5m", "1h30m",
    "300ms", "7d"; bare numbers are seconds).  Raises on anything
    unparseable — config typos must not silently become zero."""
    import re

    if isinstance(s, (int, float)):
        return float(s)
    text = s.strip()
    parts = re.findall(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h|d)", text)
    consumed = "".join(f"{n}{u}" for n, u in parts)
    if parts and consumed == text.replace(" ", ""):
        return sum(float(n) * _DURATION_UNITS[u] for n, u in parts)
    try:
        return float(text)
    except ValueError:
        raise ValueError(f"unparseable duration: {s!r}") from None

# alias -> Spark/JDK pattern (see Spark "Datetime Patterns" docs)
FORMAT_ALIASES: dict[str, str] = {
    "ansic": "EEE MMM ppd HH:mm:ss yyyy",
    "unixdate": "EEE MMM ppd HH:mm:ss zzz yyyy",
    "rubydate": "EEE MMM dd HH:mm:ss xx yyyy",
    "rfc822": "dd MMM yy HH:mm zzz",
    "rfc822z": "dd MMM yy HH:mm xx",
    "rfc850": "EEEE, dd-MMM-yy HH:mm:ss zzz",
    "rfc1123": "EEE, dd MMM yyyy HH:mm:ss zzz",
    "rfc1123z": "EEE, dd MMM yyyy HH:mm:ss xx",
    "rfc3339": "yyyy-MM-dd'T'HH:mm:ssXXX",
    "rfc3339nano": "yyyy-MM-dd'T'HH:mm:ss[.SSSSSSSSS]XXX",
    "kitchen": "h:mma",
    "stamp": "MMM ppd HH:mm:ss",
    "stampmilli": "MMM ppd HH:mm:ss.SSS",
    "stampmicro": "MMM ppd HH:mm:ss.SSSSSS",
    "stampnano": "MMM ppd HH:mm:ss.SSSSSSSSS",
    "nginx_errorlog": "yyyy/MM/dd HH:mm:ss",
}

# Go reference-time tokens -> JDK pattern tokens, longest-first.
_GO_TOKENS: list[tuple[str, str]] = [
    ("2006", "yyyy"),
    ("01", "MM"),
    ("02", "dd"),
    ("15", "HH"),
    ("04", "mm"),
    ("05", "ss"),
    (".999999999", "[.SSSSSSSSS]"),
    (".999999", "[.SSSSSS]"),
    (".999", "[.SSS]"),
    (".000000000", ".SSSSSSSSS"),
    (".000000", ".SSSSSS"),
    (".000", ".SSS"),
    ("Z07:00", "XXX"),
    ("Z0700", "XX"),
    ("-07:00", "xxx"),
    ("-0700", "xx"),
    ("MST", "zzz"),
    ("Monday", "EEEE"),
    ("Mon", "EEE"),
    ("January", "MMMM"),
    ("Jan", "MMM"),
    ("PM", "a"),
    ("06", "yy"),
    ("3", "h"),
    ("_2", "ppd"),
    ("2", "d"),
]


def go_layout_to_spark(layout: str) -> str:
    """Best-effort Go time layout -> JDK pattern translation."""
    out = []
    i = 0
    n = len(layout)
    while i < n:
        for go, jdk in _GO_TOKENS:
            if layout.startswith(go, i):
                out.append(jdk)
                i += len(go)
                break
        else:
            ch = layout[i]
            if ch.isalpha():
                out.append("'" + ch + "'")
            else:
                out.append(ch)
            i += 1
    return "".join(out)


def resolve_format(fmt: str | None) -> str:
    """Resolve a format alias or Go layout to a Spark pattern, or an
    ``unixtime*`` sentinel (returned as-is)."""
    if fmt is None:
        fmt = "rfc3339nano"
    key = fmt.strip().lower()
    if key in UNIX_ALIASES:
        return key
    if key in FORMAT_ALIASES:
        return FORMAT_ALIASES[key]
    return go_layout_to_spark(fmt)


def parse_time(col: Column, fmt: str | None) -> Column:
    """String/number column -> TimestampType using a resolved format.
    Unparsable values -> NULL (try semantics, like xtime.ParseTime
    returning err -> caller skips)."""
    pattern = resolve_format(fmt)
    # try_cast, not cast: ANSI mode throws on malformed numerics, but
    # unparsable values must yield NULL (xtime.ParseTime err semantics)
    if pattern == "unixtime":
        return F.timestamp_seconds(col.try_cast("double"))
    if pattern == "unixtimemilli":
        return F.timestamp_millis(col.try_cast("long"))
    if pattern == "unixtimemicro":
        return F.timestamp_micros(col.try_cast("long"))
    if pattern == "unixtimenano":
        return F.timestamp_micros((col.try_cast("long") / 1000).cast("long"))
    expr = col.cast("string")
    # Spark's parser rejects day-of-week letters ('E') and has no
    # space-padded day ('ppd', Go's _2): the weekday is redundant for
    # parsing — strip it from both pattern and value; collapse the
    # padding run so plain 'd' parses both " 2" and "12"
    if "EEE" in pattern:
        import re as _re

        pattern = _re.sub(r"EEEE?,? ?", "", pattern)
        expr = F.regexp_replace(expr, r"^[A-Za-z]{3,9},?\s+", "")
    if "ppd" in pattern:
        pattern = pattern.replace("ppd", "d")
        expr = F.regexp_replace(expr, r"\s+", " ")
    return F.try_to_timestamp(expr, F.lit(pattern))


def format_time(ts: Column, fmt: str | None) -> Column:
    """Timestamp column -> string/number in the requested format."""
    pattern = resolve_format(fmt)
    if pattern == "unixtime":
        return F.unix_timestamp(ts)
    if pattern == "unixtimemilli":
        return F.unix_millis(ts)
    if pattern == "unixtimemicro":
        return F.unix_micros(ts)
    if pattern == "unixtimenano":
        return F.unix_micros(ts) * F.lit(1000)
    # 'ppd' (Go _2 space-padded day) has no Spark formatter equivalent —
    # plain 'd' (width divergence documented vs Go's space pad)
    import re as _re

    m = _re.search(r"\[\.(S+)\]", pattern)
    if m:
        # bracketed fraction = Go '9'-style (.999999999): trailing
        # fractional zeros are DROPPED, a whole second renders with no
        # fraction at all (time.Format semantics — rfc3339nano
        # "...:09Z", not "...:09.000000000Z").  Render the pieces
        # around the fraction separately and trim only the fraction
        # itself — a trim regex over the joined string can land on a
        # dotted DATE run instead (a '02.01.2006 15:04:05.999' layout
        # rendered '15.10.2026 ...' would lose the month's zero).
        pre, post = pattern[: m.start()], pattern[m.end() :]
        frac = F.regexp_replace(F.date_format(ts, m.group(1)), r"0+$", "")
        pieces = []
        if pre:
            pieces.append(_render_plain(ts, pre))
        pieces.append(
            F.when(frac == "", F.lit("")).otherwise(F.concat(F.lit("."), frac))
        )
        if post:
            pieces.append(_render_plain(ts, post))
        return F.concat(*pieces)
    return _render_plain(ts, pattern)


def _render_plain(ts: Column, pattern: str) -> Column:
    """date_format with the repo's pattern extensions neutralized:
    optional-section brackets are parse-only, 'ppd' degrades to 'd'."""
    return F.date_format(
        ts, pattern.replace("[", "").replace("]", "").replace("ppd", "d")
    )


def ensure_timestamp(
    col: Column, t, fmt: str | None, *, context: str = "time field"
) -> Column:
    """Column in any supported time representation -> TimestampType.

    - TimestampType: pass through
    - TimestampNTZType: cast — exact under the pinned UTC session TZ
    - DateType: cast (midnight)
    - string / integral / floating: parse with ``fmt`` (unparsable
      values -> NULL so downstream bucketing carries a null bucket)
    - anything else: raise at plan-compile time.  A time column that
      can't produce timestamps must fail loudly — silently backfilling
      wall clock collapses every event into one time bucket and turns a
      config error into wrong answers (see round-2 postmortem).
    """
    from pyspark.sql import types as T

    if isinstance(t, T.TimestampType):
        return col
    if isinstance(t, (T.TimestampNTZType, T.DateType)):
        return col.cast("timestamp")
    if t is None or isinstance(
        t,
        (
            T.StringType,
            T.ByteType,
            T.ShortType,
            T.IntegerType,
            T.LongType,
            T.FloatType,
            T.DoubleType,
            T.DecimalType,
        ),
    ):
        return parse_time(col, fmt)
    raise TypeError(
        f"{context}: cannot derive a timestamp from column type "
        f"{t.simpleString()}; expected timestamp/timestamp_ntz/date/"
        f"string/numeric"
    )
