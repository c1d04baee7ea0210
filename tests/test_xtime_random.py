"""Randomized differential test for the Go-layout time renderer/parser.

A seeded generator builds random Go time layouts as TOKEN SEQUENCES
(weekday prefix, y/m/d in any order with any separator — including the
dotted dates that broke the round-7 fraction trim — 24h or 12h+PM
time, '9'-style and '0'-style fractions, zone suffixes), joins them
into the layout string, renders a pool of edge-case timestamps through
``xtime.format_time`` in ONE Spark job (one column per layout), and
compares every cell against a pure-Python renderer implementing Go
``time.Format`` semantics (/root/reference/vendor or stdlib
time/format.go: zero-padded std tokens, '9'-fractions drop trailing
zeros and the dot on whole seconds, '0'-fractions keep zeros).

A second job round-trips every fully-dated layout through
``xtime.parse_time`` and checks the result equals the timestamp
truncated to the layout's precision (weekday strip, optional-fraction
brackets, zone parse).

Known documented divergences stay out of the generated envelope:
``_2`` space-padded day (format_time degrades it to plain 'd'), and
timestamps are microsecond-precision (Spark's type), so 9-digit
fractions always end in three zeros — the Python reference computes
from the same micros.

Teeth-checked by mutation during development: reintroducing round 7's
end-anchored whole-string trim regex flips 6 cells (the dotted-date
'9'-fraction layouts); dropping the trailing-zero strip flips 99.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from file_d_spark import xtime

SEED = 20260815
N_LAYOUTS = 48

MONTH_ABBR = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
              "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
MONTH_FULL = ["January", "February", "March", "April", "May", "June",
              "July", "August", "September", "October", "November",
              "December"]
DAY_ABBR = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]
DAY_FULL = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
            "Saturday", "Sunday"]

FRACTIONS = [".999", ".999999", ".999999999", ".000", ".000000",
             ".000000000"]
ZONES = ["Z07:00", "Z0700", "-07:00", "-0700", "MST"]

# Edge-case timestamp pool (UTC): pad boundaries on every component,
# AM/PM and 12-o'clock edges, fraction shapes from whole-second to
# full-micros, the exact ADVICE-r7 repro (10:00:09.120), century edges
# for 'yy'.
TIMESTAMPS = [
    dt.datetime(2026, 8, 15, 10, 0, 9, 120000),   # ADVICE r7 repro
    dt.datetime(2026, 10, 15, 10, 0, 9, 0),       # whole second
    dt.datetime(2026, 1, 2, 0, 0, 0, 1),          # midnight, 1us
    dt.datetime(2026, 1, 2, 12, 0, 0, 100000),    # noon, .1
    dt.datetime(1999, 12, 31, 23, 59, 59, 999999),
    dt.datetime(2000, 1, 1, 0, 0, 1, 10000),
    dt.datetime(2026, 2, 3, 1, 4, 5, 123456),
    dt.datetime(2026, 11, 30, 11, 59, 59, 900000),
    dt.datetime(2026, 7, 4, 13, 30, 45, 500),
    dt.datetime(2026, 9, 9, 9, 9, 9, 90000),
    dt.datetime(2026, 12, 25, 22, 10, 0, 0),
    dt.datetime(2026, 3, 1, 6, 7, 8, 7000),
]


def render_token(d: dt.datetime, tok: str) -> str:
    """Go time.Format semantics for one std token, UTC zone."""
    if tok == "2006":
        return f"{d.year:04d}"
    if tok == "06":
        return f"{d.year % 100:02d}"
    if tok == "01":
        return f"{d.month:02d}"
    if tok == "Jan":
        return MONTH_ABBR[d.month - 1]
    if tok == "January":
        return MONTH_FULL[d.month - 1]
    if tok == "02":
        return f"{d.day:02d}"
    if tok == "2":
        return str(d.day)
    if tok == "15":
        return f"{d.hour:02d}"
    if tok == "3":
        return str(d.hour % 12 or 12)
    if tok == "04":
        return f"{d.minute:02d}"
    if tok == "05":
        return f"{d.second:02d}"
    if tok == "PM":
        return "PM" if d.hour >= 12 else "AM"
    if tok == "Mon":
        return DAY_ABBR[d.weekday()]
    if tok == "Monday":
        return DAY_FULL[d.weekday()]
    if tok in FRACTIONS:
        n = len(tok) - 1
        digits = f"{d.microsecond * 1000:09d}"[:n]
        if tok[1] == "9":
            digits = digits.rstrip("0")
            return "." + digits if digits else ""
        return "." + digits
    if tok in ("Z07:00", "Z0700"):
        return "Z"
    if tok == "-07:00":
        return "+00:00"
    if tok == "-0700":
        return "+0000"
    if tok == "MST":
        return "UTC"
    raise AssertionError(tok)


def go_render(d: dt.datetime, tokens: list) -> str:
    out = []
    for t in tokens:
        out.append(t[1] if isinstance(t, tuple) else render_token(d, t))
    return "".join(out)


def gen_layout(rng: random.Random) -> list:
    """Random Go layout as a token list; tuples are literal runs.
    Separators are always non-digit so the translator's longest-first
    scan and Go's tokenizer agree on the token boundaries."""
    tokens: list = []
    if rng.random() < 0.35:
        tokens += [rng.choice(["Mon", "Monday"]),
                   ("lit", rng.choice([", ", " "]))]
    date_sep = rng.choice(["-", "/", ".", " "])
    year = rng.choice(["2006", "2006", "2006", "06"])
    month = rng.choice(["01", "01", "Jan", "January"])
    day = rng.choice(["02", "02", "2"])
    parts = {"y": year, "m": month, "d": day}
    date_tokens: list = []
    for i, c in enumerate(rng.choice(["ymd", "dmy", "mdy"])):
        if i:
            date_tokens.append(("lit", date_sep))
        date_tokens.append(parts[c])
    time_tokens: list = []
    twelve = rng.random() < 0.15
    if twelve:
        time_tokens = ["3", ("lit", ":"), "04", ("lit", " "), "PM"]
    else:
        time_tokens = ["15", ("lit", ":"), "04"]
        if rng.random() < 0.85:
            time_tokens += [("lit", ":"), "05"]
            if rng.random() < 0.6:
                time_tokens.append(rng.choice(FRACTIONS))
    mid = ("lit", "T" if date_sep == "-" and rng.random() < 0.3 else " ")
    if rng.random() < 0.2:
        tokens += time_tokens + [("lit", " ")] + date_tokens
    else:
        tokens += date_tokens + [mid] + time_tokens
    if rng.random() < 0.5:
        z = rng.choice(ZONES)
        if not z.startswith("Z") or rng.random() < 0.5:
            tokens.append(("lit", " "))
        tokens.append(z)
    return tokens


def layout_str(tokens: list) -> str:
    return "".join(t[1] if isinstance(t, tuple) else t for t in tokens)


def _frame(spark):
    schema = T.StructType([T.StructField("ts", T.TimestampType())])
    return spark.createDataFrame([(t,) for t in TIMESTAMPS], schema)


def test_format_differential(spark):
    rng = random.Random(SEED)
    layouts = [gen_layout(rng) for _ in range(N_LAYOUTS)]
    # Guarantee the ADVICE-r7 shape is present: dotted date before a
    # '9'-fraction time.
    layouts.append(["02", ("lit", "."), "01", ("lit", "."), "2006",
                    ("lit", " "), "15", ("lit", ":"), "04", ("lit", ":"),
                    "05", ".999"])
    df = _frame(spark)
    cols = [
        xtime.format_time(F.col("ts"), layout_str(tk)).alias(f"L{i}")
        for i, tk in enumerate(layouts)
    ]
    rows = df.select(*cols).collect()
    mismatches = []
    for ts, row in zip(TIMESTAMPS, rows):
        for i, tk in enumerate(layouts):
            want = go_render(ts, tk)
            got = row[f"L{i}"]
            if got != want:
                mismatches.append(
                    f"layout {layout_str(tk)!r} ts {ts}:"
                    f" spark={got!r} python={want!r}"
                )
    assert not mismatches, "\n".join(mismatches[:8]) + (
        f"\n... {len(mismatches)} total" if len(mismatches) > 8 else ""
    )


def _roundtrippable(tokens: list) -> bool:
    toks = [t for t in tokens if not isinstance(t, tuple)]
    return (
        "2006" in toks
        and "15" in toks
        and "05" in toks
        and any(m in toks for m in ("01", "Jan", "January"))
        and any(d in toks for d in ("02", "2"))
    )


def _truncate(ts: dt.datetime, tokens: list) -> dt.datetime:
    frac = next((t for t in tokens
                 if not isinstance(t, tuple) and t in FRACTIONS), None)
    if frac is None:
        return ts.replace(microsecond=0)
    n = min(len(frac) - 1, 6)
    keep = ts.microsecond - ts.microsecond % (10 ** (6 - n))
    return ts.replace(microsecond=keep)


def test_parse_roundtrip_differential(spark):
    rng = random.Random(SEED)
    layouts = [tk for tk in (gen_layout(rng) for _ in range(N_LAYOUTS))
               if _roundtrippable(tk)]
    assert len(layouts) >= 15, "generator envelope drifted"
    df = _frame(spark)
    rendered = df.select(
        "ts",
        *[xtime.format_time(F.col("ts"), layout_str(tk)).alias(f"L{i}")
          for i, tk in enumerate(layouts)],
    )
    parsed = rendered.select(
        "ts",
        *[xtime.parse_time(F.col(f"L{i}"), layout_str(tk)).alias(f"P{i}")
          for i, tk in enumerate(layouts)],
    )
    rows = parsed.collect()
    mismatches = []
    for ts, row in zip(TIMESTAMPS, rows):
        for i, tk in enumerate(layouts):
            want = _truncate(ts, tk)
            got = row[f"P{i}"]
            if got != want:
                mismatches.append(
                    f"layout {layout_str(tk)!r} ts {ts}:"
                    f" parsed={got!r} want={want!r}"
                )
    assert not mismatches, "\n".join(mismatches[:8]) + (
        f"\n... {len(mismatches)} total" if len(mismatches) > 8 else ""
    )
