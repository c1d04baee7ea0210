"""Token normalizer for ``hash format: normalize``.

The reference replaces recognizable tokens in a log message with
placeholders before hashing, so messages differing only in variable
parts collapse to one hash
(/root/reference/plugin/action/hash/normalize/token_normalizer.go:68-90;
pattern ids 43-66).  Placeholder vocabulary (same names): datetime, ip,
uuid, hash, hex, float, int, bool, email, url, host, filepath,
duration, curly/square/parenthesized/quoted brackets.

Implementation: an ordered chain of ``regexp_replace`` Column ops —
entirely JVM-side, whole-stage-codegen'd, no UDF.  Order matters
(datetime before int, uuid before hex, float before int...); the
regexes are written fresh for Java's regex dialect.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# name -> Java regex. Order is the application order.
TOKEN_PATTERNS: list[tuple[str, str]] = [
    ("curly_bracketed", r"\{[^{}]*\}"),
    ("square_bracketed", r"\[[^\[\]]*\]"),
    ("parenthesized", r"\([^()]*\)"),
    ("double_quoted", "\"[^\"]*\""),
    ("single_quoted", r"'[^']*'"),
    ("grave_quoted", r"`[^`]*`"),
    ("email", r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b"),
    ("url", r"\b(?:https?|ftp|ws)://[^\s\"']+"),
    ("uuid", r"\b[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\b"),
    ("datetime", r"\b\d{4}[-/]\d{2}[-/]\d{2}([T ]\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:?\d{2})?)?\b|\b\d{2}:\d{2}:\d{2}(\.\d+)?\b"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}(?::\d{1,5})?\b"),
    ("hash", r"\b[0-9a-fA-F]{32}\b|\b[0-9a-fA-F]{40}\b|\b[0-9a-fA-F]{64}\b"),
    ("filepath", r"(?:^|\s)(?:/[\w.\-]+){2,}/?"),
    ("host", r"\b[a-z0-9]([a-z0-9\-]*[a-z0-9])?(\.[a-z0-9]([a-z0-9\-]*[a-z0-9])?){2,}\b"),
    ("duration", r"[+-]?\b\d+(\.\d+)?(ns|us|µs|ms|s|m|h|d)\b"),
    ("hex", r"\b0[xX][0-9a-fA-F]+\b"),
    ("float", r"[+-]?\b\d+\.\d+\b"),
    ("int", r"[+-]?\b\d+\b"),
    ("bool", r"\b(?i:true|false)\b"),
]

DEFAULT_PATTERNS = [name for name, _ in TOKEN_PATTERNS]


def normalize_tokens(col: Column, patterns: list[str] | None = None) -> Column:
    """Apply the placeholder normalization chain to a string column.

    ``patterns``: subset of pattern names (or ``["all"]``); default all,
    in library order.
    """
    want = set(DEFAULT_PATTERNS if not patterns or "all" in patterns else patterns)
    out = col
    for name, regex in TOKEN_PATTERNS:
        if name in want:
            out = F.regexp_replace(out, regex, f"<{name}>")
    return out
