"""Golden replay of the reference hash action test corpus
(/root/reference/plugin/action/hash/hash_test.go): every expected
uint64 there is XXH64(seed=0) of the selected field's bytes after
max_size truncation and (optionally) token normalization.

We verify BYTE PARITY of our field-selection + normalization by
recomputing XXH64 (public algorithm, pure-Python below) over the
string our pipeline would hash and comparing against the reference's
expected values.  The production column uses Spark's builtin
``xxhash64`` (seed 42) — same identity semantics, different constant;
documented divergence in actions/hash_op.py.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from file_d_spark.engine import Pipeline
from file_d_spark.functions.normalize import normalize_tokens

MASK64 = (1 << 64) - 1
P1, P2, P3, P4, P5 = (
    11400714785074694791,
    14029467366897019727,
    1609587929392839161,
    9650029242287828579,
    2870177450012600261,
)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & MASK64
    return (_rotl(acc, 31) * P1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * P1 + P4) & MASK64


def xxh64(data: bytes, seed: int = 0) -> int:
    """Reference XXH64 (Collet's public spec), seed 0 like
    github.com/cespare/xxhash's Sum64."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK64
        v2 = (seed + P2) & MASK64
        v3 = seed
        v4 = (seed - P1) & MASK64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & MASK64
    h = (h + n) & MASK64
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & MASK64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & MASK64
        h = (_rotl(h, 23) * P2 + P3) & MASK64
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK64
        h = (_rotl(h, 11) * P1) & MASK64
        i += 1
    h ^= h >> 33
    h = (h * P2) & MASK64
    h ^= h >> 29
    h = (h * P3) & MASK64
    h ^= h >> 32
    return h


def test_xxh64_spec_vectors():
    # published XXH64 test vectors (seed 0)
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999


# (name, config-ish, input json, want hash or None for absent)
NGINX_MSG = (
    '2023-10-30T13:35:33.638720813Z error occurred, client: 10.125.172.251, '
    'upstream: "http://10.117.246.15:84/download", '
    'host: "mpm-youtube-downloader-38.name.com:84"'
)

CASES = [
    # hash_test.go format_no1: first present scalar = error.code, raw
    ("format_no1",
     dict(fields=[{"field": "error.code"}, {"field": "message", "format": "normalize"}]),
     {"level": "error",
      "error": {"code": "unauthenticated", "message": "bad token format"},
      "message": "error occurred"},
     6584967863753642363),
    # format_no2: error.code absent -> message raw
    ("format_no2",
     dict(fields=[{"field": "error.code"}, {"field": "message", "format": "no"}]),
     {"level": "error", "message": NGINX_MSG},
     6051551654033583881),
    ("format_normalize1",
     dict(fields=[{"field": "error.code"}, {"field": "message", "format": "normalize"}]),
     {"level": "error", "message": "error occurred"},
     10960504816536859672),
    ("format_normalize2",
     dict(fields=[{"field": "error.code"}, {"field": "message", "format": "normalize"}]),
     {"level": "error", "message": NGINX_MSG},
     16996027065257776963),
    ("field_max_size",
     dict(fields=[{"field": "message", "format": "normalize", "max_size": 70}]),
     {"level": "error", "message": NGINX_MSG},
     10662808184633841128),
    ("normalizer_only_custom",
     dict(fields=[{"field": "message", "format": "normalize"}],
          normalizer={"builtin_patterns": "no",
                      "custom_patterns": [{"placeholder": "<date>",
                                           "re": r"\d\d.\d\d.\d\d\d\d"}]}),
     {"level": "error", "message": 'request from "ivanivanov", signed on 19.03.2025'},
     6546706502540149833),
    ("normalizer_custom_and_builtin",
     dict(fields=[{"field": "message", "format": "normalize"}],
          normalizer={"builtin_patterns": "all",
                      "custom_patterns": [{"placeholder": "<nginx_datetime>",
                                           "re": r"\d\d\d\d/\d\d/\d\d\ \d\d:\d\d:\d\d",
                                           "priority": "last"}]}),
     {"level": "error", "message": "2006/01/02 15:04:05 " + NGINX_MSG[31:]},
     4150276598667727274),
    ("normalizer_partial_builtin",
     dict(fields=[{"field": "message", "format": "normalize"}],
          normalizer={"builtin_patterns": "double_quoted"}),
     {"level": "error", "message": "2006/01/02 15:04:05 " + NGINX_MSG[31:]},
     18348543511044429638),
]


def _selected_normalized(spark, cfg: dict, event: dict) -> str | None:
    """Mirror HashAction's field selection + per-field transform and
    return the exact string the reference would hash."""
    norm_cfg = cfg.get("normalizer") or {}
    builtin = norm_cfg.get("builtin_patterns", "all")
    customs = norm_cfg.get("custom_patterns") or []
    for fcfg in cfg["fields"]:
        parts = fcfg["field"].split(".")
        node = event
        for p in parts:
            node = node.get(p) if isinstance(node, dict) else None
            if node is None:
                break
        if node is None or isinstance(node, (dict, list)):
            continue
        val = str(node)
        max_size = int(fcfg.get("max_size", 0) or 0)
        if max_size > 0:
            val = val[:max_size]
        if fcfg.get("format", "no") == "normalize":
            df = spark.createDataFrame([(val,)], "msg string")
            val = df.select(
                normalize_tokens(F.col("msg"), builtin, custom_patterns=customs)
                .alias("n")
            ).collect()[0].n
        return val
    return None


@pytest.mark.parametrize("name,cfg,event,want", CASES, ids=[c[0] for c in CASES])
def test_hash_golden_byte_parity(spark, name, cfg, event, want):
    got = _selected_normalized(spark, cfg, event)
    assert got is not None
    assert xxh64(got.encode()) == want, f"normalized bytes diverge: {got!r}"


def test_hash_action_wiring_and_absent_fields(spark):
    """Action-level: result equals Spark xxhash64 of the selected
    field; object/array/absent fields yield NO result field
    (hash_test.go no_field/field_obj/field_arr)."""
    df = spark.createDataFrame(
        [("unauthenticated", "error occurred")], "code string, message string"
    )
    p = Pipeline.from_dict(
        {"actions": [{"type": "hash", "result_field": "hash",
                      "fields": [{"field": "code"}, {"field": "message"}]}]}
    )
    out = p.apply(df).collect()[0]
    want = df.select(F.xxhash64("code").alias("h")).collect()[0].h
    assert out["hash"] == want

    # object / array fields are skipped; nothing left -> passthrough
    df2 = spark.createDataFrame(
        [(json.dumps({"level": "error"}),)], "raw string"
    ).select(
        F.struct(F.lit("error").alias("level")).alias("test_obj"),
        F.array(F.lit(1), F.lit(2)).alias("test_arr"),
    )
    p2 = Pipeline.from_dict(
        {"actions": [{"type": "hash", "result_field": "hash",
                      "fields": [{"field": "test_obj"}, {"field": "test_arr"},
                                 {"field": "missing"}]}]}
    )
    out2 = p2.apply(df2)
    assert "hash" not in out2.columns

    # per-row absence: null candidate -> null result (dropped on encode)
    df3 = spark.createDataFrame([(None,), ("x",)], "msg string")
    p3 = Pipeline.from_dict(
        {"actions": [{"type": "hash", "result_field": "hash",
                      "fields": [{"field": "msg"}]}]}
    )
    rows = {r["msg"]: r["hash"] for r in p3.apply(df3).collect()}
    assert rows[None] is None and rows["x"] is not None
