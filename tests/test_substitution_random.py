"""Randomized differential test for the substitution-template compiler.

A seeded generator builds random templates (literal runs with ``$$``
escapes, ``${field}`` references over present/null/absent/nested
fields, filter chains of trim/trim_to/cut/re) and random events,
renders every template over every event in ONE Spark job (one output
column per template), and compares each cell against a pure-Python
evaluator implementing the reference semantics
(/root/reference/cfg/substitution/substitution.go, trim_filter.go,
trim_to_filter.go:14-26, cut_filter.go:34-46, regex_filter.go).

Envelope constraints: values are ASCII (cut counts bytes in the
reference — for ASCII, bytes == chars, and the byte-level goldens in
test_substitution_golden pin the multibyte behavior); regexes come
from a fixed safe set valid in both Java and Python re.  The
randomized-differential pattern found a real shipped bug in the do_if
compiler (null-equal three-valued leak) — this applies it to the
second-largest compiled surface.
"""

from __future__ import annotations

import json
import random
import re as pyre

from pyspark.sql import types as T

from file_d_spark.substitution import compile_template

SEED = 20260815
N_TEMPLATES = 60
N_EVENTS = 30

LIT_CHARS = "abcdxy 0:._-"
VAL_CHARS = "abcdqxy 019._-"
CUTSETS = ["x", "xy", " ", "._", "ab", "-"]
SUBSTRS = ["ab", "x", "1", "._", "q"]
# (pattern, eligible group lists) — valid and identical in Java + Python
REGEXES = [
    ("[a-z]+", [[0]]),
    ("\\d+", [[0]]),
    ("([a-z])(\\d)", [[0], [1], [2], [1, 2], [2, 1]]),
    ("q+", [[0]]),
    ("[xy]", [[0]]),
]

FIELDS = ["pod", "svc", "n", "obj.k", "missing"]


def gen_event(rng: random.Random) -> tuple:
    def s():
        return "".join(
            rng.choice(VAL_CHARS) for _ in range(rng.randint(0, 12))
        )

    pod = None if rng.random() < 0.15 else s()
    svc = None if rng.random() < 0.15 else s()
    n = None if rng.random() < 0.15 else rng.randint(-50, 5000)
    obj = None if rng.random() < 0.2 else (s(),)
    return (pod, svc, n, obj)


def gen_filter(rng: random.Random) -> tuple[str, list]:
    kind = rng.choice(["trim", "trim_to", "cut", "cut", "re", "re"])
    if kind == "trim":
        return "trim", [rng.choice(["all", "left", "right"]),
                        rng.choice(CUTSETS)]
    if kind == "trim_to":
        return "trim_to", [rng.choice(["all", "left", "right"]),
                           rng.choice(SUBSTRS)]
    if kind == "cut":
        return "cut", [rng.choice(["first", "last"]), rng.randint(1, 8)]
    pat, group_opts = rng.choice(REGEXES)
    args: list = [pat, rng.choice([-1, 0, 1, 2]), rng.choice(group_opts),
                  rng.choice([",", "-"])]
    if rng.random() < 0.5:
        args.append(rng.random() < 0.5)
    return "re", args


def render_filter(name: str, args: list) -> str:
    return f"{name}({', '.join(json.dumps(a) for a in args)})"


def gen_template(rng: random.Random) -> str:
    out = []
    for _ in range(rng.randint(1, 4)):
        if rng.random() < 0.5:
            lit = "".join(
                rng.choice(LIT_CHARS) for _ in range(rng.randint(0, 6))
            )
            if rng.random() < 0.2:
                lit += "$$"
            out.append(lit)
        else:
            ref = rng.choice(FIELDS)
            filters = [gen_filter(rng)
                       for _ in range(rng.choice([0, 0, 1, 1, 2]))]
            inner = ref
            for name, args in filters:
                inner += "|" + render_filter(name, args)
            out.append("${" + inner + "}")
    return "".join(out)


# --- pure-Python reference evaluator ---------------------------------


def py_filter(val, name, args):
    if val is None:
        return None
    if name == "trim":
        mode, cutset = args[0], str(args[1])
        if mode == "left":
            return val.lstrip(cutset)
        if mode == "right":
            return val.rstrip(cutset)
        return val.strip(cutset)
    if name == "trim_to":
        mode, cut = args[0], str(args[1])
        if mode in ("all", "left"):
            i = val.find(cut)
            if i >= 0:
                val = val[i:]
        if mode in ("all", "right"):
            j = val.rfind(cut)
            if j >= 0:
                val = val[: j + len(cut)]
        return val
    if name == "cut":
        mode, count = args[0], int(args[1])
        if len(val) <= count:
            return val
        return val[:count] if mode == "first" else val[-count:]
    if name == "re":
        pat = str(args[0])
        limit = int(args[1]) if len(args) > 1 else -1
        groups = args[2] if len(args) > 2 else [0]
        sep = str(args[3]) if len(args) > 3 else ","
        empty = bool(args[4]) if len(args) > 4 else False
        if not isinstance(groups, list):
            groups = [groups]
        occs = [m for m in pyre.finditer(pat, val)]
        if limit >= 0:
            occs = occs[:limit]
        pieces = []
        for m in occs:
            for g in groups:
                pieces.append(m.group(g) or "")
        if not pieces:
            return "" if empty else val
        return sep.join(pieces)
    raise AssertionError(name)


def py_render(template: str, ev: dict) -> str:
    from file_d_spark.substitution import _Ref, parse_template

    out = []
    for part in parse_template(template):
        if isinstance(part, str):
            out.append(part)
            continue
        assert isinstance(part, _Ref)
        cur: dict | None = ev
        val = None
        for seg in part.selector.split("."):
            if not isinstance(cur, dict) or seg not in cur:
                val = None
                break
            val = cur[seg]
            cur = val if isinstance(val, dict) else None
        if isinstance(val, int):
            val = str(val)
        for name, args in part.filters:
            val = py_filter(val, name, args)
        out.append(val if val is not None else "")
    return "".join(out)


def test_substitution_randomized_differential(spark):
    rng = random.Random(SEED)
    templates = [gen_template(rng) for _ in range(N_TEMPLATES)]
    events = [gen_event(rng) for _ in range(N_EVENTS)]
    schema = T.StructType([
        T.StructField("pod", T.StringType()),
        T.StructField("svc", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("obj", T.StructType([T.StructField("k", T.StringType())])),
    ])
    df = spark.createDataFrame(events, schema)
    cols = [
        compile_template(t, schema).alias(f"c{i}")
        for i, t in enumerate(templates)
    ]
    rows = df.select(*cols).collect()

    def as_dict(ev):
        d = {}
        if ev[0] is not None:
            d["pod"] = ev[0]
        if ev[1] is not None:
            d["svc"] = ev[1]
        if ev[2] is not None:
            d["n"] = ev[2]
        if ev[3] is not None:
            d["obj"] = {"k": ev[3][0]}
        return d

    mismatches = []
    for ei, (row, ev) in enumerate(zip(rows, events)):
        evd = as_dict(ev)
        for ti, t in enumerate(templates):
            want = py_render(t, evd)
            got = row[f"c{ti}"]
            if got != want:
                mismatches.append(
                    f"template {ti} {t!r} event {ei} {evd!r}:"
                    f" spark={got!r} python={want!r}"
                )
    assert not mismatches, "\n".join(mismatches[:8]) + (
        f"\n... {len(mismatches)} total" if len(mismatches) > 8 else ""
    )
