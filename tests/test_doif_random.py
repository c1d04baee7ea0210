"""Randomized differential test for the do_if predicate compiler.

A seeded generator builds random predicate trees (field ops with
case flags and null values, and/or/not compositions, byte/array/int
length comparisons) and random events (scalars, nulls, absent fields,
arrays, nested objects), evaluates every tree over every event in ONE
Spark job (one predicate column per tree, variant-rooted like the
golden corpus replay), and compares each cell against a pure-Python
evaluator implementing the reference semantics
(/root/reference/pipeline/doif/field_op.go, len_cmp_op.go).

Generation constraints mirror the reference's documented envelope:
field ops are only generated over scalar-or-absent fields (insaneJSON's
AsString on objects is not pinned by any reference test; the golden
corpus covers the object-vs-equal case), numbers are ints (float
rendering differs between JSON engines), and ts_cmp is covered by the
golden corpus instead.
"""

import json
import random

from pyspark.sql import functions as F

from file_d_spark.doif import compile_doif

SEED = 20260815
N_TREES = 48
N_EVENTS = 36

SCALAR_FIELDS = ["pod", "svc", "msg"]
COMPLEX_FIELDS = ["items", "meta"]
WORDS = ["alpha", "Beta", "gamma-1", "DELTA", "x", "", "test-1", "Test-1"]


def gen_event(rng: random.Random) -> dict:
    ev = {}
    for f in SCALAR_FIELDS:
        roll = rng.random()
        if roll < 0.2:
            continue  # absent
        if roll < 0.3:
            ev[f] = None
        elif roll < 0.5:
            ev[f] = rng.randint(-5, 2000)
        else:
            ev[f] = rng.choice(WORDS)
    if rng.random() < 0.6:
        ev["items"] = [rng.randint(0, 9) for _ in range(rng.randint(0, 4))]
    if rng.random() < 0.4:
        ev["meta"] = {"k": rng.choice(WORDS)}
    return ev


def gen_leaf(rng: random.Random) -> dict:
    kind = rng.choice(
        ["equal", "contains", "contains_any", "prefix", "suffix",
         "byte_len_cmp", "array_len_cmp", "int_val_cmp", "check_type"]
    )
    if kind == "check_type":
        cats = ["object", "arr", "number", "str", "null", "nil"]
        return {
            "op": kind,
            "field": rng.choice(SCALAR_FIELDS + COMPLEX_FIELDS),
            "values": rng.sample(cats, rng.randint(1, 3)),
        }
    if kind in ("byte_len_cmp", "int_val_cmp"):
        return {
            "op": kind,
            "field": rng.choice(SCALAR_FIELDS),
            "cmp_op": rng.choice(["lt", "le", "gt", "ge", "eq", "ne"]),
            "value": rng.randint(0, 8),
        }
    if kind == "array_len_cmp":
        return {
            "op": kind,
            "field": rng.choice(SCALAR_FIELDS + COMPLEX_FIELDS),
            "cmp_op": rng.choice(["lt", "le", "gt", "ge", "eq", "ne"]),
            "value": rng.randint(0, 4),
        }
    values = rng.sample(WORDS, rng.randint(1, 3))
    if kind == "equal" and rng.random() < 0.3:
        values = values + [None]
    if kind == "contains_any":
        values = [rng.choice(["!#$", "ax", "e-1", "Z"])]
    return {
        "op": kind,
        "field": rng.choice(SCALAR_FIELDS),
        "case_sensitive": rng.random() < 0.7,
        "values": values,
    }


def gen_tree(rng: random.Random, depth: int = 0) -> dict:
    if depth >= 2 or rng.random() < 0.5:
        return gen_leaf(rng)
    op = rng.choice(["and", "or", "not"])
    n = 1 if op == "not" else rng.randint(2, 3)
    return {"op": op, "operands": [gen_tree(rng, depth + 1) for _ in range(n)]}


# -- pure-Python reference evaluator ---------------------------------------

_CMP = {
    "lt": lambda a, b: a < b, "le": lambda a, b: a <= b,
    "gt": lambda a, b: a > b, "ge": lambda a, b: a >= b,
    "eq": lambda a, b: a == b, "ne": lambda a, b: a != b,
}


def _as_string(v):
    """insaneJSON AsString for the generated scalar envelope."""
    if v is None or isinstance(v, (dict, list)):
        return None
    return v if isinstance(v, str) else str(v)


def ref_eval(tree: dict, ev: dict) -> bool:
    op = tree["op"]
    if op in ("and", "or", "not"):
        vals = [ref_eval(t, ev) for t in tree["operands"]]
        if op == "not":
            return not vals[0]
        return all(vals) if op == "and" else any(vals)
    field = tree["field"]
    present = field in ev
    raw = ev.get(field)
    if op in ("equal", "contains", "contains_any", "prefix", "suffix"):
        values = tree.get("values", [])
        has_null = any(v is None for v in values)
        strs = [v for v in values if v is not None]
        ci = not tree.get("case_sensitive", True)
        if ci:
            strs = [s.lower() for s in strs]
        s = _as_string(raw)
        if not present or s is None:
            # absent and JSON-null both match only a null value on equal
            return has_null and op == "equal"
        if ci:
            s = s.lower()
        if op == "equal":
            return s in strs
        if op == "contains":
            return any(v in s for v in strs)
        if op == "contains_any":
            return any(ch in s for v in strs for ch in v)
        if op == "prefix":
            return any(s.startswith(v) for v in strs)
        if op == "suffix":
            return any(s.endswith(v) for v in strs)
    if op == "byte_len_cmp":
        if not present:
            return False
        if isinstance(raw, (dict, list)):
            s = json.dumps(raw, separators=(",", ":"))
        else:
            s = _as_string(raw)
            if s is None:
                return False
        return _CMP[tree["cmp_op"]](len(s.encode()), tree["value"])
    if op == "array_len_cmp":
        if not isinstance(raw, list):
            return False
        return _CMP[tree["cmp_op"]](len(raw), tree["value"])
    if op == "check_type":
        aliases = {"obj": "object", "arr": "array",
                   "num": "number", "str": "string"}
        values = [aliases.get(v, v) for v in tree["values"]]
        if not present:
            cat = "nil"
        elif raw is None:
            cat = "null"
        elif isinstance(raw, dict):
            cat = "object"
        elif isinstance(raw, list):
            cat = "array"
        elif isinstance(raw, str):
            cat = "string"
        else:
            cat = "number"
        return cat in values
    if op == "int_val_cmp":
        if not present:
            return False
        if isinstance(raw, int) and not isinstance(raw, bool):
            n = raw
        elif isinstance(raw, str):
            try:
                n = int(raw)
            except ValueError:
                return False
        else:
            return False
        return _CMP[tree["cmp_op"]](n, tree["value"])
    raise AssertionError(op)


def test_doif_random_differential(spark):
    rng = random.Random(SEED)
    events = [gen_event(rng) for _ in range(N_EVENTS)]
    trees = [gen_tree(rng) for _ in range(N_TREES)]

    df = spark.createDataFrame(
        [(i, json.dumps(ev)) for i, ev in enumerate(events)], "i int, raw string"
    ).withColumn("ev", F.try_parse_json("raw"))

    def prefix(tree):
        out = dict(tree)
        if "operands" in out:
            out["operands"] = [prefix(t) for t in out["operands"]]
        else:
            out["field"] = "ev." + out["field"]
        return out

    cols = [
        F.coalesce(compile_doif(prefix(t), df.schema), F.lit(False)).alias(f"t{j}")
        for j, t in enumerate(trees)
    ]
    rows = {r.i: r for r in df.select("i", *cols).collect()}

    mismatches = []
    for i, ev in enumerate(events):
        for j, t in enumerate(trees):
            want = ref_eval(t, ev)
            got = rows[i][f"t{j}"]
            if got is not want:
                mismatches.append((json.dumps(ev), t, want, got))
    assert not mismatches, mismatches[:3]


def test_match_fields_random_differential(spark):
    """Same differential harness for the legacy match_fields matcher
    (processor.go:331-402): exact values, /regex/ literals, lists,
    AND/OR modes, invert."""
    from file_d_spark.doif import compile_match_fields

    rng = random.Random(SEED + 1)
    events = [gen_event(rng) for _ in range(N_EVENTS)]

    def gen_mf(rng):
        fields = {}
        for f in rng.sample(SCALAR_FIELDS, rng.randint(1, 2)):
            vals = []
            for _ in range(rng.randint(1, 2)):
                if rng.random() < 0.3:
                    vals.append("/" + rng.choice(["test-.", "a.*a", "^x$"]) + "/")
                else:
                    vals.append(rng.choice(WORDS))
            fields[f] = vals if len(vals) > 1 else vals[0]
        return fields, rng.choice(["and", "or"]), rng.random() < 0.4

    import re as _re

    def ref_mf(fields, mode, invert, ev):
        preds = []
        for f, want in fields.items():
            values = want if isinstance(want, list) else [want]
            s = _as_string(ev.get(f)) if f in ev else None
            if s is None:
                preds.append(False)
                continue
            ok = False
            for v in values:
                if len(v) >= 2 and v.startswith("/") and v.endswith("/"):
                    ok = ok or _re.search(v[1:-1], s) is not None
                else:
                    ok = ok or s == v
            preds.append(ok)
        result = all(preds) if mode == "and" else any(preds)
        return (not result) if invert else result

    matchers = [gen_mf(rng) for _ in range(32)]
    df = spark.createDataFrame(
        [(i, json.dumps(ev)) for i, ev in enumerate(events)], "i int, raw string"
    ).withColumn("ev", F.try_parse_json("raw"))
    cols = [
        F.coalesce(
            compile_match_fields(
                {f"ev.{f}": v for f, v in fields.items()}, df.schema,
                mode=mode, invert=invert,
            ),
            F.lit(False),
        ).alias(f"m{j}")
        for j, (fields, mode, invert) in enumerate(matchers)
    ]
    rows = {r.i: r for r in df.select("i", *cols).collect()}
    mismatches = []
    for i, ev in enumerate(events):
        for j, (fields, mode, invert) in enumerate(matchers):
            want = ref_mf(fields, mode, invert, ev)
            got = rows[i][f"m{j}"]
            if got is not want:
                mismatches.append((json.dumps(ev), fields, mode, invert, want, got))
    assert not mismatches, mismatches[:3]
