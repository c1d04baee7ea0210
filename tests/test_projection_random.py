"""Randomized differential for the nested projection actions.

Seeded trials generate a random nested schema, random rows (with
nulls), and random keep_fields / remove_fields selector lists (nested,
subsumed, and nonexistent paths included), then compare the engine's
output rows — serialized with explicit nulls — against a pure-Python
dict evaluator of the reference semantics
(/root/reference/plugin/action/keep_fields/keep_fields.go:58-118,
remove_fields.go:63-97).  Dict comparison is order-insensitive, so the
engine's selector-ordered struct rebuild does not need to match the
generator's key order.
"""

import json
import random

from pyspark.sql import functions as F

from file_d_spark import Pipeline

SEED = 20260816
N_TRIALS = 6
NAMES = ["a", "b", "c", "d", "e"]
LEAF_VALUES = ["x", "yy", "", None, "zzz"]


def gen_schema(rng: random.Random, depth: int = 0) -> dict:
    """name -> 'leaf' | nested dict (schema as a template dict)."""
    n = rng.randint(2, 3 if depth else 4)
    fields = rng.sample(NAMES, n)
    return {
        f: (gen_schema(rng, depth + 1) if depth < 2 and rng.random() < 0.4
            else "leaf")
        for f in fields
    }


def gen_row(rng: random.Random, schema: dict):
    return {
        f: (gen_row(rng, t) if isinstance(t, dict) else rng.choice(LEAF_VALUES))
        for f, t in schema.items()
    }


def _inner(schema: dict) -> str:
    parts = []
    for f, t in schema.items():
        parts.append(f"{f}: struct<{_inner(t)}>" if isinstance(t, dict)
                     else f"{f}: string")
    return ", ".join(parts)


def all_paths(schema: dict, prefix=()) -> list:
    out = []
    for f, t in schema.items():
        out.append(prefix + (f,))
        if isinstance(t, dict):
            out += all_paths(t, prefix + (f,))
    return out


def gen_selectors(rng: random.Random, schema: dict) -> list:
    paths = all_paths(schema)
    chosen = rng.sample(paths, min(len(paths), rng.randint(1, 4)))
    sels = [".".join(p) for p in chosen]
    if rng.random() < 0.5:
        sels.append("nope")  # nonexistent top
    if rng.random() < 0.5:
        sels.append(sels[0] + ".nope")  # nonexistent nested
    rng.shuffle(sels)
    return sels


def to_tuple_row(row: dict, schema: dict):
    return tuple(
        to_tuple_row(row[f], t) if isinstance(t, dict) else row[f]
        for f, t in schema.items()
    )


# -- pure-Python reference evaluators ---------------------------------------

def ref_keep(event: dict, schema: dict, selectors: list) -> dict:
    keys = {tuple(s.split(".")) for s in selectors}
    kept = [
        p for p in keys
        if not any(p[:i] in keys for i in range(1, len(p)))
    ]

    def exists(schema, p):
        cur = schema
        for seg in p:
            if not isinstance(cur, dict) or seg not in cur:
                return False
            cur = cur[seg]
        return True

    out: dict = {}
    for p in kept:
        if not exists(schema, p):
            continue
        src = event
        for seg in p[:-1]:
            src = src[seg]
        node = out
        for seg in p[:-1]:
            node = node.setdefault(seg, {})
        node[p[-1]] = src[p[-1]]
    return out


def ref_remove(event: dict, selectors: list) -> dict:
    import copy

    out = copy.deepcopy(event)
    for s in selectors:
        parts = s.split(".")
        cur = out
        ok = True
        for seg in parts[:-1]:
            if not isinstance(cur, dict) or seg not in cur:
                ok = False
                break
            cur = cur[seg]
        if ok and isinstance(cur, dict):
            cur.pop(parts[-1], None)
    return out


def _engine_rows(spark, rows, schema, action):
    ddl = ", ".join(
        f"{f} struct<{_inner(t)}>" if isinstance(t, dict) else f"{f} string"
        for f, t in schema.items()
    )
    df = spark.createDataFrame(
        [to_tuple_row(r, schema) for r in rows], ddl
    )
    out = Pipeline.from_dict({"actions": [action]}).apply(df)
    # row identity doesn't survive a shape-changing projection, so the
    # assertions compare sorted multisets of serialized rows
    j = out.select(
        F.to_json(
            F.struct(*[F.col(c) for c in out.columns]),
            {"ignoreNullFields": "false"},
        ).alias("j")
    )
    return [json.loads(r.j) for r in j.coalesce(1).collect()]


def test_projection_random_differential(spark):
    rng = random.Random(SEED)
    for trial in range(N_TRIALS):
        schema = gen_schema(rng)
        rows = [gen_row(rng, schema) for _ in range(6)]
        sels = gen_selectors(rng, schema)

        got = _engine_rows(
            spark, rows, schema, {"type": "keep_fields", "fields": sels}
        )
        # keep-nothing trials produce the engine's __empty__ row
        want = [ref_keep(r, schema, sels) for r in rows]
        if all(not w for w in want):
            assert all(set(g) <= {"__empty__"} for g in got), (trial, got)
        else:
            assert sorted(map(json.dumps, map(_sorted, got))) == sorted(
                map(json.dumps, map(_sorted, want))
            ), (trial, sels, got, want)

        got = _engine_rows(
            spark, rows, schema, {"type": "remove_fields", "fields": sels}
        )
        want = [ref_remove(r, sels) for r in rows]
        assert sorted(map(json.dumps, map(_sorted, got))) == sorted(
            map(json.dumps, map(_sorted, want))
        ), (trial, sels, got, want)


def _sorted(d):
    if isinstance(d, dict):
        return {k: _sorted(v) for k, v in sorted(d.items())}
    return d
