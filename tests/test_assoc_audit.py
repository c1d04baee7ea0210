"""corpus.assoc_audit — chi-square / Cramér's V association audit
(split-leakage QC): semantics teeth on engineered frames plus the
cross-engine bit-parity the fixed-point construction guarantees."""

import random

import pytest
from pyspark.sql import functions as F

from file_d_spark.functions import corpus


def test_assoc_perfect_association_is_one(spark):
    """b = f(a) bijectively -> V = 1 exactly, and chi2 = n*(k-1)
    (the classical maximum for a k x k diagonal table)."""
    rows = [(f"a{i % 4}", f"b{i % 4}") for i in range(120)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = corpus.assoc_audit(df, ["a", "b"]).collect()[0]
    assert r.cramers_v == 1.0
    assert r.chi2 == 360.0  # 120 * (4 - 1)
    assert r.k_a == r.k_b == 4 and r.n == 120


def test_assoc_exact_independence_is_zero(spark):
    """A perfectly balanced product design (i%4 x i%3 over lcm
    multiples) has chi2 = 0 — the zero-cell identity must not
    manufacture association out of missing histogram cells."""
    rows = [(f"a{i % 4}", f"c{i % 3}") for i in range(120)]
    df = spark.createDataFrame(rows, "a string, c string")
    r = corpus.assoc_audit(df, ["a", "c"]).collect()[0]
    assert r.cramers_v == 0.0 and r.chi2 == 0.0


def test_assoc_engineered_split_leakage_detected(spark):
    """The audit's purpose: a 'split' that secretly follows language
    must score far above the hash-split noise floor."""
    rng = random.Random(11)
    rows = []
    for i in range(2000):
        lang = rng.choice(["en", "de", "zh", "fr"])
        # leaky split: zh is almost always 'test'
        if lang == "zh":
            split = "test" if rng.random() < 0.9 else "train"
        else:
            split = "train" if rng.random() < 0.8 else "test"
        rows.append((lang, split))
    df = spark.createDataFrame(rows, "lang string, split string")
    leaky = corpus.assoc_audit(df, ["lang", "split"]).collect()[0]
    clean = corpus.assoc_audit(
        spark.createDataFrame(
            [(rng.choice(["en", "de", "zh", "fr"]),
              "train" if rng.random() < 0.8 else "test")
             for _ in range(2000)],
            "lang string, split string",
        ),
        ["lang", "split"],
    ).collect()[0]
    assert leaky.cramers_v > 0.4
    assert clean.cramers_v < 0.1
    assert leaky.cramers_v > 5 * clean.cramers_v


def test_assoc_null_categories_and_pair_fanout(spark):
    """NULLs fold into the empty-string category; len(cols) choose 2
    output rows, tagged by source column names."""
    rows = [("x", None, "p"), ("x", "u", None), (None, "u", "p"),
            ("y", "v", "q")] * 10
    df = spark.createDataFrame(rows, "a string, b string, c string")
    out = {(r.col_a, r.col_b): r
           for r in corpus.assoc_audit(df, ["a", "b", "c"]).collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert out[("a", "b")].k_a == 3  # x, y, and the null bucket
    assert all(r.n == 40 for r in out.values())


def test_assoc_requires_two_columns(spark):
    df = spark.createDataFrame([("x",)], "a string")
    with pytest.raises(ValueError, match="at least two columns"):
        corpus.assoc_audit(df, ["a"])


def test_assoc_matches_duckdb_on_random_frame(spark, duck):
    """Engine parity on a seeded random frame driven through the SAME
    fixed-point algebra in DuckDB — the construction's whole claim is
    that floor(2^20 * term) of bit-identical doubles cannot drift."""
    rng = random.Random(99)
    rows = [
        (i, rng.choice(["en", "de", "zh"]),
         rng.choice(["webA", "webB", "books", "code"]))
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "rid long, lang string, src string")
    got = corpus.assoc_audit(df, ["lang", "src"])
    duck.execute("DROP TABLE IF EXISTS assoc_t")
    duck.execute(
        "CREATE TABLE assoc_t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{l}', '{s}')" for i, l, s in rows)
        + ") AS t(rid, lang, src)"
    )
    want = duck.execute(
        """
        WITH hist AS (SELECT lang AS va, src AS vb, count(*)::DOUBLE AS n_ab
                      FROM assoc_t GROUP BY 1, 2),
        m AS (SELECT va, vb, n_ab,
                     sum(n_ab) OVER (PARTITION BY va) AS na,
                     sum(n_ab) OVER (PARTITION BY vb) AS nb,
                     sum(n_ab) OVER () AS n
              FROM hist),
        s AS (SELECT n, CAST(floor((n_ab * n_ab) / (na * nb / n)
                                   * 1048576.0) AS BIGINT) AS term_fp,
                     va, vb FROM m)
        SELECT 'lang' AS col_a, 'src' AS col_b,
               CAST(first(n) AS BIGINT) AS n,
               CAST(count(DISTINCT va) AS BIGINT) AS k_a,
               CAST(count(DISTINCT vb) AS BIGINT) AS k_b,
               CAST(sum(term_fp) AS BIGINT) AS chi2_fp,
               round(greatest(sum(term_fp)::DOUBLE / 1048576.0
                              - first(n), 0.0), 6) AS chi2,
               round(sqrt(greatest(sum(term_fp)::DOUBLE / 1048576.0
                                   - first(n), 0.0)
                          / (first(n) * 2.0)), 6) AS cramers_v
        FROM s
        """
    ).df()
    from tests.util import assert_frames_match

    assert_frames_match(got, want)


def test_assoc_rejects_duplicate_and_delimiter_columns(spark):
    """Review r13: a repeated column would produce a spurious V = 1
    self-pair, and a '|' in a name would corrupt the pair tags —
    both refuse loudly instead."""
    df = spark.createDataFrame([("x", "y")], "a string, `b|c` string")
    with pytest.raises(ValueError, match="must be distinct"):
        corpus.assoc_audit(df, ["a", "a"])
    with pytest.raises(ValueError, match="cannot contain"):
        corpus.assoc_audit(df, ["a", "b|c"])
