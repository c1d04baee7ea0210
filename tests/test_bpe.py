"""BPE train/apply (functions/bpe.py): hand-computed merge fixture,
tie-breaking, OOV fallback, and exhaustion behavior."""

from __future__ import annotations

from file_d_spark.functions import bpe


def test_hand_computed_merges(spark):
    # hist: low:3 lower:1 lowest:1
    # r1 pairs: (l,o):5 (o,w):5 (w,e):2 (e,r):1 (e,s):1 (s,t):1
    #   tie 5=5 breaks on a asc -> (l,o)
    # r2: (lo,w):5 wins; r3: (low,e):2 wins
    df = spark.createDataFrame(
        [(1, "low low low lower lowest")], "doc_id long, text string"
    )
    merges, seg = bpe.train_bpe(
        bpe.word_histogram(df, "text"), vocab_size=10, num_merges=3
    )
    assert merges == [("l", "o"), ("lo", "w"), ("low", "e")]
    segs = {r.w: r.seg.split(bpe.SEP) for r in seg.collect()}
    assert segs["low"] == ["low"]
    assert segs["lower"] == ["lowe", "r"]
    assert segs["lowest"] == ["lowe", "s", "t"]


def test_token_stats_with_oov_fallback(spark):
    # vocab_size=1 keeps only 'low'; 'zebra' is OOV -> char split (5)
    df = spark.createDataFrame(
        [(1, "low low zebra")], "doc_id long, text string"
    )
    row = bpe.bpe_token_stats(
        df, "doc_id", "text", vocab_size=1, num_merges=2
    ).first()
    # 'low' trains to ['lo','w'] then ['low'] -> 1 token each
    assert row.n_words == 3
    assert row.n_bpe_tokens == 1 + 1 + 5


def test_merge_exhaustion_stops_early(spark):
    # single 2-char word: one merge possible, further rounds are no-ops
    df = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    merges, seg = bpe.train_bpe(
        bpe.word_histogram(df, "text"), vocab_size=5, num_merges=10
    )
    assert merges == [("a", "b")]
    assert [r.seg for r in seg.collect()] == ["ab"]


def test_left_to_right_nonoverlapping_merge(spark):
    # 'aaaa' with merge (a,a): left-to-right gives [aa, aa] not [a,aa,a]
    df = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    merges, seg = bpe.train_bpe(
        bpe.word_histogram(df, "text"), vocab_size=5, num_merges=1
    )
    assert merges == [("a", "a")]
    assert seg.first().seg.split(bpe.SEP) == ["aa", "aa"]


def test_merge_respects_symbol_boundaries(spark):
    # ADVICE r8 regression: after merging (x,a), applying (a,b) to the
    # seg [xa, b] must NOT merge — 'xa␟b' contains the raw substring
    # 'a␟b' but 'a' is not a symbol there.  The boundary-decorated
    # replace leaves it untouched; word 'xab' with merges
    # [(x,a),(a,b)] segments as ['xa','b'], not ['xab'].
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("xab",)], "w string").select(
        "w", F.lit(1).alias("f"),
        F.array_join(F.split("w", ""), bpe.SEP).alias("seg"),
    )
    for a, b in [("x", "a"), ("a", "b")]:
        df = df.select("w", "f", bpe._apply_merge(F.col("seg"), a, b))
    assert df.first().seg.split(bpe.SEP) == ["xa", "b"]


def test_apply_merge_matches_greedy_bpe_and_oracle(spark, duck):
    """Exhaustive differential: _apply_merge (Spark) and the oracle's
    trim/replace rendering (DuckDB) both equal greedy left-to-right
    BPE merge application, over every symbol sequence of length <=4
    from a boundary-adversarial alphabet (single chars plus merged
    symbols that embed other symbols: 'xa', 'ab', 'aa'), PLUS every
    sequence of length 5-6 over the chain-adversarial sub-alphabet
    {a, b, aa} — the depth where aaaaaa-style overlapping-match chains
    would expose a non-greedy replace."""
    import itertools

    from pyspark.sql import functions as F

    S = bpe.SEP
    alphabet = ["a", "b", "x", "xa", "ab", "aa"]

    def greedy(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return S.join(out)

    cases = [
        (S.join(syms), a, b, greedy(list(syms), a, b))
        for n in range(1, 5)
        for syms in itertools.product(alphabet, repeat=n)
        for a, b in itertools.product(alphabet, repeat=2)
    ]
    chain_alphabet = ["a", "b", "aa"]
    cases += [
        (S.join(syms), a, b, greedy(list(syms), a, b))
        for n in range(5, 7)
        for syms in itertools.product(chain_alphabet, repeat=n)
        for a, b in itertools.product(chain_alphabet, repeat=2)
    ]
    df = spark.createDataFrame(
        cases, "seg string, a string, b string, want string"
    )
    # Spark side: one job over every (case, pair); merge pair values
    # vary per row, so rebuild the constant-pair expression per
    # distinct pair and union via a single when-chain.
    got = df
    for a, b in itertools.product(alphabet, repeat=2):
        got = got.withColumn(
            "res",
            F.when(
                (F.col("a") == a) & (F.col("b") == b),
                bpe._apply_merge(F.col("seg"), a, b),
            ).otherwise(F.col("res") if "res" in got.columns else F.lit(None)),
        )
    bad = got.filter(F.col("res") != F.col("want")).count()
    assert bad == 0
    # DuckDB side: the exact seg{r} expression shape from _bpe_oracle.
    duck.register("mc", df.toPandas())
    n_bad = duck.execute("""
        SELECT count(*) FROM mc
        WHERE trim(replace(replace(
                chr(31) || chr(31)
                  || replace(seg, chr(31), chr(31) || chr(31))
                  || chr(31) || chr(31),
                chr(31) || a || chr(31) || chr(31) || b || chr(31),
                chr(31) || a || b || chr(31)),
              chr(31) || chr(31), chr(31)), chr(31)) != want
    """).fetchone()[0]
    assert n_bad == 0


def test_case_and_punct_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Foo, foo! FOO?"), (2, "")], "doc_id long, text string"
    )
    hist = {r.w: r.f for r in bpe.word_histogram(df, "text").collect()}
    assert hist == {"foo": 3}
    out = bpe.bpe_token_stats(df, "doc_id", "text", vocab_size=5,
                              num_merges=2).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].n_words == 3
    assert 2 not in by_id  # wordless doc contributes no instances
