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
