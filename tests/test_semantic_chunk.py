"""semantic_dedup (SemDeDup-style) and chunk_tokens unit tests."""

import math

import pytest
from pyspark.sql import functions as F

from file_d_spark.functions import corpus, similarity


def _vec(*xs):
    n = math.sqrt(sum(x * x for x in xs)) or 1.0
    return [float(x) / n for x in xs]


def test_semantic_dedup_drops_later_near_dups(spark):
    # ids 0 and 1 are the centroids (lowest ids).  Cluster A sits on
    # the x-axis, cluster B on the y-axis; 2 and 3 are near-dups of 0,
    # 4 is a near-dup of 1, 5 is alone in B's orbit but far from 4.
    rows = [
        (0, _vec(1.0, 0.0, 0.0)),
        (1, _vec(0.0, 1.0, 0.0)),
        (2, _vec(0.99, 0.05, 0.0)),
        (3, _vec(0.98, 0.0, 0.08)),
        (4, _vec(0.05, 0.99, 0.0)),
        (5, _vec(0.0, 0.7, 0.7)),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in similarity.semantic_dedup(
            df, threshold=0.95, n_clusters=2
        ).collect()
    }
    # 2, 3 dropped (earlier near-dup 0 in cluster 0); 4 dropped (near 1)
    assert set(got) == {0, 1, 5}
    assert got[0] == 0 and got[1] == 1 and got[5] == 1


def test_semantic_dedup_chain_semantics(spark):
    # a~b and b~c but a!~c: b drops (earlier near-dup a), and c drops
    # too because its earlier neighbor b is near — the drop rule is
    # "ANY earlier near-dup", not "earlier SURVIVING near-dup"
    a = _vec(1.0, 0.0)
    b = _vec(0.97, 0.24)  # cos(a,b) ~ 0.97
    c = _vec(0.88, 0.47)  # cos(b,c) ~ 0.97, cos(a,c) ~ 0.88
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], "vec_id long, embedding array<double>"
    )
    got = sorted(
        r["vec_id"]
        for r in similarity.semantic_dedup(df, threshold=0.95, n_clusters=1).collect()
    )
    assert got == [0]


def test_semantic_dedup_no_drops_below_threshold(spark):
    df = spark.createDataFrame(
        [(0, _vec(1, 0)), (1, _vec(0, 1))], "vec_id long, embedding array<double>"
    )
    assert similarity.semantic_dedup(df, threshold=0.5, n_clusters=2).count() == 2


def test_chunk_tokens_windows(spark):
    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {
        r["chunk_id"]: (r["n_tokens"], r["chunk_text"])
        for r in corpus.chunk_tokens(df, "doc_id", "text", size=4, stride=3).collect()
    }
    # starts 1,4,7,10 -> lens 4,4,4,1
    assert {k: v[0] for k, v in got.items()} == {0: 4, 1: 4, 2: 4, 3: 1}
    assert got[0][1] == "t0 t1 t2 t3"
    assert got[3][1] == "t9"


def test_chunk_tokens_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "")], "doc_id long, text string")
    out = corpus.chunk_tokens(df, "doc_id", "text", size=64, stride=48)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 2
    assert rows[1]["n_tokens"] == 2 and rows[1]["chunk_text"] == "a b"
    # empty text tokenizes to [''] — one chunk, mirrored by the oracle
    assert rows[2]["n_tokens"] == 1 and rows[2]["chunk_text"] == ""


def test_chunk_tokens_nonoverlap_reconstructs(spark):
    # stride == size -> exact partition of the token stream
    text = " ".join(f"w{i}" for i in range(101))
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    parts = (
        corpus.chunk_tokens(df, "doc_id", "text", size=25, stride=25)
        .orderBy("chunk_id")
        .collect()
    )
    assert " ".join(p["chunk_text"] for p in parts) == text
    assert sum(p["n_tokens"] for p in parts) == 101


def test_chunk_tokens_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        corpus.chunk_tokens(df, "doc_id", "text", size=0)
    with pytest.raises(ValueError):
        corpus.chunk_tokens(df, "doc_id", "text", stride=-1)


def test_pack_offsets_single_shard(spark):
    # one shard -> global concat order by id; budget 10
    rows = [(1, 4), (2, 4), (3, 4), (4, 9), (5, 1)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["start_offset"], r["pack_id"])
        for r in corpus.pack_offsets(
            df, "doc_id", "n_tokens", budget=10, shards=1
        ).collect()
    }
    # offsets 0,4,8,12,21 -> packs 0,0,0,1,2; doc 3 starts in pack 0
    # and crosses into pack 1 (concat-then-chunk crosses doc bounds)
    assert got == {1: (0, 0), 2: (4, 0), 3: (8, 0), 4: (12, 1), 5: (21, 2)}


def test_pack_offsets_sharded_is_partitioned_prefix_sum(spark):
    rows = [(i, 10) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = corpus.pack_offsets(df, "doc_id", "n_tokens", budget=25, shards=4).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= set(range(4)) and len(by_shard) > 1
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in rs:
            assert r["start_offset"] == off
            assert r["pack_id"] == off // 25
            off += 10


def test_pack_offsets_validation(spark):
    df = spark.createDataFrame([(1, 2)], "doc_id long, n_tokens long")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        corpus.pack_offsets(df, "doc_id", "n_tokens", budget=0)
    with _pytest.raises(ValueError):
        corpus.pack_offsets(df, "doc_id", "n_tokens", budget=10, shards=0)
