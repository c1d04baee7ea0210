"""Recall of the approximate near-dup / ANN paths against their exact
counterparts — the correctness story for the hash-dependent operators
that have no SQL oracle."""

import pytest


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from file_d_spark.tables import load_table

    return load_table(spark, sf_dir, "documents")


def test_minhash_recall_vs_exact(spark, docs):
    from file_d_spark.functions import dedup

    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.7).collect()
    }
    approx = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", n=3, num_hashes=64, bands=16, threshold=0.7
        ).collect()
    }
    assert exact, "fixture should contain near-dup pairs"
    # verification step guarantees precision == 1.0
    assert approx <= exact
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, f"minhash recall {recall}"


def test_simhash_finds_near_dups(spark, docs):
    """simhash is token-frequency weighted, so its exact counterpart is
    full-text near-duplication (the seeded trigram-jaccard pairs), NOT
    word-set jaccard — a tiny vocabulary makes word SETS near-identical
    across unrelated docs while frequencies still differ."""
    from file_d_spark.functions import dedup

    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.7).collect()
    }
    sim = {
        (r.doc_a, r.doc_b)
        for r in dedup.simhash_pairs(docs, "doc_id", "text", max_hamming=8, chunks=9).collect()
    }
    assert exact
    hit = len(sim & exact) / len(exact)
    assert hit >= 0.8, f"simhash hit-rate {hit}"


def test_ann_lsh_recall_vs_brute(spark, sf_dir):
    from file_d_spark.functions import similarity
    from file_d_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter("vec_id < 5")
    brute = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(e, q, k=10).collect()
    }
    lsh = {
        (r.query_id, r.neighbor_id)
        for r in similarity.lsh_topk(e, q, dim=64, k=10, planes=16, bands=8).collect()
    }
    recall = len(brute & lsh) / len(brute)
    # uniform-random gaussian embeddings are the LSH worst case (no
    # cluster structure, top-10 barely above random): 2-bit bands trade
    # candidate pruning for recall
    assert recall >= 0.75, f"ann-lsh recall {recall}"


def test_ann_lsh_no_duplicate_neighbors(spark, sf_dir):
    """lsh_topk dedups multi-band collisions via collect_set of
    (-sim, neighbor_id) structs — correct ONLY while the score
    expression is order-deterministic (bit-identical doubles for
    re-scores of the same pair).  If scoring ever drifts to a
    non-deterministic form, duplicates silently enter the top-k; this
    guard makes that drift fail loudly instead of corrupting ranks."""
    from file_d_spark.functions import similarity
    from file_d_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter("vec_id < 8")
    rows = similarity.lsh_topk(e, q, dim=64, k=10, planes=16, bands=8).collect()
    pairs = [(r.query_id, r.neighbor_id) for r in rows]
    assert len(pairs) == len(set(pairs)), "duplicate neighbor in top-k"
    # ranks are dense 1..n per query
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for qid, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), qid


def test_ann_ivf_recall_vs_brute(spark, sf_dir):
    from file_d_spark.functions import similarity
    from file_d_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter("vec_id < 5")
    brute = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(e, q, k=10).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk(e, q, k=10, n_lists=16, n_probe=6).collect()
    }
    recall = len(brute & ivf) / len(brute)
    # structureless gaussian embeddings are the IVF worst case: recall
    # tracks probed coverage (6/16 = 37.5%).  The meaningful invariant
    # is that probing the query's NEAREST lists beats random coverage
    # (true neighbors correlate with the query's closest centroids).
    assert recall >= 0.42, f"ann-ivf recall {recall} not above coverage"


def test_verify_pairs_shuffle_fallback_matches_broadcast(spark, docs):
    """Above the broadcast threshold _verify_pairs must switch to
    shuffle joins and return identical pairs (guard for the
    near-everything-duplicate corpus case)."""
    from pyspark.sql import functions as F

    from file_d_spark.functions import dedup

    sh = (
        docs.limit(60)
        .select(
            F.col("doc_id").alias("doc"),
            dedup.word_shingles(F.col("text"), 3).alias("shingles"),
        )
        .withColumn("set_size", F.size("shingles"))
        .cache()
    )
    ids = sh.select("doc")
    cands = (
        ids.alias("a")
        .crossJoin(ids.alias("b"))
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
    )
    broadcast = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup._verify_pairs(sh, cands, 0.5, broadcast_max=10**9).collect()
    }
    shuffle = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup._verify_pairs(sh, cands, 0.5, broadcast_max=0).collect()
    }
    assert broadcast == shuffle
    assert broadcast  # fixture corpus has near-dups; non-empty check


def test_simhash_swar_matches_naive_votes(spark, docs):
    """The SWAR lane-counted signature must equal the naive per-bit
    aggregate formulation bit-for-bit (same hash family, same votes)."""
    from pyspark.sql import functions as F

    from file_d_spark.functions import dedup
    from file_d_spark.functions.text import tokens

    def naive_bit_vote(i):
        return F.aggregate(
            F.col("__hashes__"),
            F.lit(0),
            lambda acc, h: acc
            + (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1).cast("int"),
        )

    sample = docs.limit(50)
    naive = sample.select(
        F.col("doc_id").alias("doc"),
        F.transform(tokens(F.col("text")), lambda t: F.xxhash64(t)).alias(
            "__hashes__"
        ),
    ).select(
        "doc",
        sum(
            [
                F.when(naive_bit_vote(i) > 0, F.lit(1 << i)).otherwise(F.lit(0))
                for i in range(dedup.SIMHASH_BITS)
            ],
            F.lit(0),
        ).cast("long").alias("simhash"),
    )
    fast = dedup.simhash(sample, "doc_id", "text")
    want = {(r.doc, r.simhash) for r in naive.collect()}
    got = {(r.doc, r.simhash) for r in fast.collect()}
    assert got == want


def test_ann_ivf_pq_agrees_with_ivf_within_refine(spark, sf_dir):
    """IVFADC (codes + LUT scoring + rerank) with a refine window
    covering the whole probed set must return EXACTLY what exact-
    scoring IVF returns for the same lists — PQ only reorders the
    candidate pruning, and a full-width refine undoes it."""
    from file_d_spark.functions import similarity
    from file_d_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter("vec_id < 5")
    exact_ivf = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in similarity.ivf_topk(
            e, q, k=10, n_lists=16, n_probe=4
        ).collect()
    }
    n = e.count()
    full_refine = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in similarity.ivf_pq_topk(
            e, q, k=10, n_lists=16, n_probe=4, refine=n
        ).collect()
    }
    assert full_refine == exact_ivf


def test_ann_ivf_pq_refine_recall(spark, sf_dir):
    """With the production-shaped refine=32 window, the ADC pruning
    must keep most of what exact in-list scoring would rank top-10
    (PQ distances approximate; the rerank repairs ordering within the
    window, so losses come only from candidates ADC pushed out)."""
    from file_d_spark.functions import similarity
    from file_d_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter("vec_id < 5")
    exact_ivf = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk(
            e, q, k=10, n_lists=16, n_probe=4
        ).collect()
    }
    adc = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_pq_topk(
            e, q, k=10, n_lists=16, n_probe=4, refine=32
        ).collect()
    }
    recall = len(exact_ivf & adc) / len(exact_ivf)
    assert recall >= 0.6, f"ADC refine recall {recall}"


def test_ann_ivf_pq_validation(spark, sf_dir):
    import pytest

    from file_d_spark.functions import similarity
    from file_d_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError):
        similarity.ivf_pq_topk(e, e.limit(1), m=7, dim=64)


def test_ann_ivf_pq_prebuilt_index_reuse(spark, sf_dir):
    """ivf_pq_index builds the compact index once; searches over the
    prebuilt pair return exactly what a fresh build returns."""
    from file_d_spark.functions import similarity
    from file_d_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter("vec_id < 5")
    pre = similarity.ivf_pq_index(e)
    index, model = pre
    assert set(index.columns) == {"neighbor_id", "list_id", "codes"}
    a = {
        tuple(r)
        for r in similarity.ivf_pq_topk(e, q, prebuilt=pre).collect()
    }
    b = {tuple(r) for r in similarity.ivf_pq_topk(e, q).collect()}
    assert a == b and len(a) > 0


def test_ann_ivf_pq_join_carries_codes_not_vectors(spark, sf_dir):
    """The memory story at 100 TB: past the index build, the ADC
    search join's corpus side must carry ONLY (list_id, codes) — if a
    raw vector column leaks into the probe join, the compact-index
    contract is broken."""
    from file_d_spark.functions import similarity
    from file_d_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    index, model = similarity.ivf_pq_index(e)
    assert set(index.columns) == {"neighbor_id", "list_id", "codes"}
    schema = dict((f.name, f.dataType.simpleString()) for f in index.schema)
    assert schema["codes"] == "array<int>"
    assert not any("float" in t or "double" in t for t in schema.values()), (
        f"index carries vector data: {schema}"
    )


def test_fuzzy_decontaminate_vs_exact_pairs(spark, docs):
    """Precision 1.0 (exact-verify step) and bounded recall against the
    brute-force cross-split Jaccard pairs, plus a complete spine: one
    row per train doc whether or not it matched."""
    from pyspark.sql import functions as F

    from file_d_spark.functions import dedup

    eval_set = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    out = dedup.fuzzy_decontaminate(
        train, eval_set, "doc_id", "text", n=3, num_hashes=64, bands=16,
        threshold=0.7,
    ).collect()
    assert len(out) == train.count()  # complete spine
    flagged = {r.doc_id for r in out if r.contaminated}

    exact = dedup.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.7)
    cross = {
        r.doc_a if r.doc_a % 50 != 0 else r.doc_b
        for r in exact.collect()
        if (r.doc_a % 50 == 0) != (r.doc_b % 50 == 0)
    }
    assert cross, "fixture should contain cross-split near-dup pairs"
    assert flagged <= cross  # exact verification => no false positives
    assert len(flagged & cross) / len(cross) >= 0.9
    for r in out:
        if not r.contaminated:
            assert r.n_matches == 0 and r.max_jaccard == 0.0


def test_fuzzy_decontaminate_hand_fixture(spark):
    """A lightly-edited eval doc is caught; an unrelated doc and a
    too-short (sub-shingle) doc pass with zero matches."""
    from file_d_spark.functions import dedup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    train = spark.createDataFrame(
        [
            (1, base + " ok"),          # near-dup of the eval doc
            (2, "completely different content about spark physical plans"),
            (3, "too short"),           # < 3 tokens of shingle => no signature
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, base)], "doc_id long, text string")
    rows = {
        r.doc_id: r
        for r in dedup.fuzzy_decontaminate(
            train, ev, "doc_id", "text", n=3, threshold=0.7
        ).collect()
    }
    assert rows[1].contaminated and rows[1].n_matches == 1
    assert rows[1].max_jaccard >= 0.7
    assert not rows[2].contaminated
    assert not rows[3].contaminated and rows[3].max_jaccard == 0.0


def test_fuzzy_incremental_dedup_vs_exact(spark, docs):
    """kept == no exact cross-pair >= threshold (precision from the
    verify stage, recall from the banding) on the %50 split."""
    from pyspark.sql import functions as F

    from file_d_spark.functions import dedup

    seen = docs.filter(F.col("doc_id") % 50 == 0)
    new = docs.filter(F.col("doc_id") % 50 != 0)
    out = {r.doc_id: r for r in dedup.fuzzy_incremental_dedup(
        new, seen, "doc_id", "text", n=3, threshold=0.7
    ).collect()}
    assert len(out) == new.count()

    exact = dedup.jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.7)
    dup_new = {
        r.doc_a if r.doc_a % 50 != 0 else r.doc_b
        for r in exact.collect()
        if (r.doc_a % 50 == 0) != (r.doc_b % 50 == 0)
    }
    assert dup_new  # fixture has cross-split near-dups
    assert {i for i, r in out.items() if not r.kept} == dup_new
    assert all(r.n_near_dups == 0 for i, r in out.items() if r.kept)


def test_fuzzy_decontaminate_eval_side_broadcasts(spark, sf_dir):
    """The scale claim: the corpus never meets a shuffled join — the
    band join, candidate fetches and verify joins all broadcast the
    eval-bounded side.  Every hashpartitioning Exchange in the plan
    must sit above the (candidate-bounded) pair aggregation, never on
    a corpus-sized shingle/banding frame."""
    from pyspark.sql import functions as F

    from file_d_spark.functions import dedup
    from file_d_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    out = dedup.fuzzy_decontaminate(
        d.filter(F.col("doc_id") % 50 != 0),
        d.filter(F.col("doc_id") % 50 == 0),
        "doc_id", "text", n=3,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the (band, bucket) candidate join must be broadcast
    assert "BroadcastHashJoin [band" in plan
    # no sort-merge join anywhere (a shuffled corpus-side join would
    # surface as one under AQE with these sizes)
    assert "SortMergeJoin" not in plan
    # every hash exchange keys on pair/doc aggregation columns, not on
    # the banding keys
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        keys = m.group(1)
        assert "band" not in keys and "bucket" not in keys, (
            f"banded corpus frame was shuffled: {keys}"
        )
