"""hard_negatives: the near-duplicate exclusion band must BITE — the
result differs from plain brute-force top-k exactly by the banded
neighbors — and below the band the two rankings agree."""

from pyspark.sql import functions as F

from file_d_spark.functions.similarity import brute_force_topk, hard_negatives


def _sf():
    from conftest import SF_DIR

    return SF_DIR


def test_band_excluded_and_ranking_continues(spark):
    e = spark.read.parquet(f"{_sf()}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    brute = brute_force_topk(e, q, k=10).collect()
    hard = hard_negatives(e, q, k=10, dup_sim=0.3).collect()

    top_brute = {(r.query_id, r.rank): (r.neighbor_id, r.sim) for r in brute}
    top_hard = {(r.query_id, r.rank): (r.neighbor_id, r.sim) for r in hard}
    assert set(r.query_id for r in hard) == set(range(5))
    # every mined negative is strictly below the band
    assert all(r.sim < 0.3 for r in hard)
    # the band bites: at this fixture every query's top sims exceed 0.3
    banded = {r.query_id for r in brute if r.sim >= 0.3}
    assert banded == set(range(5)), "fixture no longer exercises the band"
    assert top_hard != top_brute
    # below the band the ranking is the brute ranking with banded rows
    # removed: same (neighbor, sim) sequence, ranks compacted
    for qid in range(5):
        b_seq = [
            (r.neighbor_id, r.sim)
            for r in sorted(brute, key=lambda r: (r.query_id, r.rank))
            if r.query_id == qid and r.sim < 0.3
        ]
        h_seq = [
            (r.neighbor_id, r.sim)
            for r in sorted(hard, key=lambda r: (r.query_id, r.rank))
            if r.query_id == qid
        ]
        assert h_seq[: len(b_seq)] == b_seq


def test_mmr_diversifies_beyond_plain_topk(spark):
    """MMR teeth: pick 1 is the plain top-1 (no penalty yet), but the
    full MMR selection must DIFFER from the plain top-k set for at
    least one query — otherwise the diversity term did nothing at this
    fixture and the staged pair degenerates into brute_force_topk."""
    from file_d_spark.functions.similarity import (
        brute_force_topk,
        mmr_diversify,
    )

    e = spark.read.parquet(f"{_sf()}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    mmr = mmr_diversify(e, q, k=5, pool=20).collect()
    brute = brute_force_topk(e, q, k=5).collect()
    # pick 1's true invariant: argmax over ROUNDED sims (MMR scores in
    # 1e-6 fixed point), min id among rounded ties — not brute's
    # raw-double rank 1, which can diverge on a past-6dp tie
    top1 = {}
    for r in brute:
        best = top1.get(r.query_id)
        if best is None or (-r.sim, r.neighbor_id) < (-best[0], best[1]):
            top1[r.query_id] = (r.sim, r.neighbor_id)
    mmr1 = {r.query_id: r.sel_id for r in mmr if r.pick == 1}
    assert mmr1 == {q_: t[1] for q_, t in top1.items()}, (
        "pick 1 must be the undiversified (rounded-sim) argmax"
    )
    b_sets = {}
    m_sets = {}
    for r in brute:
        b_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in mmr:
        m_sets.setdefault(r.query_id, set()).add(r.sel_id)
    assert any(m_sets[qid] != b_sets[qid] for qid in m_sets), (
        "diversity never changed the selection; fixture degenerate"
    )


def test_mmr_rejects_bad_k(spark):
    """k < 1 must raise, not silently emit pick 1 anyway."""
    import pytest

    from file_d_spark.functions.similarity import mmr_diversify

    e = spark.read.parquet(f"{_sf()}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 2)
    with pytest.raises(ValueError, match="k >= 1"):
        mmr_diversify(e, q, k=0)
