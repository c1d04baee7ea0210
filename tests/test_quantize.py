"""Embedding quantization operators (functions/similarity.py):
scalar quantization and product quantization — code ranges,
reconstruction-error bounds, determinism, and validation."""

import pytest
from pyspark.sql import functions as F

from file_d_spark.functions import similarity
from file_d_spark.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_scalar_quantize_error_bound(spark, emb):
    """Uniform quantization error per component is at most half a step,
    so mse <= max_dim_range^2 / (4 * (levels-1)^2)."""
    rows = similarity.scalar_quantize(emb, levels=256).collect()
    stats = (
        emb.select(F.posexplode("embedding").alias("d", "v"))
        .groupBy("d")
        .agg((F.max("v") - F.min("v")).alias("range"))
        .agg(F.max("range"))
        .collect()[0][0]
    )
    bound = (float(stats) / 255.0) ** 2 / 4.0 + 1e-12
    assert rows, "no vectors quantized"
    assert all(r.quant_mse <= bound for r in rows)
    n_dims = len(emb.select("embedding").first()[0])
    assert all(0 <= r.code_sum <= 255 * n_dims for r in rows)


def test_scalar_quantize_more_levels_less_error(spark, emb):
    coarse = {
        r.vec_id: r.quant_mse
        for r in similarity.scalar_quantize(emb, levels=4).collect()
    }
    fine = {
        r.vec_id: r.quant_mse
        for r in similarity.scalar_quantize(emb, levels=256).collect()
    }
    tot_c = sum(coarse.values())
    tot_f = sum(fine.values())
    assert tot_f < tot_c, f"256 levels not better than 4: {tot_f} vs {tot_c}"


def test_product_quantize_codes_and_determinism(spark, emb):
    a = {r.vec_id: (r.pq_code, r.quant_mse)
         for r in similarity.product_quantize(emb, m=8, k=16).collect()}
    b = {r.vec_id: (r.pq_code, r.quant_mse)
         for r in similarity.product_quantize(emb, m=8, k=16).collect()}
    assert a == b  # deterministic codebook => identical codes
    assert all(0 <= code < 16 ** 8 for code, _ in a.values())
    assert all(mse >= 0 for _, mse in a.values())


def test_product_quantize_seed_vectors_zero_error(spark, emb):
    """The codebook vectors quantize to themselves: every subspace has
    an exact centroid match, so their reconstruction error is 0."""
    seed_ids = [
        r.vec_id
        for r in emb.select("vec_id")
        .orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(16)
        .collect()
    ]
    got = {
        r.vec_id: r.quant_mse
        for r in similarity.product_quantize(emb, m=8, k=16).collect()
    }
    for vid in seed_ids:
        assert got[vid] == 0.0, f"seed vector {vid} has nonzero error"


def test_product_quantize_more_codes_less_error(spark, emb):
    k2 = sum(
        r.quant_mse for r in similarity.product_quantize(emb, m=8, k=2).collect()
    )
    k16 = sum(
        r.quant_mse for r in similarity.product_quantize(emb, m=8, k=16).collect()
    )
    assert k16 < k2


def test_product_quantize_validates_m(emb):
    with pytest.raises(ValueError, match="m must divide dim"):
        similarity.product_quantize(emb, dim=64, m=7)


def test_product_quantize_broadcast_model_equivalence(spark, emb):
    """Above model_max_literal_floats the codebook ships as a broadcast
    one-row frame instead of SQL literals; results must be IDENTICAL,
    and the big-model plan must actually use the broadcast (no
    multi-MB literal expression tree in the task binary)."""
    lit = {
        (r.vec_id, r.pq_code, r.quant_mse)
        for r in similarity.product_quantize(
            emb, m=8, k=16, model_max_literal_floats=10**9
        ).collect()
    }
    bc_df = similarity.product_quantize(
        emb, m=8, k=16, model_max_literal_floats=0
    )
    plan = bc_df._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan, "big-model path did not broadcast the codebook"
    bc = {(r.vec_id, r.pq_code, r.quant_mse) for r in bc_df.collect()}
    assert lit == bc


def test_product_quantize_boundary_picks_literal(spark, emb):
    """At exactly the threshold (m*k*sub == limit) the literal path is
    used — no join in the plan."""
    total = 8 * 16 * 8  # m * k * sub for dim=64
    df = similarity.product_quantize(
        emb, m=8, k=16, model_max_literal_floats=total
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Broadcast" not in plan


def test_ivf_assign_matches_topk_assignment(spark, emb):
    """ivf_assign (the exposed build half) must reproduce ivf_topk's
    internal assignment: every list id in [0, n_lists), deterministic
    across calls, and the keep-columns passthrough of scalar_quantize
    preserves it unchanged."""
    a1 = {r.vec_id: r.list_id for r in similarity.ivf_assign(emb, 16).collect()}
    a2 = {r.vec_id: r.list_id for r in similarity.ivf_assign(emb, 16).collect()}
    assert a1 == a2 and a1
    assert all(0 <= v < 16 for v in a1.values())
    sq = similarity.scalar_quantize(
        similarity.ivf_assign(emb, 16), keep=["list_id"]
    )
    got = {r.vec_id: r.list_id for r in sq.collect()}
    assert got == a1


# --------------------------------------------------------------------------
# kmeans_embeddings (fixed-point Lloyd's)
# --------------------------------------------------------------------------


def test_kmeans_deterministic_across_runs(spark, sf_dir):
    from file_d_spark.functions import similarity
    from file_d_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, similarity.kmeans_embeddings(e, k=4, iters=2).collect()))
    b = sorted(map(tuple, similarity.kmeans_embeddings(e, k=4, iters=2).collect()))
    assert a == b
    assert sum(r[1] for r in a) == e.count()  # every vector assigned


def test_kmeans_iterations_do_not_increase_distortion(spark, sf_dir):
    """Lloyd's monotonicity (up to the integer-rounding of centroids):
    more update steps must not make the clustering meaningfully worse."""
    from file_d_spark.functions import similarity
    from file_d_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")

    def distortion(iters):
        rows = similarity.kmeans_embeddings(e, k=8, iters=iters).collect()
        n = sum(r.n_vectors for r in rows)
        return sum(r.avg_sq_dist * r.n_vectors for r in rows) / n

    d1, d2 = distortion(1), distortion(2)
    assert d2 <= d1 * 1.001, (d1, d2)


def test_kmeans_empty_cluster_keeps_seed_centroid(spark):
    """Two distinct points, k=3: one centroid never wins a vector and
    must keep its seed position instead of crashing or going NaN."""
    from file_d_spark.functions import similarity

    rows = [(i, [0.0] * 4) for i in range(5)] + [
        (10 + i, [1.0] * 4) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.kmeans_embeddings(df, k=3, iters=2).collect()
    assert sum(r.n_vectors for r in out) == 10
    assert all(r.avg_sq_dist == 0.0 for r in out)  # points sit on centroids


def test_kmeans_empty_corpus_raises(spark):
    import pytest

    from file_d_spark.functions import similarity

    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        similarity.kmeans_embeddings(df, k=2, iters=1)


def test_kmeans_fast_path_matches_distributed(spark, sf_dir):
    """The r13 bounded-corpus fast path (driver-side exact-integer
    Lloyd's) must be bit-identical to the distributed loop — same
    md5-ordered seed, same integer sums, same truncating division,
    same first-min tie-break, same keep-previous-centroid rule."""
    from file_d_spark.functions import similarity
    from file_d_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    old = similarity.KMEANS_FAST_MAX_ROWS
    try:
        similarity.KMEANS_FAST_MAX_ROWS = 1_000_000
        fast = sorted(
            map(tuple, similarity.kmeans_embeddings(e, k=8, iters=2).collect())
        )
        similarity.KMEANS_FAST_MAX_ROWS = 0  # force the distributed loop
        slow = sorted(
            map(tuple, similarity.kmeans_embeddings(e, k=8, iters=2).collect())
        )
    finally:
        similarity.KMEANS_FAST_MAX_ROWS = old
    assert fast == slow


def test_product_quantize_midrange_routes_to_broadcast(spark, emb):
    """The fused-codegen cliff guard (r12 review): a shape whose
    staged column count stays UNDER the whole-stage fusion cutoff but
    whose chain volume exceeds the verified-compiling bound (m*k*sub
    > 512) must route to the broadcast-HOF path rather than silently
    re-entering the 64 KB Janino failure — m=4, k=24, sub=16 stages
    97 columns (<= 100) with 1536 terms."""
    df = similarity.product_quantize(
        emb, dim=64, m=4, k=24, model_max_literal_floats=10**9
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan, "mid-range shape did not take the HOF path"


def test_embedding_stats_flags_dead_and_constant_dims(spark):
    """Teeth for the r12 embedding_stats audit: a dimension that is
    constant across the corpus must read std == 0 (dead dim), a
    varying one must not; n/min/max/n_neg are exact."""
    df = spark.createDataFrame(
        [(i, [0.5, -0.25, i / 8.0]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    out = {r.dim: r for r in similarity.embedding_stats(df).collect()}
    assert set(out) == {1, 2, 3} and all(out[d].n == 8 for d in out)
    assert out[1].std == 0.0 and out[2].std == 0.0   # dead dims
    assert out[3].std > 0.0                          # live dim
    assert out[2].n_neg == 8 and out[1].n_neg == 0
    # exact fixed point: 0.5 * 2^20 = 524288 exactly
    assert out[1].min_fp == out[1].max_fp == 524288
    assert out[2].min_fp == out[2].max_fp == -262144


def test_embedding_stats_broken_encoder_inputs(spark, duck):
    """The audit's whole purpose is broken encoders, so NaN/Inf/huge
    cells must be HANDLED, not engine-divergent (a naive double→long
    cast turns NaN into 0 on Spark and raises on DuckDB): non-finite
    cells — NULL array elements included (the raw finite predicate
    yields NULL for them, which would dilute the mean/std denominator
    by counting them in n but in neither bucket) — count in
    n_nonfinite and leave the moments; huge finite cells clamp to ±8
    and count in n_clamped — and Spark and DuckDB agree on every
    column over exactly this data."""
    rows = [
        (0, [float("nan"), 1.0e4, 0.5]),
        (1, [float("inf"), -2.0e4, 0.5]),
        (2, [float("-inf"), 2.0, 0.5]),
        (3, [0.25, -2.0, 0.5]),
        (4, [None, -1.0e9, None]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.dim: r for r in similarity.embedding_stats(df).collect()}
    assert out[1].n_nonfinite == 4 and out[1].n == 5  # NULL counts too
    assert out[1].mean == 0.25 and out[1].std == 0.0  # one finite cell
    assert out[2].n_clamped == 3                      # ±2e4, -1e9 → ±8
    assert out[2].min_fp == -8 * 1048576 and out[2].max_fp == 8 * 1048576
    assert out[3].n_nonfinite == 1 and out[3].n_clamped == 0
    # engine parity on the adversarial frame itself
    duck.execute("DROP TABLE IF EXISTS bad_emb")
    duck.execute(
        "CREATE TABLE bad_emb AS SELECT * FROM (VALUES "
        + ", ".join(
            "({}, [{}])".format(
                i,
                ", ".join(
                    "NULL::FLOAT" if v is None else f"'{v!r}'::FLOAT"
                    for v in vec
                ),
            )
            for i, vec in rows
        )
        + ") AS t(vec_id, embedding)"
    )
    want = duck.execute(
        similarity.embedding_stats_oracle_sql(
            "SELECT embedding FROM bad_emb", "embedding"
        )
    ).df()
    from tests.util import assert_frames_match

    assert_frames_match(similarity.embedding_stats(df), want)


def test_embedding_stats_overflow_guard_and_shards(spark):
    """r13 (VERDICT r12 watch item): the exact-BIGINT sumsq bound is
    ENFORCED — a dim group past _max_exact_rows finite cells raises
    instead of wrapping silently — and the shards>0 DECIMAL(38,0)
    merge path is bit-identical to the unsharded algebra."""
    import pytest
    from pyspark.sql import functions as F

    n = 200  # clamp-max cells: each contributes exactly 2^46 to sumsq
    df = spark.range(n).select(
        F.array(F.lit(8.0).cast("float")).alias("embedding")
    )
    with pytest.raises(Exception, match="exact-BIGINT bound"):
        similarity.embedding_stats(df, _max_exact_rows=150).collect()
    base = similarity.embedding_stats(df).collect()[0]
    got = similarity.embedding_stats(df, shards=4).collect()[0]
    assert int(got.sumsq_fp) == int(base.sumsq_fp) == n * (8 * 1048576) ** 2
    assert got.n == base.n == n
    assert got.mean == base.mean == 8.0
    assert got.std == base.std == 0.0


def test_embedding_stats_sharded_exact_past_bigint(spark):
    """Past the BIGINT bound the sharded path stays EXACT (the total
    sumsq here exceeds 2^63-1, representable only in the decimal
    merge) while the default path refuses loudly."""
    import pytest
    from pyspark.sql import functions as F

    n = 131328  # > floor((2^63-1) / 2^46) = 131071
    df = spark.range(n).select(
        F.array(F.lit(8.0).cast("float")).alias("embedding")
    )
    row = similarity.embedding_stats(df, shards=8).collect()[0]
    want = n * (8 * 1048576) ** 2
    assert want > 2**63 - 1  # the test's whole point
    assert int(row.sumsq_fp) == want
    assert row.n == n and row.mean == 8.0 and row.std == 0.0
    # the default path refuses loudly either way: under ANSI (the
    # session default) the engine's own sum-overflow check fires
    # mid-aggregation, before the post-agg guard can; under non-ANSI
    # the guard catches the silent wrap after the fact
    with pytest.raises(
        Exception, match="exact-BIGINT bound|ARITHMETIC_OVERFLOW"
    ):
        similarity.embedding_stats(df).collect()


def test_embedding_stats_shards_spread_wide_vectors(spark):
    """Review r13: a raw `id % shards` shard key inherits posexplode's
    stride — any shards value sharing a factor with the vector width
    collapsed each dim group into ONE shard, silently defeating the
    overflow escape.  The guard itself is the teeth: with 64-dim
    vectors, shards=8 and a per-partial bound below the group size,
    a collapsed shard would trip the bound; hashed spreading keeps
    every partial under it."""
    from pyspark.sql import functions as F

    n = 2000
    df = spark.range(n).select(
        F.array(*[F.lit(0.5).cast("float")] * 64).alias("embedding")
    )
    # collapse ⇒ one partial holds all 2000 cells of a dim > 400 ⇒
    # raise; hashed spread ⇒ ~250 per partial ⇒ passes
    rows = similarity.embedding_stats(
        df, shards=8, _max_exact_rows=400
    ).collect()
    assert len(rows) == 64
    assert all(r.n == n and r.mean == 0.5 for r in rows)


def test_embedding_stats_guard_survives_column_pruning(spark):
    """Review r13: the guard previously lived on the bystander `n`
    column — selecting only the wrap-risk columns pruned it away.
    Now it wraps sum_fp/sumsq_fp themselves."""
    import pytest
    from pyspark.sql import functions as F

    df = spark.range(50).select(
        F.array(F.lit(1.0).cast("float")).alias("embedding")
    )
    with pytest.raises(Exception, match="exact-BIGINT bound"):
        similarity.embedding_stats(df, _max_exact_rows=10).select(
            "sumsq_fp"
        ).collect()
    with pytest.raises(Exception, match="exact-BIGINT bound"):
        similarity.embedding_stats(
            df, shards=2, _max_exact_rows=5
        ).select("sum_fp").collect()
