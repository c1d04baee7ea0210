"""Uniform cache lifecycle (VERDICT r5 #7): every internal .cache()
in the operator library registers in file_d_spark.cachereg, so
queries.release_caches() drops ALL persisted frames — harnesses must
not need spark.catalog.clearCache() to avoid session-lifetime cache
accumulation from dedup/similarity internals."""

import pytest


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


@pytest.mark.parametrize(
    "names",
    [
        ("dedup_ngram_jaccard", "dedup_minhash_lsh"),
        ("semantic_dedup", "dedup_cluster"),
    ],
)
def test_release_caches_drops_internal_caches(spark, sf_dir, names):
    from file_d_spark.queries import QUERIES, release_caches

    # start clean so the assertion is about THIS run's caches
    spark.catalog.clearCache()
    release_caches()

    for name in names:
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    assert _persistent_rdd_count(spark) > 0, (
        "expected the dedup queries to cache internal frames"
    )
    release_caches()
    assert _persistent_rdd_count(spark) == 0, (
        "release_caches missed a library-internal cache"
    )


def test_register_returns_frame(spark):
    from file_d_spark import cachereg

    df = spark.range(3).cache()
    assert cachereg.register(df) is df
    assert df in cachereg.CACHED
    cachereg.release()
    assert not cachereg.CACHED
