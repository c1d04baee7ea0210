"""Scale primitives (functions/scale.py): salted two-phase
aggregation equivalence + plan shape, and the bucketed-join
no-Exchange property the module docstring promises."""

import pytest
from pyspark.sql import functions as F

from file_d_spark.functions import scale
from tests.util import assert_frames_match


def test_salted_agg_matches_plain_groupby(spark, events):
    df = events.select("event_type", "value", "user_id")
    plain = (
        df.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.sum("value").alias("total"),
            F.min("user_id").alias("lo"),
            F.max("user_id").alias("hi"),
        )
    )
    salted = scale.salted_agg(
        df,
        keys=["event_type"],
        aggs={
            "n": ("value", "count"),
            "total": ("value", "sum"),
            "lo": ("user_id", "min"),
            "hi": ("user_id", "max"),
        },
        buckets=8,
    )
    got = {
        r["event_type"]: r.asDict()
        for r in salted.collect()
    }
    want = {r["event_type"]: r.asDict() for r in plain.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k]["n"] == want[k]["n"]
        assert got[k]["lo"] == want[k]["lo"]
        assert got[k]["hi"] == want[k]["hi"]
        assert got[k]["total"] == pytest.approx(want[k]["total"], rel=1e-9)


def test_salted_agg_two_phase_plan(spark, events):
    """The skew-safety property IS the plan shape: a partial aggregate
    keyed by (key, __salt__) fans the hot key across reducers, then a
    second exchange on the bare key merges one partial row per salt.
    Both hashpartitionings must appear, salted first."""
    salted = scale.salted_agg(
        events.select("event_type", "value"),
        keys=["event_type"],
        aggs={"n": ("value", "count")},
        buckets=8,
    )
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__salt__" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_salted_agg_rejects_non_decomposable(events):
    with pytest.raises(ValueError, match="not decomposable"):
        scale.salted_agg(
            events, keys=["event_type"], aggs={"a": ("value", "avg")}
        )
    with pytest.raises(ValueError, match="must not be empty"):
        scale.salted_agg(events, keys=["event_type"], aggs={})


def test_salted_agg_oracle_parity(spark, sf_dir, duck):
    """The registered token_stats_suite combo (whose `salted` leg is
    the salted_agg path, hashed side by side with the plain groupBy
    leg) equals its DuckDB oracle — the same check the driver runs."""
    from file_d_spark.queries import ORACLES, QUERIES

    got = QUERIES["token_stats_suite"](spark, sf_dir)
    want = duck.execute(ORACLES["token_stats_suite"]).df()
    assert_frames_match(got, want)


def test_bucketed_join_no_exchange(spark, events, tmp_path):
    """write_bucketed pins the join key's partitioning into the table
    layout: a same-bucket-count equi-join between two bucketed+sorted
    tables plans with NO Exchange on either side."""
    left = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    right = events.groupBy("user_id").agg(F.sum("value").alias("spend"))
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        scale.write_bucketed(left, "t_scale_left", "user_id", buckets=4)
        scale.write_bucketed(right, "t_scale_right", "user_id", buckets=4)
        # force a non-broadcast join so the Exchange question is real
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_scale_left").join(
            spark.table("t_scale_right"), "user_id"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # and the result is still the join result
        assert joined.count() == spark.table("t_scale_left").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS t_scale_left")
        spark.sql("DROP TABLE IF EXISTS t_scale_right")


def test_write_bucketed_rejects_qualified_names(spark):
    """The orphan-directory heuristic maps <warehouse>/<table>, valid
    only for unqualified default-database names — a db.tbl name would
    compute (and recursively delete) the wrong path."""
    import pytest

    from file_d_spark.functions.scale import write_bucketed

    df = spark.range(3)
    with pytest.raises(ValueError, match="qualified"):
        write_bucketed(df, "somedb.tbl", "id", buckets=2)


def test_spread_skips_well_split_inputs(spark, tmp_path):
    """spread() must not round-robin-shuffle a corpus whose scan
    already has enough splits — at 100 TB that exchange would move the
    whole input for nothing.  Under-split (single-file) scans and
    memory-backed fixtures keep the repartition."""
    from file_d_spark.functions.dedup import spread

    p = spark.sparkContext.defaultParallelism
    many = str(tmp_path / "many")
    spark.range(0, p * 4).repartition(p * 2).write.parquet(many)
    well_split = spark.read.parquet(many)
    assert len(well_split.inputFiles()) >= p
    plan = spread(well_split)._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" not in plan

    one = str(tmp_path / "one")
    spark.range(0, 10).coalesce(1).write.parquet(one)
    single = spark.read.parquet(one)
    plan = spread(single)._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in plan

    mem = spark.createDataFrame([(1,)], "x long")
    plan = spread(mem)._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in plan
