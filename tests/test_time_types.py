"""Time-column type handling: TIMESTAMP_NTZ normalization and the
loud-failure contract for un-timestampable time fields (round-2
postmortem: a silent wall-clock fallback collapsed every event into
one throttle bucket)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from file_d_spark import Pipeline
from file_d_spark import xtime


def _ntz_df(spark):
    return spark.createDataFrame(
        [(i, f"2024-01-01 00:{i:02d}:00", "svc") for i in range(10)],
        "n long, raw string, k string",
    ).withColumn("ts", F.col("raw").cast("timestamp_ntz"))


def test_throttle_accepts_ntz(spark):
    df = _ntz_df(spark)
    p = Pipeline.from_dict(
        {
            "actions": [
                {
                    "type": "throttle",
                    "throttle_field": "k",
                    "time_field": "ts",
                    "bucket_interval": "1m",
                    "buckets_count": 100000,
                    "default_limit": 1,
                    "order_fields": ["n"],
                }
            ]
        }
    )
    # 10 distinct 1-minute buckets, limit 1 each -> all 10 survive.
    # Under the old wall-clock fallback they'd collapse to one bucket.
    assert p.apply(df).count() == 10


def test_doif_ts_cmp_accepts_ntz(spark):
    df = _ntz_df(spark)
    p = Pipeline.from_dict(
        {
            "actions": [
                {
                    "type": "discard",
                    "do_if": {
                        "op": "ts_cmp",
                        "field": "ts",
                        "cmp_op": "lt",
                        "value": "2024-01-01T00:05:00Z",
                    },
                }
            ]
        }
    )
    assert p.apply(df).count() == 5


def test_throttle_rejects_untimestampable_type(spark):
    df = _ntz_df(spark).withColumn("bad", F.array(F.lit(1)))
    p = Pipeline.from_dict(
        {
            "actions": [
                {
                    "type": "throttle",
                    "throttle_field": "k",
                    "time_field": "bad",
                    "bucket_interval": "1m",
                    "default_limit": 1,
                }
            ]
        }
    )
    with pytest.raises(TypeError, match="throttle time_field"):
        p.apply(df).count()


def test_antispam_rejects_untimestampable_type(spark):
    df = _ntz_df(spark).withColumn("bad", F.create_map(F.lit("a"), F.lit(1)))
    p = Pipeline.from_dict(
        {
            "actions": [
                {
                    "type": "antispam",
                    "source_field": "k",
                    "time_field": "bad",
                    "threshold": 3,
                }
            ]
        }
    )
    with pytest.raises(TypeError, match="antispam time_field"):
        p.apply(df).count()


def test_unparseable_strings_go_to_null_bucket_not_wall_clock(spark):
    # parse failures must NOT be stamped with now(): they share one
    # null bucket (kept up to the limit) instead of polluting real ones
    df = spark.createDataFrame(
        [(i, "not-a-time", "svc") for i in range(5)]
        + [(10 + i, f"2024-01-01T00:00:{i:02d}Z", "svc") for i in range(5)],
        "n long, time string, k string",
    )
    p = Pipeline.from_dict(
        {
            "actions": [
                {
                    "type": "throttle",
                    "throttle_field": "k",
                    "time_field": "time",
                    "time_field_format": "rfc3339",
                    "bucket_interval": "1m",
                    "buckets_count": 100000,
                    "default_limit": 2,
                    "order_fields": ["n"],
                }
            ]
        }
    )
    out = p.apply(df)
    # 2 admitted from the null bucket + 2 from the real bucket
    assert out.count() == 4


def test_ensure_timestamp_passthrough_types(spark):
    df = _ntz_df(spark).withColumn("d", F.col("ts").cast("date"))
    for name, typ in [("ts", T.TimestampNTZType()), ("d", T.DateType())]:
        out = df.select(
            xtime.ensure_timestamp(F.col(name), typ, None).alias("out")
        )
        assert isinstance(out.schema["out"].dataType, T.TimestampType)
        assert out.where(F.col("out").isNull()).count() == 0
