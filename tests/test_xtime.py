"""xtime: format alias resolution, Go-layout translation, parse/format
round-trips through Spark."""

from pyspark.sql import functions as F

from file_d_spark import xtime


def test_alias_resolution():
    assert xtime.resolve_format("rfc3339") == "yyyy-MM-dd'T'HH:mm:ssXXX"
    assert xtime.resolve_format("UNIXTIME") == "unixtime"
    assert xtime.resolve_format(None) == xtime.resolve_format("rfc3339nano")
    assert xtime.resolve_format("nginx_errorlog") == "yyyy/MM/dd HH:mm:ss"


def test_go_layout_translation():
    assert xtime.go_layout_to_spark("2006-01-02 15:04:05") == "yyyy-MM-dd HH:mm:ss"
    assert (
        xtime.go_layout_to_spark("2006-01-02T15:04:05.000000Z07:00")
        == "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    )
    assert xtime.go_layout_to_spark("Jan _2 15:04:05") == "MMM ppd HH:mm:ss"


def test_parse_and_format_roundtrip(spark):
    df = spark.createDataFrame(
        [("2024-03-05T06:07:08Z", "1709618828", "2024/03/05 06:07:08")],
        "rfc string, unix string, nginx string",
    )
    row = df.select(
        xtime.parse_time(F.col("rfc"), "rfc3339").alias("t1"),
        xtime.parse_time(F.col("unix"), "unixtime").alias("t2"),
        xtime.parse_time(F.col("nginx"), "nginx_errorlog").alias("t3"),
        xtime.format_time(
            xtime.parse_time(F.col("rfc"), "rfc3339"), "unixtime"
        ).alias("u"),
    ).collect()[0]
    assert row.t1 == row.t2 == row.t3
    assert row.u == 1709618828


def test_unparsable_yields_null(spark):
    df = spark.createDataFrame([("definitely not a date",)], "s string")
    assert (
        df.select(xtime.parse_time(F.col("s"), "rfc3339").alias("t")).collect()[0].t
        is None
    )


def test_rfc3339nano_strips_trailing_zeros(spark):
    """Go time.Format with .999999999 drops trailing fractional zeros
    (playground_handler_test.go expects "...:09Z" after convert_date to
    rfc3339nano); .000-style Go fractions keep their zeros."""
    df = spark.createDataFrame(
        [("2023-08-21T10:01:09Z", "2023-08-21T10:01:09.5Z",
          "2023-08-21T10:01:09.282965Z")],
        "whole string, half string, micro string",
    )
    row = df.select(
        *[
            xtime.format_time(
                xtime.parse_time(F.col(c), "rfc3339nano"), "rfc3339nano"
            ).alias(c)
            for c in ("whole", "half", "micro")
        ],
        xtime.format_time(
            xtime.parse_time(F.col("half"), "rfc3339nano"),
            "15:04:05.000",  # Go zero-fraction: zeros preserved
        ).alias("zeros"),
    ).collect()[0]
    assert row.whole == "2023-08-21T10:01:09Z"
    assert row.half == "2023-08-21T10:01:09.5Z"
    assert row.micro == "2023-08-21T10:01:09.282965Z"
    assert row.zeros == "10:01:09.500"


def test_bracketed_fraction_trim_spares_dotted_dates(spark):
    """The Go-'9' trailing-zero trim must touch only the fraction: a
    layout mixing dotted dates with .999 ('02.01.2006 15:04:05.999')
    must not lose the month's zero (ADVICE r7: the old end-anchored
    regex matched the date's dot-run leftmost-first)."""
    df = spark.createDataFrame(
        [("2026-10-15T10:00:09.120Z",), ("2026-10-15T10:00:09Z",)],
        "s string",
    )
    out = [
        r.f
        for r in df.select(
            xtime.format_time(
                xtime.parse_time(F.col("s"), "rfc3339nano"),
                "02.01.2006 15:04:05.999",
            ).alias("f")
        ).collect()
    ]
    assert out == ["15.10.2026 10:00:09.12", "15.10.2026 10:00:09"]
