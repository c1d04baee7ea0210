"""Tail-follow DataSource: appended lines arrive in later batches with
byte offsets; truncation re-reads."""

import os
import time


def test_tail_file_follows_appends(spark, tmp_path):
    from file_d_spark.sources.tail_file import TailFileDataSource

    spark.dataSource.register(TailFileDataSource)
    logdir = tmp_path / "logs"
    logdir.mkdir()
    log = logdir / "app.log"
    with open(log, "w") as fh:
        fh.write("line-0\nline-1\n")

    df = (
        spark.readStream.format("tail_file")
        .option("path", str(logdir))
        .option("glob", "*.log")
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("tail_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {r.value: r.offset for r in spark.sql("SELECT * FROM tail_out").collect()}
        assert got1 == {"line-0": 0, "line-1": 7}

        # append (plus a partial line that must NOT be emitted yet)
        with open(log, "a") as fh:
            fh.write("line-2\npartial")
        q.processAllAvailable()
        got2 = {r.value for r in spark.sql("SELECT * FROM tail_out").collect()}
        assert got2 == {"line-0", "line-1", "line-2"}

        # complete the partial line
        with open(log, "a") as fh:
            fh.write("-done\n")
        q.processAllAvailable()
        got3 = {r.value for r in spark.sql("SELECT * FROM tail_out").collect()}
        assert "partial-done" in got3
    finally:
        q.stop()
