"""file.d offsets-file import: parser goldens against the reference's
own test corpus (plugin/input/file/offset_test.go), round-trip render,
and the tail_file drop-in-swap integration."""

import pytest

from file_d_spark.sources.offsets import (
    OffsetsFormatError,
    initial_positions,
    load_initial_positions,
    parse_offsets,
    render_offsets,
)

# TestParseOffsets corpus (offset_test.go) — note the stream literally
# named 'error:' (the LAST ':' is the separator)
REFERENCE_DATA = """- file: /some/informational/name
  inode: 1
  source_id: 1234
  streams:
    default: 100
    error:: 960
    another: 200
- file: /another/informational/name
  inode: 2
  source_id: 4321
  last_read_timestamp: 1763651665000000000
  streams:
    stderr: 300
    error:: 0
"""


def test_parse_reference_corpus():
    entries = parse_offsets(REFERENCE_DATA)
    assert len(entries) == 2
    e1 = entries[0]
    assert e1["file"] == "/some/informational/name"
    assert e1["inode"] == 1 and e1["source_id"] == 1234
    assert e1["last_read_timestamp"] is None
    assert e1["streams"] == {"default": 100, "error:": 960, "another": 200}
    e2 = entries[1]
    assert e2["source_id"] == 4321
    assert e2["last_read_timestamp"] == 1763651665000000000
    assert e2["streams"] == {"stderr": 300, "error:": 0}


def test_round_trip():
    entries = parse_offsets(REFERENCE_DATA)
    assert parse_offsets(render_offsets(entries)) == entries


@pytest.mark.parametrize("bad", [
    "- file: /x\n  inode: 1\n  source_id: 1\n  streams:\n    s: 1\n"
    "- file: /y\n  inode: 9\n  source_id: 1\n  streams:\n    s: 2\n",  # dup id
    "- wrong: /x\n",                                       # bad prefix
    "- file: /x\n  inode: zz\n  source_id: 1\n  streams:\n",  # bad inode
    "- file: /x\n  inode: 1\n  source_id: 1\n  streams:\n"
    "    nosep 5\n",                                       # no separator
    "- file: /x\n  inode: 1\n  source_id: 1\n  streams:\n"
    "    : 5\n",                                           # empty stream
    "- file: /x\n  inode: 1\n  source_id: 1\n  streams:\n"
    "    s: xx\n",                                         # bad offset
    "- file: /x\n  inode: 1\n  source_id: 1\n"
    "  last_read_timestamp: soon\n  streams:\n",           # bad timestamp
    "- file: /x\n  inode: 1\n  source_id: 1\n  streams:\n"
    "    s: 1\n    s: 2\n",                                # dup stream
    "- file: /x\n  inode: 1\n  source_id: 1\n  streams:\n"
    "  s: 1\n",                                            # bad indent
])
def test_parse_errors(bad):
    with pytest.raises(OffsetsFormatError):
        parse_offsets(bad)


def test_initial_positions_min_of_streams():
    pos = initial_positions(parse_offsets(REFERENCE_DATA))
    # min over streams: never skip bytes some stream hasn't delivered
    assert pos == {
        "/some/informational/name": 100,
        "/another/informational/name": 0,
    }


def test_load_missing_file_is_empty(tmp_path):
    assert load_initial_positions(str(tmp_path / "nope.yaml")) == {}


def test_tail_file_resumes_from_imported_offsets(spark, tmp_path):
    """Drop-in swap: a file.d offsets file seeds the first checkpoint,
    so only bytes past the imported position are delivered."""
    from file_d_spark.sources.tail_file import TailFileDataSource

    spark.dataSource.register(TailFileDataSource)
    logdir = tmp_path / "logs"
    logdir.mkdir()
    log = logdir / "app.log"
    lines = [f"line-{i}" for i in range(6)]
    with open(log, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    # file.d delivered the first 3 lines (7 bytes each)
    delivered = 3 * 7
    offsets_yaml = tmp_path / "offsets.yaml"
    offsets_yaml.write_text(
        f"- file: {log}\n"
        "  inode: 77\n"
        "  source_id: 555\n"
        "  streams:\n"
        f"    default: {delivered}\n"
    )
    df = (
        spark.readStream.format("tail_file")
        .option("path", str(logdir))
        .option("glob", "*.log")
        .option("offsets_file", str(offsets_yaml))
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("tail_import_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.value: r.offset
            for r in spark.sql("SELECT * FROM tail_import_out").collect()
        }
        assert got == {"line-3": 21, "line-4": 28, "line-5": 35}
    finally:
        q.stop()


def test_tail_file_offsets_op_tail(spark, tmp_path):
    """offsets_op: tail (file.go:68) — pre-existing content is old
    news; only lines appended after the stream starts are delivered."""
    from file_d_spark.sources.tail_file import TailFileDataSource

    spark.dataSource.register(TailFileDataSource)
    logdir = tmp_path / "logs"
    logdir.mkdir()
    log = logdir / "app.log"
    with open(log, "w") as fh:
        fh.write("old-0\nold-1\n")
    df = (
        spark.readStream.format("tail_file")
        .option("path", str(logdir))
        .option("glob", "*.log")
        .option("offsets_op", "tail")
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("tail_op_tail")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.value for r in spark.sql("SELECT * FROM tail_op_tail").collect()}
        assert got == set(), f"pre-existing lines delivered: {got}"
        with open(log, "a") as fh:
            fh.write("new-0\n")
        q.processAllAvailable()
        got = {r.value for r in spark.sql("SELECT * FROM tail_op_tail").collect()}
        assert got == {"new-0"}
    finally:
        q.stop()


def test_tail_file_offsets_op_reset_ignores_offsets_file(spark, tmp_path):
    """offsets_op: reset (file.go:69) — saved offsets are discarded,
    every file re-reads from byte 0 even when offsets_file is set."""
    from file_d_spark.sources.tail_file import TailFileDataSource

    spark.dataSource.register(TailFileDataSource)
    logdir = tmp_path / "logs"
    logdir.mkdir()
    log = logdir / "app.log"
    with open(log, "w") as fh:
        fh.write("line-0\nline-1\n")
    offsets_yaml = tmp_path / "offsets.yaml"
    offsets_yaml.write_text(
        f"- file: {log}\n  inode: 1\n  source_id: 1\n  streams:\n"
        "    default: 7\n"
    )
    df = (
        spark.readStream.format("tail_file")
        .option("path", str(logdir))
        .option("glob", "*.log")
        .option("offsets_file", str(offsets_yaml))
        .option("offsets_op", "reset")
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("tail_op_reset")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.value for r in spark.sql("SELECT * FROM tail_op_reset").collect()}
        assert got == {"line-0", "line-1"}
    finally:
        q.stop()


def test_tail_file_offsets_op_validation(spark):
    import pytest

    from file_d_spark.sources.tail_file import TailFileStreamReader

    with pytest.raises(ValueError, match="offsets_op"):
        TailFileStreamReader({"path": "/tmp", "offsets_op": "bogus"})
