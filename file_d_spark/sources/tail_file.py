"""Tail-follow file source via the Python DataSource API.

Spark's built-in file streaming source lists whole NEW files; the
reference instead tails files as they grow, tracking byte offsets per
file with rotation/truncation handling
(/root/reference/plugin/input/file/worker.go:47, offset.go:51,233).

This DataSource brings that semantics to Structured Streaming:
  * offsets = {path: byte_position} JSON (the reference's offset DB —
    here managed by Spark's checkpoint WAL instead of tmp+fsync+rename)
  * each micro-batch reads [committed, latest] per file, snapped to
    newline boundaries so partial writes never emit half lines
  * truncation (size < committed offset) re-reads from 0, like the
    reference's resetter
  * one InputPartition per grown file -> per-file parallelism

Usage:
    spark.dataSource.register(TailFileDataSource)
    df = (spark.readStream.format("tail_file")
          .option("path", "/var/log/pods").option("glob", "*.log").load())
"""

from __future__ import annotations

import fnmatch
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

try:  # executors may not have the repo on sys.path
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pragma: no cover
    pass


class _TailPartition(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


def _list_files(root: str, glob: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for name in files:
            if fnmatch.fnmatch(name, glob):
                out.append(os.path.join(dirpath, name))
    return sorted(out)


def _newline_boundary(path: str, size: int) -> int:
    """Largest offset <= size ending on a newline (0 if none)."""
    if size <= 0:
        return 0
    chunk = 64 * 1024
    with open(path, "rb") as fh:
        pos = size
        while pos > 0:
            read_from = max(0, pos - chunk)
            fh.seek(read_from)
            buf = fh.read(pos - read_from)
            idx = buf.rfind(b"\n")
            if idx >= 0:
                return read_from + idx + 1
            pos = read_from
    return 0


class TailFileStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("tail_file requires option 'path'")
        self.glob = options.get("glob", "*")
        # drop-in swap from a running file.d deployment: its offsets
        # file (plugin/input/file/offset.go format) seeds the FIRST
        # checkpoint so already-delivered bytes aren't re-read; once a
        # checkpoint exists, Spark's WAL owns the positions and this
        # option is ignored (initialOffset is only consulted on a
        # fresh checkpoint).
        self.offsets_file = options.get("offsets_file")
        # reference offsets_op (file.go:63-69,128): continue = use the
        # offsets file; tail = start at end-of-file (newline-snapped,
        # like the reference's skip-to-next-line after SeekEnd);
        # reset = start every file from 0, ignoring saved offsets
        self.offsets_op = options.get("offsets_op", "continue")
        if self.offsets_op not in ("continue", "tail", "reset"):
            raise ValueError(
                f"offsets_op must be continue|tail|reset, got "
                f"{self.offsets_op!r}"
            )

    def initialOffset(self) -> dict:
        if self.offsets_op == "tail":
            # everything already in the files is old news; begin at the
            # current newline boundary of each existing file
            return self.latestOffset()
        if self.offsets_op == "continue" and self.offsets_file:
            from file_d_spark.sources.offsets import load_initial_positions

            return {"files": load_initial_positions(self.offsets_file)}
        return {"files": {}}

    def latestOffset(self) -> dict:
        files = {}
        for path in _list_files(self.root, self.glob):
            try:
                size = os.path.getsize(path)
            except OSError:
                continue
            files[path] = _newline_boundary(path, size)
        return {"files": files}

    def partitions(self, start: dict, end: dict) -> list[_TailPartition]:
        start_files = start.get("files", {})
        parts = []
        for path, end_off in end.get("files", {}).items():
            begin = start_files.get(path, 0)
            if end_off < begin:
                begin = 0  # truncation/rotation: re-read
            if end_off > begin:
                parts.append(_TailPartition(path, begin, end_off))
        if not parts:
            # Spark requires >=1 partition per batch; emit an empty one
            parts.append(_TailPartition("", 0, 0))
        return parts

    def read(self, partition: _TailPartition):
        if not partition.path:
            return
        with open(partition.path, "rb") as fh:
            fh.seek(partition.start)
            data = fh.read(partition.end - partition.start)
        offset = partition.start
        for line in data.split(b"\n"):
            if not line and offset + 1 >= partition.end:
                break
            yield (line.decode("utf-8", "replace"), partition.path, offset)
            offset += len(line) + 1

    def commit(self, end: dict) -> None:
        pass  # checkpoint WAL is the offset DB


class TailFileDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tail_file"

    def schema(self) -> str:
        return "value string, file string, offset long"

    def streamReader(self, schema: StructType) -> TailFileStreamReader:
        return TailFileStreamReader(self.options)
