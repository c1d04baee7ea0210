"""file.d offsets-file import/export
(/root/reference/plugin/input/file/offset.go:51-233).

A running file.d deployment persists its read positions in a
hand-rolled YAML-ish format:

    - file: /var/log/pods/x.log
      inode: 1
      source_id: 1234
      last_read_timestamp: 1763651665000000000
      streams:
        default: 100
        error:: 960

Importing this file lets a deployment swap engines without re-reading
(or re-shipping) everything already delivered.  The parser replays the
reference's strict line discipline — exact prefixes, duplicate
source_id/stream detection, the LAST ':' splitting a stream name from
its offset (so a stream literally named ``error:`` round-trips),
``last_read_timestamp`` optional.

The tail_file source consumes the import as {filename: byte_offset}.
file.d tracks one offset PER STREAM within a file; a byte-tailing
source has a single read position, so the MINIMUM stream offset is
used — everything not yet delivered on SOME stream is re-read
(at-least-once, never data loss).  Inodes/source_ids are fingerprints
of the original host; matching is by filename, the only portable key.
"""

from __future__ import annotations


class OffsetsFormatError(ValueError):
    pass


def _take_line(content: str, prefix: str) -> tuple[str, str]:
    pos = content.find("\n")
    if pos < 0:
        raise OffsetsFormatError(f"no newline while looking for {prefix!r}")
    line, rest = content[:pos], content[pos + 1:]
    if not line.startswith(prefix):
        raise OffsetsFormatError(f"expected prefix {prefix!r}, got {line!r}")
    return line[len(prefix):], rest


def parse_offsets(content: str) -> list[dict]:
    """-> [{file, inode, source_id, last_read_timestamp|None,
    streams: {name: offset}}], in file order."""
    entries: list[dict] = []
    seen_ids: set[int] = set()
    while content:
        filename, content = _take_line(content, "- file: ")
        inode_s, content = _take_line(content, "  inode: ")
        source_s, content = _take_line(content, "  source_id: ")
        ts = None
        if content.startswith("  last_read_timestamp: "):
            ts_s, content = _take_line(content, "  last_read_timestamp: ")
            try:
                ts = int(ts_s)
            except ValueError as e:
                raise OffsetsFormatError(f"invalid timestamp {ts_s!r}") from e
        try:
            inode = int(inode_s)
            source_id = int(source_s)
        except ValueError as e:
            raise OffsetsFormatError(
                f"can't parse inode/source_id: {inode_s!r}/{source_s!r}"
            ) from e
        if source_id in seen_ids:
            raise OffsetsFormatError(f"duplicate inode {inode}")
        seen_ids.add(source_id)
        _, content = _take_line(content, "  streams:")
        streams: dict[str, int] = {}
        while content and content[0] != "-":
            pos = content.find("\n")
            if pos < 0:
                raise OffsetsFormatError(f"no new line {content!r}")
            line, content = content[:pos], content[pos + 1:]
            if len(line) < 5 or not line.startswith("    "):
                raise OffsetsFormatError(f"no leading whitespaces {line!r}")
            sep = line.rfind(":")
            if sep < 0:
                raise OffsetsFormatError(f"no separator {line!r}")
            stream = line[4:sep]
            if not stream:
                raise OffsetsFormatError("empty stream")
            if stream in streams:
                raise OffsetsFormatError(f"duplicate stream {stream!r}")
            try:
                streams[stream] = int(line[sep + 2:])
            except ValueError as e:
                raise OffsetsFormatError(
                    f"can't parse offset {line[sep + 2:]!r}"
                ) from e
        entries.append(
            {
                "file": filename,
                "inode": inode,
                "source_id": source_id,
                "last_read_timestamp": ts,
                "streams": streams,
            }
        )
    return entries


def render_offsets(entries: list[dict]) -> str:
    """Inverse of :func:`parse_offsets` (offset.go save format) — an
    engine running here can hand its positions BACK to a file.d
    deployment."""
    out = []
    for e in entries:
        out.append(f"- file: {e['file']}")
        out.append(f"  inode: {e['inode']}")
        out.append(f"  source_id: {e['source_id']}")
        if e.get("last_read_timestamp") is not None:
            out.append(f"  last_read_timestamp: {e['last_read_timestamp']}")
        out.append("  streams:")
        for name, off in e["streams"].items():
            out.append(f"    {name}: {off}")
    return "\n".join(out) + "\n" if out else ""


def initial_positions(entries: list[dict]) -> dict[str, int]:
    """{filename: starting byte offset} for the tail source — the min
    stream offset per file (see module docstring)."""
    out: dict[str, int] = {}
    for e in entries:
        if e["streams"]:
            out[e["file"]] = min(e["streams"].values())
    return out


def load_initial_positions(path: str) -> dict[str, int]:
    import os

    if not os.path.exists(path):
        return {}
    with open(path) as fh:
        return initial_positions(parse_offsets(fh.read()))
