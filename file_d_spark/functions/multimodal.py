"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

Metadata extraction is REAL for container headers: PNG (IHDR), GIF
(logical screen descriptor), JPEG (SOFn frame header), and WAV
(RIFF fmt/data chunks) are parsed byte-by-byte in pure Python —
these are fixed public file-format layouts, no media library needed.
Pixel/sample DECODE (what PIL/ffmpeg would do) stays stubbed in this
container: unrecognized blobs either raise (strict=True), get the
deterministic arithmetic fake metadata (fake=True), or null metadata.

Scale notes: binary blobs dominate row size — ``mapInPandas`` with
small Arrow batches (spark.sql.execution.arrow.maxRecordsPerBatch)
keeps executor memory bounded; repartition by blob-size buckets before
heavy decode stages so one partition never holds only large videos.
Header parsing touches only the first ~64 bytes of each blob, so the
per-row Python cost is flat regardless of blob size.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# mapInPandas closures reference module-level helpers; executors may
# not have the repo on sys.path — pickle this module by value
try:  # pragma: no cover
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:
    pass

MEDIA_META_SCHEMA = (
    "media_id long, kind string, byte_len int, "
    "width int, height int, n_frames int, sample_rate int"
)


def as_media_column(df: DataFrame, content_col: str, kind: str, id_col: str) -> DataFrame:
    """Normalize to the engine's media layout: (media_id, kind, blob)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(content_col).cast("binary").alias("blob"),
    )


# --------------------------------------------------------------------------
# container-header codecs (pure Python over public format layouts)
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def parse_png(blob: bytes) -> dict | None:
    """PNG: 8-byte signature, then the IHDR chunk (always first):
    4-byte length, b'IHDR', 4-byte BE width, 4-byte BE height."""
    if len(blob) < 24 or not blob.startswith(_PNG_SIG) or blob[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", blob[16:24])
    return {"kind": "png", "width": w, "height": h, "n_frames": 1}


def parse_gif(blob: bytes) -> dict | None:
    """GIF87a/89a: 6-byte signature, then the logical screen
    descriptor: 2-byte LE width, 2-byte LE height.  n_frames counts
    image-descriptor separators (0x2C) at top level is unreliable
    without full LZW walking, so report 1 (the first frame)."""
    if len(blob) < 10 or blob[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", blob[6:10])
    return {"kind": "gif", "width": w, "height": h, "n_frames": 1}


_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def parse_jpeg(blob: bytes) -> dict | None:
    """JPEG: walk marker segments from SOI until a SOFn frame header;
    its payload is [precision:1][height:2 BE][width:2 BE]..."""
    if len(blob) < 4 or blob[:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 2 <= len(blob):
        if blob[i] != 0xFF:
            return None
        # 0xFF fill/padding bytes between segments are legal
        # (ISO 10918-1 B.1.1.2) — skip runs of them to the marker byte
        while i + 1 < len(blob) and blob[i + 1] == 0xFF:
            i += 1
        if i + 2 > len(blob):
            return None
        marker = blob[i + 1]
        # bare (parameterless) markers: SOI, RSTn, EOI, TEM
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker in (0xD9, 0x01):
            i += 2
            continue
        if i + 4 > len(blob):
            return None
        seglen = struct.unpack(">H", blob[i + 2 : i + 4])[0]
        if marker in _JPEG_SOF:
            if i + 9 > len(blob):
                return None
            h, w = struct.unpack(">HH", blob[i + 5 : i + 9])
            return {"kind": "jpeg", "width": w, "height": h, "n_frames": 1}
        i += 2 + seglen
    return None


def parse_wav(blob: bytes) -> dict | None:
    """RIFF/WAVE: walk chunks; 'fmt ' carries channels/sample_rate/
    block_align, 'data' carries the payload whose size / block_align
    is the frame (sample) count."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    i = 12
    sample_rate = block_align = None
    n_frames = None
    while i + 8 <= len(blob):
        cid = blob[i : i + 4]
        size = struct.unpack("<I", blob[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(blob):
            _fmt, _ch, sample_rate = struct.unpack("<HHI", blob[i + 8 : i + 16])
            block_align = struct.unpack("<H", blob[i + 20 : i + 22])[0]
        elif cid == b"data":
            n_frames = size // block_align if block_align else None
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None:
        return None
    return {
        "kind": "wav",
        "sample_rate": sample_rate,
        "n_frames": n_frames,
    }


def sniff_media(blob: bytes) -> dict | None:
    """Detect container by magic and parse its header metadata.
    Returns None for unrecognized bytes (caller decides fake/strict)."""
    if not blob:
        return None
    b0 = blob[0]
    if b0 == 0x89:
        return parse_png(blob)
    if b0 == 0x47:  # 'G'
        return parse_gif(blob)
    if b0 == 0xFF:
        return parse_jpeg(blob)
    if b0 == 0x52:  # 'R'
        return parse_wav(blob)
    return None


def build_png(width: int, height: int, payload: bytes = b"") -> bytes:
    """A VALID PNG prelude (signature + IHDR with correct CRC) followed
    by arbitrary payload bytes — enough for any header-level reader."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        _PNG_SIG
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
        + payload
    )


def build_gif(width: int, height: int, payload: bytes = b"") -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00" + payload


def build_jpeg(width: int, height: int, payload: bytes = b"") -> bytes:
    sof0 = struct.pack(">BHHB", 8, height, width, 3) + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    return (
        b"\xff\xd8"
        + b"\xff\xc0"
        + struct.pack(">H", len(sof0) + 2)
        + sof0
        + payload
    )


def build_wav(sample_rate: int, payload: bytes = b"", channels: int = 1,
              bits: int = 16) -> bytes:
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      block_align, bits)
    data_size = len(payload)
    riff_size = 4 + (8 + len(fmt)) + (8 + data_size)
    return (
        b"RIFF" + struct.pack("<I", riff_size) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", data_size) + payload
    )


def _fake_decode(blob: bytes) -> dict:
    """Deterministic stand-in for a real decoder: metadata derived
    arithmetically from the payload bytes (stable across engines)."""
    n = len(blob)
    return {
        "byte_len": n,
        "width": 16 + (n % 240),
        "height": 16 + ((n * 7) % 240),
        "n_frames": 1 + (n % 30),
        "sample_rate": 8000 + (n % 8) * 1000,
    }


def extract_media_metadata(
    df: DataFrame, fake: bool = False, strict: bool = False
) -> DataFrame:
    """mapInPandas metadata extraction over (media_id, kind, blob).

    Recognized container headers (PNG/GIF/JPEG/WAV magics) are REALLY
    parsed — width/height/sample-rate/frame-count come from the bytes,
    and the output ``kind`` is the detected container.  Unrecognized
    blobs keep the declared kind and get, in order of preference:
    ``strict=True`` -> NotImplementedError (where a full PIL/ffmpeg
    decode would run — not in this container); ``fake=True`` -> the
    deterministic arithmetic stand-in metadata; default -> nulls.

    Only the first ~64 header bytes of each blob are touched, so the
    per-row cost is flat regardless of blob size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["blob"].str.len().fillna(0).astype("int64")
            kinds: list = []
            width: list = []
            height: list = []
            frames: list = []
            rate: list = []
            for blob, declared in zip(pdf["blob"], pdf["kind"]):
                raw = bytes(blob) if blob is not None else b""
                meta = sniff_media(raw)
                if meta is None:
                    if strict:
                        raise NotImplementedError(
                            "unrecognized container: full media decode "
                            "needs PIL/ffmpeg — not in this container"
                        )
                    if fake:
                        f = _fake_decode(raw)
                        meta = {
                            "kind": declared,
                            "width": f["width"],
                            "height": f["height"],
                            "n_frames": f["n_frames"],
                            "sample_rate": f["sample_rate"],
                        }
                    else:
                        meta = {"kind": declared}
                kinds.append(meta["kind"])
                width.append(meta.get("width"))
                height.append(meta.get("height"))
                frames.append(meta.get("n_frames"))
                rate.append(meta.get("sample_rate"))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": kinds,
                    "byte_len": n,
                    "width": pd.array(width, dtype="Int32"),
                    "height": pd.array(height, dtype="Int32"),
                    "n_frames": pd.array(frames, dtype="Int32"),
                    "sample_rate": pd.array(rate, dtype="Int32"),
                }
            )

    return df.mapInPandas(run, schema=MEDIA_META_SCHEMA)


_FIXTURE_BUILDERS = ("png", "gif", "jpeg", "wav")


def synthesize_media_fixture(
    df: DataFrame, id_col: str, payload_col: str
) -> DataFrame:
    """Deterministic media fixture: wrap each row's payload bytes in a
    VALID container prelude — png/gif/jpeg/wav round-robin by id, with
    dimensions/sample-rate derived from the id — standing in for real
    media files (none ship with the testdata).  The headers are real
    enough for any header-level reader, including this module's own
    parsers, which is the point: the extract path exercises genuine
    binary parsing, not an arithmetic echo."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            ids = pdf[id_col].astype("int64")
            for mid, payload in zip(ids, pdf[payload_col]):
                data = (
                    payload.encode("utf-8")
                    if isinstance(payload, str)
                    else bytes(payload or b"")
                )
                fmt = _FIXTURE_BUILDERS[mid % 4]
                w = 1 + mid % 1024
                h = 1 + (mid * 3) % 1024
                if fmt == "png":
                    blobs.append(build_png(w, h, data))
                elif fmt == "gif":
                    blobs.append(build_gif(w, h, data))
                elif fmt == "jpeg":
                    blobs.append(build_jpeg(w, h, data))
                else:
                    blobs.append(build_wav(8000 * (1 + mid % 6), data))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "media",
                    "blob": blobs,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, schema="media_id long, kind string, blob binary"
    )


def frame_sample_plan(df: DataFrame, every_nth: int = 10) -> DataFrame:
    """Plan frame sampling for video blobs: explode frame indices
    0..n_frames step every_nth.  (Decode of individual frames is the
    stubbed step; the explode/partition shape is the real one.)"""
    return df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))),
    )
