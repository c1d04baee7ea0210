"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side contract is real and tested — schema, partition sizing,
UDF signatures, batch shapes.  The actual media decode is STUBBED
(this container has no image/audio libraries): ``decode_image``
raises NotImplementedError unless ``fake=True``, in which case it
produces deterministic metadata derived from the bytes so the
pipeline shape can be exercised end-to-end.

Scale notes: binary blobs dominate row size — ``mapInPandas`` with
small Arrow batches (spark.sql.execution.arrow.maxRecordsPerBatch)
keeps executor memory bounded; repartition by blob-size buckets before
heavy decode stages so one partition never holds only large videos.
"""

from __future__ import annotations

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


def extract_media_metadata(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas metadata extraction over (media_id, kind, blob).

    With fake=False this is where PIL/ffmpeg/librosa would run per
    Arrow batch; the batch iterator shape is exactly what a real
    decoder needs.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode needs PIL/ffmpeg — not in this container"
                )
            # vectorized over the whole Arrow batch (same arithmetic as
            # _fake_decode); a real decoder would loop rows here, but
            # the fake path shouldn't pay per-row Python dict overhead
            n = pdf["blob"].str.len().fillna(0).astype("int64")
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "byte_len": n,
                    "width": 16 + (n % 240),
                    "height": 16 + ((n * 7) % 240),
                    "n_frames": 1 + (n % 30),
                    "sample_rate": 8000 + (n % 8) * 1000,
                }
            )
            yield out

    return df.mapInPandas(run, schema=MEDIA_META_SCHEMA)


def frame_sample_plan(df: DataFrame, every_nth: int = 10) -> DataFrame:
    """Plan frame sampling for video blobs: explode frame indices
    0..n_frames step every_nth.  (Decode of individual frames is the
    stubbed step; the explode/partition shape is the real one.)"""
    return df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))),
    )
