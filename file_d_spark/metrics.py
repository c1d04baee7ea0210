"""Observability: per-pipeline row counters and streaming progress.

The reference exposes /info action counters and /sample endpoints per
pipeline (/root/reference/pipeline/pipeline.go:959-1033) plus
Prometheus metrics.  Spark-side equivalents:

  * ``observe()`` metrics on the compiled chain — in/out event counts
    per completed action chain, visible in QueryExecutionListener /
    StreamingQueryProgress without perturbing the plan;
  * a StreamingQueryListener collecting per-batch progress (rows/s,
    batch durations, state size) into an in-memory ring, the analogue
    of the reference's info endpoints.
"""

from __future__ import annotations

import collections
import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


#: ring of (message, event) samples written by the debug action —
#: the analogue of the reference's zap-sampled stderr log
DEBUG_LOG: collections.deque = collections.deque(maxlen=1000)

_log = __import__("logging").getLogger("file_d_spark.debug")


def debug_log(message: str, event: dict) -> None:
    DEBUG_LOG.append({"message": message, "event": event})
    _log.info("%s: %s", message, json.dumps(event, default=str))


def observe_events(df: DataFrame, name: str = "fd_pipeline") -> DataFrame:
    """Attach an event counter + byte-size accumulator to the chain."""
    first_col = df.columns[0]
    try:
        return df.observe(
            name,
            F.count(F.lit(1)).alias("events"),
            F.sum(F.octet_length(F.col(first_col).cast("string"))).alias("bytes_probe"),
        )
    except Exception:
        return df  # duplicate observation name etc. — metrics are best effort


class ProgressRing(StreamingQueryListener):
    """Keeps the last N StreamingQueryProgress records per query —
    the /info endpoint analogue.  Attach with
    ``spark.streams.addListener(ring)``."""

    def __init__(self, capacity: int = 64):
        self.capacity = capacity
        self.progress: dict[str, collections.deque] = {}

    # StreamingQueryListener interface
    def onQueryStarted(self, event: Any) -> None:
        self.progress.setdefault(str(event.id), collections.deque(maxlen=self.capacity))

    def onQueryProgress(self, event: Any) -> None:
        p = event.progress
        ring = self.progress.setdefault(
            str(p.id), collections.deque(maxlen=self.capacity)
        )
        ring.append(json.loads(p.json))

    def onQueryIdle(self, event: Any) -> None:
        pass

    def onQueryTerminated(self, event: Any) -> None:
        pass

    # info-endpoint-style accessors
    def last(self, query_id: str) -> dict | None:
        ring = self.progress.get(str(query_id))
        return ring[-1] if ring else None

    def totals(self, query_id: str) -> dict:
        ring = self.progress.get(str(query_id)) or []
        rows = sum(p.get("numInputRows") or 0 for p in ring)
        obs = {}
        for p in ring:
            for name, metrics in (p.get("observedMetrics") or {}).items():
                acc = obs.setdefault(name, {})
                for k, v in metrics.items():
                    if isinstance(v, (int, float)):
                        acc[k] = acc.get(k, 0) + v
        return {"numInputRows": rows, "observedMetrics": obs}
