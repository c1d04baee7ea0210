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


# ---------------------------------------------------------------------------
# Prometheus text exposition
# ---------------------------------------------------------------------------

PROM_NAMESPACE = "file_d"  # reference: metric/controller.go:11


def _escape_label(v: str) -> str:
    return str(v).replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


class PromRegistry:
    """Minimal Prometheus registry rendering text exposition format
    0.0.4 — the scrape surface an operator points monitoring at
    (reference: fd/file.d.go:343-345 mounts promhttp on /metrics; all
    metrics live under the ``file_d`` namespace,
    metric/controller.go:11,63)."""

    def __init__(self, namespace: str = PROM_NAMESPACE):
        self.namespace = namespace
        # name -> (help, type, {labels_tuple: value}); insertion order
        self._metrics: dict[str, tuple[str, str, dict]] = {}

    def _full(self, name: str) -> str:
        return f"{self.namespace}_{name}" if self.namespace else name

    def counter(self, name: str, help_text: str = "") -> None:
        self._metrics.setdefault(self._full(name), (help_text, "counter", {}))

    def gauge(self, name: str, help_text: str = "") -> None:
        self._metrics.setdefault(self._full(name), (help_text, "gauge", {}))

    def inc(self, name: str, value: float = 1, /, **labels) -> None:
        full = self._full(name)
        if full not in self._metrics:
            self.counter(name)
        series = self._metrics[full][2]
        key = tuple(sorted(labels.items()))
        series[key] = series.get(key, 0) + value

    def set(self, name: str, value: float, /, **labels) -> None:
        full = self._full(name)
        if full not in self._metrics:
            self.gauge(name)
        self._metrics[full][2][tuple(sorted(labels.items()))] = value

    def render(self) -> str:
        out = []
        for name, (help_text, typ, series) in self._metrics.items():
            if help_text:
                out.append(f"# HELP {name} {help_text}")
            out.append(f"# TYPE {name} {typ}")
            for key, value in sorted(series.items()):
                label_s = ",".join(
                    f'{k}="{_escape_label(v)}"' for k, v in key
                )
                v = int(value) if float(value).is_integer() else value
                out.append(f"{name}{{{label_s}}} {v}" if label_s else f"{name} {v}")
        return "\n".join(out) + "\n"


def parse_prometheus_text(text: str) -> dict[tuple[str, tuple], float]:
    """Tiny scrape parser for tests: (metric, ((label, value), ...)) ->
    sample value."""
    import re

    out: dict[tuple[str, tuple], float] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = re.fullmatch(r"([a-zA-Z_:][\w:]*)(?:\{(.*)\})?\s+(\S+)", line)
        if not m:
            continue
        labels = tuple(
            sorted(
                (lm.group(1), lm.group(2))
                for lm in re.finditer(r'(\w+)="((?:[^"\\]|\\.)*)"', m.group(2) or "")
            )
        )
        out[(m.group(1), labels)] = float(m.group(3))
    return out
