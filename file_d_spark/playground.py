"""Playground: run an inline actions config against inline JSON events.

The reference ships an HTTP playground
(/root/reference/playground/playground_handler.go): ``POST
/api/v1/play`` with ``{"events": [...], "actions": [...]}`` runs the
actions over the events and answers ``{"result": [...], "stdout":
"...", "metrics": "..."}``.  Same surface here, executed by the batch
engine: events become a schema-inferred DataFrame, the actions a
:class:`~file_d_spark.Pipeline`, the response the serialized output
rows plus the per-action prometheus counters.

Validation matches the reference (playground_handler.go:104-107):
1-32 events, at most 64 actions; ``actions_type: yaml`` accepts the
actions list as a YAML string (playground_handler.go:136-148).

Known divergence: the batch engine is typed, so the event schema is
INFERRED over the whole batch — a field present in one event and
absent in another serializes as an explicit ``null`` for the event
that lacks it (the reference's dynamic JSON would omit it).
"""

from __future__ import annotations

import io
import json
import logging
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

MAX_EVENTS = 32
MAX_ACTIONS = 64


def parse_request(raw: bytes | str) -> dict[str, Any]:
    """unmarshalRequest twin: JSON body; ``actions`` either a JSON list
    or (``actions_type: yaml``) a YAML document string."""
    req = json.loads(raw)
    if not isinstance(req, dict):
        raise ValueError("request body must be a JSON object")
    actions = req.get("actions", [])
    if req.get("actions_type") == "yaml":
        import yaml

        if not isinstance(actions, str):
            raise ValueError("actions_type yaml needs actions as a string")
        actions = yaml.safe_load(actions) or []
    if not isinstance(actions, list):
        raise ValueError("actions must be a list")
    events = req.get("events", [])
    if not isinstance(events, list):
        raise ValueError("events must be a list")
    return {
        "events": events,
        "actions": actions,
        "debug": bool(req.get("debug", False)),
    }


def play(spark: SparkSession, req: dict[str, Any]) -> dict[str, Any]:
    """Run ``req["actions"]`` over ``req["events"]``; returns the
    reference's PlayResponse shape (result / stdout / metrics)."""
    from file_d_spark import Pipeline
    from file_d_spark.introspect import PipelineInspector

    events = req.get("events", [])
    actions = req.get("actions", [])
    if not 1 <= len(events) <= MAX_EVENTS or len(actions) > MAX_ACTIONS:
        raise ValueError(
            "validate error: events count must be in range [1, 32] "
            "and actions count [0, 64]"
        )

    event_strs = [
        e if isinstance(e, str) else json.dumps(e) for e in events
    ]
    df = spark.read.json(
        spark.sparkContext.parallelize(event_strs, 1)
    )
    if "_corrupt_record" in df.columns:
        bad = df.filter(F.col("_corrupt_record").isNotNull()).count()
        if bad:
            raise ValueError(f"{bad} events are not valid JSON objects")
        df = df.drop("_corrupt_record")

    # capture engine logs as the reference captures pipeline stdout
    log_buf = io.StringIO()
    handler = logging.StreamHandler(log_buf)
    handler.setLevel(logging.DEBUG)
    logger = logging.getLogger("file_d_spark")
    old_level = logger.level
    logger.addHandler(handler)
    if req.get("debug"):
        logger.setLevel(logging.DEBUG)
    try:
        pipeline = Pipeline.from_dict(
            {"name": "playground", "actions": actions}
        )
        insp = PipelineInspector(pipeline, df)
        out = insp.result
        rows = [
            json.loads(r.j)
            for r in out.select(
                F.to_json(
                    F.struct(*[F.col(c) for c in out.columns]),
                    {"ignoreNullFields": "false"},
                ).alias("j")
            ).collect()
        ]
        metrics = insp.prometheus()
    finally:
        logger.removeHandler(handler)
        logger.setLevel(old_level)

    return {
        "result": rows,
        "stdout": log_buf.getvalue(),
        "metrics": metrics,
    }
