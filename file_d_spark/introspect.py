"""Pipeline introspection: the reference's per-action HTTP control
plane re-expressed for a lazy engine.

file.d serves, per pipeline action, ``/info`` (received / discarded /
passed counters) and ``/sample`` (one event captured before and after
the action), plus the antispam ``/ban_list``
(/root/reference/pipeline/pipeline.go:959-1033).  file.d counts live
traffic; a Spark pipeline is a lazy plan, so the inspector records the
intermediate frame at every action boundary and answers each endpoint
with a bounded job against it (counts and limit-1 samples).  Streaming
counters come from :class:`file_d_spark.metrics.ProgressRing` instead
— observed metrics ride along with each micro-batch.

    insp = PipelineInspector(pipeline, df)
    insp.result                # final frame, same as pipeline.apply(df)
    insp.info(0)               # [{'status': 'received', 'count': ...}, ...]
    insp.sample(0)             # {'before': {...}, 'after': {...}}
    srv = insp.serve(port=0)   # HTTP surface mirroring the reference
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from pyspark.sql import DataFrame

from file_d_spark.actions import build_action


class PipelineInspector:
    def __init__(self, pipeline, df: DataFrame):
        self.plan = pipeline.plan
        self.frames: list[DataFrame] = [df]
        self.action_types: list[str] = []
        cur = df
        for cfg in self.plan.actions:
            cur = build_action(cfg).apply(cur)
            self.action_types.append(cfg.get("type", "?"))
            self.frames.append(cur)
        self.result = cur

    # -- /info ----------------------------------------------------------
    def info(self, action_index: int) -> list[dict[str, Any]]:
        """Counters for one action, reference statuses: received /
        discarded / passed (pipeline.go:967-996)."""
        received = self.frames[action_index].count()
        passed = self.frames[action_index + 1].count()
        return [
            {"status": "received", "count": received},
            {"status": "discarded", "count": max(received - passed, 0)},
            {"status": "passed", "count": passed},
        ]

    # -- /sample --------------------------------------------------------
    def sample(self, action_index: int) -> dict[str, Any]:
        """One event before and after the action — bounded limit(1)
        jobs (the reference watches a live processor; a lazy engine
        re-derives the same view from the recorded frames)."""

        def first_row(df: DataFrame):
            rows = df.limit(1).collect()
            return rows[0].asDict(recursive=True) if rows else None

        return {
            "before": first_row(self.frames[action_index]),
            "after": first_row(self.frames[action_index + 1]),
        }

    # -- /ban_list ------------------------------------------------------
    def ban_list(self) -> list[dict[str, Any]]:
        """Sources currently over an antispam threshold, re-derived
        from that action's input frame with its own counting rules
        (antispammer.go:24-120 exposes the live ban map)."""
        from pyspark.sql import functions as F

        from file_d_spark.actions.throttle import _parse_duration_seconds
        from file_d_spark.fields import get_col_safe, parse_selector

        out: list[dict[str, Any]] = []
        for i, cfg in enumerate(self.plan.actions):
            if cfg.get("type") != "antispam" or int(cfg.get("threshold", 0)) <= 0:
                continue
            df = self.frames[i]
            src_field = cfg.get("source_field", "source_name")
            time_field = cfg.get("time_field", "ts")
            interval_s = _parse_duration_seconds(
                cfg.get("maintenance_interval"), 60.0
            )
            src = get_col_safe(parse_selector(src_field), df.schema).cast("string")
            tcol = get_col_safe(parse_selector(time_field), df.schema)
            ts = F.coalesce(tcol.cast("timestamp"), F.current_timestamp())
            win = F.floor(F.unix_timestamp(ts) / F.lit(int(interval_s)))
            banned = (
                df.select(src.alias("s"), win.alias("w"))
                .groupBy("s", "w")
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") > int(cfg["threshold"]))
                .select("s")
                .distinct()
                .collect()
            )
            out.extend({"action": i, "source": r.s} for r in banned)
        return out

    # -- /pipelines/<name> ----------------------------------------------
    def dump(self) -> str:
        """Pipeline overview as the reference's HTML-pre dump
        (pipeline.go:942-949 writes the streamer and event-pool state;
        the lazy engine's live state is its action chain, per-boundary
        counters and the output schema)."""
        counts = [f.count() for f in self.frames]
        lines = [f"pipeline {self.plan.name}", ""]
        lines.append(f"input events: {counts[0]}")
        for i, typ in enumerate(self.action_types):
            lines.append(
                f"  action {i} {typ}: received={counts[i]} "
                f"passed={counts[i + 1]} "
                f"discarded={max(counts[i] - counts[i + 1], 0)}"
            )
        lines.append(f"output events: {counts[-1]}")
        lines.append("")
        lines.append("output schema:")
        for f in self.result.schema.fields:
            lines.append(f"  {f.name}: {f.dataType.simpleString()}")
        body = "\n".join(lines)
        return f"<html><body><pre><p>{body}</p></pre></body></html>"

    # -- /metrics -------------------------------------------------------
    def prometheus(self) -> str:
        """Prometheus scrape body: pipeline input/output totals plus
        per-action received/discarded/passed counters, all under the
        reference's ``file_d`` namespace (fd/file.d.go:343-345,
        pipeline.go:263-266 for the metric names).  The reference
        counts live traffic; a lazy engine re-derives each sample with
        bounded count jobs at scrape time."""
        from file_d_spark.metrics import PromRegistry

        reg = PromRegistry()
        reg.counter(
            "input_plugin_events_count_total",
            "Count of events on pipeline input",
        )
        reg.counter(
            "output_plugin_events_count_total",
            "Count of events on pipeline output",
        )
        reg.counter(
            "action_events_count_total",
            "Per-action event counts by status",
        )
        name = self.plan.name
        counts = [f.count() for f in self.frames]
        reg.inc(
            "input_plugin_events_count_total", counts[0], pipeline=name
        )
        reg.inc(
            "output_plugin_events_count_total", counts[-1], pipeline=name
        )
        for i, typ in enumerate(self.action_types):
            received, passed = counts[i], counts[i + 1]
            labels = {"pipeline": name, "action": f"{i}_{typ}"}
            reg.inc("action_events_count_total", received,
                    status="received", **labels)
            reg.inc("action_events_count_total", max(received - passed, 0),
                    status="discarded", **labels)
            reg.inc("action_events_count_total", passed,
                    status="passed", **labels)
        self._custom_action_metrics(reg)
        return reg.render()

    def _custom_action_metrics(self, reg) -> None:
        """Per-action custom counters: an action configured with
        ``metric_name`` (+ optional ``metric_labels`` whose values come
        from event fields, absent -> "not_set"; ``metric_skip_status``
        drops the status label and the received series) emits
        ``<metric_name>_events_count_total`` and ``_events_size_total``
        (pipeline.go:683-716 AddAction, processor.go:300-330; size =
        serialized event bytes).  A lazy engine re-derives each label
        combination's received/passed counts from the recorded frames —
        one bounded groupBy per scrape, label cardinality is the
        operator's responsibility like any Prometheus label."""
        from pyspark.sql import functions as F

        from file_d_spark.fields import get_col_safe, parse_selector

        for i, cfg in enumerate(self.plan.actions):
            mname = cfg.get("metric_name")
            if not mname:
                continue
            mlabels = list(cfg.get("metric_labels") or [])
            skip_status = bool(cfg.get("metric_skip_status", False))
            cname = f"{mname}_events_count_total"
            sname = f"{mname}_events_size_total"
            reg.counter(cname, f"how many events processed by action #{i}")
            reg.counter(sname, f"total size of events processed by action #{i}")

            def grouped(df):
                cols = [
                    F.coalesce(
                        get_col_safe(parse_selector(l), df.schema).cast("string"),
                        F.lit("not_set"),
                    ).alias(f"__l{j}__")
                    for j, l in enumerate(mlabels)
                ]
                size = F.octet_length(
                    F.to_json(F.struct(*[F.col(c) for c in df.columns]))
                )
                rows = (
                    df.select(*cols, size.alias("__sz__"))
                    .groupBy(*[f"__l{j}__" for j in range(len(mlabels))])
                    .agg(
                        F.count(F.lit(1)).alias("__n__"),
                        F.sum("__sz__").alias("__s__"),
                    )
                    .collect()
                )
                return {
                    tuple(r[f"__l{j}__"] for j in range(len(mlabels))):
                        (r["__n__"], r["__s__"])
                    for r in rows
                }

            recv = grouped(self.frames[i])
            passed = grouped(self.frames[i + 1])
            for key in sorted(set(recv) | set(passed)):
                lab = dict(zip(mlabels, key))
                rn, rs = recv.get(key, (0, 0))
                pn, ps = passed.get(key, (0, 0))
                if skip_status:
                    # reference: received not recorded, status label
                    # dropped — the counter totals discarded + passed
                    reg.inc(cname, max(rn - pn, 0) + pn, **lab)
                    reg.inc(sname, max(rs - ps, 0) + ps, **lab)
                    continue
                reg.inc(cname, rn, status="received", **lab)
                reg.inc(sname, rs, status="received", **lab)
                reg.inc(cname, max(rn - pn, 0), status="discarded", **lab)
                reg.inc(sname, max(rs - ps, 0), status="discarded", **lab)
                reg.inc(cname, pn, status="passed", **lab)
                reg.inc(sname, ps, status="passed", **lab)

        # per-mask applied metrics (mask.go:256, metrics.go
        # applyMaskMetric): masks carrying applied_metric_name count
        # the events they fired on, labelled from event fields
        # ("not_set" when absent).  The lazy engine reads the fired
        # evidence from the mask's applied_field in the recorded
        # OUTPUT frame, so the metric requires applied_field —
        # enforced at registration (a silent no-metric is worse).
        for i, cfg in enumerate(self.plan.actions):
            if cfg.get("type") != "mask":
                continue
            for m in cfg.get("masks", []):
                aname = m.get("applied_metric_name")
                if not aname:
                    continue
                if not m.get("applied_field"):
                    raise ValueError(
                        "mask applied_metric_name requires applied_field"
                        " (the lazy metrics engine derives the counter"
                        " from it)"
                    )
                alabels = list(m.get("applied_metric_labels") or [])
                reg.counter(aname, "mask applied counter")
                df = self.frames[i + 1]
                cols = [
                    F.coalesce(
                        get_col_safe(parse_selector(l), df.schema).cast(
                            "string"
                        ),
                        F.lit("not_set"),
                    ).alias(f"__l{j}__")
                    for j, l in enumerate(alabels)
                ]
                fired = get_col_safe(
                    parse_selector(m["applied_field"]), df.schema
                )
                rows = (
                    df.filter(fired.isNotNull())
                    .select(*cols)
                    .groupBy(*[f"__l{j}__" for j in range(len(alabels))])
                    .agg(F.count(F.lit(1)).alias("__n__"))
                    .collect()
                )
                for r in rows:
                    lab = {
                        l: r[f"__l{j}__"] for j, l in enumerate(alabels)
                    }
                    reg.inc(aname, r["__n__"], **lab)

    # -- HTTP surface ---------------------------------------------------
    def serve(self, port: int = 0, host: str = "127.0.0.1", resetter=None):
        """Start a daemon thread serving the reference's URL shape:
        /pipelines/<name>/action/<idx>/info | /sample,
        /pipelines/<name>/ban_list, plus the operational surface
        /metrics (prometheus text), /live (always 200) and /ready
        (503 once ``stopping`` is set — fd/file.d.go:388-398).

        ``resetter`` (a :class:`~file_d_spark.sources.tail_file.
        TailResetter`) additionally mounts ``POST
        /pipelines/<name>/0/reset`` — the reference file input's
        runtime offset resetter (resetter.go:34-43, mounted at
        input index 0 per pipeline.go:294-296).  Body: ``{}`` resets
        every tracked file; ``{"inode": N}``, ``{"source_id": N}`` or
        ``{"file": path}`` reset one.  The reset lands at the next
        micro-batch boundary.

        Returns the HTTPServer (bound port in ``server_address[1]``);
        call ``shutdown()`` to stop."""
        insp = self
        name = self.plan.name
        if not hasattr(self, "stopping"):
            self.stopping = False

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                parts = [p for p in self.path.split("/") if p]
                try:
                    if parts == ["live"]:
                        return self._text("")
                    if parts == ["ready"]:
                        if insp.stopping:
                            return self.send_error(503)
                        return self._text("")
                    if parts == ["metrics"]:
                        return self._text(
                            insp.prometheus(),
                            "text/plain; version=0.0.4; charset=utf-8",
                        )
                    if parts == ["log", "level"]:
                        # zap's level handler shape (file.d.go:347:
                        # mux.Handle("/log/level", logger.Level))
                        import logging

                        lvl = logging.getLogger("file_d_spark")
                        return self._json(
                            {"level": logging.getLevelName(
                                lvl.getEffectiveLevel()).lower()}
                        )
                    if parts[:2] == ["pipelines", name]:
                        if parts[2:] == []:
                            # pipeline overview dump (pipeline.go:942-949
                            # renders streamer/event-pool state; the lazy
                            # engine's state is its action chain + frame
                            # counters)
                            return self._text(insp.dump(), "text/html")
                        if parts[2:] == ["ban_list"]:
                            return self._json(insp.ban_list())
                        if len(parts) == 5 and parts[2] == "action":
                            idx = int(parts[3])
                            if parts[4] == "info":
                                return self._json(insp.info(idx))
                            if parts[4] == "sample":
                                return self._json(insp.sample(idx))
                    self.send_error(404)
                except Exception as ex:  # surface errors as JSON
                    self.send_response(500)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(json.dumps({"error": str(ex)}).encode())

            def do_PUT(self):
                parts = [p for p in self.path.split("/") if p]
                if parts == ["log", "level"]:
                    # zap level handler accepts PUT {"level": "..."}
                    import logging

                    try:
                        length = int(self.headers.get("Content-Length", 0))
                        req = json.loads(self.rfile.read(length) or b"{}")
                        level = str(req["level"]).upper()
                        if level not in (
                            "DEBUG", "INFO", "WARNING", "WARN", "ERROR",
                            "CRITICAL", "FATAL",
                        ):
                            raise ValueError(f"unrecognized level: {level}")
                        logging.getLogger("file_d_spark").setLevel(
                            {"WARN": "WARNING", "FATAL": "CRITICAL"}.get(
                                level, level
                            )
                        )
                        return self._json({"level": level.lower()})
                    except Exception as ex:
                        self.send_response(400)
                        self.send_header("Content-Type", "application/json")
                        self.end_headers()
                        self.wfile.write(
                            json.dumps({"error": str(ex)}).encode()
                        )
                        return
                self.send_error(404)

            def do_POST(self):
                parts = [p for p in self.path.split("/") if p]
                if parts == ["api", "v1", "play"]:
                    # the reference's playground endpoint
                    # (playground_handler.go:72-118): 1 MiB body cap,
                    # validation errors -> 400
                    from file_d_spark.playground import parse_request, play

                    try:
                        length = int(self.headers.get("Content-Length", 0))
                        if length > 1 << 20:
                            return self.send_error(400, "body too large")
                        req = parse_request(self.rfile.read(length))
                        spark = insp.frames[0].sparkSession
                        return self._json(play(spark, req))
                    except Exception as ex:
                        self.send_response(400)
                        self.send_header("Content-Type", "application/json")
                        self.end_headers()
                        self.wfile.write(
                            json.dumps({"error": str(ex)}).encode()
                        )
                        return
                if parts == ["pipelines", name, "0", "reset"]:
                    if resetter is None:
                        return self.send_error(
                            404, "no resettable input on this pipeline"
                        )
                    try:
                        length = int(self.headers.get("Content-Length", 0))
                        req = json.loads(self.rfile.read(length) or b"{}")
                        path = resetter.reset(
                            file=req.get("file"),
                            inode=req.get("inode"),
                            source_id=req.get("source_id"),
                        )
                        return self._json({"status": "ok", "request": path})
                    except Exception as ex:
                        self.send_response(400)
                        self.send_header("Content-Type", "application/json")
                        self.end_headers()
                        self.wfile.write(
                            json.dumps({"error": str(ex)}).encode()
                        )
                        return
                self.send_error(404)

            def _json(self, payload):
                body = json.dumps(payload, default=str).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)

            def _text(self, body: str, ctype: str = "text/plain"):
                data = body.encode()
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.end_headers()
                self.wfile.write(data)

        srv = ThreadingHTTPServer((host, port), Handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv
