"""Push-style inputs (http / tcp socket) for the streaming engine.

The reference's http input is an HTTP *server* ingesting newline-
delimited bodies (optionally emulating the ES ``_bulk`` protocol)
(/root/reference/plugin/input/http/http.go:130); its socket input is a
TCP/UDP listener (/root/reference/plugin/input/socket/socket.go:96).

A Spark cluster cannot host an arbitrary long-lived listener inside a
source task, so the idiomatic mapping is a tiny ingest front-end that
appends request bodies to a spool directory, paired with Spark's file
streaming source reading that spool (exactly-once via checkpoint +
file-listing semantics; the spool is the WAL).  Kafka-fronting is the
production-scale variant — this module is the dependency-free one.
"""

from __future__ import annotations

import os
import socketserver
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class _SpoolWriter:
    """Appends line batches to a rolling spool file; atomic-ish rename
    so the file source never lists half-written files."""

    def __init__(self, spool_dir: str, roll_bytes: int = 16 * 1024 * 1024):
        self.spool_dir = spool_dir
        self.roll_bytes = roll_bytes
        self._lock = threading.Lock()
        self._seq = 0
        os.makedirs(spool_dir, exist_ok=True)

    def write_lines(self, data: bytes) -> int:
        if not data.endswith(b"\n"):
            data += b"\n"
        with self._lock:
            self._seq += 1
            tmp = os.path.join(self.spool_dir, f".tmp-{os.getpid()}-{self._seq}")
            final = os.path.join(
                self.spool_dir, f"batch-{time.time_ns()}-{self._seq}.ndjson"
            )
            with open(tmp, "wb") as fh:
                fh.write(data)
            os.rename(tmp, final)
        return data.count(b"\n")


class HttpIngestServer:
    """HTTP front-end: POST /  (newline-delimited events) -> spool.
    Also accepts ES-bulk-shaped bodies (the parse_es action downstream
    handles the pairing, as in the reference)."""

    def __init__(self, spool_dir: str, host: str = "127.0.0.1", port: int = 0):
        self.writer = _SpoolWriter(spool_dir)
        writer = self.writer

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                n = writer.write_lines(body)
                self.send_response(200)
                payload = b'{"ok":true,"events":%d}' % n
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def log_message(self, *args):  # silence
                pass

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_port
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    def start(self) -> "HttpIngestServer":
        self._thread.start()
        return self

    def stop(self):
        self._httpd.shutdown()


class SocketIngestServer:
    """TCP line listener -> spool (newline-framed, like the reference's
    socket input)."""

    def __init__(self, spool_dir: str, host: str = "127.0.0.1", port: int = 0):
        self.writer = _SpoolWriter(spool_dir)
        writer = self.writer

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                buf = self.rfile.read()
                if buf:
                    writer.write_lines(buf)

        self._server = socketserver.ThreadingTCPServer((host, port), Handler)
        self._server.daemon_threads = True
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    def start(self) -> "SocketIngestServer":
        self._thread.start()
        return self

    def stop(self):
        self._server.shutdown()
