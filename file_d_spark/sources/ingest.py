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

import base64
import gzip as _gzip
import io
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


# canned ES-emulation payloads, matching the reference's responses
# (/root/reference/plugin/input/http/elasticsearch.go:7-106): shippers
# probe these endpoints before they agree to send bulk data
_ES_BULK_RESULT = b'{\n   "took": 30,\n   "errors": false,\n   "items": []\n}'
_ES_INFO = (
    b'{"name":"file-d","cluster_name":"file-d",'
    b'"cluster_uuid":"Rz-wj_pkT8a0Y1KXTLmN9g",'
    b'"version":{"number":"6.7.1","build_flavor":"default",'
    b'"build_type":"deb","build_hash":"2f32220",'
    b'"build_date":"2019-04-02T15:59:27.961366Z","build_snapshot":false,'
    b'"lucene_version":"7.7.0",'
    b'"minimum_wire_compatibility_version":"5.6.0",'
    b'"minimum_index_compatibility_version":"5.0.0"},'
    b'"tagline":"You know, for file.d"}'
)
_ES_LICENSE = (
    b'{"license":{"mode":"basic","status":"active","type":"basic",'
    b'"uid":"e76d6ce9-f78c-44ff-8fd5-b5877357d649"}}'
)
_ES_XPACK = (
    b'{"build":{"date":"2019-04-02T15:59:27.961366Z","hash":"2f32220"},'
    b'"features":{},"license":{"mode":"basic","status":"active",'
    b'"type":"basic","uid":"e76d6ce9-f78c-44ff-8fd5-b5877357d649"},'
    b'"tagline":"You know, for nothing"}'
)
_ES_STUB_PREFIXES = (
    "/_ilm/policy",
    "/_index_template",
    "/_template",
    "/_ingest",
    "/_nodes",
)


class HttpIngestServer:
    """HTTP front-end: POST /  (newline-delimited events) -> spool.

    Parity with the reference http input
    (/root/reference/plugin/input/http/http.go:130-230,405-520):

    - ``auth``: AuthConfig-shaped dict — ``strategy`` disabled (default)
      | basic | bearer, ``secrets`` (login->password for basic,
      name->token for bearer), ``header`` override.  Failures reply
      401 "auth failed" and count in ``failed_auth_total``; successes
      count per secret name in ``successful_auth_total`` (the
      reference's http_auth_success_total{secret_name} metric).
    - ``Content-Encoding: gzip`` bodies are decompressed transparently;
      undecodable gzip replies 400 "can't read gzipped body"
      (http.go:498-506).
    - ``emulate_mode='elasticsearch'`` answers the ES handshake
      endpoints (``/`` info, ``/_xpack``, ``/_license``, template/ilm/
      nodes stubs) and serves ``/_bulk``, so ES shippers (filebeat,
      vector) accept the listener as a real cluster
      (elasticsearch.go:7-129).  The bulk response is the reference's
      ``{"took":30,"errors":false,"items":[]}`` in BOTH modes.

    Note: the reference pairs ES-bulk action lines downstream via the
    parse_es action — same here; the spool keeps raw lines.

    Remaining Config surface (http.go:130-176): ``envelope=True``
    wraps each spooled line in a JSON envelope carrying the meta
    information the reference renders per request (login, user IP,
    user agent — ``newMetaInformation``); the http source reads it
    back (``envelope: true``) and meta templates reference
    ``{{ .login }}`` / ``{{ .remote_addr }}`` / ``{{ .user_agent }}``.
    ``cors`` = CORSConfig (``allowed_origins`` with one wildcard,
    ``default_origin``, ``allowed_headers`` / ``exposed_headers``
    comma-joined into the Access-Control-Allow-Headers /
    Access-Control-Exposed-Headers response headers — the reference's
    non-standard "Exposed" spelling mirrored, http.go:393-404);
    ``ca_cert`` + ``private_key`` (path or PEM
    content) switch the listener to TLS, as in the reference.
    """

    def __init__(
        self,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        auth: dict | None = None,
        emulate_mode: str = "no",
        envelope: bool = False,
        cors: dict | None = None,
        ca_cert: str | None = None,
        private_key: str | None = None,
    ):
        if emulate_mode not in ("no", "elasticsearch"):
            raise ValueError(f"http input: bad emulate_mode {emulate_mode!r}")
        auth = auth or {}
        strategy = auth.get("strategy", "disabled")
        if strategy not in ("disabled", "basic", "bearer"):
            raise ValueError(f"http input: bad auth strategy {strategy!r}")
        secrets: dict = auth.get("secrets") or {}
        auth_header = auth.get("header", "Authorization")
        token_names = {v: k for k, v in secrets.items()}  # bearer lookup
        cors = cors or {}
        allowed_origins = list(cors.get("allowed_origins") or [])
        default_origin = cors.get("default_origin", "*")
        allowed_headers = ",".join(cors.get("allowed_headers") or [])
        # the reference emits the non-standard spelling
        # "Access-Control-Exposed-Headers" (http.go:400-404) — mirrored
        exposed_headers = ",".join(cors.get("exposed_headers") or [])

        def origin_for(origin: str) -> str:
            """Reference CORSConfig.getAllowedByOrigin
            (http.go:222-252): exact match or one-wildcard
            prefix/suffix match echoes the origin; otherwise the
            default.  No allowed_origins configured = allow all."""
            if not allowed_origins:
                return origin or default_origin
            for ao in allowed_origins:
                if "*" not in ao:
                    if origin == ao:
                        return origin
                    continue
                pre, _, suf = ao.partition("*")
                if (
                    origin.startswith(pre)
                    and origin.endswith(suf)
                    and len(origin) >= len(pre) + len(suf)
                ):
                    return origin
            return default_origin

        self.writer = _SpoolWriter(spool_dir)
        self.successful_auth_total: dict[str, int] = dict.fromkeys(secrets, 0)
        self.failed_auth_total = 0
        self.bulk_requests_done_total = 0
        self.errors_total = 0
        writer = self.writer
        server = self

        def check_auth(handler) -> tuple[bool, str]:
            if strategy == "disabled":
                return True, ""
            value = handler.headers.get(auth_header, "")
            if strategy == "basic":
                if value.startswith("Basic "):
                    try:
                        raw = base64.b64decode(value[6:]).decode()
                        login, _, password = raw.partition(":")
                    except Exception:
                        return False, ""
                    if secrets.get(login) == password:
                        return True, login
                return False, ""
            # bearer
            if value.startswith("Bearer "):
                name = token_names.get(value[7:])
                if name is not None:
                    return True, name
            return False, ""

        class Handler(BaseHTTPRequestHandler):
            def _reply(self, code: int, payload: bytes, ctype: str = "application/json"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                origin = self.headers.get("Origin")
                if origin is not None or allowed_origins:
                    self.send_header(
                        "Access-Control-Allow-Origin", origin_for(origin or "")
                    )
                self._cors_header_lists()
                if emulate_mode == "elasticsearch":
                    self.send_header("X-Elastic-Product", "Elasticsearch")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def _authed(self) -> bool:
                ok, login = check_auth(self)
                self._login = login
                if ok:
                    if login:
                        server.successful_auth_total[login] += 1
                    return True
                server.failed_auth_total += 1
                server.errors_total += 1
                self._reply(401, b"auth failed\n", "text/plain")
                return False

            def _cors_header_lists(self):
                """allowed_headers / exposed_headers (http.go:393-404):
                comma-joined when configured, omitted otherwise."""
                if allowed_headers:
                    self.send_header(
                        "Access-Control-Allow-Headers", allowed_headers
                    )
                if exposed_headers:
                    self.send_header(
                        "Access-Control-Exposed-Headers", exposed_headers
                    )

            def do_OPTIONS(self):  # noqa: N802  (CORS preflight)
                self.send_response(200)
                self.send_header(
                    "Access-Control-Allow-Methods", "GET,POST,OPTIONS"
                )
                origin = self.headers.get("Origin")
                if origin is not None or allowed_origins:
                    self.send_header(
                        "Access-Control-Allow-Origin", origin_for(origin or "")
                    )
                self._cors_header_lists()
                self.send_header("Content-Length", "0")
                self.end_headers()

            def do_GET(self):  # noqa: N802
                if not self._authed():
                    return
                path = self.path.split("?", 1)[0]
                if emulate_mode == "elasticsearch":
                    if path == "/":
                        return self._reply(200, _ES_INFO)
                    if path == "/_xpack":
                        return self._reply(200, _ES_XPACK)
                    if path == "/_license":
                        return self._reply(200, _ES_LICENSE)
                    if any(path.startswith(p) for p in _ES_STUB_PREFIXES):
                        return self._reply(200, b"{}")
                self._reply(404, b"{}")

            def do_POST(self):  # noqa: N802
                if not self._authed():
                    return
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                if self.headers.get("Content-Encoding") == "gzip":
                    try:
                        body = _gzip.GzipFile(
                            fileobj=io.BytesIO(body)
                        ).read()
                    except Exception:
                        server.errors_total += 1
                        return self._reply(
                            400, b"can't read gzipped body\n", "text/plain"
                        )
                path = self.path.split("?", 1)[0]
                if emulate_mode == "elasticsearch" and path not in ("/", "/_bulk"):
                    if any(path.startswith(p) for p in _ES_STUB_PREFIXES):
                        return self._reply(200, b"{}")
                    return self._reply(404, b"{}")
                if body:
                    if envelope:
                        # one JSON envelope per event line carrying the
                        # reference http input's meta information
                        # (http.go newMetaInformation: login, user ip,
                        # request) — meta templates read these columns
                        import json as _json

                        remote = self.client_address[0]
                        ua = self.headers.get("User-Agent", "")
                        body = b"\n".join(
                            _json.dumps(
                                {
                                    "b": line.decode("utf-8", "replace"),
                                    "login": self._login,
                                    "remote_addr": remote,
                                    "user_agent": ua,
                                }
                            ).encode()
                            for line in body.split(b"\n")
                            if line
                        )
                    writer.write_lines(body)
                server.bulk_requests_done_total += 1
                self._reply(200, _ES_BULK_RESULT)

            def log_message(self, *args):  # silence
                pass

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        if ca_cert and private_key:
            # reference http.go:46-49: both ca_cert and private_key set
            # -> the server accepts connections in TLS mode; each can be
            # a path or the PEM content itself
            import ssl
            import tempfile

            tmp_paths: list[str] = []

            def as_path(v: str, suffix: str) -> str:
                if "\n" not in v and os.path.exists(v):
                    return v
                fh = tempfile.NamedTemporaryFile(
                    "w", suffix=suffix, delete=False
                )
                fh.write(v)
                fh.close()
                tmp_paths.append(fh.name)
                return fh.name

            ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
            try:
                ctx.load_cert_chain(
                    as_path(ca_cert, ".pem"), as_path(private_key, ".key")
                )
            finally:
                # the SSLContext holds the loaded chain in memory — the
                # temp copies would otherwise leave key material in /tmp
                # for the life of the host (ADVICE r7)
                for p in tmp_paths:
                    try:
                        os.unlink(p)
                    except OSError:
                        pass
            self._httpd.socket = ctx.wrap_socket(
                self._httpd.socket, server_side=True
            )
            self.tls = True
        else:
            self.tls = False
        self.port = self._httpd.server_port
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    def start(self) -> "HttpIngestServer":
        self._thread.start()
        return self

    def stop(self):
        self._httpd.shutdown()


class SocketIngestServer:
    """Socket line listener -> spool, ``network`` tcp | udp | unix —
    the reference's socket input modes
    (/root/reference/plugin/input/socket/socket.go:100: ``network``
    options tcp|udp|unix, newline-framed events).

    - tcp: stream listener, one connection = a newline-framed batch.
    - udp: each datagram is a standalone newline-framed batch (the
      syslog-over-UDP feed shape); no framing across datagrams.
    - unix: AF_UNIX stream listener at ``path`` (``address`` exposes
      the bound path; ``port`` is None).
    """

    def __init__(
        self,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        network: str = "tcp",
        path: str | None = None,
    ):
        self.writer = _SpoolWriter(spool_dir)
        writer = self.writer
        self.network = network

        class StreamHandler(socketserver.StreamRequestHandler):
            def handle(self):
                buf = self.rfile.read()
                if buf:
                    writer.write_lines(buf)

        class DatagramHandler(socketserver.DatagramRequestHandler):
            def handle(self):
                buf = self.rfile.read()
                if buf:
                    writer.write_lines(buf)

        if network == "tcp":
            self._server = socketserver.ThreadingTCPServer(
                (host, port), StreamHandler
            )
            self.port = self._server.server_address[1]
            self.address = f"{host}:{self.port}"
        elif network == "udp":
            self._server = socketserver.ThreadingUDPServer(
                (host, port), DatagramHandler
            )
            self.port = self._server.server_address[1]
            self.address = f"{host}:{self.port}"
        elif network == "unix":
            if not path:
                raise ValueError("socket input: network=unix needs a path")
            if os.path.exists(path):
                os.unlink(path)
            self._server = socketserver.ThreadingUnixStreamServer(
                path, StreamHandler
            )
            self.port = None
            self.address = path
        else:
            raise ValueError(f"socket input: bad network {network!r}")
        self._server.daemon_threads = True
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    def start(self) -> "SocketIngestServer":
        self._thread.start()
        return self

    def stop(self):
        self._server.shutdown()
        if self.network == "unix" and os.path.exists(self.address):
            os.unlink(self.address)
