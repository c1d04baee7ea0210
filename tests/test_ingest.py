"""http/socket ingest front-ends -> spool -> pipeline (batch read)."""

import json
import socket
import time
import urllib.request


def test_http_ingest_to_pipeline(spark, tmp_path):
    from file_d_spark import Pipeline
    from file_d_spark.sources.ingest import HttpIngestServer

    spool = str(tmp_path / "spool")
    srv = HttpIngestServer(spool).start()
    try:
        body = "\n".join(json.dumps({"key": "v", "n": i}) for i in range(10)).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/", data=body, method="POST"
        )
        # the reference replies the ES-bulk result shape in every mode
        # (plugin/input/http/elasticsearch.go:99-103)
        resp = json.load(urllib.request.urlopen(req))
        assert resp == {"took": 30, "errors": False, "items": []}
    finally:
        srv.stop()

    p = Pipeline.from_dict(
        {
            "settings": {
                "decoder": "json",
                "decoder_params": {"schema": "key string, n long"},
            },
            "input": {"type": "http", "spool_dir": spool},
            "actions": [
                {"type": "discard", "do_if": {"op": "int_val_cmp", "field": "n", "cmp_op": "ge", "value": 5}}
            ],
        }
    )
    out = p.run_batch(spark)
    assert out.count() == 5
    assert set(out.columns) >= {"key", "n"}


def test_socket_ingest(spark, tmp_path):
    from file_d_spark import Pipeline
    from file_d_spark.sources.ingest import SocketIngestServer

    spool = str(tmp_path / "spool")
    srv = SocketIngestServer(spool).start()
    try:
        with socket.create_connection(("127.0.0.1", srv.port)) as s:
            s.sendall(b'{"key":"a"}\n{"key":"b"}\n')
        time.sleep(0.3)
    finally:
        srv.stop()

    p = Pipeline.from_dict(
        {
            "settings": {"decoder": "json", "decoder_params": {"schema": "key string"}},
            "input": {"type": "socket", "spool_dir": spool},
        }
    )
    got = sorted(r.key for r in p.run_batch(spark).collect())
    assert got == ["a", "b"]


# ---------------------------------------------------------------------------
# http input: auth / gzip / ES emulation
# (reference plugin/input/http/http.go:156-200 AuthConfig, :498 gzip,
# elasticsearch.go handshake endpoints)
# ---------------------------------------------------------------------------

import gzip as _gzip
import urllib.error


def _post(port, body, headers=None, path="/"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body, method="POST"
    )
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    return urllib.request.urlopen(req)


def test_http_auth_basic(tmp_path):
    import base64

    from file_d_spark.sources.ingest import HttpIngestServer

    spool = str(tmp_path / "spool")
    srv = HttpIngestServer(
        spool,
        auth={"strategy": "basic", "secrets": {"ship": "sekret"}},
    ).start()
    try:
        # no credentials -> 401, nothing spooled
        try:
            _post(srv.port, b'{"a":1}\n')
            assert False, "expected 401"
        except urllib.error.HTTPError as e:
            assert e.code == 401
            assert e.read() == b"auth failed\n"
        # wrong password -> 401
        bad = base64.b64encode(b"ship:wrong").decode()
        try:
            _post(srv.port, b'{"a":1}\n', {"Authorization": f"Basic {bad}"})
            assert False, "expected 401"
        except urllib.error.HTTPError as e:
            assert e.code == 401
        # good credentials -> 200 + spooled
        good = base64.b64encode(b"ship:sekret").decode()
        resp = _post(srv.port, b'{"a":1}\n', {"Authorization": f"Basic {good}"})
        assert resp.status == 200
        assert srv.successful_auth_total == {"ship": 1}
        assert srv.failed_auth_total == 2
    finally:
        srv.stop()
    import os

    files = os.listdir(spool)
    assert len(files) == 1  # only the authed request landed


def test_http_auth_bearer_custom_header(tmp_path):
    from file_d_spark.sources.ingest import HttpIngestServer

    spool = str(tmp_path / "spool")
    srv = HttpIngestServer(
        spool,
        auth={
            "strategy": "bearer",
            "header": "X-Api-Auth",
            "secrets": {"ci-bot": "tok-123"},
        },
    ).start()
    try:
        try:
            _post(srv.port, b"x\n", {"Authorization": "Bearer tok-123"})
            assert False, "expected 401 (wrong header)"
        except urllib.error.HTTPError as e:
            assert e.code == 401
        resp = _post(srv.port, b"x\n", {"X-Api-Auth": "Bearer tok-123"})
        assert resp.status == 200
        assert srv.successful_auth_total == {"ci-bot": 1}
    finally:
        srv.stop()


def test_http_gzip_body(spark, tmp_path):
    import json as _json

    from file_d_spark import Pipeline
    from file_d_spark.sources.ingest import HttpIngestServer

    spool = str(tmp_path / "spool")
    srv = HttpIngestServer(spool).start()
    try:
        body = "\n".join(
            _json.dumps({"k": f"v{i}"}) for i in range(5)
        ).encode()
        resp = _post(
            srv.port,
            _gzip.compress(body),
            {"Content-Encoding": "gzip"},
        )
        assert resp.status == 200
        # broken gzip -> 400, reference error text
        try:
            _post(srv.port, b"\x1f\x8bnot-gzip", {"Content-Encoding": "gzip"})
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert e.read() == b"can't read gzipped body\n"
    finally:
        srv.stop()

    p = Pipeline.from_dict(
        {
            "settings": {
                "decoder": "json",
                "decoder_params": {"schema": "k string"},
            },
            "input": {"type": "http", "spool_dir": spool},
        }
    )
    got = sorted(r.k for r in p.run_batch(spark).collect())
    assert got == [f"v{i}" for i in range(5)]


def test_http_es_emulation_handshake(tmp_path):
    from file_d_spark.sources.ingest import HttpIngestServer

    spool = str(tmp_path / "spool")
    srv = HttpIngestServer(spool, emulate_mode="elasticsearch").start()
    try:
        info = urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/")
        assert info.headers["X-Elastic-Product"] == "Elasticsearch"
        j = json.load(info)
        assert j["version"]["number"] == "6.7.1"
        assert j["tagline"] == "You know, for file.d"
        lic = json.load(
            urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/_license")
        )
        assert lic["license"]["type"] == "basic"
        tmpl = json.load(
            urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/_index_template/foo"
            )
        )
        assert tmpl == {}
        # bulk body lands in the spool; response is the ES result shape
        resp = _post(
            srv.port,
            b'{"index":{"_index":"logs"}}\n{"msg":"hi"}\n',
            path="/_bulk",
        )
        assert json.load(resp) == {"took": 30, "errors": False, "items": []}
        assert srv.bulk_requests_done_total == 1
    finally:
        srv.stop()
    import os

    assert len(os.listdir(spool)) == 1


def test_http_auth_gzip_pipeline_end2end(spark, tmp_path):
    """Gzipped + bearer-authed POSTs through the spool to a green
    pipeline (the VERDICT r6 'done =' bar for the http input)."""
    import json as _json

    from file_d_spark import Pipeline
    from file_d_spark.sources.ingest import HttpIngestServer

    spool = str(tmp_path / "spool")
    srv = HttpIngestServer(
        spool,
        auth={"strategy": "bearer", "secrets": {"ship": "t0k"}},
        emulate_mode="elasticsearch",
    ).start()
    try:
        body = "\n".join(
            _json.dumps({"lvl": "error" if i % 2 else "info", "n": i})
            for i in range(8)
        ).encode()
        resp = _post(
            srv.port,
            _gzip.compress(body),
            {"Content-Encoding": "gzip", "Authorization": "Bearer t0k"},
            path="/_bulk",
        )
        assert resp.status == 200
    finally:
        srv.stop()

    p = Pipeline.from_dict(
        {
            "settings": {
                "decoder": "json",
                "decoder_params": {"schema": "lvl string, n long"},
            },
            "input": {"type": "http", "spool_dir": spool},
            "actions": [
                {
                    "type": "discard",
                    "do_if": {"op": "equal", "field": "lvl", "values": ["info"]},
                }
            ],
        }
    )
    out = p.run_batch(spark)
    assert sorted(r.n for r in out.collect()) == [1, 3, 5, 7]


# ---------------------------------------------------------------------------
# socket input: udp + unix modes (reference socket.go:100 network options)
# ---------------------------------------------------------------------------


def test_socket_udp_ingest(spark, tmp_path):
    from file_d_spark import Pipeline
    from file_d_spark.sources.ingest import SocketIngestServer

    spool = str(tmp_path / "spool")
    srv = SocketIngestServer(spool, network="udp").start()
    try:
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.sendto(b'{"key":"u1"}\n{"key":"u2"}\n', ("127.0.0.1", srv.port))
        s.sendto(b'{"key":"u3"}', ("127.0.0.1", srv.port))  # no trailing NL
        s.close()
        time.sleep(0.5)
    finally:
        srv.stop()

    p = Pipeline.from_dict(
        {
            "settings": {"decoder": "json", "decoder_params": {"schema": "key string"}},
            "input": {"type": "socket", "spool_dir": spool},
        }
    )
    got = sorted(r.key for r in p.run_batch(spark).collect())
    assert got == ["u1", "u2", "u3"]


def test_socket_unix_ingest(spark, tmp_path):
    from file_d_spark import Pipeline
    from file_d_spark.sources.ingest import SocketIngestServer

    spool = str(tmp_path / "spool")
    sock_path = str(tmp_path / "ingest.sock")
    srv = SocketIngestServer(spool, network="unix", path=sock_path).start()
    try:
        assert srv.port is None and srv.address == sock_path
        with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
            s.connect(sock_path)
            s.sendall(b'{"key":"x1"}\n{"key":"x2"}\n')
        time.sleep(0.3)
    finally:
        srv.stop()
    import os

    assert not os.path.exists(sock_path)  # cleaned up on stop

    p = Pipeline.from_dict(
        {
            "settings": {"decoder": "json", "decoder_params": {"schema": "key string"}},
            "input": {"type": "socket", "spool_dir": spool},
        }
    )
    got = sorted(r.key for r in p.run_batch(spark).collect())
    assert got == ["x1", "x2"]


# ---------------------------------------------------------------------------
# http input: meta envelope / CORS / TLS (reference http.go:130-176 Config)
# ---------------------------------------------------------------------------


def test_http_envelope_meta_templates(spark, tmp_path):
    """envelope=True spools per-line JSON envelopes with the request's
    meta information; the http source reads them back and meta
    templates render {{ .login }} / {{ .user_agent }} (the reference's
    newMetaInformation surface)."""
    import base64

    from file_d_spark import Pipeline
    from file_d_spark.sources.ingest import HttpIngestServer

    spool = str(tmp_path / "spool")
    srv = HttpIngestServer(
        spool,
        auth={"strategy": "basic", "secrets": {"shipper1": "pw"}},
        envelope=True,
    ).start()
    try:
        cred = base64.b64encode(b"shipper1:pw").decode()
        resp = _post(
            srv.port,
            b'{"k":"a"}\n{"k":"b"}\n',
            {"Authorization": f"Basic {cred}", "User-Agent": "filebeat/8.1"},
        )
        assert resp.status == 200
    finally:
        srv.stop()

    p = Pipeline.from_dict(
        {
            "settings": {
                "decoder": "json",
                "decoder_params": {"schema": "k string"},
            },
            "input": {
                "type": "http",
                "spool_dir": spool,
                "envelope": True,
                "meta": {
                    "shipper": "{{ .login }}",
                    "agent": "{{ .user_agent }}",
                },
            },
        }
    )
    rows = p.run_batch(spark).collect()
    assert sorted(r.k for r in rows) == ["a", "b"]
    assert all(r.shipper == "shipper1" for r in rows)
    assert all(r.agent == "filebeat/8.1" for r in rows)


def test_http_cors_origin_matching(tmp_path):
    """CORSConfig semantics (http.go getAllowedByOrigin): exact or
    one-wildcard origins echo back; anything else gets the default."""
    import urllib.request

    from file_d_spark.sources.ingest import HttpIngestServer

    spool = str(tmp_path / "spool")
    srv = HttpIngestServer(
        spool,
        cors={
            "allowed_origins": ["http://*.example.com", "http://ok.io"],
            "default_origin": "https://fallback",
        },
    ).start()
    try:
        def origin_header(origin):
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/", data=b"x\n", method="POST"
            )
            req.add_header("Origin", origin)
            return urllib.request.urlopen(req).headers.get(
                "Access-Control-Allow-Origin"
            )

        assert origin_header("http://a.example.com") == "http://a.example.com"
        assert origin_header("http://ok.io") == "http://ok.io"
        assert origin_header("http://evil.com") == "https://fallback"
    finally:
        srv.stop()


def test_http_cors_header_lists(tmp_path):
    """allowed_headers / exposed_headers (http.go:393-404): comma-joined
    into Access-Control-Allow-Headers and the reference's non-standard
    Access-Control-Exposed-Headers, on POST responses AND the OPTIONS
    preflight; omitted entirely when unconfigured."""
    import urllib.request

    from file_d_spark.sources.ingest import HttpIngestServer

    spool = str(tmp_path / "spool")
    srv = HttpIngestServer(
        spool,
        cors={
            "allowed_headers": ["Content-Type", "X-Token"],
            "exposed_headers": ["X-Trace-Id"],
        },
    ).start()
    try:
        for method, data in (("POST", b"x\n"), ("OPTIONS", None)):
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/", data=data, method=method
            )
            hdrs = urllib.request.urlopen(req).headers
            assert hdrs.get("Access-Control-Allow-Headers") == "Content-Type,X-Token"
            assert hdrs.get("Access-Control-Exposed-Headers") == "X-Trace-Id"
    finally:
        srv.stop()

    srv2 = HttpIngestServer(str(tmp_path / "spool2")).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv2.port}/", data=b"x\n", method="POST"
        )
        hdrs = urllib.request.urlopen(req).headers
        assert hdrs.get("Access-Control-Allow-Headers") is None
        assert hdrs.get("Access-Control-Exposed-Headers") is None
    finally:
        srv2.stop()


def test_http_tls_listener(tmp_path):
    """ca_cert + private_key switch the listener to TLS (http.go:46-49);
    a TLS client round-trips a body into the spool."""
    import os
    import ssl
    import subprocess
    import urllib.request

    from file_d_spark.sources.ingest import HttpIngestServer

    cert = str(tmp_path / "cert.pem")
    key = str(tmp_path / "key.pem")
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048",
            "-keyout", key, "-out", cert, "-days", "1", "-nodes",
            "-subj", "/CN=127.0.0.1",
        ],
        check=True,
        capture_output=True,
    )
    spool = str(tmp_path / "spool")
    srv = HttpIngestServer(spool, ca_cert=cert, private_key=key).start()
    try:
        assert srv.tls
        ctx = ssl.create_default_context()
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
        req = urllib.request.Request(
            f"https://127.0.0.1:{srv.port}/", data=b'{"s":1}\n', method="POST"
        )
        resp = json.load(urllib.request.urlopen(req, context=ctx))
        assert resp["errors"] is False
    finally:
        srv.stop()
    assert len(os.listdir(spool)) == 1

    # PEM CONTENT (not paths) also works — and the temp copies written
    # for load_cert_chain are deleted immediately after loading, so no
    # key material persists in the temp dir (ADVICE r7)
    import glob
    import tempfile

    before = set(glob.glob(os.path.join(tempfile.gettempdir(), "*.key")))
    srv2 = HttpIngestServer(
        str(tmp_path / "spool2"),
        ca_cert=open(cert).read(),
        private_key=open(key).read(),
    ).start()
    try:
        assert srv2.tls
        req = urllib.request.Request(
            f"https://127.0.0.1:{srv2.port}/", data=b'{"s":2}\n', method="POST"
        )
        resp = json.load(urllib.request.urlopen(req, context=ctx))
        assert resp["errors"] is False
    finally:
        srv2.stop()
    after = set(glob.glob(os.path.join(tempfile.gettempdir(), "*.key")))
    assert after <= before, f"leaked key files: {after - before}"
