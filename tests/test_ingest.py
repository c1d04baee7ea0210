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
        resp = json.load(urllib.request.urlopen(req))
        assert resp == {"ok": True, "events": 10}
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
