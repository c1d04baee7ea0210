"""Config value substitution: env()/vault() funcs, escapes, FILED_*
overrides (/root/reference/cfg/envs.go, cfg/vault.go,
cfg/config.go:148-163)."""

import os

import pytest

from file_d_spark.config import load_config


def test_env_func(monkeypatch):
    monkeypatch.setenv("MY_TOPIC", "logs")
    plans = load_config(
        """
pipelines:
  p:
    input: {type: kafka, topics: [env(MY_TOPIC)]}
"""
    )
    assert plans["p"].input["topics"] == ["logs"]


def test_env_func_missing_raises():
    with pytest.raises(KeyError):
        load_config("pipelines:\n  p:\n    input: {type: file, path: env(NOPE_MISSING)}\n")


def test_env_escape():
    plans = load_config(
        'pipelines:\n  p:\n    input: {type: file, path: "\\\\env(literal)"}\n'
    )
    assert plans["p"].input["path"] == "env(literal)"


def test_vault_func_injected():
    def fake_secret(path, key):
        assert (path, key) == ("secret/kafka", "password")
        return "s3cr3t"

    plans = load_config(
        """
pipelines:
  p:
    input: {type: kafka, sasl_password: "vault(secret/kafka, password)"}
""",
        secreter=fake_secret,
    )
    assert plans["p"].input["sasl_password"] == "s3cr3t"


def test_vault_without_block_raises():
    with pytest.raises(ValueError):
        load_config(
            'pipelines:\n  p:\n    input: {type: kafka, sasl_password: "vault(a, b)"}\n'
        )


def test_filed_env_override(monkeypatch):
    monkeypatch.setenv("FILED_PIPELINES_P_SETTINGS_CAPACITY", "77")
    plans = load_config("pipelines:\n  p:\n    input: {type: fake}\n")
    assert plans["p"].settings.capacity == 77


def test_legacy_dollar_brace(monkeypatch):
    monkeypatch.setenv("LEGACY_PATH", "/data")
    plans = load_config(
        'pipelines:\n  p:\n    input: {type: file, path: "${LEGACY_PATH}"}\n'
    )
    assert plans["p"].input["path"] == "/data"

def _vault_server(secrets):
    """Tiny in-process Vault KV API: GET /v1/<path> -> {"data": ...}."""
    import http.server
    import json
    import threading

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            path = self.path.lstrip("/").removeprefix("v1/")
            if self.headers.get("X-Vault-Token") != "tok123":
                self.send_response(403)
                self.end_headers()
                return
            if path not in secrets:
                self.send_response(404)
                self.end_headers()
                return
            body = json.dumps({"data": secrets[path]}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def test_vault_http_client_kv1_and_kv2():
    """VaultClient over a real HTTP round-trip (KV v1 flat data and
    KV v2 nested data.data), wired through a config vault: block."""
    srv = _vault_server(
        {
            "secret/kafka": {"password": "pw-v1"},
            "secret/data/pg": {"data": {"dsn": "pg://host/db"}, "metadata": {}},
        }
    )
    try:
        addr = f"http://127.0.0.1:{srv.server_address[1]}"
        plans = load_config(
            f"""
vault: {{address: {addr}, token: tok123}}
pipelines:
  p:
    input: {{type: kafka, sasl_password: "vault(secret/kafka, password)"}}
    output: {{type: postgres, conn_string: "vault(secret/data/pg, dsn)"}}
"""
        )
        assert plans["p"].input["sasl_password"] == "pw-v1"
        assert plans["p"].output["conn_string"] == "pg://host/db"
    finally:
        srv.shutdown()


def test_vault_http_client_missing_key():
    from file_d_spark.config import VaultClient

    srv = _vault_server({"secret/kafka": {"password": "x"}})
    try:
        addr = f"http://127.0.0.1:{srv.server_address[1]}"
        with pytest.raises(KeyError):
            VaultClient(addr, "tok123").get_secret("secret/kafka", "absent")
    finally:
        srv.shutdown()
