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
