"""YAML pipeline config -> PipelinePlan.

Mirrors the reference's config shape
(/root/reference/fd/file.d.go:78-120, cfg/config.go): a ``pipelines``
map, each with ``settings``, ``input``, ``actions[]``, ``output``.
The plan is a validated dataclass tree; the *real* query compilation
is Catalyst's, downstream of engine.compile (SURVEY.md §3.1).

Value substitution mirrors the reference's config funcs
(/root/reference/cfg/envs.go, cfg/vault.go, cfg/config.go:148-163):

  ``env(NAME)``        process environment (``\\env(...)`` escapes)
  ``vault(path, key)`` HashiCorp Vault secret (``\\vault(...)`` escapes);
                       enabled by a top-level ``vault: {address, token}``
                       block, served over Vault's HTTP API
  ``${NAME}``          legacy env shorthand kept from round 1
  ``FILED_A_B=x``      env override setting config path ``a.b``
"""

from __future__ import annotations

import json as _json
import os
import re
from dataclasses import dataclass, field
from typing import Any, Callable

import yaml

_ENV_RE = re.compile(r"^\$\{(\w+)\}$")


class VaultClient:
    """Minimal Vault KV reader over the HTTP API (the container has no
    hvac SDK).  Reads ``<address>/v1/<path>`` with X-Vault-Token and
    returns ``data[key]`` (KV v1) or ``data.data[key]`` (KV v2)."""

    def __init__(self, address: str, token: str):
        self.address = address.rstrip("/")
        self.token = token

    def get_secret(self, path: str, key: str) -> str:
        import urllib.request

        req = urllib.request.Request(
            f"{self.address}/v1/{path.lstrip('/')}",
            headers={"X-Vault-Token": self.token},
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            data = _json.loads(resp.read()).get("data") or {}
        if key not in data and isinstance(data.get("data"), dict):
            data = data["data"]  # KV v2 nests the payload
        if key not in data:
            raise KeyError(f"vault secret {path!r} has no key {key!r}")
        return str(data[key])


def _resolve_env(value: Any, secreter: Callable[[str, str], str] | None = None) -> Any:
    if isinstance(value, str):
        if value.startswith("\\env(") or value.startswith("\\vault("):
            return value[1:]  # escape: literal env(...)/vault(...)
        m = re.fullmatch(r"env\((\w+)\)", value)
        if m:
            if m.group(1) not in os.environ:
                raise KeyError(f"config env({m.group(1)}): variable not set")
            return os.environ[m.group(1)]
        m = re.fullmatch(r"vault\(([^,()]+),([^,()]+)\)", value)
        if m:
            if secreter is None:
                raise ValueError(
                    f"config uses {value!r} but no vault block is configured"
                )
            return secreter(m.group(1).strip(), m.group(2).strip())
        m = _ENV_RE.match(value)
        if m:
            return os.environ.get(m.group(1), value)
        return value
    if isinstance(value, dict):
        return {k: _resolve_env(v, secreter) for k, v in value.items()}
    if isinstance(value, list):
        return [_resolve_env(v, secreter) for v in value]
    return value


def _apply_filed_env_overrides(doc: dict) -> dict:
    """``FILED_A_B=x`` sets config path ``a.b``
    (cfg/config.go:148-163, applyEnvs)."""
    for k, v in os.environ.items():
        if not k.startswith("FILED_"):
            continue
        path = k.lower().split("_")[1:]
        cur = doc
        for part in path[:-1]:
            nxt = cur.get(part)
            if not isinstance(nxt, dict):
                nxt = {}
                cur[part] = nxt
            cur = nxt
        if path:
            # numeric-looking overrides become numbers (the reference
            # stores JSON values; YAML would have typed them)
            cur[path[-1]] = int(v) if v.isdigit() else v
    return doc


@dataclass
class PipelineSettings:
    """Engine-level settings (reference: extractPipelineParams,
    /root/reference/fd/util.go:17)."""

    decoder: str = "auto"
    decoder_params: dict[str, Any] = field(default_factory=dict)
    capacity: int = 1024
    stream_field: str = "stream"
    event_timeout: str = "30s"
    max_event_size: int = 0
    cut_off_event_by_limit: bool = False
    cut_off_event_by_limit_field: str = ""
    antispam_threshold: int = 0
    source_name_meta_field: str = ""
    extra: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict[str, Any] | None) -> "PipelineSettings":
        d = dict(d or {})
        known = {k: d.pop(k) for k in list(d) if k in cls.__dataclass_fields__}
        return cls(**known, extra=d)


@dataclass
class PipelinePlan:
    name: str
    settings: PipelineSettings
    input: dict[str, Any]
    actions: list[dict[str, Any]]
    output: dict[str, Any]

    @classmethod
    def from_dict(
        cls,
        name: str,
        d: dict[str, Any],
        secreter: Callable[[str, str], str] | None = None,
    ) -> "PipelinePlan":
        d = _resolve_env(d, secreter)
        return cls(
            name=name,
            settings=PipelineSettings.from_dict(d.get("settings")),
            input=d.get("input") or {"type": "fake"},
            actions=list(d.get("actions") or []),
            output=d.get("output") or {"type": "devnull"},
        )


def load_config(
    source: str, secreter: Callable[[str, str], str] | None = None
) -> dict[str, PipelinePlan]:
    """Parse a YAML document (path or literal string) into plans.
    ``secreter(path, key)`` overrides the vault lookup (tests inject a
    fake; by default a top-level ``vault:`` block builds a
    :class:`VaultClient`)."""
    if "\n" not in source and os.path.exists(source):
        with open(source) as fh:
            doc = yaml.safe_load(fh)
    else:
        doc = yaml.safe_load(source)
    if not isinstance(doc, dict):
        raise ValueError("config must be a mapping")
    doc = _apply_filed_env_overrides(doc)
    vault_cfg = doc.get("vault") or {}
    if secreter is None and vault_cfg.get("address") and vault_cfg.get("token"):
        secreter = VaultClient(vault_cfg["address"], vault_cfg["token"]).get_secret
    pipelines = doc.get("pipelines", doc)
    return {
        name: PipelinePlan.from_dict(name, body or {}, secreter)
        for name, body in pipelines.items()
        if name != "vault"
    }
