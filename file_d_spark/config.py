"""YAML pipeline config -> PipelinePlan.

Mirrors the reference's config shape
(/root/reference/fd/file.d.go:78-120, cfg/config.go): a ``pipelines``
map, each with ``settings``, ``input``, ``actions[]``, ``output``.
The plan is a validated dataclass tree; the *real* query compilation
is Catalyst's, downstream of engine.compile (SURVEY.md §3.1).

Env-var substitution: values like ``${ENV_NAME}`` in the YAML resolve
from the process environment (the reference supports env/vault
substitution in cfg/).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Any

import yaml

_ENV_RE = re.compile(r"^\$\{(\w+)\}$")


def _resolve_env(value: Any) -> Any:
    if isinstance(value, str):
        m = _ENV_RE.match(value)
        if m:
            return os.environ.get(m.group(1), value)
        return value
    if isinstance(value, dict):
        return {k: _resolve_env(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_resolve_env(v) for v in value]
    return value


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
    def from_dict(cls, name: str, d: dict[str, Any]) -> "PipelinePlan":
        d = _resolve_env(d)
        return cls(
            name=name,
            settings=PipelineSettings.from_dict(d.get("settings")),
            input=d.get("input") or {"type": "fake"},
            actions=list(d.get("actions") or []),
            output=d.get("output") or {"type": "devnull"},
        )


def load_config(source: str) -> dict[str, PipelinePlan]:
    """Parse a YAML document (path or literal string) into plans."""
    if "\n" not in source and os.path.exists(source):
        with open(source) as fh:
            doc = yaml.safe_load(fh)
    else:
        doc = yaml.safe_load(source)
    if not isinstance(doc, dict):
        raise ValueError("config must be a mapping")
    pipelines = doc.get("pipelines", doc)
    return {
        name: PipelinePlan.from_dict(name, body or {})
        for name, body in pipelines.items()
    }
