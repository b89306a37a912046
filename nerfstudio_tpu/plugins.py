"""Method / dataparser plugin discovery (reference: nerfstudio/plugins/registry.py:34-79,
registry_dataparser.py, types.py:25).

Third-party packages register methods via the ``nerfstudio_tpu.method_configs``
entry point or the ``NERFSTUDIO_TPU_METHOD_CONFIGS`` env var
(``name=module:attr`` comma-separated), mirroring the reference mechanism."""

from __future__ import annotations

import dataclasses
import importlib
import os
from typing import Any, Dict


@dataclasses.dataclass
class MethodSpecification:
    """(reference plugins/types.py:25-38)"""

    config: Any
    description: str = ""


@dataclasses.dataclass
class DataParserSpecification:
    """(reference plugins/registry_dataparser.py:28-38)"""

    config: Any
    description: str = ""


def _load_entry_points(group: str) -> Dict[str, Any]:
    out = {}
    try:
        from importlib.metadata import entry_points

        eps = entry_points()
        selected = eps.select(group=group) if hasattr(eps, "select") else eps.get(group, [])
        for ep in selected:
            try:
                spec = ep.load()
                cfg = spec.config if hasattr(spec, "config") else spec
                out[ep.name] = cfg
            except Exception as e:  # noqa: BLE001
                print(f"[plugins] failed to load {ep.name}: {e}")
    except Exception:  # noqa: BLE001
        pass
    return out


def _load_env(var: str) -> Dict[str, Any]:
    out = {}
    raw = os.environ.get(var, "")
    for item in filter(None, raw.split(",")):
        name, target = item.split("=", 1)
        module, attr = target.split(":", 1)
        spec = getattr(importlib.import_module(module), attr)
        out[name] = spec.config if hasattr(spec, "config") else spec
    return out


def discover_methods() -> Dict[str, Any]:
    """(reference plugins/registry.py:34-79)"""
    out = _load_entry_points("nerfstudio_tpu.method_configs")
    out.update(_load_env("NERFSTUDIO_TPU_METHOD_CONFIGS"))
    return out


def discover_dataparsers() -> Dict[str, Any]:
    out = _load_entry_points("nerfstudio_tpu.dataparser_configs")
    out.update(_load_env("NERFSTUDIO_TPU_DATAPARSER_CONFIGS"))
    return out
