"""Dataparser registry: name -> config class (reference: the tyro subcommand
union over dataparsers in method configs + plugins/registry_dataparser.py).

Used by the CLI's ``--dataparser NAME`` switch and by plugin discovery."""

from __future__ import annotations

from typing import Dict, Type

from nerfstudio_tpu.data.dataparsers.base_dataparser import DataParserConfig
from nerfstudio_tpu.data.dataparsers.blender_dataparser import BlenderDataParserConfig
from nerfstudio_tpu.data.dataparsers.colmap_dataparser import ColmapDataParserConfig
from nerfstudio_tpu.data.dataparsers.extra_dataparsers import (
    DNeRFDataParserConfig,
    InstantNGPDataParserConfig,
    MinimalDataParserConfig,
    PhototourismDataParserConfig,
    SDFStudioDataParserConfig,
)
from nerfstudio_tpu.data.dataparsers.nerfstudio_dataparser import NerfstudioDataParserConfig


def _builtin() -> Dict[str, Type[DataParserConfig]]:
    return {
        "nerfstudio-data": NerfstudioDataParserConfig,
        "blender-data": BlenderDataParserConfig,
        "colmap": ColmapDataParserConfig,
        "instant-ngp-data": InstantNGPDataParserConfig,
        "minimal-parser": MinimalDataParserConfig,
        "dnerf-data": DNeRFDataParserConfig,
        "phototourism-data": PhototourismDataParserConfig,
        "sdfstudio-data": SDFStudioDataParserConfig,
    }


def dataparser_registry() -> Dict[str, Type[DataParserConfig]]:
    """Built-ins + extra parsers + plugin-registered parsers."""
    reg = _builtin()
    try:
        from nerfstudio_tpu.data.dataparsers.specialty_dataparsers import SPECIALTY_PARSERS

        reg.update(SPECIALTY_PARSERS)
    except ImportError:
        pass
    try:
        from nerfstudio_tpu.plugins import discover_dataparsers

        reg.update(discover_dataparsers())
    except Exception:
        pass
    # short aliases
    aliases = {name.removesuffix("-data"): cfg for name, cfg in reg.items() if name.endswith("-data")}
    reg.update({k: v for k, v in aliases.items() if k not in reg})
    return reg


def get_dataparser_config(name: str) -> DataParserConfig:
    reg = dataparser_registry()
    if name not in reg:
        raise KeyError(f"unknown dataparser '{name}'; available: {sorted(reg)}")
    return reg[name]()
