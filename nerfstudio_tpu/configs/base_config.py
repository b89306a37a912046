"""Config system (reference: nerfstudio/configs/base_config.py).

Typed dataclasses end-to-end with the ``_target``/``setup()`` instantiation
pattern (reference base_config.py:46-53). The CLI layer
(configs/cli.py) turns any dataclass tree into dotted flags — the tyro
replacement."""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, Optional, Type


@dataclasses.dataclass
class InstantiateConfig:
    """(reference base_config.py:46-53)"""

    _target: Type = dataclasses.field(default=None)  # type: ignore[assignment]

    def setup(self, **kwargs) -> Any:
        return self._target(self, **kwargs)


@dataclasses.dataclass
class MachineConfig:
    """(reference base_config.py:57-72). On TPU, process/device topology comes
    from the JAX runtime; seed is the only knob that remains meaningful."""

    seed: int = 42
    num_devices: Optional[int] = None  # None = all local devices
    num_machines: int = 1
    machine_rank: int = 0
    dist_url: str = "auto"


@dataclasses.dataclass
class LoggingConfig:
    """(reference base_config.py:104-121)"""

    steps_per_log: int = 10
    max_buffer_size: int = 20
    profiler: str = "none"  # none | basic | xla


@dataclasses.dataclass
class ViewerConfig:
    """(reference base_config.py:125-153)"""

    websocket_port: Optional[int] = None
    websocket_host: str = "0.0.0.0"
    num_rays_per_chunk: int = 32768
    max_num_display_images: int = 512
    quit_on_train_completion: bool = False
