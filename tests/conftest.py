"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Mirrors the reference's CPU-only CI strategy (reference
.github/workflows/core_code_checks.yml) but goes further: multi-chip sharding
tests run against 8 virtual CPU devices (SURVEY.md §4).

Note: the environment's sitecustomize may pre-register a TPU PJRT plugin and
force ``jax_platforms``; we override via jax.config *after* import (backends
initialize lazily, so this wins as long as no array op ran yet).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
