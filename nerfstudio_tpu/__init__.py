"""nerfstudio_tpu: a TPU-native neural rendering framework (nerfstudio-class).

JAX/XLA/Pallas/pjit compute path; same capability surface as
nerfstudio-project/nerfstudio (see SURVEY.md for the blueprint).
"""

__version__ = "0.1.0"

import os as _os

if "tpu" not in _os.environ.get("JAX_PLATFORMS", "").lower() and _os.environ.get(
    "JAX_PLATFORMS"
):
    # Re-assert an explicit user JAX_PLATFORMS (e.g. "cpu"): site hooks that
    # pre-register a TPU PJRT plugin override the env var with
    # jax.config.update("jax_platforms", ...) at interpreter start, which
    # silently redirects "CPU" runs onto the accelerator (and hangs when the
    # device link is down). Only non-accelerator selections are restored, so
    # default accelerator runs are untouched.
    _plats = _os.environ["JAX_PLATFORMS"]
    if all(p.strip() in ("cpu",) for p in _plats.split(",") if p.strip()):
        import jax as _jax

        _jax.config.update("jax_platforms", _plats)
