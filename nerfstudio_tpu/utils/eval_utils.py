"""Eval setup: load a saved run for evaluation/rendering (reference:
nerfstudio/utils/eval_utils.py:35-113).

Loads config.pkl + the latest orbax checkpoint and rebuilds the pipeline."""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Optional, Tuple


def eval_setup(config_path: Path, load_step: Optional[int] = None):
    """config.yml/.pkl path or run dir -> (config, pipeline, state)."""
    config_path = Path(config_path)
    if config_path.is_dir():
        base = config_path
    else:
        base = config_path.parent
    with open(base / "config.pkl", "rb") as f:
        config = pickle.load(f)

    from nerfstudio_tpu.models.splatfacto import SplatfactoModelConfig

    ckpt_dir = base / "nerfstudio_models"
    if isinstance(config.model, SplatfactoModelConfig):
        from nerfstudio_tpu.pipelines.splat_pipeline import build_splat_pipeline

        pipeline, state = build_splat_pipeline(config)
        import orbax.checkpoint as ocp

        mgr = ocp.CheckpointManager(ckpt_dir.absolute())
        step = load_step or mgr.latest_step()
        if step is not None:
            template = {
                "params": state.params,
                "opt_state": state.opt_state,
                "aux": state.aux,
                "step": state.step,
            }
            try:
                restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
                state = state.replace(
                    params=restored["params"],
                    opt_state=restored["opt_state"],
                    aux=restored["aux"],
                    step=restored["step"],
                )
            except ValueError:
                # legacy final-only checkpoint layout {params, aux_alive, step}
                template = {
                    "params": state.params,
                    "aux_alive": state.aux.alive,
                    "step": state.step,
                }
                restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
                state = state.replace(
                    params=restored["params"],
                    aux=state.aux.replace(alive=restored["aux_alive"]),
                    step=restored["step"],
                )
        return config, pipeline, state

    from nerfstudio_tpu.pipelines.factory import build_pipeline

    pipeline, state, config = build_pipeline(config, use_mesh=False)
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(ckpt_dir.absolute())
    step = load_step or mgr.latest_step()
    if step is not None:
        template = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        if state.aux is not None:
            template["aux"] = state.aux
        try:
            restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
        except ValueError:
            if "aux" not in template:
                raise
            # old checkpoint without aux: restore the rest, keep fresh aux
            template.pop("aux")
            restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
        state = state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=restored["step"],
            aux=restored.get("aux", state.aux),
        )
    return config, pipeline, state
