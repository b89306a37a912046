"""nst-train entrypoint (reference: nerfstudio/scripts/train.py).

Usage: nst-train METHOD [--data PATH] [--dotted.config.overrides ...]

The reference's multi-process DDP launcher (train.py:90-226) has no TPU
analog: JAX is single-controller SPMD — the train step is jitted over a
device mesh (parallel/mesh.py) and multi-host runs initialize
``jax.distributed`` before calling main()."""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path

import yaml


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    # multi-host (DCN) training: one controller per host, SPMD over the
    # global mesh (replaces the reference's mp.spawn/DDP launcher,
    # reference scripts/train.py:161-226). On TPU pods
    # jax.distributed.initialize() auto-discovers the coordinator.
    import os

    if os.environ.get("NST_MULTIHOST", "0") == "1":
        import jax

        jax.distributed.initialize(
            coordinator_address=os.environ.get("NST_COORDINATOR"),
            num_processes=(
                int(os.environ["NST_NUM_PROCESSES"])
                if "NST_NUM_PROCESSES" in os.environ
                else None
            ),
            process_id=(
                int(os.environ["NST_PROCESS_ID"])
                if "NST_PROCESS_ID" in os.environ
                else None
            ),
        )
    from nerfstudio_tpu.configs.cli import apply_overrides, describe
    from nerfstudio_tpu.configs.method_configs import descriptions, get_method, method_configs

    if not argv or argv[0] in ("-h", "--help"):
        print("usage: nst-train METHOD [--data PATH] [--config.overrides ...]\n")
        print("methods:")
        for name in sorted(method_configs):
            print(f"  {name:22s} {descriptions.get(name, '')}")
        return
    method = argv[0]
    config = get_method(method)
    # dataparser switch: `nst-train METHOD --dataparser blender-data ...`
    # (reference: tyro dataparser subcommand union)
    argv = argv[1:]
    if "--dataparser" in argv:
        i = argv.index("--dataparser")
        from nerfstudio_tpu.data.dataparsers.registry import get_dataparser_config

        config.dataparser = get_dataparser_config(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    rest = apply_overrides(config, argv)
    if rest and rest[0] in ("-h", "--help"):
        print("\n".join(describe(config)))
        return
    if rest:
        raise SystemExit(f"unrecognized arguments: {rest}")

    if config.trainer.experiment_name is None:
        config.trainer.experiment_name = (
            Path(config.data).name if config.data is not None else "unnamed"
        )

    from nerfstudio_tpu.models.generfacto import GenerfactoModelConfig
    from nerfstudio_tpu.models.splatfacto import SplatfactoModelConfig

    if isinstance(config.model, GenerfactoModelConfig):
        from nerfstudio_tpu.pipelines.generative_pipeline import train_generfacto

        base = config.trainer.get_base_dir()
        config.trainer.timestamp = base.name
        base.mkdir(parents=True, exist_ok=True)
        save_config(config, base)
        print(f"config saved to {base / 'config.yml'}")
        train_generfacto(config)
        return

    if isinstance(config.model, SplatfactoModelConfig):
        from nerfstudio_tpu.pipelines.splat_pipeline import train_splat

        base = config.trainer.get_base_dir()
        config.trainer.timestamp = base.name  # freeze timestamp
        base.mkdir(parents=True, exist_ok=True)
        save_config(config, base)
        print(f"config saved to {base / 'config.yml'}")
        train_splat(config)
        return

    from nerfstudio_tpu.pipelines.factory import build_trainer

    trainer = build_trainer(config)
    base = trainer.base_dir
    base.mkdir(parents=True, exist_ok=True)
    save_config(config, base)
    print(f"config saved to {base / 'config.yml'}")
    trainer.train()


def _to_plain(obj):
    """Tolerant config -> plain-types conversion for yaml."""
    import enum

    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: _to_plain(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, dict):
        return {str(k): _to_plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_plain(v) for v in obj]
    if isinstance(obj, enum.Enum):
        return obj.name
    if isinstance(obj, Path):
        return str(obj)
    if isinstance(obj, type):
        return f"{obj.__module__}.{obj.__qualname__}"
    if isinstance(obj, (int, float, str, bool)) or obj is None:
        return obj
    return repr(obj)


def save_config(config, base: Path) -> None:
    """Persist config: yaml (human) + pickle (exact resume/eval),
    mirroring the reference's config.yml (engine/trainer.py:236-239)."""
    import pickle

    with open(base / "config.yml", "w", encoding="utf-8") as f:
        yaml.safe_dump(_to_plain(config), f, default_flow_style=False)
    with open(base / "config.pkl", "wb") as f:
        pickle.dump(config, f)


def entrypoint():
    main()


if __name__ == "__main__":
    entrypoint()
