"""Shell completion installer (reference: scripts/completions/install.py).

Generates bash/zsh completion for the nst-* entry points (methods, dataparsers,
export/process subcommands) and installs it into the user's rc file."""

from __future__ import annotations

import argparse
from pathlib import Path

COMMANDS = {
    "nst-train": None,  # completed with method names + --dataparser
    "nst-eval": [],
    "nst-render": ["camera-path", "interpolate", "spiral", "dataset"],
    "nst-export": [
        "pointcloud", "gaussian-splat", "cameras", "marching-cubes",
        "tsdf", "poisson", "texture-mesh",
    ],
    "nst-process-data": [
        "images", "video", "colmap", "polycam", "record3d", "metashape",
        "realitycapture", "odm",
    ],
    "nst-download-data": [
        "blender", "nerfstudio", "record3d", "sitcoms3d", "dnerf",
        "phototourism", "sdfstudio", "mipnerf360",
    ],
}


def generate_bash() -> str:
    from nerfstudio_tpu.configs.method_configs import method_configs
    from nerfstudio_tpu.data.dataparsers.registry import dataparser_registry

    methods = " ".join(sorted(method_configs))
    parsers = " ".join(sorted(dataparser_registry()))
    lines = [
        "# nerfstudio-tpu shell completions (generated)",
        "_nst_train() {",
        "  local cur=${COMP_WORDS[COMP_CWORD]} prev=${COMP_WORDS[COMP_CWORD-1]}",
        f'  if [[ $prev == "--dataparser" ]]; then COMPREPLY=($(compgen -W "{parsers}" -- $cur));',
        f'  elif [[ $COMP_CWORD == 1 ]]; then COMPREPLY=($(compgen -W "{methods}" -- $cur));',
        '  else COMPREPLY=($(compgen -W "--data --dataparser" -- $cur)); fi',
        "}",
        "complete -F _nst_train nst-train",
    ]
    for cmd, subs in COMMANDS.items():
        if cmd == "nst-train" or subs is None:
            continue
        fn = cmd.replace("-", "_")
        words = " ".join(subs)
        lines += [
            f"_{fn}() {{",
            "  local cur=${COMP_WORDS[COMP_CWORD]}",
            f'  if [[ $COMP_CWORD == 1 ]]; then COMPREPLY=($(compgen -W "{words}" -- $cur)); fi',
            "}",
            f"complete -F _{fn} {cmd}",
        ]
    return "\n".join(lines) + "\n"


def entrypoint(argv=None) -> None:
    ap = argparse.ArgumentParser("nst-install-completions", description=__doc__)
    ap.add_argument("--mode", choices=["install", "print"], default="print")
    ap.add_argument("--rc-file", type=Path, default=Path.home() / ".bashrc")
    args = ap.parse_args(argv)
    script = generate_bash()
    if args.mode == "print":
        print(script)
        return
    target = Path.home() / ".config" / "nerfstudio_tpu" / "completions.bash"
    target.parent.mkdir(parents=True, exist_ok=True)
    target.write_text(script)
    marker = "# nerfstudio-tpu completions"
    rc = args.rc_file
    content = rc.read_text() if rc.exists() else ""
    if marker not in content:
        with open(rc, "a", encoding="utf-8") as f:
            f.write(f"\n{marker}\nsource {target}\n")
    print(f"completions installed: {target} (sourced from {rc})")


if __name__ == "__main__":
    entrypoint()
