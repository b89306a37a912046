"""nst-viewer: view a trained run live (reference: nerfstudio/scripts/viewer/run_viewer.py)."""

from __future__ import annotations

import sys
import time
from pathlib import Path


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: nst-viewer RUN_DIR [--port 7007]")
        return
    run_dir = Path(argv[0])
    args = dict(zip(argv[1::2], argv[2::2]))
    port = int(args.get("--port", "7007"))

    from nerfstudio_tpu.utils.eval_utils import eval_setup
    from nerfstudio_tpu.viewer.server import Viewer

    config, pipeline, state = eval_setup(run_dir)
    viewer = Viewer(pipeline, lambda: state, websocket_port=port, http_port=port + 1)
    viewer.start()
    print("press ctrl-c to exit")
    try:
        while True:
            time.sleep(1)
    except KeyboardInterrupt:
        pass


def entrypoint():
    main()


if __name__ == "__main__":
    entrypoint()
