"""Live web viewer (reference: nerfstudio/viewer/, 3,660 LoC viser-based;
viewer_legacy websocket bridge).

Self-contained websocket + HTTP implementation (viser is not available in
this environment): a browser client (viewer/client.html) orbits a camera and
streams JPEG renders. The render loop mirrors the reference's
RenderStateMachine (viewer/render_state_machine.py:55-353): low-res while
moving, progressive high-res when static, yielding to training between
frames."""

from __future__ import annotations

import asyncio
import base64
import http.server
import io
import json
import threading
import time
from pathlib import Path
from typing import Optional

import numpy as np


class RenderState:
    LOW_MOVE = "low_move"
    LOW_STATIC = "low_static"
    HIGH = "high"


class Viewer:
    """(reference viewer/viewer.py:57-530)"""

    def __init__(
        self,
        pipeline,
        state_getter,
        websocket_port: int = 7007,
        http_port: int = 7008,
        max_resolution: int = 512,
        train_lock=None,
    ):
        self.pipeline = pipeline
        self.state_getter = state_getter
        # serializes the param-snapshot copy against train-step dispatch
        # (train_step donates buffers; see Trainer.train_lock)
        self.train_lock = train_lock
        self.websocket_port = websocket_port
        self.http_port = http_port
        self.max_resolution = max_resolution
        self.camera_pose: Optional[np.ndarray] = None
        self.camera_fov: float = 60.0
        self.render_state = RenderState.LOW_STATIC
        self._dirty = threading.Event()
        self._clients = set()
        self._loop = None
        self._stop = False
        self.stats = {"step": 0, "rays_per_sec": 0.0}
        self._last_stats_ts = 0.0
        self._snapshot_requested = False
        self._snap_status = ""
        # panels (reference control/render/export panels)
        from nerfstudio_tpu.viewer.panels import ControlPanelState, ExportPanel, RenderPanel

        self.control = ControlPanelState(max_resolution=max_resolution)
        self.render_panel = RenderPanel()
        self.export_panel = ExportPanel()
        self.output_dir = Path("viewer_outputs")
        # user-API widgets declared by the method (reference viewer_elements.py):
        # scan the pipeline + model for ViewerElement/ViewerControl attributes
        from nerfstudio_tpu.viewer.viewer_elements import (
            ViewerControl,
            collect_viewer_elements,
        )

        self.custom_elements = {}
        self.viewer_controls = []
        for qual_name, elem in collect_viewer_elements(
            pipeline, getattr(pipeline, "model", None)
        ):
            elem.install(self)
            if isinstance(elem, ViewerControl):
                self.viewer_controls.append(elem)
            else:
                self.custom_elements[qual_name] = elem

    @property
    def train_util(self) -> float:
        return self.control.train_util

    @property
    def paused(self) -> bool:
        return self.control.paused

    # ------------------------------------------------------------------
    def start(self) -> None:
        threading.Thread(target=self._run_ws, daemon=True).start()
        threading.Thread(target=self._run_http, daemon=True).start()
        threading.Thread(target=self._render_loop, daemon=True).start()
        print(
            f"viewer running: http://localhost:{self.http_port} "
            f"(ws: {self.websocket_port})"
        )

    def update(self, trainer, step: int) -> None:
        """Called by the trainer each iteration (reference trainer.py:374)."""
        self.stats["step"] = step
        m = getattr(trainer, "last_host_metrics", None)
        if m:
            self.stats["loss"] = m.get("loss")
            self.stats["rays_per_sec"] = m.get("train_rays_per_sec", 0.0)
            if "num_alive" in m:
                self.stats["num_gaussians"] = m["num_alive"]
        now = time.time()
        if self._clients and now - self._last_stats_ts > 1.0:
            self._last_stats_ts = now
            self._send({"type": "stats", **{k: v for k, v in self.stats.items() if v is not None}})

    # -- websocket server ---------------------------------------------------
    def _run_ws(self) -> None:
        import websockets

        async def handler(ws):
            self._clients.add(ws)
            if self.custom_elements:
                await ws.send(json.dumps(self._custom_panel_payload()))
            scene = self._scene_payload()
            if scene is not None:
                await ws.send(json.dumps(scene))
            try:
                async for raw in ws:
                    msg = json.loads(raw)
                    mtype = msg.get("type")
                    if mtype == "camera":
                        self.camera_pose = np.asarray(msg["c2w"], np.float32).reshape(3, 4)
                        self.camera_fov = float(msg.get("fov", 60.0))
                        self.render_state = RenderState.LOW_MOVE
                        self._dirty.set()
                    elif mtype == "setting":
                        # control panel update (reference control_panel.py)
                        self.control.apply(msg.get("updates", {}))
                        self.render_state = RenderState.LOW_STATIC
                        self._dirty.set()
                    elif mtype == "keyframe_add":
                        if self.camera_pose is not None:
                            n = self.render_panel.add_keyframe(self.camera_pose, self.camera_fov)
                            self._send({"type": "panel", "keyframes": n})
                    elif mtype == "keyframe_clear":
                        self.render_panel.clear()
                        self._send({"type": "panel", "keyframes": 0})
                    elif mtype == "keyframe_delete":
                        n = self.render_panel.delete(int(msg.get("index", -1)))
                        self._send({"type": "panel", "keyframes": n})
                    elif mtype == "keyframe_fov":
                        self.render_panel.set_keyframe_fov(
                            int(msg.get("index", -1)), float(msg.get("fov", 60.0))
                        )
                    elif mtype == "loop":
                        self.render_panel.loop = bool(msg.get("enabled", False))
                    elif mtype == "path_load":
                        try:
                            # only load paths inside output_dir: the socket is
                            # unauthenticated, so a client-supplied filesystem
                            # path would be an arbitrary-file probe
                            p = Path(msg.get("path", "camera_path.json"))
                            p = (Path(self.output_dir) / p.name).resolve()
                            n = self.render_panel.load_path_json(p)
                            self.render_panel.status = f"loaded {n} keyframes"
                            self._send({"type": "panel", "keyframes": n})
                        except Exception as e:  # noqa: BLE001
                            self.render_panel.status = f"error: {e}"
                    elif mtype == "path_save":
                        try:
                            p = self.render_panel.save_path_json(
                                self.output_dir / "camera_path.json",
                                resolution=int(msg.get("resolution", 512)),
                                fps=int(msg.get("fps", 24)),
                                seconds=float(msg.get("seconds", 4.0)),
                            )
                            self.render_panel.status = f"saved: {p}"
                        except Exception as e:  # noqa: BLE001
                            self.render_panel.status = f"error: {e}"
                    elif mtype == "snapshot":
                        self._snapshot_requested = True
                        self._dirty.set()
                    elif mtype == "render_path":
                        self.render_panel.render_path_async(
                            self,
                            int(msg.get("frames", 48)),
                            int(msg.get("resolution", 512)),
                            self.output_dir / "render",
                        )
                    elif mtype == "export":
                        self.export_panel.export_async(
                            self, msg.get("kind", "pointcloud"), self.output_dir / "exports",
                            num_points=int(msg.get("num_points", 200000)),
                        )
                    elif mtype == "custom":
                        # user-API widget update (reference viewer_elements cb_hook)
                        elem = self.custom_elements.get(msg.get("id") or msg.get("name"))
                        if elem is not None:
                            try:
                                elem.handle(msg.get("value"))
                            except Exception as e:  # noqa: BLE001
                                print(f"[viewer] widget {msg.get('id')}: {e}")
                            self.render_state = RenderState.LOW_STATIC
                            self._dirty.set()
                    elif mtype == "click":
                        for vc in self.viewer_controls:
                            try:
                                vc.on_click(float(msg.get("u", 0.5)), float(msg.get("v", 0.5)))
                            except Exception as e:  # noqa: BLE001
                                print(f"[viewer] click cb: {e}")
                    elif mtype == "rect":
                        # alt-drag rectangle select (reference ViewerRectSelect)
                        for vc in self.viewer_controls:
                            try:
                                vc.on_rect(
                                    float(msg.get("u0", 0.0)), float(msg.get("v0", 0.0)),
                                    float(msg.get("u1", 1.0)), float(msg.get("v1", 1.0)),
                                )
                            except Exception as e:  # noqa: BLE001
                                print(f"[viewer] rect cb: {e}")
            finally:
                self._clients.discard(ws)

        async def main():
            self._loop = asyncio.get_running_loop()
            async with websockets.serve(handler, "0.0.0.0", self.websocket_port):
                while not self._stop:
                    await asyncio.sleep(0.25)

        asyncio.run(main())

    def _custom_panel_payload(self) -> dict:
        return {
            "type": "custom_panel",
            "elements": [
                {**el.to_spec(), "id": name}
                for name, el in self.custom_elements.items()
            ],
        }

    def _scene_payload(self, max_points: int = 2000) -> Optional[dict]:
        """Static 3D scene for the client overlay: training-camera c2w's plus
        a point subsample (splat means or the capture's SfM seed points). The
        client draws these itself at input rate — the reference does this via
        viser's client-side three.js scene (reference viewer/viewer.py:432
        scene init w/ frustums); here it is a 2D-canvas wireframe overlay."""
        try:
            cams = getattr(self.pipeline.datamanager, "train_cameras", None)
            if cams is None:
                return None
            c2ws = np.asarray(cams.camera_to_worlds, np.float32).reshape(-1, 3, 4)
            payload = {
                "type": "scene",
                "cameras": np.round(c2ws, 4).reshape(len(c2ws), 12).tolist(),
            }
            pts = None
            state = self.state_getter() if self.state_getter is not None else None
            params = getattr(state, "params", None)
            if isinstance(params, dict) and "means" in params:
                alive = np.asarray(state.aux.alive) if getattr(state, "aux", None) is not None else None
                pts = np.asarray(params["means"], np.float32)
                if alive is not None:
                    pts = pts[alive[: len(pts)]]
            else:
                ds = getattr(self.pipeline.datamanager, "train_dataset", None)
                md = getattr(ds, "metadata", None) or {}
                if md.get("points3D_xyz") is not None:
                    pts = np.asarray(md["points3D_xyz"], np.float32)
            if pts is not None and len(pts):
                if len(pts) > max_points:
                    pts = pts[:: len(pts) // max_points + 1]
                payload["points"] = np.round(pts, 4).tolist()
            return payload
        except Exception:  # noqa: BLE001 — overlay is best-effort decoration
            return None

    def push_custom_panel(self) -> None:
        """Re-broadcast widget specs after a host-side state change
        (reference viewer_elements set_disabled/set_options)."""
        if self.custom_elements:
            self._send(self._custom_panel_payload())

    def _send(self, payload: dict) -> None:
        if self._loop is None:
            return
        data = json.dumps(payload)

        async def _broadcast():
            for ws in list(self._clients):
                try:
                    await ws.send(data)
                except Exception:
                    self._clients.discard(ws)

        asyncio.run_coroutine_threadsafe(_broadcast(), self._loop)

    # -- http static server -------------------------------------------------
    def _run_http(self) -> None:
        client_html = (Path(__file__).parent / "client.html").read_text()
        client_html = client_html.replace("__WS_PORT__", str(self.websocket_port))

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(inner):
                inner.send_response(200)
                inner.send_header("Content-Type", "text/html")
                inner.end_headers()
                inner.wfile.write(client_html.encode())

            def log_message(inner, *a):
                pass

        http.server.ThreadingHTTPServer(("0.0.0.0", self.http_port), Handler).serve_forever()

    # -- render loop --------------------------------------------------------
    def _resolution_for_state(self) -> int:
        if self.render_state == RenderState.LOW_MOVE:
            return 128
        if self.render_state == RenderState.LOW_STATIC:
            return 256
        return self.control.max_resolution

    # -- shared render entry (also used by the render panel) -----------------
    def render_view(self, cam, res: int, preview: bool = False) -> np.ndarray:
        """Render one camera -> (res, res, 3) float rgb in [0,1], applying the
        control panel's output/colormap/crop/background/time settings
        (reference control_panel.py output selection + colormap options)."""
        import contextlib

        import jax
        import jax.numpy as jnp

        # snapshot params/aux under the train lock: train_step DONATES the
        # state buffers, so rendering from the live arrays races with the
        # next dispatch ("Array has been deleted"). The copies are enqueued
        # before any later donating step, so they read valid buffers.
        lock = self.train_lock if self.train_lock is not None else contextlib.nullcontext()

        def _snap(tree):
            return jax.tree_util.tree_map(
                lambda x: x.copy() if hasattr(x, "copy") else x, tree
            )

        with lock:
            state = self.state_getter()
            # only params + aux are read by renders; skip the opt-state copy
            if hasattr(state, "replace"):
                state = state.replace(params=_snap(state.params), aux=_snap(state.aux))
        ctl = self.control
        focal = float(np.asarray(cam.fx).reshape(-1)[0])
        if hasattr(self.pipeline, "model") and hasattr(self.pipeline.model, "render"):
            alive = state.aux.alive
            if ctl.crop_enabled:
                # crop the splat scene to the OBB (reference splatfacto crop_box)
                means = state.params["means"]
                mn = jnp.asarray(ctl.crop_min)
                mx = jnp.asarray(ctl.crop_max)
                inside = jnp.all((means >= mn) & (means <= mx), axis=-1)
                alive = alive & inside
            out = self.pipeline.model.render(
                state.params, alive, np.asarray(cam.camera_to_worlds)[0],
                (focal, focal, res / 2, res / 2), res, res,
                sh_degree_active=self.pipeline.model.config.sh_degree,
                background=jnp.asarray(ctl.background_rgb(), jnp.float32),
            )
        else:
            if getattr(self.pipeline.datamanager.train_cameras, "times", None) is not None:
                from nerfstudio_tpu.cameras.cameras import Cameras

                cam = Cameras(
                    camera_to_worlds=cam.camera_to_worlds,
                    fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
                    width=cam.width, height=cam.height,
                    times=np.full((1, 1), ctl.time, np.float32),
                )
            out = self.pipeline.render_camera(
                state.params, cam, 0, chunk_size=res * res,
                aux=getattr(state, "aux", None),
                preview=preview,
            )
        sel = ctl.output_type
        if sel == "depth" and "depth" in out:
            from nerfstudio_tpu.utils.colormaps import apply_depth_colormap

            d = out["depth"]
            if d.ndim == 2:
                d = d[..., None]
            if ctl.invert_colormap:
                d = -d
            acc = out.get("accumulation")
            if acc is not None and acc.ndim == 2:
                acc = acc[..., None]
            rgb = np.asarray(
                apply_depth_colormap(
                    d, accumulation=acc,
                    near_plane=ctl.depth_near, far_plane=ctl.colormap_max,
                    colormap=ctl.colormap,
                )
            )
        elif sel == "accumulation" and "accumulation" in out:
            from nerfstudio_tpu.utils.colormaps import apply_colormap

            a = out["accumulation"]
            if a.ndim == 2:
                a = a[..., None]
            rgb = np.asarray(apply_colormap(a, colormap=ctl.colormap))
        else:
            rgb = np.asarray(out["rgb"])
        return rgb

    def _render_loop(self) -> None:
        from PIL import Image

        from nerfstudio_tpu.cameras.cameras import Cameras

        while not self._stop:
            if not self._clients or self.camera_pose is None:
                time.sleep(0.1)
                continue
            self._dirty.clear()
            res = self._resolution_for_state()
            focal = res / (2 * np.tan(np.deg2rad(self.camera_fov) / 2))
            cam = Cameras(
                camera_to_worlds=self.camera_pose[None],
                fx=focal, fy=focal, cx=res / 2, cy=res / 2, width=res, height=res,
            )
            try:
                t0 = time.perf_counter()
                # stochastic-trilerp preview while moving/refining (2.4x
                # faster chunks); the final HIGH pass renders exact
                rgb = self.render_view(
                    cam, res, preview=self.render_state != RenderState.HIGH
                )
                dt = time.perf_counter() - t0
                frame = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
                if self.control.show_cameras:
                    from nerfstudio_tpu.viewer.panels import draw_camera_frustums

                    train_c2ws = np.asarray(
                        self.pipeline.datamanager.train_cameras.camera_to_worlds
                    )[:50]
                    frame = draw_camera_frustums(
                        frame, self.camera_pose, focal, train_c2ws
                    )
                img = Image.fromarray(frame)
                if self._snapshot_requested:
                    self._snapshot_requested = False
                    snap_dir = self.output_dir / "snapshots"
                    snap_dir.mkdir(parents=True, exist_ok=True)
                    p = snap_dir / f"snapshot_{int(time.time())}_{self.stats['step']}.png"
                    img.save(p)
                    self._snap_status = f"saved {p.name}"
                buf = io.BytesIO()
                img.save(buf, format="JPEG", quality=80)
                self._send(
                    {
                        "type": "frame",
                        "jpeg": base64.b64encode(buf.getvalue()).decode(),
                        "res": res,
                        "render_ms": round(dt * 1e3, 1),
                        "step": self.stats["step"],
                        "render_status": self.render_panel.status,
                        "export_status": self.export_panel.status,
                        "snap_status": self._snap_status,
                        "paused": self.control.paused,
                    }
                )
                # progressive refinement: move -> static -> high
                if not self._dirty.is_set():
                    if self.render_state == RenderState.LOW_MOVE:
                        self.render_state = RenderState.LOW_STATIC
                    elif self.render_state == RenderState.LOW_STATIC:
                        self.render_state = RenderState.HIGH
                # yield to training
                util = min(max(self.control.train_util, 0.05), 0.98)
                time.sleep(max(dt * util / (1 - util), 0.02))
            except Exception as e:  # noqa: BLE001
                print(f"[viewer] render error: {e}")
                time.sleep(0.5)
