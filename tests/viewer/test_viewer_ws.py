"""End-to-end viewer protocol test: spins up the real websocket+HTTP server
against a mocked pipeline and drives the client protocol (camera moves,
control-panel settings, keyframes, path save, snapshot) the way
client.html does. Mirrors the reference's viser-based viewer contract
(reference nerfstudio/viewer/viewer.py, render_state_machine.py)."""

import asyncio
import json
import socket
import time
from pathlib import Path

import numpy as np
import pytest

websockets = pytest.importorskip("websockets")

from nerfstudio_tpu.viewer.server import Viewer  # noqa: E402


class _FakeModel:
    class config:
        sh_degree = 3

    def render(self, params, alive, c2w, K, w, h, sh_degree_active, background=None, **kw):
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        rgb = np.stack([xx / w, yy / h, np.zeros_like(xx)], -1)
        return {
            "rgb": rgb,
            "depth": np.linalg.norm(c2w[:, 3]) * np.ones((h, w, 1), np.float32),
            "accumulation": np.ones((h, w, 1), np.float32),
        }


class _FakeAux:
    alive = np.ones(16, bool)


class _FakeState:
    params = {"means": np.random.default_rng(0).normal(size=(16, 3)).astype(np.float32)}
    aux = _FakeAux()


class _FakeCams:
    camera_to_worlds = np.tile(np.eye(3, 4, dtype=np.float32), (4, 1, 1))
    times = None


class _FakeDM:
    train_cameras = _FakeCams()


class _FakePipeline:
    model = _FakeModel()
    datamanager = _FakeDM()


def _free_port():
    s = socket.socket()
    s.bind(("", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.fixture(scope="module")
def viewer(tmp_path_factory):
    v = Viewer(_FakePipeline(), lambda: _FakeState(), websocket_port=_free_port(),
               http_port=_free_port(), max_resolution=256)
    v.output_dir = tmp_path_factory.mktemp("viewer_out")
    v.start()
    # wait for the ws server to come up
    for _ in range(100):
        try:
            s = socket.create_connection(("127.0.0.1", v.websocket_port), timeout=0.2)
            s.close()
            break
        except OSError:
            time.sleep(0.1)
    return v


def _drive(viewer, messages, want_frames=1, timeout=15.0):
    """Connect, send messages, and collect frames/stats until satisfied."""

    async def run():
        frames, others = [], []
        uri = f"ws://127.0.0.1:{viewer.websocket_port}"
        async with websockets.connect(uri) as ws:
            for m in messages:
                await ws.send(json.dumps(m))
            t0 = time.time()
            while len(frames) < want_frames and time.time() - t0 < timeout:
                try:
                    raw = await asyncio.wait_for(ws.recv(), timeout=timeout)
                except asyncio.TimeoutError:
                    break
                msg = json.loads(raw)
                (frames if msg.get("type") == "frame" else others).append(msg)
        return frames, others

    return asyncio.run(run())


def _cam_msg(radius=3.0):
    c2w = np.eye(3, 4, dtype=np.float32)
    c2w[2, 3] = radius
    return {"type": "camera", "c2w": c2w.reshape(-1).tolist(), "fov": 60.0}


def test_camera_produces_frames(viewer):
    frames, _ = _drive(viewer, [_cam_msg()], want_frames=2)
    assert len(frames) >= 1
    f = frames[0]
    assert f["res"] in (128, 256)
    assert len(f["jpeg"]) > 100  # a real JPEG payload


def test_settings_and_outputs(viewer):
    frames, _ = _drive(
        viewer,
        [
            _cam_msg(),
            {"type": "setting", "updates": {"output_type": "depth", "colormap": "gray",
                                            "colormap_max": 4.0, "background_color": "#2040ff"}},
        ],
        want_frames=2,
    )
    assert frames
    assert viewer.control.output_type == "depth"
    assert viewer.control.colormap == "gray"
    assert viewer.control.background_rgb() == pytest.approx((0x20 / 255, 0x40 / 255, 1.0))
    viewer.control.apply({"output_type": "rgb"})


def test_crop_setting_roundtrip(viewer):
    _drive(viewer, [
        _cam_msg(),
        {"type": "setting", "updates": {"crop_enabled": True,
                                        "crop_min": [-0.5, -0.5, -0.5],
                                        "crop_max": [0.5, 0.5, 0.5]}},
    ], want_frames=1)
    assert viewer.control.crop_enabled
    assert viewer.control.crop_min == (-0.5, -0.5, -0.5)
    viewer.control.apply({"crop_enabled": False})


def test_keyframes_and_path_save(viewer):
    msgs = [_cam_msg(2.0), {"type": "keyframe_add"},
            _cam_msg(4.0), {"type": "keyframe_add"},
            {"type": "path_save", "fps": 10, "seconds": 1.0, "resolution": 64}]
    _drive(viewer, msgs, want_frames=1)
    for _ in range(50):
        if (viewer.output_dir / "camera_path.json").exists():
            break
        time.sleep(0.1)
    path_file = viewer.output_dir / "camera_path.json"
    assert path_file.exists()
    payload = json.loads(path_file.read_text())
    assert len(payload["keyframes"]) >= 2
    assert len(payload["camera_path"]) >= 2
    assert len(payload["camera_path"][0]["camera_to_world"]) == 16
    # delete one keyframe
    _drive(viewer, [{"type": "keyframe_delete", "index": 0}], want_frames=0, timeout=2)
    time.sleep(0.3)
    assert len(viewer.render_panel.keyframes) >= 1


def test_snapshot(viewer):
    _drive(viewer, [_cam_msg(), {"type": "snapshot"}], want_frames=2)
    snaps = list(Path(viewer.output_dir, "snapshots").glob("*.png"))
    for _ in range(50):
        if snaps:
            break
        time.sleep(0.1)
        snaps = list(Path(viewer.output_dir, "snapshots").glob("*.png"))
    assert snaps


def test_http_serves_client(viewer):
    import urllib.request

    html = urllib.request.urlopen(
        f"http://127.0.0.1:{viewer.http_port}/", timeout=5
    ).read().decode()
    assert "nerfstudio-tpu viewer" in html
    assert str(viewer.websocket_port) in html  # __WS_PORT__ substituted


def test_custom_widget_panel_end_to_end(tmp_path):
    """A method declaring ViewerElement attributes gets a custom panel: the
    server ships specs on connect, routes updates to cb_hooks, and lifts
    clicks to world rays (reference viewer_elements.py user API)."""
    from nerfstudio_tpu.viewer.viewer_elements import (
        ViewerControl,
        ViewerSlider,
    )

    fired = []
    clicks = []

    class _WidgetModel(_FakeModel):
        def __init__(self):
            self.noise = ViewerSlider("noise", 0.2, 0.0, 1.0,
                                      cb_hook=lambda e: fired.append(e.value))
            self.ctl = ViewerControl()
            self.ctl.register_click_cb(clicks.append)

    class _WidgetPipeline(_FakePipeline):
        def __init__(self):
            self.model = _WidgetModel()
            self.datamanager = _FakeDM()

    v = Viewer(_WidgetPipeline(), lambda: _FakeState(), websocket_port=_free_port(),
               http_port=_free_port(), max_resolution=128)
    v.output_dir = tmp_path
    assert "_WidgetPipeline.model.noise" in v.custom_elements
    assert len(v.viewer_controls) == 1
    v.start()
    for _ in range(100):
        try:
            s = socket.create_connection(("127.0.0.1", v.websocket_port), timeout=0.2)
            s.close()
            break
        except OSError:
            time.sleep(0.1)

    async def run():
        uri = f"ws://127.0.0.1:{v.websocket_port}"
        async with websockets.connect(uri) as ws:
            # first message on connect is the custom panel spec
            panel = json.loads(await asyncio.wait_for(ws.recv(), timeout=10))
            assert panel["type"] == "custom_panel"
            (spec,) = panel["elements"]
            assert spec["id"] == "_WidgetPipeline.model.noise" and spec["kind"] == "slider"
            await ws.send(json.dumps(_cam_msg()))
            await ws.send(json.dumps({"type": "custom", "id": spec["id"], "value": 0.7}))
            await ws.send(json.dumps({"type": "click", "u": 0.5, "v": 0.5}))
            t0 = time.time()
            while (not fired or not clicks) and time.time() - t0 < 10:
                await asyncio.sleep(0.05)

    asyncio.run(run())
    assert fired == [pytest.approx(0.7)]
    assert v.pipeline.model.noise.value == pytest.approx(0.7)
    assert len(clicks) == 1 and clicks[0].direction[2] < 0


def test_scene_payload_sent_on_connect(viewer):
    """Client-side 3D overlay contract: on connect the server pushes a
    'scene' message with the training cameras' c2w rows and a point
    subsample (splat means here), which client.html draws as wireframe
    frustums locally (reference viewer.py:432 scene init w/ frustums)."""
    _, others = _drive(viewer, [_cam_msg()], want_frames=1)
    scenes = [m for m in others if m.get("type") == "scene"]
    assert scenes, f"no scene message in {[m.get('type') for m in others]}"
    sc = scenes[0]
    assert len(sc["cameras"]) == 4 and len(sc["cameras"][0]) == 12
    # the fake state carries 16 alive splat means
    assert len(sc.get("points", [])) == 16
