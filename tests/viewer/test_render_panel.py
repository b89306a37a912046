"""RenderPanel keyframe-path semantics: per-keyframe fov interpolation, loop
closure, and save/load JSON roundtrip (reference nerfstudio/viewer/
render_panel.py: Keyframe.override_fov, loop toggle, load-path button)."""

import json
import numpy as np

from nerfstudio_tpu.viewer.panels import RenderPanel


def _pose(tx: float) -> np.ndarray:
    m = np.eye(3, 4, dtype=np.float32)
    m[0, 3] = tx
    return m


def _panel_with_keyframes(n=3):
    p = RenderPanel()
    for i in range(n):
        p.add_keyframe(_pose(float(i)), fov=50.0 + 10.0 * i)
    return p


def test_fov_track_interpolates_between_keyframes():
    p = _panel_with_keyframes(3)  # fovs 50, 60, 70
    poses, fovs = p.interpolated_path(20, return_fovs=True)
    assert len(poses) == len(fovs)
    assert abs(fovs[0] - 50.0) < 1e-5
    assert np.all(np.diff(fovs) >= -1e-5)  # monotone up for this track
    assert fovs[-1] <= 70.0 + 1e-5
    p.set_keyframe_fov(1, 90.0)
    _, fovs2 = p.interpolated_path(20, return_fovs=True)
    assert fovs2.max() > 70.0  # the override raised the middle of the track


def test_loop_closes_the_path():
    p = _panel_with_keyframes(3)
    open_path = p.interpolated_path(30)
    p.loop = True
    closed = p.interpolated_path(30)
    # closed path returns near the first keyframe's translation
    assert np.linalg.norm(closed[-1][:, 3] - closed[0][:, 3]) < np.linalg.norm(
        open_path[-1][:, 3] - open_path[0][:, 3]
    )


def test_save_load_roundtrip(tmp_path):
    p = _panel_with_keyframes(3)
    p.loop = True
    out = p.save_path_json(tmp_path / "camera_path.json", resolution=64, fps=10, seconds=1.0)
    payload = json.loads(out.read_text())
    assert payload["loop"] is True
    assert len(payload["camera_path"]) >= 2
    # per-frame fov is present and varies along the path
    fovs = [fr["fov"] for fr in payload["camera_path"]]
    assert max(fovs) > min(fovs)

    q = RenderPanel()
    n = q.load_path_json(out)
    assert n == 3 and q.loop is True
    np.testing.assert_allclose(
        np.asarray(q.keyframes[2]["c2w"]), _pose(2.0), atol=1e-6
    )


def test_load_reference_style_camera_path(tmp_path):
    """A bare reference-style file (camera_path only, 4x4 row-major) loads."""
    frames = []
    for i in range(4):
        m = np.eye(4, dtype=np.float32)
        m[1, 3] = i
        frames.append({"camera_to_world": m.reshape(-1).tolist(), "fov": 75.0})
    f = tmp_path / "ref_path.json"
    f.write_text(json.dumps({"camera_path": frames}))
    p = RenderPanel()
    assert p.load_path_json(f) == 4
    assert p.keyframes[3]["fov"] == 75.0
    assert p.keyframes[3]["c2w"][1][3] == 3.0
