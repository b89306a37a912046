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


def test_load_reference_keyframes_with_matrix(tmp_path):
    """A reference-exported file stores keyframes under 'matrix' (flattened
    4x4) and loop under 'is_cycle' (reference render_panel.py:1073,1095)."""
    kfs = []
    for i in range(3):
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = i
        kfs.append({"matrix": m.reshape(-1).tolist(), "fov": 45.0 + i})
    f = tmp_path / "camera_path.json"
    f.write_text(json.dumps({"keyframes": kfs, "is_cycle": True, "camera_path": []}))
    p = RenderPanel()
    assert p.load_path_json(f) == 3
    assert p.loop is True
    assert p.keyframes[2]["fov"] == 47.0
    np.testing.assert_allclose(np.asarray(p.keyframes[2]["c2w"]), _pose(2.0), atol=1e-6)


def test_fov_track_matches_pose_cadence():
    """At a frame whose pose IS keyframe k, the fov must be exactly kf k's fov
    (the fov track shares the pose interpolator's per-segment schedule)."""
    p = _panel_with_keyframes(3)  # fovs 50, 60, 70
    poses, fovs = p.interpolated_path(20, return_fovs=True)
    kf_positions = np.asarray([0.0, 1.0, 2.0])
    for kf_i, (x, want_fov) in enumerate(zip(kf_positions, [50.0, 60.0, 70.0])):
        hits = np.where(np.abs(poses[:, 0, 3] - x) < 1e-6)[0]
        assert hits.size, f"keyframe {kf_i} pose missing from the path"
        assert any(abs(fovs[h] - want_fov) < 1e-4 for h in hits), (
            kf_i,
            fovs[hits],
            want_fov,
        )
    # final frame reaches the last keyframe's fov
    assert abs(fovs[-1] - 70.0) < 1e-4


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
