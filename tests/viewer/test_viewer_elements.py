"""User-API widget semantics (reference nerfstudio/viewer/viewer_elements.py):
typed coercion, spec serialization, cb_hook routing, the attribute scan that
discovers widgets on a method, and ViewerControl's click->world-ray lift."""

import numpy as np

from nerfstudio_tpu.viewer.viewer_elements import (
    ViewerButton,
    ViewerButtonGroup,
    ViewerCheckbox,
    ViewerControl,
    ViewerDropdown,
    ViewerNumber,
    ViewerRGB,
    ViewerSlider,
    ViewerText,
    ViewerVec3,
    collect_viewer_elements,
)


def test_slider_clamps_and_fires_callback():
    fired = []
    s = ViewerSlider("density noise", 0.5, 0.0, 1.0, step=0.1,
                     cb_hook=lambda e: fired.append(e.value))
    s.handle(2.5)
    assert s.value == 1.0 and fired == [1.0]
    spec = s.to_spec()
    assert spec["kind"] == "slider" and spec["min"] == 0.0 and spec["max"] == 1.0


def test_typed_coercion():
    assert ViewerCheckbox("c", False)._coerce(1) is True
    assert ViewerNumber("n", 0.0)._coerce("3.5") == 3.5
    assert ViewerText("t", "")._coerce(7) == "7"
    assert ViewerRGB("rgb", (0, 0, 0))._coerce([300, -5, 128.7]) == (255, 0, 128)
    v = ViewerVec3("v", (0, 0, 0), step=0.5)
    assert v._coerce([1, 2, 3]) == (1.0, 2.0, 3.0)
    assert v.to_spec()["step"] == 0.5


def test_dropdown_rejects_unknown_and_set_options():
    d = ViewerDropdown("mode", "rgb", ["rgb", "depth"])
    d.handle("bogus")
    assert d.value == "rgb"
    d.handle("depth")
    assert d.value == "depth"
    d.set_options(["a", "b"])
    assert d.value == "a"  # old value gone -> falls to first option
    g = ViewerButtonGroup("split", "full", ["full", "half"])
    g.handle("half")
    assert g.value == "half"


def test_button_fires_without_value_state():
    fired = []
    b = ViewerButton("export now", cb_hook=lambda e: fired.append(e.name))
    b.handle(True)
    assert fired == ["export now"]
    assert "value" not in b.to_spec()


def test_collect_scan_finds_widgets_and_controls():
    class FakeModel:
        def __init__(self):
            self.slider = ViewerSlider("s", 0.0, 0.0, 1.0)
            self.ctl = ViewerControl()
            self.other = 42

    class FakePipeline:
        def __init__(self, m):
            self.model = m
            self.check = ViewerCheckbox("k", True)

    m = FakeModel()
    p = FakePipeline(m)
    found = dict(collect_viewer_elements(p, p.model))
    assert "FakePipeline.check" in found
    # nested components are discovered recursively (reference viewer.py:268
    # parse_object); the model's widgets surface under their qualified path
    assert "FakePipeline.model.slider" in found
    assert "FakePipeline.model.ctl" in found
    # dedup: scanning the same object twice yields each element once
    found2 = collect_viewer_elements(p, p, p.model)
    assert len(found2) == len(found)


def test_viewer_control_click_ray():
    class FakeViewer:
        # camera at origin looking down -z (identity rotation)
        camera_pose = np.eye(3, 4, dtype=np.float32)
        camera_fov = 90.0

    clicks = []
    vc = ViewerControl()
    vc.install(FakeViewer())
    vc.register_click_cb(clicks.append)
    c = vc.on_click(0.5, 0.5)  # center pixel -> straight ahead (-z)
    np.testing.assert_allclose(c.direction, [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(c.origin, [0, 0, 0], atol=1e-6)
    # right edge at fov 90 -> 45 degrees toward +x
    c2 = vc.on_click(1.0, 0.5)
    assert c2.direction[0] > 0.7 and c2.direction[2] < 0
    assert len(clicks) == 2
    vc.unregister_click_cb(clicks.append)  # no-op (different bound object ok)


def test_viewer_control_get_camera():
    class FakeViewer:
        camera_pose = np.eye(3, 4, dtype=np.float32)
        camera_fov = 60.0

    vc = ViewerControl()
    vc.install(FakeViewer())
    cam = vc.get_camera(100, 200)
    assert int(np.asarray(cam.height).reshape(-1)[0]) == 100
    # focal from vertical fov: h / (2 tan(30deg))
    np.testing.assert_allclose(
        np.asarray(cam.fx).reshape(-1)[0], 100 / (2 * np.tan(np.deg2rad(30))), rtol=1e-5
    )


def test_viewer_control_rect_select():
    """ViewerRectSelect: alt-drag corners lift to world rays and fire
    registered callbacks (reference viewer_elements.py:69-80)."""
    import numpy as np

    from nerfstudio_tpu.viewer.viewer_elements import ViewerControl

    class _V:
        camera_pose = np.eye(3, 4, dtype=np.float32)
        camera_fov = 90.0

    vc = ViewerControl()
    vc.install(_V())
    got = []
    vc.register_rect_cb(got.append)
    rect = vc.on_rect(0.25, 0.25, 0.75, 0.75)
    assert got and got[0] is rect
    assert rect.min_pos == (0.25, 0.25) and rect.max_pos == (0.75, 0.75)
    o, d = rect.ray_min
    assert np.allclose(o, 0)  # camera at origin
    assert d[2] < 0  # looking down -z
    # corners on opposite sides of the axis
    assert rect.ray_min[1][0] < 0 < rect.ray_max[1][0]
