"""Blender VFX add-on: camera-path exchange with nerfstudio-tpu (reference:
scripts/blender/nerfstudio_blender.py, independent implementation).

Install in Blender (Edit > Preferences > Add-ons > Install). Two operators:
  * export the active camera's animation to a ``camera_path.json`` consumable
    by ``nst-render camera-path``
  * import a camera_path.json as an animated Blender camera (to composite
    renders with VFX)

Runs inside Blender's python (bpy) — no nerfstudio_tpu import needed."""

bl_info = {
    "name": "nerfstudio-tpu camera paths",
    "author": "nerfstudio-tpu",
    "version": (1, 0),
    "blender": (3, 0, 0),
    "category": "Import-Export",
    "description": "Exchange camera paths with nerfstudio-tpu (nst-render)",
}

import json
import math

try:
    import bpy
    from mathutils import Matrix
except ImportError:  # allows import outside Blender for linting/tests
    bpy = None
    Matrix = None


def _camera_fov_deg(cam_data, height: int) -> float:
    """Vertical FOV in degrees from a Blender camera."""
    if cam_data.sensor_fit == "VERTICAL":
        sensor = cam_data.sensor_height
    else:
        sensor = cam_data.sensor_width
    # vertical fov via focal length in mm
    return math.degrees(2 * math.atan(0.5 * sensor / cam_data.lens))


def export_camera_path(scene, camera, filepath: str) -> int:
    """Active camera animation -> nst-render camera_path.json."""
    render = scene.render
    fps = scene.render.fps
    frames = []
    for f in range(scene.frame_start, scene.frame_end + 1):
        scene.frame_set(f)
        m = camera.matrix_world  # Blender cameras are already OpenGL (-z fwd)
        frames.append(
            {
                "camera_to_world": [v for row in m for v in row],
                "fov": _camera_fov_deg(camera.data, render.resolution_y),
            }
        )
    payload = {
        "camera_path": frames,
        "render_height": render.resolution_y,
        "render_width": render.resolution_x,
        "fps": fps,
        "seconds": len(frames) / max(fps, 1),
        "camera_type": "perspective",
    }
    with open(filepath, "w", encoding="utf-8") as fh:
        json.dump(payload, fh, indent=2)
    return len(frames)


def import_camera_path(scene, filepath: str):
    """camera_path.json -> new animated Blender camera."""
    with open(filepath, encoding="utf-8") as fh:
        payload = json.load(fh)
    cam_data = bpy.data.cameras.new("nerfstudio_path")
    cam_obj = bpy.data.objects.new("nerfstudio_path", cam_data)
    scene.collection.objects.link(cam_obj)
    path = payload["camera_path"]
    for i, fr in enumerate(path):
        m = fr["camera_to_world"]
        mat = Matrix([m[0:4], m[4:8], m[8:12], m[12:16] if len(m) >= 16 else [0, 0, 0, 1]])
        cam_obj.matrix_world = mat
        cam_data.angle_y = math.radians(float(fr.get("fov", 60.0)))
        cam_obj.keyframe_insert(data_path="location", frame=i + 1)
        cam_obj.keyframe_insert(data_path="rotation_euler", frame=i + 1)
    scene.frame_start = 1
    scene.frame_end = len(path)
    return cam_obj


if bpy is not None:

    class NST_OT_export_path(bpy.types.Operator):
        """Export active camera animation for nst-render"""

        bl_idname = "nst.export_camera_path"
        bl_label = "Export nerfstudio-tpu camera path"

        filepath: bpy.props.StringProperty(subtype="FILE_PATH")

        def execute(self, context):
            cam = context.scene.camera
            if cam is None:
                self.report({"ERROR"}, "no active camera")
                return {"CANCELLED"}
            n = export_camera_path(context.scene, cam, self.filepath)
            self.report({"INFO"}, f"exported {n} frames")
            return {"FINISHED"}

        def invoke(self, context, event):
            context.window_manager.fileselect_add(self)
            return {"RUNNING_MODAL"}

    class NST_OT_import_path(bpy.types.Operator):
        """Import a nerfstudio-tpu camera path as an animated camera"""

        bl_idname = "nst.import_camera_path"
        bl_label = "Import nerfstudio-tpu camera path"

        filepath: bpy.props.StringProperty(subtype="FILE_PATH")

        def execute(self, context):
            import_camera_path(context.scene, self.filepath)
            return {"FINISHED"}

        def invoke(self, context, event):
            context.window_manager.fileselect_add(self)
            return {"RUNNING_MODAL"}

    class NST_PT_panel(bpy.types.Panel):
        bl_idname = "NST_PT_panel"
        bl_label = "nerfstudio-tpu"
        bl_space_type = "VIEW_3D"
        bl_region_type = "UI"
        bl_category = "nerfstudio-tpu"

        def draw(self, context):
            self.layout.operator("nst.export_camera_path")
            self.layout.operator("nst.import_camera_path")

    _classes = (NST_OT_export_path, NST_OT_import_path, NST_PT_panel)

    def register():
        for c in _classes:
            bpy.utils.register_class(c)

    def unregister():
        for c in reversed(_classes):
            bpy.utils.unregister_class(c)
