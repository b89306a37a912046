"""Viewer package: websocket server + browser client + user-API widgets
(reference: nerfstudio/viewer/)."""

from nerfstudio_tpu.viewer.viewer_elements import (  # noqa: F401
    ViewerButton,
    ViewerButtonGroup,
    ViewerCheckbox,
    ViewerClick,
    ViewerControl,
    ViewerDropdown,
    ViewerElement,
    ViewerNumber,
    ViewerParameter,
    ViewerRGB,
    ViewerSlider,
    ViewerText,
    ViewerVec3,
    collect_viewer_elements,
)
