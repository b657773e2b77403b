from . import camera, lines, palettes, splat  # noqa: F401
from .camera import Camera  # noqa: F401
from .splat import render_frame, render_points, eye_dome, prop_from_segment, to_u8  # noqa: F401
