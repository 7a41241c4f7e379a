from .camera import Camera, camera_from_w2c, make_camera  # noqa: F401
from .rasterize import render  # noqa: F401
