from .camera import Camera, frontal_camera, orbit_camera, camera_from_rt_k
from .raymarch import compute_rays, raymarch, render_primx
from .visualize import (
    primx_to_payload,
    colored_box_payload,
    visualize_primvolume,
    visualize_video_primvolume,
)

__all__ = [
    "Camera",
    "frontal_camera",
    "orbit_camera",
    "camera_from_rt_k",
    "compute_rays",
    "raymarch",
    "render_primx",
    "primx_to_payload",
    "colored_box_payload",
    "visualize_primvolume",
    "visualize_video_primvolume",
]
from . import geom  # noqa: F401  (UV/3D geometry utilities, dva/geom.py parity)
