"""Cameras for PrimX rendering.

The reference couples cameras to a mm-scale 'volradius' world
(dva/ray_marcher.py:23-31,192; dva/visualize.py:84-120): positions are
multiplied by volradius before the raymarcher divides them out again. We
work directly in the normalized volume frame (object in [-1,1]^3), which
is numerically identical. Pinhole constants match the reference exactly:
focal 2084.9526697685183 at 1024px, principal point 512, frontal camera
at z=+5 with R=diag(1,-1,-1), orbit radius 5 at height 0
(visualize.py:84-120, 424; conditioner/image.py:120-141).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

REF_FOCAL_1024 = 2084.9526697685183
ORBIT_RADIUS = 5.0


class Camera(NamedTuple):
    campos: jnp.ndarray   # [3] in normalized volume units
    camrot: jnp.ndarray   # [3,3] world->camera rotation (rows)
    focal: jnp.ndarray    # [2] pixels
    princpt: jnp.ndarray  # [2] pixels
    height: int
    width: int


def _intrinsics(height: int, width: int):
    # the reference scales K row 0 by H/1024 and row 1 by W/1024
    # (visualize.py:117-120); identical for square images
    rh = height / 1024.0
    rw = width / 1024.0
    focal = np.array([REF_FOCAL_1024 * rh, REF_FOCAL_1024 * rw], np.float32)
    princpt = np.array([512.0 * rh, 512.0 * rw], np.float32)
    return focal, princpt


def frontal_camera(height: int = 518, width: int = 518) -> Camera:
    """Fixed frontal view (reference visualize.py:84-101)."""
    R = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]], np.float32)
    t = np.array([0.0, 0.0, ORBIT_RADIUS], np.float32)
    campos = -R.T @ t
    focal, princpt = _intrinsics(height, width)
    return Camera(jnp.asarray(campos), jnp.asarray(R), jnp.asarray(focal),
                  jnp.asarray(princpt), height, width)


def orbit_camera(angle: float, height: int = 518, width: int = 518,
                 cam_height: float = 0.0) -> Camera:
    """Orbit pose (reference dva/visualize.py:9-22 get_pose_on_orbit)."""
    r = ORBIT_RADIUS
    position = np.array(
        [r * np.cos(angle), cam_height, r * np.sin(angle)], np.float32)
    forward = position / np.linalg.norm(position)
    world_up = np.array([0.0, 1.0, 0.0], np.float32)
    right = -np.cross(world_up, forward)
    right /= np.linalg.norm(right)
    up = np.cross(forward, right)
    up /= np.linalg.norm(up)
    R = np.stack([right, up, forward], axis=0)
    t = np.array([0.0, 0.0, r], np.float32)
    campos = -R.T @ t
    focal, princpt = _intrinsics(height, width)
    return Camera(jnp.asarray(campos), jnp.asarray(R), jnp.asarray(focal),
                  jnp.asarray(princpt), height, width)


def camera_from_rt_k(Rt: np.ndarray, K: np.ndarray, height: int, width: int,
                     volradius: float = 1.0) -> Camera:
    """Build from reference-style extrinsics [3,4] / intrinsics [3,3]
    (dva/ray_marcher.py:23-31). ``volradius`` divides the translation if
    Rt is given in the reference's mm-scale convention."""
    Rt = np.asarray(Rt, np.float32)
    K = np.asarray(K, np.float32)
    R = Rt[:3, :3]
    t = Rt[:3, 3] / volradius
    campos = -R.T @ t
    focal = np.array([K[0, 0], K[1, 1]], np.float32)
    princpt = np.array([K[0, 2], K[1, 2]], np.float32)
    return Camera(jnp.asarray(campos), jnp.asarray(R), jnp.asarray(focal),
                  jnp.asarray(princpt), height, width)
