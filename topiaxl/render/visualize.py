"""PrimX visualization: recon snapshots, orbit videos, colored prim boxes.

Parity with dva/visualize.py: ``visualize_primvolume`` renders a frontal
RGB + colored-box pair into one JPEG (visualize.py:215-293);
``visualize_video_primvolume`` renders an orbit (angles
linspace(1.5pi, 3.5pi), visualize.py:373,424) into rgb.mp4 + prim.mp4 at
20 fps (falls back to frame JPEGs if no mp4 encoder is present).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..models.primx import sdf2alpha
from .camera import frontal_camera, orbit_camera
from .raymarch import render_primx


def primx_to_payload(srt, feat, prim_shape: int = 8,
                     sdf_var: float = 0.005,
                     channels: str = "tex") -> jnp.ndarray:
    """PrimX payload -> raymarch rgba volume [K, S, S, S, 4]:
    rgb = tex * 255, alpha = exp(-(sdf/var)^2) * 255
    (reference dva/visualize.py:388-392). ``channels='mat'`` renders the
    material channels instead: rgb = (roughness, metallic, 0) * 255 —
    the mat.mp4 view the reference app lists but its visualizer never
    writes (app.py:27,97 vs dva/visualize.py:444-447)."""
    S = prim_shape
    K = feat.shape[0]
    vol = feat.reshape(K, 6, S, S, S)
    alpha = sdf2alpha(vol[:, 0], var=sdf_var) * 255.0
    if channels == "mat":
        rgb = jnp.concatenate(
            [vol[:, 4:6], jnp.zeros_like(vol[:, 0:1])], axis=1) * 255.0
    else:
        rgb = vol[:, 1:4] * 255.0
    rgba = jnp.concatenate([rgb, alpha[:, None]], axis=1)  # [K, 4, S, S, S]
    return rgba.transpose(0, 2, 3, 4, 1)


def colored_box_payload(num_prims: int, prim_shape: int = 8,
                        alpha: float = 10000.0, seed: int = 123456) -> jnp.ndarray:
    """Random-colored lit boxes (reference ray_marcher.py:232-279):
    per-prim random color, diffuse shading from the dominant cube-face
    normal against lightdir = normalize(-[3,3,3]), clamped at 0.2, x1.4."""
    S = prim_shape
    rng = np.random.RandomState(seed)
    colors = rng.rand(num_prims, 3).astype(np.float32) * 255.0

    lin = np.linspace(-1.0, 1.0, S, dtype=np.float32)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
    ax, ay, az = np.abs(xx), np.abs(yy), np.abs(zz)
    nx = np.where((ax >= ay) & (ax >= az), np.sign(xx), 0.0)
    ny = np.where((ay >= ax) & (ay >= az), np.sign(yy), 0.0)
    nz = np.where((az >= ax) & (az >= ay), np.sign(zz), 0.0)
    normal = np.stack([nx, -ny, -nz], axis=-1)
    normal /= np.maximum(np.linalg.norm(normal, axis=-1, keepdims=True), 1e-9)

    lightdir = -np.ones(3, np.float32) / np.sqrt(3.0)
    mult = np.clip((normal @ lightdir), 0.2, None) * 1.4  # [S,S,S]

    rgb = colors[:, None, None, None, :] * mult[None, ..., None]  # [K,S,S,S,3]
    a = np.full((num_prims, S, S, S, 1), alpha, np.float32)
    return jnp.asarray(np.concatenate([rgb, a], axis=-1))


def _render_pair(srt, feat, camera, prim_shape: int, num_steps: int,
                 max_hits: int):
    rgba = render_primx(srt, feat, camera, prim_shape=prim_shape,
                        num_steps=num_steps, max_hits=max_hits)
    boxes_payload = colored_box_payload(srt.shape[0], prim_shape)
    boxes = render_primx(srt, feat, camera, prim_shape=prim_shape,
                         num_steps=num_steps, max_hits=max_hits,
                         payload=boxes_payload)
    return np.asarray(rgba), np.asarray(boxes)


def visualize_primvolume(path: str, recon_param, height: int = 518,
                         width: int = 518, prim_shape: int | None = None,
                         num_steps: int = 128, max_hits: int = 8) -> None:
    """recon_param: [B, N, 4 + 6*S^3] (or PrimXParams); writes a
    side-by-side rgb|boxes JPEG (reference dva/visualize.py:215-293)."""
    import cv2

    if hasattr(recon_param, "srt"):  # PrimXParams
        recon_param = jnp.concatenate(
            [recon_param.srt, recon_param.feat], axis=-1)[None]
    rp = jnp.asarray(recon_param)[0]
    srt = rp[:, :4]
    feat = rp[:, 4:]
    if prim_shape is None:
        prim_shape = int(round(((rp.shape[1] - 4) / 6) ** (1 / 3)))
    cam = frontal_camera(height, width)
    rgb, boxes = _render_pair(srt, feat, cam, prim_shape, num_steps, max_hits)
    img = np.concatenate([rgb[..., :3], boxes[..., :3]], axis=1)
    cv2.imwrite(path, np.clip(img[..., ::-1], 0, 255).astype(np.uint8))


def visualize_video_primvolume(out_dir: str, recon_param, view_counts: int = 60,
                               height: int = 518, width: int = 518,
                               prim_shape: int | None = None,
                               num_steps: int = 128, max_hits: int = 8,
                               fps: int = 20,
                               with_materials: bool = True) -> None:
    """Orbit rgb.mp4 + prim.mp4 (reference dva/visualize.py:370-455), and
    — unlike the reference, whose app lists a mat.mp4 its visualizer
    never produces — an actual mat.mp4 (roughness=R, metallic=G)."""
    from .raymarch import render_primx

    rp = jnp.asarray(recon_param)[0]
    srt = rp[:, :4]
    feat = rp[:, 4:]
    if prim_shape is None:
        prim_shape = int(round(((rp.shape[1] - 4) / 6) ** (1 / 3)))
    mat_payload = (primx_to_payload(srt, feat, prim_shape, channels="mat")
                   if with_materials else None)

    angles = np.linspace(1.5, 3.5, view_counts + 1) * np.pi
    rgb_frames, box_frames, mat_frames = [], [], []
    for ang in angles:
        cam = orbit_camera(float(ang), height, width)
        rgb, boxes = _render_pair(srt, feat, cam, prim_shape, num_steps,
                                  max_hits)
        rgb_frames.append(np.clip(rgb[..., :3], 0, 255).astype(np.uint8))
        box_frames.append(np.clip(boxes[..., :3], 0, 255).astype(np.uint8))
        if mat_payload is not None:
            mat = np.asarray(render_primx(
                srt, feat, cam, prim_shape=prim_shape, num_steps=num_steps,
                max_hits=max_hits, payload=mat_payload))
            mat_frames.append(np.clip(mat[..., :3], 0, 255).astype(np.uint8))

    os.makedirs(out_dir, exist_ok=True)
    _write_video(os.path.join(out_dir, "rgb.mp4"), rgb_frames, fps)
    _write_video(os.path.join(out_dir, "prim.mp4"), box_frames, fps)
    if mat_frames:
        _write_video(os.path.join(out_dir, "mat.mp4"), mat_frames, fps)


def visualize_multiview_primvolume(path: str, recon_param, views: int = 4,
                                   height: int = 518, width: int = 518,
                                   prim_shape: int | None = None,
                                   num_steps: int = 128,
                                   max_hits: int = 8) -> None:
    """Grid of V orbit views, rgb row over colored-box row
    (reference dva/visualize.py:296-367)."""
    import cv2

    rp = jnp.asarray(recon_param)[0]
    srt = rp[:, :4]
    feat = rp[:, 4:]
    if prim_shape is None:
        prim_shape = int(round(((rp.shape[1] - 4) / 6) ** (1 / 3)))
    rgb_row, box_row = [], []
    for vi in range(views):
        cam = orbit_camera(2 * np.pi * vi / views, height, width)
        rgb, boxes = _render_pair(srt, feat, cam, prim_shape, num_steps,
                                  max_hits)
        rgb_row.append(rgb[..., :3])
        box_row.append(boxes[..., :3])
    img = np.concatenate(
        [np.concatenate(rgb_row, axis=1), np.concatenate(box_row, axis=1)],
        axis=0)
    cv2.imwrite(path, np.clip(img[..., ::-1], 0, 255).astype(np.uint8))


def _write_video(path: str, frames, fps: int) -> None:
    try:
        import imageio

        with imageio.get_writer(path, fps=fps) as w:
            for fr in frames:
                w.append_data(fr)
    except Exception:
        # no mp4 encoder in this environment: dump frames instead
        import cv2

        base = os.path.splitext(path)[0]
        os.makedirs(base, exist_ok=True)
        for i, fr in enumerate(frames):
            cv2.imwrite(f"{base}/{i:04d}.jpg", fr[..., ::-1])
