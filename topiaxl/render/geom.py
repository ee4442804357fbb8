"""UV-space and 3D geometry utilities (TPU-native, jnp).

Functional counterparts of the reference's dva/geom.py (symbols at
geom.py:39-621): face/vertex normals, TBN frames, UV barycentric index
images (+impaint), sample_uv / values_to_uv, axis-angle <-> rotation
matrix, rotation interpolation, and multi-camera point projection.
The reference module is off the live inference path (legacy MVP
training support) but several pieces back training-time texture
supervision, so they are provided as dense jnp ops (no per-vertex
Python loops, no torch scatter)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# normals / frames
# ---------------------------------------------------------------------------

def face_normals(v: jnp.ndarray, vi: jnp.ndarray, eps: float = 1e-5):
    """[B, V, 3], [F, 3] -> [B, F, 3] unit face normals
    (reference geom.py:419-427)."""
    p0 = jnp.take(v, vi[:, 0], axis=-2)
    p1 = jnp.take(v, vi[:, 1], axis=-2)
    p2 = jnp.take(v, vi[:, 2], axis=-2)
    n = jnp.cross(p1 - p0, p2 - p0)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), eps)


def vert_normals(v: jnp.ndarray, vi: jnp.ndarray, eps: float = 1e-5):
    """Area-weighted vertex normals, batched (reference geom.py:430-440).
    v: [B, V, 3] or [V, 3]."""
    squeeze = v.ndim == 2
    if squeeze:
        v = v[None]
    fn = face_normals(v, vi, eps)  # area-weighted via unnormalized cross?
    # use the unnormalized cross for area weighting
    p0 = jnp.take(v, vi[:, 0], axis=-2)
    p1 = jnp.take(v, vi[:, 1], axis=-2)
    p2 = jnp.take(v, vi[:, 2], axis=-2)
    fn = jnp.cross(p1 - p0, p2 - p0)  # [B, F, 3]
    V = v.shape[-2]

    def accum(vnb, fnb):
        out = jnp.zeros((V, 3), fnb.dtype)
        for c in range(3):
            out = out.at[vi[:, c]].add(fnb)
        return out

    vn = jax.vmap(accum)(v, fn)
    vn = vn / jnp.maximum(jnp.linalg.norm(vn, axis=-1, keepdims=True), eps)
    return vn[0] if squeeze else vn


def compute_view_cos(verts, faces, camera_pos):
    """Cosine between face normal and view direction
    (reference geom.py:443-446)."""
    fn = face_normals(verts[None] if verts.ndim == 2 else verts, faces)
    center = jnp.mean(
        jnp.stack([jnp.take(verts, faces[:, c], axis=-2) for c in range(3)]),
        axis=0)
    d = camera_pos - center
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    return jnp.einsum("...fd,...fd->...f", fn, d)


def compute_tbn(geom, vt, vi, vti):
    """Per-face tangent/bitangent/normal from positions + UVs
    (reference geom.py:449-491). geom [B, V, 3] or [V, 3]."""
    squeeze = geom.ndim == 2
    if squeeze:
        geom = geom[None]
    p0 = jnp.take(geom, vi[:, 0], axis=-2)
    p1 = jnp.take(geom, vi[:, 1], axis=-2)
    p2 = jnp.take(geom, vi[:, 2], axis=-2)
    t0 = vt[vti[:, 0]]
    t1 = vt[vti[:, 1]]
    t2 = vt[vti[:, 2]]
    e1 = p1 - p0
    e2 = p2 - p0
    u1 = (t1 - t0)[None]
    u2 = (t2 - t0)[None]
    det = u1[..., 0] * u2[..., 1] - u1[..., 1] * u2[..., 0]
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    inv = 1.0 / det
    tangent = (e1 * u2[..., 1:2] - e2 * u1[..., 1:2]) * inv[..., None]
    bitangent = (e2 * u1[..., 0:1] - e1 * u2[..., 0:1]) * inv[..., None]
    normal = jnp.cross(e1, e2)

    def unit(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                               1e-9)

    tangent, normal = unit(tangent), unit(normal)
    # orthogonalize b against t, n
    bitangent = unit(jnp.cross(normal, tangent)) * jnp.sign(
        jnp.einsum("...d,...d->...", bitangent, jnp.cross(normal, tangent))
    )[..., None]
    if squeeze:
        return tangent[0], bitangent[0], normal[0]
    return tangent, bitangent, normal


# ---------------------------------------------------------------------------
# rotations
# ---------------------------------------------------------------------------

def axisangle_to_matrix(rvec: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: [..., 3] -> [..., 3, 3] (reference geom.py:562-595)."""
    theta = jnp.linalg.norm(rvec, axis=-1, keepdims=True)
    axis = rvec / jnp.maximum(theta, 1e-12)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1),
    ], -2)
    t = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    return eye + jnp.sin(t) * K + (1.0 - jnp.cos(t)) * (K @ K)


def matrix_to_axisangle(r: jnp.ndarray):
    """[..., 3, 3] -> (axis [..., 3], angle [..., 1])
    (reference geom.py:545-559)."""
    trace = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    theta = jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0))[..., None]
    vec = 0.5 * jnp.stack([
        r[..., 2, 1] - r[..., 1, 2],
        r[..., 0, 2] - r[..., 2, 0],
        r[..., 1, 0] - r[..., 0, 1],
    ], -1)
    axis = vec / jnp.maximum(jnp.sin(theta), 1e-9)
    return axis, theta


def rotation_interp(r0: jnp.ndarray, r1: jnp.ndarray, alpha: float):
    """Geodesic rotation interpolation (reference geom.py:598-607)."""
    rel = r1 @ jnp.swapaxes(r0, -1, -2)
    axis, theta = matrix_to_axisangle(rel)
    return axisangle_to_matrix(axis * theta * alpha) @ r0


# ---------------------------------------------------------------------------
# UV-space machinery
# ---------------------------------------------------------------------------

def make_uv_barys(vt: np.ndarray, vti: np.ndarray, size: int):
    """Rasterize the UV atlas into per-texel (face index, barycentrics)
    maps (reference make_uv_face_index + make_uv_barys, geom.py:72-199).
    Returns (index_img [H, W] int32, -1 where empty; bary_img [H, W, 3])."""
    from ..extract.rasterize import rasterize_uv_atlas

    F = len(vti)
    uvc = np.asarray(vt, np.float32)[np.asarray(vti, np.int64)]
    # attributes: (face id, bary0, bary1) — bary2 = 1 - b0 - b1
    attr = np.zeros((F, 3, 3), np.float32)
    attr[:, :, 0] = np.arange(F, dtype=np.float32)[:, None]
    attr[:, 0, 1] = 1.0
    attr[:, 1, 2] = 1.0
    out, mask = rasterize_uv_atlas(uvc, attr, size, size)
    index_img = np.where(mask, np.round(out[..., 0]).astype(np.int32), -1)
    b0 = out[..., 1]
    b1 = out[..., 2]
    bary = np.stack([b0, b1, 1.0 - b0 - b1], -1).astype(np.float32)
    bary[~mask] = 0.0
    return index_img, bary


def index_image_impaint(index_img: np.ndarray, bary_img=None,
                        distance_threshold: int = 100):
    """Fill empty texels with their nearest covered texel's indices
    (reference geom.py:201-250) via an exact EDT."""
    from scipy import ndimage

    mask = index_img >= 0
    dist, (iy, ix) = ndimage.distance_transform_edt(
        ~mask, return_indices=True)
    take = (~mask) & (dist <= distance_threshold)
    out = index_img.copy()
    out[take] = index_img[iy[take], ix[take]]
    if bary_img is None:
        return out
    bout = bary_img.copy()
    bout[take] = bary_img[iy[take], ix[take]]
    return out, bout


def make_postex(v, index_img, bary_img, faces):
    """Per-texel 3D positions from barycentric maps
    (reference geom.py:537-542): positions are just vertex values splatted
    through the barycentric index images."""
    return values_to_uv(jnp.asarray(v), index_img, bary_img,
                        jnp.asarray(faces))


def values_to_uv(values: jnp.ndarray, index_img, bary_img,
                 faces: jnp.ndarray):
    """Splat per-VERTEX values into UV space through the barycentric maps
    (reference geom.py:400-416). values [V, C] -> [H, W, C]."""
    idx = jnp.maximum(jnp.asarray(index_img), 0)
    tri = jnp.take(faces, idx, axis=0)             # [H, W, 3]
    corner_vals = jnp.take(values, tri, axis=0)    # [H, W, 3, C]
    b = jnp.asarray(bary_img)[..., None]
    out = jnp.sum(corner_vals * b, axis=-2)
    return jnp.where(jnp.asarray(index_img)[..., None] >= 0, out, 0.0)


def sample_uv(img: jnp.ndarray, uv: jnp.ndarray):
    """Bilinearly sample a texture [H, W, C] at uv [N, 2] in [0, 1]
    (reference geom.py:363-397; texel center convention matches
    extract/rasterize.py)."""
    H, W, C = img.shape
    x = uv[:, 0] * W - 0.5
    y = uv[:, 1] * H - 0.5
    x0 = jnp.clip(jnp.floor(x), 0, W - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = jnp.clip(x - x0, 0.0, 1.0)[:, None]
    fy = jnp.clip(y - y0, 0.0, 1.0)[:, None]
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


# ---------------------------------------------------------------------------
# cameras
# ---------------------------------------------------------------------------

def project_points_multi(p: jnp.ndarray, Rt: jnp.ndarray, K: jnp.ndarray,
                         normalize: bool = False, size=None):
    """Project [B, N, 3] world points through C cameras
    (Rt [C, 3, 4], K [C, 3, 3]) -> pixels [B, C, N, 2] + depth [B, C, N]
    (reference geom.py:621-641)."""
    cam = (jnp.einsum("cij,bnj->bcni", Rt[:, :, :3], p)
           + Rt[None, :, None, :, 3])
    depth = cam[..., 2]
    proj = jnp.einsum("cij,bcnj->bcni", K, cam)
    pix = proj[..., :2] / jnp.maximum(proj[..., 2:3], 1e-9)
    if normalize and size is not None:
        wh = jnp.asarray([size[1], size[0]], jnp.float32)
        pix = 2.0 * pix / wh - 1.0
    return pix, depth
