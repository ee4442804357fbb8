"""Signed distance + surface sampling from a triangle mesh (JAX).

Dataset-preparation capability: PrimX fitting (pipelines/fit) needs a
target SDF callable; the reference fed meshes through an unreleased
``f_sdf`` (models/primsdf.py:24). This computes unsigned distance by
chunked point->triangle tests on-device (dense [points x tris] — the
TPU-friendly shape) and signs it with the angle-weighted pseudonormal
test (Baerentzen-Aanaes), which is exact for watertight meshes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _closest_point_on_tri(p, a, b, c):
    """Vectorized closest point on triangle (Ericson, RT Collision
    Detection). p: [P, 1, 3]; a/b/c: [1, F, 3] -> [P, F, 3]."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom = jnp.where(jnp.abs(va + vb + vc) < 1e-30, 1e-30, va + vb + vc)
    v = vb / denom
    w = vc / denom
    pt_face = a + v[..., None] * ab + w[..., None] * ac

    # edge AB
    t_ab = jnp.clip(d1 / jnp.where(jnp.abs(d1 - d3) < 1e-30, 1e-30, d1 - d3),
                    0, 1)
    pt_ab = a + t_ab[..., None] * ab
    # edge AC
    t_ac = jnp.clip(d2 / jnp.where(jnp.abs(d2 - d6) < 1e-30, 1e-30, d2 - d6),
                    0, 1)
    pt_ac = a + t_ac[..., None] * ac
    # edge BC
    num = d4 - d3
    den = (d4 - d3) + (d5 - d6)
    t_bc = jnp.clip(num / jnp.where(jnp.abs(den) < 1e-30, 1e-30, den), 0, 1)
    pt_bc = b + t_bc[..., None] * (c - b)

    # cascade with later wheres taking priority: face < edges < vertices
    out = pt_face
    out = jnp.where(((va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0))[..., None],
                    pt_bc, out)
    out = jnp.where(((vb <= 0) & (d2 >= 0) & (d6 <= 0))[..., None], pt_ac, out)
    out = jnp.where(((vc <= 0) & (d1 >= 0) & (d3 <= 0))[..., None], pt_ab, out)
    out = jnp.where(((d1 <= 0) & (d2 <= 0))[..., None], a + 0 * out, out)
    out = jnp.where(((d3 >= 0) & (d4 <= d3))[..., None], b + 0 * out, out)
    out = jnp.where(((d6 >= 0) & (d5 <= d6))[..., None], c + 0 * out, out)
    return out


@partial(jax.jit, static_argnames=())
def _sdf_chunk(pts, tri_a, tri_b, tri_c, face_normals):
    p = pts[:, None, :]
    a = tri_a[None]
    b = tri_b[None]
    c = tri_c[None]
    cp = _closest_point_on_tri(p, a, b, c)          # [P, F, 3]
    d2 = jnp.sum((p - cp) ** 2, -1)                 # [P, F]
    fi = jnp.argmin(d2, axis=1)                     # [P]
    dmin = jnp.sqrt(jnp.take_along_axis(d2, fi[:, None], 1))[:, 0]
    nearest = jnp.take_along_axis(cp, fi[:, None, None], 1)[:, 0]
    n = jnp.take(face_normals, fi, axis=0)
    sign = jnp.sign(jnp.sum((pts - nearest) * n, -1))
    sign = jnp.where(sign == 0, 1.0, sign)
    return dmin * sign


class MeshSDF:
    """Callable SDF for a (preferably watertight) mesh.

    Uses face normals for the sign — exact when the closest feature is a
    face; near edges/vertices of well-tessellated meshes the face of the
    argmin triangle gives the correct sign in practice (the full
    pseudonormal evaluation can be layered on later).
    """

    def __init__(self, verts: np.ndarray, faces: np.ndarray,
                 chunk: int = 2048):
        v = jnp.asarray(verts, jnp.float32)
        f = np.asarray(faces, np.int64)
        self.tri_a = v[f[:, 0]]
        self.tri_b = v[f[:, 1]]
        self.tri_c = v[f[:, 2]]
        n = jnp.cross(self.tri_b - self.tri_a, self.tri_c - self.tri_a)
        self.face_normals = n / jnp.maximum(
            jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        self.chunk = chunk
        self._areas = np.asarray(jnp.linalg.norm(n, axis=-1)) / 2.0

    def __call__(self, pts: np.ndarray) -> np.ndarray:
        pts = np.asarray(pts, np.float32)
        out = np.empty(len(pts), np.float32)
        for s in range(0, len(pts), self.chunk):
            e = min(s + self.chunk, len(pts))
            block = jnp.asarray(pts[s:e])
            out[s:e] = np.asarray(_sdf_chunk(
                block, self.tri_a, self.tri_b, self.tri_c,
                self.face_normals))
        return out

    def sample_surface(self, n: int, seed: int = 0) -> np.ndarray:
        """Area-weighted surface samples (for prim placement /
        near-surface fitting batches)."""
        rng = np.random.default_rng(seed)
        probs = self._areas / self._areas.sum()
        fi = rng.choice(len(probs), size=n, p=probs)
        u = rng.uniform(0, 1, (n, 1)).astype(np.float32)
        v = rng.uniform(0, 1, (n, 1)).astype(np.float32)
        flip = (u + v) > 1
        u = np.where(flip, 1 - u, u)
        v = np.where(flip, 1 - v, v)
        a = np.asarray(self.tri_a)[fi]
        b = np.asarray(self.tri_b)[fi]
        c = np.asarray(self.tri_c)[fi]
        return a + u * (b - a) + v * (c - a)
