"""TPU-native volumetric-primitive raymarcher.

Functional replacement for the reference's CUDA raymarch stack
(dva/mvp/extensions/mvpraymarch/*: warp-synchronous BVH traversal +
fixed-step march + additive saturating accumulation,
mvpraymarch_subset_kernel.h:14-101). The CUDA design — divergent
per-thread BVH walks, shared-memory hit lists, atomics in backward — is
exactly what a TPU is bad at, so the algorithm is reshaped into dense
regular stages:

1. **Hit search**: a blocked [rays x K] slab test against all K
   axis-aligned prims (prim_rot == I on the reference's live path,
   dva/visualize.py:396) -> per-ray top-``max_hits`` prims ordered by
   entry distance (the CUDA kernel's insertion-sorted hit list,
   utils.h:728-845, capped at 512).
2. **Sampling**: ``num_steps`` positions are split evenly across the
   clipped [t_in, t_out] interval of EACH hit prim (so empty space is
   never sampled and the effective step inside geometry is ~40x finer
   than a uniform grid over the whole hit range — the reference needs
   its dt = 1/volradius = 1e-4 global step for the same reason: the
   sdf2alpha shell is razor thin). Each sample trilinearly reads its
   prim payload (ops/grid_sample) with the border fade
   exp(-fadescale * sum|y|^fadeexp) (primsampler.h:44-51).
3. **Compositing**: the reference's order-dependent additive clamp
   (newalpha = a + alpha*dt, contribution min(newalpha,1)-a,
   primaccum.h:63-79) is an exclusive-cumsum in disguise:
   contrib_i = min(cumsum_i, 1) - min(cumsum_{i-1}, 1). Samples are
   ordered along the ray with one argsort over their t values, then a
   cumsum reproduces the march without any sequential loop — XLA
   vectorizes the whole render.

Differences vs CUDA (documented): each sample carries its own
dt = interval/steps-per-prim instead of the global dt/volradius
(the accumulation is dt-normalized, so opacity matches to O(dt)).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.grid_sample import gather_volume_trilinear
from .camera import Camera


def subsample_rays(camera: Camera, factor: int, key=None):
    """Ray subsampling for training-time rendering (reference
    dva/ray_marcher.py:33-73): every ``factor``-th pixel, with a random
    phase when ``key`` is given (training) or the centered phase (eval).
    Returns (raypos, raydir, tminmax) on the subsampled [H/f, W/f] grid.
    """
    import jax.random as jrandom

    raypos, raydir, tmm = compute_rays(camera)
    if factor <= 1:
        return raypos, raydir, tmm
    if key is not None:
        off = jrandom.randint(key, (2,), 0, factor - 1)
        y0, x0 = int(off[0]), int(off[1])
    else:
        y0 = x0 = factor // 2
    sl = (slice(y0, y0 + factor * (camera.height // factor), factor),
          slice(x0, x0 + factor * (camera.width // factor), factor))
    return raypos[sl], raydir[sl], tmm[sl]


def compute_rays(camera: Camera):
    """Per-pixel origin/direction/t-range (reference
    utils/utils_kernel.cu:15-55): raydir = normalize(R^T [px, py, 1]),
    tminmax = ray ∩ [-1,1]^3, tmin clamped to 0."""
    H, W = camera.height, camera.width
    xs = (jnp.arange(W, dtype=jnp.float32) - camera.princpt[0]) / camera.focal[0]
    ys = (jnp.arange(H, dtype=jnp.float32) - camera.princpt[1]) / camera.focal[1]
    px, py = jnp.meshgrid(xs, ys)  # [H, W]
    d = jnp.stack([px, py, jnp.ones_like(px)], axis=-1)
    raydir = jnp.einsum("ij,hwi->hwj", camera.camrot, d)
    raydir = raydir / jnp.linalg.norm(raydir, axis=-1, keepdims=True)

    raypos = jnp.broadcast_to(camera.campos, raydir.shape)
    safe = jnp.where(jnp.abs(raydir) < 1e-12, 1e-12, raydir)
    t1 = (-1.0 - raypos) / safe
    t2 = (1.0 - raypos) / safe
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    return raypos, raydir, jnp.stack([jnp.maximum(tmin, 0.0), tmax], axis=-1)


@partial(jax.jit, static_argnames=("num_steps", "max_hits"))
def raymarch(
    payload: jnp.ndarray,        # [K, S, S, S, 4] rgb+alpha, channels-last
    prim_pos: jnp.ndarray,       # [K, 3] in normalized volume units
    prim_scale_inv: jnp.ndarray, # [K] or [K,3]: local = (x-pos)*scale_inv
    raypos: jnp.ndarray,         # [R, 3]
    raydir: jnp.ndarray,         # [R, 3]
    tminmax: jnp.ndarray,        # [R, 2]
    num_steps: int = 192,
    max_hits: int = 16,
    fadescale: float = 8.0,
    fadeexp: float = 8.0,
    prim_rot: jnp.ndarray | None = None,  # [K, 3, 3] world<-local rotation
    warp: jnp.ndarray | None = None,      # [K, S, S, S, 3] warp field
) -> jnp.ndarray:
    """March a flat chunk of rays. Returns rgba [R, 4] (rgb premultiplied,
    matching the reference output convention).

    With ``prim_rot`` the full SRT transform of the reference is applied:
    local = R^T (x - pos) * scale_inv (primtransf.h:69-180). The slab
    test then runs in each prim's local frame (the reference's forward2
    transforms the ray the same way). Without it, prims are axis-aligned
    (the reference's live inference path, dva/visualize.py:396).

    ``warp`` enables the reference's algo=1 warp-field indirection
    (primsampler.h:17-92, PrimSamplerTW<dowarp=true>): the local sample
    coordinate first trilinearly reads the per-prim warp volume, and the
    RESULT is the coordinate used to sample the rgba payload. The border
    fade and validity test stay on the pre-warp coordinate, exactly as
    in the CUDA kernel.
    """
    K, S = payload.shape[0], payload.shape[1]
    if prim_scale_inv.ndim == 1:
        prim_scale_inv = prim_scale_inv[:, None]
    extent = 1.0 / prim_scale_inv[:, 0]  # [K] half-extent

    tmin = tminmax[:, 0:1]
    tmax = tminmax[:, 1:2]
    if prim_rot is None:
        # ---- stage 1: world-frame slab test against all prims ------------
        lo = prim_pos - extent[:, None]
        hi = prim_pos + extent[:, None]
        safe = jnp.where(jnp.abs(raydir) < 1e-12, 1e-12, raydir)
        inv_d = 1.0 / safe                                     # [R, 3]
        t1 = (lo[None] - raypos[:, None, :]) * inv_d[:, None]  # [R, K, 3]
        t2 = (hi[None] - raypos[:, None, :]) * inv_d[:, None]
    else:
        # ---- stage 1: per-prim local-frame slab test ----------------------
        # o_loc = R^T (o - pos) / extent; d_loc = R^T d / extent; the prim
        # is the unit cube [-1, 1]^3 in its local frame
        o_rel = raypos[:, None, :] - prim_pos[None]            # [R, K, 3]
        o_loc = jnp.einsum("kij,rki->rkj", prim_rot, o_rel)
        d_loc = jnp.einsum("kij,ri->rkj", prim_rot, raydir)
        o_loc = o_loc / extent[None, :, None]
        d_loc = d_loc / extent[None, :, None]
        safe_d = jnp.where(jnp.abs(d_loc) < 1e-12, 1e-12, d_loc)
        t1 = (-1.0 - o_loc) / safe_d
        t2 = (1.0 - o_loc) / safe_d
    tin = jnp.max(jnp.minimum(t1, t2), axis=-1)            # [R, K]
    tout = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tout >= jnp.maximum(tin, tmin)) & (tin <= tmax) & (tout >= 0)

    big = jnp.float32(1e10)
    tin_h = jnp.where(hit, tin, big)
    any_hit = jnp.any(hit, axis=1)

    # top-max_hits prims by entry distance (ascending tin) — the CUDA
    # kernel's insertion-sorted hit list
    kh = min(max_hits, K)
    neg_tin, idx = jax.lax.top_k(-tin_h, kh)               # [R, kh]
    hit_valid = neg_tin > -big

    # ---- stage 2: per-prim interval sampling ------------------------------
    sp = max(num_steps // kh, 1)                           # samples per prim
    tin_k = jnp.maximum(jnp.take_along_axis(tin, idx, axis=1), tmin)
    tout_k = jnp.minimum(jnp.take_along_axis(tout, idx, axis=1), tmax)
    seg = jnp.maximum(tout_k - tin_k, 0.0) * hit_valid     # [R, kh]
    dt_k = seg / sp                                        # per-sample dt
    offs = (jnp.arange(sp, dtype=jnp.float32) + 0.5) / sp
    t = tin_k[..., None] + seg[..., None] * offs           # [R, kh, sp]
    pts = raypos[:, None, None, :] + raydir[:, None, None, :] * t[..., None]

    pos_k = jnp.take(prim_pos, idx, axis=0)                # [R, kh, 3]
    sinv_k = jnp.take(prim_scale_inv[:, 0], idx, axis=0)   # [R, kh]
    rel = pts - pos_k[:, :, None, :]                       # [R, kh, sp, 3]
    if prim_rot is not None:
        rot_k = jnp.take(prim_rot, idx, axis=0)            # [R, kh, 3, 3]
        rel = jnp.einsum("rkij,rksi->rksj", rot_k, rel)    # R^T rel
    y0 = rel * sinv_k[:, :, None, None]
    inside = jnp.all(jnp.abs(y0) < 1.0, axis=-1)           # [R, kh, sp]
    inside = inside & hit_valid[..., None]

    flat_payload = payload.reshape(K, S * S * S, 4)
    idx_full = jnp.broadcast_to(idx[:, :, None], y0.shape[:-1])
    y_sample = y0
    if warp is not None:
        # algo=1: warp-field indirection — the payload is sampled at the
        # warped coordinate; fade/validity keep using y0
        Sw = warp.shape[1]
        flat_warp = warp.reshape(K, Sw * Sw * Sw, 3)
        y_sample = gather_volume_trilinear(flat_warp, idx_full, y0,
                                           (Sw, Sw, Sw))
    samples = gather_volume_trilinear(flat_payload, idx_full, y_sample,
                                      (S, S, S))
    fade = jnp.exp(-fadescale * jnp.sum(jnp.abs(y0) ** fadeexp, axis=-1))
    alpha = samples[..., 3] * fade * inside                # [R, kh, sp]
    dA = alpha * dt_k[..., None]                           # [R, kh, sp]
    rgb = samples[..., :3]

    # ---- stage 3: global t-ordering + cumsum clamp -------------------------
    R = raypos.shape[0]
    t_flat = t.reshape(R, kh * sp)
    t_flat = jnp.where(dA.reshape(R, -1) > 0, t_flat, big)  # park empty samples
    order = jnp.argsort(t_flat, axis=1)
    dA_s = jnp.take_along_axis(dA.reshape(R, -1), order, axis=1)
    rgb_s = jnp.take_along_axis(
        rgb.reshape(R, -1, 3), order[..., None], axis=1)

    A = jnp.cumsum(dA_s, axis=1)
    contrib = jnp.minimum(A, 1.0) - jnp.minimum(A - dA_s, 1.0)
    rgb_out = jnp.sum(rgb_s * contrib[..., None], axis=1)
    alpha_out = jnp.minimum(A[:, -1], 1.0)

    rgba = jnp.concatenate([rgb_out, alpha_out[:, None]], axis=-1)
    return jnp.where(any_hit[:, None], rgba, 0.0)


def render_primx(
    srt: jnp.ndarray,
    feat: jnp.ndarray,
    camera: Camera,
    prim_shape: int = 8,
    num_steps: int = 192,
    max_hits: int = 16,
    chunk: int = 32768,
    payload: jnp.ndarray | None = None,
    prim_rot: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Render a PrimX asset -> rgba image [H, W, 4] (rgb in 0..255 scale,
    like the reference pipeline's payloads, dva/visualize.py:390-391).
    ``prim_rot`` [K, 3, 3] enables the full SRT prim transform."""
    from .visualize import primx_to_payload

    if payload is None:
        payload = primx_to_payload(srt, feat, prim_shape)
    pos = srt[:, 1:4]
    sinv = 1.0 / srt[:, 0]

    raypos, raydir, tmm = compute_rays(camera)
    H, W = camera.height, camera.width
    R = H * W
    rp = raypos.reshape(R, 3)
    rd = raydir.reshape(R, 3)
    tm = tmm.reshape(R, 2)
    pad = (-R) % chunk
    if pad:
        rp = jnp.pad(rp, ((0, pad), (0, 0)))
        rd = jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
        tm = jnp.pad(tm, ((0, pad), (0, 0)))

    def body(args):
        return raymarch(payload, pos, sinv, *args,
                        num_steps=num_steps, max_hits=max_hits,
                        prim_rot=prim_rot)

    out = jax.lax.map(body, (rp.reshape(-1, chunk, 3),
                             rd.reshape(-1, chunk, 3),
                             tm.reshape(-1, chunk, 2)))
    return out.reshape(-1, 4)[:R].reshape(H, W, 4)
