"""PrimX neural field — the 3D representation (TPU-native).

Capability parity with the reference PrimSDF (models/primsdf.py:10-136):
N volumetric primitives, each a (scale, position) plus a dense S^3 x 6
payload [SDF, R, G, B, roughness, metallic]; querying a 3D point blends
trilinear samples of every covering primitive with normalized tent
weights, and (at inference) fills uncovered space with a nearest-voxel
signed-distance approximation.

TPU-first re-design: the reference gathers a data-dependent set of
(point, prim) pairs and scatters with ``index_add_``
(models/primsdf.py:72-79) — dynamic shapes that XLA can't tile. Here the
candidate set is a FIXED top-K over the dense [P, N] weight matrix
(weights are exact because normalization uses the full sum; only
contributions beyond the K-th covering prim are dropped, and prims
overlap sparsely by construction), so every step is a static-shape
matmul/gather that lowers cleanly to MXU/VPU.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import (
    gather_volume_trilinear,
    gather_volume_trilinear_rows,
    rows_layout,
)


class PrimXParams(NamedTuple):
    """srt: [N, 4] = (scale, x, y, z); feat: [N, C * S^3] channel-major
    ([0:S^3]=SDF, [S^3:4S^3]=RGB, [4S^3:6S^3]=rough/metal), matching the
    reference parameterization (models/primsdf.py:26-33)."""

    srt: jnp.ndarray
    feat: jnp.ndarray


def zeros_params(num_prims: int = 2048, dim_feat: int = 6, prim_shape: int = 8):
    return PrimXParams(
        srt=jnp.zeros((num_prims, 4), jnp.float32),
        feat=jnp.zeros((num_prims, dim_feat * prim_shape**3), jnp.float32),
    )


def local_grid(prim_shape: int) -> np.ndarray:
    """Voxel-center offsets in xyz, flat index f = i*S^2 + j*S + k with
    (x, y, z) = (lin[k], lin[j], lin[i]) — the same memory order the payload
    volume uses (reference models/primsdf.py:37-41)."""
    lin = np.linspace(-1.0, 1.0, prim_shape, dtype=np.float32)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")  # index (i,j,k)
    # world x comes from the LAST (k) axis, z from the first (i)
    return np.stack([xx, yy, zz], axis=-1).reshape(-1, 3)


def prim_weights(srt: jnp.ndarray, x: jnp.ndarray):
    """Unnormalized tent weights w = relu(1 - ||(x-pos)/scale||_inf) and
    their sum (reference models/primsdf.py:104-109).

    x: [P, 3]; returns (w [P, N], wsum [P, 1]).
    """
    pos = srt[:, 1:4]
    scale = srt[:, 0:1]
    rel = (x[:, None, :] - pos[None, :, :]) / scale[None, :, :]
    w = jax.nn.relu(1.0 - jnp.max(jnp.abs(rel), axis=-1))
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    return w, wsum


def sdf2alpha(sdf: jnp.ndarray, var: float = 0.005) -> jnp.ndarray:
    """Soft SDF->opacity (reference models/primsdf.py:111-112)."""
    return jnp.exp(-((sdf / var) ** 2))


@partial(jax.jit, static_argnames=("dim_feat", "prim_shape", "top_k",
                                   "training", "with_fallback", "outputs",
                                   "selector", "gather"))
def query(
    params: PrimXParams,
    x: jnp.ndarray,
    dim_feat: int = 6,
    prim_shape: int = 8,
    top_k: int = 32,
    training: bool = False,
    with_fallback: bool = True,
    outputs: tuple | None = None,
    cand_idx: jnp.ndarray | None = None,
    selector: str = "exact",
    gather: str = "flat",
):
    """Evaluate the field at points x [P, 3] -> dict(sdf [P,1], tex [P,3],
    mat [P,2], feat [P,C]) (reference models/primsdf.py:52-102).

    top_k bounds how many covering prims contribute per point (static
    shape); the reference's dynamic gather has no such bound but prims
    rarely stack deeper than a handful.

    ``cand_idx`` [P, K]: caller-provided candidate prims per point (e.g.
    one slab test per lattice cell shared by its points) — skips the
    per-point dense-weight top_k, the single most expensive op of the
    query (measured 32 of 50 ms per 32k-point chunk on v5e); exact
    whenever the candidates cover every prim touching the point. Entries
    MUST be distinct per row (duplicates double-count in the blend);
    pad rows with any prim not covering the point.
    ``selector='approx'`` uses jax.lax.approx_max_k for the top_k
    (recall ~0.95 per bucket). Measured at bake scale on v5e it is NOT
    worth it: the dropped prims are not always far-tail — approx misses
    near-max-weight prims often enough to move texels ~35/255, i.e.
    well above uint8 quantization (47.6 dB vs an exact bake), while
    exact at k=24 is faster than approx at k=32 and 73 dB faithful.
    Kept for API completeness; the bake uses exact k=24.
    """
    N = params.srt.shape[0]
    S = prim_shape
    C = dim_feat
    pos = params.srt[:, 1:4]
    scale = params.srt[:, 0:1]

    if cand_idx is not None:
        idx = cand_idx
        pos_k = jnp.take(pos, idx, axis=0)      # [P, K, 3]
        scale_k = jnp.take(scale, idx, axis=0)  # [P, K, 1]
        coords = (x[:, None, :] - pos_k) / scale_k
        # exact tent weights over the candidate set; the normalizer is
        # the candidate sum (== dense wsum when candidates cover)
        w_top = jax.nn.relu(1.0 - jnp.max(jnp.abs(coords), axis=-1))
        wsum = jnp.sum(w_top, axis=-1, keepdims=True)
    else:
        w, wsum = prim_weights(params.srt, x)
        k = min(top_k, N)
        if selector == "approx":
            w_top, idx = jax.lax.approx_max_k(w, k)
        elif selector == "exact":
            w_top, idx = jax.lax.top_k(w, k)  # [P, K]
        else:
            raise ValueError(f"selector={selector!r}")

        # local coords of each point inside its top-K prims (xyz in [-1,1])
        pos_k = jnp.take(pos, idx, axis=0)      # [P, K, 3]
        scale_k = jnp.take(scale, idx, axis=0)  # [P, K, 1]
        coords = (x[:, None, :] - pos_k) / scale_k

    # sample only the channel range the caller needs (e.g. SDF-only grid
    # evaluation gathers 1 channel instead of 6)
    need = set(outputs) if outputs is not None else {"feat"}
    if need <= {"sdf"}:
        ch0, ch1 = 0, 1
    elif need <= {"tex", "mat"}:
        ch0, ch1 = 1, C
    else:
        ch0, ch1 = 0, C
    nch = ch1 - ch0

    if gather == "rows":
        # whole-x-row gathers: 4 takes of [S*nch] lanes per sample
        # instead of 8 takes of [nch] — see gather_volume_trilinear_rows
        row_vols = rows_layout(
            params.feat.reshape(N, C, S, S, S)[:, ch0:ch1])
        sampled = gather_volume_trilinear_rows(
            row_vols, idx, coords, (S, S, S))
    elif gather == "flat":
        # payload volumes as [N, S^3, nch] (channels last for lane gathers)
        vols = params.feat.reshape(N, C, S**3)[:, ch0:ch1].transpose(0, 2, 1)
        sampled = gather_volume_trilinear(vols, idx, coords, (S, S, S))
    else:
        raise ValueError(f"gather={gather!r}")

    wn = jnp.where(w_top > 0, w_top, 0.0) / (wsum + 1e-6)
    blended = jnp.sum(sampled * wn[..., None], axis=1)  # [P, nch]
    # place into a full channel view for uniform slicing below
    if (ch0, ch1) == (0, C):
        feat = blended
    else:
        feat = jnp.zeros((x.shape[0], C), blended.dtype)
        feat = feat.at[:, ch0:ch1].set(blended)

    if not training and with_fallback:
        # uncovered-point SDF fallback (models/primsdf.py:82-101)
        covered = (wsum[:, 0] > 0)
        dist = jnp.linalg.norm(x[:, None, :] - pos[None, :, :], axis=-1)
        near = jnp.argmin(dist, axis=-1)  # [P]
        near_pos = jnp.take(pos, near, axis=0)
        near_scale = jnp.take(scale, near, axis=0)
        grid = jnp.asarray(local_grid(S))  # [S^3, 3]
        cand = near_pos[:, None, :] + near_scale[:, :, None] * grid[None]
        pts_dist = jnp.linalg.norm(x[:, None, :] - cand, axis=-1)  # [P, S^3]
        min_dist = jnp.min(pts_dist, axis=-1)
        f_idx = jnp.argmin(pts_dist, axis=-1)
        feat_geo = params.feat[:, : S**3]
        sdf_near = feat_geo[near, f_idx]
        approx_sdf = sdf_near + min_dist * jnp.sign(sdf_near)
        sdf = jnp.where(covered, feat[:, 0], approx_sdf)[:, None]
    else:
        sdf = feat[:, 0:1]

    out = {
        "sdf": sdf,
        "tex": jnp.clip(feat[:, 1:4], 0.0, 1.0),
        "mat": jnp.clip(feat[:, 4:6], 0.0, 1.0),
        "feat": feat,
    }
    if outputs is not None:
        out = {k: out[k] for k in outputs}
    return out


def query_chunked(
    params: PrimXParams,
    pts: jnp.ndarray,
    chunk: int = 32768,
    **kw,
):
    """Field query over a large point set in fixed-size chunks (replaces
    the host-side chunk loop, reference inference.py:110-116).

    Dispatches one jitted ``query`` per chunk from Python: the calls
    queue asynchronously on the device (measured substantially faster
    than a single lax.map program, which XLA serializes poorly here).
    """
    P = pts.shape[0]
    pad = (-P) % chunk
    pts_p = jnp.pad(pts, ((0, pad), (0, 0)))
    batches = pts_p.reshape(-1, chunk, 3)
    cand = kw.pop("cand_idx", None)
    if cand is not None:
        # per-point candidate lists ride along with their chunk
        cand_p = jnp.pad(cand, ((0, pad), (0, 0))).reshape(
            batches.shape[0], chunk, -1)
        outs = [query(params, batches[i], cand_idx=cand_p[i], **kw)
                for i in range(batches.shape[0])]
        cat = {
            k: jnp.concatenate([o[k] for o in outs], axis=0)[:P]
            for k in outs[0]
        }
        return cat
    outs = [query(params, batches[i], **kw) for i in range(batches.shape[0])]
    cat = {
        k: jnp.concatenate([o[k] for o in outs], axis=0)[:P]
        for k in outs[0]
    }
    return cat


class PrimX(NamedTuple):
    """Lightweight model descriptor (constructed from config; the reference
    class also carries mesh-fitting state we keep in pipelines/fit)."""

    num_prims: int = 2048
    dim_feat: int = 6
    prim_shape: int = 8
    init_scale: float = 0.05
    sdf2alpha_var: float = 0.005
    auto_scale_init: bool = True
    init_sampling: str = "uniform"

    def init_params(self) -> PrimXParams:
        return zeros_params(self.num_prims, self.dim_feat, self.prim_shape)

    def query(self, params: PrimXParams, x: jnp.ndarray, **kw):
        kw.setdefault("dim_feat", self.dim_feat)
        kw.setdefault("prim_shape", self.prim_shape)
        return query(params, x, **kw)
