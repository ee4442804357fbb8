"""Trilinear volume sampling with exact ``torch.nn.functional.grid_sample``
semantics (mode='bilinear', padding_mode='zeros', align_corners=True).

This is the parity-critical primitive behind PrimX field queries
(reference models/primsdf.py:76) and the raymarcher's payload sampling
(reference dva/mvp/extensions/mvpraymarch/utils.h:407-641). The reference
does sparse per-pair CUDA grid_sample calls; on TPU we express sampling as
dense 8-corner gathers + lerp so XLA lowers it to vectorized gathers —
no data-dependent shapes.

Coordinate convention (torch): ``coords[..., 0]`` indexes the LAST (W)
axis, ``coords[..., 1]`` the H axis, ``coords[..., 2]`` the D axis; all in
[-1, 1] with -1/+1 mapping to voxel centers 0 and size-1 (align_corners).
"""

from __future__ import annotations

import jax.numpy as jnp


def _corner_setup(coords, sizes):
    """Shared unnormalize + corner index/weight computation.

    coords: [..., 3] in xyz (W,H,D) order; sizes: (D, H, W).
    Returns per-axis (i0, i1, frac, valid0, valid1) for D,H,W axes.
    """
    D, H, W = sizes
    # unnormalize: align_corners=True => x = (c+1)/2 * (size-1)
    cx = (coords[..., 0] + 1.0) * 0.5 * (W - 1)
    cy = (coords[..., 1] + 1.0) * 0.5 * (H - 1)
    cz = (coords[..., 2] + 1.0) * 0.5 * (D - 1)

    out = []
    for c, size in ((cz, D), (cy, H), (cx, W)):
        i0 = jnp.floor(c)
        frac = c - i0
        i0i = i0.astype(jnp.int32)
        i1i = i0i + 1
        valid0 = (i0i >= 0) & (i0i <= size - 1)
        valid1 = (i1i >= 0) & (i1i <= size - 1)
        out.append((jnp.clip(i0i, 0, size - 1), jnp.clip(i1i, 0, size - 1),
                    frac, valid0, valid1))
    return out  # [(z...), (y...), (x...)]


def gather_volume_trilinear(flat_vols: jnp.ndarray, vol_idx: jnp.ndarray,
                            coords: jnp.ndarray, sizes: tuple[int, int, int]):
    """Sample many volumes at one point each, via flat gathers.

    flat_vols: [N, D*H*W, C] — N volumes, channels last (TPU lane dim).
    vol_idx:   [...] int32 — which volume each sample reads.
    coords:    [..., 3] xyz in [-1, 1].
    Returns [..., C] trilinearly interpolated values (zeros padding).
    """
    D, H, W = sizes
    (z0, z1, fz, vz0, vz1), (y0, y1, fy, vy0, vy1), (x0, x1, fx, vx0, vx1) = \
        _corner_setup(coords, sizes)

    n_cells = D * H * W
    base = vol_idx.astype(jnp.int32) * n_cells
    flat = flat_vols.reshape(-1, flat_vols.shape[-1])

    def corner(zi, yi, xi, vz, vy, vx, wz, wy, wx):
        idx = base + (zi * H + yi) * W + xi
        vals = jnp.take(flat, idx, axis=0)  # [..., C]
        w = (wz * wy * wx) * (vz & vy & vx).astype(vals.dtype)
        return vals * w[..., None]

    one = jnp.float32(1.0)
    out = (
        corner(z0, y0, x0, vz0, vy0, vx0, one - fz, one - fy, one - fx)
        + corner(z0, y0, x1, vz0, vy0, vx1, one - fz, one - fy, fx)
        + corner(z0, y1, x0, vz0, vy1, vx0, one - fz, fy, one - fx)
        + corner(z0, y1, x1, vz0, vy1, vx1, one - fz, fy, fx)
        + corner(z1, y0, x0, vz1, vy0, vx0, fz, one - fy, one - fx)
        + corner(z1, y0, x1, vz1, vy0, vx1, fz, one - fy, fx)
        + corner(z1, y1, x0, vz1, vy1, vx0, fz, fy, one - fx)
        + corner(z1, y1, x1, vz1, vy1, vx1, fz, fy, fx)
    )
    return out


def gather_volume_trilinear_rows(row_vols: jnp.ndarray, vol_idx: jnp.ndarray,
                                 coords: jnp.ndarray,
                                 sizes: tuple[int, int, int]):
    """Same contract as gather_volume_trilinear, but over a row-major
    layout that gathers WHOLE X-ROWS: 4 takes of [W*C] lanes per sample
    instead of 8 takes of [C] lanes. Narrow (C=1) gathers waste almost
    the entire VPU lane width; pulling the 8-voxel x-row amortizes the
    per-row gather cost and turns the x-lerp into a dense masked
    reduction over lanes.

    row_vols: [N, D*H, W*C] — channels fastest within a row
              (reshape of [N, C, D, H, W] via transpose(0,2,3,1? ...)
              produced by ``rows_layout``).
    vol_idx:  [...] int32; coords: [..., 3] xyz in [-1, 1].
    Returns [..., C].
    """
    D, H, W = sizes
    C = row_vols.shape[-1] // W
    (z0, z1, fz, vz0, vz1), (y0, y1, fy, vy0, vy1), (x0, x1, fx, vx0, vx1) = \
        _corner_setup(coords, sizes)

    flat = row_vols.reshape(-1, W * C)
    base = vol_idx.astype(jnp.int32) * (D * H)

    # dense x-lerp weights over the row: one-hot(x0)*(1-fx) + one-hot(x1)*fx
    iota = jnp.arange(W, dtype=jnp.int32)
    wx = ((iota == x0[..., None]).astype(jnp.float32)
          * ((1.0 - fx) * vx0.astype(jnp.float32))[..., None]
          + (iota == x1[..., None]).astype(jnp.float32)
          * (fx * vx1.astype(jnp.float32))[..., None])      # [..., W]

    def xrow(zi, yi, vz, vy, wz, wy):
        rows = jnp.take(flat, base + zi * H + yi, axis=0)    # [..., W*C]
        rows = rows.reshape(*rows.shape[:-1], W, C)
        v = jnp.sum(rows * wx[..., None], axis=-2)           # [..., C]
        w = (wz * wy) * (vz & vy).astype(v.dtype)
        return v * w[..., None]

    one = jnp.float32(1.0)
    return (
        xrow(z0, y0, vz0, vy0, one - fz, one - fy)
        + xrow(z0, y1, vz0, vy1, one - fz, fy)
        + xrow(z1, y0, vz1, vy0, fz, one - fy)
        + xrow(z1, y1, vz1, vy1, fz, fy)
    )


def rows_layout(vols_c_first: jnp.ndarray) -> jnp.ndarray:
    """[N, C, D, H, W] -> the [N, D*H, W*C] layout of
    gather_volume_trilinear_rows (channels fastest within each x-row)."""
    N, C, D, H, W = vols_c_first.shape
    return vols_c_first.transpose(0, 2, 3, 4, 1).reshape(N, D * H, W * C)


def grid_sample_3d(vol: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample one volume at many points.

    vol:    [C, D, H, W]
    coords: [..., 3] xyz in [-1, 1] (torch grid_sample convention)
    Returns [..., C].
    """
    C, D, H, W = vol.shape
    flat = vol.reshape(C, D * H * W).T[None]  # [1, DHW, C]
    idx = jnp.zeros(coords.shape[:-1], dtype=jnp.int32)
    return gather_volume_trilinear(flat, idx, coords, (D, H, W))
