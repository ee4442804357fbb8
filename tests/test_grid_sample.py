"""Parity of topiaxl grid sampling vs torch.nn.functional.grid_sample
(the executable spec of reference models/primsdf.py:76 and the CUDA
trilinear sampler, mvpraymarch/utils.h:407-641)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from topiaxl.ops import gather_volume_trilinear, grid_sample_3d


def _torch_ref(vol, coords):
    # vol [C,D,H,W], coords [P,3] xyz in [-1,1]
    v = torch.from_numpy(vol)[None]
    g = torch.from_numpy(coords)[None, :, None, None, :]  # [1,P,1,1,3]
    out = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                        align_corners=True)
    return out[0, :, :, 0, 0].T.numpy()  # [P, C]


def test_grid_sample_3d_matches_torch_interior():
    rng = np.random.default_rng(0)
    vol = rng.standard_normal((6, 8, 8, 8)).astype(np.float32)
    coords = rng.uniform(-0.99, 0.99, size=(128, 3)).astype(np.float32)
    ours = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords)))
    ref = _torch_ref(vol, coords)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_3d_matches_torch_outside():
    rng = np.random.default_rng(1)
    vol = rng.standard_normal((3, 4, 5, 6)).astype(np.float32)
    coords = rng.uniform(-1.8, 1.8, size=(256, 3)).astype(np.float32)
    ours = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords)))
    ref = _torch_ref(vol, coords)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_exact_corners_and_centers():
    vol = np.arange(2 * 2 * 2, dtype=np.float32).reshape(1, 2, 2, 2)
    # corner (-1,-1,-1) -> voxel [0,0,0]; (1,1,1) -> voxel [1,1,1]
    coords = np.array([[-1, -1, -1], [1, 1, 1], [0, 0, 0]], np.float32)
    out = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords)))[:, 0]
    np.testing.assert_allclose(out, [0.0, 7.0, vol.mean()], atol=1e-6)


def test_gather_volume_trilinear_multi():
    rng = np.random.default_rng(2)
    N, C, S = 5, 6, 8
    vols = rng.standard_normal((N, C, S, S, S)).astype(np.float32)
    flat = jnp.asarray(vols.reshape(N, C, S**3).transpose(0, 2, 1))
    idx = rng.integers(0, N, size=(64, 4)).astype(np.int32)
    coords = rng.uniform(-1.2, 1.2, size=(64, 4, 3)).astype(np.float32)
    ours = np.asarray(
        gather_volume_trilinear(flat, jnp.asarray(idx), jnp.asarray(coords),
                                (S, S, S))
    )
    for p in range(0, 64, 17):
        for k in range(4):
            ref = _torch_ref(vols[idx[p, k]], coords[p, k][None])
            np.testing.assert_allclose(ours[p, k], ref[0], atol=1e-5)


def test_rows_gather_matches_flat():
    """gather_volume_trilinear_rows == gather_volume_trilinear on random
    volumes/points, C=1 and C=5, including out-of-range coords."""
    import numpy as np

    from topiaxl.ops.grid_sample import (
        gather_volume_trilinear,
        gather_volume_trilinear_rows,
        rows_layout,
    )

    rng = np.random.default_rng(0)
    for C in (1, 5):
        N, S, P = 7, 8, 513
        vols = rng.standard_normal((N, C, S, S, S)).astype("f")
        idx = rng.integers(0, N, (P,)).astype("i4")
        coords = rng.uniform(-1.3, 1.3, (P, 3)).astype("f")
        flat = jnp.asarray(vols.reshape(N, C, S**3).transpose(0, 2, 1))
        ref = gather_volume_trilinear(
            flat, jnp.asarray(idx), jnp.asarray(coords), (S, S, S))
        rows = rows_layout(jnp.asarray(vols))
        got = gather_volume_trilinear_rows(
            rows, jnp.asarray(idx), jnp.asarray(coords), (S, S, S))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_query_gather_rows_matches_flat():
    import numpy as np

    from topiaxl.models import primx as primx_lib

    rng = np.random.default_rng(1)
    n = 64
    srt = np.concatenate([
        rng.uniform(0.05, 0.2, (n, 1)),
        rng.uniform(-0.8, 0.8, (n, 3)),
    ], 1).astype("f")
    feat = rng.standard_normal((n, 6 * 512)).astype("f")
    params = primx_lib.PrimXParams(jnp.asarray(srt), jnp.asarray(feat))
    pts = jnp.asarray(rng.uniform(-1, 1, (257, 3)).astype("f"))
    a = primx_lib.query(params, pts, top_k=8, gather="flat")
    b = primx_lib.query(params, pts, top_k=8, gather="rows")
    for k in a:
        np.testing.assert_allclose(np.asarray(b[k]), np.asarray(a[k]),
                                   atol=1e-5, rtol=1e-4)
