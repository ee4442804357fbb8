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
