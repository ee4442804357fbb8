"""Training data pipeline.

The reference's dataset/loader never shipped (README.md:50-58); its
config implies per-asset tensors: normalized PrimX tokens [N, 68] plus
conditioning images. This module provides:

* ``TokenShardDataset`` — sharded .npz files of precomputed (x tokens,
  y cond tokens); memory-mapped reads, deterministic global shuffling,
  per-host sharding for multi-host meshes, and double-buffered
  host->device prefetch (the TPU-native replacement for torch
  DataLoader workers: IO overlaps the current step's compute).
* ``synthetic_batches`` — an infinite random stream for smoke tests and
  benchmarking.
* ``encode_assets`` — build tokens from raw PrimX params with the VAE
  encoder + latent stats (the dataset-preparation step).
"""

from __future__ import annotations

import glob as globlib
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


class TokenShardDataset:
    """Reads shards saved as npz with arrays 'x' [M, N, C] and 'y'
    [M, My, Cy]."""

    def __init__(self, pattern: str, batch_size: int,
                 shuffle_seed: int = 0,
                 host_id: Optional[int] = None,
                 host_count: Optional[int] = None):
        self.files = sorted(globlib.glob(pattern))
        if not self.files:
            raise FileNotFoundError(f"no shards match {pattern}")
        self.batch_size = batch_size
        self.seed = shuffle_seed
        self.host_id = jax.process_index() if host_id is None else host_id
        self.host_count = (
            jax.process_count() if host_count is None else host_count)

        self._index = []  # (file_idx, row)
        for fi, f in enumerate(self.files):
            with np.load(f, mmap_mode="r") as z:
                rows = z["x"].shape[0]
            self._index.extend((fi, r) for r in range(rows))

    def __len__(self) -> int:
        return len(self._index)

    def epoch(self, epoch: int) -> Iterator[dict]:
        rng = np.random.default_rng(self.seed + epoch)
        order = rng.permutation(len(self._index))
        order = order[self.host_id::self.host_count]
        opened: dict[int, np.lib.npyio.NpzFile] = {}

        def get(fi):
            if fi not in opened:
                opened[fi] = np.load(self.files[fi], mmap_mode="r")
            return opened[fi]

        n_batches = len(order) // self.batch_size
        for b in range(n_batches):
            sel = order[b * self.batch_size:(b + 1) * self.batch_size]
            xs, ys = [], []
            for o in sel:
                fi, r = self._index[o]
                z = get(fi)
                xs.append(np.asarray(z["x"][r]))
                ys.append(np.asarray(z["y"][r]))
            yield {"x": np.stack(xs), "y": np.stack(ys)}
        for z in opened.values():
            z.close()


def prefetch_to_device(it: Iterator[dict], sharding=None, depth: int = 2):
    """Double-buffer host batches onto the device/mesh so transfer
    overlaps compute."""
    buf = []
    for batch in it:
        arrs = {k: jnp.asarray(v) for k, v in batch.items()}
        if sharding is not None:
            arrs = {k: jax.device_put(v, sharding) for k, v in arrs.items()}
        buf.append(arrs)
        if len(buf) >= depth:
            yield buf.pop(0)
    while buf:
        yield buf.pop(0)


def synthetic_batches(batch_size: int, seq: int = 2048, ch: int = 68,
                      cond_seq: int = 1370, cond_ch: int = 768,
                      seed: int = 0) -> Iterator[dict]:
    rng = np.random.default_rng(seed)
    while True:
        yield {
            "x": rng.standard_normal((batch_size, seq, ch)).astype("f"),
            "y": rng.standard_normal((batch_size, cond_seq, cond_ch)).astype("f"),
        }


def encode_assets(vae, vae_params, srt: np.ndarray, payload: np.ndarray,
                  latent_mean, latent_std, latent_nf: float = 1.0,
                  key: Optional[jax.Array] = None,
                  dim_feat: int = 6) -> np.ndarray:
    """PrimX params -> normalized DiT tokens [N, 4 + L] (the inverse of
    pipelines/infer.decode_primx; payload normalization follows the
    reference: sdf*5, others*2-1 before encoding)."""
    from ..models.vae3d import VAE3D

    N = srt.shape[0]
    S = (round((payload.shape[-1] // dim_feat) ** (1 / 3))
         if payload.ndim == 2 else payload.shape[1])
    vol = payload.reshape(N, dim_feat, S, S, S).transpose(0, 2, 3, 4, 1)
    vol = np.concatenate([vol[..., :1] * 5.0, vol[..., 1:] * 2.0 - 1.0], -1)
    posterior = vae.apply(vae_params, jnp.asarray(vol), method=VAE3D.encode)
    z = posterior.mode() if key is None else posterior.sample(key)
    lat = np.asarray(z).reshape(N, -1)
    tokens = np.concatenate([np.asarray(srt), lat], axis=-1)
    return (tokens - np.asarray(latent_mean)) / np.asarray(latent_std) * latent_nf
