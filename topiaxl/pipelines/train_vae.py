"""3D VAE training (the payload compressor).

The reference trains its VAE with L1/per-group/DCT reconstruction + KL
(dva/losses.py:17-100) but never shipped the loop. One jitted step over
the dp mesh; batches are raw prim payloads [B, S, S, S, 6] normalized
like the pipeline expects (sdf*5, rest*2-1 — see pipelines/data
encode_assets).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.vae3d import VAE3D
from .losses import vae_loss


class VAETrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def create_vae_train_state(params, optimizer) -> VAETrainState:
    return VAETrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
    )


def make_vae_train_step(
    vae: VAE3D,
    optimizer,
    loss_kind: str = "sep_l1",
    weights=None,
):
    weights = dict(weights or {"sdf": 1.0, "rgb": 1.0, "mat": 1.0,
                               "kl": 1e-6})

    def loss_fn(params, gt, key):
        recon, posterior = vae.apply(params, gt, key)
        total, ld = vae_loss(gt, recon, posterior, weights, loss_kind)
        return total, ld

    def step(state: VAETrainState, batch, key):
        key = jax.random.fold_in(key, state.step)
        (loss, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch["gt"], key)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {k: v for k, v in ld.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        return VAETrainState(state.step + 1, params, opt_state), metrics

    return step
