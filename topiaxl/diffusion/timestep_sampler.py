"""Importance-sampling of training timesteps.

TPU-native rewrite of the reference's schedule samplers
(models/diffusion/timestep_sampler.py:27-150). The loss-aware sampler is
the only distributed machinery in the reference (a ``dist.all_gather`` of
per-rank losses); here the cross-device sync is a ``jax.lax.all_gather``
over the data-parallel mesh axis when run inside ``shard_map`` — or a
no-op on a single device. State is a pure pytree updated functionally.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class UniformSamplerState(NamedTuple):
    num_timesteps: int


def uniform_sample(num_timesteps: int, batch: int, key: jax.Array):
    """Uniform timesteps + unit importance weights
    (reference timestep_sampler.py:62-70)."""
    t = jax.random.randint(key, (batch,), 0, num_timesteps)
    weights = jnp.ones((batch,), dtype=jnp.float32)
    return t, weights


class LossSecondMomentState(NamedTuple):
    """Functional state for loss-second-moment resampling
    (reference timestep_sampler.py:120-150)."""

    loss_history: jnp.ndarray  # [T, history]
    loss_counts: jnp.ndarray   # [T] int32

    @classmethod
    def create(cls, num_timesteps: int, history_per_term: int = 10):
        return cls(
            loss_history=jnp.zeros((num_timesteps, history_per_term), jnp.float32),
            loss_counts=jnp.zeros((num_timesteps,), jnp.int32),
        )


def _lsm_weights(state: LossSecondMomentState, uniform_prob: float = 0.001):
    warmed_up = jnp.all(state.loss_counts == state.loss_history.shape[1])
    num_t = state.loss_history.shape[0]
    w = jnp.sqrt(jnp.mean(state.loss_history**2, axis=-1))
    w = w / jnp.sum(w)
    w = w * (1 - uniform_prob) + uniform_prob / num_t
    uniform = jnp.full((num_t,), 1.0 / num_t, jnp.float32)
    return jnp.where(warmed_up, w, uniform)


def lsm_sample(state: LossSecondMomentState, batch: int, key: jax.Array,
               uniform_prob: float = 0.001):
    """Sample timesteps proportionally to sqrt(E[loss^2]) with importance
    weights 1/(T p_t) (reference timestep_sampler.py:27-59)."""
    p = _lsm_weights(state, uniform_prob)
    t = jax.random.choice(key, p.shape[0], shape=(batch,), p=p)
    weights = 1.0 / (p.shape[0] * p[t])
    return t, weights


def lsm_update(
    state: LossSecondMomentState,
    ts: jnp.ndarray,
    losses: jnp.ndarray,
    axis_name: Optional[str] = None,
) -> LossSecondMomentState:
    """Fold a batch of (t, loss) into history. With ``axis_name`` set (inside
    shard_map/pmap), first all-gathers every rank's batch so all ranks keep
    identical reweighting state — the JAX equivalent of the reference's
    dist.all_gather sync (timestep_sampler.py:72-103)."""
    if axis_name is not None:
        ts = jax.lax.all_gather(ts, axis_name, tiled=True)
        losses = jax.lax.all_gather(losses, axis_name, tiled=True)

    history = state.loss_history
    counts = state.loss_counts

    def body(carry, inp):
        history, counts = carry
        t, loss = inp
        cnt = counts[t]
        hist_t = history[t]
        full = cnt == history.shape[1]
        # shift-append when full, else write at cnt
        shifted = jnp.concatenate([hist_t[1:], jnp.array([loss])])
        written = hist_t.at[jnp.minimum(cnt, history.shape[1] - 1)].set(loss)
        new_hist = jnp.where(full, shifted, written)
        history = history.at[t].set(new_hist)
        counts = counts.at[t].add(jnp.where(full, 0, 1))
        return (history, counts), None

    (history, counts), _ = jax.lax.scan(body, (history, counts), (ts, losses))
    return LossSecondMomentState(loss_history=history, loss_counts=counts)
