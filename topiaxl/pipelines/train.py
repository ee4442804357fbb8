"""DiT training on a TPU mesh.

The reference never shipped its trainer; its config pins the recipe
(configs/inference_dit.yml:77-95: AdamW lr 1e-4 wd 0, cosine schedule
with 3k warmup / 200k iters, bs 8/device, v-prediction MSE [+VB],
cond-drop 0.1, EMA weights saved under 'ema'). This module implements
that recipe TPU-natively: one jitted train step over a named mesh, with
data parallel on ``dp`` and optional ZeRO/TP via parameter sharding
rules (topiaxl/parallel/sharding.py) — XLA compiles the psum/all-gather
pattern; there is no NCCL-style process-group code anywhere.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..diffusion import Diffusion, gaussian
from ..diffusion.timestep_sampler import (
    LossSecondMomentState,
    lsm_sample,
    lsm_update,
    uniform_sample,
)


def cosine_warmup_schedule(base_lr: float, warmup_iters: int, max_iters: int):
    """Linear warmup then cosine decay to 0
    (reference dva/scheduler.py:4-21 semantics)."""

    def lr(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / jnp.maximum(warmup_iters, 1)
        prog = (step - warmup_iters) / jnp.maximum(max_iters - warmup_iters, 1)
        prog = jnp.clip(prog, 0.0, 1.0)
        cos = base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * prog))
        return jnp.where(step < warmup_iters, warm, cos)

    return lr


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any
    sampler_state: Optional[LossSecondMomentState]


class OptimizerWithSpec(NamedTuple):
    """optax.GradientTransformation duck-type (init/update) carrying the
    hyperparameter spec so make_train_step can run the FUSED update path
    (one read/write per state leaf) while opt_state stays the standard
    optax chain structure for checkpoint compatibility."""
    init: Any
    update: Any
    spec: dict


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.0,
                   warmup_iters: int = 3000, max_iters: int = 200000,
                   grad_clip: Optional[float] = 1.0):
    sched = cosine_warmup_schedule(lr, warmup_iters, max_iters)
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.adamw(sched, weight_decay=weight_decay))
    tx = optax.chain(*chain)
    spec = dict(sched=sched, weight_decay=weight_decay,
                grad_clip=grad_clip, b1=0.9, b2=0.999, eps=1e-8)
    return OptimizerWithSpec(tx.init, tx.update, spec)


def fused_adamw_ema_update(grads, opt_state, params, ema_params, spec,
                           ema_decay: float = 0.9999,
                           grad_prescale: float = 1.0):
    """clip-by-global-norm + AdamW + apply + EMA in ONE elementwise pass
    per parameter leaf.

    The equivalent optax chain materializes the clipped-grads, adam
    ``updates``, and decayed-weights trees between stages, tripling the
    HBM traffic of the update: measured 55 ms -> ~22 ms per step on the
    580M-param flagship (benchmarks/exp_train_roofline.py). Math matches
    optax.chain(clip_by_global_norm, adamw) + the EMA fold
    (moments computed in f32 then cast back to the stored dtype —
    equal-or-better numerics than optax's in-dtype bf16 arithmetic);
    ``opt_state`` keeps the optax structure so checkpoints interchange.
    Parity-tested against the optax path in tests/test_train.py.

    ``grad_prescale`` folds a constant gradient scale (the 1/k of k-way
    gradient accumulation) into the same pass, so the train step never
    materializes the divided tree; the clip threshold applies to the
    PRE-scaled gradient (prescale * grads), matching the unfused path.
    Returns (params, opt_state, ema, grad_norm) with grad_norm the
    global norm of the prescaled gradient — reuse it for metrics
    instead of a second full-tree reduction."""
    clip_state, (adam, wd_state, sch) = opt_state
    b1, b2, eps = spec["b1"], spec["b2"], spec["eps"]
    wd = spec["weight_decay"]
    clip = spec["grad_clip"]

    count_inc = optax.safe_increment(adam.count)
    cf = count_inc.astype(jnp.float32)
    c1 = 1.0 - jnp.power(b1, cf)
    c2 = 1.0 - jnp.power(b2, cf)
    lr = spec["sched"](sch.count).astype(jnp.float32)
    pre = jnp.float32(grad_prescale)
    gnorm = optax.global_norm(grads).astype(jnp.float32) * pre
    if clip:
        gscale = pre * jnp.where(gnorm < clip, 1.0, clip / gnorm)
    else:
        gscale = pre

    def leaf(p, g, m, v, e):
        gf = g.astype(jnp.float32) * gscale
        mf = b1 * m.astype(jnp.float32) + (1.0 - b1) * gf
        vf = b2 * v.astype(jnp.float32) + (1.0 - b2) * gf * gf
        u = (mf / c1) / (jnp.sqrt(vf / c2) + eps)
        pf = p.astype(jnp.float32)
        if wd:
            u = u + wd * pf
        pf = pf - lr * u
        ef = ema_decay * e.astype(jnp.float32) + (1.0 - ema_decay) * pf
        return (pf.astype(p.dtype), mf.astype(m.dtype),
                vf.astype(v.dtype), ef.astype(e.dtype))

    packed = jax.tree.map(leaf, params, grads, adam.mu, adam.nu,
                          ema_params)
    is4 = lambda x: isinstance(x, tuple) and len(x) == 4  # noqa: E731
    pick = lambda i: jax.tree.map(  # noqa: E731
        lambda t: t[i], packed, is_leaf=is4)
    new_params, mu, nu, ema = pick(0), pick(1), pick(2), pick(3)
    new_opt_state = (clip_state,
                     (type(adam)(count=count_inc, mu=mu, nu=nu),
                      wd_state, type(sch)(count=count_inc)))
    return new_params, new_opt_state, ema, gnorm


def create_train_state(params, optimizer,
                       lsm_timesteps: Optional[int] = None) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        # fresh buffers: EMA must not alias params or jit donation of the
        # state would see the same buffer twice
        ema_params=jax.tree.map(lambda a: a + 0, params),
        sampler_state=(
            LossSecondMomentState.create(lsm_timesteps)
            if lsm_timesteps else None
        ),
    )


def make_train_step(
    model,
    diffusion: Diffusion,
    optimizer,
    ema_decay: float = 0.9999,
    timestep_sampler: str = "uniform",
    grad_accum: int = 1,
):
    """Returns train_step(state, batch, key) -> (state, metrics).

    batch: {'x': [B, N, C] clean latent tokens, 'y': [B, M, Cc] cond tokens}.

    ``grad_accum=k`` splits the batch into k microbatches scanned
    sequentially with gradient accumulation — the activation memory of a
    B/k batch at the effective batch size B. Noise and cond-drop are
    drawn over the FULL batch before microbatching, so the accumulated
    step reproduces the single-pass numerics exactly (up to f32
    reduction order); tested in tests/test_train.py.
    """

    def loss_fn(params, x, y, t, weights, key):
        drop_key, noise_key = jax.random.split(key)

        def model_fn(x_t, t_orig):
            return model.apply(params, x_t, t_orig, y, True, drop_key)

        terms = gaussian.training_losses(
            diffusion, model_fn, x, t, noise_key
        )
        loss = jnp.mean(terms["loss_total"] * weights)
        return loss, terms

    def micro_loss_fn(params, x, y, t, weights, noise):
        """Chunk loss with pre-drawn noise and pre-dropped conditioning."""

        def model_fn(x_t, t_orig):
            return model.apply(params, x_t, t_orig, y)

        terms = gaussian.training_losses(
            diffusion, model_fn, x, t, None, noise=noise
        )
        loss = jnp.mean(terms["loss_total"] * weights)
        return loss, terms

    def accum_grads(params, batch, t, weights, loss_key):
        drop_key, noise_key = jax.random.split(loss_key)
        x, y = batch["x"], batch["y"]
        B = x.shape[0]
        if B % grad_accum:
            raise ValueError(f"batch {B} not divisible by "
                             f"grad_accum={grad_accum}")
        # full-batch draws (identical values to the single-pass path)
        if model.cond_drop_prob > 0:
            drop = (jax.random.uniform(drop_key, (B,))
                    < model.cond_drop_prob)
            null = params["params"]["null_cond_embedding"][None, None, :]
            y = jnp.where(drop[:, None, None], null, y)
        noise = jax.random.normal(noise_key, x.shape, x.dtype)

        def mb(a):
            return a.reshape(grad_accum, B // grad_accum, *a.shape[1:])

        stacked = jax.tree.map(mb, (x, y, t, weights, noise))

        def body(carry, chunk):
            g_acc, l_acc = carry
            xs, ys, ts, ws, ns = chunk
            (loss, terms), grads = jax.value_and_grad(
                micro_loss_fn, has_aux=True)(params, xs, ys, ts, ws, ns)
            g_acc = jax.tree.map(jnp.add, g_acc, grads)
            return (g_acc, l_acc + loss), terms

        g0 = jax.tree.map(jnp.zeros_like, params)
        (g_sum, l_sum), terms = jax.lax.scan(body, (g0, 0.0), stacked)
        # g_sum is returned UNdivided; the caller folds the 1/k into the
        # optimizer's elementwise pass (grad_prescale) instead of
        # materializing a divided copy of the 580M-param tree
        # per-element terms back to [B] order for the LSM sampler
        terms = jax.tree.map(lambda a: a.reshape(B, *a.shape[2:]), terms)
        return (l_sum / grad_accum, terms), g_sum

    def train_step(state: TrainState, batch, key):
        t_key, loss_key = jax.random.split(jax.random.fold_in(key, state.step))
        B = batch["x"].shape[0]
        if timestep_sampler == "lsm" and state.sampler_state is not None:
            t, weights = lsm_sample(state.sampler_state, B, t_key)
        else:
            t, weights = uniform_sample(diffusion.num_timesteps, B, t_key)

        if grad_accum > 1:
            # grads arrive as the UNdivided microbatch sum; the 1/k is
            # folded into the optimizer pass (or applied below for the
            # plain-optax fallback)
            (loss, terms), grads = accum_grads(
                state.params, batch, t, weights, loss_key)
            prescale = 1.0 / grad_accum
        else:
            (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch["x"], batch["y"], t, weights, loss_key
            )
            prescale = 1.0
        spec = getattr(optimizer, "spec", None)
        if spec is not None:
            params, opt_state, ema, gnorm = fused_adamw_ema_update(
                grads, state.opt_state, state.params, state.ema_params,
                spec, ema_decay=ema_decay, grad_prescale=prescale)
        else:
            if prescale != 1.0:
                grads = jax.tree.map(lambda g: g * prescale, grads)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)
            ema = jax.tree.map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                state.ema_params, params,
            )
            gnorm = optax.global_norm(grads)
        sampler_state = state.sampler_state
        if timestep_sampler == "lsm" and sampler_state is not None:
            sampler_state = lsm_update(sampler_state, t, terms["loss_total"])

        metrics = {
            "loss": loss,
            "loss_mse": jnp.mean(terms["loss_mse"]),
            # the fused update already reduced the (prescaled) global
            # norm for clipping — a second full-tree reduction here
            # would re-read the whole gradient
            "grad_norm": gnorm,
        }
        if "loss_vb" in terms:
            metrics["loss_vb"] = jnp.mean(terms["loss_vb"])
        return (
            TrainState(state.step + 1, params, opt_state, ema, sampler_state),
            metrics,
        )

    return train_step


def jit_train_step(train_step, donate: bool = False):
    """Jit a train step. Shardings propagate from the placement of the
    inputs: put the state with topiaxl.parallel.shard_params (replicated
    or fsdp/tp rules) and the batch with batch_sharding(mesh, 'dp');
    XLA/GSPMD then compiles the DP grad psum (and any ZeRO/TP
    collectives) onto ICI. Donation of the state is opt-in (pass
    donate=True) — it requires every leaf of the state to be a distinct
    buffer (XLA constant-caching can alias zero-init optimizer slots)."""
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
