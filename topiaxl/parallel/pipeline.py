"""Pipeline parallelism for the DiT over a ``pp`` mesh axis.

The reference ships no multi-device execution at all (SURVEY.md §2.6);
dp/fsdp/tp/sp are covered by GSPMD sharding rules (sharding.py). This
module adds the remaining classic axis: **pipeline parallelism** — the
DiT's ``depth`` blocks are stacked on a layer axis, that axis is sharded
over ``pp``, and microbatches flow through the stages in a GPipe
schedule implemented with ``shard_map`` + ``lax.ppermute`` rings on ICI.

Design (TPU-native, scaling-book recipe):

* block params are stored **stacked**: every leaf gains a leading
  ``[depth]`` axis, placed with ``PartitionSpec('pp')`` so each device
  holds only ``depth / pp`` layers (the memory point of pp);
* embedding / timestep / final layers are tiny and run replicated
  outside the pipelined region;
* inside ``shard_map`` each stage runs its local layers as one
  ``lax.scan``; activations move stage→stage with a single
  ``ppermute`` per schedule tick (bandwidth = one [mb, N, D] tensor
  per tick over ICI);
* the schedule is plain GPipe: ``n_micro + pp - 1`` ticks, bubble
  fraction ``(pp-1)/(n_micro+pp-1)``; gradients flow through
  ``ppermute`` (its transpose is the reverse ring), so ``jax.grad`` of
  the whole pipelined loss is the pipelined backward — no hand-written
  schedule.

This composes with ``dp``: batch axis sharded over ``dp``, layers over
``pp`` (each dp slice runs an independent pipeline).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

shard_map = jax.shard_map  # jax >= 0.8


# --------------------------------------------------------------------------
# param layout: list-of-blocks  <->  stacked [depth, ...] leaves
# --------------------------------------------------------------------------

def stack_dit_params(params, depth: int):
    """Re-lay a DiT param tree for pipelining.

    ``{'params': {blocks_0..blocks_{L-1}, <rest>}}`` becomes
    ``{'stacked': tree with leading [L] axis, 'rest': {'params': <rest>}}``.
    """
    inner = params["params"]
    blocks = [inner[f"blocks_{i}"] for i in range(depth)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    rest = {k: v for k, v in inner.items() if not k.startswith("blocks_")}
    return {"stacked": stacked, "rest": rest}


def unstack_dit_params(pp_params, depth: int):
    """Inverse of :func:`stack_dit_params` (checkpoint interop)."""
    inner = dict(pp_params["rest"])
    for i in range(depth):
        inner[f"blocks_{i}"] = jax.tree.map(
            lambda a, i=i: a[i], pp_params["stacked"])
    return {"params": inner}


def shard_pp_params(pp_params, mesh: Mesh, pp_axis: str = "pp"):
    """Place the stacked layer axis over ``pp``; the rest replicated."""
    stacked = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P(pp_axis))),
        pp_params["stacked"],
    )
    rest = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())),
        pp_params["rest"],
    )
    return {"stacked": stacked, "rest": rest}


# --------------------------------------------------------------------------
# pipelined forward
# --------------------------------------------------------------------------

def _block_of(model):
    from ..models.dit import DiTBlock

    return DiTBlock(
        hidden_size=model.hidden_size,
        cond_dim=model.condition_channels,
        num_heads=model.num_heads,
        mlp_ratio=model.mlp_ratio,
        proj_bias=model.attn_proj_bias,
        dtype=model.dtype,
        attn_backend=model.attn_backend,
        quant=model.quant,
    )


def make_pp_forward(model, mesh: Mesh, n_micro: int,
                    pp_axis: str = "pp", dp_axis: str = "dp"):
    """Returns ``forward(pp_params, x, t, y) -> [B, N, C_out]``.

    Numerically identical to ``model.apply(params, x, t, y)`` (tested in
    tests/test_pipeline_parallel.py) — microbatching only re-tiles the
    batch dim and every op is batch-row independent.
    """
    pp = mesh.shape[pp_axis]
    if model.depth % pp:
        raise ValueError(f"depth {model.depth} not divisible by pp={pp}")
    blk = _block_of(model)
    dp = dp_axis if dp_axis in mesh.shape else None

    def stage(stacked_local, h, t_emb, y_mb):
        """Run this stage's local layers (one lax.scan over [L/pp])."""

        def body(carry, layer_p):
            kv = blk.apply({"params": layer_p}, y_mb,
                           method=type(blk).cond_kv)
            carry = blk.apply({"params": layer_p}, carry, kv, t_emb)
            return carry, None

        # mirror DiT.setup's remat modes exactly (False / True / 'dots');
        # 'dots' is truthy, so a plain `if model.remat` would silently
        # degrade it to full-block recompute (ADVICE r1)
        if model.remat == "dots":
            body = jax.checkpoint(
                body,
                policy=jax.checkpoint_policies.save_from_both_policies(
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                    jax.checkpoint_policies.save_only_these_names(
                        "flash_out", "flash_lse"),
                ),
            )
        elif model.remat == "flash":
            body = jax.checkpoint(
                body,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "flash_out", "flash_lse"),
            )
        elif model.remat == "flash_mlp":
            body = jax.checkpoint(
                body,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "flash_out", "flash_lse", "mlp_fc1"),
            )
        elif isinstance(model.remat, str):
            raise ValueError(
                f"remat={model.remat!r}: expected False, True, 'dots', "
                "'flash', or 'flash_mlp'")
        elif model.remat:
            body = jax.checkpoint(body)
        h, _ = jax.lax.scan(body, h, stacked_local)
        return h

    def pipe(stacked_local, x_mb, t_mb, y_mb):
        # x_mb: [n_micro, mb, N, D] (embedded tokens, replicated over pp)
        idx = jax.lax.axis_index(pp_axis)
        carry = jnp.zeros_like(x_mb[0])
        outs = jnp.zeros_like(x_mb)
        for s in range(n_micro + pp - 1):
            # stage i works on microbatch s - i at tick s (GPipe)
            mb = jnp.clip(s - idx, 0, n_micro - 1)
            inject = x_mb[min(s, n_micro - 1)]
            h = jnp.where(idx == 0, inject, carry)
            out = stage(stacked_local, h,
                        jnp.take(t_mb, mb, axis=0),
                        jnp.take(y_mb, mb, axis=0))
            done = (idx == pp - 1) & (s - idx >= 0) & (s - idx < n_micro)
            upd = jnp.where(done, out, jnp.take(outs, mb, axis=0))
            outs = jax.lax.dynamic_update_index_in_dim(outs, upd, mb, 0)
            if s < n_micro + pp - 2:
                carry = jax.lax.ppermute(
                    out, pp_axis, [(i, (i + 1) % pp) for i in range(pp)])
        # broadcast the last stage's results to every pp rank
        outs = jax.lax.psum(
            jnp.where(idx == pp - 1, outs, jnp.zeros_like(outs)), pp_axis)
        return outs

    mb_spec = P(None, dp)  # [n_micro, mb(, ...)] — batch dim sharded on dp
    pipe_sm = shard_map(
        pipe, mesh=mesh,
        in_specs=(P(pp_axis), mb_spec, mb_spec, mb_spec),
        out_specs=mb_spec,
        check_vma=False,
    )

    def forward(pp_params, x, t, y):
        B, N = x.shape[0], x.shape[1]
        if B % n_micro:
            raise ValueError(f"batch {B} not divisible by n_micro={n_micro}")
        rest = {"params": pp_params["rest"]}
        x_emb = model.apply(rest, x, method=type(model).embed_tokens)
        t_emb = model.apply(rest, t, method=type(model).embed_t)
        mb = B // n_micro
        x_mb = x_emb.reshape(n_micro, mb, *x_emb.shape[1:])
        t_mb = t_emb.reshape(n_micro, mb, *t_emb.shape[1:])
        y_mb = y.reshape(n_micro, mb, *y.shape[1:])
        h = pipe_sm(pp_params["stacked"], x_mb, t_mb, y_mb)
        h = h.reshape(B, *h.shape[2:])
        return model.apply(rest, h, t_emb,
                           method=type(model).apply_final)

    return forward


# --------------------------------------------------------------------------
# pipelined train step (mirrors pipelines/train.make_train_step)
# --------------------------------------------------------------------------

def make_pp_train_step(model, diffusion, optimizer, mesh: Mesh,
                       n_micro: int, ema_decay: float = 0.9999,
                       pp_axis: str = "pp", dp_axis: str = "dp"):
    """Train step over ``{'stacked','rest'}`` params (same TrainState /
    optimizer / metrics contract as pipelines/train.make_train_step, and
    the same numerics — the loss and key plumbing are identical, only
    the model forward is pipelined)."""
    import optax

    from ..diffusion import gaussian
    from ..diffusion.timestep_sampler import uniform_sample
    from ..pipelines.train import TrainState

    forward = make_pp_forward(model, mesh, n_micro, pp_axis, dp_axis)

    def loss_fn(pp_params, x, y, t, weights, key):
        drop_key, noise_key = jax.random.split(key)
        if model.cond_drop_prob > 0:
            drop = (jax.random.uniform(drop_key, (y.shape[0],))
                    < model.cond_drop_prob)
            null = pp_params["rest"]["null_cond_embedding"][None, None, :]
            y = jnp.where(drop[:, None, None], null, y)

        def model_fn(x_t, t_orig):
            return forward(pp_params, x_t, t_orig, y)

        terms = gaussian.training_losses(diffusion, model_fn, x, t, noise_key)
        loss = jnp.mean(terms["loss_total"] * weights)
        return loss, terms

    def train_step(state: "TrainState", batch, key):
        t_key, loss_key = jax.random.split(jax.random.fold_in(key, state.step))
        B = batch["x"].shape[0]
        t, weights = uniform_sample(diffusion.num_timesteps, B, t_key)
        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch["x"], batch["y"], t, weights, loss_key)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        ema = jax.tree.map(
            lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
            state.ema_params, params)
        metrics = {
            "loss": loss,
            "loss_mse": jnp.mean(terms["loss_mse"]),
            "grad_norm": optax.global_norm(grads),
        }
        if "loss_vb" in terms:
            metrics["loss_vb"] = jnp.mean(terms["loss_vb"])
        return (
            TrainState(state.step + 1, params, opt_state, ema,
                       state.sampler_state),
            metrics,
        )

    return train_step
