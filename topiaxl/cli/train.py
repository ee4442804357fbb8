"""Training CLI: ``python -m topiaxl.cli.train config.yml [k=v ...]``.

Runs the reference's (unreleased) DiT training recipe TPU-natively:
data-parallel (+ optional fsdp/tp) over a named mesh, AdamW + cosine
warmup, v-pred MSE + VB, cond-drop, EMA, orbax checkpoints with resume
(configs: train.* / optimizer.* / scheduler.* — reference
configs/inference_dit.yml:77-95).

Data: ``train.data_glob`` pointing at token shards (pipelines/data), or
``train.synthetic=true`` for smoke/benchmark runs.
"""

from __future__ import annotations

import itertools
import logging
import os
import sys

import jax
import jax.numpy as jnp

logger = logging.getLogger("topiaxl.train")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    logging.basicConfig(level=logging.INFO)
    if not argv:
        print(__doc__)
        return 1

    import topiaxl.registry  # noqa: F401
    from topiaxl.core import build, load_config
    from topiaxl.core.checkpoint import CheckpointManager
    from topiaxl.core.profiling import MetricLogger, StepMeter
    from topiaxl.diffusion import create_diffusion
    from topiaxl.parallel import batch_sharding, mesh_from_config, shard_params
    from topiaxl.parallel.sharding import dit_param_rules, replicated
    from topiaxl.pipelines import data as D
    from topiaxl.pipelines.train import (
        create_train_state, jit_train_step, make_optimizer, make_train_step,
    )

    cfg = load_config(argv[0], overrides=argv[1:])
    out_dir = os.path.join(cfg.output_dir, "train")
    os.makedirs(out_dir, exist_ok=True)

    mesh = mesh_from_config(cfg.train.get("mesh"))
    logger.info("mesh: %s over %d devices", dict(mesh.shape), mesh.size)

    dit = build(cfg.model.generator)
    if getattr(dit, "quant", False):
        # int8 rounding has no useful gradient; fail clearly at startup
        # instead of deep inside jax.grad (int8 leaves are non-differentiable)
        raise ValueError(
            "model.generator.quant=true is inference-only; unset it for "
            "training (serving configs can keep it)")
    diffusion = create_diffusion(
        timestep_respacing=None,
        noise_schedule=cfg.diffusion.noise_schedule,
        diffusion_steps=cfg.diffusion.diffusion_steps,
        parameterization=cfg.diffusion.parameterization,
    )

    key = jax.random.PRNGKey(int(cfg.global_seed))
    params = jax.jit(dit.init)(
        key,
        jnp.zeros((1, dit.seq_length, dit.in_channels)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 2, dit.condition_channels)),
    )

    optimizer = make_optimizer(
        lr=float(cfg.optimizer.lr),
        weight_decay=float(cfg.optimizer.get("weight_decay", 0.0)),
        warmup_iters=int(cfg.scheduler.warmup_iters),
        max_iters=int(cfg.scheduler.max_iters),
    )
    state = create_train_state(
        params, optimizer,
        lsm_timesteps=(diffusion.num_timesteps
                       if cfg.train.get("timestep_sampler") == "lsm" else None),
    )

    ckpt = CheckpointManager(os.path.join(out_dir, "ckpts"),
                             max_to_keep=int(cfg.train.get("keep_ckpts", 3)))
    if ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        logger.info("resumed from step %d", int(state.step))

    with mesh:
        rules = dit_param_rules()
        use_tp = mesh.shape.get("tp", 1) > 1 or mesh.shape.get("fsdp", 1) > 1
        placed = shard_params if use_tp else (
            lambda p, m, r: jax.device_put(p, replicated(m)))
        # the WHOLE state must live on the mesh — a step counter left
        # committed to one device makes jit reject the mixed placement.
        # Adam moments shard with their parameters (the path rules match
        # by suffix); scalars/counts replicate.
        state = state._replace(
            step=jax.device_put(state.step, replicated(mesh)),
            params=placed(state.params, mesh, rules),
            ema_params=placed(state.ema_params, mesh, rules),
            opt_state=placed(state.opt_state, mesh, rules),
            sampler_state=(None if state.sampler_state is None else
                           jax.device_put(state.sampler_state,
                                          replicated(mesh))),
        )
        bsh = batch_sharding(mesh, "dp")

        global_bs = int(cfg.train.batch_size) * mesh.shape.get("dp", 1)
        if cfg.train.get("synthetic") or not cfg.train.get("data_glob"):
            logger.warning("using synthetic data stream")
            stream = D.synthetic_batches(
                global_bs, dit.seq_length, dit.in_channels,
                cond_seq=int(cfg.train.get("cond_seq", 1370)),
                cond_ch=dit.condition_channels)
            batches = D.prefetch_to_device(stream, bsh)
        else:
            ds = D.TokenShardDataset(cfg.train.data_glob, global_bs,
                                     shuffle_seed=int(cfg.global_seed))
            batches = D.prefetch_to_device(
                itertools.chain.from_iterable(
                    ds.epoch(e) for e in itertools.count()), bsh)

        step_fn = jit_train_step(make_train_step(
            dit, diffusion, optimizer,
            ema_decay=float(cfg.train.get("ema_decay", 0.9999)),
            timestep_sampler=cfg.train.get("timestep_sampler", "uniform"),
            grad_accum=int(cfg.train.get("grad_accum", 1)),
        ))

        meter = StepMeter()
        mlog = MetricLogger(os.path.join(out_dir, "metrics.jsonl"),
                            print_every=int(cfg.train.log_every_n_steps))
        max_steps = int(cfg.train.get("max_steps", cfg.scheduler.max_iters))
        ckpt_every = int(cfg.train.ckpt_every_n_steps)

        # preemption safety: TPU VMs get SIGTERM before eviction; finish
        # the in-flight step, checkpoint, and exit cleanly so the next
        # incarnation resumes from it (the resume path above)
        import signal

        preempted = []
        prev_handlers = {
            s: signal.signal(s, lambda sig, frame: preempted.append(sig))
            for s in (signal.SIGTERM, signal.SIGINT)
        }
        try:
            for batch in batches:
                state, metrics = step_fn(state, batch, key)
                step = int(state.step)
                meter.tick()
                if step % int(cfg.train.log_every_n_steps) == 0:
                    metrics = {k: float(v) for k, v in metrics.items()}
                    metrics["steps_per_sec"] = meter.steps_per_sec
                    mlog.log(step, metrics)
                if step % ckpt_every == 0:
                    ckpt.save(step, jax.device_get(state))
                if preempted:
                    logger.warning(
                        "signal %s: checkpointing at step %d and exiting",
                        preempted[0], step)
                    break
                if step >= max_steps:
                    break
        finally:
            for s, h in prev_handlers.items():
                signal.signal(s, h)

        ckpt.save(int(state.step), jax.device_get(state))
        ckpt.wait()
        mlog.close()
    logger.info("training done at step %d", int(state.step))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
