"""PrimX representation fitting: turn a target SDF/texture field into
2048 volumetric primitives.

The reference stubs this stage out (PrimSDF._init_param is `pass`,
models/primsdf.py:48-50 — the fitting code was never released) but ships
its loss (PrimSDFLoss staged shape->texture schedule, dva/losses.py:102-148)
and config knobs (init_scale, auto_scale_init, init_sampling). This
module completes the capability: primitives are initialized on a uniform
grid or by surface sampling (auto-scaled to their spacing), then
optimized against the target field with Adam through the differentiable
field query — all one jitted update.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import primx as PX
from ..models.primx import PrimXParams
from .losses import primsdf_fit_loss


def init_prims(
    num_prims: int,
    key: jax.Array,
    surface_points: np.ndarray | None = None,
    init_scale: float = 0.05,
    auto_scale_init: bool = True,
    init_sampling: str = "uniform",
    prim_shape: int = 8,
    dim_feat: int = 6,
) -> PrimXParams:
    """Place primitives (reference knobs: configs/inference_dit.yml:28-31).

    'uniform' scatters prim centers on a jittered lattice in [-0.9, 0.9]^3
    (or subsamples ``surface_points`` when given); auto_scale_init sets
    each scale to ~1.2x the typical nearest-neighbor spacing so the union
    covers space.
    """
    if surface_points is not None and len(surface_points) >= num_prims:
        idx = jax.random.choice(
            key, len(surface_points), (num_prims,), replace=False)
        pos = jnp.asarray(surface_points)[idx]
    elif init_sampling == "uniform":
        side = int(round(num_prims ** (1 / 3)))
        while side**3 < num_prims:
            side += 1
        lin = np.linspace(-0.9, 0.9, side, dtype=np.float32)
        gz, gy, gx = np.meshgrid(lin, lin, lin, indexing="ij")
        lattice = np.stack([gx, gy, gz], -1).reshape(-1, 3)[:num_prims]
        jit_amp = (lin[1] - lin[0]) * 0.25 if side > 1 else 0.1
        pos = jnp.asarray(lattice) + jit_amp * jax.random.uniform(
            key, (num_prims, 3), minval=-1.0, maxval=1.0)
    else:
        pos = jax.random.uniform(key, (num_prims, 3), minval=-0.9, maxval=0.9)

    if auto_scale_init:
        d = jnp.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
        d = d + 1e9 * jnp.eye(num_prims)
        nn = jnp.min(d, axis=1)
        scale = jnp.maximum(nn * 1.2, 1e-3)[:, None]
    else:
        scale = jnp.full((num_prims, 1), init_scale)

    srt = jnp.concatenate([scale, pos], axis=-1)
    feat = jnp.zeros((num_prims, dim_feat * prim_shape**3), jnp.float32)
    return PrimXParams(srt=srt, feat=feat)


class FitConfig(NamedTuple):
    prim_shape: int = 8
    dim_feat: int = 6
    batch_points: int = 8192
    lr: float = 5e-3
    shape_opt_steps: int = 2000
    tex_opt_steps: int = 6000
    near_surface_frac: float = 0.5
    near_surface_sigma: float = 0.05
    weights: dict = None  # type: ignore


_DEFAULT_WEIGHTS = {"sdf_l1": 1.0, "rgb_l1": 1.0, "mat_l1": 1.0,
                    "vol_sum": 1e-4}


def fit_primx(
    target_sdf: Callable[[np.ndarray], np.ndarray],
    key: jax.Array,
    num_prims: int = 2048,
    target_tex: Callable[[np.ndarray], np.ndarray] | None = None,
    target_mat: Callable[[np.ndarray], np.ndarray] | None = None,
    surface_points: np.ndarray | None = None,
    config: FitConfig = FitConfig(),
    verbose: bool = False,
) -> PrimXParams:
    """Fit PrimX params to target field callables (host-evaluated; the
    optimizer update itself is one jitted step)."""
    cfg = config
    weights = dict(cfg.weights or _DEFAULT_WEIGHTS)
    if target_tex is None:
        weights.pop("rgb_l1", None)
        weights["rgb_l1"] = 0.0
    if target_mat is None:
        weights.pop("mat_l1", None)

    key, init_key = jax.random.split(key)
    params = init_prims(num_prims, init_key, surface_points=surface_points,
                        prim_shape=cfg.prim_shape, dim_feat=cfg.dim_feat)
    opt = optax.adam(cfg.lr)
    opt_state = opt.init(params)
    # scale bounds relative to init: stops the degenerate escape where
    # prims shrink out of coverage to zero their own loss contribution
    scale_init = params.srt[:, 0]
    scale_lo = jnp.maximum(scale_init * 0.5, 5e-3)
    scale_hi = jnp.minimum(scale_init * 3.0, 0.9)

    @jax.jit
    def step(params, opt_state, pts, tgt_sdf, tgt_tex, tgt_mat, it):
        def loss_fn(p):
            out = PX.query(p, pts, dim_feat=cfg.dim_feat,
                           prim_shape=cfg.prim_shape, training=True)
            preds = {
                "sdf": out["sdf"], "tex": out["feat"][:, 1:4],
                "mat": out["feat"][:, 4:6],
                # PrimSDFLoss uses 1/scale (dva/losses.py:122-124)
                "prim_scale": 1.0 / jnp.broadcast_to(
                    p.srt[:, 0:1], (p.srt.shape[0], 3))[None],
            }
            inputs = {"sdf": tgt_sdf, "tex": tgt_tex, "mat": tgt_mat}
            total, ld = primsdf_fit_loss(
                inputs, preds, weights, it,
                shape_opt_steps=cfg.shape_opt_steps,
                tex_opt_steps=cfg.tex_opt_steps)
            return total, ld

        (loss, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        # keep scales positive and coverage intact
        params = params._replace(
            srt=params.srt.at[:, 0].set(
                jnp.clip(params.srt[:, 0], scale_lo, scale_hi)))
        return params, opt_state, loss, ld

    rng = np.random.default_rng(0)
    P = cfg.batch_points
    n_near = int(P * cfg.near_surface_frac)

    if surface_points is None:
        surf_pool = None
    else:
        surf_pool = np.asarray(surface_points, np.float32)

    for it in range(cfg.tex_opt_steps):
        uni = rng.uniform(-1, 1, (P - n_near, 3)).astype(np.float32)
        if surf_pool is not None and len(surf_pool):
            base = surf_pool[rng.integers(0, len(surf_pool), n_near)]
        else:
            base = rng.uniform(-0.8, 0.8, (n_near, 3)).astype(np.float32)
        near = base + rng.normal(0, cfg.near_surface_sigma,
                                 (n_near, 3)).astype(np.float32)
        pts = np.concatenate([uni, near]).clip(-1, 1)

        tgt_sdf = np.asarray(target_sdf(pts), np.float32).reshape(-1, 1)
        tgt_tex = (np.asarray(target_tex(pts), np.float32)
                   if target_tex else np.zeros((len(pts), 3), np.float32))
        tgt_mat = (np.asarray(target_mat(pts), np.float32)
                   if target_mat else np.zeros((len(pts), 2), np.float32))

        params, opt_state, loss, _ = step(
            params, opt_state, jnp.asarray(pts), jnp.asarray(tgt_sdf),
            jnp.asarray(tgt_tex), jnp.asarray(tgt_mat), it)
        if verbose and it % 200 == 0:
            print(f"fit iter {it}: loss {float(loss):.5f}", flush=True)

    return params
