"""Dataset preparation CLI:
``python -m topiaxl.cli.prepare_data config.yml data.input_glob='a/*.obj'
data.output_dir=shards [k=v ...]``.

The reference never released its dataset tooling (README.md:50-58
upstream); this closes the loop so a user can train on their own
assets. Per mesh: load OBJ -> normalize to the unit cube -> mesh SDF
(closest-point-with-sign) -> fit PrimX (pipelines/fit.py, the
PrimSDF-fitting stage of the reference recipe) -> render-and-encode
conditioning tokens (the training-time conditioner path,
reference models/conditioner/image.py:122-141) -> VAE-encode to
normalized DiT tokens -> append to .npz shards consumable by
``TokenShardDataset`` (pipelines/data.py).
"""

from __future__ import annotations

import logging
import os
import sys

import numpy as np

logger = logging.getLogger("topiaxl.prepare_data")


def prepare_asset(path: str, vae, vae_params, conditioner, key,
                  latent_mean, latent_std, latent_nf: float = 1.0,
                  num_prims: int = 2048, fit_cfg=None):
    """One mesh file -> (x tokens [N, 68], y cond tokens [My, Cy])."""
    import jax
    import jax.numpy as jnp

    from topiaxl.extract.mesh_sdf import MeshSDF
    from topiaxl.extract.objio import load_obj, normalize_to_unit_cube
    from topiaxl.pipelines.data import encode_assets
    from topiaxl.pipelines.fit import FitConfig, fit_primx

    mesh = load_obj(path)
    v, _, _ = normalize_to_unit_cube(mesh["v"])
    f = mesh["f"]
    sdf = MeshSDF(v, f)
    surface = sdf.sample_surface(20000)
    key, fit_key, cond_key = jax.random.split(key, 3)
    params = fit_primx(sdf, fit_key, num_prims=num_prims,
                       surface_points=surface,
                       config=fit_cfg or FitConfig())

    fcfg = fit_cfg or FitConfig()
    x = encode_assets(vae, vae_params, np.asarray(params.srt),
                      np.asarray(params.feat), latent_mean, latent_std,
                      latent_nf, dim_feat=fcfg.dim_feat)
    y = conditioner.condition_from_primx(
        jnp.asarray(params.srt)[None], jnp.asarray(params.feat)[None],
        key=cond_key)
    return x.astype(np.float32), np.asarray(y[0], np.float32)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    logging.basicConfig(level=logging.INFO)
    if not argv:
        print(__doc__)
        return 1

    import glob as globlib

    import jax

    import topiaxl.registry  # noqa: F401
    from topiaxl.core import build, load_config
    from topiaxl.models.latent_stats import resolve_latent_stats
    from topiaxl.pipelines.fit import FitConfig

    cfg = load_config(argv[0], overrides=argv[1:])
    data = cfg.get("data") or {}
    files = sorted(globlib.glob(data["input_glob"]))
    if not files:
        raise FileNotFoundError(f"no meshes match {data['input_glob']}")
    out_dir = data.get("output_dir") or os.path.join(cfg.output_dir, "shards")
    os.makedirs(out_dir, exist_ok=True)
    per_shard = int(data.get("assets_per_shard", 64))

    vae = build(cfg.model.vae)
    conditioner = build(cfg.model.conditioner)
    # only the VAE + conditioner encoder are needed — don't build or
    # load the (possibly ~1B-param) DiT generator for data preparation
    from topiaxl.cli.infer import load_encoder_params, load_vae_params

    key0 = jax.random.PRNGKey(int(cfg.global_seed))
    vae_params = load_vae_params(cfg, vae, key0)
    load_encoder_params(cfg, conditioner, key0,
                        native_dir=cfg.model.get("native_checkpoint_dir"))
    latent_mean, latent_std = resolve_latent_stats(cfg.model)

    fit_cfg = FitConfig(
        prim_shape=int(cfg.model.prim_shape),
        dim_feat=int(cfg.model.dim_feat),
        shape_opt_steps=int(data.get("shape_opt_steps", 2000)),
        tex_opt_steps=int(data.get("tex_opt_steps", 0)),
    )
    key = jax.random.PRNGKey(int(cfg.global_seed))

    xs, ys, shard_idx = [], [], 0

    def flush():
        nonlocal xs, ys, shard_idx
        if not xs:
            return
        path = os.path.join(out_dir, f"shard_{shard_idx:05d}.npz")
        np.savez(path, x=np.stack(xs), y=np.stack(ys))
        logger.info("wrote %s (%d assets)", path, len(xs))
        xs, ys, shard_idx = [], [], shard_idx + 1

    for i, path in enumerate(files):
        key, asset_key = jax.random.split(key)
        x, y = prepare_asset(
            path, vae, vae_params, conditioner, asset_key,
            latent_mean, latent_std,
            latent_nf=float(cfg.model.get("latent_nf", 1.0)),
            num_prims=int(cfg.model.num_prims), fit_cfg=fit_cfg)
        xs.append(x)
        ys.append(y)
        logger.info("prepared %s (%d/%d)", os.path.basename(path), i + 1,
                    len(files))
        if len(xs) >= per_shard:
            flush()
    flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
