"""Inference CLI: ``python -m topiaxl.cli.infer config.yml [k=v ...]``.

Reference entry point parity (inference.py:227-389): loads the YAML
config (+ dotlist overrides), builds generator/VAE/conditioner from the
registry, converts torch checkpoints when given, and runs
image -> PrimX -> (optional) GLB for every image in the input dir.
"""

from __future__ import annotations

import logging
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("topiaxl.infer")


def prepare_image(path: str, foreground_ratio: float = 0.85,
                  matting: str = "auto", matter=None) -> np.ndarray:
    """Load, matte, recenter (reference inference.py:33-84, 306-311).

    Matting order: an existing alpha channel wins; otherwise the learned
    U^2-Net matting (``matter``, built via ops.matting.load_u2net — the
    network rembg runs in the reference) when weights are available;
    otherwise GrabCut segmentation for real photographs; a near-white
    threshold remains as the final fallback for synthetic
    white-background renders. ``matting``: 'auto' | 'u2net' | 'grabcut'
    | 'threshold'.
    """
    import cv2

    from ..ops.matting import remove_background

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 2:
        img = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
    if img.shape[-1] == 4:
        rgba = cv2.cvtColor(img, cv2.COLOR_BGRA2RGBA)
    else:
        rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        alpha = None
        if matting == "u2net" and matter is None:
            raise ValueError(
                "matting='u2net' but no U^2-Net weights were loaded "
                "(set inference.u2net_checkpoint)")
        if matting in ("auto", "u2net") and matter is not None:
            alpha = matter(rgb)
            # saliency maps are soft; binarize faint backgrounds away
            alpha = np.where(alpha > 32, alpha, 0).astype(np.uint8)
            if not (alpha > 0).any():
                alpha = None
        if alpha is None and matting in ("auto", "grabcut"):
            alpha = remove_background(rgb)
        if alpha is None:
            if matting == "grabcut":
                raise ValueError(f"grabcut matting degenerated on {path}")
            if matting == "u2net":
                raise ValueError(f"u2net matting found nothing in {path}")
            bg = (rgb.astype(np.int32).sum(-1) > 3 * 247)
            alpha = np.where(bg, 0, 255).astype(np.uint8)
        rgba = np.dstack([rgb, alpha])

    ys, xs = np.nonzero(rgba[..., 3] > 0)
    if len(ys) == 0:
        raise ValueError(f"no foreground found in {path}")
    fg = rgba[ys.min():ys.max() + 1, xs.min():xs.max() + 1]
    size = max(fg.shape[:2])
    sq = np.zeros((size, size, 4), np.uint8)
    oy = (size - fg.shape[0]) // 2
    ox = (size - fg.shape[1]) // 2
    sq[oy:oy + fg.shape[0], ox:ox + fg.shape[1]] = fg
    new_size = int(size / foreground_ratio)
    out = np.zeros((new_size, new_size, 4), np.uint8)
    o = (new_size - size) // 2
    out[o:o + size, o:o + size] = sq

    mask = (out[..., 3:4] > 0)
    rgb = out[..., :3] * mask
    return rgb.astype(np.float32)


def load_model_params(cfg, dit, vae, conditioner, key):
    """Parameters from converted torch checkpoints, or random init
    (reference inference.py:254-262: DiT under 'ema', VAE under
    'model_state_dict', DINOv2 from its own state_dict). Also loads or
    initializes the conditioner encoder in place. Shared by the CLI and
    the app (topiaxl/app.py)."""
    import jax
    import jax.numpy as jnp

    from topiaxl.core.convert import convert_dit, load_torch_checkpoint

    def _maybe_quantize(params):
        """Float DiT weights -> int8 form when the generator is built
        with quant=True (model.generator.quant in the YAML)."""
        if not getattr(dit, "quant", False):
            return params
        blk = params["params"].get("blocks_0", {})
        if "kernel_q" in blk.get("attn", {}).get("qkv", {}):
            return params  # already quantized (e.g. random init)
        from topiaxl.models import quantize_dit_params

        logger.info("quantizing DiT weights for int8 serving")
        return quantize_dit_params(dit, params)

    def _load_encoder(native_dir=None):
        load_encoder_params(cfg, conditioner, key, native_dir=native_dir)

    native_dir = cfg.model.get("native_checkpoint_dir")
    if native_dir:
        # pre-converted orbax trees (cli/convert.py) — skips the torch
        # load + key-mapping pass on every start
        from topiaxl.cli.convert import load_native

        dit_params = load_native(native_dir, "dit")
        vae_params = load_native(native_dir, "vae")
        if dit_params is not None and vae_params is not None:
            _load_encoder(native_dir)
            logger.info("loaded native checkpoints from %s", native_dir)
            return (_maybe_quantize(jax.tree.map(jnp.asarray, dit_params)),
                    jax.tree.map(jnp.asarray, vae_params))
        logger.warning("native_checkpoint_dir %s incomplete; falling back",
                       native_dir)

    if cfg.get("checkpoint_path"):
        sd = load_torch_checkpoint(cfg.checkpoint_path, key="ema")
        dit_params = _maybe_quantize(
            jax.tree.map(jnp.asarray, convert_dit(sd, dit.depth)))
        logger.info("loaded DiT EMA weights from %s", cfg.checkpoint_path)
    else:
        logger.warning("no checkpoint_path: DiT runs with random init")
        x = jnp.zeros((1, dit.seq_length, dit.in_channels))
        dit_params = jax.jit(dit.init)(
            key, x, jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 2, dit.condition_channels)))

    vae_params = load_vae_params(cfg, vae, key)
    _load_encoder()
    return dit_params, vae_params


def load_vae_params(cfg, vae, key):
    """VAE weights alone: native tree, torch checkpoint, or random init."""
    import jax
    import jax.numpy as jnp

    from topiaxl.core.convert import convert_vae, load_torch_checkpoint

    native_dir = cfg.model.get("native_checkpoint_dir")
    if native_dir:
        from topiaxl.cli.convert import load_native

        p = load_native(native_dir, "vae")
        if p is not None:
            return jax.tree.map(jnp.asarray, p)
    if cfg.model.get("vae_checkpoint_path"):
        sd = load_torch_checkpoint(cfg.model.vae_checkpoint_path,
                                   key="model_state_dict")
        return jax.tree.map(
            jnp.asarray,
            convert_vae(sd, tuple(cfg.model.vae.down_channels),
                        tuple(cfg.model.vae.up_channels)),
        )
    logger.warning("no vae_checkpoint_path: VAE runs with random init")
    return vae.init(key, jnp.zeros((1, 8, 8, 8, 6)), key)


def load_encoder_params(cfg, conditioner, key, native_dir=None):
    """Conditioner encoder weights in place: native tree if present, else
    the configured torch checkpoint, else random init (with a warning)."""
    import jax
    import jax.numpy as jnp

    from topiaxl.core.convert import convert_dinov2, load_torch_checkpoint

    if not hasattr(conditioner, "encoder"):
        return
    dv2 = None
    if native_dir:
        from topiaxl.cli.convert import load_native

        dv2 = load_native(native_dir, "dinov2")
    if dv2 is not None:
        conditioner.encoder.params = jax.tree.map(jnp.asarray, dv2)
        return
    dv2_ckpt = cfg.model.conditioner.get("encoder_checkpoint_path")
    if dv2_ckpt:
        sd = load_torch_checkpoint(dv2_ckpt)
        conditioner.encoder.params = jax.tree.map(
            jnp.asarray,
            convert_dinov2(sd, conditioner.encoder.vit.depth))
    elif hasattr(conditioner.encoder, "init_params"):
        logger.warning("no DINOv2 checkpoint: conditioner runs random init")
        conditioner.encoder.init_params(key)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    logging.basicConfig(level=logging.INFO)
    if not argv:
        print(__doc__)
        return 1

    import topiaxl.registry  # noqa: F401  (populate the factory table)
    from topiaxl.core import build, load_config
    from topiaxl.diffusion import create_diffusion
    from topiaxl.models.latent_stats import resolve_latent_stats
    from topiaxl.pipelines import infer as P
    from topiaxl.render.visualize import (
        visualize_primvolume, visualize_video_primvolume,
    )

    cfg = load_config(argv[0], overrides=argv[1:])
    inference_dir = os.path.join(cfg.output_dir, "inference_folder")
    os.makedirs(inference_dir, exist_ok=True)

    key = jax.random.PRNGKey(int(cfg.inference.seed))

    dit = build(cfg.model.generator)
    vae = build(cfg.model.vae)
    conditioner = build(cfg.model.conditioner)
    dit_params, vae_params = load_model_params(cfg, dit, vae, conditioner,
                                               key)

    diffusion = create_diffusion(
        timestep_respacing=(f"ddim{cfg.inference.ddim}"
                            if cfg.inference.ddim > 0 else None),
        noise_schedule=cfg.diffusion.noise_schedule,
        diffusion_steps=cfg.diffusion.diffusion_steps,
        parameterization=cfg.diffusion.parameterization,
    )

    latent_mean, latent_std = resolve_latent_stats(cfg.model)

    img_dir = cfg.inference.input_dir
    img_list = sorted(
        f for f in os.listdir(img_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))
    )
    logger.info("running inference on %d images", len(img_list))

    from topiaxl.ops.matting import load_u2net

    matter = load_u2net(cfg.inference.get("u2net_checkpoint", ""))
    matting = cfg.inference.get("matting", "auto")
    if matter is not None:
        logger.info("matting: U^2-Net (%s)", matter.model.arch)

    for name in img_list:
        stem = os.path.splitext(name)[0]
        out_dir = os.path.join(inference_dir, stem)
        os.makedirs(out_dir, exist_ok=True)
        image = prepare_image(os.path.join(img_dir, name),
                              matting=matting, matter=matter)
        y = conditioner.encode_image(jnp.asarray(image[None]))

        key, gen_key = jax.random.split(key)
        params = P.generate_primx(
            dit, vae, diffusion, dit_params, vae_params, y, gen_key,
            latent_mean, latent_std,
            latent_nf=float(cfg.model.get("latent_nf", 1.0)),
            cfg_scale=float(cfg.inference.get("cfg", 0.0)),
            prim_shape=cfg.model.prim_shape, dim_feat=cfg.model.dim_feat,
            # 'ddim' (reference default) | 'dpm' (DPM-Solver++ 2M: same
            # quality at roughly half the steps) | 'ancestral'
            sampler=cfg.inference.get("sampler", "ddim"),
        )
        P.save_primx(os.path.join(out_dir, "denoised.npz"), params)

        recon = jnp.concatenate([params.srt, params.feat], axis=-1)[None]
        visualize_primvolume(
            os.path.join(out_dir, "recon.jpg"), recon,
            cfg.image_height, cfg.image_width, cfg.model.prim_shape)
        if cfg.get("debug"):
            visualize_video_primvolume(out_dir, recon, 60,
                                       cfg.image_height, cfg.image_width)
        logger.info("stage1 done: %s", stem)

        if cfg.inference.export_glb:
            try:
                glb = P.extract_glb(
                    params, out_dir,
                    mc_resolution=cfg.inference.mc_resolution,
                    decimate=cfg.inference.decimate,
                    batch_size=cfg.inference.batch_size,
                    prim_shape=cfg.model.prim_shape,
                    dim_feat=cfg.model.dim_feat,
                    fast_unwrap=cfg.inference.get("fast_unwrap", True),
                    remesh=cfg.inference.get("remesh", False),
                    ssaa=int(cfg.inference.get("ssaa", 1)),
                )
                logger.info("stage2 done: %s", glb)
            except RuntimeError as e:
                # e.g. empty isosurface from an untrained model — stage-1
                # artifacts are already persisted
                logger.error("stage2 failed for %s: %s", stem, e)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
