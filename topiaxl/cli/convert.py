"""Checkpoint conversion CLI:
``python -m topiaxl.cli.convert config.yml [--out DIR] [k=v ...]``.

One-time conversion of the reference's torch checkpoints (DiT under
'ema', VAE under 'model_state_dict', DINOv2 state_dict — reference
inference.py:254-262) into native orbax trees, so every later
``cli.infer`` / ``app`` start skips the torch load + key-mapping pass.
Reads the same config keys the inference CLI uses
(``checkpoint_path``, ``model.vae_checkpoint_path``,
``model.conditioner.encoder_checkpoint_path``) and writes
``DIR/{dit,vae,dinov2}``; point ``model.native_checkpoint_dir`` at DIR
to load them.
"""

from __future__ import annotations

import logging
import os
import sys

logger = logging.getLogger("topiaxl.convert")


def convert_all(cfg, out_dir: str) -> dict:
    """Convert every checkpoint named in cfg; returns {name: path}."""
    import jax.numpy as jnp
    import jax

    from topiaxl.core.checkpoint import save_checkpoint
    from topiaxl.core.convert import (
        convert_dinov2, convert_dit, convert_vae, load_torch_checkpoint,
    )

    os.makedirs(out_dir, exist_ok=True)
    written = {}

    def save(name, tree):
        path = os.path.join(out_dir, name)
        save_checkpoint(path, jax.tree.map(jnp.asarray, tree))
        written[name] = path
        logger.info("wrote %s", path)

    # derive hyperparameters (depths, channel lists) from the BUILT
    # models, exactly like cli/infer.py — raw config keys may be absent
    # (registry defaults) or inconsistent with the model actually used
    import topiaxl.registry  # noqa: F401
    from topiaxl.core import build

    if cfg.get("checkpoint_path"):
        dit = build(cfg.model.generator)
        sd = load_torch_checkpoint(cfg.checkpoint_path, key="ema")
        save("dit", convert_dit(sd, dit.depth))
    if cfg.model.get("vae_checkpoint_path"):
        sd = load_torch_checkpoint(cfg.model.vae_checkpoint_path,
                                   key="model_state_dict")
        save("vae", convert_vae(sd, tuple(cfg.model.vae.down_channels),
                                tuple(cfg.model.vae.up_channels)))
    if cfg.model.conditioner.get("encoder_checkpoint_path"):
        conditioner = build(cfg.model.conditioner)
        if not hasattr(conditioner, "encoder"):
            raise ValueError(
                "encoder_checkpoint_path set but the configured "
                "conditioner has no encoder")
        sd = load_torch_checkpoint(
            cfg.model.conditioner.encoder_checkpoint_path)
        save("dinov2", convert_dinov2(sd, conditioner.encoder.vit.depth))
    if not written:
        logger.warning("no checkpoint paths in config; nothing converted")
    return written


def load_native(native_dir: str, name: str):
    """Restore a converted tree (no template needed — orbax metadata)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(native_dir, name))
    if not os.path.isdir(path):
        return None
    return ocp.StandardCheckpointer().restore(path)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    logging.basicConfig(level=logging.INFO)
    if not argv:
        print(__doc__)
        return 1
    out = None
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            print(__doc__)
            return 1
        out = argv[i + 1]
        del argv[i:i + 2]

    from topiaxl.core import load_config

    cfg = load_config(argv[0], overrides=argv[1:])
    out = out or cfg.model.get("native_checkpoint_dir") or os.path.join(
        cfg.output_dir, "native_ckpts")
    written = convert_all(cfg, out)
    for name, path in written.items():
        print(name, path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
