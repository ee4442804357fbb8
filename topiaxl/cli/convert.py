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

``--verify`` replays the reference-parity golden comparisons on the
converted weights: each torch payload is loaded into the reference's own
modules (``--reference PATH``, default /root/reference) and the
converted tree must drive the topiaxl model to the same forward outputs;
source sha256 checksums + parity results are written to
``DIR/manifest.json`` and any failure exits non-zero. Run this the
moment real released checkpoints become droppable.
"""

from __future__ import annotations

import logging
import os
import sys

logger = logging.getLogger("topiaxl.convert")


def convert_all(cfg, out_dir: str, verify: bool = False,
                reference_path: str | None = None) -> dict:
    """Convert every checkpoint named in cfg; returns {name: path}.

    With ``verify=True``, each converted tree is replayed against the
    reference's own torch modules (topiaxl.core.refverify) and a
    ``manifest.json`` with source sha256 checksums + forward-parity
    results is written next to the trees. Any parity failure raises."""
    import jax.numpy as jnp
    import jax

    from topiaxl.core.checkpoint import save_checkpoint
    from topiaxl.core.convert import (
        convert_dinov2, convert_dit, convert_vae, load_torch_checkpoint,
    )

    os.makedirs(out_dir, exist_ok=True)
    written = {}
    sources = {}
    verifiers = {}

    def save(name, tree, source):
        path = os.path.join(out_dir, name)
        save_checkpoint(path, jax.tree.map(jnp.asarray, tree))
        written[name] = path
        sources[name] = source
        logger.info("wrote %s", path)

    # derive hyperparameters (depths, channel lists) from the BUILT
    # models, exactly like cli/infer.py — raw config keys may be absent
    # (registry defaults) or inconsistent with the model actually used
    import topiaxl.registry  # noqa: F401
    from topiaxl.core import build

    if cfg.get("checkpoint_path"):
        dit = build(cfg.model.generator)
        sd = load_torch_checkpoint(cfg.checkpoint_path, key="ema")
        tree = convert_dit(sd, dit.depth)
        save("dit", tree, cfg.checkpoint_path)
        verifiers["dit"] = (lambda ref, sd=sd, dit=dit, tree=tree:
                            _refverify().verify_dit(ref, sd, dit, tree))
    if cfg.model.get("vae_checkpoint_path"):
        vae = build(cfg.model.vae)
        sd = load_torch_checkpoint(cfg.model.vae_checkpoint_path,
                                   key="model_state_dict")
        tree = convert_vae(sd, tuple(vae.down_channels),
                           tuple(vae.up_channels))
        save("vae", tree, cfg.model.vae_checkpoint_path)
        verifiers["vae"] = (lambda ref, sd=sd, vae=vae, tree=tree:
                            _refverify().verify_vae(ref, sd, vae, tree))
    if cfg.model.conditioner.get("encoder_checkpoint_path"):
        conditioner = build(cfg.model.conditioner)
        if not hasattr(conditioner, "encoder"):
            raise ValueError(
                "encoder_checkpoint_path set but the configured "
                "conditioner has no encoder")
        sd = load_torch_checkpoint(
            cfg.model.conditioner.encoder_checkpoint_path)
        tree = convert_dinov2(sd, conditioner.encoder.vit.depth)
        save("dinov2", tree, cfg.model.conditioner.encoder_checkpoint_path)
        if conditioner.encoder.model_name == "dinov2_vitb14_reg":
            verifiers["dinov2"] = (
                lambda ref, sd=sd, enc=conditioner.encoder, tree=tree:
                _refverify().verify_dinov2(sd, enc, tree))
    u2net_path = cfg.get("inference", {}).get("u2net_checkpoint", "")
    if u2net_path and not os.path.isdir(u2net_path):
        from topiaxl.core.convert import convert_u2net

        sd = load_torch_checkpoint(u2net_path)
        save("u2net", convert_u2net(sd), u2net_path)
    if not written:
        logger.warning("no checkpoint paths in config; nothing converted")
    if verify and written:
        rv = _refverify()
        ref = rv.import_reference(reference_path or rv.DEFAULT_REFERENCE)
        if ref is None:
            raise RuntimeError(
                f"--verify: reference checkout not found at "
                f"{reference_path or rv.DEFAULT_REFERENCE}")
        results = {name: fn(ref) for name, fn in verifiers.items()
                   if name in written}
        rv.write_manifest(out_dir, sources, results)
        bad = [n for n, r in results.items() if not r["ok"]]
        if bad:
            raise RuntimeError(
                f"converted checkpoints FAILED reference parity: {bad} "
                f"(see {os.path.join(out_dir, 'manifest.json')})")
    return written


def _refverify():
    from topiaxl.core import refverify

    return refverify


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
    # conversion (and its torch-side verification) is pure host work —
    # pin JAX to CPU so a one-time CLI run neither waits on nor occupies
    # an accelerator (the env may force a TPU platform by default)
    import jax

    jax.config.update("jax_platforms", "cpu")
    out = None
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            print(__doc__)
            return 1
        out = argv[i + 1]
        del argv[i:i + 2]
    verify = "--verify" in argv
    if verify:
        argv.remove("--verify")
    reference_path = None
    if "--reference" in argv:
        i = argv.index("--reference")
        if i + 1 >= len(argv):
            print(__doc__)
            return 1
        reference_path = argv[i + 1]
        del argv[i:i + 2]

    from topiaxl.core import load_config

    cfg = load_config(argv[0], overrides=argv[1:])
    out = out or cfg.model.get("native_checkpoint_dir") or os.path.join(
        cfg.output_dir, "native_ckpts")
    written = convert_all(cfg, out, verify=verify,
                          reference_path=reference_path)
    for name, path in written.items():
        print(name, path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
