"""Verify converted checkpoints against the reference implementation.

The moment the real released payloads (DiT 'ema', VAE
'model_state_dict', DINOv2 state_dict — reference inference.py:254-262,
README.md:80-86) can be dropped into this environment,
``python -m topiaxl.cli.convert config.yml --verify`` replays the
cross-implementation golden comparisons from tests/test_reference_parity
ON THE REAL WEIGHTS: it loads each torch payload into the reference's
own CPU-runnable torch modules (via a functionally-identical stub for
xformers' memory_efficient_attention) and asserts the converted orbax
tree drives the topiaxl model to the same forward outputs. Results plus
source-file sha256 checksums land in ``<out>/manifest.json``.

Until real weights arrive this is exercised with synthetic stand-ins
(tests/test_convert.py), the same methodology as the parity tests.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import sys
import types

logger = logging.getLogger("topiaxl.refverify")

DEFAULT_REFERENCE = "/root/reference"


def install_reference_stubs():
    """Make the reference's torch modules importable on CPU: a plain-math
    xformers.ops (softmax attention over [B, S, H, hd], default scale
    hd**-0.5 — what memory_efficient_attention computes) and an inert
    trimesh (top-level import in models/primsdf.py, unused by forward)."""
    if "xformers" not in sys.modules:
        import torch

        def memory_efficient_attention(q, k, v, attn_bias=None, p=0.0,
                                       scale=None, op=None):
            assert attn_bias is None and p == 0.0
            if scale is None:
                scale = q.shape[-1] ** -0.5
            qt = q.permute(0, 2, 1, 3)
            kt = k.permute(0, 2, 1, 3)
            vt = v.permute(0, 2, 1, 3)
            att = torch.softmax(qt @ kt.transpose(-1, -2) * scale, dim=-1)
            return (att @ vt).permute(0, 2, 1, 3)

        xf = types.ModuleType("xformers")
        xf_ops = types.ModuleType("xformers.ops")
        xf_ops.memory_efficient_attention = memory_efficient_attention
        import torch as _torch

        xf_ops.unbind = _torch.unbind
        xf.ops = xf_ops
        sys.modules["xformers"] = xf
        sys.modules["xformers.ops"] = xf_ops
    if "trimesh" not in sys.modules:
        tm = types.ModuleType("trimesh")

        def _unavailable(*a, **k):  # pragma: no cover
            raise RuntimeError("trimesh stub: not available")

        tm.load = _unavailable
        sys.modules["trimesh"] = tm


def import_reference(path: str = DEFAULT_REFERENCE):
    """Import the reference's CPU-runnable modules; None if absent."""
    if not os.path.isdir(path):
        return None
    install_reference_stubs()
    if path not in sys.path:
        sys.path.insert(0, path)
    import models.diffusion as ref_diffusion  # noqa: E402
    import models.dit_crossattn as ref_dit  # noqa: E402
    import models.primsdf as ref_primsdf  # noqa: E402
    import models.vae3d_dib as ref_vae  # noqa: E402

    return types.SimpleNamespace(diffusion=ref_diffusion, dit=ref_dit,
                                 primsdf=ref_primsdf, vae=ref_vae)


def sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _report(name, got, want, tol):
    import numpy as np

    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    max_abs = float(np.max(np.abs(got - want)))
    scale = float(np.std(want)) or 1.0
    rel = max_abs / scale
    ok = rel <= tol
    logger.info("verify %-12s max|Δ|=%.3e rel=%.3e tol=%.1e -> %s",
                name, max_abs, rel, tol, "OK" if ok else "FAIL")
    return {"max_abs": max_abs, "rel": rel, "tol": tol, "ok": bool(ok)}


def verify_dit(ref, sd, model, params, tol: float = 1e-3) -> dict:
    """Reference DiT.forward(+CFG when the checkpoint carries the null
    embedding) vs topiaxl on the converted tree, random f32 inputs."""
    import numpy as np
    import torch

    import jax.numpy as jnp

    has_null = "null_cond_embedding" in sd
    tm = ref.dit.DiT(
        seq_length=model.seq_length, in_channels=model.in_channels,
        condition_channels=model.condition_channels,
        hidden_size=model.hidden_size, depth=model.depth,
        num_heads=model.num_heads, mlp_ratio=model.mlp_ratio,
        cond_drop_prob=0.1 if has_null else 0.0,
        attn_proj_bias=model.attn_proj_bias, learn_sigma=model.learn_sigma)
    tm.load_state_dict({k: torch.as_tensor(np.asarray(v, np.float32))
                        for k, v in sd.items()})
    tm.eval()

    rng = np.random.default_rng(0)
    B, M = 2, 5
    x = rng.standard_normal(
        (B, model.seq_length, model.in_channels)).astype(np.float32)
    t = np.array([3, 977] if True else [0], np.int64)[:B]
    y = rng.standard_normal(
        (B, M, model.condition_channels)).astype(np.float32)
    with torch.no_grad():
        if has_null:
            want = tm.forward_with_cfg(
                torch.from_numpy(x), torch.from_numpy(t),
                torch.from_numpy(y), cfg_scale=6.0).numpy()
        else:
            want = tm(torch.from_numpy(x), torch.from_numpy(t),
                      torch.from_numpy(y)).numpy()

    fmodel = model.clone(dtype=jnp.float32)
    if has_null:
        got = fmodel.apply(params, jnp.asarray(x), jnp.asarray(t),
                           jnp.asarray(y), 6.0,
                           method=type(fmodel).forward_with_cfg)
    else:
        got = fmodel.apply(params, jnp.asarray(x), jnp.asarray(t),
                           jnp.asarray(y))
    return _report("dit", got, want, tol)


def verify_vae(ref, sd, model, params, tol: float = 1e-3) -> dict:
    """Reference VAE.decode + encode moments vs topiaxl."""
    import numpy as np
    import torch

    import jax.numpy as jnp
    from ..models.vae3d import VAE3D

    tm = ref.vae.VAE(
        in_channels=model.in_channels, latent_channels=model.latent_channels,
        out_channels=model.out_channels,
        down_channels=tuple(model.down_channels),
        mid_attention=model.mid_attention,
        up_channels=tuple(model.up_channels),
        layers_per_block=model.layers_per_block,
        skip_scale=model.skip_scale)
    tm.load_state_dict({k: torch.as_tensor(np.asarray(v, np.float32))
                        for k, v in sd.items()})
    tm.eval()

    rng = np.random.default_rng(1)
    z = rng.standard_normal((4, model.latent_channels, 4, 4, 4)).astype(
        np.float32)
    with torch.no_grad():
        want = tm.decode(torch.from_numpy(z)).numpy()
    fmodel = model.clone(dtype=jnp.float32)
    got = fmodel.apply(params, jnp.asarray(z.transpose(0, 2, 3, 4, 1)),
                       method=VAE3D.decode)
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)
    return _report("vae", got, want, tol)


def verify_dinov2(sd, wrapper, params, tol: float = 2e-3,
                  reference_path: str = DEFAULT_REFERENCE) -> dict:
    """Reference vendored DINOv2 ViT (forward_features) vs the flax ViT
    on a 112x112 input (exercises pos-embed interpolation both sides)."""
    import numpy as np
    import torch

    import jax.numpy as jnp

    install_reference_stubs()
    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)
    from models.conditioner.dinov2.hub.backbones import (  # noqa: E402
        dinov2_vitb14_reg,
    )

    tm = dinov2_vitb14_reg(pretrained=False)
    missing, unexpected = tm.load_state_dict(
        {k: torch.as_tensor(np.asarray(v, np.float32))
         for k, v in sd.items()}, strict=False)
    # the released checkpoint has no mask_token use at inference; anything
    # else missing is a real conversion bug
    real_missing = [k for k in missing if k != "mask_token"]
    if real_missing or unexpected:
        logger.warning("dinov2 load: missing=%s unexpected=%s",
                       real_missing, unexpected)
    tm.eval()

    rng = np.random.default_rng(2)
    img = rng.standard_normal((1, 3, 112, 112)).astype(np.float32)
    with torch.no_grad():
        out = tm.forward_features(torch.from_numpy(img))
        want = np.concatenate([
            out["x_norm_clstoken"].numpy()[:, None, :],
            out["x_norm_patchtokens"].numpy(),
        ], axis=1)

    vit = wrapper.vit.clone(dtype=jnp.float32)
    outs = vit.apply(params, jnp.asarray(img.transpose(0, 2, 3, 1)))
    got = np.concatenate([
        np.asarray(outs["x_norm_clstoken"])[:, None, :],
        np.asarray(outs["x_norm_patchtokens"]),
    ], axis=1)
    return _report("dinov2", got, want, tol)


def write_manifest(out_dir: str, sources: dict, results: dict) -> str:
    path = os.path.join(out_dir, "manifest.json")
    payload = {
        "sources": {
            name: {"path": p, "sha256": sha256_file(p)}
            for name, p in sources.items()
        },
        "verify": results,
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)
    logger.info("wrote %s", path)
    return path
