"""Run /root/reference's OWN torch code on CPU for cross-implementation
parity tests (VERDICT r1 item 1).

The reference imports two packages absent from this environment, neither
of which its CPU-reachable math needs:

* ``xformers`` — only ``ops.memory_efficient_attention`` (plain softmax
  attention over [B, S, H, hd], default scale hd**-0.5) and ``unbind``
  are used (reference models/attention.py:17,54,109). We install a
  functionally identical torch implementation.
* ``trimesh`` — a top-level import in models/primsdf.py used only by the
  (pass-body) mesh-init path, never by ``PrimSDF.forward``.

Everything else (GaussianDiffusion/SpacedDiffusion, the DiT, the VAE,
PrimSDF) runs unmodified. This module must be imported before any
``models.*`` reference import; ``load()`` returns a namespace of the
reference modules, or raises pytest.skip when /root/reference is absent.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _install_stubs():
    from topiaxl.core.refverify import install_reference_stubs

    install_reference_stubs()


def load():
    """Import and return the reference's CPU-runnable modules."""
    import os

    import pytest

    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference checkout not available")
    _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import models.diffusion as ref_diffusion  # noqa: E402
    import models.diffusion.gaussian_diffusion as ref_gd  # noqa: E402
    import models.dit_crossattn as ref_dit  # noqa: E402
    import models.primsdf as ref_primsdf  # noqa: E402
    import models.vae3d_dib as ref_vae  # noqa: E402

    ns = types.SimpleNamespace(
        diffusion=ref_diffusion,
        gaussian_diffusion=ref_gd,
        dit=ref_dit,
        primsdf=ref_primsdf,
        vae=ref_vae,
    )
    return ns


# ---------------------------------------------------------------------------
# Tiny-config reference chain (the golden fixture recipe)
# ---------------------------------------------------------------------------

TINY = dict(
    num_prims=16, prim_shape=8, dim_feat=6,
    in_channels=68, cond_channels=32, cond_tokens=5,
    hidden=64, depth=2, heads=2,
    ddim="ddim5", cfg=6.0, latent_nf=0.9,
    grid_res=17,
)


def build_reference_models(ref, seed: int = 0):
    """Tiny random-weight reference DiT + VAE (torch, CPU, f32).

    The reference zero-inits adaLN and the final projection
    (dit_crossattn.py:176-183) which would make the chain degenerate, so
    every parameter is re-drawn N(0, 0.02) from a seeded generator —
    conversion/parity then exercises every weight path non-trivially.
    """
    import torch

    torch.manual_seed(seed)
    dit = ref.dit.DiT(
        seq_length=TINY["num_prims"], in_channels=TINY["in_channels"],
        condition_channels=TINY["cond_channels"], hidden_size=TINY["hidden"],
        depth=TINY["depth"], num_heads=TINY["heads"], mlp_ratio=4.0,
        cond_drop_prob=0.1, attn_proj_bias=True, learn_sigma=True,
    )
    # channel counts must divide the GroupNorm(32) group count
    vae = ref.vae.VAE(
        in_channels=TINY["dim_feat"], latent_channels=1,
        out_channels=TINY["dim_feat"], down_channels=(32, 64),
        mid_attention=True, up_channels=(64, 32), layers_per_block=2,
    )
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for m in (dit, vae):
            for p in m.parameters():
                p.copy_(torch.randn(p.shape, generator=g) * 0.02)
    dit.eval()
    vae.eval()
    return dit, vae


def reference_latent_stats(seed: int = 0):
    """Per-channel latent mean/std shaped so the denormalized scale
    channel stays positive (a trained model's stats do the same)."""
    import numpy as np

    rng = np.random.default_rng(seed + 2)
    mean = rng.standard_normal(TINY["in_channels"]).astype(np.float32) * 0.05
    std = rng.uniform(0.3, 0.8, TINY["in_channels"]).astype(np.float32)
    mean[0], std[0] = 0.2, 0.03       # scale channel: ~[0.08, 0.32]
    mean[1:4], std[1:4] = 0.0, 0.25   # positions within the unit cube
    return mean, std


def grid_points(res: int):
    import numpy as np

    xs = np.linspace(-1.0, 1.0, res, dtype=np.float32)
    return np.stack(np.meshgrid(xs, xs, xs, indexing="ij"),
                    axis=-1).reshape(-1, 3)


def run_reference_chain(ref, dit, vae, noise, y, latent_mean, latent_std):
    """inference.py:313-352 on CPU torch: DDIM(cfg) -> per-channel denorm
    -> VAE decode -> payload-norm inversion -> PrimSDF grid query.

    Returns every intermediate needed for cross-implementation asserts.
    """
    import torch

    t_noise = torch.from_numpy(noise)
    t_y = torch.from_numpy(y)
    diffusion = ref.diffusion.create_diffusion(
        timestep_respacing=TINY["ddim"],
        noise_schedule="squaredcos_cap_v2", parameterization="v",
        learn_sigma=True)
    model_kwargs = dict(y=t_y, cfg_scale=TINY["cfg"],
                        precision_dtype=torch.float32, enable_amp=False)
    with torch.no_grad():
        sample = None
        for out in diffusion.ddim_sample_loop_progressive(
                dit.forward_with_cfg, t_noise.shape, t_noise,
                clip_denoised=False, model_kwargs=model_kwargs,
                progress=False, device=t_noise.device):
            sample = out["sample"]
        tokens = sample.clone()
        # per-channel denorm (inference.py:329-330, perchannel_norm=True)
        mean = torch.from_numpy(latent_mean)[None, None, :]
        std = torch.from_numpy(latent_std)[None, None, :]
        recon = sample / TINY["latent_nf"] * std + mean
        srt = recon[:, :, 0:4].clone()
        lat = recon[:, :, 4:]
        decoded = vae.decode(
            lat.reshape(TINY["num_prims"], 1, 4, 4, 4))  # [N, 6, 8, 8, 8]
        feat = decoded.clone()
        feat[:, 0:1] /= 5.0
        feat[:, 1:] = (feat[:, 1:] + 1.0) / 2.0
        feat = feat.reshape(1, TINY["num_prims"], -1)

        prim = ref.primsdf.PrimSDF(
            num_prims=TINY["num_prims"], dim_feat=TINY["dim_feat"],
            prim_shape=TINY["prim_shape"])
        prim.srt_param.copy_(srt[0])
        prim.feat_param.copy_(feat[0])
        prim.eval()
        pts = torch.from_numpy(grid_points(TINY["grid_res"]))
        preds = prim(pts)
    return {
        "tokens": tokens.numpy(),
        "srt": srt.numpy(),
        "feat": feat.numpy(),
        "sdf": preds["sdf"].numpy(),
        "tex": preds["tex"].numpy(),
        "mat": preds["mat"].numpy(),
    }
