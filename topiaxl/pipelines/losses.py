"""Training loss functions (pure JAX).

Parity with the reference loss zoo (dva/losses.py:17-239): PrimX fitting
(staged shape -> texture schedule with a primitive-volume regularizer),
VAE reconstruction variants (L1 / per-channel-group L1 / L2 / FFT-domain)
with KL, and a metrics flattener. All are pure functions returning
(loss_total, loss_dict); the stage schedule is data (a traced iteration
scalar drives jnp.where gates, so one compiled step serves every stage).
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp


def vae_loss(gt, recon, posterior, weights: Mapping, kind: str = "l1"):
    """VAELoss / VAESepLoss / VAESepL2Loss (dva/losses.py:38-100).

    gt/recon: [B, ..., C] channels-last; channel groups are
    [0]=SDF, [1:4]=RGB, [4:6]=rough/metal.
    """
    loss_dict = {}
    kl = posterior.kl().mean()
    loss_dict["loss_kl"] = kl

    if kind == "l1":
        rec = jnp.mean(jnp.abs(gt - recon))
        loss_dict["loss_recon_l1"] = rec
        total = weights["recon"] * rec + weights["kl"] * kl
    elif kind in ("sep_l1", "sep_l2"):
        diff = jnp.abs(gt - recon) if kind == "sep_l1" else (gt - recon) ** 2
        sdf = jnp.mean(diff[..., 0:1])
        rgb = jnp.mean(diff[..., 1:4])
        mat = jnp.mean(diff[..., 4:6])
        loss_dict.update(loss_sdf_l1=sdf, loss_rgb_l1=rgb, loss_mat_l1=mat)
        total = (weights["sdf"] * sdf + weights["rgb"] * rgb
                 + weights["mat"] * mat)
        if "kl" in weights:
            total = total + weights["kl"] * kl
    elif kind == "dct":
        # FFT-domain recon (DCTLoss, dva/losses.py:17-36)
        fg = jnp.fft.fft(gt.reshape(gt.shape[0], -1))
        fr = jnp.fft.fft(recon.reshape(recon.shape[0], -1))
        # mean |view_as_real(fft_gt) - view_as_real(fft_recon)|
        rec = (jnp.mean(jnp.abs(fg.real - fr.real))
               + jnp.mean(jnp.abs(fg.imag - fr.imag))) / 2.0
        loss_dict["loss_recon_dct_l1"] = rec
        loss_dict["loss_recon_l1"] = jnp.mean(jnp.abs(gt - recon))
        total = weights["recon"] * rec + weights["kl"] * kl
    else:
        raise ValueError(kind)

    loss_dict["loss_total"] = total
    return total, loss_dict


def primsdf_fit_loss(
    inputs: Mapping,
    preds: Mapping,
    weights: Mapping,
    iteration,
    shape_opt_steps: int = 2000,
    tex_opt_steps: int = 6000,
):
    """Staged PrimX fitting loss (dva/losses.py:102-148): SDF L1 (+ prim
    volume regularizer) while iteration < shape_opt_steps, then tex/mat
    L1. ``iteration`` may be traced — stages gate via where."""
    it = jnp.asarray(iteration)
    in_shape = (it < shape_opt_steps).astype(jnp.float32)
    in_tex = ((it >= shape_opt_steps) & (it < tex_opt_steps)).astype(jnp.float32)

    loss_dict = {}
    loss_sdf = jnp.mean(jnp.abs(preds["sdf"] - inputs["sdf"]))
    loss_dict["loss_sdf_l1"] = loss_sdf
    total = in_shape * weights["sdf_l1"] * loss_sdf

    if "vol_sum" in weights:
        # prim_scale here is 1/scale (normalized cube convention —
        # see the reference's comment, dva/losses.py:122-124)
        vol = jnp.mean(jnp.sum(jnp.prod(1.0 / preds["prim_scale"], axis=-1),
                               axis=-1))
        loss_dict["loss_prim_vol_sum"] = vol
        total = total + in_shape * weights["vol_sum"] * vol

    loss_tex = jnp.mean(jnp.abs(preds["tex"] - inputs["tex"]))
    loss_dict["loss_tex_l1"] = loss_tex
    total = total + in_tex * weights["rgb_l1"] * loss_tex
    if "mat_l1" in weights and "mat" in preds:
        loss_mat = jnp.mean(jnp.abs(preds["mat"] - inputs["mat"]))
        loss_dict["loss_mat_l1"] = loss_mat
        total = total + in_tex * weights["mat_l1"] * loss_mat

    if "grad_l2" in weights and "grad" in preds:
        g = jnp.mean((preds["grad"] - inputs["grad"]) ** 2)
        loss_dict["loss_grad_l2"] = g
        total = total + weights["grad_l2"] * g

    loss_dict["loss_total"] = total
    return total, loss_dict


def process_losses(loss_dict: Mapping, reduce: bool = True) -> dict:
    """Metric flattener (dva/losses.py:230-239)."""
    out = {}
    for k, v in loss_dict.items():
        v = jnp.asarray(v)
        out[k] = jnp.mean(v) if reduce else v
    return out
