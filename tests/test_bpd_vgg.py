"""VLB bpd loop and VGG perceptual loss module."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topiaxl.diffusion import create_diffusion, gaussian


def test_calc_bpd_loop_shapes_and_prior():
    diff = create_diffusion(
        timestep_respacing=None, noise_schedule="squaredcos_cap_v2",
        parameterization="v", diffusion_steps=8)

    def model_fn(x, t):
        return jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], -1)

    x0 = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (2, 4, 3))
    out = gaussian.calc_bpd_loop(diff, model_fn, x0, jax.random.PRNGKey(1))
    assert out["vb"].shape == (2, 8)
    assert out["total_bpd"].shape == (2,)
    assert (np.asarray(out["total_bpd"]) > 0).all()
    # prior bpd tiny for small x0 under a nearly-noise terminal marginal
    assert (np.asarray(out["prior_bpd"]) < 1.0).all()
    np.testing.assert_allclose(
        np.asarray(out["total_bpd"]),
        np.asarray(out["vb"].sum(1) + out["prior_bpd"]), rtol=1e-5)


@pytest.mark.slow
def test_vgg19_structure_and_loss():
    import torch

    from topiaxl.models.vgg import (
        VGG19Features, convert_vgg19, vgg_loss_masked,
    )

    model = VGG19Features()
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert len(feats) == 5
    # slice resolutions halve at each pool: 32,16,8,4 — first two slices
    # are pre-pool of their stage
    assert feats[0].shape[1] == 32 and feats[0].shape[-1] == 64
    assert feats[-1].shape[-1] == 512

    # converter structural parity against torchvision-layout state_dict
    import torch.nn as tnn

    convs = []
    li = 0
    sd = {}
    from topiaxl.models.vgg import _CFG

    cin = 3
    for item in _CFG:
        if item == "M":
            li += 1
            continue
        conv = tnn.Conv2d(cin, item, 3, padding=1)
        sd[f"{li}.weight"] = conv.weight.detach()
        sd[f"{li}.bias"] = conv.bias.detach()
        cin = item
        li += 2
    cp = convert_vgg19(sd)
    flat_ref = jax.tree.map(np.shape, jax.tree.map(np.asarray, params))
    flat_conv = jax.tree.map(np.shape, cp)
    assert jax.tree.all(jax.tree.map(lambda a, b: a == b, flat_ref, flat_conv))

    # loss: identical inputs => 0
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype("f"))
    mask = jnp.ones((1, 32, 32, 1))
    fn = lambda v: model.apply(params, v)
    assert float(vgg_loss_masked(fn, img, img, mask)) == 0.0
    assert float(vgg_loss_masked(fn, img, img * 0.5, mask)) > 0.0
