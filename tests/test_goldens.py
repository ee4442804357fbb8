"""Golden-value regression tests: fixed-seed outputs of the core models
and the DDIM chain, pinned at framework v1. Guards refactors (kernel
swaps, dtype changes on the f32 paths, scan restructuring) against
silent numeric drift."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "golden_v1.npz")


def _perturbed(params, seed=1, amp=0.05):
    leaves, td = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree.unflatten(
        td, [l + amp * jax.random.normal(k, l.shape) for l, k in zip(leaves, keys)]
    )


@pytest.mark.slow
def test_dit_golden():
    from topiaxl.models import DiT

    g = np.load(GOLDEN)
    dit = DiT(seq_length=8, in_channels=4, condition_channels=6,
              hidden_size=16, depth=2, num_heads=2, cond_drop_prob=0.1,
              dtype=jnp.float32)
    params = dit.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 4)),
                      jnp.zeros((1,), jnp.int32), jnp.zeros((1, 3, 6)))
    params = _perturbed(params)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 4))
    t = jnp.array([3, 7])
    y = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 6))
    out = np.asarray(dit.apply(params, x, t, y))
    np.testing.assert_allclose(out, g["dit"], atol=1e-5)


def test_vae_golden():
    from topiaxl.models import VAE3D

    g = np.load(GOLDEN)
    vae = VAE3D(in_channels=6, latent_channels=1, out_channels=6,
                down_channels=(8, 16), up_channels=(16, 8),
                layers_per_block=1, dtype=jnp.float32)
    vp = vae.init(jax.random.PRNGKey(4), jnp.zeros((1, 8, 8, 8, 6)),
                  jax.random.PRNGKey(5))
    z = jax.random.normal(jax.random.PRNGKey(6), (2, 4, 4, 4, 1))
    out = np.asarray(vae.apply(vp, z, method=VAE3D.decode))
    np.testing.assert_allclose(out, g["vae"], atol=1e-5)


def test_ddim_golden():
    from topiaxl.diffusion import create_diffusion, gaussian

    g = np.load(GOLDEN)
    diff = create_diffusion(timestep_respacing="ddim5",
                            noise_schedule="squaredcos_cap_v2",
                            parameterization="v", diffusion_steps=100)

    def model_fn(xx, tt):
        return jnp.concatenate([0.1 * xx, jnp.zeros_like(xx)], -1)

    noise = jax.random.normal(jax.random.PRNGKey(7), (1, 4, 4))
    out = np.asarray(gaussian.ddim_sample_loop(
        diff, model_fn, noise, jax.random.PRNGKey(8)).sample)
    np.testing.assert_allclose(out, g["ddim"], atol=1e-5)
