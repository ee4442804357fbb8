"""3D VAE shape/behaviour tests (reference models/vae3d_dib.py:390-453)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topiaxl.models import VAE3D
from topiaxl.models.vae3d import DiagonalGaussian


@pytest.fixture(scope="module")
def vae_and_params():
    model = VAE3D(
        in_channels=6, latent_channels=1, out_channels=6,
        down_channels=(8, 16), up_channels=(16, 8), layers_per_block=1,
        dtype=jnp.float32,
    )
    x = jnp.zeros((2, 8, 8, 8, 6))
    params = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    return model, params


def test_encode_decode_shapes(vae_and_params):
    model, params = vae_and_params
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 8, 6))
    posterior = model.apply(params, x, method=VAE3D.encode)
    assert posterior.mean.shape == (2, 4, 4, 4, 1)
    z = posterior.mode()
    recon = model.apply(params, z, method=VAE3D.decode)
    assert recon.shape == (2, 8, 8, 8, 6)
    assert np.isfinite(np.asarray(recon)).all()


def test_full_forward_and_kl(vae_and_params):
    model, params = vae_and_params
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 8, 6))
    recon, posterior = model.apply(params, x, jax.random.PRNGKey(4))
    assert recon.shape == x.shape
    kl = posterior.kl()
    assert kl.shape == (2,)
    assert (np.asarray(kl) >= 0).all()


def test_diagonal_gaussian_math():
    params = jnp.concatenate(
        [jnp.zeros((1, 2, 2, 2, 1)), jnp.zeros((1, 2, 2, 2, 1))], axis=-1
    )
    p = DiagonalGaussian(params)
    # standard normal posterior has zero KL to the prior
    np.testing.assert_allclose(np.asarray(p.kl()), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p.mode()), 0.0)
    s = p.sample(jax.random.PRNGKey(0))
    assert s.shape == p.mean.shape


@pytest.mark.slow
def test_flagship_config_shapes():
    """Exact flagship geometry: [B,8^3,6] payload <-> [B,4^3,1] latent."""
    model = VAE3D(dtype=jnp.float32)  # defaults = flagship
    x = jnp.zeros((3, 8, 8, 8, 6))
    params = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    post = model.apply(params, x, method=VAE3D.encode)
    assert post.mean.shape == (3, 4, 4, 4, 1)
    out = model.apply(params, post.mode(), method=VAE3D.decode)
    assert out.shape == (3, 8, 8, 8, 6)


def test_groupnorm_matches_torch():
    """Channel-last GroupNorm == torch GroupNorm (grouping convention)."""
    import torch

    from topiaxl.models.vae3d import GroupNorm32

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 4, 4, 16)).astype(np.float32)
    gn = GroupNorm32(num_groups=4)
    params = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(gn.apply(params, jnp.asarray(x)))

    tx = torch.from_numpy(x).permute(0, 4, 1, 2, 3)  # NCDHW
    ref = torch.nn.functional.group_norm(tx, 4, eps=1e-5)
    ref = ref.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
