"""OBJ IO, mesh SDF, and the VAE trainer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from topiaxl.extract.isosurface import extract_isosurface
from topiaxl.extract.mesh_sdf import MeshSDF
from topiaxl.extract.objio import load_obj, normalize_to_unit_cube, save_obj


def _sphere_mesh(r=24, radius=0.5):
    lin = np.linspace(-1, 1, r, dtype=np.float32)
    z, y, x = np.meshgrid(lin, lin, lin, indexing="ij")
    grid = np.sqrt(x**2 + y**2 + z**2) - radius
    return extract_isosurface(grid)


def test_obj_roundtrip(tmp_path):
    v, f = _sphere_mesh()
    vt = np.random.default_rng(0).uniform(0, 1, (len(v), 2)).astype("f")
    ft = f.copy()
    p = str(tmp_path / "m.obj")
    save_obj(p, v, f, vt, ft)
    m = load_obj(p)
    np.testing.assert_allclose(m["v"], v, atol=1e-5)
    np.testing.assert_array_equal(m["f"], f)
    np.testing.assert_allclose(m["vt"], vt, atol=1e-5)


def test_normalize_to_unit_cube():
    v = np.array([[10, 10, 10], [12, 11, 10.5]], np.float32)
    nv, center, scale = normalize_to_unit_cube(v, margin=0.1)
    assert np.abs(nv).max() <= 0.9 + 1e-5
    np.testing.assert_allclose((nv / scale) + center, v, atol=1e-4)


def test_mesh_sdf_sphere():
    v, f = _sphere_mesh()
    sdf = MeshSDF(v, f, chunk=512)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.9, 0.9, (256, 3)).astype("f")
    got = sdf(pts)
    expect = np.linalg.norm(pts, axis=1) - 0.5
    # discretized sphere: tolerance of about a voxel
    assert np.abs(got - expect).mean() < 0.03
    # signs must agree away from the surface
    far = np.abs(expect) > 0.05
    assert (np.sign(got[far]) == np.sign(expect[far])).mean() > 0.98

    surf = sdf.sample_surface(512)
    r = np.linalg.norm(surf, axis=1)
    assert abs(r.mean() - 0.5) < 0.02


@pytest.mark.slow
def test_vae_train_step_learns():
    from topiaxl.models import VAE3D
    from topiaxl.pipelines.train_vae import (
        create_vae_train_state, make_vae_train_step,
    )

    vae = VAE3D(in_channels=6, latent_channels=1, out_channels=6,
                down_channels=(8, 16), up_channels=(16, 8),
                layers_per_block=1, dtype=jnp.float32)
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 6)),
                      jax.random.PRNGKey(1))
    opt = optax.adam(3e-3)
    state = create_vae_train_state(params, opt)
    step = jax.jit(make_vae_train_step(vae, opt))

    gt = jnp.asarray(np.random.default_rng(0)
                     .uniform(-0.5, 0.5, (4, 8, 8, 8, 6)).astype("f"))
    losses = []
    for _ in range(40):
        state, m = step(state, {"gt": gt}, jax.random.PRNGKey(2))
        losses.append(float(m["loss_total"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < 0.7 * np.mean(losses[:5])
