"""PrimX fitting: a short run must drive SDF error down on a sphere."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topiaxl.pipelines.fit import FitConfig, fit_primx, init_prims


def sphere_sdf(pts):
    return np.linalg.norm(pts, axis=-1) - 0.5


def test_init_prims_coverage():
    params = init_prims(64, jax.random.PRNGKey(0))
    assert params.srt.shape == (64, 4)
    scales = np.asarray(params.srt[:, 0])
    assert (scales > 0).all()
    # auto-scale: union of prim cubes covers most of [-0.9, 0.9]^3
    pos = np.asarray(params.srt[:, 1:4])
    rng = np.random.default_rng(0)
    probes = rng.uniform(-0.8, 0.8, (512, 3)).astype(np.float32)
    cheb = np.max(np.abs(probes[:, None] - pos[None]), axis=-1)
    covered = (cheb < scales[None, :]).any(axis=1)
    assert covered.mean() > 0.9


@pytest.mark.slow
def test_fit_reduces_sdf_error():
    cfg = FitConfig(batch_points=512, lr=2e-2, shape_opt_steps=400,
                    tex_opt_steps=401, prim_shape=4)
    params = fit_primx(sphere_sdf, jax.random.PRNGKey(0), num_prims=27,
                       config=cfg)

    from topiaxl.models import primx as PX

    rng = np.random.default_rng(1)
    pts = rng.uniform(-0.7, 0.7, (512, 3)).astype(np.float32)
    out = PX.query(params, jnp.asarray(pts), dim_feat=6, prim_shape=4,
                   training=True)
    pred = np.asarray(out["sdf"])[:, 0]
    tgt = sphere_sdf(pts)
    err = np.abs(pred - tgt).mean()
    # untrained payload is all zeros => error == mean |sdf| ~ 0.22
    base = np.abs(tgt).mean()
    assert err < 0.5 * base, (err, base)
