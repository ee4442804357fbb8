"""PrimX field behaviour (reference semantics: models/primsdf.py:52-112)."""

import jax
import jax.numpy as jnp
import numpy as np

from topiaxl.models import primx


def _random_params(rng, n=16, s=4, c=6):
    srt = np.zeros((n, 4), np.float32)
    srt[:, 0] = rng.uniform(0.2, 0.4, n)  # scale
    srt[:, 1:4] = rng.uniform(-0.5, 0.5, (n, 3))
    feat = rng.standard_normal((n, c * s**3)).astype(np.float32)
    return primx.PrimXParams(jnp.asarray(srt), jnp.asarray(feat))


def test_prim_weights_properties():
    rng = np.random.default_rng(0)
    p = _random_params(rng)
    x = jnp.asarray(rng.uniform(-1, 1, (64, 3)).astype(np.float32))
    w, wsum = primx.prim_weights(p.srt, x)
    assert w.shape == (64, 16)
    assert (np.asarray(w) >= 0).all()
    # weight is 1 at the prim center, 0 outside the prim's cube
    center = p.srt[0, 1:4][None]
    w_c, _ = primx.prim_weights(p.srt, center)
    np.testing.assert_allclose(float(w_c[0, 0]), 1.0, atol=1e-6)
    far = center + 10.0
    w_f, _ = primx.prim_weights(p.srt, far)
    assert float(jnp.sum(w_f)) == 0.0


def test_query_matches_bruteforce_dense():
    """top-K masked sampling == dense all-prim blend when K == N."""
    rng = np.random.default_rng(1)
    n, s, c = 16, 4, 6
    p = _random_params(rng, n, s, c)
    pts = rng.uniform(-0.8, 0.8, (256, 3)).astype(np.float32)
    x = jnp.asarray(pts)

    out = primx.query(p, x, dim_feat=c, prim_shape=s, top_k=n)

    # brute force: for each point sample EVERY prim, weight, and sum
    from topiaxl.ops import grid_sample_3d

    w, wsum = primx.prim_weights(p.srt, x)
    wn = np.asarray(w / (wsum + 1e-6))
    acc = np.zeros((256, c), np.float32)
    vols = np.asarray(p.feat).reshape(n, c, s, s, s)
    for i in range(n):
        rel = (pts - np.asarray(p.srt)[i, 1:4]) / np.asarray(p.srt)[i, 0]
        sampled = np.asarray(grid_sample_3d(jnp.asarray(vols[i]), jnp.asarray(rel)))
        acc += sampled * wn[:, i : i + 1]

    covered = np.asarray(wsum[:, 0] > 0)
    got = np.asarray(out["feat"])
    np.testing.assert_allclose(got[covered], acc[covered], atol=1e-4)
    # covered points: sdf equals blended channel 0
    np.testing.assert_allclose(
        np.asarray(out["sdf"])[covered, 0], acc[covered, 0], atol=1e-4
    )


def test_query_cand_idx_matches_default():
    """Caller-provided candidates (the per-cell selection path used by
    sdf_grid's band refinement) == the default dense-top_k query whenever
    the candidates cover every prim touching the point."""
    rng = np.random.default_rng(7)
    n, s, c = 16, 4, 6
    p = _random_params(rng, n, s, c)
    pts = rng.uniform(-0.8, 0.8, (128, 3)).astype(np.float32)
    x = jnp.asarray(pts)

    ref = primx.query(p, x, dim_feat=c, prim_shape=s, top_k=n)
    # all prims as candidates (trivially covering), arbitrary order
    perm = rng.permutation(n).astype(np.int32)
    cand = jnp.broadcast_to(jnp.asarray(perm)[None], (128, n))
    got = primx.query(p, x, dim_feat=c, prim_shape=s, cand_idx=cand)
    for k in ("sdf", "tex", "mat", "feat"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=1e-5, err_msg=k)

    # a strict candidate subset that still covers each point: the exact
    # positive-weight prims, padded with DISTINCT non-covering prims
    # (duplicates would double-count in the blend — contract)
    w, _ = primx.prim_weights(p.srt, x)
    w = np.asarray(w)
    K = int((w > 0).sum(1).max()) + 1
    cand_np = np.zeros((128, K), np.int32)
    for i in range(128):
        nz = np.nonzero(w[i] > 0)[0]
        pad = np.setdiff1d(np.arange(n), nz)[: K - len(nz)]
        cand_np[i] = np.concatenate([nz, pad])
    got2 = primx.query(p, x, dim_feat=c, prim_shape=s,
                       cand_idx=jnp.asarray(cand_np))
    np.testing.assert_allclose(np.asarray(got2["feat"]),
                               np.asarray(ref["feat"]), atol=1e-5)


def test_query_selector_approx_api():
    """selector='approx' returns the same results on small prim counts
    where approx_max_k is exhaustive, and unknown selectors are
    rejected. (The texture bake used to run approx; it now uses exact
    k=24, which measured both faster and ~26 dB more faithful.)"""
    import pytest

    rng = np.random.default_rng(8)
    p = _random_params(rng)
    x = jnp.asarray(rng.uniform(-0.8, 0.8, (64, 3)).astype(np.float32))
    ref = primx.query(p, x, prim_shape=4, top_k=8)
    got = primx.query(p, x, prim_shape=4, top_k=8, selector="approx")
    np.testing.assert_allclose(np.asarray(got["feat"]),
                               np.asarray(ref["feat"]), atol=1e-5)
    with pytest.raises(ValueError, match="selector"):
        primx.query(p, x, prim_shape=4, selector="fast")


def test_uncovered_fallback_sign_and_growth():
    """Far points get sdf = nearest-voxel sdf + L2 distance * sign."""
    n, s, c = 4, 4, 6
    srt = np.zeros((n, 4), np.float32)
    srt[:, 0] = 0.1
    srt[:, 1:4] = np.array([[0.5, 0, 0], [-0.5, 0, 0], [0, 0.5, 0], [0, -0.5, 0]])
    feat = np.zeros((n, c * s**3), np.float32)
    feat[:, : s**3] = 0.02  # small positive sdf everywhere
    p = primx.PrimXParams(jnp.asarray(srt), jnp.asarray(feat))

    far = jnp.asarray(np.array([[0.9, 0.9, 0.9]], np.float32))
    out = primx.query(p, far, dim_feat=c, prim_shape=s, top_k=4)
    sdf = float(out["sdf"][0, 0])
    assert sdf > 0.02  # positive sign, grows with distance
    # roughly: 0.02 + distance to nearest prim voxel
    d = np.linalg.norm(np.array([0.9, 0.9, 0.9]) - np.array([0.5, 0, 0]))
    assert abs(sdf - (0.02 + d)) < 0.25


def test_query_chunked_matches_unchunked():
    rng = np.random.default_rng(3)
    p = _random_params(rng)
    pts = jnp.asarray(rng.uniform(-1, 1, (100, 3)).astype(np.float32))
    a = primx.query(p, pts, dim_feat=6, prim_shape=4, top_k=8)
    b = primx.query_chunked(p, pts, chunk=32, dim_feat=6, prim_shape=4, top_k=8)
    np.testing.assert_allclose(np.asarray(a["sdf"]), np.asarray(b["sdf"]), atol=1e-6)


def test_sdf2alpha():
    a = primx.sdf2alpha(jnp.asarray([0.0, 0.005, 1.0]), var=0.005)
    np.testing.assert_allclose(np.asarray(a), [1.0, np.exp(-1.0), 0.0], atol=1e-6)
