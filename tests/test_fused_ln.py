"""Fused LN+modulate op: forward/backward parity with the unfused math."""

import jax
import jax.numpy as jnp
import numpy as np

from topiaxl.models.layers import LayerNormF32, modulate
from topiaxl.ops.fused_ln import ln_modulate


def _unfused(x, shift, scale, out_dtype):
    y = LayerNormF32(out_dtype=out_dtype).apply({}, x)
    return modulate(y, shift.astype(out_dtype), scale.astype(out_dtype))


def test_ln_modulate_matches_unfused():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 256)) * 3 + 1, jnp.float32)
    sh = jnp.asarray(rng.standard_normal((2, 256)), jnp.float32)
    sc = jnp.asarray(rng.standard_normal((2, 256)), jnp.float32)
    got = ln_modulate(x, sh, sc)
    ref = _unfused(x, sh, sc, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ln_modulate_grads_match_unfused():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 128)), jnp.float32)
    sh = jnp.asarray(rng.standard_normal((2, 128)), jnp.float32)
    sc = jnp.asarray(rng.standard_normal((2, 128)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.standard_normal((2, 8, 128)), jnp.float32)

    def f_fused(x, sh, sc):
        return jnp.sum(ln_modulate(x, sh, sc) * w)

    def f_ref(x, sh, sc):
        return jnp.sum(_unfused(x, sh, sc, jnp.float32) * w)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(x, sh, sc)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, sh, sc)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_ln_modulate_residual_matches_unfused():
    """Fused gate-add + LN + modulate == the unfused composition, value
    and gradient, plus interpret-mode kernel == fallback."""
    from topiaxl.ops.fused_ln import ln_modulate_residual

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 16, 256)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((2, 16, 256)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((2, 256)), jnp.float32)
    sh = jnp.asarray(rng.standard_normal((2, 256)), jnp.float32)
    sc = jnp.asarray(rng.standard_normal((2, 256)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((2, 16, 256)), jnp.float32)

    def unfused(x, d, g, sh, sc):
        xn = x + g[:, None, :] * d
        return xn, ln_modulate(xn, sh, sc)

    def fused(x, d, g, sh, sc):
        return ln_modulate_residual(x, d, g, sh, sc)

    xn_f, h_f = fused(x, d, g, sh, sc)
    xn_u, h_u = unfused(x, d, g, sh, sc)
    np.testing.assert_allclose(np.asarray(xn_f), np.asarray(xn_u), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_u), atol=1e-5)

    def loss(f):
        def run(*a):
            xn, h = f(*a)
            return jnp.sum(xn * w) + jnp.sum(h * w**2)
        return run

    gf = jax.grad(loss(fused), argnums=(0, 1, 2, 3, 4))(x, d, g, sh, sc)
    gu = jax.grad(loss(unfused), argnums=(0, 1, 2, 3, 4))(x, d, g, sh, sc)
    for a, b, name in zip(gf, gu, "xdgss"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=2e-4, err_msg=name)

    # the actual Pallas kernel (interpret) == fallback
    xk, hk = ln_modulate_residual(x, d, g, sh, sc, interpret=True)
    np.testing.assert_allclose(np.asarray(xk), np.asarray(xn_f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(hk), np.asarray(h_f), atol=1e-6)


def test_ln_modulate_kernel_interpret_matches_fallback():
    """The actual Pallas kernel (interpret mode) == the jnp fallback."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 256)) * 2, jnp.float32)
    sh = jnp.asarray(rng.standard_normal((2, 256)), jnp.float32)
    sc = jnp.asarray(rng.standard_normal((2, 256)), jnp.float32)
    kern = ln_modulate(x, sh, sc, interpret=True)
    fall = ln_modulate(x, sh, sc)
    np.testing.assert_allclose(np.asarray(kern), np.asarray(fall),
                               atol=1e-6, rtol=1e-6)
    # bf16 stream: kernel and fallback must round identically (both do
    # the modulate arithmetic in f32 and cast once)
    xb, shb, scb = (a.astype(jnp.bfloat16) for a in (x, sh, sc))
    kb = ln_modulate(xb, shb, scb, interpret=True)
    fb = ln_modulate(xb, shb, scb)
    assert kb.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(kb, np.float32),
                                  np.asarray(fb, np.float32))


def test_ln_modulate_bf16_stream():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 128)), jnp.bfloat16)
    sh = jnp.asarray(rng.standard_normal((1, 128)), jnp.bfloat16)
    sc = jnp.asarray(rng.standard_normal((1, 128)), jnp.bfloat16)
    out = ln_modulate(x, sh, sc)
    assert out.dtype == jnp.bfloat16
    # reference: the same f32 LN->modulate chain with one final cast
    y = _unfused(x, sh, sc, jnp.float32)
    ref = y.astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))
    # and it stays within one bf16 rounding of the unfused
    # cast-then-modulate composition
    loose = _unfused(x, sh, sc, jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(loose, np.float32),
        rtol=1.6e-2, atol=1e-2)
