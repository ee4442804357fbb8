"""Attention ops: XLA path vs torch SDPA, Pallas flash kernel vs XLA path,
and the bicubic-antialias resize vs torch."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import pytest

from topiaxl.ops.attention import multi_head_attention
from topiaxl.ops.flash_attention import flash_attention
from topiaxl.ops.resize import resize_bicubic


def _rand_qkv(rng, B=2, Sq=64, Sk=48, H=4, D=16):
    q = rng.standard_normal((B, Sq, H, D)).astype(np.float32)
    k = rng.standard_normal((B, Sk, H, D)).astype(np.float32)
    v = rng.standard_normal((B, Sk, H, D)).astype(np.float32)
    return q, k, v


def _torch_sdpa(q, k, v, scale):
    tq = torch.from_numpy(q).permute(0, 2, 1, 3)  # [B,H,S,D]
    tk = torch.from_numpy(k).permute(0, 2, 1, 3)
    tv = torch.from_numpy(v).permute(0, 2, 1, 3)
    out = torch.nn.functional.scaled_dot_product_attention(
        tq, tk, tv, scale=scale)
    return out.permute(0, 2, 1, 3).numpy()


def test_xla_attention_matches_torch():
    rng = np.random.default_rng(0)
    q, k, v = _rand_qkv(rng)
    for scale in [16**-0.5, 1.0 / 16]:  # self-attn and the double-scaled cross
        ours = np.asarray(multi_head_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale))
        ref = _torch_sdpa(q, k, v, scale)
        np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_flash_attention_matches_xla():
    rng = np.random.default_rng(1)
    # odd lengths + head_dim 72 exercise the padding/masking paths
    q, k, v = _rand_qkv(rng, B=2, Sq=100, Sk=77, H=3, D=72)
    scale = 72**-0.5
    ours = np.asarray(flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale))
    ref = np.asarray(multi_head_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_flash_attention_grad_runs():
    rng = np.random.default_rng(2)
    q, k, v = _rand_qkv(rng, B=1, Sq=32, Sk=32, H=2, D=16)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, 0.25) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()
        assert float(jnp.abs(gi).max()) > 0


def test_resize_bicubic_matches_torch_downscale():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (1, 96, 96, 3)).astype(np.float32)
    ours = np.asarray(resize_bicubic(jnp.asarray(img), 37, 37))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(img).permute(0, 3, 1, 2), size=(37, 37),
        mode="bicubic", antialias=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_resize_bicubic_matches_torch_upscale():
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 1, (1, 24, 24, 3)).astype(np.float32)
    ours = np.asarray(resize_bicubic(jnp.asarray(img), 48, 48))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(img).permute(0, 3, 1, 2), size=(48, 48),
        mode="bicubic", antialias=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_flash_backward_matches_xla_vjp():
    """The fused FlashAttention-2 backward (dq + dkv Pallas passes) must
    match the XLA attention VJP, including non-multiple-of-block KV
    lengths (cross-attn 1370-token case) and padded head dims."""
    import jax

    from topiaxl.ops.attention import _xla_attention
    from topiaxl.ops.flash_attention import flash_attention

    rng = np.random.default_rng(7)
    for (B, Sq, Sk, H, hd, scale) in [
        (2, 64, 64, 2, 8, 8**-0.5),
        (1, 48, 21, 2, 12, 1.0 / 12.0),   # ragged KV + double-scale
    ]:
        q = jnp.asarray(rng.standard_normal((B, Sq, H, hd)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, Sk, H, hd)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, Sk, H, hd)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((B, Sq, H, hd)), jnp.float32)

        out_f, vjp_f = jax.vjp(lambda a, b, c:
                               flash_attention(a, b, c, scale), q, k, v)
        out_x, vjp_x = jax.vjp(lambda a, b, c:
                               _xla_attention(a, b, c, scale), q, k, v)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                                   atol=2e-5)
        for gf, gx, name in zip(vjp_f(g), vjp_x(g), "qkv"):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gx), atol=5e-5,
                err_msg=f"d{name} (B={B},Sq={Sq},Sk={Sk})")


def test_flash_backward_fold_agrees_with_forward():
    """512 < Sq < 1024 (non-multiple of 512): the forward folds lse to
    ceil8(Sq) with its 1024-row blocks while the backward defaults to
    512-row blocks — the backward must adopt the forward's padded length
    instead of reading past the saved lse (ADVICE r1)."""
    import jax

    from topiaxl.ops.attention import _xla_attention
    from topiaxl.ops.flash_attention import flash_attention

    rng = np.random.default_rng(11)
    B, Sq, Sk, H, hd, scale = 1, 600, 160, 2, 8, 8**-0.5
    q = jnp.asarray(rng.standard_normal((B, Sq, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Sk, H, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Sk, H, hd)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, Sq, H, hd)), jnp.float32)

    out_f, vjp_f = jax.vjp(lambda a, b, c:
                           flash_attention(a, b, c, scale), q, k, v)
    out_x, vjp_x = jax.vjp(lambda a, b, c:
                           _xla_attention(a, b, c, scale), q, k, v)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               atol=2e-5)
    for gf, gx, name in zip(vjp_f(g), vjp_x(g), "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   atol=5e-5, err_msg=f"d{name} Sq=600")


def test_flash_backward_through_training_loss():
    """End-to-end gradient through a jitted loss using flash attention."""
    import jax

    from topiaxl.ops.flash_attention import flash_attention

    rng = np.random.default_rng(8)
    q = jnp.asarray(rng.standard_normal((1, 32, 2, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 24, 2, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 24, 2, 8)), jnp.float32)

    @jax.jit
    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, 8**-0.5) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for gr in grads:
        assert np.isfinite(np.asarray(gr)).all()
        assert float(jnp.abs(gr).max()) > 0


def test_flash_multi_kv_block_paths_match_xla():
    """Drive the MULTI-KV-block kernels (the fori/unrolled loop paths the
    flagship single-block fast paths skip) with small custom blocks:
    nk>1 in the forward and dq pass, multiple q chunks in the dkv pass.
    With several KV blocks the transposed operands are lane-sliced at
    block_k offsets, so block_k must be 128-aligned — use 128."""
    import jax

    from topiaxl.ops.attention import _xla_attention
    from topiaxl.ops import flash_attention as fa

    rng = np.random.default_rng(13)
    B, Sq, Sk, H, hd, scale = 1, 256, 380, 2, 12, 12**-0.5
    q = jnp.asarray(rng.standard_normal((B, Sq, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Sk, H, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Sk, H, hd)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, Sq, H, hd)), jnp.float32)

    out, lse = fa._flash_forward(q, k, v, scale, block_q=128, block_k=128,
                                 return_lse=True)
    out_x, vjp_x = jax.vjp(lambda a, b, c:
                           _xla_attention(a, b, c, scale), q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_x),
                               atol=2e-5)
    dq, dk, dv = fa._flash_backward(q, k, v, out, lse, g, scale,
                                    block_q=128, block_k=128,
                                    dkv_block_q=128, dkv_block_k=128)
    for gf, gx, name in zip((dq, dk, dv), vjp_x(g), "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), atol=5e-5,
            err_msg=f"d{name} multi-KV-block path")


def test_flash_fused_backward_matches_two_pass():
    """The single-pass fused backward (dq+dk+dv in one kernel, taken when
    the KV fits one block) must match the two-pass FlashAttention-2 form
    bit-for-meaningful-bit at the same blocks, including ragged KV
    (cross-attn-like) and ragged Sq padding."""
    import jax

    from topiaxl.ops import flash_attention as fa

    rng = np.random.default_rng(23)
    for (B, Sq, Sk, H, hd, scale) in [
        (1, 256, 256, 2, 12, 12**-0.5),
        (1, 250, 170, 2, 8, 8**-0.5),      # ragged Sq AND Sk
        (2, 128, 344, 1, 24, 24**-0.5),    # Sk pads to 344 single block
    ]:
        q = jnp.asarray(rng.standard_normal((B, Sq, H, hd)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, Sk, H, hd)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, Sk, H, hd)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((B, Sq, H, hd)), jnp.float32)
        out, lse = fa._flash_forward(q, k, v, scale, return_lse=True)
        # fused: default blocks make the KV a single block
        fused = fa._flash_backward(q, k, v, out, lse, g, scale)
        # two-pass: force multi-KV blocks so the fused gate is skipped
        twop = fa._flash_backward(q, k, v, out, lse, g, scale,
                                  block_q=128, block_k=128,
                                  dkv_block_q=128, dkv_block_k=128)
        for gf, gt, name in zip(fused, twop, "qkv"):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gt), atol=2e-5,
                err_msg=f"d{name} fused vs two-pass (Sq={Sq},Sk={Sk})")


def test_flash_fused_backward_multichunk_paths():
    """ADVICE r3 #4: the fused backward's software-pipelined chunk loop
    (nq 2-16 — the path taken at flagship 2048/128) and the nq>16
    fori_loop body were never exercised by the single-chunk shapes
    above. Sq=512 @ chunk 128 drives nq=4; Sq=2304 drives nq=18."""
    import jax

    from topiaxl.ops import flash_attention as fa

    rng = np.random.default_rng(31)
    for (B, Sq, Sk, H, hd) in [
        (1, 512, 256, 2, 8),     # nq=4: pipelined python-loop path
        (1, 2304, 256, 1, 8),    # nq=18: fori_loop path
    ]:
        scale = hd**-0.5
        q = jnp.asarray(rng.standard_normal((B, Sq, H, hd)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, Sk, H, hd)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, Sk, H, hd)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((B, Sq, H, hd)), jnp.float32)
        out, lse = fa._flash_forward(q, k, v, scale, return_lse=True)
        # dkv_block_q=128 fixes the fused lg/dp chunk at 128
        fused = fa._flash_backward(q, k, v, out, lse, g, scale,
                                   dkv_block_q=128)
        twop = fa._flash_backward(q, k, v, out, lse, g, scale,
                                  block_q=128, block_k=128,
                                  dkv_block_q=128, dkv_block_k=128)
        for gf, gt, name in zip(fused, twop, "qkv"):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gt), atol=2e-5,
                err_msg=f"d{name} fused multichunk (Sq={Sq})")


def test_flash_fused_backward_gate_fallbacks():
    """ADVICE r3 #1/#2: shapes that must NOT take the fused single-pass
    backward still produce correct grads through the two-pass kernels —
    (a) sq_p a non-multiple of the chunk ladder (1920: falls to the
    128-divisor), exercised for correctness; (b) long-query shapes
    beyond the q-side VMEM gate."""
    import jax

    from topiaxl.ops import flash_attention as fa

    rng = np.random.default_rng(37)
    # (a) Sq=1920: ladder chunk must drop to a 128-aligned divisor, never
    # chunk=sq_p (which would put a [sk_p, 1920] f32 pair in VMEM)
    B, Sq, Sk, H, hd = 1, 1920, 256, 1, 8
    scale = hd**-0.5
    q = jnp.asarray(rng.standard_normal((B, Sq, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Sk, H, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Sk, H, hd)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, Sq, H, hd)), jnp.float32)
    out, lse = fa._flash_forward(q, k, v, scale, return_lse=True)
    got = fa._flash_backward(q, k, v, out, lse, g, scale)
    ref = fa._flash_backward(q, k, v, out, lse, g, scale,
                             block_q=128, block_k=128,
                             dkv_block_q=128, dkv_block_k=128)
    for gf, gt, name in zip(got, ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gt),
                                   atol=2e-5,
                                   err_msg=f"d{name} Sq=1920 divisor chunk")


def test_fused_chunk_selection_invariants():
    """ADVICE r4 #1: the fused-backward chunk must always divide sq_p and
    be 128-lane-aligned (or equal a sub-128 sq_p) — the kernel slices
    transposed [d, sq_p] operands at i*chunk offsets. The r4 regression
    shape sq_p=1920/sk_p=2048 picked 240 (non-aligned) because the
    ladder was seeded from the mutated dkv_block_q and the divisor
    search lacked an alignment filter."""
    from topiaxl.ops import flash_attention as fa

    d_p = 128
    for sq_p in (128, 256, 384, 512, 640, 1024, 1408, 1920, 2048, 2176):
        for sk_p in (256, 512, 1408, 2048):
            c = fa._select_fused_chunk(sq_p, sk_p, sk_p, d_p, 256)
            if c is None:
                continue
            assert sq_p % c == 0, (sq_p, sk_p, c)
            assert c % 128 == 0 or c == sq_p <= 128, (sq_p, sk_p, c)
            assert 5.5 * 4 * sk_p * c <= 11_000_000, (sq_p, sk_p, c)
    # the regression shape takes the fused path with an aligned chunk
    c = fa._select_fused_chunk(1920, 2048, 2048, d_p, 256)
    assert c == 128, c
    # sub-lane sequences still fuse as a single chunk
    c = fa._select_fused_chunk(64, 256, 256, d_p, 256)
    assert c == 64, c


def test_flash_fused_backward_1920x2048_matches_two_pass():
    """Numerical check at the exact ADVICE r4 #1 regression shape
    (sq_p=1920, sk_p=2048): fused single-pass backward vs forced
    two-pass."""
    from topiaxl.ops import flash_attention as fa

    rng = np.random.default_rng(41)
    B, Sq, Sk, H, hd = 1, 1920, 2048, 1, 8
    scale = hd**-0.5
    q = jnp.asarray(rng.standard_normal((B, Sq, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Sk, H, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Sk, H, hd)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, Sq, H, hd)), jnp.float32)
    out, lse = fa._flash_forward(q, k, v, scale, return_lse=True)
    fused = fa._flash_backward(q, k, v, out, lse, g, scale)
    twop = fa._flash_backward(q, k, v, out, lse, g, scale,
                              block_q=128, block_k=512,
                              dkv_block_q=128, dkv_block_k=512)
    for gf, gt, name in zip(fused, twop, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gt), atol=3e-5,
            err_msg=f"d{name} fused vs two-pass (Sq=1920, Sk=2048)")
