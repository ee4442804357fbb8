"""Property-based hardening (hypothesis) of core numeric invariants.

Each property is the load-bearing contract of a subsystem: trilinear
sampling parity with torch, the renderer's cumsum compositing law,
diffusion round-trips, int8 quantization error bounds, GLB IO fidelity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")  # optional test-only dep
from hypothesis import given, settings, strategies as st  # noqa: E402

SET = dict(deadline=None, max_examples=12)


@settings(**SET)
@given(
    st.integers(2, 5), st.integers(2, 6), st.integers(1, 4),
    st.integers(1, 40), st.integers(0, 2 ** 31 - 1),
)
def test_grid_sample_matches_torch(d, s, c, npts, seed):
    """grid_sample_3d == torch.nn.functional.grid_sample
    (align_corners=True, zeros padding) over random volume shapes and
    query points incl. out-of-bounds."""
    import torch

    from topiaxl.ops.grid_sample import grid_sample_3d

    rng = np.random.default_rng(seed)
    vol = rng.standard_normal((1, c, d, s, s)).astype("f")
    pts = (rng.standard_normal((1, npts, 1, 1, 3)) * 0.8).astype("f")

    ref = torch.nn.functional.grid_sample(
        torch.from_numpy(vol), torch.from_numpy(pts),
        mode="bilinear", padding_mode="zeros", align_corners=True,
    ).numpy().reshape(c, npts)

    # topiaxl layout: [C, D, H, W] volume + [N, 3] xyz points
    out = grid_sample_3d(
        jnp.asarray(vol[0]),
        jnp.asarray(pts.reshape(npts, 3)),
    )
    np.testing.assert_allclose(np.asarray(out).T, ref, atol=2e-5)


@settings(**SET)
@given(st.integers(1, 64), st.integers(0, 2 ** 31 - 1), st.floats(0.1, 4.0))
def test_additive_clamp_cumsum_equals_sequential(n, seed, scale):
    """The renderer's vectorized compositing law — contrib_i =
    min(cumsum_i, 1) - min(cumsum_{i-1}, 1) — equals the CUDA kernel's
    sequential saturating accumulation (primaccum.h:63-79 semantics)."""
    rng = np.random.default_rng(seed)
    alphas = (rng.random(n) * scale).astype("f")

    cs = np.minimum(np.cumsum(alphas), 1.0)
    contrib = np.diff(np.concatenate([[0.0], cs]))

    acc, seq = 0.0, []
    for a in alphas:
        add = min(a, 1.0 - acc)
        seq.append(add)
        acc += add
    np.testing.assert_allclose(contrib, np.asarray(seq, "f"), atol=1e-6)
    assert cs[-1] <= 1.0 + 1e-6


@settings(**SET)
@given(st.integers(2, 50), st.integers(0, 2 ** 31 - 1),
       st.sampled_from(["linear", "squaredcos_cap_v2"]))
def test_diffusion_v_eps_roundtrips(steps, seed, schedule):
    """q_sample then v/eps inversion recovers x0 at every timestep."""
    if schedule == "linear":
        # the scaled-linear schedule's domain assumes >=~50 steps
        # (beta_end = 0.02 * 1000/steps must stay <= 1; same constraint
        # as the reference gaussian_diffusion.py:99-142 assertions)
        steps = max(steps, 50)
    from topiaxl.diffusion import create_diffusion, gaussian

    diff = create_diffusion(timestep_respacing=None, noise_schedule=schedule,
                            parameterization="v", diffusion_steps=steps)
    tab = diff.tables
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(rng.standard_normal((3, 4, 2)).astype("f"))
    noise = jnp.asarray(rng.standard_normal((3, 4, 2)).astype("f"))
    t = jnp.asarray(rng.integers(0, steps, (3,)), jnp.int32)
    x_t = gaussian.q_sample(tab, x0, t, noise)
    v = gaussian.get_v(tab, x0, noise, t)
    np.testing.assert_allclose(
        np.asarray(gaussian.predict_xstart_from_v(tab, x_t, t, v)),
        np.asarray(x0), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(gaussian.predict_xstart_from_eps(tab, x_t, t, noise)),
        np.asarray(x0), atol=5e-4)


@settings(**SET)
@given(st.integers(8, 200), st.integers(4, 64), st.integers(0, 2 ** 31 - 1))
def test_int8_matmul_error_bound(k, n, seed):
    """W8A8 relative error stays within the quantization noise floor
    (~1/127 per factor, accumulated over K)."""
    from topiaxl.ops.int8 import int8_matmul, quantize_weight

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((5, k)).astype("f"))
    w = jnp.asarray(rng.standard_normal((k, n)).astype("f"))
    q, s = quantize_weight(w)
    out = int8_matmul(x, q, s, out_dtype=jnp.float32)
    ref = x @ w
    denom = float(jnp.sqrt(jnp.mean(ref ** 2))) + 1e-9
    rel = float(jnp.sqrt(jnp.mean((out - ref) ** 2))) / denom
    assert rel < 0.06, rel


@settings(**SET)
@given(st.integers(4, 60), st.integers(0, 2 ** 31 - 1), st.booleans())
def test_glb_roundtrip_random_meshes(nv, seed, with_normals):
    """write_glb -> read_glb preserves positions/indices/uv (and normals
    when given) bit-exactly for arbitrary float32 data."""
    import os
    import tempfile

    from topiaxl.extract.glb import read_glb, write_glb

    rng = np.random.default_rng(seed)
    verts = rng.standard_normal((nv, 3)).astype("f")
    nf = max(nv // 2, 1)
    faces = rng.integers(0, nv, (nf, 3)).astype(np.int64)
    uv = rng.random((nv, 2)).astype("f")
    vn = rng.standard_normal((nv, 3)).astype("f") if with_normals else None
    albedo = rng.random((8, 8, 3)).astype("f")
    mr = rng.random((8, 8, 3)).astype("f")

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "m.glb")
        write_glb(path, verts, faces, uv, faces, albedo, mr, vn=vn)
        gltf, blob = read_glb(path)

    prim = gltf["meshes"][0]["primitives"][0]

    def load(name, dtype, ncomp):
        acc = gltf["accessors"][name]
        view = gltf["bufferViews"][acc["bufferView"]]
        return np.frombuffer(blob, dtype, acc["count"] * ncomp,
                             view.get("byteOffset", 0)).reshape(-1, ncomp)

    got_v = load(prim["attributes"]["POSITION"], np.float32, 3)
    got_f = load(prim["indices"], np.uint32, 1).reshape(-1, 3)
    # writer may weld/align v to vt; roundtrip must preserve geometry:
    # every original triangle's corner positions appear identically
    np.testing.assert_array_equal(got_v[got_f], verts[faces])
    if with_normals:
        assert "NORMAL" in prim["attributes"]


@pytest.mark.slow
@settings(deadline=None, max_examples=10)
@given(
    st.integers(1, 3),            # q blocks (block_q=128 => Sq up to 384)
    st.integers(1, 3),            # kv blocks (block_k=128)
    st.integers(0, 7),            # Sq padding offset (odd lengths)
    st.integers(0, 7),            # Sk padding offset
    st.sampled_from([8, 12, 24]), # head_dim (8-aligned and not)
    st.integers(0, 2 ** 31 - 1),
)
def test_flash_fwd_bwd_matches_xla_over_shapes(nq, nk, dq_off, dk_off,
                                               hd, seed):
    """Property sweep of the transposed flash kernels over q/kv block
    counts, odd sequence lengths, and head dims — forward AND both
    backward passes must match the XLA path (interpret mode; exercises
    every kernel branch: single/multi KV block, folded padding, lane
    chunking)."""
    from topiaxl.ops.attention import _xla_attention
    from topiaxl.ops import flash_attention as fa

    rng = np.random.default_rng(seed)
    B, H = 1, 2
    Sq = nq * 128 - dq_off
    Sk = nk * 128 - dk_off
    scale = hd ** -0.5
    q = jnp.asarray(rng.standard_normal((B, Sq, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Sk, H, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Sk, H, hd)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, Sq, H, hd)), jnp.float32)

    out, lse = fa._flash_forward(q, k, v, scale, block_q=128,
                                 block_k=128, return_lse=True)
    out_x, vjp_x = jax.vjp(
        lambda a, b, c: _xla_attention(a, b, c, scale), q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_x),
                               atol=3e-5)
    dq, dk, dv = fa._flash_backward(q, k, v, out, lse, g, scale,
                                    block_q=128, block_k=128,
                                    dkv_block_q=128, dkv_block_k=128)
    for gf, gx, name in zip((dq, dk, dv), vjp_x(g), "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), atol=1e-4,
            err_msg=f"d{name} at Sq={Sq} Sk={Sk} hd={hd}")
