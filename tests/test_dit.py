"""DiT generator invariants (reference models/dit_crossattn.py:25-213)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topiaxl.models import DiT


def tiny_dit(**kw):
    kw.setdefault("seq_length", 16)
    kw.setdefault("in_channels", 8)
    kw.setdefault("condition_channels", 12)
    kw.setdefault("hidden_size", 32)
    kw.setdefault("depth", 2)
    kw.setdefault("num_heads", 4)
    kw.setdefault("cond_drop_prob", 0.1)
    kw.setdefault("dtype", jnp.float32)
    return DiT(**kw)


@pytest.fixture(scope="module")
def dit_and_params():
    model = tiny_dit()
    x = jnp.zeros((2, 16, 8))
    t = jnp.zeros((2,), jnp.int32)
    y = jnp.zeros((2, 5, 12))
    params = model.init(jax.random.PRNGKey(0), x, t, y)
    return model, params


def test_output_shape_learn_sigma(dit_and_params):
    model, params = dit_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8))
    t = jnp.array([3, 7])
    y = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 12))
    out = model.apply(params, x, t, y)
    assert out.shape == (2, 16, 16)  # 2x in_channels (learn_sigma)


def test_zero_init_gives_zero_output(dit_and_params):
    """adaLN-Zero + zero final projection => untrained net outputs 0
    (reference dit_crossattn.py:173-182)."""
    model, params = dit_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8))
    t = jnp.array([3, 7])
    y = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 12))
    out = model.apply(params, x, t, y)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def _trained_like_params(model):
    """Params with non-zero adaLN/final so the net actually computes."""
    x = jnp.zeros((1, 16, 8))
    t = jnp.zeros((1,), jnp.int32)
    y = jnp.zeros((1, 5, 12))
    params = model.init(jax.random.PRNGKey(0), x, t, y)
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    leaves = [
        l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)
    ]
    return jax.tree.unflatten(treedef, leaves)


def test_precomputed_kv_matches_direct():
    model = tiny_dit()
    params = _trained_like_params(model)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8))
    t = jnp.array([3, 7])
    y = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 12))
    direct = model.apply(params, x, t, y)
    kvs = model.apply(params, y, method=DiT.precompute_kv)
    via_kv = model.apply(params, x, t, kvs, method=DiT.forward_kv)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(via_kv), atol=1e-5)


def test_cfg_fast_matches_batch_doubled():
    """forward_with_cfg_fast (cond-only KV + precomputed null vectors)
    must reproduce forward_with_cfg_kv: softmax over a broadcast null
    token is exactly uniform, so the uncond branch's cross-attn IS
    proj(v_null). At f32 the only difference is fp summation order."""
    model = tiny_dit()
    params = _trained_like_params(model)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8))
    t = jnp.array([3, 11])
    y = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 12))

    null = params["params"]["null_cond_embedding"]
    y_null = jnp.broadcast_to(null[None, None, :], y.shape)
    kvs_pair = model.apply(
        params, jnp.concatenate([y, y_null], axis=0),
        method=DiT.precompute_kv)
    ref = model.apply(params, x, t, kvs_pair, 6.0,
                      method=DiT.forward_with_cfg_kv)

    kvs = model.apply(params, y, method=DiT.precompute_kv)
    null_outs = model.apply(params, method=DiT.precompute_null_out)
    fast = model.apply(params, x, t, kvs, null_outs, 6.0,
                       method=DiT.forward_with_cfg_fast)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_cfg_scale_one_equals_cond():
    model = tiny_dit()
    params = _trained_like_params(model)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 8))
    t = jnp.array([5])
    y = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 12))
    cond = model.apply(params, x, t, y)
    cfg = model.apply(params, x, t, y, 1.0, method=DiT.forward_with_cfg)
    np.testing.assert_allclose(np.asarray(cfg), np.asarray(cond), atol=1e-4)


def test_cfg_zero_equals_uncond():
    model = tiny_dit()
    params = _trained_like_params(model)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 8))
    t = jnp.array([5])
    y = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 12))
    null = params["params"]["null_cond_embedding"]
    y_null = jnp.broadcast_to(null[None, None, :], y.shape)
    uncond = model.apply(params, x, t, y_null)
    cfg = model.apply(params, x, t, y, 0.0, method=DiT.forward_with_cfg)
    np.testing.assert_allclose(np.asarray(cfg), np.asarray(uncond), atol=1e-4)


def test_cond_actually_conditions():
    model = tiny_dit()
    params = _trained_like_params(model)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 8))
    t = jnp.array([5])
    y1 = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 12))
    y2 = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 12))
    o1 = model.apply(params, x, t, y1)
    o2 = model.apply(params, x, t, y2)
    assert float(jnp.abs(o1 - o2).max()) > 1e-6


def test_additive_pos_emb_variant():
    from topiaxl.models.dit import DiTAdditivePosEmb, PointEmbed

    model = DiTAdditivePosEmb(
        seq_length=16, in_channels=8, condition_channels=12,
        hidden_size=36, depth=1, num_heads=4, cond_drop_prob=0.1,
        dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8))
    t = jnp.array([1, 2])
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 12))
    params = model.init(jax.random.PRNGKey(2), x, t, y)
    out = model.apply(params, x, t, y)
    assert out.shape == (2, 16, 16)
    # zero-init final => zero output, same as base DiT
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    pe = PointEmbed(hidden_dim=48, dim=36)
    pts = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 3))
    pp = pe.init(jax.random.PRNGKey(4), pts)
    emb = pe.apply(pp, pts)
    assert emb.shape == (2, 16, 36)


def test_timestep_embedding_matches_reference_formula():
    from topiaxl.models.layers import timestep_embedding

    t = jnp.array([0.0, 1.0, 999.0])
    emb = np.asarray(timestep_embedding(t, 8))
    half = 4
    freqs = np.exp(-np.log(10000) * np.arange(half) / half)
    args = np.asarray(t)[:, None] * freqs[None]
    ref = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    np.testing.assert_allclose(emb, ref, atol=1e-5)


def test_remat_invalid_string_rejected():
    import pytest as _pytest

    from topiaxl.models import DiT

    model = DiT(seq_length=8, in_channels=4, condition_channels=6,
                hidden_size=16, depth=1, num_heads=2, dtype=jnp.float32,
                remat="matmul-outputs")
    with _pytest.raises(ValueError, match="remat="):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 4)),
                   jnp.zeros((1,), jnp.int32), jnp.zeros((1, 2, 6)))


# ---- scan_blocks training layout ------------------------------------------


def test_scan_blocks_matches_unrolled():
    """scan_blocks=True computes the same forward as the unrolled model
    once params are converted between the two layouts (both directions)."""
    from topiaxl.models.dit import stack_block_params, unstack_block_params

    model = tiny_dit(cond_drop_prob=0.0)
    params = _trained_like_params(model)
    smodel = tiny_dit(cond_drop_prob=0.0, scan_blocks=True)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8))
    t = jnp.array([3, 7])
    y = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 12))
    ref = model.apply(params, x, t, y)

    sparams = stack_block_params(params)
    # shape-compatible with a fresh scan init
    init_shapes = jax.eval_shape(smodel.init, jax.random.PRNGKey(0),
                                 x, t, y)
    assert (jax.tree.structure(init_shapes)
            == jax.tree.structure(sparams))
    out = smodel.apply(sparams, x, t, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    # roundtrip back to the serving layout
    back = unstack_block_params(sparams)
    out2 = model.apply(back, x, t, y)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               atol=0, rtol=0)


@pytest.mark.parametrize("remat", [True, "dots", "flash", "flash_mlp"])
def test_scan_blocks_remat_grad_matches(remat):
    """Value+grad of the scanned model under every remat policy equals
    the unrolled no-remat model on converted params."""
    from topiaxl.models.dit import stack_block_params

    model = tiny_dit(cond_drop_prob=0.0)
    params = _trained_like_params(model)
    smodel = tiny_dit(cond_drop_prob=0.0, scan_blocks=True, remat=remat)
    sparams = stack_block_params(params)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8))
    t = jnp.array([3, 7])
    y = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 12))

    def loss_ref(p):
        return jnp.sum(model.apply(p, x, t, y) ** 2)

    def loss_scan(p):
        return jnp.sum(smodel.apply(p, x, t, y) ** 2)

    v0, g0 = jax.value_and_grad(loss_ref)(params)
    v1, g1 = jax.value_and_grad(loss_scan)(sparams)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
    g1u = jax.tree.leaves(
        __import__("topiaxl.models.dit", fromlist=["x"])
        .unstack_block_params(g1))
    g0l = jax.tree.leaves(g0)
    for a, b in zip(g0l, g1u):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-4, rtol=1e-4)


def test_scan_blocks_serving_paths_rejected():
    smodel = tiny_dit(scan_blocks=True)
    x = jnp.zeros((1, 16, 8))
    t = jnp.zeros((1,), jnp.int32)
    y = jnp.zeros((1, 5, 12))
    params = smodel.init(jax.random.PRNGKey(0), x, t, y)
    with pytest.raises(ValueError, match="unstack_block_params"):
        smodel.apply(params, y, method=DiT.precompute_kv)
