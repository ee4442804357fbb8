"""Int8 (W8A8) serving path: op accuracy + quantized DiT forward."""

import jax
import jax.numpy as jnp
import numpy as np

from topiaxl.ops.int8 import int8_matmul, quantize_weight


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 32)).astype("f")) * 0.3
    q, s = quantize_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (32,)
    deq = q.astype(jnp.float32) * s[None, :]
    # per-channel symmetric: error bounded by half a quantization step
    step = np.asarray(s)
    assert np.all(np.abs(np.asarray(deq - w)) <= 0.5 * step[None, :] + 1e-7)


def test_int8_matmul_accuracy():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 96)).astype("f"))
    w = jnp.asarray(rng.standard_normal((96, 48)).astype("f")) * 0.1
    q, s = quantize_weight(w)
    out = int8_matmul(x, q, s, out_dtype=jnp.float32)
    ref = x @ w
    rel_rms = float(jnp.sqrt(jnp.mean((out - ref) ** 2) / jnp.mean(ref**2)))
    assert rel_rms < 0.02, rel_rms  # W8A8 noise floor ~0.5-1%


def test_quant_dense_matches_dense():
    import flax.linen as nn

    from topiaxl.ops.int8 import QuantDense, quantize_params_like

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 6, 32)).astype("f"))
    d = nn.Dense(16, dtype=jnp.float32)
    p = d.init(jax.random.PRNGKey(0), x)
    qd = QuantDense(16, dtype=jnp.float32)
    tpl = jax.eval_shape(qd.init, jax.random.PRNGKey(0), x)
    qp = quantize_params_like(p, tpl)
    out = qd.apply(qp, x)
    ref = d.apply(p, x)
    rel_rms = float(jnp.sqrt(jnp.mean((out - ref) ** 2) / jnp.mean(ref**2)))
    assert rel_rms < 0.02, rel_rms


def test_quantized_dit_forward_close():
    """quant=True DiT with quantize_dit_params stays within the W8A8
    noise floor of the float forward (random weights)."""
    from topiaxl.models import DiT, quantize_dit_params

    model = DiT(seq_length=16, in_channels=4, condition_channels=8,
                hidden_size=64, depth=2, num_heads=4, cond_drop_prob=0.1,
                dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 16, 4))
    t = jnp.full((1,), 3, jnp.int32)
    y = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 8))
    params = model.init(key, x, t, y)
    leaves, treedef = jax.tree.flatten(params)
    ks = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree.unflatten(treedef, [
        0.05 * jax.random.normal(k, l.shape, l.dtype)
        for k, l in zip(ks, leaves)])
    out_f = model.apply(params, x, t, y)

    qp = quantize_dit_params(model, params)
    # quantized leaves really are int8
    qkv = qp["params"]["blocks_0"]["attn"]["qkv"]
    assert qkv["kernel_q"].dtype == jnp.int8
    assert "kernel" not in qkv
    # K/V projections stay float (computed once per asset)
    assert "kernel" in qp["params"]["blocks_0"]["crossattn"]["to_k"]

    out_q = model.clone(quant=True).apply(qp, x, t, y)
    rel_rms = float(jnp.sqrt(jnp.mean((out_f - out_q) ** 2)
                             / jnp.mean(out_f**2)))
    assert rel_rms < 0.02, rel_rms

    # CFG + precomputed-KV serving entry also runs quantized
    null = qp["params"]["null_cond_embedding"]
    y_pair = jnp.concatenate(
        [y, jnp.broadcast_to(null[None, None, :], y.shape)], axis=0)
    qmodel = model.clone(quant=True)
    kvs = qmodel.apply(qp, y_pair, method=type(model).precompute_kv)
    out_cfg = qmodel.apply(qp, x, t, kvs, 4.0,
                           method=type(model).forward_with_cfg_kv)
    assert out_cfg.shape == (1, 16, 8)
    assert bool(jnp.all(jnp.isfinite(out_cfg)))
