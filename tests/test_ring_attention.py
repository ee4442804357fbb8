"""Ring attention (context-parallel) vs dense attention numerics."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from topiaxl.ops.attention import multi_head_attention
from topiaxl.ops.ring_attention import ring_attention


def _rand_qkv(B=2, N=32, H=4, D=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, N, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, N, H, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, N, H, D), jnp.float32)
    return q, k, v


def test_ring_attention_degenerate_matches_dense():
    q, k, v = _rand_qkv()
    out = ring_attention(q, k, v, 0.25, axis_name=None)
    ref = multi_head_attention(q, k, v, scale=0.25, backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_attention_matches_dense_on_mesh():
    """8-way token-sharded ring == dense attention (full softmax over
    the whole sequence, merged online across the ring)."""
    from jax import shard_map

    from topiaxl.parallel import make_mesh

    q, k, v = _rand_qkv(B=2, N=64, H=4, D=16, seed=1)
    scale = 16 ** -0.5
    ref = multi_head_attention(q, k, v, scale=scale, backend="xla")

    mesh = make_mesh({"sp": 8})
    spec = P(None, "sp", None, None)
    f = shard_map(
        functools.partial(ring_attention, scale=scale, axis_name="sp"),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )
    out = jax.jit(f)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_attention_uneven_heads_and_cross_shapes():
    """Ring with q-length != head count variations and nontrivial scale;
    also checks bf16 inputs keep dtype."""
    from jax import shard_map

    from topiaxl.parallel import make_mesh

    B, N, H, D = 1, 48, 2, 8
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (B, N, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, N, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, N, H, D), jnp.bfloat16)
    scale = 0.37
    ref = multi_head_attention(q, k, v, scale=scale, backend="xla")

    mesh = make_mesh({"sp": 4})
    spec = P(None, "sp", None, None)
    f = shard_map(
        functools.partial(ring_attention, scale=scale, axis_name="sp"),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )
    out = jax.jit(f)(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2)


def test_ring_attention_gradients_match():
    """jax.grad flows through the ring (ppermute is differentiable):
    d/dq of a scalar loss matches the dense-attention gradient."""
    from jax import shard_map

    from topiaxl.parallel import make_mesh

    q, k, v = _rand_qkv(B=1, N=32, H=2, D=8, seed=5)
    scale = 8 ** -0.5

    def loss_dense(q, k, v):
        o = multi_head_attention(q, k, v, scale=scale, backend="xla")
        return jnp.sum(o ** 2)

    mesh = make_mesh({"sp": 4})
    spec = P(None, "sp", None, None)
    ring = shard_map(
        functools.partial(ring_attention, scale=scale, axis_name="sp"),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )

    def loss_ring(q, k, v):
        return jnp.sum(ring(q, k, v) ** 2)

    g_ref = jax.grad(loss_dense)(q, k, v)
    g_ring = jax.jit(jax.grad(loss_ring))(q, k, v)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_ref),
                               atol=5e-4, rtol=5e-4)


def test_cp_dit_forward_matches_jit():
    """Full DiT forward under shard_map with ring self-attention ==
    the plain jit forward (model-level context parallelism)."""
    from topiaxl.models import DiT
    from topiaxl.parallel import make_mesh
    from topiaxl.parallel.context import make_cp_forward

    model = DiT(seq_length=32, in_channels=6, condition_channels=8,
                hidden_size=32, depth=2, num_heads=4, cond_drop_prob=0.1,
                dtype=jnp.float32, attn_backend="xla")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 32, 6))
    t = jnp.array([3, 7], jnp.int32)
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 8))
    params = model.init(key, x, t, y)
    # randomize so blocks aren't identity (adaLN-Zero init)
    leaves, td = jax.tree.flatten(params)
    ks = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    params = jax.tree.unflatten(td, [
        0.1 * jax.random.normal(k, l.shape, l.dtype)
        for k, l in zip(ks, leaves)])

    ref = model.apply(params, x, t, y)

    mesh = make_mesh({"sp": 8})
    cp_fwd = make_cp_forward(model, mesh, axis="sp")
    out = cp_fwd(params, x, t, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
