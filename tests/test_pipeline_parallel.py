"""Pipeline parallelism (pp axis): GPipe schedule over stacked DiT blocks.

Equivalence bar: the pipelined forward/train-step must reproduce the
plain single-device numerics exactly (same ops per layer; microbatching
only re-tiles the batch dim). Runs on the virtual 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topiaxl.diffusion import create_diffusion
from topiaxl.models import DiT
from topiaxl.parallel import (
    make_mesh,
    make_pp_forward,
    make_pp_train_step,
    shard_pp_params,
    stack_dit_params,
    unstack_dit_params,
)
from topiaxl.pipelines.train import (
    create_train_state,
    jit_train_step,
    make_optimizer,
    make_train_step,
)


def _model_and_params(depth=4, cond_drop_prob=0.1):
    model = DiT(seq_length=8, in_channels=4, condition_channels=6,
                hidden_size=16, depth=depth, num_heads=2,
                cond_drop_prob=cond_drop_prob, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 4)),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 3, 6)))
    return model, params


def _batch(B=4):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((B, 8, 4)), jnp.float32)
    t = jnp.asarray(rng.integers(0, 20, size=(B,)), jnp.int32)
    y = jnp.asarray(rng.standard_normal((B, 3, 6)), jnp.float32)
    return x, t, y


def test_stack_unstack_roundtrip():
    model, params = _model_and_params()
    pp = stack_dit_params(params, model.depth)
    back = unstack_dit_params(pp, model.depth)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 params, back)
    # stacked leaves carry the [depth] axis
    leaf = pp["stacked"]["attn"]["qkv"]["kernel"]
    assert leaf.shape[0] == model.depth


@pytest.mark.slow
@pytest.mark.parametrize("n_micro", [1, 2, 4])
def test_pp_forward_matches_single_device(n_micro):
    model, params = _model_and_params(depth=4)
    x, t, y = _batch(B=4)
    ref = model.apply(params, x, t, y)

    mesh = make_mesh({"pp": 4})
    pp_params = shard_pp_params(stack_dit_params(params, model.depth), mesh)
    fwd = jax.jit(make_pp_forward(model, mesh, n_micro=n_micro))
    with mesh:
        out = fwd(pp_params, x, t, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_pp_dp_train_step_matches_single_device():
    """dp=2 x pp=4 pipelined train step == plain single-device step."""
    model, params = _model_and_params(depth=4)
    diffusion = create_diffusion(
        timestep_respacing=None, noise_schedule="squaredcos_cap_v2",
        parameterization="v", diffusion_steps=20)
    opt = make_optimizer(lr=1e-3, warmup_iters=1, max_iters=100)
    x, t, y = _batch(B=4)
    batch = {"x": x, "y": y}
    key = jax.random.PRNGKey(11)

    state1 = create_train_state(params, opt)
    step1 = jit_train_step(make_train_step(model, diffusion, opt))
    s1, m1 = step1(state1, batch, key)

    mesh = make_mesh({"dp": 2, "pp": 4})
    pp_params = stack_dit_params(params, model.depth)
    with mesh:
        pp_sharded = shard_pp_params(pp_params, mesh)
        state2 = create_train_state(pp_sharded, opt)
        step2 = jax.jit(
            make_pp_train_step(model, diffusion, opt, mesh, n_micro=2))
        s2, m2 = step2(state2, batch, key)

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=2e-5)
    np.testing.assert_allclose(float(m2["grad_norm"]),
                               float(m1["grad_norm"]), rtol=2e-4)
    # updated params agree: compare one pipelined leaf against its
    # unstacked counterpart from the plain step
    upd_ref = s1.params["params"]["blocks_2"]["mlp"]["fc1"]["kernel"]
    upd_pp = s2.params["stacked"]["mlp"]["fc1"]["kernel"][2]
    np.testing.assert_allclose(np.asarray(upd_pp), np.asarray(upd_ref),
                               atol=2e-6)


@pytest.mark.slow
def test_pp_forward_quant_matches_single_device():
    """quant=True pipelines (ADVICE r1: _block_of must forward the flag,
    else apply fails with an opaque param-tree mismatch)."""
    from topiaxl.models import quantize_dit_params

    model, params = _model_and_params(depth=4)
    qmodel = model.clone(quant=True)
    qparams = quantize_dit_params(model, params)
    x, t, y = _batch(B=4)
    ref = qmodel.apply(qparams, x, t, y)

    mesh = make_mesh({"pp": 4})
    pp_params = shard_pp_params(
        stack_dit_params(qparams, qmodel.depth), mesh)
    fwd = jax.jit(make_pp_forward(qmodel, mesh, n_micro=2))
    with mesh:
        out = fwd(pp_params, x, t, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_pp_forward_dots_remat_matches_and_rejects_unknown():
    """remat='dots' must use the named-policy checkpoint (not degrade to
    full-block remat) and unknown remat strings must raise (ADVICE r1)."""
    model, params = _model_and_params(depth=4)
    dmodel = model.clone(remat="dots")
    x, t, y = _batch(B=4)
    ref = model.apply(params, x, t, y)

    mesh = make_mesh({"pp": 4})
    pp_params = shard_pp_params(stack_dit_params(params, model.depth), mesh)
    fwd = jax.jit(make_pp_forward(dmodel, mesh, n_micro=2))
    with mesh:
        out = fwd(pp_params, x, t, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    bad = model.clone(remat="everything")
    with pytest.raises(ValueError, match="remat"):
        with mesh:
            jax.jit(make_pp_forward(bad, mesh, n_micro=2))(
                pp_params, x, t, y)


def test_pp_params_actually_sharded():
    """Each pp rank holds depth/pp layers (the memory point of pp)."""
    model, params = _model_and_params(depth=4)
    mesh = make_mesh({"pp": 4})
    pp_params = shard_pp_params(stack_dit_params(params, model.depth), mesh)
    leaf = pp_params["stacked"]["attn"]["qkv"]["kernel"]
    shard_shapes = {s.data.shape for s in leaf.addressable_shards}
    assert shard_shapes == {(1,) + leaf.shape[1:]}
