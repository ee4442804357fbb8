"""Flagship-dimension parallelism validation (VERDICT r1 item 5).

Toy dims (hidden 64) cannot exercise the divisibility/layout constraints
real dims carry (hidden 1152, heads 16, fused qkv 3456, mlp 4608, cond
1370x768). These tests (a) check every flagship parameter path gets the
intended PartitionSpec with NO divisibility fallback, and (b) AOT
lower+compile the fully-sharded train step at flagship dims on the
virtual 8-device mesh — GSPMD propagation runs in full, flushing layout
bugs, without paying flagship execution cost on the 1-core CI host.
"""

import logging

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from topiaxl.diffusion import create_diffusion
from topiaxl.models import DiT
from topiaxl.parallel import batch_sharding, dit_param_rules, make_mesh
from topiaxl.parallel.sharding import (
    _fit_spec,
    _path_str,
    sequence_sharding,
    sharding_tree,
    spec_for,
)
from topiaxl.pipelines.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)

FLAGSHIP = dict(seq_length=2048, in_channels=68, condition_channels=768,
                hidden_size=1152, num_heads=16, cond_drop_prob=0.1,
                attn_proj_bias=True)

# params the catch-all rule deliberately replicates at flagship dims;
# anything NEW falling through to P() must be added here consciously
EXPECTED_REPLICATED = {
    "final_layer.linear.kernel", "final_layer.linear.bias",
    "final_layer.adaLN_modulation.bias",
    "null_cond_embedding", "x_embedder.bias",
    "t_embedder.fc2.bias",
    # per-block: the Megatron pairing leaves the second-matmul biases
    # and adaLN bias replicated (they follow the all-reduced activations)
    "adaLN_modulation.bias", "attn.proj.bias", "crossattn.proj.bias",
    "mlp.fc2.bias",
}


def _flagship_shapes(depth=2, dtype=jnp.bfloat16):
    model = DiT(depth=depth, dtype=dtype, **FLAGSHIP)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 2048, 68)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 1370, 768)))
    return model, shapes


def _strip_block(path: str) -> str:
    p = path.removeprefix("params.")
    if p.startswith("blocks_"):
        return p.split(".", 1)[1]
    return p


def test_flagship_param_rules_cover_every_path(caplog):
    """Every flagship param path: the rule spec must survive _fit_spec
    unchanged on a dp x fsdp x tp mesh (no divisibility fallback), every
    matmul kernel must be non-trivially sharded, and the set of
    catch-all-replicated params must equal the frozen whitelist."""
    _, shapes = _flagship_shapes()
    mesh = make_mesh({"dp": 2, "fsdp": 2, "tp": 2})
    rules = dit_param_rules()

    replicated, table = set(), []
    with caplog.at_level(logging.WARNING, "topiaxl.parallel.sharding"):
        for path, leaf in jax.tree_util.tree_leaves_with_path(shapes):
            p = _path_str(path)
            spec = spec_for(p, rules)
            fitted = _fit_spec(spec, leaf.shape, mesh, name=p)
            assert tuple(fitted) == tuple(spec), (
                f"{p} {leaf.shape}: rule {spec} degraded to {fitted}")
            table.append((p, leaf.shape, fitted))
            if all(a is None for a in tuple(fitted)):
                replicated.add(_strip_block(p))
            elif p.endswith(".kernel"):
                assert any(a is not None for a in tuple(fitted))
    assert not caplog.records, [r.message for r in caplog.records]
    assert replicated == EXPECTED_REPLICATED, (
        f"unexpected replicated params: {replicated ^ EXPECTED_REPLICATED}")
    # spec-coverage table for the logs (VERDICT r1 item 5 'Done =')
    for p, shape, spec in table:
        logging.getLogger(__name__).info("%-60s %-18s %s", p, shape, spec)


def _compile_train_step(mesh, batch_shardings, model, shapes):
    diffusion = create_diffusion(
        timestep_respacing=None, noise_schedule="squaredcos_cap_v2",
        parameterization="v", diffusion_steps=50)
    opt = make_optimizer(lr=1e-4, warmup_iters=10, max_iters=100)
    rules = dit_param_rules()
    with mesh:
        state_shapes = jax.eval_shape(lambda p: create_train_state(p, opt),
                                      shapes)
        p_sh = sharding_tree(state_shapes.params, mesh, rules)
        e_sh = sharding_tree(state_shapes.ema_params, mesh, rules)
        attach = lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                                    sharding=sh)
        st_abs = state_shapes._replace(
            params=jax.tree.map(attach, state_shapes.params, p_sh),
            ema_params=jax.tree.map(attach, state_shapes.ema_params, e_sh),
        )
        B = 2
        batch_abs = {
            "x": jax.ShapeDtypeStruct((B, 2048, 68), jnp.float32,
                                      sharding=batch_shardings["x"]),
            "y": jax.ShapeDtypeStruct((B, 1370, 768), jnp.float32,
                                      sharding=batch_shardings["y"]),
        }
        key_abs = jax.ShapeDtypeStruct((2,), jnp.uint32)
        step = make_train_step(model, diffusion, opt)
        compiled = jax.jit(step).lower(st_abs, batch_abs, key_abs).compile()
    return compiled


@pytest.mark.slow
def test_flagship_dims_compile_dp_fsdp_tp():
    """Full GSPMD propagation of the sharded train step at flagship dims
    (depth 4) over dp=2 x fsdp=2 x tp=2."""
    model, shapes = _flagship_shapes(depth=4, dtype=jnp.float32)
    mesh = make_mesh({"dp": 2, "fsdp": 2, "tp": 2})
    bsh = batch_sharding(mesh, "dp")
    compiled = _compile_train_step(mesh, {"x": bsh, "y": bsh}, model, shapes)
    flops = (compiled.cost_analysis() or {}).get("flops", 0)
    assert flops > 1e11, f"suspiciously cheap compiled step: {flops}"


def _compile_serving(mesh, param_rules=None, depth=4, batch=8):
    """AOT lower+compile of the sharded SERVING chain (sample_tokens →
    denormalize → decode_primx) at flagship geometry: hidden 1152,
    heads 16, 2048 tokens, 1370 conditioning tokens, ddim25 scan,
    full VAE decode of batch x 2048 prims (VERDICT r4 item 5 — layout
    bugs live at these dims, not in the depth-2/hidden-64 dryrun toy)."""
    from topiaxl.models import VAE3D
    from topiaxl.pipelines.infer import (
        decode_primx, denormalize_tokens, sample_tokens,
    )

    model = DiT(depth=depth, dtype=jnp.bfloat16, **FLAGSHIP)
    vae = VAE3D(in_channels=6, latent_channels=1, out_channels=6,
                down_channels=(32, 256), up_channels=(256, 32),
                layers_per_block=2, mid_attention=True)
    diffusion = create_diffusion(
        timestep_respacing="ddim25", noise_schedule="squaredcos_cap_v2",
        parameterization="v", diffusion_steps=1000)
    dit_shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 2048, 68)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 1370, 768)))
    vae_shapes = jax.eval_shape(
        vae.init, jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 6)),
        jax.random.PRNGKey(0))
    mean = jnp.zeros((68,), jnp.float32)
    std = jnp.ones((68,), jnp.float32)

    def serve(dit_params, vae_params, y, key):
        out = sample_tokens(model, diffusion, dit_params, y, key, 6.0)
        recon = denormalize_tokens(out.sample, mean, std)
        return decode_primx(vae, vae_params, recon, num_prims=2048,
                            prim_shape=8, dim_feat=6)

    rules = param_rules if param_rules is not None else [(r".*", P())]
    with mesh:
        attach = lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                                    sharding=sh)
        dit_abs = jax.tree.map(
            attach, dit_shapes, sharding_tree(dit_shapes, mesh, rules))
        vae_abs = jax.tree.map(
            attach, vae_shapes,
            sharding_tree(vae_shapes, mesh, [(r".*", P())]))
        y_abs = jax.ShapeDtypeStruct((batch, 1370, 768), jnp.float32,
                                     sharding=batch_sharding(mesh, "dp"))
        key_abs = jax.ShapeDtypeStruct((2,), jnp.uint32)
        compiled = jax.jit(serve).lower(dit_abs, vae_abs, y_abs,
                                        key_abs).compile()
    return compiled


@pytest.mark.slow
def test_flagship_serving_compile_dp():
    """Sharded serving (asset batch over dp=8, params replicated)
    GSPMD-compiles at flagship dims incl. the 25-step scan chain."""
    mesh = make_mesh({"dp": 8})
    compiled = _compile_serving(mesh)
    flops = (compiled.cost_analysis() or {}).get("flops", 0)
    assert flops > 1e12, f"suspiciously cheap compiled chain: {flops}"


@pytest.mark.slow
def test_flagship_serving_compile_dp_tp():
    """Sharded serving with tensor-parallel DiT params
    (dit_param_rules: head/hidden-split kernels) over dp=4 x tp=2 at
    flagship dims — the VERDICT r4 item 5 'seventh dryrun line'."""
    mesh = make_mesh({"dp": 4, "tp": 2})
    compiled = _compile_serving(mesh, param_rules=dit_param_rules())
    flops = (compiled.cost_analysis() or {}).get("flops", 0)
    assert flops > 1e12, f"suspiciously cheap compiled chain: {flops}"


@pytest.mark.slow
def test_flagship_dims_compile_dp_sp():
    """Sequence-parallel layout ([B, N] sharded over dp x sp) compiles at
    flagship dims — 2048 tokens / sp=4 = 512-token shards."""
    model, shapes = _flagship_shapes(depth=4, dtype=jnp.float32)
    mesh = make_mesh({"dp": 2, "sp": 4})
    compiled = _compile_train_step(
        mesh,
        {"x": sequence_sharding(mesh), "y": batch_sharding(mesh, "dp")},
        model, shapes)
    flops = (compiled.cost_analysis() or {}).get("flops", 0)
    assert flops > 1e11, f"suspiciously cheap compiled step: {flops}"
