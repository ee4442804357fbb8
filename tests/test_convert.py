"""Checkpoint conversion: layer-level numeric parity vs torch ops, and
structural parity of the converted trees against flax model inits.
(The actual released checkpoints can't be downloaded here; structure +
per-layer numerics pin down everything but the files themselves.)"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import pytest

from topiaxl.core import convert


def _tree_paths(tree, prefix=""):
    out = set()
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out |= _tree_paths(v, path)
        else:
            out.add((path, tuple(np.shape(v))))
    return out


def test_conv_transpose3d_numeric_parity():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, 4, 4, 3)).astype(np.float32)
    tx = torch.from_numpy(x).permute(0, 4, 1, 2, 3)

    import flax.linen as nn

    for k, s, pad, fpad in [(2, 2, 0, "VALID"), (3, 1, 1, ((1, 1),) * 3)]:
        tconv = torch.nn.ConvTranspose3d(3, 5, k, stride=s, padding=pad)
        ref = tconv(tx).detach().permute(0, 2, 3, 4, 1).numpy()
        sd = {"w.weight": tconv.weight, "w.bias": tconv.bias}
        cp = convert.conv_transpose3d(sd, "w")
        m = nn.ConvTranspose(5, (k,) * 3, strides=(s,) * 3, padding=fpad)
        out = np.asarray(m.apply(
            {"params": {"kernel": jnp.asarray(cp["kernel"]),
                        "bias": jnp.asarray(cp["bias"])}},
            jnp.asarray(x)))
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_conv3d_and_linear_numeric_parity():
    import flax.linen as nn

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 4, 4, 3)).astype(np.float32)
    tx = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    tconv = torch.nn.Conv3d(3, 7, 3, padding=1)
    ref = tconv(tx).detach().permute(0, 2, 3, 4, 1).numpy()
    cp = convert.conv3d({"c.weight": tconv.weight, "c.bias": tconv.bias}, "c")
    m = nn.Conv(7, (3, 3, 3), padding=((1, 1),) * 3)
    out = np.asarray(m.apply(
        {"params": {"kernel": jnp.asarray(cp["kernel"]),
                    "bias": jnp.asarray(cp["bias"])}}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5)

    lin = torch.nn.Linear(8, 5)
    xv = rng.standard_normal((4, 8)).astype(np.float32)
    refl = lin(torch.from_numpy(xv)).detach().numpy()
    cl = convert.linear({"l.weight": lin.weight, "l.bias": lin.bias}, "l")
    outl = xv @ cl["kernel"] + cl["bias"]
    np.testing.assert_allclose(outl, refl, atol=1e-5)


def _rand_sd(shapes):
    rng = np.random.default_rng(0)
    return {k: torch.from_numpy(rng.standard_normal(v).astype(np.float32))
            for k, v in shapes.items()}


def test_convert_dit_structure_matches_model():
    from topiaxl.models import DiT

    depth, hidden, cond, inc, heads = 2, 32, 12, 8, 4
    model = DiT(seq_length=4, in_channels=inc, condition_channels=cond,
                hidden_size=hidden, depth=depth, num_heads=heads,
                cond_drop_prob=0.1, dtype=jnp.float32)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, inc)),
                     jnp.zeros((1,), jnp.int32), jnp.zeros((1, 2, cond)))

    shapes = {
        "x_embedder.weight": (hidden, inc), "x_embedder.bias": (hidden,),
        "t_embedder.mlp.0.weight": (hidden, 256),
        "t_embedder.mlp.0.bias": (hidden,),
        "t_embedder.mlp.2.weight": (hidden, hidden),
        "t_embedder.mlp.2.bias": (hidden,),
        "null_cond_embedding": (cond,),
        "final_layer.adaLN_modulation.1.weight": (2 * hidden, hidden),
        "final_layer.adaLN_modulation.1.bias": (2 * hidden,),
        "final_layer.linear.weight": (2 * inc, hidden),
        "final_layer.linear.bias": (2 * inc,),
    }
    for i in range(depth):
        b = f"blocks.{i}"
        shapes.update({
            f"{b}.adaLN_modulation.1.weight": (9 * hidden, hidden),
            f"{b}.adaLN_modulation.1.bias": (9 * hidden,),
            f"{b}.crossattn.to_q.weight": (hidden, hidden),
            f"{b}.crossattn.to_q.bias": (hidden,),
            f"{b}.crossattn.to_k.weight": (hidden, cond),
            f"{b}.crossattn.to_k.bias": (hidden,),
            f"{b}.crossattn.to_v.weight": (hidden, cond),
            f"{b}.crossattn.to_v.bias": (hidden,),
            f"{b}.crossattn.proj.weight": (hidden, hidden),
            f"{b}.crossattn.proj.bias": (hidden,),
            f"{b}.attn.qkv.weight": (3 * hidden, hidden),
            f"{b}.attn.qkv.bias": (3 * hidden,),
            f"{b}.attn.proj.weight": (hidden, hidden),
            f"{b}.attn.proj.bias": (hidden,),
            f"{b}.mlp.fc1.weight": (4 * hidden, hidden),
            f"{b}.mlp.fc1.bias": (4 * hidden,),
            f"{b}.mlp.fc2.weight": (hidden, 4 * hidden),
            f"{b}.mlp.fc2.bias": (hidden,),
        })
    sd = _rand_sd(shapes)
    conv = convert.convert_dit(sd, depth=depth)
    assert _tree_paths(conv) == _tree_paths(jax.tree.map(np.asarray, ref))


def test_convert_vae_structure_matches_model():
    from topiaxl.models import VAE3D

    model = VAE3D(in_channels=6, latent_channels=1, out_channels=6,
                  down_channels=(8, 16), up_channels=(16, 8),
                  layers_per_block=2, dtype=jnp.float32)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 6)),
                     jax.random.PRNGKey(1))

    def res_shapes(prefix, cin, cout):
        s = {
            f"{prefix}.norm1.weight": (cin,), f"{prefix}.norm1.bias": (cin,),
            f"{prefix}.conv1.weight": (cout, cin, 3, 3, 3),
            f"{prefix}.conv1.bias": (cout,),
            f"{prefix}.norm2.weight": (cout,), f"{prefix}.norm2.bias": (cout,),
            f"{prefix}.conv2.weight": (cout, cout, 3, 3, 3),
            f"{prefix}.conv2.bias": (cout,),
        }
        if cin != cout:
            s[f"{prefix}.shortcut.weight"] = (cout, cin, 1, 1, 1)
            s[f"{prefix}.shortcut.bias"] = (cout,)
        return s

    shapes = {
        "encoder.conv_in.weight": (8, 6, 3, 3, 3), "encoder.conv_in.bias": (8,),
        "encoder.down_blocks.0.downsample.weight": (8, 8, 3, 3, 3),
        "encoder.down_blocks.0.downsample.bias": (8,),
        "encoder.norm_out.weight": (16,), "encoder.norm_out.bias": (16,),
        "encoder.conv_out.weight": (2, 16, 3, 3, 3), "encoder.conv_out.bias": (2,),
        "decoder.conv_in.weight": (16, 1, 3, 3, 3), "decoder.conv_in.bias": (16,),
        "decoder.up_blocks.0.upsample.weight": (16, 16, 2, 2, 2),
        "decoder.up_blocks.0.upsample.bias": (16,),
        "decoder.norm_out.weight": (8,), "decoder.norm_out.bias": (8,),
        "decoder.conv_out.weight": (8, 6, 3, 3, 3), "decoder.conv_out.bias": (6,),
        "quant_conv.weight": (2, 2, 1, 1, 1), "quant_conv.bias": (2,),
        "post_quant_conv.weight": (1, 1, 1, 1, 1), "post_quant_conv.bias": (1,),
    }
    shapes.update(res_shapes("encoder.down_blocks.0.nets.0", 8, 8))
    shapes.update(res_shapes("encoder.down_blocks.0.nets.1", 8, 8))
    shapes.update(res_shapes("encoder.down_blocks.1.nets.0", 8, 16))
    shapes.update(res_shapes("encoder.down_blocks.1.nets.1", 16, 16))
    shapes.update(res_shapes("encoder.mid_block.nets.0", 16, 16))
    shapes.update(res_shapes("encoder.mid_block.nets.1", 16, 16))
    shapes.update({
        "encoder.mid_block.attns.0.norm.weight": (16,),
        "encoder.mid_block.attns.0.norm.bias": (16,),
        "encoder.mid_block.attns.0.attn.qkv.weight": (48, 16),
        "encoder.mid_block.attns.0.attn.proj.weight": (16, 16),
        "encoder.mid_block.attns.0.attn.proj.bias": (16,),
    })
    shapes.update(res_shapes("decoder.mid_block.nets.0", 16, 16))
    shapes.update(res_shapes("decoder.mid_block.nets.1", 16, 16))
    shapes.update({
        "decoder.mid_block.attns.0.norm.weight": (16,),
        "decoder.mid_block.attns.0.norm.bias": (16,),
        "decoder.mid_block.attns.0.attn.qkv.weight": (48, 16),
        "decoder.mid_block.attns.0.attn.proj.weight": (16, 16),
        "decoder.mid_block.attns.0.attn.proj.bias": (16,),
    })
    shapes.update(res_shapes("decoder.up_blocks.0.nets.0", 16, 16))
    shapes.update(res_shapes("decoder.up_blocks.0.nets.1", 16, 16))
    shapes.update(res_shapes("decoder.up_blocks.1.nets.0", 16, 8))
    shapes.update(res_shapes("decoder.up_blocks.1.nets.1", 8, 8))

    sd = _rand_sd(shapes)
    conv = convert.convert_vae(sd, down_channels=(8, 16), up_channels=(16, 8))
    assert _tree_paths(conv) == _tree_paths(jax.tree.map(np.asarray, ref))


def test_convert_dinov2_structure_matches_model():
    from topiaxl.models.conditioner import DinoViT

    model = DinoViT(embed_dim=32, depth=2, num_heads=4, patch_size=7,
                    num_register_tokens=4, pos_embed_size=4,
                    dtype=jnp.float32)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 3)))

    shapes = {
        "patch_embed.proj.weight": (32, 3, 7, 7),
        "patch_embed.proj.bias": (32,),
        "cls_token": (1, 1, 32),
        "pos_embed": (1, 17, 32),
        "register_tokens": (1, 4, 32),
        "norm.weight": (32,), "norm.bias": (32,),
    }
    for i in range(2):
        b = f"blocks.{i}"
        shapes.update({
            f"{b}.norm1.weight": (32,), f"{b}.norm1.bias": (32,),
            f"{b}.norm2.weight": (32,), f"{b}.norm2.bias": (32,),
            f"{b}.attn.qkv.weight": (96, 32), f"{b}.attn.qkv.bias": (96,),
            f"{b}.attn.proj.weight": (32, 32), f"{b}.attn.proj.bias": (32,),
            f"{b}.mlp.fc1.weight": (128, 32), f"{b}.mlp.fc1.bias": (128,),
            f"{b}.mlp.fc2.weight": (32, 128), f"{b}.mlp.fc2.bias": (32,),
            f"{b}.ls1.gamma": (32,), f"{b}.ls2.gamma": (32,),
        })
    sd = _rand_sd(shapes)
    conv = convert.convert_dinov2(sd, depth=2)
    assert _tree_paths(conv) == _tree_paths(jax.tree.map(np.asarray, ref))


def test_convert_cli_native_roundtrip(tmp_path):
    """cli.convert writes orbax trees that load_native restores
    bit-identically to the in-memory conversion."""
    import textwrap

    from topiaxl.cli.convert import convert_all, load_native
    from topiaxl.core import load_config

    depth, hidden, cond, inc = 1, 16, 6, 4
    shapes = {
        "x_embedder.weight": (hidden, inc), "x_embedder.bias": (hidden,),
        "t_embedder.mlp.0.weight": (hidden, 256),
        "t_embedder.mlp.0.bias": (hidden,),
        "t_embedder.mlp.2.weight": (hidden, hidden),
        "t_embedder.mlp.2.bias": (hidden,),
        "null_cond_embedding": (cond,),
        "final_layer.adaLN_modulation.1.weight": (2 * hidden, hidden),
        "final_layer.adaLN_modulation.1.bias": (2 * hidden,),
        "final_layer.linear.weight": (2 * inc, hidden),
        "final_layer.linear.bias": (2 * inc,),
        "blocks.0.adaLN_modulation.1.weight": (9 * hidden, hidden),
        "blocks.0.adaLN_modulation.1.bias": (9 * hidden,),
        "blocks.0.crossattn.to_q.weight": (hidden, hidden),
        "blocks.0.crossattn.to_q.bias": (hidden,),
        "blocks.0.crossattn.to_k.weight": (hidden, cond),
        "blocks.0.crossattn.to_k.bias": (hidden,),
        "blocks.0.crossattn.to_v.weight": (hidden, cond),
        "blocks.0.crossattn.to_v.bias": (hidden,),
        "blocks.0.crossattn.proj.weight": (hidden, hidden),
        "blocks.0.crossattn.proj.bias": (hidden,),
        "blocks.0.attn.qkv.weight": (3 * hidden, hidden),
        "blocks.0.attn.qkv.bias": (3 * hidden,),
        "blocks.0.attn.proj.weight": (hidden, hidden),
        "blocks.0.attn.proj.bias": (hidden,),
        "blocks.0.mlp.fc1.weight": (4 * hidden, hidden),
        "blocks.0.mlp.fc1.bias": (4 * hidden,),
        "blocks.0.mlp.fc2.weight": (hidden, 4 * hidden),
        "blocks.0.mlp.fc2.bias": (hidden,),
    }
    sd = _rand_sd(shapes)
    ckpt = tmp_path / "dit.pt"
    torch.save({"ema": sd}, ckpt)

    cfgf = tmp_path / "c.yml"
    cfgf.write_text(textwrap.dedent(f"""
        output_dir: {tmp_path}/out
        checkpoint_path: {ckpt}
        model:
          generator:
            class_name: topiaxl.DiT
            seq_length: 4
            in_channels: {inc}
            condition_channels: {cond}
            hidden_size: {hidden}
            depth: {depth}
            num_heads: 2
          conditioner: {{}}
    """))
    cfg = load_config(str(cfgf))
    out = str(tmp_path / "native")
    written = convert_all(cfg, out)
    assert set(written) == {"dit"}

    restored = load_native(out, "dit")
    expect = convert.convert_dit(sd, depth=depth)
    flat_r = {p: v for p, v in _tree_paths_vals(restored)}
    flat_e = {p: v for p, v in _tree_paths_vals(expect)}
    assert set(flat_r) == set(flat_e)
    for p in flat_e:
        np.testing.assert_array_equal(np.asarray(flat_r[p]),
                                      np.asarray(flat_e[p]))
    assert load_native(out, "vae") is None


def _tree_paths_vals(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths_vals(v, f"{prefix}{k}.")
    else:
        yield prefix[:-1], tree
