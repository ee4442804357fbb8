"""Conditioner stack: DINOv2 ViT geometry, preprocessing, wrappers."""

import jax
import jax.numpy as jnp
import numpy as np

from topiaxl.models.conditioner import DinoViT, DinoV2Wrapper, dinov2_config
from topiaxl.models.conditioner.text import TextConditioner


def test_dinov2_config_table():
    cfg = dinov2_config("dinov2_vitb14_reg")
    assert cfg == dict(embed_dim=768, depth=12, num_heads=12, patch_size=14,
                       num_register_tokens=4)


def test_dino_vit_token_shapes_small():
    # small ViT, 28x28 at patch 7 => 16 patches (+cls +regs)
    model = DinoViT(embed_dim=32, depth=2, num_heads=4, patch_size=7,
                    num_register_tokens=4, pos_embed_size=4,
                    dtype=jnp.float32)
    x = jnp.zeros((2, 28, 28, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["x_norm_clstoken"].shape == (2, 32)
    assert out["x_norm_regtokens"].shape == (2, 4, 32)
    assert out["x_norm_patchtokens"].shape == (2, 16, 32)


def test_dino_vit_pos_embed_interpolation():
    # run at a different grid than pos_embed_size -> bicubic interp path
    model = DinoViT(embed_dim=32, depth=1, num_heads=4, patch_size=7,
                    num_register_tokens=0, pos_embed_size=4,
                    dtype=jnp.float32)
    x = jnp.zeros((1, 42, 42, 3))  # 6x6 patches vs pos grid 4x4
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["x_norm_patchtokens"].shape == (1, 36, 32)


def test_wrapper_token_count_flagship_formula():
    """518/14 = 37 -> 1369 patches + cls = 1370 tokens
    (reference image_dinov2.py:60)."""
    w = DinoV2Wrapper()
    gh = w.image_size // w.vit.patch_size
    assert gh == 37
    assert 1 + gh * gh == 1370


def test_wrapper_end_to_end_small_image():
    # tiny variant of the wrapper pipeline: uint8-range input -> tokens
    w = DinoV2Wrapper.__new__(DinoV2Wrapper)
    w.model_name = "tiny"
    w.image_size = 28
    w.vit = DinoViT(embed_dim=32, depth=1, num_heads=4, patch_size=7,
                    num_register_tokens=4, pos_embed_size=4,
                    dtype=jnp.float32)
    w.params = None
    w._encode = jax.jit(w._encode_fn)
    w.init_params(jax.random.PRNGKey(0))
    img = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (1, 64, 64, 3)).astype("f"))
    tokens = w(img)
    assert tokens.shape == (1, 1 + 16, 32)
    assert np.isfinite(np.asarray(tokens)).all()


def test_text_conditioner_stub():
    t = TextConditioner(dim=16)
    out = t(["a chair", "a lamp"])
    assert out.shape == (2, 1, 16)
    # deterministic per text
    np.testing.assert_array_equal(out[0], t(["a chair"])[0])
