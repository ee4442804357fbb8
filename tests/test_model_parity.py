"""Model-level checkpoint-conversion parity vs torch (VERDICT r1 item 5).

Each test RECONSTRUCTS the reference architecture in torch from its spec
(models/dit_crossattn.py: 9-chunk adaLN order, fused self-attn qkv,
double-scaled cross-attn; models/vae3d_dib.py: resnet/attention/mid
blocks with skip_scale; the vendored Meta DINOv2 block), initializes it
randomly, converts the state_dict with topiaxl.core.convert, and asserts
FULL-FORWARD agreement at f32. This is the only way to catch adaLN
chunk-order / fused-qkv-layout / conv-flip bugs before real weights
arrive — golden tests against our own outputs cannot.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from topiaxl.core import convert

torch.manual_seed(0)


def _attn(q, k, v, scale):
    # [B, N, H, hd] -> [B, N, H*hd]; plain softmax attention, the math
    # xformers memory_efficient_attention computes (scale applied to qk)
    B, N, H, hd = q.shape
    q = q.permute(0, 2, 1, 3)
    k = k.permute(0, 2, 1, 3)
    v = v.permute(0, 2, 1, 3)
    att = torch.softmax(q @ k.transpose(-1, -2) * scale, dim=-1)
    out = att @ v
    return out.permute(0, 2, 1, 3).reshape(B, N, H * hd)


# ---------------------------------------------------------------------------
# DiT (reference models/dit_crossattn.py:25-213)
# ---------------------------------------------------------------------------

class TSelfAttn(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.h = heads
        self.qkv = tnn.Linear(dim, dim * 3, bias=True)
        self.proj = tnn.Linear(dim, dim, bias=True)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.h, C // self.h)
        out = _attn(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
                    (C // self.h) ** -0.5)
        return self.proj(out)


class TCrossAttn(tnn.Module):
    """Reference quirk: q is PRE-scaled by hd**-0.5 on top of the
    attention's own hd**-0.5 (models/attention.py:105)."""

    def __init__(self, dim, cond_dim, heads):
        super().__init__()
        self.h = heads
        self.to_q = tnn.Linear(dim, dim, bias=True)
        self.to_k = tnn.Linear(cond_dim, dim, bias=True)
        self.to_v = tnn.Linear(cond_dim, dim, bias=True)
        self.proj = tnn.Linear(dim, dim, bias=True)

    def forward(self, x, y):
        B, N, C = x.shape
        M = y.shape[1]
        hd = C // self.h
        q = self.to_q(x).reshape(B, N, self.h, hd) * hd ** -0.5
        k = self.to_k(y).reshape(B, M, self.h, hd)
        v = self.to_v(y).reshape(B, M, self.h, hd)
        return self.proj(_attn(q, k, v, hd ** -0.5))


class TDiTBlock(tnn.Module):
    def __init__(self, dim, cond_dim, heads):
        super().__init__()
        ln = lambda: tnn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.norm1, self.norm2, self.norm3 = ln(), ln(), ln()
        self.crossattn = TCrossAttn(dim, cond_dim, heads)
        self.attn = TSelfAttn(dim, heads)
        self.mlp = tnn.Sequential()
        self.mlp.fc1 = tnn.Linear(dim, 4 * dim)
        self.mlp.fc2 = tnn.Linear(4 * dim, dim)
        self.adaLN_modulation = tnn.Sequential(
            tnn.SiLU(), tnn.Linear(dim, 9 * dim))

    def forward(self, x, y, c):
        mods = self.adaLN_modulation(c).chunk(9, dim=1)
        (s_mca, sc_mca, g_mca, s_msa, sc_msa, g_msa,
         s_mlp, sc_mlp, g_mlp) = mods

        def mod(h, s, sc):
            return h * (1 + sc.unsqueeze(1)) + s.unsqueeze(1)

        x = x + g_mca.unsqueeze(1) * self.crossattn(
            mod(self.norm1(x), s_mca, sc_mca), y)
        x = x + g_msa.unsqueeze(1) * self.attn(
            mod(self.norm2(x), s_msa, sc_msa))
        h = mod(self.norm3(x), s_mlp, sc_mlp)
        h = self.mlp.fc2(tF.gelu(self.mlp.fc1(h), approximate="tanh"))
        return x + g_mlp.unsqueeze(1) * h


class TDiT(tnn.Module):
    def __init__(self, in_ch, cond_dim, dim, depth, heads):
        super().__init__()
        self.x_embedder = tnn.Linear(in_ch, dim)
        self.t_embedder = tnn.Module()
        self.t_embedder.mlp = tnn.Sequential(
            tnn.Linear(256, dim), tnn.SiLU(), tnn.Linear(dim, dim))
        self.blocks = tnn.ModuleList(
            [TDiTBlock(dim, cond_dim, heads) for _ in range(depth)])
        self.final_layer = tnn.Module()
        self.final_layer.norm_final = tnn.LayerNorm(
            dim, elementwise_affine=False, eps=1e-6)
        self.final_layer.linear = tnn.Linear(dim, 2 * in_ch)
        self.final_layer.adaLN_modulation = tnn.Sequential(
            tnn.SiLU(), tnn.Linear(dim, 2 * dim))
        self.null_cond_embedding = tnn.Parameter(torch.randn(cond_dim))

    @staticmethod
    def timestep_embedding(t, dim=256, max_period=10000):
        half = dim // 2
        freqs = torch.exp(
            -math.log(max_period) * torch.arange(half, dtype=torch.float32)
            / half)
        args = t[:, None].float() * freqs[None]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

    def forward(self, x, t, y):
        x = self.x_embedder(x)
        c = self.t_embedder.mlp(self.timestep_embedding(t))
        for blk in self.blocks:
            x = blk(x, y, c)
        shift, scale = self.final_layer.adaLN_modulation(c).chunk(2, dim=1)
        h = self.final_layer.norm_final(x)
        h = h * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)
        return self.final_layer.linear(h)


def test_dit_full_forward_parity():
    from topiaxl.models import DiT

    depth, dim, cond, inc, heads = 2, 32, 12, 8, 4
    tmodel = TDiT(inc, cond, dim, depth, heads).eval()
    # the reference zero-inits adaLN/final projections; randomize them so
    # the modulation paths are actually exercised
    for m in tmodel.modules():
        if isinstance(m, tnn.Linear):
            tnn.init.normal_(m.weight, std=0.2)
            tnn.init.normal_(m.bias, std=0.1)

    sd = tmodel.state_dict()
    params = convert.convert_dit(sd, depth=depth)
    params = jax.tree.map(jnp.asarray, params)

    model = DiT(seq_length=8, in_channels=inc, condition_channels=cond,
                hidden_size=dim, depth=depth, num_heads=heads,
                cond_drop_prob=0.1, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, inc)).astype(np.float32)
    t = np.array([3, 17], np.int64)
    y = rng.standard_normal((2, 5, cond)).astype(np.float32)

    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x), torch.from_numpy(t),
                     torch.from_numpy(y)).numpy()
    out = np.asarray(model.apply(params, jnp.asarray(x),
                                 jnp.asarray(t.astype(np.int32)),
                                 jnp.asarray(y)))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# VAE3D (reference models/vae3d_dib.py:93-453)
# ---------------------------------------------------------------------------

class TResBlock(tnn.Module):
    def __init__(self, cin, cout, skip_scale, groups=32):
        super().__init__()
        self.norm1 = tnn.GroupNorm(min(groups, cin), cin, eps=1e-5)
        self.conv1 = tnn.Conv3d(cin, cout, 3, padding=1)
        self.norm2 = tnn.GroupNorm(min(groups, cout), cout, eps=1e-5)
        self.conv2 = tnn.Conv3d(cout, cout, 3, padding=1)
        self.shortcut = (tnn.Conv3d(cin, cout, 1) if cin != cout
                         else tnn.Identity())
        self.skip_scale = skip_scale

    def forward(self, x):
        res = x
        x = self.conv1(tF.silu(self.norm1(x)))
        x = self.conv2(tF.silu(self.norm2(x)))
        return (x + self.shortcut(res)) * self.skip_scale


class TVolumeAttn(tnn.Module):
    def __init__(self, c, heads, skip_scale, groups=32):
        super().__init__()
        self.norm = tnn.GroupNorm(min(groups, c), c, eps=1e-5)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(c, 3 * c, bias=False)
        self.attn.proj = tnn.Linear(c, c, bias=True)
        self.h = heads
        self.skip_scale = skip_scale

    def forward(self, x):
        B, C, D, H, W = x.shape
        res = x
        h = self.norm(x).permute(0, 2, 3, 4, 1).reshape(B, -1, C)
        qkv = self.attn.qkv(h).reshape(B, -1, 3, self.h, C // self.h)
        o = _attn(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
                  (C // self.h) ** -0.5)
        o = self.attn.proj(o)
        o = o.reshape(B, D, H, W, C).permute(0, 4, 1, 2, 3)
        return (o + res) * self.skip_scale


class TMid(tnn.Module):
    def __init__(self, c, skip_scale, heads=8):
        super().__init__()
        self.nets = tnn.ModuleList(
            [TResBlock(c, c, skip_scale), TResBlock(c, c, skip_scale)])
        self.attns = tnn.ModuleList([TVolumeAttn(c, heads, skip_scale)])

    def forward(self, x):
        x = self.nets[0](x)
        x = self.attns[0](x)
        return self.nets[1](x)


class TVAE(tnn.Module):
    def __init__(self, cin=6, latent=1, cout=6, down=(8, 16), up=(16, 8),
                 layers=2, skip_scale=float(np.sqrt(0.5))):
        super().__init__()
        enc = tnn.Module()
        enc.conv_in = tnn.Conv3d(cin, down[0], 3, padding=1)
        blocks = []
        for i, ch in enumerate(down):
            b = tnn.Module()
            prev = down[i - 1] if i else down[0]
            b.nets = tnn.ModuleList(
                [TResBlock(prev if j == 0 else ch, ch, skip_scale)
                 for j in range(layers)])
            if i != len(down) - 1:
                b.downsample = tnn.Conv3d(ch, ch, 3, stride=2, padding=1)
            blocks.append(b)
        enc.down_blocks = tnn.ModuleList(blocks)
        enc.mid_block = TMid(down[-1], skip_scale)
        enc.norm_out = tnn.GroupNorm(min(32, down[-1]), down[-1], eps=1e-5)
        enc.conv_out = tnn.Conv3d(down[-1], 2 * latent, 3, padding=1)
        self.encoder = enc

        dec = tnn.Module()
        dec.conv_in = tnn.Conv3d(latent, up[0], 3, padding=1)
        dec.mid_block = TMid(up[0], skip_scale)
        ublocks = []
        for i, ch in enumerate(up):
            b = tnn.Module()
            prev = up[i - 1] if i else up[0]
            b.nets = tnn.ModuleList(
                [TResBlock(prev if j == 0 else ch, ch, skip_scale)
                 for j in range(layers)])
            if i != len(up) - 1:
                b.upsample = tnn.ConvTranspose3d(ch, ch, 2, stride=2)
            ublocks.append(b)
        dec.up_blocks = tnn.ModuleList(ublocks)
        dec.norm_out = tnn.GroupNorm(min(32, up[-1]), up[-1], eps=1e-5)
        dec.conv_out = tnn.ConvTranspose3d(up[-1], cout, 3, stride=1,
                                           padding=1)
        self.decoder = dec
        self.quant_conv = tnn.Conv3d(2 * latent, 2 * latent, 1)
        self.post_quant_conv = tnn.Conv3d(latent, latent, 1)

    def encode_moments(self, x):
        e = self.encoder
        x = e.conv_in(x)
        for b in e.down_blocks:
            for net in b.nets:
                x = net(x)
            if hasattr(b, "downsample"):
                x = b.downsample(x)
        x = e.mid_block(x)
        x = e.conv_out(tF.silu(e.norm_out(x)))
        return self.quant_conv(x)

    def decode(self, z):
        d = self.decoder
        x = d.conv_in(self.post_quant_conv(z))
        x = d.mid_block(x)
        for b in d.up_blocks:
            for net in b.nets:
                x = net(x)
            if hasattr(b, "upsample"):
                x = b.upsample(x)
        return d.conv_out(tF.silu(d.norm_out(x)))


def test_vae_full_forward_parity():
    from topiaxl.models import VAE3D

    tvae = TVAE().eval()
    sd = tvae.state_dict()
    params = jax.tree.map(jnp.asarray,
                          convert.convert_vae(sd, down_channels=(8, 16),
                                              up_channels=(16, 8)))
    model = VAE3D(in_channels=6, latent_channels=1, out_channels=6,
                  down_channels=(8, 16), up_channels=(16, 8),
                  layers_per_block=2, dtype=jnp.float32)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 8, 8, 6)).astype(np.float32)
    tx = torch.from_numpy(x).permute(0, 4, 1, 2, 3)  # NCDHW

    with torch.no_grad():
        mom_ref = tvae.encode_moments(tx).permute(0, 2, 3, 4, 1).numpy()
    post = model.apply(params, jnp.asarray(x), method=VAE3D.encode)
    moments = np.concatenate(
        [np.asarray(post.mean), np.asarray(post.logvar)], axis=-1)
    # logvar clamp only differs outside [-30, 20]; random nets stay inside
    np.testing.assert_allclose(moments, mom_ref, atol=2e-4, rtol=1e-3)

    z = rng.standard_normal((2, 4, 4, 4, 1)).astype(np.float32)
    with torch.no_grad():
        dec_ref = tvae.decode(
            torch.from_numpy(z).permute(0, 4, 1, 2, 3)
        ).permute(0, 2, 3, 4, 1).numpy()
    dec = np.asarray(model.apply(params, jnp.asarray(z),
                                 method=VAE3D.decode))
    np.testing.assert_allclose(dec, dec_ref, atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# DINOv2 ViT (vendored Meta implementation)
# ---------------------------------------------------------------------------

class TDinoBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = TSelfAttn(dim, heads)
        self.ls1 = tnn.Module()
        self.ls1.gamma = tnn.Parameter(torch.randn(dim) * 0.1)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, 4 * dim)
        self.mlp.fc2 = tnn.Linear(4 * dim, dim)
        self.ls2 = tnn.Module()
        self.ls2.gamma = tnn.Parameter(torch.randn(dim) * 0.1)

    def forward(self, x):
        x = x + self.ls1.gamma * self.attn(self.norm1(x))
        h = self.mlp.fc2(tF.gelu(self.mlp.fc1(self.norm2(x))))
        return x + self.ls2.gamma * h


class TDino(tnn.Module):
    def __init__(self, dim=32, depth=2, heads=4, patch=7, regs=4, grid=4):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, patch, stride=patch)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.1)
        self.pos_embed = tnn.Parameter(torch.randn(1, 1 + grid * grid, dim) * 0.1)
        self.register_tokens = tnn.Parameter(torch.randn(1, regs, dim) * 0.1)
        self.blocks = tnn.ModuleList(
            [TDinoBlock(dim, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.regs = regs

    def forward(self, img):  # img [B, 3, H, W]
        B = img.shape[0]
        x = self.patch_embed.proj(img).flatten(2).transpose(1, 2)
        x = x + self.pos_embed[:, 1:]
        cls = self.cls_token.expand(B, -1, -1) + self.pos_embed[:, :1]
        x = torch.cat([cls, self.register_tokens.expand(B, -1, -1), x], 1)
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)


def test_dinov2_full_forward_parity():
    from topiaxl.models.conditioner import DinoViT

    tdino = TDino().eval()
    sd = tdino.state_dict()
    params = jax.tree.map(jnp.asarray, convert.convert_dinov2(sd, depth=2))

    model = DinoViT(embed_dim=32, depth=2, num_heads=4, patch_size=7,
                    num_register_tokens=4, pos_embed_size=4,
                    dtype=jnp.float32)
    rng = np.random.default_rng(2)
    img = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)

    with torch.no_grad():
        ref = tdino(torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()
    out = model.apply(params, jnp.asarray(img))
    got = np.concatenate(
        [np.asarray(out["x_norm_clstoken"])[:, None],
         np.asarray(out["x_norm_regtokens"]),
         np.asarray(out["x_norm_patchtokens"])], axis=1)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# CLIP text/vision towers (transformers-random-init parity)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_clip_text_tower_parity():
    from transformers import CLIPTextConfig, CLIPTextModel

    from topiaxl.models.conditioner.clip import (
        CLIPTextTower, convert_clip_text,
    )

    cfg = CLIPTextConfig(vocab_size=100, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, max_position_embeddings=16,
                         eos_token_id=99)
    tm = CLIPTextModel(cfg).eval()
    ids = np.array([[5, 7, 23, 99, 0, 0], [1, 2, 3, 4, 5, 99]], np.int64)
    with torch.no_grad():
        out = tm(input_ids=torch.from_numpy(ids))
        ref_h = out.last_hidden_state.numpy()
        ref_p = out.pooler_output.numpy()

    tower = CLIPTextTower(vocab_size=100, hidden_size=32, num_layers=2,
                          num_heads=4, mlp_dim=64, max_positions=16,
                          eos_token_id=99)
    params = jax.tree.map(jnp.asarray,
                          convert_clip_text(tm.state_dict(), num_layers=2))
    got = tower.apply(params, jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(got["last_hidden_state"]), ref_h,
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got["pooled"]), ref_p,
                               atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_clip_vision_tower_parity():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    from topiaxl.models.conditioner.clip import (
        CLIPVisionTower, convert_clip_vision,
    )

    cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=28, patch_size=7)
    tm = CLIPVisionModel(cfg).eval()
    rng = np.random.default_rng(4)
    img = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        out = tm(pixel_values=torch.from_numpy(img).permute(0, 3, 1, 2))
        ref_h = out.last_hidden_state.numpy()
        ref_p = out.pooler_output.numpy()

    tower = CLIPVisionTower(hidden_size=32, num_layers=2, num_heads=4,
                            mlp_dim=64, patch_size=7, image_size=28)
    params = jax.tree.map(jnp.asarray,
                          convert_clip_vision(tm.state_dict(), num_layers=2))
    got = tower.apply(params, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(got["last_hidden_state"]), ref_h,
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got["pooled"]), ref_p,
                               atol=2e-4, rtol=1e-3)
