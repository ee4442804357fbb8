"""Cross-implementation parity against the ACTUAL reference code
(VERDICT r1 item 1).

Unlike tests/test_model_parity.py (which reconstructs the reference
architecture from its spec), these tests import and run
/root/reference's own torch modules on CPU — GaussianDiffusion +
SpacedDiffusion DDIM (models/diffusion/gaussian_diffusion.py:651-698),
DiT.forward_with_cfg (models/dit_crossattn.py:204-213), VAE
decode/encode (models/vae3d_dib.py:431-453), PrimSDF.forward
(models/primsdf.py:52-102) — sharing weights via topiaxl.core.convert,
and assert topiaxl's full chain matches. If the SURVEY spec was misread
anywhere, these fail where spec-reconstructed tests could not.

The committed fixture tests/goldens/reference_chain_v1.npz pins the
reference chain's outputs; test_fixture_matches_live_reference guards
the fixture against rot, the rest compare topiaxl against it.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import reference_runtime as rr
from topiaxl.core import convert
from topiaxl.diffusion import create_diffusion, gaussian
from topiaxl.models import DiT, VAE3D
from topiaxl.models import primx as primx_mod
from topiaxl.pipelines.infer import decode_primx, denormalize_tokens

FIXTURE = os.path.join(os.path.dirname(__file__), "goldens",
                       "reference_chain_v1.npz")


@pytest.fixture(scope="module")
def ref():
    return rr.load()


@pytest.fixture(scope="module")
def fx():
    return np.load(FIXTURE)


def _state_dict(fx, which):
    import torch

    pre = f"sd.{which}."
    return {k[len(pre):]: torch.from_numpy(fx[k])
            for k in fx.files if k.startswith(pre)}


def _reference_models_from_fixture(ref, fx):
    dit, vae = rr.build_reference_models(ref, seed=0)
    dit.load_state_dict(_state_dict(fx, "dit"))
    vae.load_state_dict(_state_dict(fx, "vae"))
    return dit, vae


def _topiaxl_dit(fx):
    model = DiT(
        seq_length=rr.TINY["num_prims"], in_channels=rr.TINY["in_channels"],
        condition_channels=rr.TINY["cond_channels"],
        hidden_size=rr.TINY["hidden"], depth=rr.TINY["depth"],
        num_heads=rr.TINY["heads"], dtype=jnp.float32,
    )
    params = convert.convert_dit(_state_dict(fx, "dit"),
                                 depth=rr.TINY["depth"])
    params = jax.tree.map(jnp.asarray, params)
    return model, params


def _topiaxl_vae(fx):
    model = VAE3D(down_channels=(32, 64), up_channels=(64, 32),
                  dtype=jnp.float32)
    params = convert.convert_vae(_state_dict(fx, "vae"),
                                 down_channels=(32, 64),
                                 up_channels=(64, 32))
    params = jax.tree.map(jnp.asarray, params)
    return model, params


# ---------------------------------------------------------------------------
# fixture freshness
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_fixture_matches_live_reference(ref, fx):
    """Rerunning the reference's own code must reproduce the committed
    fixture exactly — guards fixture rot and torch-version drift."""
    dit, vae = _reference_models_from_fixture(ref, fx)
    out = rr.run_reference_chain(ref, dit, vae, fx["noise"], fx["y"],
                                 fx["latent_mean"], fx["latent_std"])
    for k, got in out.items():
        np.testing.assert_allclose(
            got, fx[f"out.{k}"], atol=1e-6, rtol=1e-6,
            err_msg=f"reference chain output {k} drifted vs fixture")


# ---------------------------------------------------------------------------
# unit parity (localize failures before the whole-chain assert)
# ---------------------------------------------------------------------------

def test_dit_forward_matches_reference(ref, fx):
    import torch

    dit_t, _ = _reference_models_from_fixture(ref, fx)
    model, params = _topiaxl_dit(fx)

    rng = np.random.default_rng(1)
    x = rng.standard_normal(
        (2, rr.TINY["num_prims"], rr.TINY["in_channels"])).astype(np.float32)
    t = np.array([3, 977], np.int64)
    y = rng.standard_normal(
        (2, rr.TINY["cond_tokens"], rr.TINY["cond_channels"])
    ).astype(np.float32)

    with torch.no_grad():
        ref_out = dit_t(torch.from_numpy(x), torch.from_numpy(t),
                        torch.from_numpy(y)).numpy()
        ref_cfg = dit_t.forward_with_cfg(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(y),
            cfg_scale=6.0).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(x),
                                 jnp.asarray(t), jnp.asarray(y)))
    got_cfg = np.asarray(model.apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(y), 6.0,
        method=DiT.forward_with_cfg))
    np.testing.assert_allclose(got, ref_out, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(got_cfg, ref_cfg, atol=2e-4, rtol=1e-3)


def test_vae_matches_reference(ref, fx):
    import torch

    _, vae_t = _reference_models_from_fixture(ref, fx)
    model, params = _topiaxl_vae(fx)

    rng = np.random.default_rng(2)
    z = rng.standard_normal((8, 1, 4, 4, 4)).astype(np.float32)
    x = rng.standard_normal((8, 6, 8, 8, 8)).astype(np.float32)

    with torch.no_grad():
        dec_ref = vae_t.decode(torch.from_numpy(z)).numpy()  # [B, 6, 8,8,8]
        post = vae_t.encode(torch.from_numpy(x))
        enc_mean_ref = post.mean.numpy()                     # [B, 1, 4,4,4]
        enc_logvar_ref = post.logvar.numpy()

    # NCDHW -> NDHWC for topiaxl, back for the compare
    dec = model.apply(params, jnp.asarray(z.transpose(0, 2, 3, 4, 1)),
                      method=VAE3D.decode)
    dec = np.asarray(dec).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(dec, dec_ref, atol=5e-5, rtol=1e-4)

    posterior = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                            method=VAE3D.encode)
    enc_mean = np.asarray(posterior.mean).transpose(0, 4, 1, 2, 3)
    enc_logvar = np.asarray(posterior.logvar).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(enc_mean, enc_mean_ref, atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(enc_logvar, enc_logvar_ref,
                               atol=5e-5, rtol=1e-4)


def test_primsdf_query_matches_reference(ref):
    """Field query vs the reference's PrimSDF.forward (dynamic
    gather/index_add_ there, dense top-K here), covered + uncovered +
    overlap cases on random parameters."""
    import torch

    rng = np.random.default_rng(3)
    N, S, C = 24, 8, 6
    srt = np.concatenate([
        rng.uniform(0.08, 0.35, (N, 1)),          # scale
        rng.uniform(-0.6, 0.6, (N, 3)),           # pos
    ], axis=1).astype(np.float32)
    feat = (rng.standard_normal((N, C * S**3)) * 0.3).astype(np.float32)

    prim = ref.primsdf.PrimSDF(num_prims=N, dim_feat=C, prim_shape=S)
    with torch.no_grad():
        prim.srt_param.copy_(torch.from_numpy(srt))
        prim.feat_param.copy_(torch.from_numpy(feat))
    prim.eval()
    pts = rr.grid_points(13)
    with torch.no_grad():
        preds = prim(torch.from_numpy(pts))

    params = primx_mod.PrimXParams(srt=jnp.asarray(srt),
                                   feat=jnp.asarray(feat))
    got = primx_mod.query(params, jnp.asarray(pts), dim_feat=C,
                          prim_shape=S, top_k=N)
    np.testing.assert_allclose(np.asarray(got["sdf"]),
                               preds["sdf"].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["tex"]),
                               preds["tex"].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["mat"]),
                               preds["mat"].numpy(), atol=1e-5)


@pytest.mark.slow
def test_baked_texture_matches_reference_field(ref, tmp_path):
    """Extraction-chain cross-impl parity, the bake half (VERDICT r2
    missing #1 / item 4): extract a textured GLB with topiaxl from a
    synthetic asset, then query the REFERENCE's own PrimSDF
    (/root/reference/models/primsdf.py:52-102, torch CPU) at the baked
    texel 3D positions and assert albedo and rough/metal PSNR
    cross-implementation — previously the ~49 dB fidelity number was
    topiaxl vs topiaxl's own field."""
    import cv2
    import torch

    from test_fidelity import _psnr, _textured_sphere
    from topiaxl.extract.glb import read_glb
    from topiaxl.extract.rasterize import rasterize_uv_atlas
    from topiaxl.pipelines import infer as P

    params = _textured_sphere()
    tex_size = 256
    glb = P.extract_glb(params, str(tmp_path), mc_resolution=96,
                        decimate=40000, texture_size=tex_size,
                        batch_size=16384, pos_scale=1.0)
    gltf, blob = read_glb(glb)
    prim_m = gltf["meshes"][0]["primitives"][0]

    def load(name, dtype, ncomp):
        acc = gltf["accessors"][name]
        view = gltf["bufferViews"][acc["bufferView"]]
        return np.frombuffer(blob, dtype, acc["count"] * ncomp,
                             view.get("byteOffset", 0)).reshape(-1, ncomp)

    verts = load(prim_m["attributes"]["POSITION"], np.float32, 3)
    uv = load(prim_m["attributes"]["TEXCOORD_0"], np.float32, 2)
    faces = load(prim_m["indices"], np.uint32, 1).reshape(-1, 3)
    xyz_map, mask = rasterize_uv_atlas(uv[faces], verts[faces],
                                       tex_size, tex_size)
    tex = cv2.imread(os.path.join(str(tmp_path),
                                  "texture.jpg"))[..., ::-1] / 255.0
    mr = cv2.imread(os.path.join(str(tmp_path),
                                 "roughness_metallic.jpg")) / 255.0

    ys, xs = np.nonzero(mask)
    sub = slice(0, len(ys), max(len(ys) // 4096, 1))
    pts = np.ascontiguousarray(xyz_map[ys[sub], xs[sub]], np.float32)

    prim = ref.primsdf.PrimSDF(num_prims=params.srt.shape[0],
                               dim_feat=6, prim_shape=8)
    with torch.no_grad():
        prim.srt_param.copy_(torch.from_numpy(np.asarray(params.srt)))
        prim.feat_param.copy_(torch.from_numpy(np.asarray(params.feat)))
    prim.eval()
    with torch.no_grad():
        preds = prim(torch.from_numpy(pts))

    albedo_psnr = _psnr(tex[ys[sub], xs[sub]], preds["tex"].numpy())
    # cv2.imread returns the file's BGR as-is; the write path flips
    # [0, rough, metal] to BGR, so ch0=metal, ch1=rough, ch2=0
    mat_baked = np.stack([mr[ys[sub], xs[sub], 1],
                          mr[ys[sub], xs[sub], 0]], axis=1)
    mat_psnr = _psnr(mat_baked, preds["mat"].numpy())
    assert albedo_psnr >= 45.0, albedo_psnr
    assert mat_psnr >= 40.0, mat_psnr


# ---------------------------------------------------------------------------
# whole chain
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_full_chain_matches_reference_fixture(fx):
    """topiaxl DDIM(cfg) -> denorm -> VAE decode -> field query must
    match the reference chain's committed outputs end to end."""
    model, params = _topiaxl_dit(fx)
    vae, vae_params = _topiaxl_vae(fx)
    diffusion = create_diffusion(
        timestep_respacing=rr.TINY["ddim"],
        noise_schedule="squaredcos_cap_v2", parameterization="v",
        learn_sigma=True)

    noise = jnp.asarray(fx["noise"])
    y = jnp.asarray(fx["y"])
    null = params["params"]["null_cond_embedding"]
    y_pair = jnp.concatenate(
        [y, jnp.broadcast_to(null[None, None, :], y.shape)], axis=0)
    kvs = model.apply(params, y_pair, method=DiT.precompute_kv)

    def model_fn(x, t):
        return model.apply(params, x, t, kvs, rr.TINY["cfg"],
                           method=DiT.forward_with_cfg_kv)

    out = gaussian.ddim_sample_loop(diffusion, model_fn, noise,
                                    jax.random.PRNGKey(0),
                                    clip_denoised=False)
    tokens = np.asarray(out.sample)
    np.testing.assert_allclose(tokens, fx["out.tokens"],
                               atol=5e-5, rtol=1e-3,
                               err_msg="DDIM chain tokens diverge")

    recon = denormalize_tokens(jnp.asarray(tokens),
                               jnp.asarray(fx["latent_mean"]),
                               jnp.asarray(fx["latent_std"]),
                               rr.TINY["latent_nf"])
    srt, feat = decode_primx(vae, vae_params, recon,
                             num_prims=rr.TINY["num_prims"])
    np.testing.assert_allclose(np.asarray(srt), fx["out.srt"], atol=5e-5,
                               err_msg="srt after decode diverges")
    np.testing.assert_allclose(np.asarray(feat), fx["out.feat"], atol=2e-4,
                               err_msg="decoded payload diverges")

    pparams = primx_mod.PrimXParams(srt=jnp.asarray(srt[0]),
                                    feat=jnp.asarray(feat[0]))
    pts = jnp.asarray(rr.grid_points(rr.TINY["grid_res"]))
    got = primx_mod.query(pparams, pts, top_k=rr.TINY["num_prims"])
    np.testing.assert_allclose(np.asarray(got["sdf"]), fx["out.sdf"],
                               atol=5e-4, err_msg="SDF grid diverges")
    np.testing.assert_allclose(np.asarray(got["tex"]), fx["out.tex"],
                               atol=5e-4, err_msg="texture diverges")
    np.testing.assert_allclose(np.asarray(got["mat"]), fx["out.mat"],
                               atol=5e-4, err_msg="material diverges")


# ---------------------------------------------------------------------------
# DINOv2 conditioner vs the reference's vendored ViT (VERDICT r3 missing #1)
# ---------------------------------------------------------------------------

def _randomize_vit(model, seed: int = 0):
    """Non-degenerate random weights: N(0, 0.02) everywhere except
    norm/LayerScale gains at 1 + N(0, 0.02) — all-0.02 LN gains would
    shrink the stream ~50x per block and make 12-block parity vacuous
    (everything denormal)."""
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            r = torch.randn(p.shape, generator=g) * 0.02
            if name.endswith(".gamma") or (
                    "norm" in name and name.endswith(".weight")):
                p.copy_(1.0 + r)
            else:
                p.copy_(r)


@pytest.fixture(scope="module")
def vendored_vit(ref):
    """The reference's OWN DinoVisionTransformer (vit_base/14, 4 register
    tokens, 518^2 — the exact dinov2_vitb14_reg kwargs incl.
    interpolate_antialias=True / offset=0.0, hub/backbones.py:123-135,
    pretrained=False), randomized, plus its state_dict converted to flax."""
    import torch

    from models.conditioner.dinov2.models import (  # noqa: E402
        vision_transformer as vits,
    )

    model = vits.vit_base(
        img_size=518, patch_size=14, init_values=1.0, ffn_layer="mlp",
        block_chunks=0, num_register_tokens=4,
        interpolate_antialias=True, interpolate_offset=0.0)
    model.eval()
    _randomize_vit(model)
    sd = {k: v for k, v in model.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert.convert_dinov2(sd, depth=12))
    return model, params


@pytest.mark.slow
def test_dinov2_tokens_match_vendored_reference(vendored_vit):
    """Token-level parity of the flax DinoViT against the reference's
    vendored DinoVisionTransformer.forward_features
    (models/conditioner/dinov2/models/vision_transformer.py:259-281) at
    the flagship 518^2 (no pos-embed interpolation: 37^2 == 1369
    patches) AND at 224^2, which exercises the bicubic pos-embed
    interpolation with the _reg hub variants' scale_factor=grid/sqrt(N),
    antialias=True semantics (vision_transformer.py:187-215,
    hub/backbones.py:132-133)."""
    import torch

    from topiaxl.models.conditioner.dinov2 import DinoViT, dinov2_config

    model, params = vendored_vit
    vit = DinoViT(dtype=jnp.float32, **dinov2_config("dinov2_vitb14_reg"))

    rng = np.random.default_rng(0)
    for size, atol in ((518, 2e-4), (224, 2e-4)):
        img = rng.standard_normal((1, size, size, 3)).astype(np.float32)
        with torch.no_grad():
            out_t = model.forward_features(
                torch.from_numpy(img.transpose(0, 3, 1, 2)))
        out_j = vit.apply(params, jnp.asarray(img))
        for key in ("x_norm_clstoken", "x_norm_regtokens",
                    "x_norm_patchtokens"):
            a = np.asarray(out_j[key], np.float32)
            b = out_t[key].numpy()
            np.testing.assert_allclose(
                a, b, atol=atol, rtol=1e-3,
                err_msg=f"{key} diverges at {size}^2")


@pytest.mark.slow
def test_dinov2_wrapper_matches_reference_chain(vendored_vit):
    """Full conditioner parity for the flagship path: the repo's
    DinoV2Wrapper (uint8 image -> /255 -> resize -> CLIP-normalize ->
    ViT -> cat(cls, patches), image_dinov2.py:44-61) against the same
    chain run through the reference's vendored ViT. At 518^2 input the
    torchvision Resize is the identity (scale 1), so the comparison
    isolates the normalize + ViT + token-cat contract exactly."""
    import torch

    from topiaxl.models.conditioner.image import DinoV2Wrapper

    model, params = vendored_vit
    wrapper = DinoV2Wrapper(model_name="dinov2_vitb14_reg", image_size=518,
                            params=params, dtype=jnp.float32)

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (1, 518, 518, 3)).astype(np.float32)
    tokens_j = np.asarray(wrapper(jnp.asarray(img)), np.float32)

    mean = torch.tensor([0.48145466, 0.4578275, 0.40821073])
    std = torch.tensor([0.26862954, 0.26130258, 0.27577711])
    x = torch.from_numpy(img.transpose(0, 3, 1, 2)) / 255.0
    x = (x - mean[None, :, None, None]) / std[None, :, None, None]
    with torch.no_grad():
        out_t = model.forward_features(x)
    tokens_t = torch.cat(
        [out_t["x_norm_clstoken"].unsqueeze(1),
         out_t["x_norm_patchtokens"]], dim=1).numpy()

    assert tokens_j.shape == (1, 1370, 768)
    np.testing.assert_allclose(tokens_j, tokens_t, atol=3e-4, rtol=1e-3)
