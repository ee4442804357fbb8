"""End-to-end pipeline tests on tiny configs (the reference's e2e check is
visual inspection, SURVEY.md §4; here: real asserts on a synthetic asset)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topiaxl.diffusion import create_diffusion
from topiaxl.models import DiT, VAE3D
from topiaxl.models.primx import PrimXParams, local_grid
from topiaxl.pipelines import infer


@pytest.mark.slow
def test_generate_primx_shapes():
    """Stage 1 on a tiny model: tokens -> PrimX params with right shapes."""
    n_prims, in_ch, cond_ch = 8, 12, 6  # latent 2^3=8 ch + 4 srt
    dit = DiT(seq_length=n_prims, in_channels=in_ch, condition_channels=cond_ch,
              hidden_size=16, depth=1, num_heads=2, cond_drop_prob=0.1,
              dtype=jnp.float32)
    vae = VAE3D(in_channels=6, latent_channels=1, out_channels=6,
                down_channels=(8, 16), up_channels=(16, 8),
                layers_per_block=1, dtype=jnp.float32)
    diffusion = create_diffusion(
        timestep_respacing="ddim4", noise_schedule="squaredcos_cap_v2",
        parameterization="v", diffusion_steps=100,
    )
    key = jax.random.PRNGKey(0)
    dit_params = dit.init(key, jnp.zeros((1, n_prims, in_ch)),
                          jnp.zeros((1,), jnp.int32),
                          jnp.zeros((1, 3, cond_ch)))
    # tiny vae: latent 4^3? payload here is 4^3 (prim_shape=4), latent 2^3
    vae_params = vae.init(key, jnp.zeros((1, 4, 4, 4, 6)), key)

    y = jax.random.normal(jax.random.PRNGKey(1), (1, 3, cond_ch))
    params = infer.generate_primx(
        dit, vae, diffusion, dit_params, vae_params, y, key,
        latent_mean=np.zeros(in_ch, np.float32),
        latent_std=np.ones(in_ch, np.float32),
        cfg_scale=2.0, prim_shape=4, dim_feat=6,
    )
    assert params.srt.shape == (n_prims, 4)
    assert params.feat.shape == (n_prims, 6 * 4**3)
    assert np.isfinite(np.asarray(params.srt)).all()
    assert np.isfinite(np.asarray(params.feat)).all()


@pytest.mark.slow
def test_generate_primx_batched_and_sharded():
    """B=2 batch path + dp-mesh sharded inference."""
    from topiaxl.parallel import make_mesh

    n_prims, in_ch, cond_ch = 8, 12, 6
    dit = DiT(seq_length=n_prims, in_channels=in_ch, condition_channels=cond_ch,
              hidden_size=16, depth=1, num_heads=2, cond_drop_prob=0.1,
              dtype=jnp.float32)
    vae = VAE3D(in_channels=6, latent_channels=1, out_channels=6,
                down_channels=(8, 16), up_channels=(16, 8),
                layers_per_block=1, dtype=jnp.float32)
    diffusion = create_diffusion(
        timestep_respacing="ddim2", noise_schedule="squaredcos_cap_v2",
        parameterization="v", diffusion_steps=100)
    key = jax.random.PRNGKey(0)
    dit_params = dit.init(key, jnp.zeros((1, n_prims, in_ch)),
                          jnp.zeros((1,), jnp.int32),
                          jnp.zeros((1, 3, cond_ch)))
    vae_params = vae.init(key, jnp.zeros((1, 4, 4, 4, 6)), key)
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 3, cond_ch))
    mean = np.zeros(in_ch, np.float32)
    std = np.ones(in_ch, np.float32)

    out = infer.generate_primx(dit, vae, diffusion, dit_params, vae_params,
                               y, key, mean, std, cfg_scale=1.5,
                               prim_shape=4, dim_feat=6)
    assert isinstance(out, list) and len(out) == 2
    assert out[0].srt.shape == (n_prims, 4)

    mesh = make_mesh({"dp": 2})
    out_sh = infer.generate_primx_sharded(
        dit, vae, diffusion, dit_params, vae_params, y, key, mean, std,
        mesh, cfg_scale=1.5, prim_shape=4, dim_feat=6)
    assert len(out_sh) == 2
    # sharded == unsharded numerics
    np.testing.assert_allclose(np.asarray(out_sh[0].srt),
                               np.asarray(out[0].srt), atol=2e-5)


def _sphere_primx(n_side=4, s=8, radius=0.55):
    """PrimX params that analytically encode a sphere SDF + color."""
    centers = np.linspace(-0.75, 0.75, n_side, dtype=np.float32)
    grid = local_grid(s)  # [s^3, 3] xyz offsets in [-1, 1]
    srt, feats = [], []
    scale = 0.75 / (n_side - 1) * 2.0 * 1.2  # overlapping coverage
    for cz in centers:
        for cy in centers:
            for cx in centers:
                pos = np.array([cx, cy, cz], np.float32)
                srt.append(np.concatenate([[scale], pos]))
                world = pos[None] + scale * grid  # [s^3, 3]
                sdf = np.linalg.norm(world, axis=1) - radius
                rgb = np.stack([
                    0.5 + 0.5 * world[:, 0],
                    0.5 * np.ones(len(world)),
                    0.5 - 0.5 * world[:, 1],
                ], 0).clip(0, 1)
                mat = np.stack([np.full(len(world), 0.8),
                                np.full(len(world), 0.1)], 0)
                feats.append(np.concatenate(
                    [sdf[None], rgb, mat], axis=0).reshape(-1))
    return PrimXParams(
        srt=jnp.asarray(np.stack(srt)), feat=jnp.asarray(np.stack(feats))
    )


@pytest.mark.slow
def test_extract_glb_from_synthetic_sphere(tmp_path):
    params = _sphere_primx()
    glb = infer.extract_glb(
        params, str(tmp_path), mc_resolution=48, decimate=4000,
        texture_size=128, batch_size=4096, prim_shape=8,
        inpaint_pad=4, pos_scale=1.0,
    )
    assert os.path.exists(glb)
    assert os.path.exists(os.path.join(tmp_path, "texture.jpg"))
    assert os.path.exists(os.path.join(tmp_path, "roughness_metallic.jpg"))

    from topiaxl.extract.glb import read_glb

    gltf, bin_blob = read_glb(glb)
    prim = gltf["meshes"][0]["primitives"][0]
    pos_acc = gltf["accessors"][prim["attributes"]["POSITION"]]
    assert pos_acc["count"] > 100
    # sphere radius check from accessor min/max (pos_scale=1)
    assert abs(max(pos_acc["max"]) - 0.55) < 0.1


def test_noise_filter_neutralizes_outliers():
    params = _sphere_primx(n_side=2)
    # add one far-away lonely prim
    srt = np.asarray(params.srt)
    srt = np.concatenate(
        [srt, np.array([[0.05, 3.0, 3.0, 3.0]], np.float32)], axis=0)
    feat = np.concatenate(
        [np.asarray(params.feat), np.zeros((1, params.feat.shape[1]), np.float32)]
    )
    out = infer.noise_filter(PrimXParams(jnp.asarray(srt), jnp.asarray(feat)))
    assert float(out.srt[-1, 1]) > 100.0   # moved far away
    assert float(out.srt[-1, 0]) < 1e-5    # zero scale
    np.testing.assert_allclose(  # healthy prims untouched
        np.asarray(out.srt[:-1]), srt[:-1], atol=1e-6)


def test_bake_cells_matches_per_point_bake():
    """The cell-candidate bake (one lax.top_k over unique 64^3 lattice
    cells, shared by every texel in the cell) must reproduce the exact
    per-point bake: the cell table is a superset of the prims covering
    any point of the cell whenever top_k rows suffice, so on an
    ordinarily-stacked asset the uint8 texel delta stays within the
    same class as the accepted exact-k24-vs-k32 gap (measured 7/255 on
    the bench asset, v5e).

    The asset mirrors the bench one (2048 surface prims, scale 0.07,
    stacking depth ~8-16): on a pathologically deep stack (the 64-prim
    ``_sphere_primx`` fixture, scale 0.6, every prim covering ~half the
    volume) BOTH paths truncate — the cell table by slab margin, the
    exact path by blend weight — and the differently-ranked subsets
    diverge harmlessly (~18/255 measured); that regime never occurs
    after ``noise_filter`` on generated assets."""
    rng = np.random.default_rng(0)
    n = 2048
    d0 = rng.normal(size=(n, 3)).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
    pos = d0 * 0.55
    scale = np.full((n, 1), 0.07, np.float32)
    world = pos[:, None, :] + 0.07 * local_grid(8)[None]
    sdf = np.linalg.norm(world, axis=2) - 0.55
    rgb = np.clip(0.5 + 0.5 * world.transpose(0, 2, 1), 0.0, 1.0)
    mat = np.concatenate([np.full((n, 1, 512), 0.8, np.float32),
                          np.full((n, 1, 512), 0.2, np.float32)], 1)
    feat = np.concatenate([sdf[:, None, :], rgb, mat], 1).reshape(n, -1)
    params = PrimXParams(
        jnp.asarray(np.concatenate([scale, pos], 1).astype(np.float32)),
        jnp.asarray(feat.astype(np.float32)))
    # points scattered in a shell around the surface — where bake texels
    # actually live
    rng = np.random.default_rng(3)
    d = rng.normal(size=(12288, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = d * rng.uniform(0.45, 0.65, size=(12288, 1)).astype(np.float32)
    pts_i = np.round(np.clip(pts, -1.0, 1.0) * 32767.0).astype(np.int16)
    B = 4096
    n_b = len(pts) // B
    batches = jnp.asarray(pts_i.reshape(n_b, B, 3))

    exact = np.asarray(infer._bake_query_u8_batched(
        params, batches, dim_feat=6, prim_shape=8)).reshape(-1, 5)

    cell_res = 64
    cc = np.clip(((pts + 1.0) * 0.5 * cell_res).astype(np.int64),
                 0, cell_res - 1)
    cid = (cc[:, 0] * cell_res + cc[:, 1]) * cell_res + cc[:, 2]
    ucells, inv = np.unique(cid, return_inverse=True)
    u_pad = -(-len(ucells) // 1024) * 1024
    u_p = np.zeros(u_pad, np.int32)
    u_p[:len(ucells)] = ucells
    cells = np.asarray(infer._bake_query_u8_cells(
        params, batches, jnp.asarray(inv.reshape(n_b, B).astype(np.int32)),
        jnp.asarray(u_p), cell_res=cell_res, top_k=16,
        dim_feat=6, prim_shape=8)).reshape(-1, 5)

    delta = np.abs(cells.astype(int) - exact.astype(int))
    assert delta.max() <= 8, delta.max()
    assert delta.mean() < 0.2, delta.mean()


def test_save_load_primx(tmp_path):
    params = _sphere_primx(n_side=2)
    p = os.path.join(tmp_path, "denoised.npz")
    infer.save_primx(p, params)
    loaded = infer.load_primx(p)
    np.testing.assert_array_equal(np.asarray(loaded.srt), np.asarray(params.srt))
    np.testing.assert_array_equal(np.asarray(loaded.feat), np.asarray(params.feat))


def test_serve_assets_pipelined(tmp_path):
    """Multi-asset serving pipeline: same artifacts as serial processing,
    device stage of asset i+1 overlapping host extraction of asset i."""
    n_prims, in_ch, cond_ch = 8, 12, 6
    dit = DiT(seq_length=n_prims, in_channels=in_ch,
              condition_channels=cond_ch, hidden_size=16, depth=1,
              num_heads=2, cond_drop_prob=0.1, dtype=jnp.float32)
    vae = VAE3D(in_channels=6, latent_channels=1, out_channels=6,
                down_channels=(8, 16), up_channels=(16, 8),
                layers_per_block=1, dtype=jnp.float32)
    diffusion = create_diffusion(
        timestep_respacing="ddim3", noise_schedule="squaredcos_cap_v2",
        parameterization="v", diffusion_steps=50)
    key = jax.random.PRNGKey(0)
    dit_params = dit.init(key, jnp.zeros((1, n_prims, in_ch)),
                          jnp.zeros((1,), jnp.int32),
                          jnp.zeros((1, 3, cond_ch)))
    vae_params = vae.init(key, jnp.zeros((1, 4, 4, 4, 6)), key)

    ys = [jax.random.normal(jax.random.PRNGKey(i), (1, 3, cond_ch))
          for i in range(3)]
    dirs = [str(tmp_path / f"a{i}") for i in range(3)]
    mean = np.zeros(in_ch, np.float32)
    std = np.ones(in_ch, np.float32)

    try:
        glbs = infer.serve_assets(
            dit, vae, diffusion, dit_params, vae_params, ys, dirs,
            jax.random.PRNGKey(7), mean, std, cfg_scale=2.0,
            prim_shape=4, dim_feat=6,
            mc_resolution=24, decimate=2000, texture_size=64,
            batch_size=4096)
    except RuntimeError as e:
        # random weights can produce an empty isosurface for some seeds
        pytest.skip(f"degenerate random asset: {e}")

    assert len(glbs) == 3
    for g in glbs:
        assert os.path.exists(g)

    # determinism: the pipelined path equals a serial re-run (same keys)
    key2 = jax.random.PRNGKey(7)
    for i, (y, d) in enumerate(zip(ys, dirs)):
        key2, gen_key = jax.random.split(key2)
        p = infer.generate_primx(
            dit, vae, diffusion, dit_params, vae_params, y, gen_key,
            mean, std, cfg_scale=2.0, prim_shape=4, dim_feat=6)
        g2 = infer.extract_glb(
            p, str(tmp_path / f"s{i}"), mc_resolution=24, decimate=2000,
            texture_size=64, batch_size=4096, prim_shape=4, dim_feat=6)
        assert os.path.getsize(g2) == os.path.getsize(glbs[i])


def test_serve_assets_dpm_sampler(tmp_path):
    """serve_assets honors sampler='dpm' (the DPM-Solver++ path runs
    through the pipelined serving loop and produces finite PrimX)."""
    n_prims, in_ch, cond_ch = 8, 12, 6
    dit = DiT(seq_length=n_prims, in_channels=in_ch,
              condition_channels=cond_ch, hidden_size=16, depth=1,
              num_heads=2, cond_drop_prob=0.1, dtype=jnp.float32)
    vae = VAE3D(in_channels=6, latent_channels=1, out_channels=6,
                down_channels=(8, 16), up_channels=(16, 8),
                layers_per_block=1, dtype=jnp.float32)
    diffusion = create_diffusion(
        timestep_respacing="ddim3", noise_schedule="squaredcos_cap_v2",
        parameterization="v", diffusion_steps=50)
    key = jax.random.PRNGKey(0)
    dit_params = dit.init(key, jnp.zeros((1, n_prims, in_ch)),
                          jnp.zeros((1,), jnp.int32),
                          jnp.zeros((1, 3, cond_ch)))
    vae_params = vae.init(key, jnp.zeros((1, 4, 4, 4, 6)), key)
    y = jax.random.normal(jax.random.PRNGKey(1), (1, 3, cond_ch))

    out = infer.sample_tokens(dit, diffusion, dit_params, y,
                              jax.random.PRNGKey(7), 2.0, sampler="dpm")
    assert bool(jnp.all(jnp.isfinite(out.sample)))
    # unknown samplers are rejected loudly
    with pytest.raises(ValueError, match="sampler="):
        infer.sample_tokens(dit, diffusion, dit_params, y,
                            jax.random.PRNGKey(7), 2.0, sampler="ddpm")
    try:
        glbs = infer.serve_assets(
            dit, vae, diffusion, dit_params, vae_params, [y],
            [str(tmp_path / "a0")], jax.random.PRNGKey(7),
            np.zeros(in_ch, np.float32), np.ones(in_ch, np.float32),
            cfg_scale=2.0, prim_shape=4, dim_feat=6, sampler="dpm",
            mc_resolution=24, decimate=2000, texture_size=64,
            batch_size=4096)
    except RuntimeError as e:
        pytest.skip(f"degenerate random asset: {e}")
    assert os.path.exists(glbs[0])


def test_serve_assets_stage1_batched(tmp_path):
    """stage1_batch=2 groups assets through ONE batched DDIM chain per
    pair: all GLBs written, and each batched asset bit-matches the same
    asset generated directly at the group's batch shape (the batch axis
    is independent per element)."""
    n_prims, in_ch, cond_ch = 8, 12, 6
    dit = DiT(seq_length=n_prims, in_channels=in_ch,
              condition_channels=cond_ch, hidden_size=16, depth=1,
              num_heads=2, cond_drop_prob=0.1, dtype=jnp.float32)
    vae = VAE3D(in_channels=6, latent_channels=1, out_channels=6,
                down_channels=(8, 16), up_channels=(16, 8),
                layers_per_block=1, dtype=jnp.float32)
    diffusion = create_diffusion(
        timestep_respacing="ddim3", noise_schedule="squaredcos_cap_v2",
        parameterization="v", diffusion_steps=50)
    key = jax.random.PRNGKey(0)
    dit_params = dit.init(key, jnp.zeros((1, n_prims, in_ch)),
                          jnp.zeros((1,), jnp.int32),
                          jnp.zeros((1, 3, cond_ch)))
    vae_params = vae.init(key, jnp.zeros((1, 4, 4, 4, 6)), key)

    ys = [jax.random.normal(jax.random.PRNGKey(i), (1, 3, cond_ch))
          for i in range(3)]
    dirs = [str(tmp_path / f"b{i}") for i in range(3)]
    mean = np.zeros(in_ch, np.float32)
    std = np.ones(in_ch, np.float32)

    try:
        glbs = infer.serve_assets(
            dit, vae, diffusion, dit_params, vae_params, ys, dirs,
            jax.random.PRNGKey(7), mean, std, cfg_scale=2.0,
            prim_shape=4, dim_feat=6, stage1_batch=2,
            mc_resolution=24, decimate=2000, texture_size=64,
            batch_size=4096)
    except RuntimeError as e:
        pytest.skip(f"degenerate random asset: {e}")

    assert len(glbs) == 3
    for g in glbs:
        assert os.path.exists(g)

    # parity with a direct batched call using the same key schedule:
    # group 0 = assets {0,1} at batch 2, group 1 = asset {2} at batch 1
    key2 = jax.random.PRNGKey(7)
    outs = []
    for group in (ys[0:2], ys[2:3]):
        key2, gen_key = jax.random.split(key2)
        p = infer.generate_primx(
            dit, vae, diffusion, dit_params, vae_params,
            jnp.concatenate(group, axis=0), gen_key,
            mean, std, cfg_scale=2.0, prim_shape=4, dim_feat=6)
        outs.extend(p if isinstance(p, list) else [p])
    for i, p in enumerate(outs):
        g2 = infer.extract_glb(
            p, str(tmp_path / f"sb{i}"), mc_resolution=24, decimate=2000,
            texture_size=64, batch_size=4096, prim_shape=4, dim_feat=6)
        assert os.path.getsize(g2) == os.path.getsize(glbs[i])
