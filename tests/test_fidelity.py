"""Quantitative texture/geometry fidelity of the extraction pipeline
(BASELINE.md: "match reference PSNR on baked albedo/roughness/metallic;
bit-comparable geometry"). Without released weights the reference can't
be run here, so fidelity is measured against ground truth the pipeline
itself is supposed to reproduce:

* texture: PSNR between the baked texture.jpg / roughness_metallic.jpg
  and the PrimX FIELD evaluated at the same texel surface points —
  isolates the unwrap -> rasterize -> bake -> quantize -> inpaint -> JPG
  chain;
* geometry: deviation of extracted vertices from the analytic surface.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from topiaxl.models import primx as primx_lib
from topiaxl.models.primx import PrimXParams, local_grid


def _textured_sphere(n=512, radius=0.55, prim_shape=8):
    rng = np.random.default_rng(0)
    v = rng.standard_normal((n, 3)).astype("f")
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pos = (v * radius).astype("f")
    scale = np.full((n, 1), 0.11, "f")
    world = pos[:, None, :] + scale[:, 0][:, None, None] * local_grid(prim_shape)[None]
    sdf = np.linalg.norm(world, axis=2) - radius
    # smooth procedural albedo: rgb = 0.5 + 0.5 * unit position
    rgb = np.clip(0.5 + 0.5 * world.transpose(0, 2, 1)
                  / np.maximum(np.linalg.norm(world, axis=2)[:, None, :], 1e-6),
                  0, 1)
    mat = np.concatenate([np.full((n, 1, prim_shape**3), 0.7),
                          np.full((n, 1, prim_shape**3), 0.3)], 1)
    feat = np.concatenate([sdf[:, None, :], rgb, mat], 1).reshape(n, -1)
    return PrimXParams(jnp.asarray(np.concatenate([scale, pos], 1)),
                       jnp.asarray(feat.astype("f")))


def _psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 99.0 if mse == 0 else 10.0 * np.log10(1.0 / mse)


@pytest.mark.slow
def test_texture_and_geometry_fidelity(tmp_path):
    import cv2

    from topiaxl.extract.rasterize import rasterize_uv_atlas
    from topiaxl.pipelines import infer as P

    params = _textured_sphere()
    tex_size = 256
    glb = P.extract_glb(params, str(tmp_path), mc_resolution=64,
                        decimate=20000, texture_size=tex_size,
                        batch_size=8192, pos_scale=1.0)
    assert os.path.exists(glb)

    # ---- geometry: extracted surface vs the analytic sphere -------------
    from topiaxl.extract.glb import read_glb

    gltf, blob = read_glb(glb)
    prim = gltf["meshes"][0]["primitives"][0]
    acc = gltf["accessors"][prim["attributes"]["POSITION"]]
    view = gltf["bufferViews"][acc["bufferView"]]
    verts = np.frombuffer(blob, np.float32, acc["count"] * 3,
                          view.get("byteOffset", 0)).reshape(-1, 3)
    dev = np.abs(np.linalg.norm(verts, axis=1) - 0.55)
    cell = 2.0 / 63
    assert np.percentile(dev, 99) < cell, np.percentile(dev, 99)

    # ---- texture: baked JPGs vs the field at the same texel points ------
    # rebuild the texel -> 3D map exactly as the pipeline did
    from topiaxl.extract import box_projection_uv_unwrap  # noqa: F401

    uv_acc = gltf["accessors"][prim["attributes"]["TEXCOORD_0"]]
    uv_view = gltf["bufferViews"][uv_acc["bufferView"]]
    uv = np.frombuffer(blob, np.float32, uv_acc["count"] * 2,
                       uv_view.get("byteOffset", 0)).reshape(-1, 2)
    idx_acc = gltf["accessors"][prim["indices"]]
    idx_view = gltf["bufferViews"][idx_acc["bufferView"]]
    faces = np.frombuffer(blob, np.uint32, idx_acc["count"],
                          idx_view.get("byteOffset", 0)).reshape(-1, 3)
    xyz_map, mask = rasterize_uv_atlas(uv[faces], verts[faces],
                                       tex_size, tex_size)

    tex = cv2.imread(str(tmp_path / "texture.jpg"))[..., ::-1] / 255.0
    mr = cv2.imread(str(tmp_path / "roughness_metallic.jpg"))[..., ::-1] / 255.0

    ys, xs = np.nonzero(mask)
    sub = slice(0, len(ys), max(len(ys) // 4096, 1))
    pts = jnp.asarray(xyz_map[ys[sub], xs[sub]], jnp.float32)
    out = primx_lib.query(params, pts, top_k=32, with_fallback=False,
                          outputs=("tex", "mat"))
    psnr_tex = _psnr(tex[ys[sub], xs[sub]], np.asarray(out["tex"]))
    # roughness/metallic packed into G/B of roughness_metallic.jpg
    psnr_mat = _psnr(mr[ys[sub], xs[sub], 1:3], np.asarray(out["mat"]))

    print(f"fidelity: albedo PSNR {psnr_tex:.1f} dB, "
          f"rough/metal PSNR {psnr_mat:.1f} dB, "
          f"geom p99 dev {np.percentile(dev, 99):.4f}")
    # uint8 quantization alone bounds PSNR near ~48 dB; JPG costs a few
    # more. The chain must stay comfortably above perceptual thresholds.
    assert psnr_tex > 30.0, psnr_tex
    assert psnr_mat > 30.0, psnr_mat
