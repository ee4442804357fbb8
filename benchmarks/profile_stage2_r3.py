"""Round-3 stage-2 attribution probe: where do the 10.5 s go?

Runs the bench's exact synthetic-asset extract_glb twice (cold/warm) and
prints the tick breakdown, plus isolated measurements of the suspected
costs: PrimX param upload, bake point upload, and the inpaint branches.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from topiaxl.models.primx import PrimXParams, local_grid
from topiaxl.pipelines import infer as P


def synthetic_asset():
    rng = np.random.default_rng(0)
    n = 2048
    v = rng.standard_normal((n, 3)).astype("f")
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pos = (v * 0.55).astype("f")
    scale = np.full((n, 1), 0.07, "f")
    world = (pos[:, None, :]
             + scale[:, 0][:, None, None] * local_grid(8)[None])
    sdf = np.linalg.norm(world, axis=2) - 0.55
    rgb = np.clip(0.5 + 0.5 * world.transpose(0, 2, 1), 0, 1)
    mat = np.concatenate([np.full((n, 1, 512), 0.8),
                          np.full((n, 1, 512), 0.2)], 1)
    feat = np.concatenate([sdf[:, None, :], rgb, mat], 1).reshape(n, -1)
    return np.concatenate([scale, pos], 1), feat.astype("f")


def main():
    srt_np, feat_np = synthetic_asset()

    # --- isolated: param upload cost over the tunnel (25 MB f32) ---
    for trial in range(2):
        t0 = time.perf_counter()
        feat_dev = jax.device_put(jnp.asarray(feat_np))
        feat_dev.block_until_ready()
        print(f"param upload {feat_np.nbytes/1e6:.1f} MB: "
              f"{time.perf_counter()-t0:.3f}s (trial {trial})")

    # --- isolated: bake-scale point upload (12 MB f32) ---
    pts = np.random.rand(1024 * 1024, 3).astype("f")
    for trial in range(2):
        t0 = time.perf_counter()
        d = jax.device_put(jnp.asarray(pts))
        d.block_until_ready()
        print(f"pts upload {pts.nbytes/1e6:.1f} MB: "
              f"{time.perf_counter()-t0:.3f}s (trial {trial})")
    # and download cost of the baked uint8 result (~5 MB)
    u8 = jnp.zeros((1024 * 1024, 5), jnp.uint8)
    u8.block_until_ready()
    t0 = time.perf_counter()
    _ = np.asarray(u8)
    print(f"u8 download {u8.nbytes/1e6:.1f} MB: "
          f"{time.perf_counter()-t0:.3f}s")

    # --- full extract, cold + warm, with breakdown ---
    params = PrimXParams(jnp.asarray(srt_np), jnp.asarray(feat_np))
    jax.block_until_ready(params.feat)
    for tag in ("cold", "warm"):
        tm = {}
        t0 = time.perf_counter()
        P.extract_glb(params, f"/tmp/prof_stage2_{tag}",
                      mc_resolution=256, decimate=100000,
                      texture_size=1024, batch_size=32768, pos_scale=1.0,
                      timings_out=tm)
        total = time.perf_counter() - t0
        ticks = sum(v for k, v in tm.items() if isinstance(v, float))
        print(f"[{tag}] total={total:.2f}s ticks_sum={ticks:.2f}s")
        for k, v in tm.items():
            print(f"    {k}: {v}")

    # --- isolated: inpaint branches at bench scale ---
    from scipy import ndimage

    mask = np.zeros((1024, 1024), bool)
    yy, xx = np.mgrid[:1024, :1024]
    mask[((yy // 64) + (xx // 64)) % 2 == 0] = True  # checker coverage
    feats = np.random.rand(1024, 1024, 6).astype(np.float32)

    import cv2
    t0 = time.perf_counter()
    d_out = cv2.distanceTransform(
        np.where(mask, 0, 255).astype(np.uint8), cv2.DIST_L2, 5)
    region = (d_out <= 32) & ~mask
    d_in = cv2.distanceTransform(
        np.where(mask, 255, 0).astype(np.uint8), cv2.DIST_L2, 5)
    search = mask & (d_in <= 3)
    src = np.where(search, 0, 255).astype(np.uint8)
    _, labels = cv2.distanceTransformWithLabels(
        src, cv2.DIST_L2, 5, labelType=cv2.DIST_LABEL_PIXEL)
    ys2, xs2 = np.nonzero(region)
    zy, zx = np.nonzero(search)
    li = labels[ys2, xs2] - 1
    out = feats.copy()
    out[ys2, xs2] = feats[zy[li], zx[li]]
    print(f"inpaint cv2 branch: {time.perf_counter()-t0:.3f}s")

    t0 = time.perf_counter()
    region = ndimage.binary_dilation(mask, iterations=32) & ~mask
    search = mask.copy()
    interior = ndimage.binary_erosion(search, iterations=3)
    search &= ~interior
    _, (iy, ix) = ndimage.distance_transform_edt(
        ~search, return_indices=True)
    out = feats.copy()
    ys2, xs2 = np.nonzero(region)
    out[ys2, xs2] = feats[iy[ys2, xs2], ix[ys2, xs2]]
    print(f"inpaint scipy branch: {time.perf_counter()-t0:.3f}s")


if __name__ == "__main__":
    main()
