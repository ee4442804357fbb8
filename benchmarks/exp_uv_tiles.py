"""UV atlas knob sweep toward VERDICT r4 item 7: coverage >= 0.75 AND
charts <= 30 on the bench mesh at unchanged stretch.

Builds the same mesh bench_fidelity uses (textured sphere, mc 128,
decimate 60000), caches verts/faces to /tmp, then sweeps
quality_uv_unwrap knobs (tile_target, merge tolerances) and prints
coverage / charts / stretch per config.

Run: python -m benchmarks.exp_uv_tiles
"""
import os
import sys
import time

import numpy as np

CACHE = "/tmp/uv_bench_mesh.npz"


def get_mesh():
    if os.path.exists(CACHE):
        d = np.load(CACHE)
        return d["verts"], d["faces"]
    import tempfile

    from tests.test_fidelity import _textured_sphere
    from topiaxl.extract.glb import read_glb
    from topiaxl.pipelines import infer as P

    params = _textured_sphere()
    with tempfile.TemporaryDirectory() as td:
        glb = P.extract_glb(params, td, mc_resolution=128, decimate=60000,
                            texture_size=512, batch_size=32768,
                            pos_scale=1.0)
        gltf, blob = read_glb(glb)
        prim = gltf["meshes"][0]["primitives"][0]

        def load(name, dtype, ncomp):
            acc = gltf["accessors"][name]
            view = gltf["bufferViews"][acc["bufferView"]]
            return np.frombuffer(blob, dtype, acc["count"] * ncomp,
                                 view.get("byteOffset", 0)).reshape(-1, ncomp)

        verts = load(prim["attributes"]["POSITION"], np.float32, 3)
        faces = load(prim["indices"], np.uint32, 1).reshape(-1, 3)
    np.savez(CACHE, verts=verts, faces=faces.astype(np.int64))
    return verts, faces.astype(np.int64)


def main():
    from topiaxl.extract.lscm import quality_uv_unwrap
    from topiaxl.extract.meshproc import _weld_vertices
    from topiaxl.extract.uv_unwrap import compute_vertex_normal, uv_metrics

    verts, faces = get_mesh()
    verts, f64 = _weld_vertices(verts.astype(np.float64),
                                faces.astype(np.int64))
    vn = compute_vertex_normal(verts, f64)
    print(f"mesh: {len(verts)} verts, {len(f64)} faces", flush=True)

    sweeps = []
    for tile_target in (33, 28, 24, 20, 16):
        sweeps.append(dict(tile_target=tile_target))
    for mst in (1.6, 2.0):
        sweeps.append(dict(tile_target=24, merge_scale_tol=mst))
        sweeps.append(dict(tile_target=20, merge_scale_tol=mst))
    for fill in (0.6, 0.5):
        sweeps.append(dict(tile_target=24, merge_fill_min=fill))

    for kw in sweeps:
        t0 = time.perf_counter()
        uv, idx = quality_uv_unwrap(verts, vn, f64, **kw)
        m = uv_metrics(verts, f64, uv, idx)
        dt = time.perf_counter() - t0
        print(f"{kw}: coverage={m['coverage']:.3f} charts={m['charts']} "
              f"stretch_l2={m['stretch_l2']:.4f} "
              f"linf={m['stretch_linf']:.3f} ({dt:.1f}s)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
