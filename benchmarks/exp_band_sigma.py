"""band_sigma sweep for sdf_grid (VERDICT r4: cut the 1.6 s sdf_grid).

Measures refine time and isosurface deviation vs the sigma=3.0 champion
on the bench sphere at the e2e settings (res 256, coarse 64).

Run on TPU: python -m benchmarks.exp_band_sigma
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from tests.test_fidelity import _textured_sphere
    from topiaxl.extract.isosurface import extract_isosurface
    from topiaxl.pipelines import infer

    params = _textured_sphere()
    ref_grid = None
    ref_v = None
    for sigma in (3.0, 2.5, 2.0, 1.5, 1.2):
        timings = {}
        # warm
        g = infer.sdf_grid(params, 256, coarse=64, band_sigma=sigma,
                           timings=timings)
        t0 = time.perf_counter()
        g = infer.sdf_grid(params, 256, coarse=64, band_sigma=sigma,
                           timings=timings)
        dt = time.perf_counter() - t0
        v, f = extract_isosurface(g)
        if ref_v is None:
            ref_grid, ref_v = g, v
            dev = 0.0
        else:
            # symmetric nearest-vertex deviation, subsampled
            def one(a, b):
                d = np.linalg.norm(a[::11, None, :] - b[None, ::3, :],
                                   axis=-1)
                return float(d.min(1).max())

            dev = max(one(v, ref_v), one(ref_v, v))
        print(f"sigma={sigma:4.1f}: total={dt:6.3f}s "
              f"refine={timings.get('refine_query', 0):6.3f}s "
              f"cells={timings.get('band_cells', 0):6d} verts={len(v)} "
              f"dev_vs_3.0={dev:.5f}")


if __name__ == "__main__":
    main()
