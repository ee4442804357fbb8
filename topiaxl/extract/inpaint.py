"""Texture-seam inpainting by nearest covered texel.

Replaces the reference's dilation-band + sklearn-KDTree KNN fill
(inference.py:200-211) with a single exact Euclidean distance transform
(scipy EDT with feature indices) — same result, no per-point tree walk.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage


def nearest_inpaint(
    feats: np.ndarray,   # [H, W, C]
    mask: np.ndarray,    # [H, W] bool coverage
    pad_width: int = 32,
    search_ring: int = 3,
) -> np.ndarray:
    """Fill a ``pad_width``-pixel dilation band around the coverage mask
    with the value of the nearest covered texel (taken from a thin ring
    just inside the boundary, like the reference's eroded search region).
    """
    if not mask.any():
        return feats
    try:
        # one distance transform each replaces pad_width iterated
        # dilations + search_ring erosions (scipy loops cost ~0.3 s/asset
        # at 1024^2 on the 1-core host; the L2 band differs from the
        # iterated 4/8-connected band only at corner pixels, all of which
        # still read their nearest covered texel)
        import cv2

        d_out = cv2.distanceTransform(
            np.where(mask, 0, 255).astype(np.uint8), cv2.DIST_L2, 5)
        inpaint_region = (d_out <= pad_width) & ~mask
        d_in = cv2.distanceTransform(
            np.where(mask, 255, 0).astype(np.uint8), cv2.DIST_L2, 5)
        search_region = mask & (d_in <= search_ring)
    except Exception:
        inpaint_region = ndimage.binary_dilation(
            mask, iterations=pad_width) & ~mask
        search_region = mask.copy()
        interior = ndimage.binary_erosion(search_region,
                                          iterations=search_ring)
        search_region &= ~interior
    if not search_region.any():
        search_region = mask

    out = feats.copy()
    ys, xs = np.nonzero(inpaint_region)
    try:
        # OpenCV's C++ distance transform with per-zero-pixel labels is
        # ~10x scipy's EDT on the single-core hosts this runs on
        import cv2

        src = np.where(search_region, 0, 255).astype(np.uint8)
        _, labels = cv2.distanceTransformWithLabels(
            src, cv2.DIST_L2, 5, labelType=cv2.DIST_LABEL_PIXEL)
        zy, zx = np.nonzero(search_region)  # raster order == label order
        li = labels[ys, xs] - 1
        out[ys, xs] = feats[zy[li], zx[li]]
    except Exception:
        _, (ind_y, ind_x) = ndimage.distance_transform_edt(
            ~search_region, return_indices=True)
        out[ys, xs] = feats[ind_y[ys, xs], ind_x[ys, xs]]
    return out
