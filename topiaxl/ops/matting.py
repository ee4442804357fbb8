"""Foreground matting for input photos.

The reference mattes with rembg/U^2-Net (inference.py:10, 298, 306-311).
Two paths here:

* ``remove_background_u2net`` — the same neural matting, TPU-native:
  the flax U^2-Net (models/matting_u2net.py) run with converted official
  weights (core.convert.convert_u2net), with rembg's pre/post-processing
  (320^2 ImageNet-normalized input, min-max rescaled saliency alpha).
  Used when weights are available (``load_u2net``).
* ``remove_background`` — classical fallback: GrabCut (GMM graph cut)
  initialized with the image border as definite background. Degenerate
  results (near-empty / near-full mattes) return None so callers can
  fall back further (e.g. near-white threshold for synthetic renders).
"""

from __future__ import annotations

import numpy as np

_U2NET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_U2NET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class U2NetMatting:
    """U^2-Net + params, callable rgb [H, W, 3] uint8 -> alpha uint8."""

    def __init__(self, params, arch: str = "u2net", input_size: int = 320):
        import jax

        from ..models.matting_u2net import U2Net

        self.model = U2Net(arch=arch)
        self.params = params
        self.input_size = input_size
        self._predict = jax.jit(self.model.apply)

    def __call__(self, rgb: np.ndarray) -> np.ndarray:
        import cv2

        h, w = rgb.shape[:2]
        s = self.input_size
        # rembg preprocessing: scale by the image max, ImageNet-normalize
        im = cv2.resize(rgb, (s, s), interpolation=cv2.INTER_LINEAR)
        im = im.astype(np.float32) / max(float(im.max()), 1e-6)
        im = (im - _U2NET_MEAN) / _U2NET_STD
        pred = np.asarray(self._predict(self.params, im[None]))[0, ..., 0]
        # rembg postprocessing: min-max rescale to [0, 1]
        lo, hi = float(pred.min()), float(pred.max())
        pred = (pred - lo) / max(hi - lo, 1e-8)
        alpha = cv2.resize(pred, (w, h), interpolation=cv2.INTER_LINEAR)
        return (alpha * 255).astype(np.uint8)


def load_u2net(path: str, arch: str | None = None) -> "U2NetMatting | None":
    """Build the neural matting from a checkpoint: either a converted
    orbax dir (cli.convert) or a torch .pth (official U^2-Net weights,
    converted on the fly). None when the path doesn't exist."""
    import os

    if not path or not os.path.exists(path):
        return None
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        params = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    else:
        from ..core.convert import convert_u2net, load_torch_checkpoint

        params = convert_u2net(load_torch_checkpoint(path))
    if arch is None:
        # u2netp's stage2 input conv is 64ch wide; full u2net's is 64->32
        mid = np.asarray(
            params["params"]["stage2"]["rebnconv1"]["conv"]["kernel"]
        ).shape[-1]
        arch = "u2netp" if mid == 16 else "u2net"
    return U2NetMatting(params, arch=arch)


def remove_background(
    rgb: np.ndarray,
    iterations: int = 5,
    border_frac: float = 0.04,
    feather: int = 2,
) -> np.ndarray | None:
    """Estimate a foreground alpha for an RGB uint8 image [H, W, 3].

    Returns alpha [H, W] uint8, or None when segmentation degenerates
    (no clear foreground object).
    """
    import cv2

    h, w = rgb.shape[:2]
    if min(h, w) < 16:
        return None
    mask = np.full((h, w), cv2.GC_PR_FGD, np.uint8)
    b = max(2, int(round(min(h, w) * border_frac)))
    mask[:b] = cv2.GC_BGD
    mask[-b:] = cv2.GC_BGD
    mask[:, :b] = cv2.GC_BGD
    mask[:, -b:] = cv2.GC_BGD

    bgd = np.zeros((1, 65), np.float64)
    fgd = np.zeros((1, 65), np.float64)
    bgr = np.ascontiguousarray(rgb[..., ::-1])
    try:
        cv2.grabCut(bgr, mask, None, bgd, fgd, iterations,
                    cv2.GC_INIT_WITH_MASK)
    except cv2.error:
        return None

    fg = ((mask == cv2.GC_FGD) | (mask == cv2.GC_PR_FGD)).astype(np.uint8)
    frac = float(fg.mean())
    if frac < 0.005 or frac > 0.95:
        return None

    # keep the largest connected component (stray blobs are background
    # texture GrabCut got wrong)
    n, labels, stats, _ = cv2.connectedComponentsWithStats(fg, 8)
    if n > 2:
        biggest = 1 + int(np.argmax(stats[1:, cv2.CC_STAT_AREA]))
        fg = (labels == biggest).astype(np.uint8)

    alpha = (fg * 255).astype(np.uint8)
    if feather > 0:
        k = 2 * feather + 1
        alpha = cv2.GaussianBlur(alpha, (k, k), 0)
        # keep the core fully opaque; only the boundary softens
        alpha = np.where(cv2.erode(fg, np.ones((k, k), np.uint8)) > 0,
                         255, alpha).astype(np.uint8)
    return alpha
