"""Visualization smoke tests (tiny sizes, CPU)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from topiaxl.render.visualize import (
    colored_box_payload,
    primx_to_payload,
    visualize_multiview_primvolume,
    visualize_primvolume,
)


def _tiny_recon(n=8, s=4):
    rng = np.random.default_rng(0)
    srt = np.zeros((n, 4), np.float32)
    srt[:, 0] = 0.3
    srt[:, 1:4] = rng.uniform(-0.4, 0.4, (n, 3))
    feat = rng.uniform(-0.05, 0.05, (n, 6 * s**3)).astype(np.float32)
    return jnp.asarray(np.concatenate([srt, feat], -1))[None]


def test_payload_and_boxes():
    recon = _tiny_recon()
    feat = recon[0, :, 4:]
    p = primx_to_payload(recon[0, :, :4], feat, 4)
    # primx_to_payload(srt, feat, s)
    assert p.shape == (8, 4, 4, 4, 4)
    assert float(p[..., 3].max()) <= 255.0 + 1e-3

    boxes = colored_box_payload(8, 4)
    assert boxes.shape == (8, 4, 4, 4, 4)
    assert float(boxes[..., 3].min()) == 10000.0


@pytest.mark.slow
def test_visualize_files(tmp_path):
    recon = _tiny_recon()
    p1 = str(tmp_path / "recon.jpg")
    visualize_primvolume(p1, recon, 24, 24, prim_shape=4, num_steps=32,
                         max_hits=4)
    assert os.path.getsize(p1) > 0

    p2 = str(tmp_path / "mv.jpg")
    visualize_multiview_primvolume(p2, recon, views=2, height=24, width=24,
                                   prim_shape=4, num_steps=32, max_hits=4)
    assert os.path.getsize(p2) > 0


@pytest.mark.slow
def test_visualize_video_with_materials(tmp_path):
    from topiaxl.render.visualize import visualize_video_primvolume

    recon = _tiny_recon()
    visualize_video_primvolume(str(tmp_path), recon, view_counts=2,
                               height=24, width=24, prim_shape=4,
                               num_steps=32, max_hits=4)
    # rgb + prim + the mat view the reference app lists but never writes
    for stem in ("rgb", "prim", "mat"):
        assert any(f.startswith(stem) for f in os.listdir(tmp_path)), stem
