"""U^2-Net matting parity (VERDICT r1 item 6).

Same methodology as tests/test_model_parity.py: the torch model below is
reconstructed from the published U^2-Net architecture (the network
rembg's default session runs — reference inference.py:298-311) with the
official state_dict naming (stage*.rebnconv*.conv_s1/bn_s1, side1..6,
outconv), randomly initialized INCLUDING BatchNorm running stats, then
converted with core.convert.convert_u2net (BN folded) and compared to
the flax model full-forward.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from topiaxl.core.convert import convert_u2net
from topiaxl.models.matting_u2net import CONFIGS, U2Net

torch.manual_seed(0)


class TREBNCONV(tnn.Module):
    def __init__(self, in_ch, out_ch, dirate=1):
        super().__init__()
        self.conv_s1 = tnn.Conv2d(in_ch, out_ch, 3, padding=dirate,
                                  dilation=dirate)
        self.bn_s1 = tnn.BatchNorm2d(out_ch)

    def forward(self, x):
        return tF.relu(self.bn_s1(self.conv_s1(x)))


def _up(src, tar):
    return tF.interpolate(src, size=tar.shape[2:], mode="bilinear")


class TRSU(tnn.Module):
    def __init__(self, height, in_ch, mid_ch, out_ch):
        super().__init__()
        L = self.L = height
        self.rebnconvin = TREBNCONV(in_ch, out_ch)
        self.rebnconv1 = TREBNCONV(out_ch, mid_ch)
        for i in range(2, L):
            setattr(self, f"rebnconv{i}", TREBNCONV(mid_ch, mid_ch))
        setattr(self, f"rebnconv{L}", TREBNCONV(mid_ch, mid_ch, dirate=2))
        setattr(self, f"rebnconv{L - 1}d", TREBNCONV(2 * mid_ch, mid_ch))
        for i in range(L - 2, 1, -1):
            setattr(self, f"rebnconv{i}d", TREBNCONV(2 * mid_ch, mid_ch))
        self.rebnconv1d = TREBNCONV(2 * mid_ch, out_ch)
        self.pool = tnn.MaxPool2d(2, stride=2, ceil_mode=True)

    def forward(self, x):
        L = self.L
        hxin = self.rebnconvin(x)
        hs = [self.rebnconv1(hxin)]
        h = hs[0]
        for i in range(2, L):
            h = getattr(self, f"rebnconv{i}")(self.pool(h))
            hs.append(h)
        top = getattr(self, f"rebnconv{L}")(h)
        d = getattr(self, f"rebnconv{L - 1}d")(torch.cat([top, hs[-1]], 1))
        for i in range(L - 2, 0, -1):
            d = getattr(self, f"rebnconv{i}d")(
                torch.cat([_up(d, hs[i - 1]), hs[i - 1]], 1))
        return d + hxin


class TRSU4F(tnn.Module):
    def __init__(self, in_ch, mid_ch, out_ch):
        super().__init__()
        self.rebnconvin = TREBNCONV(in_ch, out_ch)
        self.rebnconv1 = TREBNCONV(out_ch, mid_ch, 1)
        self.rebnconv2 = TREBNCONV(mid_ch, mid_ch, 2)
        self.rebnconv3 = TREBNCONV(mid_ch, mid_ch, 4)
        self.rebnconv4 = TREBNCONV(mid_ch, mid_ch, 8)
        self.rebnconv3d = TREBNCONV(2 * mid_ch, mid_ch, 4)
        self.rebnconv2d = TREBNCONV(2 * mid_ch, mid_ch, 2)
        self.rebnconv1d = TREBNCONV(2 * mid_ch, out_ch, 1)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        h1 = self.rebnconv1(hxin)
        h2 = self.rebnconv2(h1)
        h3 = self.rebnconv3(h2)
        h4 = self.rebnconv4(h3)
        d3 = self.rebnconv3d(torch.cat([h4, h3], 1))
        d2 = self.rebnconv2d(torch.cat([d3, h2], 1))
        d1 = self.rebnconv1d(torch.cat([d2, h1], 1))
        return d1 + hxin


class TU2NET(tnn.Module):
    def __init__(self, arch):
        super().__init__()
        cfg = CONFIGS[arch]

        def stage(spec):
            L, cin, mid, cout = spec
            return TRSU4F(cin, mid, cout) if L == 0 else TRSU(L, cin, mid,
                                                              cout)

        for i, spec in enumerate(cfg["enc"]):
            setattr(self, f"stage{i + 1}", stage(spec))
        for i, spec in enumerate(cfg["dec"]):
            setattr(self, f"stage{5 - i}d", stage(spec))
        for i, ch in enumerate(cfg["side_ch"]):
            setattr(self, f"side{i + 1}", tnn.Conv2d(ch, 1, 3, padding=1))
        self.outconv = tnn.Conv2d(6, 1, 1)
        self.pool = tnn.MaxPool2d(2, stride=2, ceil_mode=True)

    def forward(self, x):
        hx1 = self.stage1(x)
        hx2 = self.stage2(self.pool(hx1))
        hx3 = self.stage3(self.pool(hx2))
        hx4 = self.stage4(self.pool(hx3))
        hx5 = self.stage5(self.pool(hx4))
        hx6 = self.stage6(self.pool(hx5))
        hx5d = self.stage5d(torch.cat([_up(hx6, hx5), hx5], 1))
        hx4d = self.stage4d(torch.cat([_up(hx5d, hx4), hx4], 1))
        hx3d = self.stage3d(torch.cat([_up(hx4d, hx3), hx3], 1))
        hx2d = self.stage2d(torch.cat([_up(hx3d, hx2), hx2], 1))
        hx1d = self.stage1d(torch.cat([_up(hx2d, hx1), hx1], 1))
        d1 = self.side1(hx1d)
        d2 = _up(self.side2(hx2d), d1)
        d3 = _up(self.side3(hx3d), d1)
        d4 = _up(self.side4(hx4d), d1)
        d5 = _up(self.side5(hx5d), d1)
        d6 = _up(self.side6(hx6), d1)
        d0 = self.outconv(torch.cat([d1, d2, d3, d4, d5, d6], 1))
        return torch.sigmoid(d0)


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)
    model.eval()
    return model


@pytest.mark.parametrize("arch,size", [("u2netp", 64), ("u2netp", 96)])
def test_u2net_matches_torch_reconstruction(arch, size):
    tm = _randomize(TU2NET(arch), seed=1)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()  # [1, 1, H, W]

    model = U2Net(arch=arch)
    params = convert_u2net(tm.state_dict())
    params = jax.tree.map(jnp.asarray, params)
    got = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.slow
def test_u2net_full_arch_matches_torch_reconstruction():
    tm = _randomize(TU2NET("u2net"), seed=3)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    model = U2Net(arch="u2net")
    params = jax.tree.map(jnp.asarray, convert_u2net(tm.state_dict()))
    got = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_u2net_matting_wrapper_and_knob(tmp_path):
    """ops.matting.U2NetMatting mechanics + the prepare_image 'u2net'
    knob: torch .pth ingest via load_u2net, alpha shape/range, loud
    failure when the knob is set without weights."""
    import cv2

    from topiaxl.cli.infer import prepare_image
    from topiaxl.ops.matting import load_u2net

    tm = _randomize(TU2NET("u2netp"), seed=7)
    torch.save(tm.state_dict(), tmp_path / "u2netp.pth")
    matter = load_u2net(str(tmp_path / "u2netp.pth"))
    assert matter is not None and matter.model.arch == "u2netp"
    assert load_u2net(str(tmp_path / "missing.pth")) is None

    rng = np.random.default_rng(8)
    rgb = rng.integers(0, 255, (80, 120, 3), dtype=np.uint8)
    alpha = matter(rgb)
    assert alpha.shape == (80, 120) and alpha.dtype == np.uint8
    # min-max rescaled (resize back to the source size softens extremes)
    assert alpha.min() < 16 and alpha.max() > 240

    # knob wiring: a matter whose output keeps only the center square
    img = np.full((64, 64, 3), 200, np.uint8)
    img[16:48, 16:48] = (255, 0, 0)
    path = str(tmp_path / "in.png")
    cv2.imwrite(path, img[..., ::-1])

    class CenterMatter:
        def __call__(self, rgb):
            a = np.zeros(rgb.shape[:2], np.uint8)
            a[16:48, 16:48] = 255
            return a

    out = prepare_image(path, matting="u2net", matter=CenterMatter())
    # the red square is the kept foreground, recentered + padded
    assert out.shape[0] == out.shape[1]
    reds = (out[..., 0] > 128) & (out[..., 2] < 64)
    assert reds.any()

    with pytest.raises(ValueError, match="u2net"):
        prepare_image(path, matting="u2net", matter=None)


def test_u2net_param_tree_matches_converter():
    """flax init param tree == converted torch tree (names and shapes) —
    catches silent name drift that would leave weights unloaded."""
    tm = _randomize(TU2NET("u2netp"), seed=5)
    conv = convert_u2net(tm.state_dict())
    model = U2Net(arch="u2netp")
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    def paths(tree, pre=""):
        if isinstance(tree, dict):
            out = set()
            for k, v in tree.items():
                out |= paths(v, f"{pre}{k}.")
            return out
        return {pre[:-1]}

    assert paths(init) == paths(conv)
    flat_i = jax.tree_util.tree_leaves_with_path(init)
    flat_c = dict(jax.tree_util.tree_leaves_with_path(conv))
    for path, leaf in flat_i:
        assert flat_c[path].shape == leaf.shape, path
