import textwrap

import pytest

from topiaxl.core import AttrDict, build, load_config, merge_dotlist, register


def test_reference_config_parses(tmp_path):
    # the shipped config must load with interpolation resolved
    cfg = load_config("configs/inference_dit.yml")
    assert cfg.model.num_prims == 2048
    assert cfg.model.generator.seq_length == 2048  # ${model.num_prims}
    assert cfg.model.vae.out_channels == 6  # ${model.vae.in_channels} -> ${model.dim_feat}
    assert cfg.inference.seed == 42  # ${global_seed}
    assert cfg.diffusion.parameterization == "v"

    from topiaxl.models.latent_stats import get_latent_stats

    mean, std = get_latent_stats(cfg.model.latent_stats)
    assert mean.shape == (68,) and std.shape == (68,)


def test_interpolation_and_overrides(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text(
        textwrap.dedent(
            """
            a: 3
            b: ${a}
            nested:
              c: "x${a}y"
            """
        )
    )
    cfg = load_config(str(p), overrides=["a=5", "nested.d=1.5"])
    assert cfg.a == 5
    assert cfg.b == 5
    assert cfg.nested.c == "x5y"
    assert cfg.nested.d == 1.5


def test_registry_build():
    @register("tests.Dummy")
    def make(**kw):
        return kw

    node = AttrDict(class_name="tests.Dummy", x=1, y="z")
    obj = build(node, extra=2)
    assert obj == {"x": 1, "y": "z", "extra": 2}

    with pytest.raises(KeyError):
        build(AttrDict(class_name="nope"))


def test_attrdict_dotted():
    d = AttrDict.from_nested({"a": {"b": {"c": 1}}})
    assert d.select("a.b.c") == 1
    d.set_dotted("a.b.d", 7)
    assert d.a.b.d == 7


def test_registry_multiview_conditioner():
    """Reference class_name models.conditioner.image.ImageMultiViewConditioner
    resolves (reference image.py:155)."""
    import topiaxl.registry  # noqa: F401
    from topiaxl.core import build
    from topiaxl.core.attrdict import AttrDict

    c = build(AttrDict({
        "class_name": "models.conditioner.image.ImageMultiViewConditioner",
        "num_prims": 4, "prim_shape": 2, "view_counts": 3,
        "encoder_config": {"class_name": "topiaxl.DummyImageConditioner"},
    }))
    assert type(c).__name__ == "ImageMultiViewConditioner"
    assert c.view_counts == 3
