"""Data pipeline, loss functions, profiling utilities."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from topiaxl.pipelines import data as D
from topiaxl.pipelines.losses import primsdf_fit_loss, process_losses, vae_loss


def test_token_shard_dataset(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(3):
        np.savez(tmp_path / f"shard{i}.npz",
                 x=rng.standard_normal((10, 4, 6)).astype("f"),
                 y=rng.standard_normal((10, 2, 3)).astype("f"))
    ds = D.TokenShardDataset(str(tmp_path / "shard*.npz"), batch_size=8,
                             host_id=0, host_count=1)
    assert len(ds) == 30
    batches = list(ds.epoch(0))
    assert len(batches) == 3
    assert batches[0]["x"].shape == (8, 4, 6)
    assert batches[0]["y"].shape == (8, 2, 3)
    # different epochs shuffle differently
    b0 = list(ds.epoch(0))[0]["x"]
    b1 = list(ds.epoch(1))[0]["x"]
    assert np.abs(b0 - b1).max() > 0

    # host sharding partitions the data
    ds_a = D.TokenShardDataset(str(tmp_path / "shard*.npz"), 4,
                               host_id=0, host_count=2)
    ds_b = D.TokenShardDataset(str(tmp_path / "shard*.npz"), 4,
                               host_id=1, host_count=2)
    xa = np.concatenate([b["x"] for b in ds_a.epoch(0)])
    xb = np.concatenate([b["x"] for b in ds_b.epoch(0)])
    assert len(xa) + len(xb) <= 30


def test_prefetch_to_device():
    it = iter([{"x": np.ones((2, 3), "f")} for _ in range(4)])
    out = list(D.prefetch_to_device(it, depth=2))
    assert len(out) == 4
    assert isinstance(out[0]["x"], jax.Array)


def test_encode_decode_tokens_roundtrip():
    """encode_assets inverts pipelines/infer payload normalization."""
    from topiaxl.models import VAE3D
    from topiaxl.pipelines.infer import decode_primx

    vae = VAE3D(in_channels=6, latent_channels=1, out_channels=6,
                down_channels=(8, 16), up_channels=(16, 8),
                layers_per_block=1, dtype=jnp.float32)
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 6)),
                      jax.random.PRNGKey(1))
    n = 4
    rng = np.random.default_rng(0)
    srt = rng.uniform(0.1, 0.5, (n, 4)).astype("f")
    payload = rng.uniform(-0.2, 0.2, (n, 6 * 512)).astype("f")
    mean = np.zeros(4 + 64, "f")
    std = np.ones(4 + 64, "f")
    tokens = D.encode_assets(vae, params, srt, payload, mean, std)
    assert tokens.shape == (n, 68)
    # decode the tokens back through the pipeline: srt must round-trip
    srt2, feat2 = decode_primx(vae, params, jnp.asarray(tokens)[None],
                               num_prims=n, prim_shape=8, dim_feat=6)
    np.testing.assert_allclose(np.asarray(srt2[0]), srt, atol=1e-5)
    assert feat2.shape == (1, n, 6 * 512)


def test_vae_losses():
    class FakePosterior:
        def kl(self):
            return jnp.asarray([0.5, 0.7])

    gt = jnp.ones((2, 4, 4, 4, 6))
    recon = jnp.zeros((2, 4, 4, 4, 6))
    p = FakePosterior()
    total, ld = vae_loss(gt, recon, p, {"recon": 2.0, "kl": 1.0}, "l1")
    np.testing.assert_allclose(float(total), 2.0 * 1.0 + 0.6, atol=1e-6)
    total, ld = vae_loss(gt, recon, p, {"sdf": 1.0, "rgb": 1.0, "mat": 1.0},
                         "sep_l1")
    np.testing.assert_allclose(float(total), 3.0, atol=1e-6)
    assert "loss_kl" in ld
    total, ld = vae_loss(gt, recon, p, {"recon": 1.0, "kl": 0.0}, "dct")
    assert np.isfinite(float(total))


def test_primsdf_fit_loss_stages():
    inputs = {"sdf": jnp.ones((8, 1)), "tex": jnp.ones((8, 3)),
              "mat": jnp.ones((8, 2))}
    preds = {"sdf": jnp.zeros((8, 1)), "tex": jnp.zeros((8, 3)),
             "mat": jnp.zeros((8, 2)),
             "prim_scale": jnp.full((1, 4, 3), 2.0)}
    w = {"sdf_l1": 1.0, "rgb_l1": 1.0, "mat_l1": 1.0}
    # shape stage: only sdf term active
    t0, _ = primsdf_fit_loss(inputs, preds, w, 0, 10, 20)
    np.testing.assert_allclose(float(t0), 1.0, atol=1e-6)
    # tex stage: rgb + mat
    t1, _ = primsdf_fit_loss(inputs, preds, w, 15, 10, 20)
    np.testing.assert_allclose(float(t1), 2.0, atol=1e-6)
    # past tex_opt_steps: nothing
    t2, _ = primsdf_fit_loss(inputs, preds, w, 25, 10, 20)
    np.testing.assert_allclose(float(t2), 0.0, atol=1e-6)


def test_step_meter_and_logger(tmp_path):
    from topiaxl.core.profiling import MetricLogger, StepMeter

    m = StepMeter()
    for _ in range(5):
        m.tick()
    assert m.steps_per_sec > 0
    assert np.isfinite(m.eta(100))

    path = os.path.join(tmp_path, "metrics.jsonl")
    log = MetricLogger(path, print_every=10)
    log.log(1, {"loss": jnp.asarray(0.5)})
    log.close()
    assert os.path.getsize(path) > 0
