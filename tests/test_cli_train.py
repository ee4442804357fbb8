"""Training CLI end-to-end: synthetic data, checkpoints, resume."""

import json
import os
import textwrap

import numpy as np
import pytest


def _train_config(tmp_path, max_steps=4):
    cfg = tmp_path / "train.yml"
    cfg.write_text(textwrap.dedent(f"""
        global_seed: 0
        output_dir: {tmp_path}/out
        model:
          generator:
            class_name: topiaxl.DiT
            seq_length: 8
            in_channels: 6
            condition_channels: 12
            hidden_size: 16
            depth: 1
            num_heads: 2
            attn_proj_bias: true
            cond_drop_prob: 0.1
            dtype: fp32
        diffusion:
          noise_schedule: squaredcos_cap_v2
          diffusion_steps: 20
          parameterization: v
        optimizer: {{ lr: 1.0e-4, weight_decay: 0.0 }}
        scheduler: {{ warmup_iters: 2, max_iters: 100 }}
        train:
          mesh: {{ dp: -1 }}
          batch_size: 1
          synthetic: true
          cond_seq: 3
          max_steps: {max_steps}
          log_every_n_steps: 2
          ckpt_every_n_steps: 2
          keep_ckpts: 2
          ema_decay: 0.99
    """))
    return cfg


@pytest.mark.slow
def test_train_cli_smoke_and_resume(tmp_path):
    from topiaxl.cli.train import main

    cfg = _train_config(tmp_path, max_steps=4)
    rc = main([str(cfg)])
    assert rc is None or rc == 0

    mpath = tmp_path / "out" / "train" / "metrics.jsonl"
    assert mpath.exists()
    rows = [json.loads(l) for l in open(mpath)]
    assert rows and all(np.isfinite(r["loss"]) for r in rows)
    assert rows[-1]["step"] >= 4

    ckpt_dir = tmp_path / "out" / "train" / "ckpts"
    assert any(ckpt_dir.iterdir())

    # resume: bump max_steps, run again, must continue past step 4
    cfg2 = _train_config(tmp_path, max_steps=6)
    main([str(cfg2)])
    rows2 = [json.loads(l) for l in open(mpath)]
    assert rows2[-1]["step"] >= 6


@pytest.mark.slow
def test_train_cli_preemption_checkpoint(tmp_path):
    """SIGTERM mid-run -> in-flight step finishes, checkpoint saved,
    clean exit (preemption-safe training)."""
    import signal
    import subprocess
    import sys
    import time

    cfg = _train_config(tmp_path, max_steps=100000)
    # long run; ckpt_every high so only the preemption save happens
    text = cfg.read_text().replace("ckpt_every_n_steps: 2",
                                   "ckpt_every_n_steps: 99999")
    cfg.write_text(text)
    # the env's sitecustomize registers the real-TPU platform; the child
    # must pin CPU the same way conftest does for the parent
    code = (
        "import sys; import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from topiaxl.cli.train import main\n"
        f"sys.exit(main([{str(cfg)!r}]) or 0)\n"
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    mpath = tmp_path / "out" / "train" / "metrics.jsonl"
    deadline = time.time() + 180
    while time.time() < deadline and not mpath.exists():
        time.sleep(1.0)
        if proc.poll() is not None:
            break
    assert proc.poll() is None, proc.communicate()[0].decode()[-2000:]
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=120)
    assert proc.returncode == 0, out.decode()[-2000:]
    ckpt_dir = tmp_path / "out" / "train" / "ckpts"
    assert ckpt_dir.exists() and any(ckpt_dir.iterdir()), out.decode()[-2000:]


def test_train_cli_rejects_quant(tmp_path):
    from topiaxl.cli.train import main

    cfg = _train_config(tmp_path, max_steps=1)
    cfg.write_text(cfg.read_text().replace(
        "cond_drop_prob: 0.1", "cond_drop_prob: 0.1\n    quant: true"))
    with pytest.raises(ValueError, match="inference-only"):
        main([str(cfg)])
