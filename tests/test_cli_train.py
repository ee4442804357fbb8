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
