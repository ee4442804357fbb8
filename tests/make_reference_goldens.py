"""Generate tests/goldens/reference_chain_v1.npz — outputs of the ACTUAL
reference implementation (/root/reference, CPU torch) on the tiny config,
used by tests/test_reference_parity.py as the chain-level parity anchor
(VERDICT r1 item 1).

Run once and commit the npz:
    python tests/make_reference_goldens.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

import reference_runtime as rr  # noqa: E402


def main():
    ref = rr.load()
    dit, vae = rr.build_reference_models(ref, seed=0)
    mean, std = rr.reference_latent_stats(seed=0)
    rng = np.random.default_rng(7)
    noise = rng.standard_normal(
        (1, rr.TINY["num_prims"], rr.TINY["in_channels"])).astype(np.float32)
    y = rng.standard_normal(
        (1, rr.TINY["cond_tokens"], rr.TINY["cond_channels"])
    ).astype(np.float32)

    out = rr.run_reference_chain(ref, dit, vae, noise, y, mean, std)
    smin = float(out["srt"][0, :, 0].min())
    assert smin > 0.02, f"degenerate prim scale {smin}; adjust stats"
    ncov = int((np.abs(out["tex"]).sum(1) > 0).sum())
    assert 0 < ncov < out["tex"].shape[0], "need covered AND uncovered points"

    payload = {
        "noise": noise, "y": y, "latent_mean": mean, "latent_std": std,
        **{f"out.{k}": v for k, v in out.items()},
    }
    for name, model in (("dit", dit), ("vae", vae)):
        for k, v in model.state_dict().items():
            payload[f"sd.{name}.{k}"] = v.detach().numpy()

    dst = os.path.join(os.path.dirname(__file__), "goldens",
                       "reference_chain_v1.npz")
    np.savez_compressed(dst, **payload)
    print(f"wrote {dst} ({os.path.getsize(dst)/1e6:.2f} MB, "
          f"{len(payload)} arrays, {ncov}/{out['tex'].shape[0]} covered pts)")


if __name__ == "__main__":
    main()
