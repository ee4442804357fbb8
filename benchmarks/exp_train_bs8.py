"""B=8 reference-recipe train sweep: scan_blocks x remat (VERDICT r2
item 3). Publishes compile+1 and steps/s per config; results feed
docs/TRAINING.md and the bench's train_steps_per_sec_bs8 row.

Run: python -m benchmarks.exp_train_bs8 [config ...]
Configs: scan_flash scan_flashmlp scan_full unrolled_flash b2_scan
"""
import sys

from benchmarks.tune_train_remat import run

CONFIGS = {
    "scan_flash": dict(remat="flash", scan_blocks=True, batch=8),
    "scan_flashmlp": dict(remat="flash_mlp", scan_blocks=True, batch=8),
    "scan_full": dict(remat=True, scan_blocks=True, batch=8),
    "unrolled_flash": dict(remat="flash", scan_blocks=False, batch=8),
    "b2_scan": dict(remat="flash", scan_blocks=True, batch=2),
    "b2_unrolled": dict(remat="flash", scan_blocks=False, batch=2),
    # grad-accum microbatching: cheaper remat policies fit at B/k
    "scan_dots_ga2": dict(remat="dots", scan_blocks=True, batch=8,
                          grad_accum=2),
    "scan_flashmlp_ga2": dict(remat="flash_mlp", scan_blocks=True,
                              batch=8, grad_accum=2),
    "scan_dots_ga4": dict(remat="dots", scan_blocks=True, batch=8,
                          grad_accum=4),
    "scan_dots_ga8": dict(remat="dots", scan_blocks=True, batch=8,
                          grad_accum=8),
    "scan_none_ga4": dict(remat=False, scan_blocks=True, batch=8,
                          grad_accum=4),
    "scan_none_ga8": dict(remat=False, scan_blocks=True, batch=8,
                          grad_accum=8),
    "scan_flash_ga4": dict(remat="flash", scan_blocks=True, batch=8,
                           grad_accum=4),
}


def main():
    names = sys.argv[1:] or ["scan_flash", "scan_full", "b2_scan"]
    for name in names:
        cfg = dict(CONFIGS[name])
        batch = cfg.pop("batch")
        try:
            run(batch=batch, steps=5, label=f"{name} B={batch}", **cfg)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
