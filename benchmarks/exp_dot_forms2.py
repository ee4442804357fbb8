"""MXU cost of attention dot forms vs head-dim padding, take 2.

Cleaner methodology than exp_dot_forms: each form runs as a Pallas
kernel over a length-G grid with CONSTANT block indices (operands stay
resident in VMEM after the first step) and accumulates into the output
(`o += a.b`), so every grid step executes one real dot with no
cross-step CSE and no HBM streaming in steady state. A dense
calibration form checks that the probe itself reaches the known
~197 TF/s bf16 roofline; the attention forms are then directly
comparable.

Cost model being tested (v5e MXU): matmul [M,K]x[K,N] costs
ceil(M/8) * ceil(K/128) * ceil(N/128) passes — i.e. the CONTRACTION
dim K and the output-lane dim N round up to 128, while the sublane
dim M rounds to 8. head_dim 72 therefore pays 128/72 when it sits on
K (qk, dp: unavoidable) or on N (pv, dq, dk, dv: avoidable by
computing the TRANSPOSED output with D=72 on sublanes).

Run on the TPU: python benchmarks/exp_dot_forms2.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G_LO, G_HI = 512, 8192  # two grid sizes; the slope cancels the fixed
#                         per-dispatch tunnel latency (~25 ms)


def _kernel(a_ref, b_ref, o_ref, *, dn):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jax.lax.dot_general(
        a_ref[:], b_ref[:], dimension_numbers=(dn, ((), ())),
        preferred_element_type=jnp.float32)


def _timed(a_shape, b_shape, dn, out_shape, g):
    a = jax.random.normal(jax.random.PRNGKey(0), a_shape, jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), b_shape, jnp.bfloat16)
    f = jax.jit(pl.pallas_call(
        functools.partial(_kernel, dn=dn),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(a_shape, lambda i: (0,) * len(a_shape),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b_shape, lambda i: (0,) * len(b_shape),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(out_shape, lambda i: (0,) * len(out_shape),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
    ))
    out = f(a, b)
    float(jnp.sum(out))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(a, b)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best


def run(label, a_shape, b_shape, dn, out_shape, true_flops):
    t_lo = _timed(a_shape, b_shape, dn, out_shape, G_LO)
    t_hi = _timed(a_shape, b_shape, dn, out_shape, G_HI)
    dt = (t_hi - t_lo) / (G_HI - G_LO)
    print(f"{label:46s} {dt*1e6:7.2f} us/dot  "
          f"{true_flops/dt/1e12:6.1f} TF/s(true)", flush=True)
    return dt


def main():
    BQ, SK = 512, 2048
    D = 72
    fl = 2.0 * BQ * SK * D  # true (unpadded) attention flops per dot
    print(f"grid-resident dot forms, bq={BQ} sk={SK}, slope {G_LO}->{G_HI} grid")
    # calibration: all dims 128-aligned -> should hit ~190+ TF/s
    run("cal      [512,1152]x[1152,1152] standard",
        (512, 1152), (1152, 1152), ((1,), (0,)), (512, 1152),
        2.0 * 512 * 1152 * 1152)
    # current forms (D padded to 128 on lanes)
    run("qk_lane  [bq,128]x[sk,128]  c=lanes",
        (BQ, 128), (SK, 128), ((1,), (1,)), (BQ, SK), fl)
    run("pv_std   [bq,sk]x[sk,128]   standard",
        (BQ, SK), (SK, 128), ((1,), (0,)), (BQ, 128), fl)
    # D=72 unpadded on lanes (Mosaic pads internally -> same MXU cost?)
    run("qk_l72   [bq,72]x[sk,72]    c=lanes",
        (BQ, D), (SK, D), ((1,), (1,)), (BQ, SK), fl)
    run("pv_s72   [bq,sk]x[sk,72]    standard",
        (BQ, SK), (SK, D), ((1,), (0,)), (BQ, D), fl)
    # transposed-output forms (D=72 on sublanes, no padding at all)
    run("pv_lane  [72,sk]x[bq,sk]    c=lanes ->outT",
        (D, SK), (BQ, SK), ((1,), (1,)), (D, BQ), fl)
    run("dq_lane  [72,sk]x[bq,sk]    c=lanes ->dqT",
        (D, SK), (BQ, SK), ((1,), (1,)), (D, BQ), fl)
    # transposed qk (contraction on sublanes) for completeness
    run("qk_sub   [72,bq]x[72,sk]    c=sublanes",
        (D, BQ), (D, SK), ((0,), (0,)), (BQ, SK), fl)


if __name__ == "__main__":
    main()
