"""MXU cost of attention dot forms vs head-dim padding (run on TPU).

The flash kernel keeps head_dim D=72 on the LANE axis, which Mosaic
pads to 128 — if the MXU charges for the padded lanes, every attention
matmul does 128/72 = 1.78x the necessary work. The alternative stores
heads TRANSPOSED ([D, S], D on sublanes padded 72->80) so the padding
waste is 80/72 = 1.11x — IF the sublane-contraction forms hit the same
MXU rate. Each candidate form runs in a Pallas kernel with an
in-kernel accumulation loop (n=64 dependent dots) so dispatch cost
vanishes and the measured slope is the per-dot cost.

forms (bq=1024, sk=2048):
  qk_lane:  [bq,128] x [sk,128]  contract lanes (x . y^T)   — current
  qk_sub:   [80,bq] x [80,sk]    contract sublanes (x^T . y) — proposed
  pv_std:   [bq,sk] x [sk,128]   standard A.B                — current
  pv_lane:  [80,sk] x [bq,sk]    contract lanes -> out^T     — proposed
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

N_ITER = 64
# bq/sk sized so acc + out f32 stay under the 16M scoped-VMEM stack
BQ, SK = 512, 1024


def _loop_kernel(a_ref, b_ref, o_ref, *, dn, out_shape):
    # fori_loop with a VECTOR-level carried dependency into the lhs so
    # the dot can be neither hoisted nor CSE'd (a scalar acc[0,0] hits a
    # Mosaic bf16-scalar-mul legalization hole; unrolling OOMs VMEM)
    def body(i, acc):
        # loop-index scalar splat keeps the dot loop-variant (vector
        # [1,1]->full broadcasts fail to legalize on this toolchain;
        # scalar splats take a different, supported path)
        eps = i.astype(jnp.float32) * jnp.float32(1e-20)
        a = (a_ref[:].astype(jnp.float32) + eps).astype(a_ref.dtype)
        return acc + jax.lax.dot_general(
            a, b_ref[:], dimension_numbers=(dn, ((), ())),
            preferred_element_type=jnp.float32)

    o_ref[:] = jax.lax.fori_loop(
        0, N_ITER, body, jnp.zeros(out_shape, jnp.float32))


def run(label, a_shape, b_shape, dn, out_shape, flops_per_dot):
    a = jax.random.normal(jax.random.PRNGKey(0), a_shape, jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), b_shape, jnp.bfloat16)
    f = pl.pallas_call(
        functools.partial(_loop_kernel, dn=dn, out_shape=out_shape),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
    )
    f = jax.jit(f)
    out = f(a, b)
    float(jnp.sum(out))
    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(a, b)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / reps / N_ITER
    print(f"{label:44s} {dt*1e6:8.1f} us/dot  "
          f"{flops_per_dot/dt/1e12:6.1f} TF/s", flush=True)
    return dt


def main():
    d_pad_lane, d_pad_sub, d_true = 128, 80, 72
    fl = lambda d: 2.0 * BQ * SK * d
    print(f"in-kernel dot forms, bq={BQ} sk={SK}, {N_ITER}-deep chain")
    run("qk_lane  [bq,128]x[sk,128] c=lanes", (BQ, d_pad_lane),
        (SK, d_pad_lane), ((1,), (1,)), (BQ, SK), fl(d_pad_lane))
    run("qk_sub   [80,bq]x[80,sk]   c=sublanes", (d_pad_sub, BQ),
        (d_pad_sub, SK), ((0,), (0,)), (BQ, SK), fl(d_pad_sub))
    run("pv_std   [bq,sk]x[sk,128]  standard", (BQ, SK),
        (SK, d_pad_lane), ((1,), (0,)), (BQ, d_pad_lane), fl(d_pad_lane))
    run("pv_lane  [80,sk]x[bq,sk]   c=lanes ->outT", (d_pad_sub, SK),
        (BQ, SK), ((1,), (1,)), (d_pad_sub, BQ), fl(d_pad_sub))
    # reference rate at an unpadded shape
    run("ref      [1024,1152]x[1152,2048] standard", (1024, 1152),
        (1152, 2048), ((1,), (0,)), (1024, 2048), 2.0 * 1024 * 1152 * 2048)


if __name__ == "__main__":
    main()
