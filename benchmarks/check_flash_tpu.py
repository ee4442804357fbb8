"""On-TPU flash-kernel numerics spot check (VERDICT r2 item 9).

The CI property sweeps run the Pallas kernels in interpret mode on CPU;
this harness closes the "interpret says equal vs the chip says equal"
gap by asserting Mosaic-compiled flash fwd+bwd against the XLA einsum
attention at a handful of odd shapes on the real device. Invoked from
bench.py (logged as ``flash_parity_on_tpu``), not from pytest.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# (B, Sq, Sk, H, D): flagship self/cross shapes plus odd lengths and a
# non-multiple-of-8 head dim exercising the padding paths
SHAPES = [
    (2, 2048, 2048, 16, 72),
    (2, 2048, 1370, 16, 72),
    (1, 777, 333, 4, 72),
    (1, 640, 640, 2, 36),
]


def run(verbose: bool = False) -> bool:
    from topiaxl.ops.attention import _xla_attention
    from topiaxl.ops.flash_attention import flash_attention

    ok = True
    for (B, Sq, Sk, H, D) in SHAPES:
        key = jax.random.PRNGKey(Sq * 131 + Sk)
        kq, kk, kv, kd = jax.random.split(key, 4)
        q = jax.random.normal(kq, (B, Sq, H, D), jnp.bfloat16)
        k = jax.random.normal(kk, (B, Sk, H, D), jnp.bfloat16)
        v = jax.random.normal(kv, (B, Sk, H, D), jnp.bfloat16)
        do = jax.random.normal(kd, (B, Sq, H, D), jnp.bfloat16)
        scale = D ** -0.5

        def loss_flash(q, k, v):
            return jnp.vdot(flash_attention(q, k, v, scale).astype(
                jnp.float32), do.astype(jnp.float32))

        def loss_xla(q, k, v):
            return jnp.vdot(_xla_attention(q, k, v, scale).astype(
                jnp.float32), do.astype(jnp.float32))

        of, gf = jax.jit(jax.value_and_grad(loss_flash, (0, 1, 2)))(q, k, v)
        ox, gx = jax.jit(jax.value_and_grad(loss_xla, (0, 1, 2)))(q, k, v)

        out_f = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale))(
            q, k, v)
        out_x = jax.jit(lambda q, k, v: _xla_attention(q, k, v, scale))(
            q, k, v)
        # both paths are bf16-in / bf16-matmul; differences are softmax
        # accumulation order, so tolerances sit at bf16 resolution
        fwd_err = float(jnp.max(jnp.abs(out_f.astype(jnp.float32)
                                        - out_x.astype(jnp.float32))))
        rows = [fwd_err]
        for a, b in zip(gf, gx):
            scale_ref = float(jnp.max(jnp.abs(b.astype(jnp.float32)))) + 1e-6
            rows.append(float(jnp.max(jnp.abs(
                a.astype(jnp.float32) - b.astype(jnp.float32)))) / scale_ref)
        shape_ok = fwd_err < 0.05 and all(r < 0.05 for r in rows[1:])
        ok = ok and shape_ok
        if verbose:
            print(f"  {B}x{Sq}x{Sk}x{H}x{D}: fwd={rows[0]:.4f} "
                  f"dq/dk/dv rel={rows[1]:.4f}/{rows[2]:.4f}/{rows[3]:.4f} "
                  f"{'ok' if shape_ok else 'FAIL'}")
    return bool(ok)


if __name__ == "__main__":
    print("flash_parity_on_tpu:", run(verbose=True))
