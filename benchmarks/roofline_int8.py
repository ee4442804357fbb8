"""Per-op roofline breakdown of the int8 (W8A8) DiT serving step
(VERDICT r1 item 2: where does the 2x int8 MXU rate go?).

Times every matmul class of one CFG'd flagship denoise step (B=2 ->
batch-doubled 4096 token rows) in bf16, pure-int8-dot (the MXU ceiling),
and the full W8A8 pattern (dynamic activation quant + dot + rescale),
plus the bf16 flash attention stages that stay unquantized, and prints
the composed 28-block step model next to the measured end-to-end times.

Run on the TPU:  python benchmarks/roofline_int8.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ROWS = 4096  # 2 (CFG) x B=2 ... tokens: 2 x 2048 token rows per sample


def timeit(f, *args, n=20):
    out = f(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out)
          .astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out)
          .astype(jnp.float32))
    return (time.perf_counter() - t0) / n


def timeit_scan(step, x0, n=100, reps=3):
    """Time ``step`` iterated n times INSIDE one jit (lax.scan with a
    data dependency) — per-dispatch tunnel latency (~25 ms) and host
    jitter would otherwise dominate sub-ms kernels. ``step`` maps a
    carry (same pytree shape) to the next carry."""

    @jax.jit
    def chain(c):
        return jax.lax.scan(lambda c, _: (step(c), None), c,
                            None, length=n)[0]

    c = chain(x0)
    c = jax.tree.map(lambda a: a, c)
    jax.block_until_ready(c)
    float(jnp.sum(jax.tree.leaves(c)[0]).astype(jnp.float32))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        c = chain(x0)
        float(jnp.sum(jax.tree.leaves(c)[0]).astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    key = jax.random.PRNGKey(0)
    # (label, in, out, count_per_block)
    mms = [
        ("attn.qkv", 1152, 3456, 1),
        ("attn.proj", 1152, 1152, 1),
        ("cross.to_q", 1152, 1152, 1),
        ("cross.proj", 1152, 1152, 1),
        ("mlp.fc1", 1152, 4608, 1),
        ("mlp.fc2", 4608, 1152, 1),
    ]

    @jax.jit
    def dot_bf16(x, w):
        return jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(jnp.bfloat16)

    @jax.jit
    def dot_i8(xq, wq):
        return jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    @jax.jit
    def w8a8(x, wq, ws):
        x32 = x.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(x32), -1, keepdims=True), 1e-9) / 127.
        xq = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * s * ws[None]).astype(jnp.bfloat16)

    # every measurement runs n scan iterations INSIDE one jit with a
    # data dependency (x <- x + eps*y[:, :1]) so the per-dispatch tunnel
    # latency cannot pollute sub-ms kernels; the feedback adds one VPU
    # pass over x (~10-25 us) — noted, identical across variants
    print(f"{'matmul':14s} {'shape':18s} {'bf16':>8s} {'i8 dot':>8s} "
          f"{'w8a8':>8s} {'quant ovh':>9s}  (ms, ROWS=4096, scan-chained)")
    tot = {"bf16": 0.0, "i8": 0.0, "w8a8": 0.0}
    for label, cin, cout, cnt in mms:
        x = jax.random.normal(key, (ROWS, cin), jnp.bfloat16)
        w = jax.random.normal(key, (cin, cout), jnp.bfloat16) * 0.02
        xq = jax.random.randint(key, (ROWS, cin), -127, 127, jnp.int8)
        wq = jax.random.randint(key, (cin, cout), -127, 127, jnp.int8)
        ws = jnp.ones((cout,), jnp.float32)
        flop = 2 * ROWS * cin * cout
        tb = timeit_scan(
            lambda c: c + dot_bf16(c, w)[:, :1].astype(jnp.bfloat16) * 1e-2,
            x)
        ti = timeit_scan(
            lambda c: c + (dot_i8(c, wq)[:, :1] & 1).astype(jnp.int8), xq)
        tw = timeit_scan(
            lambda c: c + w8a8(c, wq, ws)[:, :1] * 1e-2, x)
        tot["bf16"] += cnt * tb
        tot["i8"] += cnt * ti
        tot["w8a8"] += cnt * tw
        print(f"{label:14s} {f'{cin}x{cout}':18s} {tb*1e3:8.3f} "
              f"{ti*1e3:8.3f} {tw*1e3:8.3f} {(tw-ti)*1e3:9.3f}"
              f"   bf16 {flop/tb/1e12:5.1f} TF/s | i8 {flop/ti/1e12:5.1f}"
              f" | w8a8 {flop/tw/1e12:5.1f}")

    # attention (stays bf16: in-kernel int8 dot does not hit the int8 MXU
    # rate — probe commit fbb0caf)
    from topiaxl.ops.flash_attention import flash_attention

    B, H, hd = 4, 16, 72
    q = jax.random.normal(key, (B, 2048, H, hd), jnp.bfloat16)
    kv = jax.random.normal(key, (B, 2048, H, hd), jnp.bfloat16)
    ck = jax.random.normal(key, (B, 1370, H, hd), jnp.bfloat16)
    t_self = timeit_scan(
        lambda c: c + flash_attention(c, kv, kv, hd**-0.5) * 1e-2, q, n=50)
    t_cross = timeit_scan(
        lambda c: c + flash_attention(c, ck, ck, hd**-0.5) * 1e-2, q, n=50)
    print(f"{'flash self':14s} {'2048x2048':18s} {t_self*1e3:8.3f} (bf16)")
    print(f"{'flash cross':14s} {'2048x1370':18s} {t_cross*1e3:8.3f} (bf16)")

    # LN+modulate / residual boundaries (the bf16 elementwise floor)
    from topiaxl.ops.fused_ln import ln_modulate, ln_modulate_residual

    sh = jnp.zeros((B, 1152), jnp.bfloat16)
    sc = jnp.zeros((B, 1152), jnp.bfloat16)
    g = jnp.ones((B, 1152), jnp.bfloat16)
    xs = jax.random.normal(key, (B, 2048, 1152), jnp.bfloat16)
    t_ln = timeit_scan(
        lambda c: c + ln_modulate(c, sh, sc, out_dtype=jnp.bfloat16) * 1e-2,
        xs, n=50)
    t_lnr = timeit_scan(
        lambda c: ln_modulate_residual(c, c, g, sh, sc,
                                       out_dtype=jnp.bfloat16)[0] * 0.5,
        xs, n=50)
    print(f"{'ln_modulate':14s} {'4x2048x1152':18s} {t_ln*1e3:8.3f} (bf16)")
    print(f"{'ln_mod_resid':14s} {'4x2048x1152':18s} {t_lnr*1e3:8.3f} (bf16)")

    d = 28
    attn = t_self + t_cross
    ln = t_ln + 2 * t_lnr
    print("\ncomposed 28-block step model (matmuls + attention + LN):")
    for k in ("bf16", "i8", "w8a8"):
        total = d * (tot[k] + attn + ln)
        print(f"  {k:5s} matmuls {d*tot[k]*1e3:7.1f} ms + attn "
              f"{d*attn*1e3:6.1f} ms + ln {d*ln*1e3:5.1f} ms"
              f" = {total*1e3:7.1f} ms "
              f"-> {1.0/total:6.2f} steps/s ceiling")
    print("\ninterpretation: (w8a8 - i8 dot) is the dynamic-quant VPU tax;"
          "\nattention+LN+residuals are the bf16 floor CFG'd int8 can't cut.")


if __name__ == "__main__":
    main()
