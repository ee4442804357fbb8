"""North-star benchmarks on one chip, printed as JSON lines — the LAST
complete line carries every metric measured (earlier lines are
progressive snapshots so a killed run still reports what finished).

Primary metric: flagship DiT denoise steps/sec — one "step" = one CFG'd
denoise evaluation at full 3DTopia-XL geometry (2 x [2048 tokens x 68ch]
through depth-28/hidden-1152 DiT with cross-attn to 1370 DINOv2 tokens),
with per-block cross-attn K/V precomputed once per asset (they are
constant over the chain).

The same line also reports ``image_to_glb_seconds``: the full warm
image->textured-GLB pipeline starting from a .png on disk — U^2-Net
matting + DINOv2 encode + ddim=25 denoise + VAE decode + extraction at
mc_resolution=256, decimate=100k, 1024^2 textures (the BASELINE.md
<30 s target), each timed as its own row. "Warm" = second run in
the process: remote compiles through the tunneled backend take minutes
and are NOT cacheable across processes (the persistent compilation cache
is written but never hit under this backend), so cold numbers measure
the tunnel, not the framework.

``vs_baseline`` compares steps/s against an estimated reference
throughput of the PyTorch/xformers fp16 implementation on its implied
A100 (BASELINE.md — the repo publishes no numbers). FLOP accounting per
CFG'd step, B=2 batch, D=1152, N=2048, M=1370, 28 blocks:
qkv 32.6G + self-attn 38.6G + proj 10.9G + cross-q 10.9G +
cross-attend 25.8G + cross-proj 10.9G + mlp 87.0G = 216.7G/block
=> 6.07 TFLOP/step with precomputed K/V (the r1 "9.5 TFLOP" figure
wrongly counted the K/V projections). The A100 estimate stays ~13
steps/s (the torch path recomputes K/V every step and pays ~7.6 TFLOP
at ~40% fp16 MFU).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_STEPS_PER_SEC = 13.0   # estimated A100 fp16 reference (docstring)
E2E_TARGET_S = 30.0             # BASELINE.md: <30 s image->GLB on one v5e
STEP_TFLOPS = 6.07              # per CFG'd denoise step (docstring)
PEAK_BF16_TFLOPS = 197.0        # TPU v5e bf16 peak


def bench_dit_steps():
    from topiaxl.models import DiT

    model = DiT(
        seq_length=2048, in_channels=68, condition_channels=768,
        hidden_size=1152, depth=28, num_heads=16, cond_drop_prob=0.1,
        attn_proj_bias=True, dtype=jnp.bfloat16,
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 2048, 68), jnp.float32)
    t = jnp.full((1,), 500, jnp.int32)
    y = jax.random.normal(jax.random.PRNGKey(1), (1, 1370, 768), jnp.float32)

    params = jax.jit(model.init)(key, x, t, y)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    # cond-branch KV (computed once per asset) + per-block null-branch
    # output vectors (once per model) — the serving path's CFG layout
    kv_fn = jax.jit(lambda p, yy: model.apply(p, yy, method=DiT.precompute_kv))
    kvs = jax.block_until_ready(kv_fn(params, y))
    null_outs = jax.jit(
        lambda p: model.apply(p, method=DiT.precompute_null_out))(params)

    @jax.jit
    def step(params, x, t, kvs):
        return model.apply(params, x, t, kvs, null_outs, 6.0,
                           method=DiT.forward_with_cfg_fast)

    out = step(params, x, t, kvs)  # compile
    # NOTE: force a scalar readback for the sync — block_until_ready does
    # not reliably wait for execution through tunneled device backends
    float(out.sum())

    # measure the real serving path: the whole denoise chain is ONE
    # compiled lax.scan (pipelines/infer.sample_tokens), so steps/s is
    # chain time / steps — a host-side step loop would instead measure
    # the tunnel's per-dispatch latency (~25 ms/step here)
    @jax.jit
    def chain(params, x0, kvs):
        def body(x, i):
            o = model.apply(params, x, jnp.full((1,), i, jnp.int32), kvs,
                            null_outs, 6.0, method=DiT.forward_with_cfg_fast)
            return o[..., :68], None
        return jax.lax.scan(body, x0, jnp.arange(25))[0]

    out = chain(params, x, kvs)  # compile
    float(out.sum())
    n = 4
    t0 = time.perf_counter()
    for i in range(n):
        out = chain(params, out, kvs)
    float(out.sum())
    dt = time.perf_counter() - t0
    return 25 * n / dt


def _write_bench_image(path="/tmp/topiaxl_bench_input.png"):
    """Deterministic synthetic object photo: the headline chain must
    genuinely start at a .png on disk (VERDICT r2 item 2)."""
    import cv2
    import numpy as np

    img = np.full((512, 512, 3), 255, np.uint8)
    cv2.circle(img, (256, 276), 140, (170, 96, 52), -1)
    cv2.rectangle(img, (196, 116), (316, 236), (52, 118, 196), -1)
    cv2.circle(img, (256, 276), 60, (240, 220, 96), -1)
    cv2.imwrite(path, img)
    return path


def _sphere_asset_device(prim_shape: int = 8):
    """Flagship-scale sphere-shell PrimX built ON DEVICE (random DiT
    weights produce degenerate fields, so stage 2 is timed on this
    asset). Building it with jnp under jit — not uploading 25 MB of
    host arrays inside the timed region — matches the real pipeline,
    whose stage-1 output already lives on device (r2's bench paid a
    ~2.3 s hidden upload here that made the breakdown not sum)."""
    from topiaxl.models.primx import PrimXParams, local_grid

    @jax.jit
    def build():
        n = 2048
        # same construction as rounds 1-2 (random directions on the
        # 0.55-sphere) so the stage-2 numbers stay comparable
        v = jax.random.normal(jax.random.PRNGKey(0), (n, 3))
        v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
        pos = v * 0.55
        scale = jnp.full((n, 1), 0.07)
        world = pos[:, None, :] + 0.07 * local_grid(prim_shape)[None]
        sdf = jnp.linalg.norm(world, axis=2) - 0.55
        rgb = jnp.clip(0.5 + 0.5 * world.transpose(0, 2, 1), 0.0, 1.0)
        mat = jnp.concatenate([jnp.full((n, 1, prim_shape ** 3), 0.8),
                               jnp.full((n, 1, prim_shape ** 3), 0.2)], 1)
        feat = jnp.concatenate([sdf[:, None, :], rgb, mat], 1).reshape(n, -1)
        return jnp.concatenate([scale, pos], 1), feat

    srt, feat = jax.block_until_ready(build())
    return PrimXParams(srt, feat)


def bench_e2e_seconds():
    """Warm image->GLB wall-clock at the BASELINE.md operating point,
    starting from a real .png like the reference entry point
    (inference.py:300-317): U^2-Net matting + DINOv2 encode + DDIM-25
    denoise + VAE decode + stage-2 extraction. Matting/encoder/DiT use
    random-init weights (cost is weight-independent); stage 2 runs on a
    device-built synthetic sphere asset since random DiT weights yield
    degenerate fields. Returns (rows dict, reusable ctx dict for the
    pipelined measurement) — the rows sum to the reported total."""
    from topiaxl.cli.infer import prepare_image
    from topiaxl.diffusion import create_diffusion
    from topiaxl.models import DiT, VAE3D
    from topiaxl.models.conditioner.image import DinoV2Wrapper
    from topiaxl.models.latent_stats import get_latent_stats
    from topiaxl.models.matting_u2net import U2Net
    from topiaxl.ops.matting import U2NetMatting
    from topiaxl.pipelines import infer as P

    key = jax.random.PRNGKey(0)
    dit = DiT(seq_length=2048, in_channels=68, condition_channels=768,
              hidden_size=1152, depth=28, num_heads=16, cond_drop_prob=0.1,
              attn_proj_bias=True, dtype=jnp.bfloat16)
    vae = VAE3D(dtype=jnp.bfloat16)
    diffusion = create_diffusion(
        timestep_respacing="ddim25", noise_schedule="squaredcos_cap_v2",
        parameterization="v", diffusion_steps=1000)
    dit_params = jax.jit(dit.init)(
        key, jnp.zeros((1, 2048, 68)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 2, 768)))
    dit_params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), dit_params)
    vae_params = vae.init(key, jnp.zeros((1, 8, 8, 8, 6)), key)
    mean, std = get_latent_stats("primx_v1")

    png = _write_bench_image()
    u2net = U2Net(arch="u2net")   # the full arch rembg runs by default
    u2_params = jax.jit(u2net.init)(
        jax.random.PRNGKey(3), jnp.zeros((1, 320, 320, 3)))
    matter = U2NetMatting(u2_params, arch="u2net")
    encoder = DinoV2Wrapper("dinov2_vitb14_reg")
    encoder.init_params(jax.random.PRNGKey(4))
    asset = _sphere_asset_device()

    ex_kw = dict(mc_resolution=256, decimate=100000, texture_size=1024,
                 batch_size=32768, pos_scale=1.0)

    def one_asset(tag, seed=2):
        r = {}
        t0 = time.perf_counter()
        image = prepare_image(png, matting="u2net", matter=matter)
        r["matting_s"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        y = encoder(jnp.asarray(image[None]))
        float(y.sum())  # sync through the tunnel
        r["encode_s"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        params = P.generate_primx(
            dit, vae, diffusion, dit_params, vae_params, y,
            jax.random.PRNGKey(seed), mean, std, cfg_scale=6.0)
        float(params.feat.sum())
        r["stage1_denoise_decode_s"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        tm = {}
        P.extract_glb(asset, f"/tmp/topiaxl_bench_{tag}",
                      timings_out=tm, **ex_kw)
        r["stage2_extract_s"] = round(time.perf_counter() - t0, 3)
        r["stage2_breakdown_s"] = tm
        r["total"] = round(r["matting_s"] + r["encode_s"]
                           + r["stage1_denoise_decode_s"]
                           + r["stage2_extract_s"], 2)
        return r

    one_asset("cold")
    # the 1-core bench host shows heavy hypervisor steal / IO-wait
    # spikes (observed 2026-08-18: identical host stages swinging
    # 0.15 s -> 2.2 s minute to minute), so the reported warm run is
    # the MEDIAN of three, with all totals recorded for transparency
    runs = [one_asset(f"warm{i}", seed=2 + i) for i in range(3)]
    rows = sorted(runs, key=lambda r: r["total"])[1]
    rows["e2e_runs_s"] = [r["total"] for r in runs]
    # per-run stage attribution so any outlier run names its cause
    # (r3's unexplained 6.43 s third run; suspect = host steal hitting
    # a specific stage) without re-running the bench
    rows["e2e_runs_stages_s"] = [
        {"matting": r["matting_s"], "encode": r["encode_s"],
         "stage1": r["stage1_denoise_decode_s"],
         "stage2": r["stage2_extract_s"],
         "stage2_host": round(sum(
             v for k, v in r["stage2_breakdown_s"].items()
             if k in ("isosurface", "clean_mesh", "decimate", "uv_unwrap",
                      "rasterize", "inpaint", "write_glb")), 3)}
        for r in runs]
    ctx = dict(prepare_image=prepare_image, png=png, matter=matter,
               encoder=encoder, P=P, dit=dit, vae=vae,
               diffusion=diffusion, dit_params=dit_params,
               vae_params=vae_params, mean=mean, std=std, asset=asset,
               ex_kw=ex_kw)
    return rows, ctx


def bench_pipelined_assets_per_min(ctx, n: int = 8) -> float:
    """assets/min with the serve_assets software pipeline (host
    extraction of asset i overlaps device denoise of asset i+1),
    including per-asset matting + encode like the serial chain. Reuses
    the e2e bench's already-compiled artifacts. Two extraction workers
    (matching serve_assets' default): asset i's host mesh stages run
    while asset i+1's stage-2 device dispatches wait in the queue.

    n=8 (r5, was 4): the metric is steady-state throughput, but the
    measured window carries one pipeline fill (first asset's denoise
    with no extraction to overlap) and one drain (last asset's ~1.5 s
    extraction tail with no denoise to hide it) — ~2 s of non-recurring
    edge cost that at n=4 depressed the reading by ~15%."""
    from concurrent.futures import ThreadPoolExecutor

    P = ctx["P"]
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = []
        for i in range(n):
            image = ctx["prepare_image"](ctx["png"], matting="u2net",
                                         matter=ctx["matter"])
            y = ctx["encoder"](jnp.asarray(image[None]))
            params = P.generate_primx(
                ctx["dit"], ctx["vae"], ctx["diffusion"],
                ctx["dit_params"], ctx["vae_params"], y,
                jax.random.PRNGKey(50 + i), ctx["mean"], ctx["std"],
                cfg_scale=6.0)
            float(params.feat.sum())
            futs.append(pool.submit(
                P.extract_glb, ctx["asset"], f"/tmp/topiaxl_pipe_{i}",
                **ctx["ex_kw"]))
        for f in futs:
            f.result()
    return 60.0 * n / (time.perf_counter() - t0)


def bench_dpm_gate(ctx) -> dict:
    """DPM-Solver++ quality gate (VERDICT r4 item 8): the README claim
    "12 dpm steps match 25-step DDIM quality" was previously backed only
    by synthetic rough-model tests; this measures it at flagship scale.
    The same conditioning + noise run through ddim25 (the shipped
    default), dpm12, and ddim200 (a quasi-converged reference for the
    same probability-flow ODE); fidelity is scored on the DECODED
    payloads — exactly what the texture bake samples (a baked texel is a
    convex prim-weight blend of payload texels, so payload PSNR bounds
    bake-texel PSNR) — which lets the gate run on the bench DiT without
    released weights. The claim holds iff dpm12 sits at least as close
    to the converged ODE solution as ddim25 does (within ~1 dB)."""
    from topiaxl.diffusion import create_diffusion

    P = ctx["P"]
    image = ctx["prepare_image"](ctx["png"], matting="u2net",
                                 matter=ctx["matter"])
    y = ctx["encoder"](jnp.asarray(image[None]))

    def run(spacing, sampler):
        diff = create_diffusion(
            timestep_respacing=spacing, noise_schedule="squaredcos_cap_v2",
            parameterization="v", diffusion_steps=1000)
        params = P.generate_primx(
            ctx["dit"], ctx["vae"], diff, ctx["dit_params"],
            ctx["vae_params"], y, jax.random.PRNGKey(7), ctx["mean"],
            ctx["std"], cfg_scale=6.0, sampler=sampler)
        # channel-major payload [N, 6, S^3]: ch 0 = SDF, 1:4 = albedo
        return np.asarray(params.feat).reshape(
            params.feat.shape[0], 6, -1)

    f_ddim25 = run("ddim25", "ddim")
    f_dpm12 = run("ddim12", "dpm")
    f_ref = run("ddim200", "ddim")

    def tex_psnr(a, b):
        ta = np.clip(a[:, 1:4], 0.0, 1.0)  # the bake clips albedo to [0,1]
        tb = np.clip(b[:, 1:4], 0.0, 1.0)
        mse = float(np.mean((ta - tb) ** 2))
        return 10.0 * np.log10(1.0 / max(mse, 1e-12))

    def sdf_p99(a, b):
        return float(np.percentile(np.abs(a[:, 0] - b[:, 0]), 99))

    return {
        "dpm_albedo_psnr_db": round(tex_psnr(f_dpm12, f_ddim25), 1),
        "dpm_geometry_p99_dev": round(sdf_p99(f_dpm12, f_ddim25), 5),
        "dpm12_vs_ode_psnr_db": round(tex_psnr(f_dpm12, f_ref), 1),
        "ddim25_vs_ode_psnr_db": round(tex_psnr(f_ddim25, f_ref), 1),
    }


def _require_tpu(timeout_s: float = 900.0) -> None:
    """Fail FAST and LOUD if the tunneled TPU is unreachable.

    Backend init through the tunnel sometimes hangs indefinitely during
    outages (observed 2026-08-17: >4 h of ``jax.devices()`` never
    returning). Probing in a daemon thread bounds the wait; on timeout
    or error one honest JSON line marks the outage (value 0 so the
    schema holds — the ``tpu_unreachable`` field is the signal) instead
    of the driver recording an empty tail."""
    import threading

    state = {}

    def probe():
        try:
            state["devices"] = jax.devices()
        except Exception as e:  # noqa: BLE001
            state["error"] = repr(e)[:200]

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if "devices" in state:
        return
    print(json.dumps({
        "metric": "dit_denoise_steps_per_sec", "value": 0.0,
        "unit": "steps/s", "vs_baseline": 0.0, "tpu_unreachable": True,
        "detail": state.get("error", f"device init hung > {timeout_s}s"),
    }), flush=True)
    os._exit(0)


def _read_slow_suite() -> dict:
    """Report the recorded `pytest -m slow` tier outcome (VERDICT r3
    item 7; r4 item 2). The tier is CPU-only and ~15 min, so it runs
    out-of-band via `python -m benchmarks.run_slow_suite` which persists
    runs_meta/slow_suite.json (a TRACKED path, so the record survives a
    fresh driver checkout); here it is embedded in the bench JSON,
    marked stale when the source tree moved past the SHA it was produced
    at, and unverifiable when that SHA no longer resolves or the record
    came from a dirty tree (ADVICE r4 #2)."""
    import subprocess

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "runs_meta", "slow_suite.json")
    if not os.path.exists(path):
        return {"slow_suite": "not run"}
    try:
        with open(path) as f:
            rec = json.load(f)
        root = os.path.dirname(os.path.abspath(__file__))
        out = {"slow_suite": rec.get("status", "unknown"),
               "slow_suite_passed": rec.get("passed"),
               "slow_suite_sha": rec.get("sha")}
        if not rec.get("sha"):
            out["slow_suite"] += " (no sha recorded)"
            return out
        if rec.get("dirty"):
            out["slow_suite"] += f" (unverifiable: dirty tree @{rec['sha']})"
            return out
        # stale only if SOURCE changed since the recorded run —
        # bookkeeping commits (runs/, docs, bench records) don't
        # invalidate a test-tier result
        diff = subprocess.run(
            ["git", "diff", "--name-only", f"{rec['sha']}..HEAD"],
            cwd=root, capture_output=True, text=True)
        if diff.returncode != 0:
            # recorded SHA unresolvable (rebase/GC/shallow clone): an
            # empty diff here would otherwise read as fresh 'pass'
            out["slow_suite"] += f" (unverifiable @{rec['sha']})"
            return out
        src = [p for p in diff.stdout.split()
               if not (p.startswith(("runs/", "runs_meta/", "docs/"))
                       or p.endswith((".md", ".json")))]
        if src:
            out["slow_suite"] = (f"{out['slow_suite']} "
                                 f"(stale @{rec['sha']})")
        return out
    except Exception as e:
        return {"slow_suite": f"error: {e!r}"[:120]}


def main():
    # Progressive output: the accumulated JSON line is (re)printed after
    # every section, so if the harness kills a long run mid-section the
    # LAST complete line still carries everything measured so far. The
    # full run is ~40 min through the tunnel (the train-step and int8
    # remote compiles dominate); sections are ordered headline-first.
    _require_tpu()
    steps_per_sec = bench_dit_steps()
    slow = _read_slow_suite()
    result = {
        "metric": "dit_denoise_steps_per_sec",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
        # self-updating MFU claim: 6.07 TFLOP per CFG'd step (docstring
        # accounting) against the chip's bf16 peak
        "mfu": round(steps_per_sec * STEP_TFLOPS / PEAK_BF16_TFLOPS, 3),
    }
    result.update(slow)
    print(json.dumps(result), flush=True)
    if os.environ.get("TOPIAXL_BENCH_FAST") != "1":
        try:
            rows, e2e_ctx = bench_e2e_seconds()
            total = rows.pop("total")
            result["image_to_glb_seconds"] = total
            result["image_to_glb_vs_target"] = round(E2E_TARGET_S / total, 3)
            result.update(rows)   # matting/encode/stage1/stage2 + breakdown
            # serial assets/min (BASELINE.md metric 3)
            result["assets_per_min_serial"] = round(60.0 / total, 2)
        except Exception as e:  # never lose the primary metric
            result["image_to_glb_error"] = repr(e)[:200]
            e2e_ctx = None
        try:
            result.update(bench_fidelity())
        except Exception as e:
            result["fidelity_error"] = repr(e)[:200]
        print(json.dumps(result), flush=True)
        if e2e_ctx is not None:
            try:
                result["assets_per_min_pipelined"] = round(
                    bench_pipelined_assets_per_min(e2e_ctx), 2)
            except Exception as e:
                result["pipelined_error"] = repr(e)[:200]
            try:
                # sampler-quality gate behind the README dpm claim
                # (VERDICT r4 item 8) — reuses the e2e ctx's compiled
                # ddim25 chain; adds one dpm12 + one ddim200 compile
                result.update(bench_dpm_gate(e2e_ctx))
            except Exception as e:
                result["dpm_gate_error"] = repr(e)[:200]
            print(json.dumps(result), flush=True)
        # the serving context (DiT/VAE params, compiled chains) and the
        # jit executable cache pin several GB of HBM; the bs-8 train row
        # needs nearly all 16 GB (its r3 run died RESOURCE_EXHAUSTED when
        # these stayed alive)
        e2e_ctx = None
        jax.clear_caches()
        try:
            import importlib

            result["flash_parity_on_tpu"] = importlib.import_module(
                "benchmarks.check_flash_tpu").run()
        except Exception as e:
            result["flash_parity_error"] = repr(e)[:200]
        print(json.dumps(result), flush=True)
        try:
            result["dit_denoise_steps_per_sec_int8"] = round(
                bench_dit_steps_int8(), 3)
        except Exception as e:
            result["int8_error"] = repr(e)[:200]
        print(json.dumps(result), flush=True)
        try:
            result["train_steps_per_sec"] = round(bench_train_steps(), 3)
        except Exception as e:
            result["train_error"] = repr(e)[:200]
        print(json.dumps(result), flush=True)
        try:
            # the reference recipe trains at bs 8/device
            # (reference configs/inference_dit.yml:77-95)
            result["train_steps_per_sec_bs8"] = round(
                bench_train_steps_bs8(), 3)
        except Exception as e:
            result["train_bs8_error"] = repr(e)[:200]
    print(json.dumps(result))
    # tracked latest-measurement record: the doc-number lint
    # (tests/test_doc_numbers.py) asserts every <!--bench:field--> claim
    # in README.md/docs/*.md against this file (VERDICT r4 item 3)
    try:
        import subprocess
        root = os.path.dirname(os.path.abspath(__file__))
        sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             cwd=root, capture_output=True,
                             text=True).stdout.strip()
        os.makedirs(os.path.join(root, "runs_meta"), exist_ok=True)
        with open(os.path.join(root, "runs_meta", "bench_latest.json"),
                  "w") as f:
            json.dump({"sha": sha, "result": result}, f, indent=1)
    except Exception as e:
        print(f"bench_latest write failed: {e!r}", file=sys.stderr)


def bench_dit_steps_int8() -> float:
    """W8A8 serving path (ops/int8.py): block matmuls on the int8 MXU.
    Measured +5% over bf16 (26.8 vs 25.5 steps/s on v5e) — parked as a
    knob; see docs/KERNELS.md serving roofline for why the ceiling is
    structural (attention + LN stay bf16, dynamic-quant VPU tax)."""
    import importlib

    mod = importlib.import_module("benchmarks.bench_int8_dit")
    return mod.run(True, "int8")


def bench_train_steps(batch: int = 2, steps: int = 5) -> float:
    """Flagship DiT train step (full-block remat, donated state,
    scan-over-blocks layout — same math as r1/r2's unrolled row but
    compile+1 drops 490 s -> ~14 s). Delegates to the tuning harness
    (benchmarks/tune_train_remat) so bench and sweep cannot drift."""
    import importlib

    mod = importlib.import_module("benchmarks.tune_train_remat")
    return mod.run(True, batch=batch, steps=steps, label="bench train",
                   scan_blocks=True)


def bench_train_steps_bs8(steps: int = 5) -> float:
    """Reference-recipe bs-8/device train step at the best measured
    config (benchmarks/exp_train_bs8 sweep): scan-over-blocks,
    'dots' remat, 4-way gradient accumulation."""
    import importlib

    mod = importlib.import_module("benchmarks.tune_train_remat")
    return mod.run("dots", batch=8, steps=steps, label="bench train bs8",
                   scan_blocks=True, grad_accum=4)


def bench_fidelity():
    """Texture/geometry fidelity of the extraction chain (BASELINE.md
    PSNR/geometry targets), measured against the PrimX field itself —
    the same methodology as tests/test_fidelity.py, at bench scale."""
    import tempfile

    import cv2
    import numpy as np

    from tests.test_fidelity import _psnr, _textured_sphere
    from topiaxl.extract.glb import read_glb
    from topiaxl.extract.rasterize import rasterize_uv_atlas
    from topiaxl.models import primx as primx_lib
    from topiaxl.pipelines import infer as P

    params = _textured_sphere()
    tex_size = 512
    with tempfile.TemporaryDirectory() as td:
        glb = P.extract_glb(params, td, mc_resolution=128, decimate=60000,
                            texture_size=tex_size, batch_size=32768,
                            pos_scale=1.0)
        gltf, blob = read_glb(glb)
        prim = gltf["meshes"][0]["primitives"][0]

        def load(name, dtype, ncomp):
            acc = gltf["accessors"][name]
            view = gltf["bufferViews"][acc["bufferView"]]
            return np.frombuffer(blob, dtype, acc["count"] * ncomp,
                                 view.get("byteOffset", 0)).reshape(-1, ncomp)

        verts = load(prim["attributes"]["POSITION"], np.float32, 3)
        uv = load(prim["attributes"]["TEXCOORD_0"], np.float32, 2)
        faces = load(prim["indices"], np.uint32, 1).reshape(-1, 3)
        xyz_map, mask = rasterize_uv_atlas(uv[faces], verts[faces],
                                           tex_size, tex_size)
        tex = cv2.imread(os.path.join(td, "texture.jpg"))[..., ::-1] / 255.0

    dev = np.abs(np.linalg.norm(verts, axis=1) - 0.55)
    ys, xs = np.nonzero(mask)
    sub = slice(0, len(ys), max(len(ys) // 8192, 1))
    pts = jnp.asarray(xyz_map[ys[sub], xs[sub]], jnp.float32)
    out = primx_lib.query(params, pts, top_k=32, with_fallback=False,
                          outputs=("tex",))
    result = {
        "albedo_psnr_db": round(_psnr(tex[ys[sub], xs[sub]],
                                      np.asarray(out["tex"])), 1),
        "geometry_p99_dev": round(float(np.percentile(dev, 99)), 5),
    }
    try:
        # cross-IMPLEMENTATION fidelity: the same baked texels scored
        # against the REFERENCE's own PrimSDF field (torch CPU,
        # /root/reference/models/primsdf.py:52-102) — albedo_psnr_db
        # above is topiaxl vs topiaxl's own field (VERDICT r2 item 4)
        import sys

        import torch

        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tests"))
        import reference_runtime as rr

        ref = rr.load()
        prim = ref.primsdf.PrimSDF(num_prims=params.srt.shape[0],
                                   dim_feat=6, prim_shape=8)
        with torch.no_grad():
            prim.srt_param.copy_(torch.from_numpy(np.asarray(params.srt)))
            prim.feat_param.copy_(
                torch.from_numpy(np.asarray(params.feat)))
        prim.eval()
        with torch.no_grad():
            preds = prim(torch.from_numpy(np.asarray(pts)))
        result["albedo_psnr_vs_reference_db"] = round(
            _psnr(tex[ys[sub], xs[sub]], preds["tex"].numpy()), 1)
    except Exception as e:
        result["reference_psnr_error"] = repr(e)[:120]
    # UV atlas quality on the same extracted mesh (VERDICT r1 item 7):
    # geometric stretch (Sander et al. 2001; 1.0 == isometric) for the
    # fast box path vs the quality LSCM path (the xatlas "Better" slot)
    from topiaxl.extract import quality_uv_unwrap
    from topiaxl.extract.meshproc import _weld_vertices
    from topiaxl.extract.uv_unwrap import (
        box_projection_uv_unwrap, compute_vertex_normal, uv_metrics,
    )

    # the GLB writer splits vertices at UV seams (per-vertex TEXCOORD),
    # so the read-back mesh inherits the FIRST unwrap's seams as fake
    # component boundaries (measured: 178 components / 191 charts on a
    # genuinely 1-component surface). Weld by position first so the
    # metric scores the unwrap itself — the same welded connectivity
    # extract_glb's internal unwrap call sees.
    verts_w, f64 = _weld_vertices(verts.astype(np.float64),
                                  faces.astype(np.int64))
    vn = compute_vertex_normal(verts_w, f64)
    verts = verts_w
    mb = uv_metrics(verts, f64, *box_projection_uv_unwrap(verts, vn, f64))
    mq = uv_metrics(verts, f64, *quality_uv_unwrap(verts, vn, f64))
    result.update({
        "uv_stretch_l2_box": round(mb["stretch_l2"], 4),
        "uv_stretch_l2_lscm": round(mq["stretch_l2"], 4),
        "uv_stretch_linf_box": round(mb["stretch_linf"], 3),
        "uv_stretch_linf_lscm": round(mq["stretch_linf"], 3),
        "uv_coverage_box": round(mb["coverage"], 3),
        "uv_coverage_lscm": round(mq["coverage"], 3),
        "uv_charts_box": mb["charts"],
        "uv_charts_lscm": mq["charts"],
    })
    return result


if __name__ == "__main__":
    main()
