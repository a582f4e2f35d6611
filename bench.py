"""Headline benchmark: LUT-retrieval throughput of the full MuLUT cascade.

Measures the deployment path — 2-stage x sdy x 4-rotation integer LUT
cascade with exact reference rounding (ref: sr/4_test_lut.py:263-306), via
the corner-expanded int8 gather engine — on the default JAX device,
upscaling a 480x270 RGB batch to 1920x1080 (x4).

On TPU the bench AUTOTUNES over the framework's bit-exact engine configs
(stock rank tables; VMEM-stageable 16-corner stage-2 table forms; the
128-lane stage-1 kernel layout — see prepare_expanded_luts
corner16_modes / fold16_modes / k128_stage1 / int8_stage1) and reports
the fastest — every candidate's unpacked output is verified against the
stock engine before it may win (device-fingerprint checksums by
default; MULUT_BENCH_PARITY=full for a full byte readback — byte-level
parity of the default config is separately pinned by the CI golden
tests).  The autotune is
time-budgeted (MULUT_BENCH_BUDGET_S, default 420 s): the measured-best
config runs first, later candidates are skipped once the costliest
completed candidate would not fit in the remaining budget, and a valid
best-so-far line is always emitted (cold-start safety under external
~10-min runner timeouts).  Setting
MULUT_CORNER16, MULUT_FOLD16, MULUT_K128, MULUT_S1_INT8 and/or
MULUT_SCOPED_VMEM_KIB pins ONE explicit config (A/B mode, used by the
experiment scripts); MULUT_BENCH_AUTOTUNE=0 forces the stock config.

Timing method: marginal wall-clock between n and 2n executions with a
device-to-host sync after each group (plain block_until_ready under-reports
through remote-device tunnels).

Prints ONE JSON line:
  {"metric": "lut_retrieval_throughput", "value": <output MPix/s>,
   "unit": "MPix/s", "vs_baseline": <ratio vs reference engine>}

Baseline: the reference NumPy engine (FourSimplexInterpFaster, single
process) measured on this machine at 0.0298 output-MPix/s per process
(69.7 s per 480x270 -> 1080p image); the reference fans out over a
Pool of 24 workers (ref: sr/4_test_lut.py:257-259), giving ~0.714 MPix/s
aggregate — that aggregate is the vs_baseline denominator.
"""

import functools
import json
import os
import sys
import time

import numpy as np


def _load_luts(stages, modes, scale, interval, rng):
    """Shipped fine-tuned LUTs when the reference is mounted; random
    tables otherwise (same shapes/dtypes — throughput is
    content-independent)."""
    L = 2 ** (8 - interval) + 1
    luts = {}
    for s in range(stages):
        v = scale * scale if s + 1 == stages else 1
        for m in modes:
            try:
                arr = np.load(
                    "/root/reference/models/sr_x2sdy/"
                    f"LUT_ft_x{scale}_{interval}bit_int8_s{s + 1}_{m}.npy"
                ).reshape(-1, v)
            except OSError:
                arr = rng.integers(-127, 128, (L ** 4, v), dtype=np.int64)
            luts[f"s{s + 1}_{m}"] = arr.astype(np.int8)
    return luts


def main():
    import jax
    import jax.numpy as jnp

    from mulut_tpu.ops import tail_kernel as tk
    from mulut_tpu.ops.ensemble import (
        lut_cascade_int,
        prepare_expanded_luts_auto,
    )
    from mulut_tpu.utils.xla_opts import (
        enable_compilation_cache,
        tpu_compiler_options,
    )

    # Persistent compile cache: the 3-candidate autotune costs ~8-10 min
    # of XLA compilation in a cold process (measured through the axon
    # tunnel); with the cache warm a repeat run skips straight to timing.
    enable_compilation_cache()

    scale, stages, modes, interval = 4, 2, "sdy", 4
    H, W, B = 270, 480, 8
    # Hidden test hooks: interpret-mode Pallas + tiny shapes let the full
    # autotune path run (slowly) on CPU in CI; the driver never sets these.
    interp = os.environ.get("MULUT_BENCH_INTERPRET", "") == "1"
    if os.environ.get("MULUT_BENCH_SHAPE"):
        H, W, B = (int(t) for t in
                   os.environ["MULUT_BENCH_SHAPE"].split("x"))

    rng = np.random.default_rng(0)
    luts = _load_luts(stages, modes, scale, interval, rng)
    # Production engine selection mirrors pipelines.evaluate.LutEvaluator:
    # the Pallas tail-assembly kernel (ops.tail_kernel) on TPU, the pure
    # XLA cascade elsewhere — both bit-identical to the reference engine.
    use_kernel = tk.supports_tail_kernel(
        modes, scale, interval=interval, interpret=interp)

    img = jnp.asarray(
        rng.integers(0, 256, (B, 3, H, W), dtype=np.int64), jnp.int32
    )

    # Candidate engine configs:
    # (label, corner16_modes, fold16_modes, scoped_vmem_kib).
    # corner16 trades the s2 rotation-fold of non-symmetric modes for
    # gathers from a shared 21.4 MB 16-corner table; fold16 keeps the
    # symmetric modes' rotation fold but drops the 24x rank expansion
    # (85.5 MB tables).  Both small-table forms get VMEM-staged by XLA
    # (no scoped-vmem flag needed — the r3 sweep measured the default
    # budget fastest) and lean on the group-fold Pallas contraction
    # kernel.  Every candidate is bit-exact vs the stock engine.
    env_c16 = os.environ.get("MULUT_CORNER16")
    env_f16 = os.environ.get("MULUT_FOLD16")
    env_k1 = os.environ.get("MULUT_K128")
    env_s18 = os.environ.get("MULUT_S1_INT8")
    env_vmem = os.environ.get("MULUT_SCOPED_VMEM_KIB")
    autotune = (use_kernel and env_c16 is None and env_f16 is None
                and env_k1 is None and env_s18 is None and env_vmem is None
                and os.environ.get("MULUT_BENCH_AUTOTUNE", "1") != "0")
    # Candidate tuples: (label, corner16_modes, fold16_modes,
    # k128_stage1, int8_stage1, scoped_vmem_kib).  k128_stage1 re-lays
    # the listed INNER-stage modes' v == 1 tables as (L**4, 128) int8
    # for the group-fold kernel (deletes the stage-1 XLA contraction
    # glue; the y variant measured slower and stays on the s32 XLA
    # path).  int8_stage1 keeps the listed non-symmetric inner-stage
    # quad tables int8 (4x smaller gathered buffers -> smaller layout
    # copies; measured -2.6 ms at the bench shape on v5e).
    if not use_kernel:
        cands = [("xla", "", "", "", "", None)]
    elif autotune:
        # Order matters for cold starts: the measured v5e winner (which
        # is also LutEvaluator's default config, golden-image-pinned in
        # CI) runs FIRST so that a time-budgeted run always emits a
        # valid best-so-far line; "stock" second doubles as the parity
        # oracle for every candidate that got measured before the
        # budget ran out.
        cands = [
            ("y16+f16sd+k1sd+s1y8", "y", "sd", "sd", "y", None),
            ("stock", "", "", "", "", None),
            ("y16+f16sd+k1sd", "y", "sd", "sd", "", None),
        ]
    else:
        # Explicit A/B config from the environment (or autotune disabled):
        # tpu_compiler_options() picks up MULUT_SCOPED_VMEM_KIB itself.
        cands = [("env", env_c16 or "", env_f16 or "", env_k1 or "",
                  env_s18 or "", None)]

    def sync(out):
        # tiny device-to-host slice: forces a full drain without paying
        # a 200 MB output transfer through a remote-device tunnel
        np.asarray(out[:1, :1, 0, :4] if out.ndim == 4 else out[:1, 0, :4])

    # Candidate parity check.  Default: a device-side fingerprint of the
    # unpacked VALID image — per-row (sum, two coprime-weighted sums with
    # moduli 251/241) in int32 (row sums bounded by 255*255*1920 < 2^31).
    # A full byte readback of the ~50 MB packed output costs MINUTES when
    # the remote-device tunnel is bandwidth-degraded (measured: one warm
    # candidate took 472 s end-to-end, almost all of it the parity D2H),
    # which is exactly the cold-start budget this bench must fit.  Two
    # independent weight vectors make structured-collision escape need
    # columns 251*241 apart (> any W here); byte-level parity of the
    # DEFAULT config remains pinned by tests/test_golden_images.py, and
    # MULUT_BENCH_PARITY=full restores the full readback.
    parity_full = os.environ.get("MULUT_BENCH_PARITY", "fp") == "full"

    def make_fingerprint():
        import jax.numpy as jnp

        wout = W * scale
        w1 = jnp.asarray((np.arange(wout) % 251) + 1, jnp.int32)
        w2 = jnp.asarray((np.arange(wout) % 241) + 1, jnp.int32)

        @jax.jit
        def fp(packed):
            u = tk.unpack_u32_device(packed, (B, 3), H, W, scale)
            o = u.astype(jnp.int32)
            return jnp.stack([
                jnp.sum(o, axis=-1),
                jnp.sum(o * w1, axis=-1),
                jnp.sum(o * w2, axis=-1),
            ])

        return lambda packed: np.asarray(fp(packed))

    fingerprint = make_fingerprint() if (use_kernel and not parity_full) \
        else None

    def wall(run, eluts, k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = run(eluts, img)
        sync(out)  # device-to-host forces full drain
        return time.perf_counter() - t0

    n = int(os.environ.get("MULUT_BENCH_N", "4"))
    # Wall budget for the WHOLE bench (external runners enforce ~10 min;
    # a fully cold start spends minutes per candidate in table build +
    # XLA compile).  Candidates after the first are skipped when the
    # costliest completed candidate would not fit in the remaining
    # budget — a valid best-so-far line is always emitted.
    t_start = time.perf_counter()
    budget_s = float(os.environ.get("MULUT_BENCH_BUDGET_S", "420"))
    results = []  # (dt, label, unpacked_output_or_None)
    golden = None  # stock unpacked output, parity oracle for candidates
    cand_cost = 0.0  # costliest completed candidate (compile+verify+time)
    for label, c16, f16, k1, s18, kib in cands:
        elapsed = time.perf_counter() - t_start
        if results and elapsed + 1.1 * cand_cost > budget_s:
            print(
                f"[budget] {elapsed:.0f}s elapsed, est. next candidate "
                f"{cand_cost:.0f}s > budget {budget_s:.0f}s — emitting "
                "best-so-far",
                file=sys.stderr,
            )
            break
        t_cand = time.perf_counter()
        try:
            # On TPU the tables are built ON DEVICE from the ~4 MB source
            # LUTs (prepare_expanded_luts_auto) — the 200+ MB pre-built
            # upload was the dominant cold-start cost through a degraded
            # tunnel (~5 min measured).
            eluts = prepare_expanded_luts_auto(
                luts, interval=interval, shared_quad=use_kernel,
                corner16_modes=c16 if use_kernel else "",
                fold16_modes=f16 if use_kernel else "",
                k128_stage1=k1 if use_kernel else "",
                int8_stage1=s18 if use_kernel else "",
            )
            copts = tpu_compiler_options(scoped_vmem_kib=kib)
            if use_kernel:
                run = jax.jit(functools.partial(
                    tk.lut_cascade_packed, stages=stages, modes=modes,
                    scale=scale, interval=interval, interpret=interp,
                ), compiler_options=copts)
            else:
                @functools.partial(jax.jit, compiler_options=copts)
                def run(tabs, x):
                    return lut_cascade_int(
                        tabs, x, stages=stages, modes=modes, scale=scale,
                        interval=interval, expanded=True,
                    )

            # Tables ride as jit ARGUMENTS (device buffers), not closure
            # constants — baked-in constants of this size blow
            # remote-compile request limits.
            eluts = jax.device_put(eluts)
            out0 = run(eluts, img)  # compile + warm
            u = None
            if autotune:
                # a candidate may only win if its VALID unpacked image
                # matches the stock engine's (packed junk columns beyond
                # w*scale legitimately differ) — by device fingerprint
                # (default; see above) or full byte readback
                # (MULUT_BENCH_PARITY=full).  Parity is checked AFTER
                # the loop (stock no longer runs first); candidates
                # measured before a budget cutoff that skips stock fall
                # back to the CI golden-image pin (the first-listed
                # config IS LutEvaluator's default).
                if fingerprint is not None:
                    u = fingerprint(out0)
                else:
                    u = tk.unpack_u32(np.asarray(out0), (B, 3), H, W, scale)
                if label == "stock":
                    golden = u
            else:
                sync(out0)
            # Marginal between the fastest n-group and the fastest
            # 2n-group.  The axon tunnel intermittently adds a ~3.4 s
            # stall to one timing group (measured 2026-08-18); a stall
            # can only INFLATE a group wall, so min() per group is a
            # robust lower bound for each — whereas min-of-marginals
            # (the previous estimator) lets a stall in an n-group
            # DEFLATE its marginal and then wins the min, over-reporting
            # throughput (and under contention even went negative in
            # CI).  Retry on a non-positive difference; the absolute
            # per-run wall is the conservative last resort (it can only
            # under-report throughput by the one sync cost it carries).
            dt = 0.0
            for _ in range(3):
                w1 = min(wall(run, eluts, n) for _ in range(2))
                w2 = min(wall(run, eluts, 2 * n) for _ in range(2))
                dt = (w2 - w1) / n
                if dt > 0:
                    break
            else:
                dt = wall(run, eluts, n) / n
            print(f"[{label}] {dt * 1e3:.1f} ms/batch", file=sys.stderr)
            results.append((dt, label, u))
            cand_cost = max(cand_cost, time.perf_counter() - t_cand)
        except Exception as e:  # noqa: BLE001 — a failed candidate (e.g.
            # scoped-VMEM budget the compiler rejects) must not kill the
            # bench; the stock config always remains.
            print(f"[{label}] failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
        finally:
            eluts = None  # free device tables before the next candidate

    if golden is not None:
        kept = []
        for dt, label, u in results:
            if u is not None and not np.array_equal(u, golden):
                print(f"[{label}] OUTPUT MISMATCH vs stock — dropped",
                      file=sys.stderr)
                continue
            kept.append((dt, label, u))
        results = kept
    elif autotune and results:
        # Without the stock oracle only the FIRST-listed config carries
        # any parity evidence (it is LutEvaluator's default, pinned by
        # the CI golden-image test) — an unverified non-default candidate
        # must not win on speed alone (r4 advisor finding).
        first_label = cands[0][0]
        kept = [r for r in results if r[1] == first_label]
        if kept:
            results = kept
            print(
                "[parity] stock did not run within budget; winner "
                f"restricted to the CI-pinned '{first_label}' config",
                file=sys.stderr,
            )
        else:
            print(
                "[parity] stock did not run within budget and the "
                "CI-pinned config has no measurement; emitting fastest "
                "UNVERIFIED candidate",
                file=sys.stderr,
            )
    if not results:
        raise SystemExit("no bench candidate succeeded")
    dt, label, _ = min(results, key=lambda r: r[0])

    out_mpix = B * H * W * scale * scale / 1e6
    value = out_mpix / dt

    ref_single = 0.0298  # measured on this host, see module docstring
    baseline = ref_single * 24  # Pool(24) aggregate

    print(
        f"device={jax.devices()[0].platform} batch={B} {W}x{H}->x{scale} "
        f"{dt * 1e3:.1f} ms/batch config={label}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "lut_retrieval_throughput",
                "value": round(value, 3),
                "unit": "MPix/s",
                "vs_baseline": round(value / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
