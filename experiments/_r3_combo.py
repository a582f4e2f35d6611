"""R3 scratch: compose the LUT-path levers and time any combination.

Flags (combine freely):
  --y16     s2_y as the 21.4 MB 16-corner shared table (pin with
            MULUT_SCOPED_VMEM_KIB=65536 — goes through
            jax.jit(compiler_options=...), NOT XLA_FLAGS)
  --sd16    s2_s and s2_d ALSO as 16-corner shared tables (all-quad
            stage 2; combine with --y16 and a ~98304 KiB budget)
  --ysplit  s2_y as two 10.7 MB v-split half tables (default-budget pin)
  --s1y8    stage-1 non-symmetric tables s8 instead of s32
  --merge   4 s2-y gathers as one 13.3M-row gather (rank format only)
  --b N     batch size (default 8)
  --cpu     interpret-mode parity check only
  --trace   per-op breakdown + timeline after timing

Always checks bit-parity vs the stock rank path first.
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import mulut_tpu.ops.tail_kernel as tk
from mulut_tpu.ops import simplex_tables
from mulut_tpu.ops.ensemble import prepare_expanded_luts_cached
from mulut_tpu.utils.profiling import device_time, device_timeline, op_breakdown


def arg(flag):
    return flag in sys.argv


def main():
    scale, stages, modes, interval = 4, 2, "sdy", 4
    B = int(sys.argv[sys.argv.index("--b") + 1]) if arg("--b") else 8
    H, W = (270, 480) if not arg("--cpu") else (24, 32)
    if arg("--cpu"):
        B = 1
    interp = arg("--cpu")

    rng = np.random.default_rng(0)
    luts = {}
    for s in range(stages):
        v = scale * scale if s + 1 == stages else 1
        for m in modes:
            luts[f"s{s + 1}_{m}"] = np.load(
                "/root/reference/models/sr_x2sdy/"
                f"LUT_ft_x{scale}_{interval}bit_int8_s{s + 1}_{m}.npy"
            ).reshape(-1, v).astype(np.int8)
    tabs = prepare_expanded_luts_cached(luts, interval=interval,
                                        shared_quad=True)
    img = jnp.asarray(
        rng.integers(0, 256, (B, 3, H, W), dtype=np.int64), jnp.int32)

    run = jax.jit(functools.partial(
        tk.lut_cascade_packed, stages=stages, modes=modes,
        scale=scale, interval=interval, interpret=interp))
    tabs_d = jax.device_put(tabs)
    base = np.asarray(run(tabs_d, img))
    del tabs_d

    label = []
    tabs_x = dict(tabs)
    if arg("--y16"):
        tabs_x["s2_y"] = simplex_tables.expand_lut(
            luts["s2_y"], interval).reshape(luts["s2_y"].shape[0], -1)
        label.append("y16")
    if arg("--sd16"):
        for m in "sd":
            tabs_x[f"s2_{m}"] = simplex_tables.expand_lut(
                luts[f"s2_{m}"], interval
            ).reshape(luts[f"s2_{m}"].shape[0], -1)
        label.append("sd16")
    if arg("--ysplit"):
        e = simplex_tables.expand_lut(luts["s2_y"], interval)
        tabs_x["s2_y"] = np.stack([
            np.ascontiguousarray(e[:, :, :8].reshape(e.shape[0], -1)),
            np.ascontiguousarray(e[:, :, 8:].reshape(e.shape[0], -1)),
        ])
        label.append("ysplit")
    if arg("--s1y8"):
        for k, a in list(tabs_x.items()):
            if isinstance(a, np.ndarray) and a.dtype == np.int32:
                tabs_x[k] = a.astype(np.int8)
        label.append("s1y8")

    orig = tk.quad_flat
    if arg("--ysplit"):
        from _r3_ysplit import quad_flat_split
        tk.quad_flat = quad_flat_split
    elif arg("--merge"):
        from _r3_merge import quad_flat_merged

        def quad(lut, img_, **kw):
            if lut.ndim == 2 and lut.shape[-1] // kw["v"] == 5:
                return quad_flat_merged(lut, img_, **kw)
            return orig(lut, img_, **kw)

        tk.quad_flat = quad
        label.append("merge")
    name = "+".join(label) or "stock"
    from mulut_tpu.utils.xla_opts import tpu_compiler_options

    copts = tpu_compiler_options()
    if copts:
        print(f"compiler_options: {copts}", flush=True)
        name += "+vmem"
    try:
        run2 = jax.jit(functools.partial(
            tk.lut_cascade_packed, stages=stages, modes=modes,
            scale=scale, interval=interval, interpret=interp),
            compiler_options=copts)
        tabs_x_d = jax.device_put(tabs_x)
        t0 = time.time()
        out = np.asarray(run2(tabs_x_d, img))
        # compare the VALID unpacked image: packed junk columns beyond
        # w*scale legitimately differ between the folded and quad paths
        ok = np.array_equal(
            tk.unpack_u32(out, (B, 3), H, W, scale),
            tk.unpack_u32(base, (B, 3), H, W, scale))
        print(f"[{name}] compile+run {time.time()-t0:.0f}s "
              f"{'MATCH' if ok else 'MISMATCH'}", flush=True)
        if arg("--cpu"):
            return
        dt = device_time(lambda: run2(tabs_x_d, img), n=3)
        print(f"[{name}] B={B} {dt*1e3:.1f} ms/batch = "
              f"{B*H*W*16/1e6/dt:.1f} MPix/s", flush=True)
        if arg("--trace"):
            tr = f"/tmp/r3_combo_trace"
            jax.profiler.start_trace(tr)
            for _ in range(3):
                o = run2(tabs_x_d, img)
            np.asarray(o[:1, 0, :4])
            jax.profiler.stop_trace()
            rows = op_breakdown(tr, top=10000)
            tot = sum(ms for ms, _, _ in rows)
            print(f"traced {tot/3:.1f} ms/run over {len(rows)} ops")
            for ms, nm, ln in rows[:25]:
                print(f"{ms/3:8.2f} ms  {nm}  | {ln[:120]}")
            tl = device_timeline(tr, top_gaps=5)
            print(f"timeline: span {tl['span_ms']/3:.1f} "
                  f"busy {tl['busy_ms']/3:.1f} idle {tl['idle_ms']/3:.1f}")
    finally:
        tk.quad_flat = orig


if __name__ == "__main__":
    main()
