"""R3 scratch: ALL stage-2 modes via 21.4 MB shared 16-corner tables.

If the scoped-vmem flag pins one 21.4 MB table (see _r3_y16v.py), it
may pin three (64 MB + staging under a 96-128 MB limit): s and d give
up their rotation-fold (1 gather/4 rot from 770 MB HBM at 7.15 ns/row)
for 4 quad gathers each from VMEM (~1.3 ns/row).  Estimated from the
r3 cost model: gathers -60 ms, copies/contraction +20 -> net -40 ms
IF pinning holds at 3 tables.  Run with
  MULUT_SCOPED_VMEM_KIB=98304 python _r3_sd16.py
(xla_tpu_* flags go through jax.jit(compiler_options=...), NOT
XLA_FLAGS — client flag parse aborts on unknown flags.)

The final stage's s/d quad path needs lane UN-rotation perms exactly
like y (the shared table is un-permuted); the tail kernel already does
that for quad modes.

Usage: _r3_sd16.py [--cpu] [--trace]
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import mulut_tpu.ops.ensemble as ens
import mulut_tpu.ops.tail_kernel as tk
from mulut_tpu.ops import simplex_tables
from mulut_tpu.ops.ensemble import prepare_expanded_luts_cached
from mulut_tpu.ops.taps import fold_geometry, lane_rotation_perm
from mulut_tpu.utils.profiling import device_time, device_timeline, op_breakdown


def cascade_all_quad(tabs, img, *, stages, modes, scale, interval,
                     interpret=False):
    """lut_cascade_packed with EVERY final-stage mode on the quad path
    (stage 1 unchanged — its folded v=1 tables are already VMEM-fast)."""
    q = 2 ** interval
    x = img.astype(jnp.int32)
    for s in range(stages - 1):
        acc = None
        for mode in modes:
            lut = tabs[f"s{s + 1}_{mode}"]
            if fold_geometry(mode) is not None:
                out = ens.rotation_ensemble_lanes_folded_int(
                    lut, x, mode=mode, upscale=1, interval=interval)
            else:
                out = ens.rotation_ensemble_lanes_quad_int(
                    lut, x, mode=mode, upscale=1, interval=interval)
            acc = out if acc is None else acc + out
        mixed = ens.stage_mix(acc, q=q, avg_factor=len(modes) * 4, bias=127)
        x = mixed[..., 0]
    v = scale * scale
    quads = []
    for mode in modes:
        lut = tabs[f"s{stages}_{mode}"]
        outs, wy = tk.quad_flat(lut, x, mode=mode, v=v, interval=interval)
        perms = [lane_rotation_perm(scale, r) for r in range(4)]
        quads.append((outs, wy, perms))
    return tk.tail_assemble(
        [], quads, lead=x.shape[:-2], h=x.shape[-2], w=x.shape[-1],
        scale=scale, davg=q * len(modes), interpret=interpret)


def main():
    scale, stages, modes, interval = 4, 2, "sdy", 4
    H, W, B = (270, 480, 8) if "--cpu" not in sys.argv else (24, 32, 1)

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
    interp = "--cpu" in sys.argv

    from mulut_tpu.utils.xla_opts import tpu_compiler_options

    copts = tpu_compiler_options()
    print(f"compiler_options: {copts}", flush=True)
    run = jax.jit(functools.partial(
        tk.lut_cascade_packed, stages=stages, modes=modes,
        scale=scale, interval=interval, interpret=interp))
    tabs_d = jax.device_put(tabs)
    base = np.asarray(run(tabs_d, img))
    del tabs_d

    tabs16 = dict(tabs)
    for m in modes:
        tabs16[f"s2_{m}"] = simplex_tables.expand_lut(
            luts[f"s2_{m}"], interval).reshape(luts[f"s2_{m}"].shape[0], -1)
    print("s2 tables:",
          {f"s2_{m}": f"{tabs16[f's2_{m}'].nbytes/1e6:.1f} MB"
           for m in modes}, flush=True)

    run2 = jax.jit(functools.partial(
        cascade_all_quad, stages=stages, modes=modes,
        scale=scale, interval=interval, interpret=interp),
        compiler_options=copts)
    tabs16_d = jax.device_put(tabs16)
    t0 = time.time()
    out = np.asarray(run2(tabs16_d, img))
    # compare the VALID unpacked image: the packed junk columns beyond
    # w*scale legitimately differ between the folded and quad paths
    a = tk.unpack_u32(base, (B, 3), H, W, scale)
    b = tk.unpack_u32(out, (B, 3), H, W, scale)
    print(f"[sd16] compile+run {time.time()-t0:.0f}s "
          f"{'MATCH' if np.array_equal(a, b) else 'MISMATCH'}",
          flush=True)
    if "--cpu" in sys.argv:
        return
    dt = device_time(lambda: run2(tabs16_d, img), n=3)
    print(f"[sd16] {dt*1e3:.1f} ms/batch = "
          f"{B*H*W*16/1e6/dt:.1f} MPix/s", flush=True)
    if "--trace" in sys.argv:
        tr = "/tmp/r3_sd16_trace"
        jax.profiler.start_trace(tr)
        for _ in range(3):
            o = run2(tabs16_d, img)
        np.asarray(o[:1, 0, :4])
        jax.profiler.stop_trace()
        rows = op_breakdown(tr, top=10000)
        tot = sum(ms for ms, _, _ in rows)
        print(f"traced {tot/3:.1f} ms/run over {len(rows)} ops")
        for ms, name, long_name in rows[:25]:
            print(f"{ms/3:8.2f} ms  {name}  | {long_name[:120]}")
        tl = device_timeline(tr, top_gaps=5)
        print(f"timeline: span {tl['span_ms']/3:.1f} "
              f"busy {tl['busy_ms']/3:.1f} idle {tl['idle_ms']/3:.1f}")


if __name__ == "__main__":
    main()
