"""R3 scratch: VMEM-pin the stage-2 y table via 16-corner rows + scoped-vmem.

The r3 cost model (full 1234-op trace, /tmp/r3_vn_trace_vn) shows the
device 100% busy; the top cost is the 4x stage-2 y gathers: 77 ms at
5.78 ns/row from the 160 MB shared RANK table in HBM.  The stage-1 y
gathers run at 1.3 ns/row because XLA stages that 5.3 MB table into
VMEM (S(1)).  The 16-corner shared y table is only 21.4 MB
(83521 x 256 s8) — just over the default scoped-VMEM budget; with
xla_tpu_scoped_vmem_limit_kib raised it may pin, turning 77 ms into
~17-22 ms.  The earlier "y16 slower in-context" negative result was
measured WITHOUT the flag (table stayed in HBM and the wider
contraction swamped the faster gather); the contraction swamp
(s8->f32 materialization, 4.3 GB) is expected to cost ~+10-15 ms —
a net ~-40 ms if pinning works.

xla_tpu_* are libtpu flags: they CANNOT go in XLA_FLAGS (fatal
"Unknown flag" at client parse).  Set MULUT_SCOPED_VMEM_KIB and the
script passes them per-executable via jax.jit(compiler_options=...).

Run with e.g.:
  MULUT_SCOPED_VMEM_KIB=65536 python _r3_y16v.py
Usage: _r3_y16v.py [--cpu] [--trace] [--rank-only (skip y16, flag A/B
                    of the current rank config)]
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
        scale=scale, interval=interval, interpret=interp),
        compiler_options=copts)

    tabs_d = jax.device_put(tabs)
    t0 = time.time()
    base = np.asarray(run(tabs_d, img))
    print(f"[rank] compile+run {time.time()-t0:.0f}s", flush=True)
    if "--cpu" not in sys.argv:
        dt = device_time(lambda: run(tabs_d, img), n=3)
        print(f"[rank] {dt*1e3:.1f} ms/batch = "
              f"{B*H*W*16/1e6/dt:.1f} MPix/s", flush=True)
    if "--rank-only" in sys.argv:
        return
    del tabs_d

    # 16-corner SHARED (un-permuted) stage-2 y table: 83521 x 256 s8
    tabs16 = dict(tabs)
    tabs16["s2_y"] = simplex_tables.expand_lut(
        luts["s2_y"], interval).reshape(83521 if interval == 4 else -1, -1)
    print(f"y16 table: {tabs16['s2_y'].shape} "
          f"{tabs16['s2_y'].nbytes/1e6:.1f} MB", flush=True)
    tabs16_d = jax.device_put(tabs16)
    t0 = time.time()
    out = np.asarray(run(tabs16_d, img))
    print(f"[y16] compile+run {time.time()-t0:.0f}s "
          f"{'MATCH' if np.array_equal(out, base) else 'MISMATCH'}",
          flush=True)
    if "--cpu" in sys.argv:
        return
    dt = device_time(lambda: run(tabs16_d, img), n=3)
    print(f"[y16] {dt*1e3:.1f} ms/batch = "
          f"{B*H*W*16/1e6/dt:.1f} MPix/s", flush=True)
    if "--trace" in sys.argv:
        tr = "/tmp/r3_y16v_trace"
        jax.profiler.start_trace(tr)
        for _ in range(3):
            o = run(tabs16_d, img)
        np.asarray(o[:1, 0, :4])
        jax.profiler.stop_trace()
        rows = op_breakdown(tr, top=10000)
        tot = sum(ms for ms, _, _ in rows)
        print(f"traced {tot/3:.1f} ms/run over {len(rows)} ops")
        for ms, name, long_name in rows[:25]:
            print(f"{ms/3:8.2f} ms  {name}  | {long_name[:130]}")
        tl = device_timeline(tr, top_gaps=5)
        print(f"timeline: span {tl['span_ms']/3:.1f} "
              f"busy {tl['busy_ms']/3:.1f} idle {tl['idle_ms']/3:.1f}")


if __name__ == "__main__":
    main()
