"""R3 interactive: A/B the Pallas post-gather contraction kernel
(tail_kernel._contract / contract_vn) across engine configs.

The r3 y16 trace showed the VMEM-pinned 16-corner y table wins 36 ms on
gathers but loses 87 ms to XLA's contraction lowering (f32 convert
materialization + {1,0}->{0,1} relayout of (3.3M, 256) buffers).  The
kernel reads the gathered s8 rows directly and emits the transposed
(v, N) f32 flats.  Parity is asserted against the MULUT_CONTRACT_KERNEL=0
XLA path before timing.

Usage: python experiments/_r3_ck.py [stock|y16|sdy16] [--trace]

A/Bs the group-fold contraction kernel (MULUT_FOLD_KERNEL) against the
XLA einsum lowering inside the full cascade.
"""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import mulut_tpu.ops.tail_kernel as tk
from mulut_tpu.ops.ensemble import prepare_expanded_luts_cached
from mulut_tpu.utils.profiling import device_time, op_breakdown, trace
from mulut_tpu.utils.xla_opts import tpu_compiler_options

CFG = {
    "stock": ("", None),
    "y16": ("y", 65536),
    "sdy16": ("sdy", 98304),
}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "y16"
    c16, kib = CFG[which]
    scale, stages, modes, interval = 4, 2, "sdy", 4
    H, W, B = 270, 480, 8

    rng = np.random.default_rng(0)
    luts = {}
    for s in range(stages):
        v = scale * scale if s + 1 == stages else 1
        for m in modes:
            luts[f"s{s + 1}_{m}"] = np.load(
                "/root/reference/models/sr_x2sdy/"
                f"LUT_ft_x{scale}_{interval}bit_int8_s{s + 1}_{m}.npy"
            ).reshape(-1, v).astype(np.int8)
    tabs = prepare_expanded_luts_cached(
        luts, interval=interval, shared_quad=True, corner16_modes=c16)
    img = jnp.asarray(
        rng.integers(0, 256, (B, 3, H, W), dtype=np.int64), jnp.int32)

    copts = tpu_compiler_options(scoped_vmem_kib=kib)
    print(f"compiler_options: {copts}", flush=True)

    def make_fn():
        # a FRESH function object per variant: jax caches the traced
        # jaxpr on the function object, so reusing one partial would
        # silently reuse the first variant's trace (env never re-read)
        return functools.partial(
            tk.lut_cascade_packed, stages=stages, modes=modes,
            scale=scale, interval=interval)

    tabs_d = jax.device_put(tabs)

    knob = "MULUT_FOLD_KERNEL"

    # XLA-contraction oracle first
    os.environ[knob] = "0"
    run0 = jax.jit(make_fn(), compiler_options=copts)
    t0 = time.time()
    base = np.asarray(run0(tabs_d, img))
    print(f"[{which}/xla] compile+run {time.time()-t0:.0f}s", flush=True)
    dt = device_time(lambda: run0(tabs_d, img), n=3)
    print(f"[{which}/xla] {dt*1e3:.1f} ms/batch = "
          f"{B*H*W*16/1e6/dt:.1f} MPix/s", flush=True)
    del run0

    os.environ[knob] = "1"
    run1 = jax.jit(make_fn(), compiler_options=copts)
    t0 = time.time()
    out = np.asarray(run1(tabs_d, img))
    ok = np.array_equal(out, base)
    print(f"[{which}/ck] compile+run {time.time()-t0:.0f}s "
          f"{'MATCH' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        u0 = tk.unpack_u32(base, (B, 3), H, W, scale)
        u1 = tk.unpack_u32(out, (B, 3), H, W, scale)
        print(f"  unpacked equal: {np.array_equal(u0, u1)} "
              f"maxdiff {np.abs(u0.astype(int)-u1.astype(int)).max()}",
              flush=True)
    dt = device_time(lambda: run1(tabs_d, img), n=3)
    print(f"[{which}/ck] {dt*1e3:.1f} ms/batch = "
          f"{B*H*W*16/1e6/dt:.1f} MPix/s", flush=True)

    if "--trace" in sys.argv:
        tdir = f"/tmp/r3_ck_{which}"
        NRUN = 3
        with trace(tdir):
            for _ in range(NRUN):
                out = run1(tabs_d, img)
            np.asarray(out[:1, 0, :4])
        rows = op_breakdown(tdir, top=40)
        print(f"top-40 sum {sum(r[0] for r in rows)/NRUN:.1f} ms/run",
              flush=True)
        for ms, op, long in rows:
            print(f"  {ms/NRUN:8.2f} ms  {op:<28} {long[:100]}")


if __name__ == "__main__":
    main()
