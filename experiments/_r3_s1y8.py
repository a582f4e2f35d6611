"""R3 scratch: stage-1 y table as int8 instead of int32.

prepare_expanded_luts widens the v==1 non-symmetric table to int32 so
gather rows are 64 B (16-B s8 rows gather ~15x slower STANDALONE).  But
the r3 trace shows the s1-y path's cost is dominated by the gathered
buffer's s32[N,16] {1,0}->{0,1} layout copies (9.9 ms/batch), not the
gathers themselves (VMEM-resident, 1.3 ns/row).  An s8 table makes the
gathered buffer 4x smaller -> 4x cheaper copies, IF the gather rate
holds (VMEM residency may hide the narrow-row penalty) and no
sub-128-lane s8 relayout appears.

Usage: _r3_s1y8.py [--cpu] [--trace]
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
from mulut_tpu.ops.ensemble import prepare_expanded_luts_cached
from mulut_tpu.utils.profiling import device_time, op_breakdown


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

    run = jax.jit(functools.partial(
        tk.lut_cascade_packed, stages=stages, modes=modes,
        scale=scale, interval=interval, interpret=interp))

    tabs_d = jax.device_put(tabs)
    base = np.asarray(run(tabs_d, img))
    del tabs_d

    # int8 stage-1 non-symmetric tables (values ARE int8; the int32 form
    # is a pure widening)
    tabs8 = dict(tabs)
    for k, a in tabs.items():
        if a.dtype == np.int32:
            assert np.array_equal(a, a.astype(np.int8)), k
            tabs8[k] = a.astype(np.int8)
            print(f"narrowed {k}: {a.shape} s32 -> s8")
    tabs8_d = jax.device_put(tabs8)
    out = np.asarray(run(tabs8_d, img))
    print("MATCH" if np.array_equal(out, base) else "MISMATCH")
    if "--cpu" in sys.argv:
        return
    dt = device_time(lambda: run(tabs8_d, img), n=3)
    print(f"[s1y-s8] {dt*1e3:.1f} ms/batch = "
          f"{B*H*W*16/1e6/dt:.1f} MPix/s")
    if "--trace" in sys.argv:
        tr = "/tmp/r3_s1y8_trace"
        jax.profiler.start_trace(tr)
        for _ in range(3):
            o = run(tabs8_d, img)
        np.asarray(o[:1, 0, :4])
        jax.profiler.stop_trace()
        rows = op_breakdown(tr, top=500)
        tot = sum(ms for ms, _, _ in rows)
        print(f"traced {tot/3:.1f} ms/run over {len(rows)} ops")
        for ms, name, long_name in rows[:30]:
            print(f"{ms/3:8.2f} ms  {name}  | {long_name[:120]}")


if __name__ == "__main__":
    main()
