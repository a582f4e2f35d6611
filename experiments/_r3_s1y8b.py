"""R3: s1y8 lever ON TOP of the shipped config (y16 + f16sd + k1sd).

The shipped 162 ms config leaves stage-1 y on the s32 XLA quad path
(~12 ms of {1,0}->{0,1} layout copies + convert + multiply_reduce).
Casting the (L**4, 16) stage-1 y table to int8 shrinks the gathered
buffer (and its layout copies) 4x.  Parity-gated vs the shipped config.

Run: /opt/venv/bin/python experiments/_r3_s1y8b.py [--cpu] [--trace]
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
    cpu = "--cpu" in sys.argv
    B, H, W = (1, 24, 32) if cpu else (8, 270, 480)
    interp = cpu

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
        luts, interval=interval, shared_quad=True,
        corner16_modes="y", fold16_modes="sd", k128_stage1="sd")
    img = jnp.asarray(
        rng.integers(0, 256, (B, 3, H, W), dtype=np.int64), jnp.int32)
    run = jax.jit(functools.partial(
        tk.lut_cascade_packed, stages=stages, modes=modes,
        scale=scale, interval=interval, interpret=interp))

    tabs_d = jax.device_put(tabs)
    base = np.asarray(run(tabs_d, img))
    if not cpu:
        dt0 = device_time(lambda: run(tabs_d, img), n=3)
        print(f"[shipped] {dt0*1e3:.1f} ms/batch = "
              f"{B*H*W*16/1e6/dt0:.1f} MPix/s", flush=True)
    del tabs_d

    tabs_x = dict(tabs)
    n8 = [k for k, a in tabs_x.items()
          if isinstance(a, np.ndarray) and a.dtype == np.int32]
    for k in n8:
        tabs_x[k] = tabs_x[k].astype(np.int8)
    print(f"cast to int8: {n8}", flush=True)
    tabs_x_d = jax.device_put(tabs_x)
    t0 = time.time()
    out = np.asarray(run(tabs_x_d, img))
    ok = np.array_equal(
        tk.unpack_u32(out, (B, 3), H, W, scale),
        tk.unpack_u32(base, (B, 3), H, W, scale))
    print(f"[s1y8] compile+run {time.time()-t0:.0f}s "
          f"{'MATCH' if ok else 'MISMATCH'}", flush=True)
    if cpu:
        return
    dt = device_time(lambda: run(tabs_x_d, img), n=3)
    print(f"[s1y8] {dt*1e3:.1f} ms/batch = "
          f"{B*H*W*16/1e6/dt:.1f} MPix/s", flush=True)
    if "--trace" in sys.argv:
        tr = "/tmp/r3_s1y8b_trace"
        jax.profiler.start_trace(tr)
        for _ in range(3):
            o = run(tabs_x_d, img)
        np.asarray(o[:1, 0, :4])
        jax.profiler.stop_trace()
        rows = op_breakdown(tr, top=10000)
        tot = sum(ms for ms, _, _ in rows)
        print(f"traced {tot/3:.1f} ms/run over {len(rows)} ops")
        for ms, nm, ln in rows[:25]:
            print(f"{ms/3:8.2f} ms  {nm}  | {ln[:110]}")


if __name__ == "__main__":
    main()
