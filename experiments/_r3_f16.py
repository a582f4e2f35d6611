"""R3: A/B 16-corner FOLDED s/d tables (fold16_modes) in the cascade.

Config ladder: y16 (current best: shared 16-corner y + rank-folded s/d)
vs fold16 variants replacing the 770 MB rank-folded s/d tables with the
85.5 MB plain 16-corner folded form — smaller-table gather locality vs
16/5x more gathered bytes, with the group-fold kernel's 128-lane tree
making the C=16 contraction cheap.  Parity asserted against the first.

Usage: python experiments/_r3_f16.py [cpu]
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import mulut_tpu.ops.tail_kernel as tk
from mulut_tpu.ops.ensemble import prepare_expanded_luts_cached

CFGS = [
    ("y16", dict(corner16_modes="y")),
    ("y16+f16sd", dict(corner16_modes="y", fold16_modes="sd")),
    ("y16+f16s", dict(corner16_modes="y", fold16_modes="s")),
]


def main():
    cpu = "cpu" in sys.argv[1:]
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    from mulut_tpu.utils.profiling import device_time

    scale, stages, modes, interval = 4, 2, "sdy", 4
    H, W, B = (24, 32, 1) if cpu else (270, 480, 8)

    rng = np.random.default_rng(0)
    luts = {}
    for s in range(stages):
        v = scale * scale if s + 1 == stages else 1
        for m in modes:
            luts[f"s{s + 1}_{m}"] = np.load(
                "/root/reference/models/sr_x2sdy/"
                f"LUT_ft_x{scale}_{interval}bit_int8_s{s + 1}_{m}.npy"
            ).reshape(-1, v).astype(np.int8)
    img = jnp.asarray(
        rng.integers(0, 256, (B, 3, H, W), dtype=np.int64), jnp.int32)

    base = None
    for label, kw in CFGS:
        tabs = jax.device_put(prepare_expanded_luts_cached(
            luts, interval=interval, shared_quad=True, **kw))
        fn = functools.partial(
            tk.lut_cascade_packed, stages=stages, modes=modes,
            scale=scale, interval=interval, interpret=cpu)
        run = jax.jit(fn)
        t0 = time.time()
        try:
            out = np.asarray(run(tabs, img))
        except Exception as e:  # noqa: BLE001
            print(f"[{label}] FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        ok = base is None or np.array_equal(out, base)
        if base is None:
            base = out
        print(f"[{label}] compile {time.time()-t0:.0f}s "
              f"{'MATCH' if ok else 'MISMATCH'}", flush=True)
        if cpu:
            continue
        dt = device_time(lambda: run(tabs, img), n=3)
        print(f"[{label}] {dt*1e3:.1f} ms/batch = "
              f"{B*H*W*16/1e6/dt:.1f} MPix/s", flush=True)
        if "--trace" in sys.argv:
            from mulut_tpu.utils.profiling import op_breakdown, trace
            tdir = f"/tmp/r3_f16_{label.replace('+', '_')}"
            with trace(tdir):
                for _ in range(3):
                    out = run(tabs, img)
                np.asarray(out[:1, 0, :4])
            rows = op_breakdown(tdir, top=40)
            print(f"top-40 sum {sum(r[0] for r in rows)/3:.1f} ms/run",
                  flush=True)
            for ms, op, long in rows:
                print(f"  {ms/3:8.2f} ms  {op:<26} {long[:90]}")


if __name__ == "__main__":
    main()
