"""R3: scoped-VMEM sweep of the y16 + fold-kernel cascade config.

The 21.4 MB shared 16-corner y table pins S(1) under a scoped-vmem
budget; this sweeps the budget (and no-flag default) to find where the
gather staging grants peak, with the group-fold kernel active.  Parity
is asserted against the first variant.

Usage: python experiments/_r3_vsweep.py [kib ...]
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import mulut_tpu.ops.tail_kernel as tk
from mulut_tpu.ops.ensemble import prepare_expanded_luts_cached
from mulut_tpu.utils.profiling import device_time
from mulut_tpu.utils.xla_opts import tpu_compiler_options


def main():
    kibs = [None if a == "none" else int(a) for a in sys.argv[1:]] or [
        None, 49152, 65536, 98304, 131072]
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
    tabs = jax.device_put(prepare_expanded_luts_cached(
        luts, interval=interval, shared_quad=True, corner16_modes="y"))
    img = jnp.asarray(
        rng.integers(0, 256, (B, 3, H, W), dtype=np.int64), jnp.int32)

    base = None
    for kib in kibs:
        fn = functools.partial(
            tk.lut_cascade_packed, stages=stages, modes=modes,
            scale=scale, interval=interval)
        run = jax.jit(fn, compiler_options=tpu_compiler_options(
            scoped_vmem_kib=kib))
        t0 = time.time()
        try:
            out = np.asarray(run(tabs, img))
        except Exception as e:  # noqa: BLE001
            print(f"[kib={kib}] FAILED {type(e).__name__}: {str(e)[:150]}",
                  flush=True)
            continue
        ok = base is None or np.array_equal(out, base)
        if base is None:
            base = out
        dt = device_time(lambda: run(tabs, img), n=3)
        print(f"[kib={kib}] compile {time.time()-t0:.0f}s "
              f"{'MATCH' if ok else 'MISMATCH'} {dt*1e3:.1f} ms/batch = "
              f"{B*H*W*16/1e6/dt:.1f} MPix/s", flush=True)


if __name__ == "__main__":
    main()
