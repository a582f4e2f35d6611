"""R3: scoped-VMEM budget sweep on the FINAL config (y16+f16sd+k1sd+s1y8).

The earlier sweep (176 ms-era config) measured the default budget
fastest; k1sd changed the VMEM picture (group-fold kernel scratch), so
re-sweep.  Target: the 21.4 MB shared s2-y 16-corner table still
gathers at ~3.09 ns/row (HBM-ish); an S(1) VMEM placement would run at
~1.3-1.6 ns/row (-22 ms).

Run: /opt/venv/bin/python experiments/_r3_vs3.py
"""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp

import mulut_tpu.ops.tail_kernel as tk
from mulut_tpu.ops.ensemble import prepare_expanded_luts_cached
from mulut_tpu.utils.profiling import device_time


def main():
    scale, stages, modes, interval = 4, 2, "sdy", 4
    B, H, W = 8, 270, 480

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
    tabs = dict(tabs)
    tabs["s1_y"] = tabs["s1_y"].astype(np.int8)  # the s1y8 lever
    img = jnp.asarray(
        rng.integers(0, 256, (B, 3, H, W), dtype=np.int64), jnp.int32)
    tabs_d = jax.device_put(tabs)

    base = None
    for kib in [None, 32768, 49152, 65536, 98304]:
        copts = ({"xla_tpu_scoped_vmem_limit_kib": str(kib)}
                 if kib else None)
        label = f"vmem={kib or 'default'}"
        try:
            run = jax.jit(functools.partial(
                tk.lut_cascade_packed, stages=stages, modes=modes,
                scale=scale, interval=interval),
                compiler_options=copts)
            out = np.asarray(run(tabs_d, img))
            u = tk.unpack_u32(out, (B, 3), H, W, scale)
            if base is None:
                base = u
            ok = np.array_equal(u, base)
            dt = device_time(lambda: run(tabs_d, img), n=3)
            print(f"[{label}] {dt*1e3:.1f} ms/batch = "
                  f"{B*H*W*16/1e6/dt:.1f} MPix/s "
                  f"{'MATCH' if ok else 'MISMATCH'}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[{label}] failed: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
