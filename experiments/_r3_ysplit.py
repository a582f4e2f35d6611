"""R3 scratch: stage-2 y as TWO 10.7 MB 16-corner half-tables (VMEM fallback).

If the scoped-vmem flag can't pin the 21.4 MB y16 table (see
_r3_y16v.py), split it along the v axis into two (83521, 16*8) s8
tables - each under even the DEFAULT scoped budget (the 5.3 MB s1-y
table pins by default).  Each rotation then does two gathers of 128-B
rows (8 gathers total vs 4), but at the ~1.3 ns/row VMEM rate that is
~35 ms vs the current 77 ms from HBM.

Usage: _r3_ysplit.py [--cpu] [--trace]
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import mulut_tpu.ops.simplex as sx
import mulut_tpu.ops.tail_kernel as tk
from mulut_tpu.ops import simplex_tables
from mulut_tpu.ops.ensemble import prepare_expanded_luts_cached
from mulut_tpu.ops.taps import mode_pad, rotated_taps
from mulut_tpu.utils.profiling import device_time, op_breakdown


def quad_flat_split(lut, img, *, mode: str, v: int, interval: int):
    """quad_flat for a (2, L**4, 16 * v/2) v-split 16-corner table."""
    if lut.ndim != 3:  # non-split tables (other modes): stock path
        return _ORIG(lut, img, mode=mode, v=v, interval=interval)
    pad = mode_pad(mode) + 1
    h, w = img.shape[-2], img.shape[-1]
    hy = h + 1
    wy = tk._pad128(w)
    xp = tk._pad_ragged(img, pad, wy - w)
    n = int(np.prod(img.shape[:-2])) * hy * wy
    vh = v // 2
    outs = []
    for r in range(4):
        planes = [
            xp[..., pad + dy: pad + dy + hy, pad + dx: pad + dx + wy]
            for dy, dx in rotated_taps(mode, r)
        ]
        base, fr = sx._base_and_fracs(planes, interval=interval)
        lam = jnp.pad(sx.corner_lams(*fr, interval=interval), ((0, 8), (0, 0)))
        halves = []
        for hx in range(2):
            g = tk._padded_index_take(lut[hx], base)
            halves.append(jnp.einsum(
                "nm,nmv->nv", lam,
                g.reshape(n + 8, 16, vh).astype(jnp.float32),
            ))
        # interleave halves back to v lanes: half 0 = v 0..7, half 1 = 8..15
        outs.append(jnp.concatenate(halves, axis=1))
    return outs, wy


_ORIG = tk.quad_flat


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

    e = simplex_tables.expand_lut(luts["s2_y"], interval)  # (L4, 16, 16)
    tabs_s = dict(tabs)
    tabs_s["s2_y"] = np.stack([
        np.ascontiguousarray(e[:, :, :8].reshape(e.shape[0], -1)),
        np.ascontiguousarray(e[:, :, 8:].reshape(e.shape[0], -1)),
    ])
    print(f"split tables: {tabs_s['s2_y'].shape} "
          f"{tabs_s['s2_y'].nbytes/2/1e6:.1f} MB each", flush=True)

    tk.quad_flat = quad_flat_split
    try:
        run2 = jax.jit(functools.partial(
            tk.lut_cascade_packed, stages=stages, modes=modes,
            scale=scale, interval=interval, interpret=interp))
        tabs_s_d = jax.device_put(tabs_s)
        t0 = time.time()
        out = np.asarray(run2(tabs_s_d, img))
        print(f"[ysplit] compile+run {time.time()-t0:.0f}s "
              f"{'MATCH' if np.array_equal(out, base) else 'MISMATCH'}",
              flush=True)
        if "--cpu" in sys.argv:
            return
        dt = device_time(lambda: run2(tabs_s_d, img), n=3)
        print(f"[ysplit] {dt*1e3:.1f} ms/batch = "
              f"{B*H*W*16/1e6/dt:.1f} MPix/s", flush=True)
        if "--trace" in sys.argv:
            tr = "/tmp/r3_ysplit_trace"
            jax.profiler.start_trace(tr)
            for _ in range(3):
                o = run2(tabs_s_d, img)
            np.asarray(o[:1, 0, :4])
            jax.profiler.stop_trace()
            rows = op_breakdown(tr, top=10000)
            tot = sum(ms for ms, _, _ in rows)
            print(f"traced {tot/3:.1f} ms/run over {len(rows)} ops")
            for ms, name, long_name in rows[:25]:
                print(f"{ms/3:8.2f} ms  {name}  | {long_name[:120]}")
    finally:
        tk.quad_flat = _ORIG


if __name__ == "__main__":
    main()
