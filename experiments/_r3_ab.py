"""R3 scratch: A/B table-format / contraction experiments on the chip.

Usage: python _r3_ab.py <config> [--trace]
Configs: base | norank | uint8 | mr1 | ...
Each run prints ms/batch + MPix/s and verifies bit-equality on a small
check image vs the saved baseline output (/tmp/r3_expected.npy).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import mulut_tpu.ops.ensemble as ens
import mulut_tpu.ops.simplex as sx
from mulut_tpu.ops.ensemble import lut_cascade_int, prepare_expanded_luts_cached
from mulut_tpu.utils.profiling import device_time, op_breakdown

cfg = sys.argv[1] if len(sys.argv) > 1 else "base"
do_trace = "--trace" in sys.argv

scale, stages, modes, interval = 4, 2, "sdy", 4
L = 17
H, W, B = 270, 480, 8

rng = np.random.default_rng(0)
luts = {}
for s in range(stages):
    v = scale * scale if s + 1 == stages else 1
    for m in modes:
        arr = np.load(
            "/root/reference/models/sr_x2sdy/"
            f"LUT_ft_x{scale}_{interval}bit_int8_s{s + 1}_{m}.npy"
        ).reshape(-1, v)
        luts[f"s{s + 1}_{m}"] = arr.astype(np.int8)

img = jnp.asarray(rng.integers(0, 256, (B, 3, H, W), dtype=np.int64), jnp.int32)
chk = jnp.asarray(rng.integers(0, 256, (1, 40, 56), dtype=np.int64), jnp.int32)

# ---------------- variant setup ----------------
rank = True
if cfg == "norank":
    rank = False

if cfg == "mr1":
    # Stage-1 contraction: einsum -> explicit multiply+reduce
    def folded_mr(flut, planes, *, v, interval=4):
        lead = planes[0].shape
        base, (fa, fb, fc, fd) = sx._base_and_fracs(planes, interval=interval)
        lam = sx.corner_lams(fa, fb, fc, fd, interval=interval)  # (N, 16)
        g = jnp.take(flut, base, axis=0)                         # (N, 64) i8
        width = 4 * v
        g3 = g.reshape(-1, 16, width).astype(jnp.float32)
        out = (lam[:, :, None] * g3).sum(axis=1)
        return out.astype(jnp.int32).reshape(*lead, 4, v)

    def quad_mr(luts4, planes4, *, v, interval=4):
        lead = planes4[0][0].shape
        out = None
        for r in range(4):
            base, fr = sx._base_and_fracs(planes4[r], interval=interval)
            lam = sx.corner_lams(*fr, interval=interval)
            g = jnp.take(luts4[r], base, axis=0).astype(jnp.float32)
            o = (lam * g).sum(axis=-1)                           # (N,)
            out = o if out is None else out + o
        return out.astype(jnp.int32).reshape(*lead, v)

    ens.simplex_planes_folded_int = folded_mr
    ens.simplex_planes_quad_int = quad_mr

eluts = prepare_expanded_luts_cached(luts, interval=interval, rank=rank)

cast_u8 = cfg == "uint8"


@jax.jit
def run(tabs, x):
    out = lut_cascade_int(
        tabs, x, stages=stages, modes=modes, scale=scale,
        interval=interval, expanded=True,
    )
    return out.astype(jnp.uint8) if cast_u8 else out


eluts = jax.device_put(eluts)
t0 = time.perf_counter()
np.asarray(run(eluts, img)[0, 0, 0, :4])
print(f"compile+transfer {time.perf_counter()-t0:.1f}s", flush=True)

# bit-check on the small image
got = np.asarray(run(eluts, chk)).astype(np.int32)
try:
    exp = np.load("/tmp/r3_expected.npy")
    print("MATCH" if np.array_equal(got, exp) else "MISMATCH!!", flush=True)
except OSError:
    np.save("/tmp/r3_expected.npy", got)
    print("saved expected", flush=True)

dt = device_time(lambda: run(eluts, img), n=3)
print(f"[{cfg}] {dt*1e3:.1f} ms/batch = {B*H*W*16/1e6/dt:.1f} MPix/s", flush=True)

if do_trace:
    TRACE = f"/tmp/r3_trace_{cfg}"
    jax.profiler.start_trace(TRACE)
    for _ in range(3):
        out = run(eluts, img)
    np.asarray(out[0, 0, 0, :4])
    jax.profiler.stop_trace()
    rows = op_breakdown(TRACE, top=30)
    tot = sum(ms for ms, _, _ in rows)
    print(f"traced {tot/3:.1f} ms/run")
    for ms, name, long_name in rows:
        print(f"{ms/3:8.2f} ms  {name}  | {long_name[:120]}")
