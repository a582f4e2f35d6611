"""R3 scratch: plain-kernel schedule x tile ladder on chip (mxu arch).

The d2 plain chain is latency-bound (PERF.md mxu ladder: d3 carries 1.46x
the FLOPs for ~equal time), so two levers that change the MXU dispatch
shape without changing any per-row value:

  * rotation-row-stacking ("rs", `_plain_rs_kernel`): the 4 rotations of
    a mode share hidden weights, so their hidden matmuls fuse into one
    (4T, nf) x (nf, nf) — 4x the M per dispatch, 3 dependent chains per
    stage instead of 12.  Bit-identical outputs (CI-pinned).
  * ENSEMBLE_TILE sweep: bigger T amortizes MXU drains per matmul.  The
    dense arch measured flat 512..4096, but its matmuls were lane-starved,
    not latency-starved — re-measure on the plain shapes.

Usage: _r3_rs.py [--cpu]  (CPU = interpret parity smoke only)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import mulut_tpu.ops.unit_kernel as uk
from mulut_tpu.models.srnet import (
    init_srnets,
    srnets_predict_fast,
    stack_srnets_for_fast,
)

CPU = "--cpu" in sys.argv
if CPU:
    jax.config.update("jax_platforms", "cpu")

from mulut_tpu.utils.profiling import device_time  # noqa: E402
from mulut_tpu.utils.xla_opts import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

scale, stages, modes = 4, 2, "sdy"
H, W, B = (6, 7, 1) if CPU else (270, 480, 8)
PEAK = 197e12
out_px = B * 3 * H * W * scale * scale


def macs_per_inpix(nf, depth):
    total = 0
    for s in range(stages):
        v = scale * scale if s + 1 == stages else 1
        total += 12 * (4 * nf + depth * nf * nf + nf * v)
    return total


rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((B, 3, H, W), dtype=np.float32))

ARCHS = [("mxu-nf128-d2", 128, 2), ("mxu-nf128-d3", 128, 3),
         ("mxu-nf256-d2", 256, 2)]
# (schedule, tile, scoped_vmem_kib or None) — big tiles need a raised
# scoped-VMEM budget (rs at T=4096 allocates an 18.4 MB f32 intermediate
# vs the 16 MB default; measured OOM, and the failure killed run 1 —
# hence the per-config try/except below).
GRID = [("pass", 1024, None), ("rs", 1024, None), ("rs", 2048, 49152),
        ("rsiv", 1024, None), ("rsiv", 2048, 49152)]

from mulut_tpu.utils.xla_opts import tpu_compiler_options  # noqa: E402

baseline = {}
for label, nf, depth in ARCHS:
    params = init_srnets(jax.random.PRNGKey(0), nf=nf, scale=scale,
                         modes=modes, stages=stages, arch="mxu", depth=depth)
    stacked = stack_srnets_for_fast(params, modes=modes, stages=stages,
                                    scale=scale)
    for sched, tile, vmem in GRID:
        uk.PLAIN_SCHEDULE = sched
        uk.ENSEMBLE_TILE = tile
        uk.stage_ensemble_apply.clear_cache()
        opts = tpu_compiler_options(scoped_vmem_kib=vmem) if vmem else None
        run = jax.jit(
            lambda xx, st=stacked: srnets_predict_fast(
                st, xx, modes=modes, stages=stages, scale=scale,
                interpret=CPU),
            compiler_options=opts)
        tag = f"[{label} {sched} T={tile}" + (f" v={vmem}]" if vmem else "]")
        try:
            t0 = time.perf_counter()
            out = run(x)
            # Full-array D2H can stall for minutes when the tunnel is
            # bandwidth-degraded; on TPU compare a device-side per-row
            # (sum, weighted-sum) CHECKSUM instead of 50 MB readbacks.
            # This is checksum parity, not a bit-exact comparison: the
            # %251 column-weight wrap means structured differences
            # between columns 251 apart could collide (report wording
            # in PERF.md says "checksum parity" accordingly).  The
            # outputs are unclipped rounded floats; with rotation
            # accumulators bounded well inside +/-2^11 per lane, the
            # int32 row sums cannot overflow at W_out <= 1920.
            if CPU:
                ref = np.asarray(out)
            else:
                o32 = out.astype(jnp.int32)
                col = jnp.arange(o32.shape[-1], dtype=jnp.int32) % 251
                ref = (np.asarray(jnp.sum(o32, axis=-1)),
                       np.asarray(jnp.sum(o32 * col, axis=-1)))
            print(f"{tag} compile+first {time.perf_counter() - t0:.1f}s",
                  flush=True)
            if label not in baseline:
                baseline[label] = ref
            else:
                if CPU:
                    match = np.array_equal(ref, baseline[label])
                else:
                    match = all(np.array_equal(a, b) for a, b
                                in zip(ref, baseline[label]))
                print(f"{tag} parity vs pass/1024: "
                      f"{'MATCH' if match else 'MISMATCH'}", flush=True)
            if CPU:
                continue
            dt = device_time(lambda: run(x), n=3)
            flops = 2 * macs_per_inpix(nf, depth) * B * 3 * H * W
            print(f"{tag} {dt * 1e3:.1f} ms/batch  "
                  f"{out_px / dt / 1e6:.1f} MPix/s out  "
                  f"MFU {flops / dt / PEAK * 100:.1f}%", flush=True)
        except Exception as e:  # keep the ladder going past one bad config
            print(f"{tag} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
uk.PLAIN_SCHEDULE = "pass"
uk.ENSEMBLE_TILE = 1024
