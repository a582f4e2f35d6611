"""R3 scratch: merge the four stage-2 y gathers into ONE gather.

The four rotations of a non-symmetric mode gather from the SAME shared
rank table (tail_kernel.quad_flat) as four separate 3.33M-row gather
fusions at ~5.8 ns/row.  This variant concatenates the four index
vectors into one 13.3M-row gather and splits the result — same rows,
one op boundary, one fusion loop (does per-op setup/pipelining matter
at this scale?).

Also probes the table-argument relayout (%copy.136): prints whether a
device_put with an explicit row-major layout removes the per-run copy.

Usage: _r3_merge.py [--cpu] [--trace]
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
from mulut_tpu.ops.ensemble import prepare_expanded_luts_cached
from mulut_tpu.ops.taps import mode_pad, rotated_taps
from mulut_tpu.utils.profiling import device_time, op_breakdown


def quad_flat_merged(lut, img, *, mode: str, v: int, interval: int):
    """quad_flat with the 4 rotation gathers fused into one."""
    pad = mode_pad(mode) + 1
    h, w = img.shape[-2], img.shape[-1]
    hy = h + 1
    wy = tk._pad128(w)
    xp = tk._pad_ragged(img, pad, wy - w)
    n = int(np.prod(img.shape[:-2])) * hy * wy
    terms = lut.shape[-1] // v
    assert terms != 16, "merged variant targets the rank table"
    idxs, lams = [], []
    for r in range(4):
        planes = [
            xp[..., pad + dy: pad + dy + hy, pad + dx: pad + dx + wy]
            for dy, dx in rotated_taps(mode, r)
        ]
        base, fr = sx._base_and_fracs(planes, interval=interval)
        lam = sx.sorted_weights(*fr, interval=interval)
        lam = jnp.pad(lam, ((0, 0), (0, max(0, terms - 5))))
        lams.append(jnp.pad(lam, ((0, 8), (0, 0))))
        idxs.append(
            (sx._lehmer_code(*fr) * (lut.shape[0] // 24) + base).reshape(-1)
        )
    g_all = tk._padded_index_take(lut, jnp.concatenate(idxs))
    outs = []
    # quad_flat's contract is four (n+8, v) buffers whose last 8 junk
    # rows are never READ (tail-kernel segment DMAs skip them) — so each
    # rotation slices an (n+8)-row window at offset r*n: rotations 0..2
    # borrow the next rotation's first 8 rows as junk, rotation 3 gets
    # _padded_index_take's own 8 pad rows.
    for r in range(4):
        g = jax.lax.slice_in_dim(g_all, r * n, r * n + n + 8, axis=0)
        outs.append(jnp.einsum(
            "nm,nmv->nv", lams[r],
            g.reshape(n + 8, terms, v).astype(jnp.float32),
        ))
    return outs, wy


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
    eluts = jax.device_put(
        prepare_expanded_luts_cached(luts, interval=interval,
                                     shared_quad=True))
    img = jnp.asarray(
        rng.integers(0, 256, (B, 3, H, W), dtype=np.int64), jnp.int32)

    interp = "--cpu" in sys.argv
    run = jax.jit(functools.partial(
        tk.lut_cascade_packed, stages=stages, modes=modes,
        scale=scale, interval=interval, interpret=interp))
    base = np.asarray(run(eluts, img))

    orig = tk.quad_flat
    tk.quad_flat = quad_flat_merged
    try:
        run2 = jax.jit(functools.partial(
            tk.lut_cascade_packed, stages=stages, modes=modes,
            scale=scale, interval=interval, interpret=interp))
        t0 = time.time()
        out = np.asarray(run2(eluts, img))
        print(f"[merged] compile+run {time.time()-t0:.0f}s "
              f"{'MATCH' if np.array_equal(out, base) else 'MISMATCH'}")
        if "--cpu" in sys.argv:
            return
        dt = device_time(lambda: run2(eluts, img), n=3)
        print(f"[merged] {dt*1e3:.1f} ms/batch = "
              f"{B*H*W*16/1e6/dt:.1f} MPix/s")
        if "--trace" in sys.argv:
            tr = "/tmp/r3_merge_trace"
            jax.profiler.start_trace(tr)
            for _ in range(3):
                o = run2(eluts, img)
            np.asarray(o[:1, 0, :4])
            jax.profiler.stop_trace()
            rows = op_breakdown(tr, top=500)
            tot = sum(ms for ms, _, _ in rows)
            print(f"traced {tot/3:.1f} ms/run over {len(rows)} ops")
            for ms, name, long_name in rows[:30]:
                print(f"{ms/3:8.2f} ms  {name}  | {long_name[:120]}")
    finally:
        tk.quad_flat = orig


if __name__ == "__main__":
    main()
