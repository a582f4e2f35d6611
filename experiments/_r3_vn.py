"""R3 scratch: transposed-output einsum ("...->vn") for the flat
contractions feeding the tail kernel — does it kill the {1,0}->{0,1}
copies of the gathered buffers?

Patches tail_kernel.folded_flat / quad_flat with vn-output variants and
times the packed cascade.  Bit-check vs /tmp expected first.
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import mulut_tpu.ops.simplex as sx
import mulut_tpu.ops.tail_kernel as tk
from mulut_tpu.ops.ensemble import lut_cascade_int, prepare_expanded_luts_cached
from mulut_tpu.utils.profiling import device_time, op_breakdown

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

base_tabs = prepare_expanded_luts_cached(luts, interval=interval)
ktabs = prepare_expanded_luts_cached(luts, interval=interval, shared_quad=True)

img = jnp.asarray(rng.integers(0, 256, (B, 3, H, W), dtype=np.int64), jnp.int32)
chk = np.asarray(rng.integers(0, 256, (1, 40, 56), dtype=np.int64), np.int32)
exp = np.asarray(
    jax.jit(lambda t, x: lut_cascade_int(
        t, x, stages=stages, modes=modes, scale=scale, interval=interval,
        expanded=True))(jax.device_put(base_tabs), jnp.asarray(chk))
)

orig_folded, orig_quad = tk.folded_flat, tk.quad_flat


def folded_flat_vn(flut, img_, *, mode, v, interval):
    from mulut_tpu.ops.taps import fold_geometry, mode_pad, mode_taps
    geo = fold_geometry(mode)
    pad = mode_pad(mode) + 1
    h, w = img_.shape[-2], img_.shape[-1]
    my = -min(s_[0] for s_, _ in geo)
    mx = -min(s_[1] for s_, _ in geo)
    he = h + my + 1
    we = tk._pad128(w + mx)
    xp = tk._pad_ragged(img_, pad, we - (w + mx))
    planes = [
        xp[..., pad - my + dy: pad - my + dy + he,
           pad - mx + dx: pad - mx + dx + we]
        for dy, dx in mode_taps(mode)
    ]
    n_ext = int(np.prod(planes[0].shape))
    base, fr = sx._base_and_fracs(planes, interval=interval)
    lam = sx.sorted_weights(*fr, interval=interval)
    g = tk._padded_index_take(
        flut, sx._lehmer_code(*fr) * (flut.shape[0] // 24) + base
    )
    terms = flut.shape[1] // (4 * v)
    lam = jnp.pad(lam, ((0, 8), (0, max(0, terms - 5))))
    ext = jnp.einsum(
        "nm,nmv->vn", lam,
        g.reshape(n_ext + 8, terms, 4 * v).astype(jnp.float32),
    )
    offs = [(sy + my) * we + (sx_ + mx) for (sy, sx_), _ in geo]
    return ext, he, we, offs


def quad_flat_vn(lut, img_, *, mode, v, interval):
    from mulut_tpu.ops.taps import mode_pad, rotated_taps
    pad = mode_pad(mode) + 1
    h, w = img_.shape[-2], img_.shape[-1]
    hy = h + 1
    wy = tk._pad128(w)
    xp = tk._pad_ragged(img_, pad, wy - w)
    n = int(np.prod(img_.shape[:-2])) * hy * wy
    terms = lut.shape[-1] // v
    outs = []
    for r in range(4):
        planes = [
            xp[..., pad + dy: pad + dy + hy, pad + dx: pad + dx + wy]
            for dy, dx in rotated_taps(mode, r)
        ]
        base, fr = sx._base_and_fracs(planes, interval=interval)
        if terms == 16:
            lam = sx.corner_lams(*fr, interval=interval)
            g = tk._padded_index_take(lut, base)
        else:
            lam = sx.sorted_weights(*fr, interval=interval)
            lam = jnp.pad(lam, ((0, 0), (0, max(0, terms - 5))))
            g = tk._padded_index_take(
                lut, sx._lehmer_code(*fr) * (lut.shape[0] // 24) + base
            )
        lam = jnp.pad(lam, ((0, 8), (0, 0)))
        outs.append(jnp.einsum(
            "nm,nmv->vn", lam,
            g.reshape(n + 8, terms, v).astype(jnp.float32),
        ))
    return outs, wy


# tail_assemble transposes (args.append(ext.T)); with vn outputs the .T
# restores (n, v)... no — we want to SKIP the .T. Patch tail_assemble's
# callers minimally: wrap objects so .T returns the array itself.
class _NoT:
    def __init__(self, a):
        self.a = a
        self.T = a


def folded_wrap(*a, **k):
    ext, he, we, offs = folded_flat_vn(*a, **k)
    return _NoT(ext), he, we, offs


def quad_wrap(*a, **k):
    outs, wy = quad_flat_vn(*a, **k)
    return [_NoT(o) for o in outs], wy


which = sys.argv[1:] or ["vn"]
for cfg in which:
    if cfg == "vn":
        tk.folded_flat, tk.quad_flat = folded_wrap, quad_wrap
    else:
        tk.folded_flat, tk.quad_flat = orig_folded, orig_quad

    run = jax.jit(functools.partial(
        tk.lut_cascade_packed, stages=stages, modes=modes,
        scale=scale, interval=interval,
    ))
    dtabs = jax.device_put(ktabs)
    t0 = time.perf_counter()
    packed = run(dtabs, jnp.asarray(chk))
    got = tk.unpack_u32(packed, (1,), 40, 56, scale).astype(np.int32)
    ok = "MATCH" if np.array_equal(got, exp) else "MISMATCH!!"
    print(f"[{cfg}] compile+check {time.perf_counter()-t0:.0f}s {ok}",
          flush=True)
    def sync():
        np.asarray(run(dtabs, img)[:1, 0, :4])
    sync()
    dt = device_time(lambda: run(dtabs, img), n=3)
    print(f"[{cfg}] {dt*1e3:.1f} ms/batch = {B*H*W*16/1e6/dt:.1f} MPix/s",
          flush=True)

    if "--trace" in sys.argv:
        TRACE = f"/tmp/r3_vn_trace_{cfg}"
        jax.profiler.start_trace(TRACE)
        for _ in range(3):
            out = run(dtabs, img)
        np.asarray(out[:1, 0, :4])
        jax.profiler.stop_trace()
        rows = op_breakdown(TRACE, top=20)
        tot = sum(ms for ms, _, _ in rows)
        print(f"[{cfg}] traced {tot/3:.1f} ms/run")
        for ms, name, long_name in rows:
            print(f"{ms/3:8.2f} ms  {name}  | {long_name[:120]}")
