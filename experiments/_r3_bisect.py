"""Isolate: does the 128-aligned width padding slow the stage-2 gathers?"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

import mulut_tpu.ops.ensemble as ens
import mulut_tpu.ops.simplex as sx
from mulut_tpu.ops.ensemble import prepare_expanded_luts_cached
from mulut_tpu.ops.taps import fold_geometry, mode_pad, mode_taps
from mulut_tpu.utils.profiling import device_time

scale, interval = 4, 4
rng = np.random.default_rng(0)
luts = {}
for s in range(2):
    v = 16 if s == 1 else 1
    for m in "sdy":
        luts[f"s{s + 1}_{m}"] = np.load(
            "/root/reference/models/sr_x2sdy/"
            f"LUT_ft_x4_4bit_int8_s{s + 1}_{m}.npy"
        ).reshape(-1, v).astype(np.int8)
tabs = prepare_expanded_luts_cached(luts, interval=interval)
flut = jax.device_put(tabs["s2_d"])

H, W, B = 270, 480, 8
img = jnp.asarray(rng.integers(0, 256, (B, 3, H, W), dtype=np.int64),
                  jnp.int32)


def d_ext(flut_, img_, *, pad_w):
    mode, v = "d", 16
    geo = fold_geometry(mode)
    pad = mode_pad(mode) + 1
    h, w = img_.shape[-2], img_.shape[-1]
    my = -min(s_[0] for s_, _ in geo)
    mx = -min(s_[1] for s_, _ in geo)
    he = h + my + 1
    we = (-(-(w + mx) // 128) * 128) if pad_w else (w + mx)  # noqa
    extra = we - (w + mx)
    cfg = [(0, 0)] * (img_.ndim - 2) + [(pad, pad), (pad, pad)]
    xp = jnp.pad(img_, cfg, mode="edge")
    if extra:
        if pad_w == "wrap":  # junk columns with VARIED content
            xp = jnp.concatenate([xp, xp[..., :extra]], axis=-1)
        else:
            xp = jnp.pad(xp, [(0, 0)] * (img_.ndim - 2) + [(0, 0), (0, extra)],
                         mode="edge")
    planes = [
        xp[..., pad - my + dy: pad - my + dy + he,
           pad - mx + dx: pad - mx + dx + we]
        for dy, dx in mode_taps(mode)
    ]
    n_ext = int(np.prod(planes[0].shape))
    base, fr = sx._base_and_fracs(planes, interval=interval)
    lam = sx.sorted_weights(*fr, interval=interval)
    idx = base * 24 + sx._lehmer_code(*fr)
    if pad_w == "idxpad":
        idx = jnp.pad(idx, (0, 8))  # break 1024-divisibility
    g = jnp.take(flut_, idx, axis=0)
    if pad_w == "idxpad":
        g = g[:n_ext]
    terms = flut_.shape[1] // (4 * v)
    if terms > 5:
        lam = jnp.pad(lam, ((0, 0), (0, terms - 5)))
    ext = jnp.einsum(
        "nm,nmv->nv", lam,
        g.reshape(n_ext, terms, 4 * v).astype(jnp.float32),
    )
    return ext.sum()  # cheap consumer


import jax.profiler
from mulut_tpu.utils.profiling import op_breakdown
for pw in (True, "idxpad"):
    f = jax.jit(functools.partial(d_ext, pad_w=pw))
    np.asarray(f(flut, img))
    dt = device_time(lambda: f(flut, img), n=3)
    tdir = f"/tmp/r3_bisect_{pw}"
    jax.profiler.start_trace(tdir)
    for _ in range(3):
        out = f(flut, img)
    np.asarray(out)
    jax.profiler.stop_trace()
    rows = op_breakdown(tdir, top=6)
    print(f"pad_w={pw}: {dt*1e3:.1f} ms")
    for ms, name, ln in rows:
        print(f"   {ms/3:7.2f} {name} | {ln[:100]}")
