"""R3 scratch #2: y-mode table/contraction variants, one process.

Runs base + variants sequentially, bit-checks each vs /tmp/r3_expected.npy.
Also dumps while-loop info from the optimized HLO.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import mulut_tpu.ops.ensemble as ens
import mulut_tpu.ops.simplex as sx
from mulut_tpu.ops import simplex_tables as st
from mulut_tpu.ops.ensemble import lut_cascade_int, prepare_expanded_luts_cached
from mulut_tpu.ops.taps import lane_rotation_perm, mode_pad, rotated_taps
from mulut_tpu.utils.profiling import device_time

which = sys.argv[1:] if len(sys.argv) > 1 else ["ypad", "ymr", "ynorank_mr", "ynorank_vmajor", "sdfma"]

scale, stages, modes, interval = 4, 2, "sdy", 4
L = 17
L4 = L ** 4
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

img = jnp.asarray(rng.integers(0, 256, (B, 3, H, W), dtype=np.int64), jnp.int32)
chk = jnp.asarray(rng.integers(0, 256, (1, 40, 56), dtype=np.int64), jnp.int32)
exp = np.load("/tmp/r3_expected.npy")

base_tabs = prepare_expanded_luts_cached(luts, interval=interval)  # host np
perms = [lane_rotation_perm(4, r) for r in range(4)]


def build_y(kind):
    arr = luts["s2_y"]
    if kind == "rank":
        return None  # keep base
    if kind == "rankpad":
        t = st.rank_expand_rotations(arr, perms, interval)   # (4, L4*24, 80)
        return np.pad(t, ((0, 0), (0, 0), (0, 48)))          # 128 B rows
    e = st.expand_lut(arr, interval)                         # (L4, 16, 16)
    if kind == "norank":
        return np.stack([e[:, :, p].reshape(L4, -1) for p in perms])
    if kind == "norank_vmajor":
        return np.stack(
            [np.ascontiguousarray(
                e[:, :, p].transpose(0, 2, 1)).reshape(L4, -1)
             for p in perms]
        )
    raise ValueError(kind)


def make_quad(style):
    """Patched rotation_ensemble_lanes_quad_int for stage-2 y."""

    def quad(lut, img_, *, mode, upscale, interval, fused=True, rank=False):
        v = upscale * upscale
        if v == 1:  # stage-1 y: untouched base path
            return ens_orig_quad(lut, img_, mode=mode, upscale=upscale,
                                 interval=interval, fused=fused, rank=rank)
        pad = mode_pad(mode)
        xp = ens._pad_all(img_, pad)
        h, w = img_.shape[-2], img_.shape[-1]
        planes4 = [
            [xp[..., pad + dy: pad + dy + h, pad + dx: pad + dx + w]
             for dy, dx in rotated_taps(mode, r)]
            for r in range(4)
        ]
        lead = planes4[0][0].shape
        n = int(np.prod(lead))
        out = None
        for r in range(4):
            base, fr = sx._base_and_fracs(planes4[r], interval=interval)
            if style in ("rankpad", "rank_mr"):
                lam = sx.sorted_weights(*fr, interval=interval)
                terms = lut.shape[-1] // v
                if terms > 5:
                    lam = jnp.pad(lam, ((0, 0), (0, terms - 5)))
                g = jnp.take(lut[r], base * 24 + sx._lehmer_code(*fr), axis=0)
                g3 = g.reshape(n, terms, v).astype(jnp.float32)
                if style == "rank_mr":
                    o = (lam[:, :, None] * g3).sum(axis=1)
                else:
                    o = jnp.einsum("nm,nmv->nv", lam, g3)
            else:
                lam = sx.corner_lams(*fr, interval=interval)   # (N, 16)
                g = jnp.take(lut[r], base, axis=0)             # (N, 256)
                if style == "norank_mr":
                    g3 = g.reshape(n, 16, v).astype(jnp.float32)
                    o = (lam[:, :, None] * g3).sum(axis=1)
                elif style == "norank_vmajor":
                    g3 = g.reshape(n, v, 16).astype(jnp.float32)
                    o = jnp.einsum("nm,nvm->nv", lam, g3)
                else:
                    raise ValueError(style)
            out = o if out is None else out + o
        return out.astype(jnp.int32).reshape(*lead, v)

    return quad


ens_orig_quad = ens.rotation_ensemble_lanes_quad_int
ens_orig_folded = ens.rotation_ensemble_lanes_folded_int


def folded_fma(flut, img_, *, mode, upscale, interval, fused=True, rank=False):
    """s/d fused-flat with per-term slice FMA (no einsum transpose)."""
    from mulut_tpu.ops.taps import fold_geometry, mode_taps

    v = upscale * upscale
    if v == 1 or not rank:
        return ens_orig_folded(flut, img_, mode=mode, upscale=upscale,
                               interval=interval, fused=fused, rank=rank)
    geo = fold_geometry(mode)
    pad = mode_pad(mode)
    xp = ens._pad_all(img_, pad)
    h, w = img_.shape[-2], img_.shape[-1]
    my = -min(s_[0] for s_, _ in geo)
    mx = -min(s_[1] for s_, _ in geo)
    he, we = h + my, w + mx
    planes = [
        xp[..., pad - my + dy: pad - my + dy + he,
           pad - mx + dx: pad - mx + dx + we]
        for dy, dx in mode_taps(mode)
    ]
    lead = planes[0].shape
    n_ext = int(np.prod(lead))
    dmax = my * we + mx
    base, fr = sx._base_and_fracs(planes, interval=interval)
    lam = sx.sorted_weights(*fr, interval=interval)          # (N, 5)
    g = jnp.take(flut, base * 24 + sx._lehmer_code(*fr), axis=0)  # (N,384)
    width = 4 * v
    ext = None
    for k in range(5):
        term = lam[:, k][:, None] * g[:, k * width:(k + 1) * width].astype(
            jnp.float32)
        ext = term if ext is None else ext + term
    ext = ext.astype(jnp.int32)
    m_rows = n_ext - dmax
    acc = None
    for r, ((sy, sx_), _) in enumerate(geo):
        d = (sy + my) * we + (sx_ + mx)
        piece = ext[d: d + m_rows, r * v: (r + 1) * v]
        acc = piece if acc is None else acc + piece
    acc = jnp.pad(acc, ((0, n_ext - m_rows), (0, 0)))
    return acc.reshape(*lead, v)[..., :h, :w, :]


CONFIGS = {
    "base":          (None, None, None),
    "ypad":          ("rankpad", "rankpad", None),
    "ymr":           (None, "rank_mr", None),
    "ynorank_mr":    ("norank", "norank_mr", None),
    "ynorank_vmajor": ("norank_vmajor", "norank_vmajor", None),
    "sdfma":         (None, None, "fma"),
}

for cfg in which:
    ykind, style, sd = CONFIGS[cfg]
    tabs = dict(base_tabs)
    if ykind:
        t0 = time.perf_counter()
        tabs["s2_y"] = build_y(ykind)
        print(f"[{cfg}] y build {time.perf_counter()-t0:.0f}s "
              f"{tabs['s2_y'].shape}", flush=True)
    ens.rotation_ensemble_lanes_quad_int = (
        make_quad(style) if style else ens_orig_quad
    )
    ens.rotation_ensemble_lanes_folded_int = (
        folded_fma if sd else ens_orig_folded
    )

    @jax.jit
    def run(tabs_, x):
        return lut_cascade_int(
            tabs_, x, stages=stages, modes=modes, scale=scale,
            interval=interval, expanded=True,
        ).astype(jnp.uint8)

    t0 = time.perf_counter()
    dtabs = jax.device_put(tabs)
    got = np.asarray(run(dtabs, chk)).astype(np.int32)
    ok = "MATCH" if np.array_equal(got, exp) else "MISMATCH!!"
    print(f"[{cfg}] compile+check {time.perf_counter()-t0:.0f}s {ok}",
          flush=True)
    dt = device_time(lambda: run(dtabs, img), n=3)
    print(f"[{cfg}] {dt*1e3:.1f} ms/batch = {B*H*W*16/1e6/dt:.1f} MPix/s",
          flush=True)
    del dtabs
