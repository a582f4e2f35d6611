"""Pallas TPU kernel: fused assembly tail for the final LUT-cascade stage.

The XLA lowering of the cascade's tail — rotation un-shifts of the flat
per-mode contraction outputs, the stage mix, the PixelShuffle interleave
and the uint8 cast — costs ~45 ms per 8x1080p batch in layout machinery:
the flat (N, 16) einsum results get retiled through 16-step while-loops,
the interleave is a relayout copy, and the uint8 output another.  This
kernel does all of it in one pass over row blocks held in VMEM
(ref behavior: sr/4_test_lut.py:293-306 — the rotation/mode averaging,
rounding and output assembly of the reference engine's final stage):

  * inputs are the TRANSPOSED flat per-mode contraction buffers — pure
    bitcasts of the einsum outputs' natural {0,1} layout, zero copies;
  * rotation un-shifts become static lane offsets into per-step DMA'd
    row segments (double-buffered);
  * non-symmetric (y/h/o) modes gather from ONE shared un-permuted rank
    table (the four per-rotation tables differ only by the baked output
    lane permutation); the un-rotation is a static sublane read order —
    free — and the shared table costs 4x less HBM;
  * the exact stage mix (clip + round-half-even, ensemble.stage_mix
    semantics) runs in f32 (exact below 2**24);
  * the 4 output sub-pixels of each pixel quad are packed into one u32
    lane, making the device output's byte order EQUAL to the final
    row-major uint8 image — the host "interleave" is a free view
    (`unpack_u32`).

Only supported for upscale == 4 (the u32 packing is 4 bytes) on the TPU
backend; callers fall back to the pure-XLA `ensemble.lut_cascade_int`
otherwise.

Measured (v5e, 8x 480x270 -> 1080p, bit-exact vs the golden PNGs):
270 ms (r2 best XLA) -> 232 ms wall with this kernel; see PERF.md.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ensemble as ens
from . import simplex as sx
from .taps import (
    fold_geometry,
    lane_rotation_perm,
    mode_pad,
    mode_taps,
    rotated_taps,
)


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


def _pad_ragged(img, pad: int, extra_cols: int):
    cfg = [(0, 0)] * (img.ndim - 2) + [(pad, pad), (pad, pad + extra_cols)]
    return jnp.pad(img, cfg, mode="edge")


def _padded_index_take(table, idx):
    """`jnp.take` with an 8-element index pad.

    A gather whose index length is already 1024-divisible skips XLA's
    pad_clamp fusion AND loses the S(1) (VMEM) placement of the ~13 MB
    index vector; HBM-resident indices HALVE the gather rate (measured
    43.6 vs 22.5 ms per stage-2 mode).  The 8 junk rows ride through the
    contraction (slicing them off would break the int8-direct einsum
    fusion) and are never read by the tail kernel's segment DMAs.

    mode="clip": jnp.take's default under jit is "fill", which emits a
    SELECT over the full gathered buffer (in-bounds mask x rows) — 16-18
    ms/batch of pure VPU+HBM waste at 8x1080p ("broadcast_select_fusion"
    ops in the trace).  Cascade indices are in-bounds by construction
    (base < L**4, junk pad rows gather row 0), so clip == fill here and
    the clamp fuses into the index computation for free.
    """
    return jnp.take(table, jnp.pad(idx, (0, 8)), axis=0, mode="clip")


def _pad8_base_fracs(base, fr):
    """Append the 8 junk rows at the INDEX/FRAC level, before the weight
    computation.

    Padding the materialized (C, N) f32 weight buffer afterwards costs a
    full-buffer copy (~0.64 ms per 213 MB buffer; 8 of them per bench
    batch in the r3 trace), whereas pads of the 1-D base/frac planes fuse
    into the gather's index computation and the weight fusion — zero
    copies.  Junk rows gather in-bounds (base 0) and get the frac-0
    weight vector; nothing downstream reads them (see
    `_padded_index_take`), and `jnp.take(mode="clip")` keeps its
    pad_clamp fusion because N+8 stays non-1024-divisible.
    """
    return jnp.pad(base, (0, 8)), tuple(jnp.pad(f, (0, 8)) for f in fr)


def _fold_kernel(s_ref, g_ref, w_ref, out_ref, *, u: int):
    """One row block of the weighted group-fold contraction.

    out[j, n] = sum_c w[c, n] * g[n, c*u + j], emitted transposed as
    (u, T) — the layout the tail kernel's segment DMAs read.  Two cheap
    stages, both exact:

      W = w^T "TN"@ S  # (T, C*u): broadcast weight c across its u-lane
                       # group.  One dot_general contracting dim 0 of
                       # both operands — the MXU absorbs the transpose,
                       # so the (C, T) natural-layout weight block needs
                       # no in-kernel relayout.  Exact at DEFAULT (bf16)
                       # precision: each S column is one-hot (a single
                       # product, no accumulation) and the weights are
                       # integers <= 2**interval.
      P = f32(g) * W   # one elementwise pass over the C*u lanes
      out = sum of the C static u-lane slices of P (VPU adds of
      integer-valued f32, |sums| <= 127 * 2**interval — exact)

    This shape deliberately contains NO reduction matmul: a (u, C*u)
    selector contraction puts M=u=16..64 on the MXU at 1/8-1/2 lane
    utilization under 6-pass HIGHEST f32 — measured 10.1 ms per
    rotation buffer (git history: contract_vn v1) vs ~1 ms for the
    slice adds.  Weights arrive as a TRANSPOSED (C, N) input: they
    derive from 1-D frac arrays whose sort-network fusion XLA runs at
    full lane utilization, and the transposed orientation keeps every
    XLA-side touch (pad, fuse) at full 128-lane density — the v1
    kernel's (N, C) weight input cost ~47 ms/batch in 6-lane-wide pads
    and {0,1}->{1,0} copies (git history: contract_vn v1); rebuilding
    weights in-kernel at (T, 16) shapes ran at 16/128 lane utilization
    and cost 22 ms per buffer (git history: contract16_vn v2).
    """
    W = jax.lax.dot_general(
        w_ref[...], s_ref[...], (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT)             # (T, C*u)
    p = g_ref[...].astype(jnp.float32) * W
    CW = p.shape[1]
    if u < 128 and 128 % u == 0 and CW % 128 == 0 and \
            (CW // 128) & (CW // 128 - 1) == 0:
        # Tree fold in full-128-lane space: sub-128-lane slice adds cost
        # a Mosaic lane relayout EACH (u=16: 15 adds measured 13.3 ms vs
        # 4.1 for the whole u=64 kernel on a 1.5x BIGGER buffer).  Halve
        # down to one lane tile, then a log2(128/u) rotate-add ladder;
        # wrapped upper lanes are garbage but only [:u] is read.  All
        # sums are integer-valued f32 < 2**24 — exact in any order.
        h = p
        while h.shape[1] > 128:
            half = h.shape[1] // 2
            h = h[:, :half] + h[:, half:]
        s = 64
        while s >= u:
            # roll left by s == roll right by 128 - s (pltpu.roll only
            # accepts non-negative shifts)
            h = h + pltpu.roll(h, shift=128 - s, axis=1)
            s //= 2
        h = h[:, :u]
    else:
        h = p[:, :u]
        for c in range(1, CW // u):
            h = h + p[:, c * u:(c + 1) * u]
    out_ref[...] = h.T                                   # (u, T)


@functools.lru_cache(maxsize=None)
def _selectors(C: int, v: int):
    k = np.arange(C * v)
    S = np.zeros((C, C * v), np.float32)
    S[k // v, k] = 1.0
    B = np.zeros((v, C * v), np.float32)
    B[k % v, k] = 1.0
    return S, B


def _use_fold_kernel() -> bool:
    """Weighted group-fold Pallas contraction (MULUT_FOLD_KERNEL=0 to
    fall back to the XLA einsum lowering)."""
    return os.environ.get("MULUT_FOLD_KERNEL", "1") != "0"


def fold_contract(g, wt, *, C: int, u: int, interpret: bool = False,
                  T: int | None = None):
    """Fused (u, Np) f32 = einsum('cn,ncu->un', wt, f32(g)) Pallas pass.

    Replaces XLA's lowering of the post-gather weighted corner reduce,
    which (a) relayout-copies the gathered s8 rows {1,0}->{0,1} to feed
    its multiply_reduce fusion and (b) materializes an f32 CONVERTED
    copy of them — 13.5 + 8.1 ms of pure HBM traffic per bench batch in
    the stock engine config, plus 16 ms of multiply_reduce — while this
    kernel reads the gathered rows once, in their natural gather layout.
    Weights wt are TRANSPOSED (C, Np) and must already carry the +8
    zero junk lanes (both callers pad), which keeps junk output rows
    zero exactly like the einsum.
    """
    if T is None:
        T = int(os.environ.get("MULUT_FOLD_T", "4096"))
    Np = g.shape[0]
    S, _ = _selectors(C, u)
    return pl.pallas_call(
        functools.partial(_fold_kernel, u=u),
        out_shape=jax.ShapeDtypeStruct((u, Np), jnp.float32),
        grid=(pl.cdiv(Np, T),),
        in_specs=[
            pl.BlockSpec((C, C * u), lambda i: (0, 0)),
            pl.BlockSpec((T, C * u), lambda i: (i, 0)),
            pl.BlockSpec((C, T), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((u, T), lambda i: (0, i)),
        compiler_params=None if interpret else pltpu.CompilerParams(
            # see tail_assemble: an uncapped pallas VMEM reservation
            # halves XLA's scoped-VMEM grants to the gather fusions
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray(S), g, wt)


def _contract(g, fr, *, C: int, v: int, interval: int):
    """Dispatch the flat contraction: the group-fold Pallas kernel by
    default (interpret mode off-TPU, keeping CI parity coverage), the
    XLA einsum lowering under MULUT_FOLD_KERNEL=0.

    Takes the raw frac planes and builds the weight array in the
    orientation the chosen lowering wants: (N, C) for the einsum (its
    historical form — XLA fuses it into the multiply_reduce), TRANSPOSED
    (C, N) for the kernel (full-lane-density pads, no relayout copy —
    see `_fold_kernel`).  C == 16 selects the 16-corner weight form
    (`corner_lams`), anything else the rank/simplex form
    (`sorted_weights`, zero-padded up to C columns).

    The kernel output is (v, Np); the `.T` restores this function's
    (Np, v) contract and cancels against `tail_assemble`'s `ext.T`
    (transpose-of-transpose folds away in the HLO simplifier).
    """
    if _use_fold_kernel():
        if C == 16:
            wt = sx.corner_lams_t(*fr, interval=interval)
        else:
            wt = sx.sorted_weights_t(*fr, interval=interval)
        # Junk-row pad only when the caller passed unpadded fracs (the
        # callers in this module pre-pad via _pad8_base_fracs, making
        # this a no-op that XLA elides).
        wt = jnp.pad(wt, ((0, C - wt.shape[0]),
                          (0, g.shape[0] - wt.shape[1])))
        interp = jax.default_backend() != "tpu"
        return fold_contract(g, wt, C=C, u=v, interpret=interp).T
    if C == 16:
        lam = sx.corner_lams(*fr, interval=interval)
    else:
        lam = sx.sorted_weights(*fr, interval=interval)
    lam = jnp.pad(lam, ((0, g.shape[0] - lam.shape[0]),
                        (0, C - lam.shape[1])))
    return jnp.einsum(
        "nm,nmv->nv", lam, g.reshape(-1, C, v).astype(jnp.float32)
    )


def _contract_t(g, fr, *, C: int, u: int, interval: int):
    """Like `_contract` but emits the TRANSPOSED (u, Np) orientation.

    Consumers that slice per-rotation 1-D pieces out of the result (the
    stage-1 un-shift adds) want the (u, Np) layout the fold kernel
    produces natively — taking `_contract`'s (Np, u) would reintroduce a
    transpose copy of the full buffer.
    """
    if _use_fold_kernel():
        wt = sx.corner_lams_t(*fr, interval=interval)
        wt = jnp.pad(wt, ((0, C - wt.shape[0]),
                          (0, g.shape[0] - wt.shape[1])))
        interp = jax.default_backend() != "tpu"
        return fold_contract(g, wt, C=C, u=u, interpret=interp)
    lam = sx.corner_lams(*fr, interval=interval)
    lam = jnp.pad(lam, ((0, g.shape[0] - lam.shape[0]),
                        (0, C - lam.shape[1])))
    return jnp.einsum(
        "nm,nmu->un", lam, g.reshape(g.shape[0], C, u).astype(jnp.float32)
    )


def stage1_fold_k128(tab, img, *, mode: str, interval: int):
    """Inner-stage (v == 1) rotation ensemble of a symmetric mode via the
    group-fold kernel over a 128-lane table.

    `tab` is the (L**4, 128) int8 k128 layout
    (`prepare_expanded_luts(k128_stage1=True)`): corner m's four rotation
    values sit in lanes [m*8, m*8+4).  One gather + one `fold_contract`
    (C=16, u=8) pass yields the (8, N) per-rotation extended-plane values
    (rows 4..7 exactly zero); rotation un-shifts are 1-D shifted slice
    adds on the minor axis — no layout copies, converts or
    multiply_reduce passes (together ~16 ms per 8x1080p batch in the XLA
    lowering this replaces).  Returns the rotation-summed (..., h, w) f32
    accumulator (integer-valued; bit-identical to
    `ensemble.rotation_ensemble_lanes_folded_int`).
    """
    geo = fold_geometry(mode)
    pad = mode_pad(mode)
    h, w = img.shape[-2], img.shape[-1]
    my = -min(s_[0] for s_, _ in geo)
    mx = -min(s_[1] for s_, _ in geo)
    he, we = h + my, w + mx
    xp = _pad_ragged(img, pad, 0)
    planes = [
        xp[..., pad - my + dy: pad - my + dy + he,
           pad - mx + dx: pad - mx + dx + we]
        for dy, dx in mode_taps(mode)
    ]
    lead = planes[0].shape
    n_ext = int(np.prod(lead))
    base, fr = sx._base_and_fracs(planes, interval=interval)
    base, fr = _pad8_base_fracs(base, fr)
    g = jnp.take(tab, base, axis=0, mode="clip")
    ext = _contract_t(g, fr, C=16, u=8, interval=interval)  # (8, n_ext+8)
    dmax = my * we + mx
    m_rows = n_ext - dmax
    acc = None
    for r, ((sy, sx_), _) in enumerate(geo):
        d = (sy + my) * we + (sx_ + mx)
        piece = ext[r, d: d + m_rows]
        acc = piece if acc is None else acc + piece
    acc = jnp.pad(acc, (0, n_ext - m_rows))
    return acc.reshape(lead)[..., :h, :w]


def stage1_quad_k128(tab, img, *, mode: str, interval: int):
    """Inner-stage (v == 1) rotation ensemble of a non-symmetric mode via
    the group-fold kernel over a shared 128-lane table.

    `tab` is the (L**4, 128) int8 k128 layout (corner m's value in lane
    m*8, other lanes zero; at v == 1 there is no output-lane permutation,
    so one table serves all four rotations).  Each rotation gathers with
    its own pre-rotated taps and contracts to row 0 of the (8, N) kernel
    output; the rotation sum is four full-lane-density 1-D adds.
    Replaces the XLA path's four {1,0}->{0,1} s32 layout copies (~10 ms
    per 8x1080p batch).  Returns (..., h, w) f32 (integer-valued;
    bit-identical to `ensemble.rotation_ensemble_lanes_quad_int`).
    """
    pad = mode_pad(mode)
    h, w = img.shape[-2], img.shape[-1]
    xp = _pad_ragged(img, pad, 0)
    lead = None
    acc = None
    for r in range(4):
        planes = [
            xp[..., pad + dy: pad + dy + h, pad + dx: pad + dx + w]
            for dy, dx in rotated_taps(mode, r)
        ]
        lead = planes[0].shape
        n = int(np.prod(lead))
        base, fr = sx._base_and_fracs(planes, interval=interval)
        base, fr = _pad8_base_fracs(base, fr)
        g = jnp.take(tab, base, axis=0, mode="clip")
        ext = _contract_t(g, fr, C=16, u=8, interval=interval)  # (8, n+8)
        piece = ext[0, :n]
        acc = piece if acc is None else acc + piece
    return acc.reshape(lead)


def folded_flat(flut, img, *, mode: str, v: int, interval: int):
    """Flat rank-folded contraction of a 90-degree-symmetric mode.

    Evaluates the extended window plane with ONE extra junk row and a
    128-aligned width (junk columns) so every tail-kernel DMA row start
    `(bc*he + y) * we` is 128-divisible.  Returns
    (ext (n_ext+8, 4v) f32, he, we, unshift offsets).
    """
    geo = fold_geometry(mode)
    pad = mode_pad(mode) + 1
    h, w = img.shape[-2], img.shape[-1]
    my = -min(s_[0] for s_, _ in geo)
    mx = -min(s_[1] for s_, _ in geo)
    he = h + my + 1
    we = _pad128(w + mx)
    xp = _pad_ragged(img, pad, we - (w + mx))
    planes = [
        xp[..., pad - my + dy: pad - my + dy + he,
           pad - mx + dx: pad - mx + dx + we]
        for dy, dx in mode_taps(mode)
    ]
    n_ext = int(np.prod(planes[0].shape))
    base, fr = sx._base_and_fracs(planes, interval=interval)
    base, fr = _pad8_base_fracs(base, fr)
    terms = flut.shape[1] // (4 * v)
    if terms == 16:
        # 16-corner folded table (simplex_tables.fold_lut): row `base`
        # holds all 16 hypercube corners of all 4 rotations; weights are
        # the per-pixel corner_lams (chosen by _contract via C == 16).
        g = jnp.take(flut, base, axis=0, mode="clip")
    else:
        g = jnp.take(
            flut, sx._lehmer_code(*fr) * (flut.shape[0] // 24) + base,
            axis=0, mode="clip",
        )
    ext = _contract(g, fr, C=terms, v=4 * v, interval=interval)
    offs = [(sy + my) * we + (sx_ + mx) for (sy, sx_), _ in geo]
    return ext, he, we, offs


def quad_flat(lut, img, *, mode: str, v: int, interval: int):
    """Flat per-rotation contractions of a non-symmetric mode over ONE
    shared un-permuted table.

    Two table formats, keyed by row width:
      * rank-expanded (`simplex_tables.rank_expand_shared`, 5*v wide):
        row `lehmer(rank)*L**4 + base` holds the 5 simplex-chain corners;
      * 16-corner (`simplex_tables.expand_lut` flat, 16*v wide): row
        `base` holds all 16 hypercube corners with the per-pixel
        `corner_lams` weight vector (11 of 16 weights are zero).  The
        16-corner table is 7.5x smaller (21 MB vs 160 MB at interval 4),
        which gathers ~1.9x faster per row on v5e (big-table locality).

    Returns ([four (N+8, v) f32 buffers in un-permuted lane order], wy);
    evaluated over h+1 rows x 128-aligned width (junk, see folded_flat).
    """
    pad = mode_pad(mode) + 1
    h, w = img.shape[-2], img.shape[-1]
    hy = h + 1
    wy = _pad128(w)
    xp = _pad_ragged(img, pad, wy - w)
    terms = lut.shape[-1] // v
    outs = []
    for r in range(4):
        planes = [
            xp[..., pad + dy: pad + dy + hy, pad + dx: pad + dx + wy]
            for dy, dx in rotated_taps(mode, r)
        ]
        base, fr = sx._base_and_fracs(planes, interval=interval)
        base, fr = _pad8_base_fracs(base, fr)
        if terms == 16:
            g = jnp.take(lut, base, axis=0, mode="clip")
        else:
            g = jnp.take(
                lut, sx._lehmer_code(*fr) * (lut.shape[0] // 24) + base,
                axis=0, mode="clip",
            )
        outs.append(_contract(g, fr, C=terms, v=v, interval=interval))
    return outs, wy


def _tail_kernel(R, h, wp, scale, davg, fold_geos, quad_geos, *refs):
    """fold_geos: per folded mode (he, we, offsets); quad_geos: per quad
    mode (wy, perms).  refs layout: one hbm ref per folded mode, four per
    quad mode, out_hbm, then scratch (one per folded, one per quad, obuf,
    sems)."""
    nf = len(fold_geos)
    nq = len(quad_geos)
    v = scale * scale
    f_hbm = refs[:nf]
    q_hbm = [refs[nf + 4 * i: nf + 4 * (i + 1)] for i in range(nq)]
    out_hbm = refs[nf + 4 * nq]
    sc0 = nf + 4 * nq + 1
    f_buf = refs[sc0: sc0 + nf]
    q_buf = refs[sc0 + nf: sc0 + nf + nq]
    obuf = refs[sc0 + nf + nq]
    sems = refs[sc0 + nf + nq + 1]

    bc = pl.program_id(0)
    yb = pl.program_id(1)
    nyb = pl.num_programs(1)
    step = bc * nyb + yb
    slot = jax.lax.rem(step, 2)
    n_copies = nf + 4 * nq

    def issue(st, sl):
        b = st // nyb
        y0_ = (st - b * nyb) * R
        k = 0
        for i, (he, we, _) in enumerate(fold_geos):
            pltpu.make_async_copy(
                f_hbm[i].at[:, pl.ds((b * he + y0_) * we,
                                     f_buf[i].shape[2])],
                f_buf[i].at[sl], sems.at[sl, k]).start()
            k += 1
        for i, (wy, _) in enumerate(quad_geos):
            for r in range(4):
                pltpu.make_async_copy(
                    q_hbm[i][r].at[:, pl.ds((b * (h + 1) + y0_) * wy,
                                            q_buf[i].shape[3])],
                    q_buf[i].at[sl, r], sems.at[sl, k]).start()
                k += 1

    @pl.when(step == 0)
    def _():
        issue(step, slot)

    @pl.when(step + 1 < pl.num_programs(0) * nyb)
    def _():
        issue(step + 1, jax.lax.rem(step + 1, 2))

    # wait for this step's copies (dummy copy objects: wait() only
    # decrements the semaphore by the matching byte count)
    k = 0
    for i in range(nf):
        pltpu.make_async_copy(
            f_hbm[i].at[:, pl.ds(0, f_buf[i].shape[2])],
            f_buf[i].at[slot], sems.at[slot, k]).wait()
        k += 1
    for i in range(nq):
        for r in range(4):
            pltpu.make_async_copy(
                q_hbm[i][0].at[:, pl.ds(0, q_buf[i].shape[3])],
                q_buf[i].at[slot, r], sems.at[slot, k]).wait()
            k += 1

    for yy in range(R):
        acc = None
        for i, (wy, perms) in enumerate(quad_geos):
            for r in range(4):
                # un-rotation = static sublane read order (shared table
                # carries no baked lane permutation)
                rows = [
                    q_buf[i][slot, r, perms[r][vv],
                             yy * wy: yy * wy + wp][None, :]
                    for vv in range(v)
                ]
                piece = jnp.concatenate(rows, axis=0)
                acc = piece if acc is None else acc + piece
        for i, (he, we, offs) in enumerate(fold_geos):
            for r, d_r in enumerate(offs):
                piece = f_buf[i][slot, r * v:(r + 1) * v,
                                 yy * we + d_r: yy * we + d_r + wp]
                acc = piece if acc is None else acc + piece
        # exact stage mix: clip + round-half-even(/davg), all f32-exact
        n = jnp.clip(acc, 0.0, 255.0 * davg)
        quo = jnp.floor(n / davg)
        rem = n - quo * davg
        odd = quo - 2.0 * jnp.floor(quo * 0.5)
        up = ((2.0 * rem > davg) |
              ((2.0 * rem == davg) & (odd == 1.0))).astype(jnp.float32)
        vi = (quo + up).astype(jnp.int32)                     # (16, wp)
        packed = None
        for px in range(scale):
            part = jnp.concatenate(
                [vi[scale * py + px: scale * py + px + 1, :]
                 for py in range(scale)],
                axis=0,
            ) << (8 * px)                                     # (4, wp)
            packed = part if packed is None else packed | part
        obuf[yy, :, :] = packed.astype(jnp.uint32)
    cpo = pltpu.make_async_copy(
        obuf, out_hbm.at[pl.ds(bc * h + yb * R, R)],
        sems.at[slot, n_copies])
    cpo.start()
    cpo.wait()


def tail_assemble(folded, quads, *, lead, h, w, scale, davg,
                  interpret=False):
    """Assemble the final stage from flat mode buffers.

    folded: list of (ext, he, we, offs) from `folded_flat`;
    quads: list of ([4 x (N+8, v) f32], wy, perms) from `quad_flat`.
    Returns PACKED u32 (prod(lead) * h, scale, wp) — see `unpack_u32`.
    """
    bc = int(np.prod(lead)) if lead else 1
    v = scale * scale
    R = max(r for r in range(1, 9) if h % r == 0)
    wp = _pad128(w)

    args = []
    in_specs = []
    scratch = []
    fold_geos = []
    for ext, he, we, offs in folded:
        my = he - h - 1
        # rows y0 .. y0+R-1+my contribute; the junk row + junk columns
        # guarantee the 128-aligned round-up stays inside the bc block
        L = _pad128((R - 1 + my) * we + wp + (we - w))
        args.append(ext.T)             # bitcast of the {0,1} einsum out
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch.append(pltpu.VMEM((2, 4 * v, L), jnp.float32))
        fold_geos.append((he, we, tuple(offs)))
    quad_geos = []
    for outs, wy, perms in quads:
        Lq = _pad128((R - 1) * wy + wp)
        for o in outs:
            args.append(o.T)
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch.append(pltpu.VMEM((2, 4, v, Lq), jnp.float32))
        quad_geos.append(
            (wy, tuple(tuple(int(x) for x in p_) for p_ in perms))
        )
    scratch.append(pltpu.VMEM((R, scale, wp), jnp.uint32))
    n_copies = len(folded) + 4 * len(quads)
    scratch.append(pltpu.SemaphoreType.DMA((2, n_copies + 1)))

    kern = functools.partial(
        _tail_kernel, R, h, wp, scale, float(davg),
        tuple(fold_geos), tuple(quad_geos),
    )
    blocks_per_bc = h // R
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bc * h, scale, wp), jnp.uint32),
        grid=(bc, blocks_per_bc),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # cap the kernel's VMEM reservation: the pallas default budget
            # halves XLA's scoped-VMEM grants to the gather fusions
            # program-wide (gathers drop from 256- to 128-row staging)
            vmem_limit_bytes=6 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def supports_tail_kernel(modes: str, scale: int, *, interval: int = 4,
                         interpret: bool = False) -> bool:
    """The kernel covers x4 (u32 = 4 packed sub-pixels) on sdy-class
    mode sets where every mode is either 90-degree-symmetric (s/d/e,
    rank-folded tables) or non-symmetric (y/h/o, shared rank table)."""
    if scale != 4 or interval != 4:
        return False
    if not (interpret or jax.default_backend() == "tpu"):
        return False
    return all(m in "sdeyho" for m in modes)


def lut_cascade_packed(tabs, img, *, stages: int, modes: str, scale: int,
                       interval: int = 4, valid_hw=None, interpret=False):
    """Full cascade with the final stage assembled by the Pallas tail
    kernel; returns PACKED u32 (B*C*h, scale, wp) — `unpack_u32` on the
    host yields the uint8 image for free (byte view).

    `tabs` must be `ensemble.prepare_expanded_luts(..., shared_quad=True)`
    tables: rank-folded for symmetric modes, one SHARED un-permuted rank
    table for non-symmetric modes.  Bit-identical to
    `ensemble.lut_cascade_int` (same per-rotation integer semantics,
    ref: sr/4_test_lut.py:263-306).
    """
    q = 2 ** interval
    x = img.astype(jnp.int32)
    for s in range(stages - 1):
        if valid_hw is not None:
            x = ens.clamp_pad_region(x, valid_hw)
        acc = None
        for mode in modes:
            lut = tabs[f"s{s + 1}_{mode}"]
            # (L**4, 128) int8 = the k128 kernel layout (see
            # prepare_expanded_luts k128_stage1); the standard v == 1
            # forms are 64 lanes (folded) / 16 int32 (quad), so the
            # width+dtype test is unambiguous.
            k128 = (lut.ndim == 2 and lut.shape[-1] == 128
                    and lut.dtype == jnp.int8)
            if k128 and fold_geometry(mode) is not None:
                out = stage1_fold_k128(lut, x, mode=mode, interval=interval)
            elif k128:
                out = stage1_quad_k128(lut, x, mode=mode, interval=interval)
            elif fold_geometry(mode) is not None:
                out = ens.rotation_ensemble_lanes_folded_int(
                    lut, x, mode=mode, upscale=1, interval=interval,
                )[..., 0]
            else:
                out = ens.rotation_ensemble_lanes_quad_int(
                    lut, x, mode=mode, upscale=1, interval=interval,
                )[..., 0]
            acc = out if acc is None else acc + out
        # k128 contributions are integer-valued f32 (< 2**24 — exact);
        # the mix runs on the int accumulator either way.
        acc = acc.astype(jnp.int32)
        x = ens.stage_mix(acc, q=q, avg_factor=len(modes) * 4, bias=127)
    if valid_hw is not None:
        x = ens.clamp_pad_region(x, valid_hw)
    v = scale * scale
    folded, quads = [], []
    for mode in modes:
        lut = tabs[f"s{stages}_{mode}"]
        # A (L**4, 16*v) shared 16-corner table routes through the quad
        # path even for foldable modes (prepare_expanded_luts
        # corner16_modes: trades the rotation-fold for 4 gathers from a
        # VMEM-pinnable 21.4 MB table).  Folded tables are wider
        # (rank_fold >= 20*v tile-padded, fold_lut 64*v), so the width
        # test is unambiguous.
        corner16 = lut.ndim == 2 and lut.shape[-1] == 16 * v
        if fold_geometry(mode) is not None and not corner16:
            folded.append(
                folded_flat(lut, x, mode=mode, v=v, interval=interval)
            )
        else:
            outs, wy = quad_flat(lut, x, mode=mode, v=v, interval=interval)
            perms = [lane_rotation_perm(scale, r) for r in range(4)]
            quads.append((outs, wy, perms))
    return tail_assemble(
        folded, quads, lead=x.shape[:-2], h=x.shape[-2], w=x.shape[-1],
        scale=scale, davg=q * len(modes), interpret=interpret,
    )


def unpack_u32_device(packed, lead, h: int, w: int, scale: int):
    """In-graph equivalent of `unpack_u32` (uint8 result stays on device).

    For fused programs that consume the cascade output inside the same
    jit (e.g. the device YUV pipeline): lax.bitcast_convert_type to uint8
    enumerates the u32 bytes little-endian exactly like the host byte
    view, so this is reshape-only — no arithmetic.
    """
    wp = packed.shape[-1]
    bc = int(np.prod(lead)) if lead else 1
    b = jax.lax.bitcast_convert_type(packed, jnp.uint8)  # (bc*h, scale, wp, 4)
    out = b.reshape(bc, h * scale, wp * scale)
    return out.reshape(*(tuple(lead) + (h * scale, wp * scale)))[
        ..., : w * scale]


def unpack_u32(packed, lead, h: int, w: int, scale: int) -> np.ndarray:
    """Host-side free byte view of the packed kernel output.

    (prod(lead)*h, scale, wp) u32 -> (*lead, h*scale, w*scale) uint8.
    Little-endian u32 lanes hold the `scale` sub-pixels of one output
    quad, so the raw bytes ARE the row-major image (junk columns beyond
    w*scale cropped).
    """
    arr = np.asarray(packed)
    wp = arr.shape[-1]
    bc = int(np.prod(lead)) if lead else 1
    out = arr.view(np.uint8).reshape(bc, h, scale, wp * scale)
    out = out.reshape(*(tuple(lead) + (h * scale, wp * scale)))
    return np.ascontiguousarray(out[..., : w * scale])