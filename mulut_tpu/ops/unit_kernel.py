"""Pallas TPU kernel: fused MuLUT tap-MLP unit forward.

The XLA bf16 unit forward is activation-bandwidth-bound: every dense-concat
layer round-trips its (N, k*nf) activations through HBM.  This kernel keeps
the whole concat buffer in VMEM per row tile — head layer as 4 broadcast
mul-adds (a K=4 matmul is MXU-hostile), four MXU matmuls over the growing
concat, tanh output — for ~3.6x over XLA's bf16 lowering on a v5e
(717 vs 201 Mrow/s measured).

Used by the fast (bf16) deployment path; the f32/HIGHEST path for LUT
caching stays on `blocks.apply_mulut_unit` (exactness over speed).
Numerics match XLA's bf16 path to bf16 rounding (intermediate activations
are stored bf16 in both).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 2048
ENSEMBLE_TILE = 1024
#: tile for the FEATURE-major (transposed) plain kernel.  Under the
#: (nf, T) activation layout bigger tiles finally amortize per-matmul
#: overhead (the site-major sweeps were flat/negative): chip ladder at
#: the bench shape (fused YUV) — T=512: 38.3 ms, 1024: 26.5, 2048: 23.5,
#: **4096: 22.5**, 8192: 25.3, 16384: 24.7 (d3 same ordering).  The
#: site kernels OOM scoped VMEM at 4096; the transposed activations are
#: only nf x T bf16 = 1 MB.  Applies at nf <= 128 — the nf=256 shapes
#: are MXU-bound, not overhead-bound, and measured SLOWER at 4096
#: (57.5 vs 53.4 ms fused YUV); they keep ENSEMBLE_TILE.
ENSEMBLE_TILE_T = 4096
#: tile for the WINDOW kernel (`_plain_w_kernel`).  Chip ladder at the
#: bench shape with the rs schedule (r5): 1024: 19.5 ms, **2048: 18.8**,
#: 4096: 19.5 — the rs-fused matmuls are 4T wide, so the optimum sits a
#: step below the tap-matrix kernel's 4096.  MULUT_WINDOW_TILE pins it.
WINDOW_TILE_T = int(os.environ.get("MULUT_WINDOW_TILE", "2048"))


def _kernel(nf: int,
            t_ref, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, w6, b6,
            out_ref, cat):
    t = t_ref[:]                                       # (TILE, 4) bf16
    x = None
    for k in range(4):
        term = t[:, k : k + 1] * w1[k : k + 1, :]      # (TILE,1)*(1,nf)
        x = term if x is None else x + term
    x = jnp.maximum(x + b1[:][None, :], 0).astype(jnp.bfloat16)
    cat[:, 0:nf] = x
    for k, (w, b) in enumerate(
        ((w2, b2), (w3, b3), (w4, b4), (w5, b5)), start=1
    ):
        xk = jnp.dot(cat[:, 0 : nf * k], w[:],
                     preferred_element_type=jnp.float32)
        xk = jnp.maximum(xk + b[:][None, :].astype(jnp.float32), 0)
        cat[:, nf * k : nf * (k + 1)] = xk.astype(jnp.bfloat16)
    o = jnp.dot(cat[:, :], w6[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.tanh(o + b6[:][None, :].astype(jnp.float32)).astype(
        jnp.bfloat16
    )


@functools.partial(jax.jit, static_argnames=("out_dim",))
def fused_unit_apply(params: dict, taps, *, out_dim: int):
    """(N, 4) bf16 taps -> (N, out_dim) bf16 through a dense MuLUT unit.

    Args:
      params: bf16 unit params in the `blocks.init_mulut_unit(dense=True)`
        layout (w1 (4, nf) ... w6 (5*nf, out_dim)).
      taps: (N, 4) bfloat16; N is padded to a TILE multiple internally.
    """
    nf = params["w1"].shape[1]
    n = taps.shape[0]
    n_pad = -(-n // TILE) * TILE
    if n_pad != n:
        taps = jnp.pad(taps, [(0, n_pad - n), (0, 0)])

    # Pad the output head to a lane-friendly width (bf16 minor dims < 8 hit
    # Mosaic layout restrictions); callers slice back.
    out_pad = max(8, -(-out_dim // 8) * 8)
    w6, b6 = params["w6"], params["b6"]
    if out_pad != out_dim:
        w6 = jnp.pad(w6, [(0, 0), (0, out_pad - out_dim)])
        b6 = jnp.pad(b6, [(0, out_pad - out_dim)])

    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12
    out = pl.pallas_call(
        functools.partial(_kernel, nf),
        out_shape=jax.ShapeDtypeStruct((n_pad, out_pad), jnp.bfloat16),
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        ] + wspecs,
        out_specs=pl.BlockSpec((TILE, out_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TILE, 5 * nf), jnp.bfloat16)],
    )(
        taps, params["w1"], params["b1"], params["w2"], params["b2"],
        params["w3"], params["b3"], params["w4"], params["b4"],
        params["w5"], params["b5"], w6, b6,
    )
    return out[:n, :out_dim]


# ---------------------------------------------------------------------------
# Whole-stage ensemble kernel: all modes x all 4 rotations of one cascade
# stage in a single pass — per row tile, 4*M MLP passes run entirely in
# VMEM, output-lane un-rotation is baked into permuted w6 column blocks, and
# the reference's per-rotation round(127*out) accumulation happens in-kernel
# (ref: sr/1_train_model.py:26-45 semantics).  XLA sees only the (N, 16*M)
# tap matrix in and one (N, 16) accumulator out.
# ---------------------------------------------------------------------------


def stack_stage_params(params: dict, *, stage: int, modes: str, upscale: int,
                       out_pad: int = 16) -> dict:
    """Stack one stage's per-mode unit params for the ensemble kernel.

    Dense units return bf16 arrays w1 (M, 4, nf), ..., w6 (M, 5*nf,
    4*out_pad); plain (mxu-arch) units return w1/b1, hw (D, M, nf, nf) /
    hb (D, M, nf) stacked hidden layers, and w6 (M, nf, 4*out_pad).  In
    both, rotation r's w6 columns are pre-permuted by
    `lane_rotation_perm(upscale, r)` and zero-padded from upscale**2 to
    out_pad lanes.
    """
    import numpy as np

    from ..models.blocks import unit_layout
    from .taps import lane_rotation_perm

    dense, hidden = unit_layout(params[f"s{stage}_{modes[0]}"])
    st = {}
    if dense:
        names = ["w1", "b1"]
        for i in hidden:
            names += [f"w{i}", f"b{i}"]
        for name in names:
            st[name] = jnp.stack(
                [jnp.asarray(params[f"s{stage}_{m}"][name]) for m in modes]
            ).astype(jnp.bfloat16)
    else:
        for name in ("w1", "b1"):
            st[name] = jnp.stack(
                [jnp.asarray(params[f"s{stage}_{m}"][name]) for m in modes]
            ).astype(jnp.bfloat16)
        st["hw"] = jnp.stack([
            jnp.stack([jnp.asarray(params[f"s{stage}_{m}"][f"w{i}"])
                       for m in modes])
            for i in hidden
        ]).astype(jnp.bfloat16)                      # (D, M, nf, nf)
        st["hb"] = jnp.stack([
            jnp.stack([jnp.asarray(params[f"s{stage}_{m}"][f"b{i}"])
                       for m in modes])
            for i in hidden
        ]).astype(jnp.bfloat16)                      # (D, M, nf)
    v = upscale * upscale
    w6s, b6s = [], []
    for m in modes:
        w6 = np.asarray(params[f"s{stage}_{m}"]["w6"])
        b6 = np.asarray(params[f"s{stage}_{m}"]["b6"])
        cols, bs = [], []
        for r in range(4):
            perm = (lane_rotation_perm(upscale, r) if v > 1
                    else np.array([0]))
            wp, bp = w6[:, perm], b6[perm]
            if v < out_pad:
                wp = np.pad(wp, [(0, 0), (0, out_pad - v)])
                bp = np.pad(bp, [(0, out_pad - v)])
            cols.append(wp)
            bs.append(bp)
        w6s.append(np.concatenate(cols, axis=1))
        b6s.append(np.concatenate(bs))
    st["w6"] = jnp.asarray(np.stack(w6s), jnp.bfloat16)  # (M, 5nf, 4*out_pad)
    st["b6"] = jnp.asarray(np.stack(b6s), jnp.bfloat16)  # (M, 4*out_pad)
    return st


def pair_stage_params(stacked: dict, *, out_pad: int = 16) -> dict:
    """Rotation-PAIR block-diagonal weights from `stack_stage_params` output.

    Two rotations of a mode share each matmul: over an interleaved
    [A1 B1 A2 B2 ...] scratch layout (nf-wide blocks), layer k reads the
    CONTIGUOUS first 2*nf*(k-1) columns and writes a contiguous 2*nf
    block, with weights arranged block-diagonally (the off-diagonal
    zeros add exact zeros -> outputs bit-match the pass-major kernel).
    MXU unit accounting: L2..L5 cost 1+2+3+4 units per pair and the two
    heads 5 per pair = 7.5 units/pass vs the pass-major 9 (and full
    128-lane N at nf=64), raising the theoretical MFU cap from 31% to
    37.5% while halving the dependent-chain count.  See PERF.md.
    """
    if "hw" in stacked:
        raise ValueError(
            "pair_stage_params expects dense-unit stacks; plain/mxu units "
            "already run full-lane matmuls (see _plain_ensemble_kernel)"
        )
    nf = stacked["w1"].shape[2]
    M = stacked["w1"].shape[0]
    out = {"w1": stacked["w1"], "b1": stacked["b1"]}
    z = jnp.zeros((M, nf, nf), stacked["w2"].dtype)
    for k in range(2, 6):
        wk, bk = stacked[f"w{k}"], stacked[f"b{k}"]   # (M, nf(k-1), nf)
        blocks = []
        for j in range(k - 1):
            rows = wk[:, j * nf: (j + 1) * nf, :]
            blocks.append(jnp.concatenate([
                jnp.concatenate([rows, z], axis=2),
                jnp.concatenate([z, rows], axis=2),
            ], axis=1))
        out[f"w{k}"] = jnp.concatenate(blocks, axis=1)  # (M,2nf(k-1),2nf)
        out[f"b{k}"] = jnp.concatenate([bk, bk], axis=1)
    w6 = stacked["w6"]                                  # (M, 5nf, 4*out_pad)
    zp = jnp.zeros((M, nf, out_pad), w6.dtype)
    rsl = [w6[:, :, out_pad * r: out_pad * (r + 1)] for r in range(4)]
    blocks = []
    for j in range(5):
        rj = [r[:, j * nf: (j + 1) * nf, :] for r in rsl]
        blocks.append(jnp.concatenate([
            jnp.concatenate([rj[0], zp, rj[2], zp], axis=2),
            jnp.concatenate([zp, rj[1], zp, rj[3]], axis=2),
        ], axis=1))
    out["w6"] = jnp.concatenate(blocks, axis=1)         # (M,10nf,4*out_pad)
    out["b6"] = stacked["b6"]  # already [r0 r1 r2 r3] out_pad blocks
    return out


def _pair_ensemble_kernel(nf: int, n_modes: int, out_pad: int,
                          t_ref, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5,
                          w6, b6, out_ref, s0, s1):
    acc = jnp.zeros((t_ref.shape[0], out_pad), jnp.float32)
    scr = (s0, s1)
    for mi in range(n_modes):
        for p in range(2):
            for jr in range(2):
                r = 2 * p + jr
                col = (mi * 4 + r) * 4
                t = t_ref[:, col: col + 4]
                # VPU head, matching _ensemble_kernel (see note there)
                x = None
                for k in range(4):
                    term = t[:, k: k + 1] * w1[mi, k: k + 1, :]
                    x = term if x is None else x + term
                scr[p][:, nf * jr: nf * (jr + 1)] = jnp.maximum(
                    x + b1[mi][None, :], 0).astype(jnp.bfloat16)
        # layers 2..5: block-diagonal pair matmuls, the mode's two pairs
        # interleaved layer-major so consecutive matmuls are independent
        for k, (w, b) in enumerate(
            ((w2, b2), (w3, b3), (w4, b4), (w5, b5)), start=2
        ):
            kw = 2 * nf * (k - 1)
            for p in range(2):
                xk = jnp.dot(scr[p][:, 0:kw], w[mi, 0:kw, :],
                             preferred_element_type=jnp.float32)
                xk = jnp.maximum(xk + b[mi][None, :].astype(jnp.float32), 0)
                scr[p][:, kw:kw + 2 * nf] = xk.astype(jnp.bfloat16)
        for p in range(2):
            o = jnp.dot(scr[p][:, :],
                        w6[mi, :, 2 * out_pad * p: 2 * out_pad * (p + 1)],
                        preferred_element_type=jnp.float32)
            o = jnp.tanh(
                o + b6[mi, 2 * out_pad * p: 2 * out_pad * (p + 1)][None, :]
                .astype(jnp.float32))
            acc = acc + jnp.round(o[:, 0:out_pad] * 127.0)
            acc = acc + jnp.round(o[:, out_pad: 2 * out_pad] * 127.0)
    out_ref[:] = acc


def _ensemble_kernel(nf: int, n_modes: int, out_pad: int,
                     t_ref, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, w6, b6,
                     out_ref, cat):
    acc = jnp.zeros((t_ref.shape[0], out_pad), jnp.float32)
    for mi in range(n_modes):
        for r in range(4):
            col = (mi * 4 + r) * 4
            t = t_ref[:, col : col + 4]
            # dense kernels keep the VPU head: with the concat scratch
            # live, the MXU head's f32 dot raises the kernel's VMEM
            # stack past the 16 MB scoped budget (measured: 19.17M,
            # compile OOM) — and the dense path is not the deployment
            # flagship.  See _plain_head/PLAIN_HEAD for the plain-arch
            # story.
            x = None
            for k in range(4):
                term = t[:, k : k + 1] * w1[mi, k : k + 1, :]
                x = term if x is None else x + term
            x = jnp.maximum(x + b1[mi][None, :], 0).astype(jnp.bfloat16)
            cat[:, 0:nf] = x
            for li, (w, b) in enumerate(
                ((w2, b2), (w3, b3), (w4, b4), (w5, b5)), start=1
            ):
                xk = jnp.dot(cat[:, 0 : nf * li], w[mi],
                             preferred_element_type=jnp.float32)
                xk = jnp.maximum(xk + b[mi][None, :].astype(jnp.float32), 0)
                cat[:, nf * li : nf * (li + 1)] = xk.astype(jnp.bfloat16)
            o = jnp.dot(cat[:, :], w6[mi, :, out_pad * r : out_pad * (r + 1)],
                        preferred_element_type=jnp.float32)
            o = jnp.tanh(
                o + b6[mi, out_pad * r : out_pad * (r + 1)][None, :]
                .astype(jnp.float32)
            )
            acc = acc + jnp.round(o * 127.0)
    out_ref[:] = acc


#: Head-layer implementation for the PLAIN (mxu-arch) ensemble kernels
#: (the dense pass-major/pair kernels keep the VPU head — their concat
#: scratch plus an f32 head dot overflows scoped VMEM, measured compile
#: OOM at 19.17M/16M; the quantized kernels keep their own calibrated
#: heads): "vpu" (4 broadcast
#: bf16 FMAs — the original form; a K=4 matmul is FLOP-inefficient on the
#: MXU) or "mxu" (one (T, 4) x (4, nf) dot).  The r4 trace arithmetic
#: says the VPU head costs ~0.5 us/pass at T=1024 — ~half the d2 pass —
#: while the MXU runs the same head in ~0.14 us inside an already
#: drain-bound chain.  Not bit-identical to "vpu" (bf16 sequential sum
#: vs f32 MXU tree).  Chip A/B (r4, fused YUV mxu-d2 batch 8): mxu head
#: 35.3 ms vs vpu 44.8 — a 1.27x deployment win — with Set5 quality
#: EQUAL OR BETTER on the distilled weights (d2 30.425 vs 30.422, d3
#: 30.481 vs 30.472; the f32 MXU tree is more precise than the bf16
#: sequential sum), so "mxu" is the default.
PLAIN_HEAD = "mxu"


def _plain_head(t, w1_mi, b1_mi):
    """(T, 4) bf16 taps -> (T, nf) bf16 relu head for one mode."""
    if PLAIN_HEAD == "mxu":
        x = jnp.dot(t, w1_mi, preferred_element_type=jnp.float32)
        return jnp.maximum(
            x + b1_mi[None, :].astype(jnp.float32), 0).astype(jnp.bfloat16)
    x = None
    for k in range(4):
        term = t[:, k : k + 1] * w1_mi[k : k + 1, :]
        x = term if x is None else x + term
    return jnp.maximum(x + b1_mi[None, :], 0).astype(jnp.bfloat16)


def _apply_stage_mix(acc, mix, out_ref):
    """Optionally fold the cascade's stage mixing into the kernel epilogue.

    mix=None writes the raw rotation-rounded accumulator (the original
    contract).  mix=("inner", M) writes the INNER-stage result already
    mixed and renormalized — clip(round(acc/(4M) + 127), 0, 255)/255 —
    as bfloat16 (broadcast over the lane pad; consumers read lane 0), so
    XLA's separate stage-mix + bf16-cast fusions over the (N, 16) f32
    buffer disappear (~2.3 ms per 8x1080p YUV batch, r4 trace).
    mix=("final", M) writes round(acc / M) in f32 (the last-stage mix).
    The arithmetic is the exact op sequence of `srnets_predict_fast`, so
    outputs stay bit-identical.
    """
    if mix is None:
        out_ref[:] = acc
        return
    kind, m = mix
    if kind == "inner":
        mixed = jnp.clip(jnp.round(acc[:, :1] / (m * 4) + 127.0), 0, 255)
        out_ref[:] = jnp.broadcast_to(
            mixed / 255.0, acc.shape).astype(jnp.bfloat16)
    elif kind == "final_u8":
        # final mix + the consumer's clip(round(.), 0, 255) folded in,
        # emitted bf16 (integers <= 255 are exact in bf16): halves the
        # bytes of every downstream interleave copy and deletes the XLA
        # round/clamp fusion (~3 ms per 8x1080p YUV batch, r4 trace).
        # Identical final pixels: the downstream u8 cast clips anyway.
        out_ref[:] = jnp.clip(
            jnp.round(acc / m), 0, 255).astype(jnp.bfloat16)
    else:
        out_ref[:] = jnp.round(acc / m)


def _plain_ensemble_kernel(nf: int, n_modes: int, out_pad: int, depth: int,
                           mix, t_ref, w1, b1, hw, hb, w6, b6, out_ref):
    """Pass-major ensemble kernel for plain (mxu-arch) units.

    A plain unit's activations never widen, so the whole pass lives in
    values (no concat scratch): VPU head, `depth` full-lane (nf x nf)
    matmuls, per-rotation head column block.  At nf=128 every hidden
    matmul fills the MXU's 128 lanes — the shape-level fix for the
    dense-concat kernel's 16.5% MFU ceiling (PERF.md unit accounting).
    """
    acc = jnp.zeros((t_ref.shape[0], out_pad), jnp.float32)
    for mi in range(n_modes):
        for r in range(4):
            col = (mi * 4 + r) * 4
            t = t_ref[:, col : col + 4]
            x = _plain_head(t, w1[mi], b1[mi])
            for d in range(depth):
                xk = jnp.dot(x, hw[d, mi],
                             preferred_element_type=jnp.float32)
                xk = jnp.maximum(
                    xk + hb[d, mi][None, :].astype(jnp.float32), 0)
                x = xk.astype(jnp.bfloat16)
            o = jnp.dot(x, w6[mi, :, out_pad * r : out_pad * (r + 1)],
                        preferred_element_type=jnp.float32)
            o = jnp.tanh(
                o + b6[mi, out_pad * r : out_pad * (r + 1)][None, :]
                .astype(jnp.float32)
            )
            acc = acc + jnp.round(o * 127.0)
    _apply_stage_mix(acc, mix, out_ref)


def _plain_iv_kernel(nf: int, n_modes: int, out_pad: int, depth: int,
                     mix, t_ref, w1, b1, hw, hb, w6, b6, out_ref):
    """Layer-major variant of `_plain_ensemble_kernel`.

    Runs layer d of ALL 4*n_modes passes back-to-back so consecutive
    MXU matmuls are independent (no drain between dependent chains).
    The live set is 4*n_modes (T, nf) bf16 activations — at nf=128,
    n_modes=3 that is 3 MB of VMEM values, unlike the dense arch where
    the same schedule needs 12 concat scratches of 5*nf and measured
    15% slower in-context (PERF.md).  Opt-in via PLAIN_INTERLEAVE.
    """
    xs = []
    for mi in range(n_modes):
        for r in range(4):
            col = (mi * 4 + r) * 4
            t = t_ref[:, col : col + 4]
            xs.append(_plain_head(t, w1[mi], b1[mi]))
    for d in range(depth):
        for i in range(4 * n_modes):
            mi = i // 4
            xk = jnp.dot(xs[i], hw[d, mi],
                         preferred_element_type=jnp.float32)
            xk = jnp.maximum(xk + hb[d, mi][None, :].astype(jnp.float32), 0)
            xs[i] = xk.astype(jnp.bfloat16)
    acc = jnp.zeros((t_ref.shape[0], out_pad), jnp.float32)
    for i in range(4 * n_modes):
        mi, r = i // 4, i % 4
        o = jnp.dot(xs[i], w6[mi, :, out_pad * r : out_pad * (r + 1)],
                    preferred_element_type=jnp.float32)
        o = jnp.tanh(
            o + b6[mi, out_pad * r : out_pad * (r + 1)][None, :]
            .astype(jnp.float32)
        )
        acc = acc + jnp.round(o * 127.0)
    _apply_stage_mix(acc, mix, out_ref)


def _plain_rs_kernel(nf: int, n_modes: int, out_pad: int, depth: int,
                     mix, t_ref, w1, b1, hw, hb, w6, b6, out_ref):
    """Rotation-row-stacked variant of `_plain_ensemble_kernel`.

    The 4 rotations of a mode share the SAME hidden weights (`hw[d, mi]`
    is indexed by mode only — rotation enters through the tap offsets and
    the pre-permuted w6 column blocks), so their hidden matmuls fuse into
    ONE (4T, nf) x (nf, nf) matmul per layer: 4x the M per MXU dispatch
    and 3 dependent chains per stage instead of 12.  Per-row math is
    unchanged (matmul rows are independent), so outputs are bit-identical
    to the pass-major kernel.  This targets the d2 chain's measured
    latency-boundedness (PERF.md mxu ladder: extra matmuls nearly free).
    """
    tile = t_ref.shape[0]
    acc = jnp.zeros((tile, out_pad), jnp.float32)
    for mi in range(n_modes):
        xs = []
        for r in range(4):
            col = (mi * 4 + r) * 4
            t = t_ref[:, col : col + 4]
            xs.append(_plain_head(t, w1[mi], b1[mi]))
        X = jnp.concatenate(xs, axis=0)                  # (4*tile, nf)
        for d in range(depth):
            Xk = jnp.dot(X, hw[d, mi], preferred_element_type=jnp.float32)
            Xk = jnp.maximum(Xk + hb[d, mi][None, :].astype(jnp.float32), 0)
            X = Xk.astype(jnp.bfloat16)
        for r in range(4):
            o = jnp.dot(X[r * tile : (r + 1) * tile],
                        w6[mi, :, out_pad * r : out_pad * (r + 1)],
                        preferred_element_type=jnp.float32)
            o = jnp.tanh(
                o + b6[mi, out_pad * r : out_pad * (r + 1)][None, :]
                .astype(jnp.float32)
            )
            acc = acc + jnp.round(o * 127.0)
    _apply_stage_mix(acc, mix, out_ref)


#: schedule for plain/mxu stacks: False = pass-major (dependent chains,
#: per-pass dispatch), True = layer-major interleave (independent
#: matmuls back-to-back).  Module-level like ENSEMBLE_TILE; flipped by
#: experiments/env after chip A/Bs.
PLAIN_INTERLEAVE = False

def _plain_rsiv_kernel(nf: int, n_modes: int, out_pad: int, depth: int,
                       mix, t_ref, w1, b1, hw, hb, w6, b6, out_ref):
    """Rotation-stacked + mode-layer-major variant of the plain kernel.

    Like `_plain_rs_kernel` but the n_modes (4T, nf) chains advance
    layer-major, so consecutive hidden matmuls are independent (no MXU
    drain between them) at a live set of n_modes stacked activations.
    Accumulation still runs (mode-major, rotation ascending) so outputs
    stay bit-identical to the pass-major kernel.
    """
    tile = t_ref.shape[0]
    Xs = []
    for mi in range(n_modes):
        xs = []
        for r in range(4):
            col = (mi * 4 + r) * 4
            t = t_ref[:, col : col + 4]
            xs.append(_plain_head(t, w1[mi], b1[mi]))
        Xs.append(jnp.concatenate(xs, axis=0))          # (4*tile, nf)
    for d in range(depth):
        for mi in range(n_modes):
            Xk = jnp.dot(Xs[mi], hw[d, mi],
                         preferred_element_type=jnp.float32)
            Xk = jnp.maximum(
                Xk + hb[d, mi][None, :].astype(jnp.float32), 0)
            Xs[mi] = Xk.astype(jnp.bfloat16)
    acc = jnp.zeros((tile, out_pad), jnp.float32)
    for mi in range(n_modes):
        for r in range(4):
            o = jnp.dot(Xs[mi][r * tile : (r + 1) * tile],
                        w6[mi, :, out_pad * r : out_pad * (r + 1)],
                        preferred_element_type=jnp.float32)
            o = jnp.tanh(
                o + b6[mi, out_pad * r : out_pad * (r + 1)][None, :]
                .astype(jnp.float32)
            )
            acc = acc + jnp.round(o * 127.0)
    _apply_stage_mix(acc, mix, out_ref)


def _plain_q_kernel(nf: int, n_modes: int, out_pad: int, depth: int,
                    t_ref, w1, b1, hwq, hcq, hbq, w6q, c6, b6, out_ref):
    """W8A8 variant of `_plain_ensemble_kernel` (see ops/quant.py).

    Activations are int8 codes in [0, 127] (per-layer static scales,
    folded into the dequant constants at quantization time), hidden and
    head matmuls run int8 x int8 -> s32 on the MXU (~2x the bf16 rate on
    v5e), and the epilogue (tanh, per-rotation round(127*out)
    accumulation) is f32 exactly like the bf16 kernel.
    """
    acc = jnp.zeros((t_ref.shape[0], out_pad), jnp.float32)
    for mi in range(n_modes):
        for r in range(4):
            col = (mi * 4 + r) * 4
            t = t_ref[:, col : col + 4]
            x = None
            for k in range(4):
                term = t[:, k : k + 1] * w1[mi, k : k + 1, :]
                x = term if x is None else x + term
            x = jnp.maximum(x + b1[mi][None, :], 0).astype(jnp.float32)
            xq = jnp.clip(jnp.round(x), 0, 127).astype(jnp.int8)
            for d in range(depth):
                a = jnp.dot(xq, hwq[d, mi],
                            preferred_element_type=jnp.int32)
                xf = (a.astype(jnp.float32) * hcq[d, mi][None, :]
                      + hbq[d, mi][None, :])
                xq = jnp.clip(jnp.round(jnp.maximum(xf, 0)), 0, 127
                              ).astype(jnp.int8)
            o = jnp.dot(xq, w6q[mi, :, out_pad * r : out_pad * (r + 1)],
                        preferred_element_type=jnp.int32)
            o = (o.astype(jnp.float32)
                 * c6[mi, out_pad * r : out_pad * (r + 1)][None, :]
                 + b6[mi, out_pad * r : out_pad * (r + 1)][None, :])
            acc = acc + jnp.round(jnp.tanh(o) * 127.0)
    out_ref[:] = acc


def _plain_qw6_kernel(nf: int, n_modes: int, out_pad: int, depth: int,
                      t_ref, w1, b1, hwq, hcq, hbq, w6q, c6, b6, out_ref):
    """`_plain_q_kernel` with the lane-sliceless (M, 4, nf, P) head.

    A/B bisect variant: identical f32 requant datapath, but the head
    weights/constants are indexed [mi, r] statically instead of slicing
    16 int8 lanes out of a 128-lane tile per pass (a known Mosaic
    relayout cost on int8 — PERF.md LUT-path negative results).
    """
    acc = jnp.zeros((t_ref.shape[0], out_pad), jnp.float32)
    for mi in range(n_modes):
        for r in range(4):
            col = (mi * 4 + r) * 4
            t = t_ref[:, col : col + 4]
            x = None
            for k in range(4):
                term = t[:, k : k + 1] * w1[mi, k : k + 1, :]
                x = term if x is None else x + term
            x = jnp.maximum(x + b1[mi][None, :], 0).astype(jnp.float32)
            xq = jnp.clip(jnp.round(x), 0, 127).astype(jnp.int8)
            for d in range(depth):
                a = jnp.dot(xq, hwq[d, mi],
                            preferred_element_type=jnp.int32)
                xf = (a.astype(jnp.float32) * hcq[d, mi][None, :]
                      + hbq[d, mi][None, :])
                xq = jnp.clip(jnp.round(jnp.maximum(xf, 0)), 0, 127
                              ).astype(jnp.int8)
            o = jnp.dot(xq, w6q[mi, r],
                        preferred_element_type=jnp.int32)
            o = (o.astype(jnp.float32) * c6[mi, r][None, :]
                 + b6[mi, r][None, :])
            acc = acc + jnp.round(jnp.tanh(o) * 127.0)
    out_ref[:] = acc


def _plain_q2_kernel(nf: int, n_modes: int, out_pad: int, depth: int,
                     t_ref, w1, b1, hwq, hmq, hsq, hhq, hbi, w6q, c6, b6,
                     out_ref):
    """Integer-requant W8A8 plain kernel (ops/quant.py requant="int").

    Between int8 MXU matmuls the requant stays in the integer domain —
    x_next = clip(((acc * M + half) >> S) + B, 0, 127) with per-column
    int32 fixed-point constants — the exact datapath of the 312-Tops/s
    int8 chain probe (experiments/_r3_i8.py), with no f32 round-trip.
    ReLU is absorbed by the clip's lower bound.  The tanh head epilogue
    stays f32 like every other variant.
    """
    acc = jnp.zeros((t_ref.shape[0], out_pad), jnp.float32)
    for mi in range(n_modes):
        for r in range(4):
            col = (mi * 4 + r) * 4
            t = t_ref[:, col : col + 4]
            x = None
            for k in range(4):
                term = t[:, k : k + 1] * w1[mi, k : k + 1, :]
                x = term if x is None else x + term
            x = jnp.maximum(x + b1[mi][None, :], 0).astype(jnp.float32)
            xq = jnp.clip(jnp.round(x), 0, 127).astype(jnp.int8)
            for d in range(depth):
                a = jnp.dot(xq, hwq[d, mi],
                            preferred_element_type=jnp.int32)
                ti = a * hmq[d, mi][None, :] + hhq[d, mi][None, :]
                ti = jnp.right_shift(ti, hsq[d, mi][None, :])
                xq = jnp.clip(ti + hbi[d, mi][None, :], 0, 127
                              ).astype(jnp.int8)
            o = jnp.dot(xq, w6q[mi, r],
                        preferred_element_type=jnp.int32)
            o = (o.astype(jnp.float32) * c6[mi, r][None, :]
                 + b6[mi, r][None, :])
            acc = acc + jnp.round(jnp.tanh(o) * 127.0)
    out_ref[:] = acc


def _make_plain_ivg_kernel(G: int):
    """Group-interleaved plain kernel: passes advance layer-major in
    groups of G.

    Between the two measured extremes — pass-major (1 dependent chain at
    a time, MXU drains between its matmuls) and full 12-way interleave
    (no drains, but 12 live (T, nf) activations of VMEM pressure, 16-26%
    SLOWER, PERF.md) — a group of G keeps only G live activations while
    giving the MXU G-1 independent matmuls to overlap each chain's
    drain.  Accumulation stays in (mode, rotation) order, so outputs are
    bit-identical to pass-major (integer-valued f32 additions).
    """

    def kern(nf, n_modes, out_pad, depth, mix,
             t_ref, w1, b1, hw, hb, w6, b6, out_ref):
        acc = jnp.zeros((t_ref.shape[0], out_pad), jnp.float32)
        passes = [(mi, r) for mi in range(n_modes) for r in range(4)]
        for g0 in range(0, len(passes), G):
            grp = passes[g0 : g0 + G]
            xs = []
            for mi, r in grp:
                col = (mi * 4 + r) * 4
                t = t_ref[:, col : col + 4]
                xs.append(_plain_head(t, w1[mi], b1[mi]))
            for d in range(depth):
                for i, (mi, _) in enumerate(grp):
                    xk = jnp.dot(xs[i], hw[d, mi],
                                 preferred_element_type=jnp.float32)
                    xk = jnp.maximum(
                        xk + hb[d, mi][None, :].astype(jnp.float32), 0)
                    xs[i] = xk.astype(jnp.bfloat16)
            for i, (mi, r) in enumerate(grp):
                o = jnp.dot(xs[i], w6[mi, :, out_pad * r : out_pad * (r + 1)],
                            preferred_element_type=jnp.float32)
                o = jnp.tanh(
                    o + b6[mi, out_pad * r : out_pad * (r + 1)][None, :]
                    .astype(jnp.float32)
                )
                acc = acc + jnp.round(o * 127.0)
        _apply_stage_mix(acc, mix, out_ref)

    return kern


def _plain_t_kernel(nf: int, n_modes: int, out_pad: int, depth: int,
                    mix, t_ref, w1, b1, hw, hb, w6, b6, out_ref):
    """FEATURE-major (transposed) plain kernel: taps (48, T), activations
    (nf, T) with sites in LANES, head out (out_pad, T).

    Wins over the site-major form on two counts (r4, measured standalone
    11.0 vs 14.3 ms per stage at the bench shape, bit-exact): the (48, N)
    tap matrix is built by stacking 48 full rows — XLA emits it row-major
    with NO {0,1}->{1,0} transpose copies — and the output head
    (out_pad, nf) x (nf, T) costs out_pad/8 x T/128 MXU-cycles instead of
    T/8 x 1 (8x cheaper at out_pad=16).  Weights arrive pre-transposed
    (`transpose_plain_stack`).  Biases must be cast to f32 BEFORE the
    [:, None] minor-dim insert (Mosaic cannot insert a minor dim on
    16-bit types).
    """
    acc = jnp.zeros((out_pad, t_ref.shape[1]), jnp.float32)
    for mi in range(n_modes):
        for r in range(4):
            col = (mi * 4 + r) * 4
            t = t_ref[col : col + 4, :]
            xk = jnp.dot(w1[mi], t, preferred_element_type=jnp.float32)
            xk = jnp.maximum(xk + b1[mi].astype(jnp.float32)[:, None], 0)
            xa = xk.astype(jnp.bfloat16)
            for d in range(depth):
                xk = jnp.dot(hw[d, mi], xa,
                             preferred_element_type=jnp.float32)
                xk = jnp.maximum(
                    xk + hb[d, mi].astype(jnp.float32)[:, None], 0)
                xa = xk.astype(jnp.bfloat16)
            o = jnp.dot(w6[mi, out_pad * r : out_pad * (r + 1), :], xa,
                        preferred_element_type=jnp.float32)
            o = jnp.tanh(
                o + b6[mi, out_pad * r : out_pad * (r + 1)]
                .astype(jnp.float32)[:, None])
            acc = acc + jnp.round(o * 127.0)
    _apply_stage_mix_t(acc, mix, out_ref)


def _plain_t_rs_kernel(nf: int, n_modes: int, out_pad: int, depth: int,
                       mix, t_ref, w1, b1, hw, hb, w6, b6, out_ref):
    """Rotation-stacked feature-major kernel: each mode's 4 rotation
    chains fuse into ONE (nf, 4T) matmul chain.

    The 4 rotations of a mode share head/hidden weights (rotation enters
    only through tap offsets and pre-permuted w6 blocks), and in the
    feature-major layout sites live in LANES — so stacking rotations is a
    lane-axis concat: 4x the N per MXU dispatch and 3 dependent hidden
    chains per stage instead of 12.  Matmul columns are independent and
    the (mode, rotation-ascending) accumulation order is preserved, so
    outputs are bit-identical to `_plain_t_kernel`.  The site-major rs
    form measured negative in r3; this re-sweeps the lever after the r4
    layout change (PERF.md: "re-sweep closed levers after every
    structural change").
    """
    T = t_ref.shape[1]
    acc = jnp.zeros((out_pad, T), jnp.float32)
    for mi in range(n_modes):
        base = mi * 16
        # Head per rotation, THEN lane-concat: concatenating the raw tap
        # slices fails Mosaic ("offset mismatch on non-concat dimension"
        # — slices at sublane offsets 4/12 carry non-zero vpad, measured
        # r5); matmul RESULTS are in canonical layout and concat clean.
        # The per-rotation heads cost the same as pass-major — only the
        # dominant hidden matmuls need the 4x fusion.
        xs = []
        for r in range(4):
            t = t_ref[base + 4 * r : base + 4 * r + 4, :]
            xk = jnp.dot(w1[mi], t, preferred_element_type=jnp.float32)
            xk = jnp.maximum(xk + b1[mi].astype(jnp.float32)[:, None], 0)
            xs.append(xk.astype(jnp.bfloat16))
        xa = jnp.concatenate(xs, axis=1)                # (nf, 4T)
        for d in range(depth):
            xk = jnp.dot(hw[d, mi], xa, preferred_element_type=jnp.float32)
            xk = jnp.maximum(xk + hb[d, mi].astype(jnp.float32)[:, None], 0)
            xa = xk.astype(jnp.bfloat16)
        for r in range(4):
            o = jnp.dot(w6[mi, out_pad * r : out_pad * (r + 1), :],
                        xa[:, r * T : (r + 1) * T],
                        preferred_element_type=jnp.float32)
            o = jnp.tanh(
                o + b6[mi, out_pad * r : out_pad * (r + 1)]
                .astype(jnp.float32)[:, None])
            acc = acc + jnp.round(o * 127.0)
    _apply_stage_mix_t(acc, mix, out_ref)


def _plain_t_rsiv_kernel(nf: int, n_modes: int, out_pad: int, depth: int,
                         mix, t_ref, w1, b1, hw, hb, w6, b6, out_ref):
    """`_plain_t_rs_kernel` with the n_modes stacked chains advancing
    layer-major (consecutive hidden matmuls independent — no MXU drain
    between modes).  Accumulation order unchanged; bit-identical."""
    T = t_ref.shape[1]
    Xs = []
    for mi in range(n_modes):
        base = mi * 16
        xs = []
        for r in range(4):  # head-then-concat; see _plain_t_rs_kernel
            t = t_ref[base + 4 * r : base + 4 * r + 4, :]
            xk = jnp.dot(w1[mi], t, preferred_element_type=jnp.float32)
            xk = jnp.maximum(xk + b1[mi].astype(jnp.float32)[:, None], 0)
            xs.append(xk.astype(jnp.bfloat16))
        Xs.append(jnp.concatenate(xs, axis=1))
    for d in range(depth):
        for mi in range(n_modes):
            xk = jnp.dot(hw[d, mi], Xs[mi],
                         preferred_element_type=jnp.float32)
            xk = jnp.maximum(xk + hb[d, mi].astype(jnp.float32)[:, None], 0)
            Xs[mi] = xk.astype(jnp.bfloat16)
    acc = jnp.zeros((out_pad, T), jnp.float32)
    for mi in range(n_modes):
        for r in range(4):
            o = jnp.dot(w6[mi, out_pad * r : out_pad * (r + 1), :],
                        Xs[mi][:, r * T : (r + 1) * T],
                        preferred_element_type=jnp.float32)
            o = jnp.tanh(
                o + b6[mi, out_pad * r : out_pad * (r + 1)]
                .astype(jnp.float32)[:, None])
            acc = acc + jnp.round(o * 127.0)
    _apply_stage_mix_t(acc, mix, out_ref)


def _dense_t_kernel(nf: int, n_modes: int, out_pad: int, hidden,
                    mix, t_ref, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5,
                    w6, b6, out_ref, cat):
    """FEATURE-major (transposed) kernel for DENSE-concat units.

    The site-major dense kernel could not take the MXU head or bigger
    tiles: its (T, 5nf) concat scratch plus an f32 head dot overflowed
    scoped VMEM (PERF.md r4, compile OOM).  The transposed layout shrinks
    exactly those buffers — concat lives as (5nf, T) with sites in lanes
    (5nf = 320 rows, 1.3 MB bf16 at T=2048) and every f32 intermediate is
    (nf, T) — while the output head (out_pad, 5nf) x (5nf, T) gets the
    same 8x MXU-cycle cut the plain kernel measured (VERDICT r4 #4).
    The head stays the VPU broadcast-FMA form in the same accumulation
    order as `_ensemble_kernel`, so outputs are BIT-IDENTICAL to the
    site-major dense kernel (verified in tests/test_mxu_arch.py).
    """
    hw = {2: w2, 3: w3, 4: w4, 5: w5}
    hb = {2: b2, 3: b3, 4: b4, 5: b5}
    acc = jnp.zeros((out_pad, t_ref.shape[1]), jnp.float32)
    for mi in range(n_modes):
        for r in range(4):
            col = (mi * 4 + r) * 4
            t = t_ref[col : col + 4, :]
            x = None
            for k in range(4):
                term = w1[mi, :, k : k + 1] * t[k : k + 1, :]
                x = term if x is None else x + term
            cat[0:nf, :] = jnp.maximum(
                x + b1[mi].astype(jnp.float32)[:, None].astype(jnp.bfloat16),
                0).astype(jnp.bfloat16)
            for li, k in enumerate(hidden, start=1):
                xk = jnp.dot(hw[k][mi], cat[0 : nf * li, :],
                             preferred_element_type=jnp.float32)
                xk = jnp.maximum(
                    xk + hb[k][mi].astype(jnp.float32)[:, None], 0)
                cat[nf * li : nf * (li + 1), :] = xk.astype(jnp.bfloat16)
            o = jnp.dot(w6[mi, out_pad * r : out_pad * (r + 1), :],
                        cat[:, :], preferred_element_type=jnp.float32)
            o = jnp.tanh(
                o + b6[mi, out_pad * r : out_pad * (r + 1)]
                .astype(jnp.float32)[:, None])
            acc = acc + jnp.round(o * 127.0)
    _apply_stage_mix_t(acc, mix, out_ref)


def _apply_stage_mix_t(acc, mix, out_ref):
    """Feature-major twin of `_apply_stage_mix` (rows = output lanes,
    columns = sites)."""
    if mix is None:
        out_ref[:] = acc
        return
    kind, m = mix
    if kind == "inner":
        mixed = jnp.clip(jnp.round(acc[:1, :] / (m * 4) + 127.0), 0, 255)
        out_ref[:] = jnp.broadcast_to(
            mixed / 255.0, acc.shape).astype(jnp.bfloat16)
    elif kind == "final_u8":
        out_ref[:] = jnp.clip(
            jnp.round(acc / m), 0, 255).astype(jnp.bfloat16)
    elif kind == "final_pack":
        # upscale==4 only: rows sy*4+sx -> one u32 per output quad-row
        # (byte sx), same packing as the LUT tail kernel — the XLA-side
        # interleave becomes a free bitcast + one u8 transpose instead
        # of three f32 copies (~3 ms per 8x1080p YUV batch, r4 trace).
        vi = jnp.clip(jnp.round(acc / m), 0, 255).astype(jnp.int32)
        packed = None
        for sx in range(4):
            part = jnp.concatenate(
                [vi[4 * sy + sx : 4 * sy + sx + 1, :] for sy in range(4)],
                axis=0,
            ) << (8 * sx)
            packed = part if packed is None else packed | part
        out_ref[:] = packed.astype(jnp.uint32)
    else:
        out_ref[:] = jnp.round(acc / m)


def _plain_w_kernel(nf: int, n_modes: int, out_pad: int, depth: int,
                    mix, offs, rs: bool,
                    win_ref, w1e, b1, hw, hb, w6, b6, out_ref, r_scr):
    """WINDOW kernel: in-kernel tap extraction + feature-major MLP chain.

    Replaces the XLA-side (48, N) tap-matrix build (VERDICT r4 Next #1):
    the input is a per-tile flat WINDOW of the edge-padded image — tile
    sites plus a +/- (P*Wp+P) halo — and every tap row is a static lane
    slice of it (flat-domain shift: tap (dy, dx) of site p lives at
    p + dy*Wp + dx once the site domain includes the pad band; pad sites
    compute garbage and are cropped by the caller).  The `offs` slices
    are deduplicated (25 distinct shifts for sdy vs 48 tap rows), stored
    once per tile into the `r_scr` scratch (stores normalize the lane
    offsets Mosaic's concat refuses), and every pass reads them through a
    SCATTERED head: w1e[mi, r] is (nf, n_off) with the unit's 4 tap
    columns filled — a K=25 matmul costs the same MXU passes as K=4.
    HBM traffic per stage drops from ~100 MB (tap matrix) to ~6 MB
    (windows).  rs=True fuses each mode's 4 rotation chains into one
    (nf, 4T) hidden chain (head-then-concat, see `_plain_t_rs_kernel`);
    rs="rsiv" additionally advances the mode chains layer-major.
    Numerics: tap values are exact (the f32 window round-trips bf16),
    hidden/out layers are shape-identical, and the only difference vs
    the tap-matrix kernels is the HEAD's f32 sum association (zeros
    interspersed in the K=25 accumulation) — sub-bf16-ulp, erased by
    the bf16 activation cast in practice: measured EQUAL under a FULL
    50 MB byte readback at the bench shape and identical Set5 scores
    (PERF.md r5).  The dense window kernel (`_dense_w_kernel`) keeps
    even the head bit-identical via its VPU form.
    """
    T = r_scr.shape[1]
    for j, a in enumerate(offs):
        r_scr[j : j + 1, :] = win_ref[0, 0:1, a : a + T]
    R = r_scr[:].astype(jnp.bfloat16)                  # (n_off, T)

    def heads(mi):
        xs = []
        for r in range(4):
            xk = jnp.dot(w1e[mi * 4 + r], R,
                         preferred_element_type=jnp.float32)
            xk = jnp.maximum(xk + b1[mi].astype(jnp.float32)[:, None], 0)
            xs.append(xk.astype(jnp.bfloat16))
        return xs

    def out_head(mi, r, xa, acc):
        o = jnp.dot(w6[mi, out_pad * r : out_pad * (r + 1), :], xa,
                    preferred_element_type=jnp.float32)
        o = jnp.tanh(
            o + b6[mi, out_pad * r : out_pad * (r + 1)]
            .astype(jnp.float32)[:, None])
        return acc + jnp.round(o * 127.0)

    acc = jnp.zeros((out_pad, T), jnp.float32)
    if rs == "rsiv":
        # all modes' rotation-fused chains advance layer-major:
        # consecutive (nf, nf) x (nf, 4T) matmuls are independent
        Xs = [jnp.concatenate(heads(mi), axis=1) for mi in range(n_modes)]
        for d in range(depth):
            for mi in range(n_modes):
                xk = jnp.dot(hw[d, mi], Xs[mi],
                             preferred_element_type=jnp.float32)
                xk = jnp.maximum(
                    xk + hb[d, mi].astype(jnp.float32)[:, None], 0)
                Xs[mi] = xk.astype(jnp.bfloat16)
        for mi in range(n_modes):
            for r in range(4):
                acc = out_head(mi, r, Xs[mi][:, r * T : (r + 1) * T], acc)
        _apply_stage_mix_t(acc, mix, out_ref)
        return
    for mi in range(n_modes):
        xs = heads(mi)
        if rs:
            xa = jnp.concatenate(xs, axis=1)           # (nf, 4T)
            for d in range(depth):
                xk = jnp.dot(hw[d, mi], xa,
                             preferred_element_type=jnp.float32)
                xk = jnp.maximum(
                    xk + hb[d, mi].astype(jnp.float32)[:, None], 0)
                xa = xk.astype(jnp.bfloat16)
            for r in range(4):
                acc = out_head(mi, r, xa[:, r * T : (r + 1) * T], acc)
        else:
            for r in range(4):
                xa = xs[r]
                for d in range(depth):
                    xk = jnp.dot(hw[d, mi], xa,
                                 preferred_element_type=jnp.float32)
                    xk = jnp.maximum(
                        xk + hb[d, mi].astype(jnp.float32)[:, None], 0)
                    xa = xk.astype(jnp.bfloat16)
                acc = out_head(mi, r, xa, acc)
    _apply_stage_mix_t(acc, mix, out_ref)


def _dense_w_kernel(nf: int, n_modes: int, out_pad: int, hidden,
                    mix, offs, tap_rows, rs,
                    win_ref, w1t, b1, w2, b2, w3, b3, w4, b4, w5, b5,
                    w6, b6, out_ref, r_scr, cat):
    """Window kernel for DENSE-concat units (in-kernel tap extraction).

    Same flat-window extraction as `_plain_w_kernel`, but the head stays
    the VPU broadcast-FMA form — term k = w1t[:, k] * R[tap_rows[mi,r,k]]
    in the same bf16 sequential-sum order as the site-major dense kernel,
    so outputs are BIT-IDENTICAL (the R rows hold the exact bf16 tap
    values; `tap_rows` maps each mode x rotation x tap to its
    deduplicated window row).  Hidden layers run over the feature-major
    (5nf, T) concat scratch; rs fuses the 4 rotations (shared weights)
    into (5nf, 4T).
    """
    T = r_scr.shape[1]
    for j, a in enumerate(offs):
        r_scr[j : j + 1, :] = win_ref[0, 0:1, a : a + T]
    R = r_scr[:].astype(jnp.bfloat16)                  # (n_off, T)
    hw = {2: w2, 3: w3, 4: w4, 5: w5}
    hb = {2: b2, 3: b3, 4: b4, 5: b5}
    width = 4 * T if rs else T

    def head(mi, r):
        x = None
        for k in range(4):
            term = w1t[mi, :, k : k + 1] * R[tap_rows[mi][r][k], :][None, :]
            x = term if x is None else x + term
        return jnp.maximum(
            x + b1[mi].astype(jnp.float32)[:, None].astype(jnp.bfloat16),
            0).astype(jnp.bfloat16)

    def chain(mi, x0):
        cat[0:nf, 0:width] = x0
        for li, k in enumerate(hidden, start=1):
            xk = jnp.dot(hw[k][mi], cat[0 : nf * li, 0:width],
                         preferred_element_type=jnp.float32)
            xk = jnp.maximum(xk + hb[k][mi].astype(jnp.float32)[:, None], 0)
            cat[nf * li : nf * (li + 1), 0:width] = xk.astype(jnp.bfloat16)

    def out_head(mi, r, col0, acc):
        o = jnp.dot(w6[mi, out_pad * r : out_pad * (r + 1), :],
                    cat[:, col0 : col0 + T],
                    preferred_element_type=jnp.float32)
        o = jnp.tanh(
            o + b6[mi, out_pad * r : out_pad * (r + 1)]
            .astype(jnp.float32)[:, None])
        return acc + jnp.round(o * 127.0)

    acc = jnp.zeros((out_pad, T), jnp.float32)
    for mi in range(n_modes):
        if rs:
            x0 = jnp.concatenate([head(mi, r) for r in range(4)], axis=1)
            chain(mi, x0)
            for r in range(4):
                acc = out_head(mi, r, r * T, acc)
        else:
            for r in range(4):
                chain(mi, head(mi, r))
                acc = out_head(mi, r, 0, acc)
    _apply_stage_mix_t(acc, mix, out_ref)


def window_offsets(modes: str):
    """Deduplicated (dy, dx) tap shifts across all modes x rotations,
    sorted; P is the uniform halo (edge-replication is idempotent, so a
    global pad of P reproduces each mode's own `mode_pad` clamping
    exactly for every valid site)."""
    from .taps import mode_pad, rotated_taps

    P = max(mode_pad(m) for m in modes)
    offs = sorted({o for m in modes for r in range(4)
                   for o in rotated_taps(m, r)})
    return P, offs


def window_tap_rows(modes: str):
    """Static (mode, rotation, tap) -> deduplicated-window-row map for
    the dense window kernel's VPU head."""
    from .taps import rotated_taps

    _, offs = window_offsets(modes)
    idx = {o: j for j, o in enumerate(offs)}
    return tuple(
        tuple(tuple(idx[o] for o in rotated_taps(m, r)) for r in range(4))
        for m in modes
    )


def scatter_window_heads(stacked: dict, modes: str):
    """(M, 4, nf) site-major head stack -> (M*4, nf, n_off) scattered
    heads for `_plain_w_kernel` (one per mode x rotation; the unit's 4
    tap columns land at their deduplicated window-offset indices)."""
    import numpy as np

    from .taps import rotated_taps

    _, offs = window_offsets(modes)
    idx = {o: j for j, o in enumerate(offs)}
    w1 = np.asarray(stacked["w1"], np.float32)          # (M, 4, nf)
    M, _, nf = w1.shape
    w1e = np.zeros((M * 4, nf, len(offs)), np.float32)
    for mi, m in enumerate(modes):
        for r in range(4):
            for k, o in enumerate(rotated_taps(m, r)):
                w1e[mi * 4 + r, :, idx[o]] += w1[mi, k, :]
    return jnp.asarray(w1e, jnp.bfloat16)


@functools.partial(jax.jit,
                   static_argnames=("n_modes", "out_pad", "interpret",
                                    "mix", "offs", "tile", "tap_rows"))
def stage_ensemble_apply_w(stacked_t: dict, w1e, windows, *, n_modes: int,
                           offs: tuple, tile: int, out_pad: int = 16,
                           interpret: bool = False, mix=None,
                           tap_rows: tuple | None = None):
    """Window-kernel twin of `stage_ensemble_apply_t` (plain AND dense
    stacks — dense needs the static `tap_rows` map for its VPU head and
    stays bit-identical to the site-major dense kernel).

    windows: (n_tiles, 1, tile + 2*S) f32 flat windows over the PADDED
    site domain (see `srnet._window_inputs`; the middle singleton makes
    the block dims equal the array dims — Pallas TPU requires the last
    two block dims divisible by (8, 128) or whole); offs: static lane
    offsets of the deduplicated tap shifts within a window.  Returns
    (out_rows, n_tiles*tile) over the padded domain; callers crop.
    """
    n_tiles, _, L = windows.shape
    nf = stacked_t["w1t"].shape[1]
    dense = "hwt" not in stacked_t
    scratch2 = []
    if dense:
        assert tap_rows is not None, "dense window kernel needs tap_rows"
        hidden = [k for k in (2, 3, 4, 5) if f"w{k}t" in stacked_t]
        rs = PLAIN_T_SCHEDULE in ("rs", "rsiv")
        kern = functools.partial(_dense_w_kernel, nf, n_modes, out_pad,
                                 hidden, mix, offs, tap_rows, rs)
        weights = [stacked_t["w1t"], stacked_t["b1"]]
        for k in (2, 3, 4, 5):
            weights += [stacked_t[f"w{k}t"], stacked_t[f"b{k}"]]
        weights += [stacked_t["w6t"], stacked_t["b6"]]
        weights = tuple(weights)
        scratch2 = [pltpu.VMEM(
            (5 * nf, (4 if rs else 1) * tile), jnp.bfloat16)]
    else:
        depth = stacked_t["hwt"].shape[0]
        rs = ("rsiv" if PLAIN_T_SCHEDULE == "rsiv"
              else PLAIN_T_SCHEDULE == "rs")
        kern = functools.partial(_plain_w_kernel, nf, n_modes, out_pad,
                                 depth, mix, offs, rs)
        weights = (w1e, stacked_t["b1"], stacked_t["hwt"], stacked_t["hb"],
                   stacked_t["w6t"], stacked_t["b6"])
    pack = mix is not None and mix[0] == "final_pack"
    if pack:
        assert out_pad == 16, "final_pack packs a 4x4 quad (upscale 4)"
        out_rows, out_dtype = 4, jnp.uint32
    else:
        out_rows = out_pad
        out_dtype = (jnp.bfloat16
                     if mix is not None and mix[0] in ("inner", "final_u8")
                     else jnp.float32)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((out_rows, n_tiles * tile),
                                       out_dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=pl.BlockSpec((out_rows, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((len(offs), tile), jnp.float32)]
        + scratch2,
        interpret=interpret,
    )(windows, *weights)


def transpose_plain_stack(stacked: dict) -> dict:
    """Site-major stack -> feature-major (transposed) weight layout for
    `_plain_t_kernel` / `_dense_t_kernel`.  Pure transposes of the small
    weight arrays; dense-concat stacks keep their per-layer keys."""
    if "hw" not in stacked:
        out = {
            "w1t": jnp.transpose(stacked["w1"], (0, 2, 1)),  # (M, nf, 4)
            "b1": stacked["b1"],
            "w6t": jnp.transpose(stacked["w6"], (0, 2, 1)),  # (M,4op,5nf)
            "b6": stacked["b6"],
        }
        for k in (2, 3, 4, 5):
            if f"w{k}" in stacked:
                out[f"w{k}t"] = jnp.transpose(stacked[f"w{k}"], (0, 2, 1))
                out[f"b{k}"] = stacked[f"b{k}"]
        return out
    return {
        "w1t": jnp.transpose(stacked["w1"], (0, 2, 1)),   # (M, nf, 4)
        "b1": stacked["b1"],
        "hwt": jnp.transpose(stacked["hw"], (0, 1, 3, 2)),
        "hb": stacked["hb"],
        "w6t": jnp.transpose(stacked["w6"], (0, 2, 1)),   # (M, 4*op, nf)
        "b6": stacked["b6"],
    }


#: "pass" | "iv" | "ivg{2,3,4,6}" | "rs" | "rsiv" — pass-major,
#: layer-major interleave, group-of-G interleave, rotation-row-stacked,
#: or rotation-stacked + mode-layer-major (see the respective kernels).
#: PLAIN_INTERLEAVE=True is honored as "iv" for backwards compatibility.
PLAIN_SCHEDULE = "pass"

#: schedule for the FEATURE-major (transposed/window) kernels: "pass" |
#: "rs" | "rsiv".  Separate flag from PLAIN_SCHEDULE because the
#: transposed layout re-opens levers the site-major sweeps closed
#: (PERF.md r4 lesson).  Chip A/Bs (r5): on the tap-matrix kernel rs is
#: within noise of pass (21.3-23.6 vs 22.8-23.9 ms across sessions);
#: on the WINDOW kernel rs wins consistently (18.8-19.2 vs 20.0 ms) and
#: is the default with PLAIN_WINDOW.  MULUT_T_SCHEDULE pins it.
PLAIN_T_SCHEDULE = os.environ.get("MULUT_T_SCHEDULE", "rs")

_PLAIN_T_KERNELS = {
    "pass": _plain_t_kernel,
    "rs": _plain_t_rs_kernel,
    "rsiv": _plain_t_rsiv_kernel,
}

_PLAIN_KERNELS = {
    "pass": _plain_ensemble_kernel,
    "iv": _plain_iv_kernel,
    "ivg2": _make_plain_ivg_kernel(2),
    "ivg3": _make_plain_ivg_kernel(3),
    "ivg4": _make_plain_ivg_kernel(4),
    "ivg6": _make_plain_ivg_kernel(6),
    "rs": _plain_rs_kernel,
    "rsiv": _plain_rsiv_kernel,
}


def _plain_kernel_fn():
    if PLAIN_INTERLEAVE:
        return _plain_iv_kernel
    return _PLAIN_KERNELS[PLAIN_SCHEDULE]


@functools.partial(jax.jit,
                   static_argnames=("n_modes", "out_pad", "interpret", "mix"))
def stage_ensemble_apply_t(stacked_t: dict, taps_t, *, n_modes: int,
                           out_pad: int = 16, interpret: bool = False,
                           mix=None):
    """Feature-major twin of `stage_ensemble_apply` (plain stacks only).

    taps_t is the (16*M, N) bf16 tap matrix (sites in lanes); stacked_t
    comes from `transpose_plain_stack`.  Returns (out_pad, N) — row
    sy*scale+sx per output lane, sites in lanes.  Same mix epilogues.
    """
    nf = stacked_t["w1t"].shape[1]
    n = taps_t.shape[1]
    dense = "hwt" not in stacked_t
    tile = ENSEMBLE_TILE_T if (nf <= 128 and not dense) else ENSEMBLE_TILE
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        if interpret:  # no ragged-block masking in the interpreter
            taps_t = jnp.pad(taps_t, [(0, 0), (0, n_pad - n)])
        else:
            n_pad = n
    scratch = []
    if dense:
        hidden = [k for k in (2, 3, 4, 5) if f"w{k}t" in stacked_t]
        kern = functools.partial(_dense_t_kernel, nf, n_modes, out_pad,
                                 hidden, mix)
        weights = [stacked_t["w1t"], stacked_t["b1"]]
        for k in (2, 3, 4, 5):
            weights += [stacked_t[f"w{k}t"], stacked_t[f"b{k}"]]
        weights += [stacked_t["w6t"], stacked_t["b6"]]
        weights = tuple(weights)
        scratch = [pltpu.VMEM((5 * nf, tile), jnp.bfloat16)]
    else:
        depth = stacked_t["hwt"].shape[0]
        kern = functools.partial(_PLAIN_T_KERNELS[PLAIN_T_SCHEDULE], nf,
                                 n_modes, out_pad, depth, mix)
        weights = (stacked_t["w1t"], stacked_t["b1"], stacked_t["hwt"],
                   stacked_t["hb"], stacked_t["w6t"], stacked_t["b6"])
    pack = mix is not None and mix[0] == "final_pack"
    if pack:
        assert out_pad == 16, "final_pack packs a 4x4 quad (upscale 4)"
        out_rows, out_dtype = 4, jnp.uint32
    else:
        out_rows = out_pad
        out_dtype = (jnp.bfloat16
                     if mix is not None and mix[0] in ("inner", "final_u8")
                     else jnp.float32)
    width = 16 * n_modes
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((out_rows, n_pad), out_dtype),
        grid=(-(-n_pad // tile),),
        in_specs=[
            pl.BlockSpec((width, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=pl.BlockSpec((out_rows, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(taps_t, *weights)
    return out[:, :n]


@functools.partial(jax.jit,
                   static_argnames=("n_modes", "out_pad", "interpret", "mix"))
def stage_ensemble_apply(stacked: dict, taps, *, n_modes: int,
                         out_pad: int = 16, interpret: bool = False,
                         mix=None):
    """(N, 16*M) bf16 rotation/mode tap matrix -> (N, out_pad) f32 ensemble.

    Output = sum over modes and rotations of round(127 * unit(taps)), with
    output lanes already un-rotated.  `interpret=True` runs the kernel in
    the Pallas interpreter (CPU testing).

    Accepts `stack_stage_params` output for dense units (pass-major
    kernel) or plain/mxu units (full-lane plain kernel, detected from the
    stacked "hw" key), or `pair_stage_params` output (rotation-pair
    block-diagonal kernel, bit-identical to pass-major).

    `mix` (plain stacks only): fold the cascade stage mixing into the
    kernel epilogue — ("inner", M) emits the mixed+renormalized bf16
    inner-stage value (lane 0), ("final", M) emits round(acc/M) f32; see
    `_apply_stage_mix`.  Deletes XLA's separate stage-mix/cast fusions
    (~2.3 ms per 8x1080p YUV batch, r4 trace); bit-identical.
    """
    nf = stacked["w1"].shape[2]
    n = taps.shape[0]
    n_pad = -(-n // ENSEMBLE_TILE) * ENSEMBLE_TILE
    if n_pad != n:
        # Mosaic masks the ragged last block's loads/stores itself, so a
        # non-divisible N needs NO explicit pad — the jnp.pad here
        # materialized a full copy of the ~100 MB tap matrix (2 x 0.8 ms
        # per 8x1080p YUV batch in the r4 trace).  Junk rows of the last
        # block produce junk outputs that are sliced off below.
        # Interpret mode (CPU tests) lacks the masking — keep the pad.
        if interpret:
            taps = jnp.pad(taps, [(0, n_pad - n), (0, 0)])
        else:
            n_pad = n
    width = 16 * n_modes
    if "hwq" in stacked:
        depth = stacked["hwq"].shape[0]
        scratch = []
        if "hmq" in stacked:  # requant="int": integer fixed-point datapath
            kern = functools.partial(_plain_q2_kernel, nf, n_modes, out_pad,
                                     depth)
            weights = (stacked["w1"], stacked["b1"], stacked["hwq"],
                       stacked["hmq"], stacked["hsq"], stacked["hhq"],
                       stacked["hbi"], stacked["w6q"], stacked["c6"],
                       stacked["b6"])
        elif stacked["w6q"].ndim == 4:  # requant="f32w6": sliceless head
            kern = functools.partial(_plain_qw6_kernel, nf, n_modes, out_pad,
                                     depth)
            weights = (stacked["w1"], stacked["b1"], stacked["hwq"],
                       stacked["hcq"], stacked["hbq"], stacked["w6q"],
                       stacked["c6"], stacked["b6"])
        else:  # requant="f32": original layout
            kern = functools.partial(_plain_q_kernel, nf, n_modes, out_pad,
                                     depth)
            weights = (stacked["w1"], stacked["b1"], stacked["hwq"],
                       stacked["hcq"], stacked["hbq"], stacked["w6q"],
                       stacked["c6"], stacked["b6"])
    elif "hw" in stacked:
        depth = stacked["hw"].shape[0]
        kern = functools.partial(_plain_kernel_fn(), nf, n_modes, out_pad,
                                 depth, mix)
        scratch = []
        weights = (stacked["w1"], stacked["b1"], stacked["hw"],
                   stacked["hb"], stacked["w6"], stacked["b6"])
    else:
        paired = stacked["w2"].shape[-1] == 2 * nf
        if paired:
            kern = functools.partial(_pair_ensemble_kernel, nf, n_modes,
                                     out_pad)
            scratch = [pltpu.VMEM((ENSEMBLE_TILE, 10 * nf), jnp.bfloat16)] * 2
        else:
            kern = functools.partial(_ensemble_kernel, nf, n_modes, out_pad)
            scratch = [pltpu.VMEM((ENSEMBLE_TILE, 5 * nf), jnp.bfloat16)]
        weights = (stacked["w1"], stacked["b1"], stacked["w2"], stacked["b2"],
                   stacked["w3"], stacked["b3"], stacked["w4"], stacked["b4"],
                   stacked["w5"], stacked["b5"], stacked["w6"], stacked["b6"])
    if mix is not None and "hw" not in stacked:
        raise ValueError("mix is only supported for plain (mxu-arch) stacks")
    out_dtype = (jnp.bfloat16
                 if mix is not None and mix[0] in ("inner", "final_u8")
                 else jnp.float32)
    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n_pad, out_pad), out_dtype),
        grid=(-(-n_pad // ENSEMBLE_TILE),),
        in_specs=[
            pl.BlockSpec((ENSEMBLE_TILE, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        ] + wspecs,
        out_specs=pl.BlockSpec((ENSEMBLE_TILE, out_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(taps, *weights)
    return out[:n]
