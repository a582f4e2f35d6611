"""Spatial wrappers: SRNets / DNNets — the trainable LUT-convertible models.

The reference wraps each MuLUT unit in unfold -> per-patch forward -> fold
(ref: common/network.py:137-225).  TPU-first equivalent: the four sampled
pixels of every output site are four *shifted views* of the padded image;
stacking them gives a (B*C*h*w, 4) matrix fed to the tap-MLP, and the
upscale**2 outputs interleave back via reshape/transpose (the fold-with-
stride is exactly a pixel shuffle).  No K*K patch tensor is ever built.

A "model" here is a plain dict:
  params: {"s{stage}_{mode}": unit-param dict}
  static config carried by the caller (modes, stages, scale, nf).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.simplex import round_ste
from ..ops.taps import lane_rotation_perm, mode_pad, mode_taps, rotated_taps
from .blocks import apply_mulut_unit, init_mulut_unit, unit_layout


def init_srnets(key, *, nf: int = 64, scale: int = 4, modes: str = "sdy",
                stages: int = 2, arch: str = "dense",
                depth: int | None = None) -> dict:
    """Stage x mode registry of MuLUT units (ref: sr/model.py:15-31).

    The last stage upscales by `scale`; earlier stages are x1.

    arch: "dense" is the reference architecture (4 dense-concat layers,
    nf=64 — ref: common/network.py:62-105).  "mxu" is the TPU-native
    net-mode deployment variant: a plain MLP whose hidden widths should
    fill the MXU's 128 lanes (use nf=128) with `depth` (default 2) hidden
    matmuls — ~2.3x more useful MACs per MXU cycle and half the dependent
    matmuls per pass vs the dense shapes (PERF.md unit accounting), at
    similar parameter count.  Both transfer to IDENTICAL LUT artifacts
    (the unit contract — 4 taps in, upscale**2 lanes out — is unchanged).
    """
    if arch not in ("dense", "mxu"):
        raise ValueError(f"unknown arch {arch!r}: expected 'dense' or 'mxu'")
    dense = arch == "dense"
    if depth is None:
        depth = 4 if dense else 2
    params = {}
    for s in range(stages):
        upscale = scale if s + 1 == stages else 1
        # per-stage depth (e.g. (2, 3): d2 inner + d3 final — capacity
        # where the hardest units live, see PERF.md distillation notes);
        # stacks/kernels are per-stage, so mixed depths deploy untouched
        d_s = depth[s] if isinstance(depth, (tuple, list)) else depth
        for mode in modes:
            key, sub = jax.random.split(key)
            params[f"s{s + 1}_{mode}"] = init_mulut_unit(
                sub, nf=nf, upscale=upscale, dense=dense, depth=d_s
            )
    return params


def unit_upscale(stage: int, stages: int, scale: int) -> int:
    return scale if stage == stages else 1


def srnet_apply(unit_params: dict, x, *, mode: str, upscale: int):
    """Apply one SRNet to a padded image batch.

    Args:
      unit_params: tap-MLP parameters.
      x: (B, C, H, W) float in [0, 1], already replicate-padded bottom/right
        by `mode_pad(mode)` (the caller pads, ref: sr/1_train_model.py:34).

    Returns:
      (B, C, h*upscale, w*upscale) float in (-1, 1), h = H - pad.
    """
    pad = mode_pad(mode)
    B, C, H, W = x.shape
    h, w = H - pad, W - pad
    planes = [x[..., dy : dy + h, dx : dx + w] for dy, dx in mode_taps(mode)]
    taps = jnp.stack(planes, axis=-1)  # (B, C, h, w, 4)
    out = apply_mulut_unit(unit_params, taps.reshape(-1, 4))  # (N, up*up)
    out = out.reshape(B, C, h, w, upscale, upscale)
    out = jnp.moveaxis(out, -2, -3).reshape(B, C, h * upscale, w * upscale)
    return out


def _rotation_taps_batch(x, mode: str):
    """(B, C, H, W) -> (4, B, C, H, W, 4) tap stacks for all 4 rotations.

    Fused rotation ensemble: instead of rot90-ing the image per rotation
    (ref: sr/1_train_model.py:33-35), each rotation reads the SAME
    all-sides-padded image through rotated tap offsets; the unit's output
    lanes are un-rotated with a static permutation.  Bit-equivalent, but
    keeps every tensor in its natural layout and lets the 4 rotations share
    one big MXU matmul.
    """
    pad = mode_pad(mode)
    h, w = x.shape[-2], x.shape[-1]
    xp = jnp.pad(x, [(0, 0), (0, 0), (pad, pad), (pad, pad)], mode="edge")
    rots = []
    for r in range(4):
        planes = [
            xp[..., pad + dy : pad + dy + h, pad + dx : pad + dx + w]
            for dy, dx in rotated_taps(mode, r)
        ]
        rots.append(jnp.stack(planes, axis=-1))
    return jnp.stack(rots, axis=0)


def srnet_rotation_lanes(unit_params: dict, x, *, mode: str, upscale: int,
                         precision=jax.lax.Precision.HIGHEST,
                         unit_impl: str = "xla"):
    """All-4-rotation unit outputs as un-rotated lanes.

    Args:
      x: (B, C, H, W) float in [0, 1], UNpadded.
      precision: MXU matmul precision for the unit (HIGHEST for
        LUT-caching-grade exactness; DEFAULT/bf16 for fast deployment).
      unit_impl: "xla" (blocks.apply_mulut_unit) or "pallas" (the fused
        VMEM-resident kernel, bf16 params/inputs required, TPU only).

    Returns:
      (4, B, C, H, W, upscale**2) float in (-1, 1): rotation r's output with
      its lane block already rotated back (equivalent to
      rot90(unit(rot90(x, r)), 4-r) of the reference, in lane space).
    """
    taps = _rotation_taps_batch(x, mode)            # (4, B, C, h, w, 4)
    shape = taps.shape
    if unit_impl == "pallas" and not unit_layout(unit_params)[0]:
        # the single-unit fused kernel is written for the dense-concat
        # layout; plain/mxu units deploy through the stage-ensemble
        # kernel (srnets_predict_fast) and train on the XLA path
        unit_impl = "xla"
    if unit_impl == "pallas":
        from ..ops.unit_kernel import fused_unit_apply

        out = fused_unit_apply(unit_params, taps.reshape(-1, 4),
                               out_dim=upscale * upscale)
    else:
        out = apply_mulut_unit(unit_params, taps.reshape(-1, 4),
                               precision=precision)
    out = out.reshape(*shape[:-1], upscale * upscale)
    if upscale > 1:
        out = jnp.stack(
            [out[r][..., lane_rotation_perm(upscale, r)] for r in range(4)]
        )
    return out


def _interleave_nchw(out, upscale: int):
    """(B, C, h, w, up*up) -> (B, C, h*up, w*up)."""
    B, C, h, w, _ = out.shape
    out = out.reshape(B, C, h, w, upscale, upscale)
    out = jnp.moveaxis(out, -2, -3)
    return out.reshape(B, C, h * upscale, w * upscale)


def srnets_predict(params: dict, x, *, modes: str, stages: int, scale: int,
                   phase: str = "train",
                   precision=jax.lax.Precision.HIGHEST,
                   unit_impl: str = "xla"):
    """Full train-time forward: cascade of stage/mode/rotation ensembles.

    Matches mulut_predict (ref: sr/1_train_model.py:26-45): per rotation the
    unit output is scaled by 127 and STE-rounded *before* accumulating (so
    the sum order is irrelevant); intermediate stages mix with
    avg = len(modes)*4, bias 127, clamp to [0,255] and renormalize; the final
    stage mixes with avg = len(modes), bias 0 (divided by 255 only in the
    train phase — the valid phase returns values in [0, 255]).

    Args:
      x: (B, C, H, W) float32 in [0, 1].
    """
    for s in range(stages):
        stage = s + 1
        upscale = unit_upscale(stage, stages, scale)
        pred = 0.0
        for mode in modes:
            unit = params[f"s{stage}_{mode}"]
            lanes = srnet_rotation_lanes(unit, x, mode=mode, upscale=upscale,
                                         precision=precision,
                                         unit_impl=unit_impl)
            pred = pred + jnp.sum(round_ste(lanes * 127.0), axis=0)
        if stage == stages:
            x = round_ste(pred / len(modes))
            x = _interleave_nchw(x, upscale)
            if phase == "train":
                x = x / 255.0
        else:
            pred = round_ste(jnp.clip(pred / (len(modes) * 4) + 127.0, 0, 255))
            x = pred[..., 0] / 255.0
    return x


def stack_srnets_for_fast(params: dict, *, modes: str, stages: int,
                          scale: int, paired: bool = False) -> list:
    """Per-stage stacked bf16 params for `srnets_predict_fast`.

    `paired=True` returns rotation-pair block-diagonal weights
    (`unit_kernel.pair_stage_params`) — bit-identical outputs through a
    higher-MFU kernel schedule; see PERF.md unit accounting.
    """
    from ..ops.unit_kernel import pair_stage_params, stack_stage_params

    stacks = [
        stack_stage_params(
            params, stage=s + 1, modes=modes,
            upscale=unit_upscale(s + 1, stages, scale),
        )
        for s in range(stages)
    ]
    if paired:
        stacks = [pair_stage_params(st) for st in stacks]
    return stacks


#: tap-matrix construction.  "stack" (default): stack+moveaxis — XLA
#: emits the tap fusion column-major and pays 2 x 0.58 ms of transpose
#: copies per 8x1080p YUV batch (r4 trace), but that is the CHEAP form.
#: "concat" (measured NEGATIVE, kept as the record): concatenating
#: twelve (N, 4) pieces along the minor axis builds the row-major layout
#: directly but hits the 128-lane padding trap (each sub-128-lane piece
#: materializes lane-padded, same mechanism as r2's corner_lams lesson)
#: — 76.3 vs 29.5 ms per fused-YUV mxu-d2 batch, 2.6x SLOWER with
#: identical outputs.  Do not re-try.
TAPS_BUILD = "stack"

#: plain-kernel data layout: "feature" (default; transposed — taps
#: (48, N) built as 48 stacked rows with no transpose copies,
#: activations (nf, T) with sites in lanes, 8x cheaper output head —
#: `unit_kernel._plain_t_kernel`) or "site" (the original (N, 48) form;
#: also the layout the PLAIN_SCHEDULE variant kernels implement).
#: Chip-measured in-context (r4, fused YUV mxu-d2 batch 8): feature
#: 24.8 ms vs site 31.7 — identical outputs (bit-exact, CPU-verified;
#: device checksums equal).  RGB path: 78.1 vs 93.5 ms.
PLAIN_LAYOUT = "feature"

#: DENSE-kernel data layout: "site" (the r3 form — VPU head, (T, 5nf)
#: concat scratch) or "feature" (transposed — `_dense_t_kernel`; the
#: buffers that compile-OOM'd the site-major MXU-head/tile attempts
#: shrink to (5nf, T), and the output head gets the plain kernel's 8x
#: MXU-cycle cut).  Outputs bit-identical either way (same VPU head and
#: accumulation order).  Default set by the chip A/B in
#: experiments/_r5_dense_t.py (see PERF.md r5).
DENSE_LAYOUT = "site"


#: route plain feature-layout stages through the WINDOW kernel
#: (in-kernel tap extraction, `unit_kernel._plain_w_kernel`): the XLA
#: tap-matrix build disappears and per-stage kernel HBM reads drop
#: ~100 MB -> ~6 MB.  Chip A/B (r5, experiments/_r5_window.py, fused
#: YUV mxu-d2 batch 8): tap-matrix/pass 24.1 ms -> window/rs/T2048
#: 18.8-19.2 ms (884 full-color MPix/s), checksum parity MATCH at the
#: bench shape and Set5 scores identical to the 3rd decimal (RGB
#: 30.425 / YUV 30.181 on the shipped d2 artifact) — default True.
#: MULUT_PLAIN_WINDOW=0 pins the tap-matrix path (ops escape hatch).
import os as _os  # noqa: E402 — env-pinned kernel config, like evaluate's

PLAIN_WINDOW = _os.environ.get("MULUT_PLAIN_WINDOW", "1") != "0"


def _window_inputs(x, modes: str, tile: int):
    """(B, C, H, W) float -> ((n_tiles, tile+2S) f32 windows, geometry).

    Flat-domain tap extraction (see `unit_kernel._plain_w_kernel`): the
    image is edge-padded by the global P on ALL sides, flattened, and cut
    into per-tile windows carrying a +/- S = P*Wp+P halo, so that the tap
    at (dy, dx) of any site is a static lane shift dy*Wp+dx inside the
    window.  The windows array is built from two reshaped views of the
    flat plane (one clean ~6 MB copy — no gather).  f32 because Mosaic
    lane-shifts 32-bit rows reliably; the bf16 tap values round-trip
    exactly.  Returns (windows, (n_sites, Hp, Wp, P)).
    """
    from ..ops.unit_kernel import window_offsets

    P, _ = window_offsets(modes)
    B, C, H, W = x.shape
    xp = jnp.pad(x, [(0, 0), (0, 0), (P, P), (P, P)], mode="edge")
    Hp, Wp = H + 2 * P, W + 2 * P
    flat = xp.astype(jnp.bfloat16).astype(jnp.float32).reshape(-1)
    n = B * C * Hp * Wp
    S = P * Wp + P
    n_tiles = -(-n // tile)
    total = n_tiles * tile
    L = tile + 2 * S
    nview = -(-L // tile)
    flatp = jnp.pad(flat, (S, max(0, total + nview * tile - n - S)))
    views = [flatp[v * tile : v * tile + total].reshape(n_tiles, tile)
             for v in range(nview)]
    win = jnp.concatenate(views, axis=1)[:, :L]
    return win[:, None, :], (n, Hp, Wp, P)


def _ensemble_taps_t(x, modes: str):
    """(B, C, H, W) -> (16*M, N) bf16 feature-major tap matrix (sites in
    lanes) — rows ordered [mode][rotation][tap], matching the transposed
    kernel's column blocks."""
    N = x.shape[0] * x.shape[1] * x.shape[2] * x.shape[3]
    rows = []
    for m in modes:
        rt = _rotation_taps_batch(x, m)          # (4, B, C, h, w, 4)
        for r in range(4):
            for k in range(4):
                rows.append(rt[r, ..., k].reshape(N))
    return jnp.stack(rows, axis=0).astype(jnp.bfloat16)


def _ensemble_taps(x, modes: str):
    """(B, C, H, W) -> (N, 16*M) bf16 tap matrix, column blocks ordered
    [mode][rotation][tap]."""
    N = x.shape[0] * x.shape[1] * x.shape[2] * x.shape[3]
    if TAPS_BUILD == "concat":
        pieces = []
        for m in modes:
            rt = _rotation_taps_batch(x, m)       # (4, B, C, h, w, 4)
            pieces += [rt[r].reshape(N, 4) for r in range(4)]
        return jnp.concatenate(pieces, axis=1).astype(jnp.bfloat16)
    per_mode = [_rotation_taps_batch(x, m).reshape(4, N, 4) for m in modes]
    t = jnp.stack(per_mode, axis=0)               # (M, 4, N, 4)
    t = jnp.moveaxis(t, 2, 0)                     # (N, M, 4, 4)
    return t.reshape(N, -1).astype(jnp.bfloat16)


def srnets_predict_fast(stacked_stages: list, x, *, modes: str, stages: int,
                        scale: int, interpret: bool = False,
                        final_clip: bool | str = False):
    """Fast (bf16) deployment forward via the Pallas stage-ensemble kernel.

    The whole mode x rotation ensemble of each stage — 4*len(modes) tap-MLP
    passes, output-lane un-rotation, per-rotation round(127*out)
    accumulation — runs inside one VMEM-resident kernel per stage
    (ops/unit_kernel.py); XLA only assembles tap matrices and applies the
    stage mixing.  Matches `srnets_predict(phase='valid')` up to bf16
    rounding (~0.05 dB on Set5 x4); use the f32 path when exactness to the
    cached-LUT pipeline matters.

    Args:
      stacked_stages: from `stack_srnets_for_fast`.
      x: (B, C, H, W) float in [0, 1] (any float dtype; cast internally).
    """
    from ..ops.unit_kernel import stage_ensemble_apply

    M = len(modes)
    B, C, H, W = x.shape
    x = x.astype(jnp.bfloat16)
    for s in range(stages):
        stage = s + 1
        upscale = unit_upscale(stage, stages, scale)
        # Plain (mxu-arch) stacks fold the stage mixing into the kernel
        # epilogue (bit-identical; deletes XLA's mix/cast fusions over the
        # (N, 16) f32 buffer — see unit_kernel._apply_stage_mix).
        st = stacked_stages[s]
        plain = "hw" in st
        # dense-unpaired stacks may take the transposed kernel too
        # (_dense_t_kernel; bit-identical) — paired/quantized stacks are
        # site-major-only forms
        nf_s = st["w1"].shape[2] if "w1" in st else 0
        dense_t = (DENSE_LAYOUT == "feature" and not plain
                   and "hwq" not in st and "w2" in st
                   and st["w2"].shape[-1] == nf_s)
        if ((plain and PLAIN_LAYOUT == "feature") or dense_t) and \
                PLAIN_WINDOW:
            from ..ops.unit_kernel import (
                WINDOW_TILE_T,
                scatter_window_heads,
                stage_ensemble_apply_w,
                transpose_plain_stack,
                window_offsets,
                window_tap_rows,
            )

            st_t = transpose_plain_stack(st)
            tap_rows = None if plain else window_tap_rows(modes)
            w1e = scatter_window_heads(st, modes) if plain else None
            # wide images: keep tile >= 2S so the windows array stays
            # <= 2x the plane bytes (the view build makes ceil(L/tile)
            # full copies)
            P0 = max(mode_pad(m) for m in modes)
            S0 = P0 * (x.shape[3] + 2 * P0) + P0
            tile = max(WINDOW_TILE_T, -(-2 * S0 // 128) * 128)
            win, (n_sites, Hp, Wp, P) = _window_inputs(x, modes, tile)
            S = P * Wp + P
            _, offs = window_offsets(modes)
            offs_lane = tuple(S + dy * Wp + dx for dy, dx in offs)
            if stage == stages:
                if final_clip == "pack" and upscale == 4:
                    packed = stage_ensemble_apply_w(
                        st_t, w1e, win, n_modes=M, offs=offs_lane,
                        tile=tile, interpret=interpret,
                        mix=("final_pack", M), tap_rows=tap_rows,
                    )[:, :n_sites]                   # (4, N') u32
                    b = jax.lax.bitcast_convert_type(packed, jnp.uint8)
                    b = b.reshape(upscale, B, C, Hp, Wp, upscale)
                    b = b[:, :, :, P : P + H, P : P + W, :]
                    o = jnp.transpose(b, (1, 2, 3, 0, 4, 5))
                    return o.reshape(B, C, H * upscale, W * upscale)
                o = stage_ensemble_apply_w(
                    st_t, w1e, win, n_modes=M, offs=offs_lane, tile=tile,
                    interpret=interpret,
                    mix=("final_u8" if final_clip else "final", M),
                    tap_rows=tap_rows,
                )[: upscale * upscale, :n_sites]
                o = o.reshape(upscale, upscale, B, C, Hp, Wp)
                o = o[:, :, :, :, P : P + H, P : P + W]
                o = jnp.transpose(o, (2, 3, 4, 0, 5, 1))
                return o.reshape(B, C, H * upscale, W * upscale)
            xb = stage_ensemble_apply_w(
                st_t, w1e, win, n_modes=M, offs=offs_lane, tile=tile,
                interpret=interpret, mix=("inner", M),
                tap_rows=tap_rows,
            )[0, :n_sites]
            # pad-band sites hold garbage; crop to the valid image (the
            # next stage re-pads fresh)
            x = xb.reshape(B, C, Hp, Wp)[:, :, P : P + H, P : P + W]
            continue
        if (plain and PLAIN_LAYOUT == "feature") or dense_t:
            from ..ops.unit_kernel import (
                stage_ensemble_apply_t,
                transpose_plain_stack,
            )

            st_t = transpose_plain_stack(stacked_stages[s])
            taps_t = _ensemble_taps_t(x, modes)
            if stage == stages:
                if final_clip == "pack" and upscale == 4:
                    # u32-packed quad rows from the kernel epilogue: the
                    # interleave becomes a free bitcast + ONE u8
                    # transpose (the bf16/f32 forms pay three wide
                    # copies — XLA hoists the f32 convert before the
                    # transposes; r4 trace).  uint8 output.
                    packed = stage_ensemble_apply_t(
                        st_t, taps_t, n_modes=M, interpret=interpret,
                        mix=("final_pack", M),
                    )                                # (4, N) u32
                    b = jax.lax.bitcast_convert_type(packed, jnp.uint8)
                    b = b.reshape(upscale, B, C, H, W, upscale)
                    o = jnp.transpose(b, (1, 2, 3, 0, 4, 5))
                    return o.reshape(B, C, H * upscale, W * upscale)
                o = stage_ensemble_apply_t(
                    st_t, taps_t, n_modes=M, interpret=interpret,
                    mix=("final_u8" if final_clip else "final", M),
                )[: upscale * upscale]               # (u*u, N)
                o = o.reshape(upscale, upscale, B, C, H, W)
                o = jnp.transpose(o, (2, 3, 4, 0, 5, 1))
                return o.reshape(B, C, H * upscale, W * upscale)
            xb = stage_ensemble_apply_t(
                st_t, taps_t, n_modes=M, interpret=interpret,
                mix=("inner", M),
            )
            x = xb[0].reshape(B, C, H, W)            # bf16, mixed/255
            continue
        taps = _ensemble_taps(x, modes)
        if plain:
            if stage == stages:
                # final_clip folds the consumer's clip(round(.), 0, 255)
                # into the kernel epilogue and emits bf16 (exact for
                # integers <= 255) — for pipelines that quantize to u8
                # anyway (the fused YUV path); final pixels identical.
                out = stage_ensemble_apply(
                    stacked_stages[s], taps, n_modes=M,
                    interpret=interpret,
                    mix=("final_u8" if final_clip else "final", M),
                )[:, : upscale * upscale]
                out = out.reshape(B, C, H, W, upscale, upscale)
                out = jnp.moveaxis(out, -2, -3)
                return out.reshape(B, C, H * upscale, W * upscale)
            xb = stage_ensemble_apply(
                stacked_stages[s], taps, n_modes=M, interpret=interpret,
                mix=("inner", M),
            )
            x = xb[:, 0].reshape(B, C, H, W)  # bf16, already mixed/255
            continue
        acc = stage_ensemble_apply(
            stacked_stages[s], taps, n_modes=M, interpret=interpret,
        )
        if stage == stages:
            out = jnp.round(acc[:, : upscale * upscale] / M)
            out = out.reshape(B, C, H, W, upscale, upscale)
            out = jnp.moveaxis(out, -2, -3)
            return out.reshape(B, C, H * upscale, W * upscale)
        mixed = jnp.clip(jnp.round(acc[:, 0] / (M * 4) + 127.0), 0, 255)
        x = (mixed.reshape(B, C, H, W) / 255.0).astype(jnp.bfloat16)


def srnets_predict_tiled(params: dict, x, *, modes: str, stages: int,
                         scale: int, phase: str = "valid", band: int = 32,
                         halo: int = 4,
                         precision=jax.lax.Precision.HIGHEST,
                         unit_impl: str = "xla", axis: int = 2):
    """Band-tiled cascade forward for large images.

    The full-resolution tap-MLP cascade materializes (4 rot x B x C x H x W,
    5*nf) activations — tens of GB at 1080p — so rows are processed in
    sequential bands via lax.scan.  Each band carries `halo` extra rows per
    side (the cascade's receptive field is 2 rows per stage); band-edge
    contamination from the per-band edge padding stays inside the halo and
    is cropped, making the result identical to the untiled forward.

    Args:
      x: (B, C, H, W) float32 in [0, 1]; H must be divisible by `band`.

    Returns:
      (B, C, H*scale, W*scale) like `srnets_predict(..., phase=phase)`.
    """
    B, C = x.shape[:2]
    H = x.shape[axis]  # the tiled spatial axis (2 = rows, 3 = columns —
    # column banding serves short-but-wide images the row path can't)
    slab_h = band + 2 * halo
    assert H >= slab_h, (H, band, halo)
    n_bands = -(-H // band)

    # Slabs are clamped INTO the image: a halo made of edge-replicated rows
    # would differ from the untiled forward at the true image edges (the
    # ensemble of a replicated row is not the replica of the ensemble — the
    # rotated taps read real rows on the other side).  At a true edge the
    # slab boundary coincides with the image boundary, so the cascade's own
    # padding applies exactly; interior band-edge contamination stays within
    # `halo` rows and is cropped.  When band does not divide H, the last
    # band overlaps the previous one — overwrites are identical values.
    def one_band(i, out_buf):
        kept0 = jnp.minimum(i * band, H - band)
        start = jnp.clip(kept0 - halo, 0, H - slab_h)
        slab = jax.lax.dynamic_slice_in_dim(x, start, slab_h, axis=axis)
        out = srnets_predict(params, slab, modes=modes, stages=stages,
                             scale=scale, phase=phase, precision=precision,
                             unit_impl=unit_impl)
        out = jax.lax.dynamic_slice_in_dim(
            out, (kept0 - start) * scale, band * scale, axis=axis
        )
        return jax.lax.dynamic_update_slice_in_dim(
            out_buf, out.astype(out_buf.dtype), kept0 * scale, axis=axis
        )

    out_buf = jnp.zeros(
        (B, C, x.shape[2] * scale, x.shape[3] * scale), jnp.float32
    )
    return jax.lax.fori_loop(0, n_bands, one_band, out_buf)


def dnnet_apply(unit_params: dict, x, *, mode: str):
    """Denoising/deblocking wrapper: stride-1, no upsampling
    (ref: common/network.py:229-272)."""
    return srnet_apply(unit_params, x, mode=mode, upscale=1)


def init_dnnets(key, *, nf: int = 64, modes: str = "sdy", stages: int = 2) -> dict:
    """Stage x mode registry of x1 units for denoising/deblocking tasks
    (the DNNet counterpart of SRNets; ref: common/network.py:229-272)."""
    params = {}
    for s in range(stages):
        for mode in modes:
            key, sub = jax.random.split(key)
            params[f"s{s + 1}_{mode}"] = init_mulut_unit(
                sub, nf=nf, upscale=1, dense=True
            )
    return params


def dnnets_predict(params: dict, x, *, modes: str, stages: int,
                   phase: str = "train"):
    """Train-time forward for the x1 (denoise/deblock) cascade — the SR
    cascade with every stage at upscale 1."""
    return srnets_predict(params, x, modes=modes, stages=stages, scale=1,
                          phase=phase)


def init_dmnet(key, *, nf: int = 64) -> dict:
    """Demosaicking unit: 2x2 bayer block -> 3-channel 2x2 output
    (ref: common/network.py:276-317, MuLUTUnit('2x2', nf, upscale=2,
    out_c=3, dense=False))."""
    return init_mulut_unit(key, nf=nf, upscale=2, out_c=3, dense=False)


def dmnet_apply(unit_params: dict, x):
    """Demosaic forward: RGGB bayer -> RGB at the same resolution.

    The reference unfolds non-overlapping 2x2 bayer cells (stride 2), runs
    the unit with out_c=3/upscale=2, and folds back with stride 2
    (ref: common/network.py:296-317).  Here each cell's four pixels are
    four strided views; the unit's 12 output lanes are (out_c, 2, 2) in
    PixelShuffle order, interleaved back to full resolution.

    Args:
      x: (B, C, H, W) float in [0, 1], H and W even (C is usually 1 — the
        raw mosaic; extra channels ride along like the batch dim).

    Returns:
      (B, C * 3, H, W) float in (-1, 1).
    """
    B, C, H, W = x.shape
    h, w = H // 2, W // 2
    planes = [
        x[..., 0::2, 0::2], x[..., 0::2, 1::2],
        x[..., 1::2, 0::2], x[..., 1::2, 1::2],
    ]
    taps = jnp.stack(planes, axis=-1)  # (B, C, h, w, 4)
    out = apply_mulut_unit(unit_params, taps.reshape(-1, 4), dense=False)
    out = out.reshape(B, C, h, w, 3, 2, 2)       # PixelShuffle lane order
    out = jnp.moveaxis(out, -3, 2)               # (B, C, 3, h, w, 2, 2)
    out = jnp.moveaxis(out, -2, -3)              # (B, C, 3, h, 2, w, 2)
    return out.reshape(B, C * 3, H, W)
