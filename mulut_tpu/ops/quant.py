"""W8A8 quantization of plain (mxu-arch) MuLUT units for deployment.

TPU-first rationale: the v5e MXU runs int8 x int8 -> s32 matmuls at ~2x
the bf16 FLOP rate, and the mxu-arch deployment kernel's nf256 point is
MXU-bound (PERF.md: 50.3% MFU).  A W8A8 variant of the stage-ensemble
kernel halves its MXU time; at the latency-bound nf128 point it also
halves the int8 activations' VMEM traffic.

Quantization scheme (static, symmetric, calibration-free at deploy time):

  * The input domain of every unit is EXACTLY the 4-tap box [0, 1]^4
    (stage outputs are clamped to [0, 255]/255 — ref
    sr/1_train_model.py:36-43), so activation maxima are calibrated by
    evaluating the f32 unit on a dense lattice of that box (the same
    17^4 grid LUT caching enumerates, ref sr/2_transfer_to_lut.py:12-42)
    with a safety margin for off-lattice peaks.  No data is needed.
  * Activations: unsigned PER-CHANNEL scales (post-ReLU values in
    [0, max_c]) -> int8 codes in [0, 127].  A per-channel input scale is
    exact to fold: x real = x_q * s_in[c] column-wise, so the next
    matmul's weight ROWS absorb s_in before the weights are themselves
    quantized (W'[c, j] = s_in[c] * W[c, j]).  The head scale folds into
    w1/b1.  (r3 session 9: per-LAYER scalar scales lost 6.4 dB on the
    synthetic quality harness; per-channel recovers it — starved
    channels were getting a handful of codes.)
  * Weights: per-output-column symmetric int8 on the FOLDED weights
    (s_w[j] = max|W'[:, j]|/127).
  * Requant between int8 matmuls comes in two kernel forms:
      - "f32": x_next = clip(round(relu(acc * c + b)), 0, 127) with
        per-column f32 constants (`_plain_q_kernel`);
      - "int": integer-domain fixed-point — x_next =
        clip(((acc * M + half) >> S) + B, 0, 127) with per-column int32
        multipliers/shifts (`_plain_q2_kernel`), matching the
        datapath of the 312-Tops/s int8 chain probe (experiments/
        _r3_i8.py) — no f32 round-trip between MXU ops.

The tanh head and the per-rotation round(127*out) accumulation stay in
f32 — identical to the bf16 kernel's epilogue.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _grid4(n: int) -> np.ndarray:
    """(n**4, 4) lattice over the unit input box [0, 1]^4."""
    base = np.linspace(0.0, 1.0, n, dtype=np.float32)
    g = np.stack(np.meshgrid(base, base, base, base, indexing="ij"), -1)
    return g.reshape(-1, 4)


def calibrate_plain_unit(params: dict, *, grid_n: int = 17,
                         chunk: int = 1 << 16) -> dict:
    """Per-CHANNEL post-ReLU activation maxima of a plain unit.

    Returns {"head": (nf,) float array, "hidden": (D, nf) float array} —
    column-wise maxima of the head ReLU output and of each hidden
    layer's ReLU output over the grid_n**4 lattice of the input box.
    """
    from ..models.blocks import unit_layout

    dense, hidden = unit_layout(params)
    assert not dense, "W8A8 quantization targets plain (mxu-arch) units"
    w1 = np.asarray(params["w1"], np.float32)
    b1 = np.asarray(params["b1"], np.float32)
    hws = [np.asarray(params[f"w{i}"], np.float32) for i in hidden]
    hbs = [np.asarray(params[f"b{i}"], np.float32) for i in hidden]
    grid = _grid4(grid_n)
    nf = w1.shape[1]
    head_max = np.zeros(nf, np.float32)
    hid_max = np.zeros((len(hidden), nf), np.float32)
    for lo in range(0, grid.shape[0], chunk):
        x = np.maximum(grid[lo : lo + chunk] @ w1 + b1, 0.0)
        head_max = np.maximum(head_max, x.max(axis=0, initial=0.0))
        for d, (w, b) in enumerate(zip(hws, hbs)):
            x = np.maximum(x @ w + b, 0.0)
            hid_max[d] = np.maximum(hid_max[d], x.max(axis=0, initial=0.0))
    return {"head": head_max, "hidden": hid_max}


def _fixed_point(hcq: np.ndarray, hbq: np.ndarray, nf: int):
    """Per-column fixed-point (M, S, half, B) from f32 requant constants.

    x_next = clip(((acc * M + half) >> S) + B, 0, 127) approximates
    clip(round(relu(acc * hcq + hbq)), 0, 127).  S is chosen per column
    so that |acc * M + half| stays inside 2^30 (|acc| <= 127 * 127 * nf
    for [0,127] activation codes and int8 weights) while keeping M as
    large as that bound allows (relative quantization error <= 1/(2M)).
    The bias is added post-shift (rounded to the nearest code; a 2^S
    pre-shift bias would overflow int32) and clamped to +-2^29 so that
    ti + B can never wrap int32 (|ti| <= 2^(30-S) <= 2^30; near-dead
    channels with |hbq| beyond the clamp saturate to code 0/127 exactly
    as the f32 datapath does).  Columns with hcq == 0 (dead channels,
    zeroed by the caller) emit M=0 so the output code is exactly B.
    """
    accmax = 127.0 * 127.0 * nf
    mcap = (2.0**30 - 1.0) / accmax
    pos = np.maximum(hcq, 1e-30)
    S = np.clip(np.floor(np.log2(mcap / pos)), 0, 30).astype(np.int64)
    Mi = np.rint(pos * np.exp2(S.astype(np.float64)))
    over = Mi > mcap
    while over.any():
        S = np.where(over & (S > 0), S - 1, S)
        Mi = np.rint(pos * np.exp2(S.astype(np.float64)))
        over = (Mi > mcap) & (S > 0)
    Mi = np.where(hcq <= 0.0, 0.0, np.clip(Mi, 1, mcap))
    half = np.where(S > 0, np.exp2((S - 1).astype(np.float64)), 0.0)
    B = np.clip(np.nan_to_num(np.rint(hbq)), -(2.0**29), 2.0**29)
    return (Mi.astype(np.int32), S.astype(np.int32),
            half.astype(np.int32), B.astype(np.int32))


def quantize_plain_stack(stacked: dict, params: dict, *, stage: int,
                         modes: str, margin: float = 1.05,
                         grid_n: int = 17, requant: str = "int") -> dict:
    """int8 (W8A8) stage stack from `stack_stage_params` output.

    Args:
      stacked: plain-unit stack (must carry "hw"/"hb"; w6 already
        rotation-permuted and out_pad-padded).
      params: the ORIGINAL f32 srnets params (calibration source).
      margin: headroom multiplier on calibrated maxima (off-lattice
        activation peaks; 5% covers a 17-point lattice comfortably).
      requant: kernel datapath for the inter-layer requantization —
        "int" (default): integer fixed-point constants and the
          lane-sliceless (M, 4, nf, P) head layout (`_plain_q2_kernel`);
        "f32w6": f32 requant constants with the same head layout
          (`_plain_qw6_kernel`; A/B bisect variant);
        "f32": the original kernel layout (`_plain_q_kernel`).

    Common keys: w1 (M,4,nf) bf16 / b1 (M,nf) bf16 — head with the
    per-channel first requant scale folded in; hwq (D,M,nf,nf) int8 —
    hidden weights with the input activation scales folded into ROWS
    before per-output-column quantization.  Requant constants and the
    output head follow `requant` (see the module docstring).
    """
    if "hw" not in stacked:
        raise ValueError("quantize_plain_stack expects a plain-unit stack "
                         "(dense-concat units keep the bf16 kernel)")
    if requant not in ("int", "f32w6", "f32"):
        raise ValueError(f"unknown requant form: {requant!r}")
    hw = np.asarray(stacked["hw"], np.float32)     # (D, M, nf, nf)
    hb = np.asarray(stacked["hb"], np.float32)     # (D, M, nf)
    w6 = np.asarray(stacked["w6"], np.float32)     # (M, nf, 4*P)
    b6 = np.asarray(stacked["b6"], np.float32)     # (M, 4*P)
    D, M, nf = hw.shape[:3]

    s_head = np.zeros((M, nf), np.float32)
    s_hid = np.zeros((D, M, nf), np.float32)
    hid_dead = np.zeros((D, M, nf), bool)
    for mi, m in enumerate(modes):
        cal = calibrate_plain_unit(params[f"s{stage}_{m}"], grid_n=grid_n)
        s_head[mi] = np.maximum(cal["head"], 1e-12) * margin / 127.0
        s_hid[:, mi] = np.maximum(cal["hidden"], 1e-12) * margin / 127.0
        # a hidden channel whose post-ReLU max is ~0 over the whole input
        # box always emits code 0; its requant constants (b/s with s ~
        # 1e-14) would otherwise explode (int32 bias overflow in the
        # fixed-point form).  Zero it exactly instead.
        hid_dead[:, mi] = cal["hidden"] <= 1e-9

    # fold each matmul's per-channel INPUT scale into its weight rows,
    # then quantize per output column
    s_in = np.concatenate([s_head[None], s_hid[:-1]], 0)        # (D, M, nf)
    hw_f = hw * s_in[:, :, :, None]
    sw_h = np.maximum(np.abs(hw_f).max(axis=2) / 127.0, 1e-12)  # (D, M, nf)
    hwq = np.rint(hw_f / sw_h[:, :, None, :]).astype(np.int8)
    s_last = s_hid[-1] if D else s_head                          # (M, nf)
    w6_f = w6 * s_last[:, :, None]
    sw_6 = np.maximum(np.abs(w6_f).max(axis=1) / 127.0, 1e-12)   # (M, 4P)
    w6q = np.rint(w6_f / sw_6[:, None, :]).astype(np.int8)

    # dequant * requant folded per column: layer d output code =
    # clip(round(relu(acc * hcq + hbq)), 0, 127)
    hcq = sw_h / s_hid                                           # (D, M, nf)
    hbq = hb / s_hid
    c6 = sw_6                                                    # (M, 4P)

    # dead hidden channels: zero the column's weights and constants so
    # both requant datapaths emit exactly code 0 (their true output)
    if hid_dead.any():
        dm, dmi, dc = np.nonzero(hid_dead)
        hwq[dm, dmi, :, dc] = 0
        hcq[hid_dead] = 0.0
        hbq[hid_dead] = 0.0

    out = {
        "w1": (np.asarray(stacked["w1"], np.float32)
               / s_head[:, None, :]).astype(jnp.bfloat16),
        "b1": (np.asarray(stacked["b1"], np.float32)
               / s_head).astype(jnp.bfloat16),
        "hwq": jnp.asarray(hwq),
    }
    if requant == "f32":
        out.update(hcq=jnp.asarray(hcq), hbq=jnp.asarray(hbq),
                   w6q=jnp.asarray(w6q), c6=jnp.asarray(c6),
                   b6=jnp.asarray(b6))
        return out

    # lane-sliceless head layout: (M, nf, 4*P) -> (M, 4, nf, P) so the
    # kernel indexes [mi, r] statically instead of slicing 16 int8 lanes
    P = w6.shape[2] // 4
    w6q4 = w6q.reshape(M, nf, 4, P).transpose(0, 2, 1, 3)
    c6r = c6.reshape(M, 4, P)
    b6r = b6.reshape(M, 4, P)
    out.update(w6q=jnp.asarray(w6q4), c6=jnp.asarray(c6r),
               b6=jnp.asarray(b6r))
    if requant == "f32w6":
        out.update(hcq=jnp.asarray(hcq), hbq=jnp.asarray(hbq))
        return out
    hm, hs, hh, hbi = _fixed_point(hcq, hbq, nf)
    out.update(hmq=jnp.asarray(hm), hsq=jnp.asarray(hs),
               hhq=jnp.asarray(hh), hbi=jnp.asarray(hbi))
    return out


def quantize_srnets_for_fast(params: dict, *, modes: str, stages: int,
                             scale: int, margin: float = 1.05,
                             grid_n: int = 17, requant: str = "int") -> list:
    """Per-stage W8A8 stacks for `srnets_predict_fast` (plain arch only)."""
    from ..models.srnet import stack_srnets_for_fast

    stacks = stack_srnets_for_fast(params, modes=modes, stages=stages,
                                   scale=scale)
    return [
        quantize_plain_stack(st, params, stage=s + 1, modes=modes,
                             margin=margin, grid_n=grid_n, requant=requant)
        for s, st in enumerate(stacks)
    ]
