"""W8A8 quantization of plain (mxu-arch) MuLUT units for deployment.

TPU-first rationale: the v5e MXU runs int8 x int8 -> s32 matmuls at ~2x
the bf16 FLOP rate, and the mxu-arch deployment kernel's nf256 point is
MXU-bound (PERF.md: 50.3% MFU).  A W8A8 variant of the stage-ensemble
kernel halves its MXU time; at the latency-bound nf128 point it also
halves the int8 activations' VMEM traffic.

Quantization scheme (static, symmetric, calibration-free at deploy time):

  * The input domain of every unit is EXACTLY the 4-tap box [0, 1]^4
    (stage outputs are clamped to [0, 255]/255 — ref
    sr/1_train_model.py:36-43), so per-layer activation maxima are
    calibrated by evaluating the f32 unit on a dense lattice of that box
    (the same 17^4 grid LUT caching enumerates, ref
    sr/2_transfer_to_lut.py:12-42) with a safety margin for off-lattice
    peaks.  No data is needed.
  * Activations: unsigned per-layer scales (post-ReLU values in
    [0, max_l]) -> int8 codes in [0, 127].  The requant scale of layer l
    is FOLDED into layer l's dequant constants (and the head scale into
    w1/b1), so the kernel carries only per-column f32 multipliers —
    no scalar operands.
  * Weights: per-output-column symmetric int8 (s_w[j] = max|w[:, j]|/127).

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
    """Per-layer post-ReLU activation maxima of a plain unit.

    Returns {"head": float, "hidden": (D,) float array} — maxima of the
    head ReLU output and of each hidden layer's ReLU output over the
    grid_n**4 lattice of the input box.
    """
    from ..models.blocks import unit_layout

    dense, hidden = unit_layout(params)
    assert not dense, "W8A8 quantization targets plain (mxu-arch) units"
    w1 = np.asarray(params["w1"], np.float32)
    b1 = np.asarray(params["b1"], np.float32)
    hws = [np.asarray(params[f"w{i}"], np.float32) for i in hidden]
    hbs = [np.asarray(params[f"b{i}"], np.float32) for i in hidden]
    grid = _grid4(grid_n)
    head_max = 0.0
    hid_max = np.zeros(len(hidden), np.float32)
    for lo in range(0, grid.shape[0], chunk):
        x = np.maximum(grid[lo : lo + chunk] @ w1 + b1, 0.0)
        head_max = max(head_max, float(x.max(initial=0.0)))
        for d, (w, b) in enumerate(zip(hws, hbs)):
            x = np.maximum(x @ w + b, 0.0)
            hid_max[d] = max(hid_max[d], float(x.max(initial=0.0)))
    return {"head": head_max, "hidden": hid_max}


def quantize_plain_stack(stacked: dict, params: dict, *, stage: int,
                         modes: str, margin: float = 1.05,
                         grid_n: int = 17) -> dict:
    """int8 (W8A8) stage stack from `stack_stage_params` output.

    Args:
      stacked: plain-unit stack (must carry "hw"/"hb"; w6 already
        rotation-permuted and out_pad-padded).
      params: the ORIGINAL f32 srnets params (calibration source).
      margin: headroom multiplier on calibrated maxima (off-lattice
        activation peaks; 5% covers a 17-point lattice comfortably).

    Returns a dict consumed by the quantized ensemble kernel:
      w1 (M,4,nf) bf16 / b1 (M,nf) bf16 — head with the first requant
        scale folded in (kernel rounds+clips its ReLU output directly);
      hwq (D,M,nf,nf) int8; hcq/hbq (D,M,nf) f32 — dequant-requant
        constants with the next layer's scale folded in;
      w6q (M,nf,P) int8; c6 (M,P) f32; b6 (M,P) f32 — output head.
    """
    if "hw" not in stacked:
        raise ValueError("quantize_plain_stack expects a plain-unit stack "
                         "(dense-concat units keep the bf16 kernel)")
    hw = np.asarray(stacked["hw"], np.float32)     # (D, M, nf, nf)
    hb = np.asarray(stacked["hb"], np.float32)     # (D, M, nf)
    w6 = np.asarray(stacked["w6"], np.float32)     # (M, nf, P)
    b6 = np.asarray(stacked["b6"], np.float32)     # (M, P)
    D, M = hw.shape[:2]

    s_head = np.zeros((M,), np.float32)
    s_hid = np.zeros((D, M), np.float32)
    for mi, m in enumerate(modes):
        cal = calibrate_plain_unit(params[f"s{stage}_{m}"], grid_n=grid_n)
        s_head[mi] = max(cal["head"], 1e-12) * margin / 127.0
        s_hid[:, mi] = np.maximum(cal["hidden"], 1e-12) * margin / 127.0

    # weight scales, per output column
    sw_h = np.abs(hw).max(axis=2) / 127.0          # (D, M, nf)
    sw_h = np.maximum(sw_h, 1e-12)
    hwq = np.rint(hw / sw_h[:, :, None, :]).astype(np.int8)
    sw_6 = np.maximum(np.abs(w6).max(axis=1) / 127.0, 1e-12)   # (M, P)
    w6q = np.rint(w6 / sw_6[:, None, :]).astype(np.int8)

    # input-activation scale of each matmul
    s_in = np.concatenate([s_head[None], s_hid[:-1]], 0) if D else s_head
    # dequant * requant folded per column: layer d output code =
    # clip(round(relu(acc * hcq + hbq)), 0, 127)
    hcq = s_in[:, :, None] * sw_h / s_hid[:, :, None]           # (D, M, nf)
    hbq = hb / s_hid[:, :, None]
    s_last = s_hid[-1] if D else s_head                          # (M,)
    c6 = s_last[:, None] * sw_6                                  # (M, P)

    return {
        "w1": (np.asarray(stacked["w1"], np.float32)
               / s_head[:, None, None]).astype(jnp.bfloat16),
        "b1": (np.asarray(stacked["b1"], np.float32)
               / s_head[:, None]).astype(jnp.bfloat16),
        "hwq": jnp.asarray(hwq),
        "hcq": jnp.asarray(hcq),
        "hbq": jnp.asarray(hbq),
        "w6q": jnp.asarray(w6q),
        "c6": jnp.asarray(c6),
        "b6": jnp.asarray(b6),
    }


def quantize_srnets_for_fast(params: dict, *, modes: str, stages: int,
                             scale: int, margin: float = 1.05,
                             grid_n: int = 17) -> list:
    """Per-stage W8A8 stacks for `srnets_predict_fast` (plain arch only)."""
    from ..models.srnet import stack_srnets_for_fast

    stacks = stack_srnets_for_fast(params, modes=modes, stages=stages,
                                   scale=scale)
    return [
        quantize_plain_stack(st, params, stage=s + 1, modes=modes,
                             margin=margin, grid_n=grid_n)
        for s, st in enumerate(stacks)
    ]
