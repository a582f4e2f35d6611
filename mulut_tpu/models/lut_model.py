"""The LUT-as-model: differentiable MuLUT cascade for STE fine-tuning.

The cached int8 LUTs become float32 trainable tensors (entries / 127); the
forward pass is the full stage x mode x rotation cascade through the
differentiable simplex interpolation with straight-through rounding at every
quantization point (ref: sr/model.py:39-312).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.ensemble import lut_cascade_int  # noqa: F401  (re-export convenience)
from ..ops.simplex import round_ste, simplex_interp_diff
from ..ops.taps import mode_pad
from ..utils.lut_io import lut_filename


def init_lut_weights_from_folder(lut_folder: str, *, stages: int, modes: str,
                                 upscale: int = 4, interval: int = 4,
                                 name: str = "LUT") -> dict:
    """Load cached LUTs as float32 trainables (ref: sr/model.py:49-57).

    Reads `{name}_x{upscale}_{interval}bit_int8_s{stage}_{mode}.npy` — the
    transfer step's naming (interval-bit, not 8-interval).
    """
    import os

    weights = {}
    for s in range(stages):
        stage = s + 1
        scale = upscale if stage == stages else 1
        for mode in modes:
            path = os.path.join(
                lut_folder, lut_filename(name, upscale, interval, stage, mode)
            )
            arr = np.load(path).reshape(-1, scale * scale).astype(np.float32) / 127.0
            weights[f"s{stage}_{mode}"] = jnp.asarray(arr)
    return weights


def init_lut_weights_from_arrays(luts: dict, *, stages: int, modes: str,
                                 upscale: int) -> dict:
    weights = {}
    for s in range(stages):
        stage = s + 1
        scale = upscale if stage == stages else 1
        for mode in modes:
            key = f"s{stage}_{mode}"
            arr = np.asarray(luts[key]).reshape(-1, scale * scale)
            weights[key] = jnp.asarray(arr.astype(np.float32) / 127.0)
    return weights


def lut_model_forward(weights: dict, x, *, modes: str, stages: int,
                      upscale: int, interval: int = 4):
    """Differentiable cascade forward (ref: sr/model.py:289-312).

    Args:
      weights: {"s{stage}_{mode}": (L**4, v) float32} trainable LUTs.
      x: (B, C, H, W) float32 in [0, 1].

    Returns (B, C, H*upscale, W*upscale) float32 in [0, 1].  Note the
    reference STE-rounds the accumulated `pred` after *every* rotation
    addition (ref: sr/model.py:305-308) — replicated exactly.
    """
    x = x * 255.0
    for s in range(stages):
        stage = s + 1
        if stage == stages:
            avg_factor, bias, scale = len(modes), 0.0, upscale
        else:
            avg_factor, bias, scale = len(modes) * 4, 127.0, 1
        pred = 0.0
        for mode in modes:
            pad = mode_pad(mode)
            w = weights[f"s{stage}_{mode}"]
            for r in range(4):
                xr = jnp.rot90(x, r, axes=(-2, -1))
                xr = jnp.pad(xr, [(0, 0), (0, 0), (0, pad), (0, pad)], mode="edge")
                out = simplex_interp_diff(w, xr, mode=mode, upscale=scale,
                                          interval=interval)
                pred = pred + jnp.rot90(out, (4 - r) % 4, axes=(-2, -1))
                pred = round_ste(pred)
        x = round_ste(jnp.clip(pred / avg_factor + bias, 0, 255))
    return x / 255.0


def export_lut_weights(weights: dict) -> dict:
    """Trainable floats -> int8 arrays: round(clip(w, -1, 1) * 127)
    (ref: sr/3_finetune_lut.py:162-169)."""
    return {
        k: np.round(np.clip(np.asarray(w), -1, 1) * 127).astype(np.int8)
        for k, w in weights.items()
    }
