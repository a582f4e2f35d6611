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
from ..ops.simplex import (
    expand_weight,
    round_ste,
    simplex_planes_expanded_diff,
)
from ..ops.taps import lane_rotation_perm, mode_pad, rotated_taps
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
        # Fused rotation ensemble: rotated tap offsets on an all-sides
        # padded image + lane un-rotation, never rot90-ing tensors.  The
        # reference STE-rounds the running accumulator after EVERY rotation
        # addition (ref: sr/model.py:305-308) — rounding is elementwise, so
        # the lane-space accumulation below preserves the exact order.
        # Each mode's trainable LUT is corner-expanded in-graph
        # (expand_weight), collapsing the five corner gathers AND their five
        # backward scatters into one wide row per tapset; forward values are
        # bit-identical to the naive path (integer-valued f32 summands).
        pred = 0.0
        h, w_ = x.shape[-2], x.shape[-1]
        v = scale * scale
        for mode in modes:
            pad = mode_pad(mode)
            w = weights[f"s{stage}_{mode}"]
            w127 = jnp.clip(round_ste(w * 127.0), -127.0, 127.0)
            e127 = expand_weight(w127, interval=interval)
            xp = jnp.pad(x, [(0, 0), (0, 0), (pad, pad), (pad, pad)],
                         mode="edge")
            for r in range(4):
                planes = [
                    xp[..., pad + dy : pad + dy + h, pad + dx : pad + dx + w_]
                    for dy, dx in rotated_taps(mode, r)
                ]
                out = simplex_planes_expanded_diff(e127, planes, v=v,
                                                   interval=interval)
                if scale > 1 and r:
                    out = out[..., lane_rotation_perm(scale, r)]
                pred = round_ste(pred + out)
        pred = round_ste(jnp.clip(pred / avg_factor + bias, 0, 255))
        if scale > 1:
            B, C = pred.shape[0], pred.shape[1]
            pred = pred.reshape(B, C, h, w_, scale, scale)
            pred = jnp.moveaxis(pred, -2, -3)
            x = pred.reshape(B, C, h * scale, w_ * scale)
        else:
            x = pred[..., 0]
    return x / 255.0


def export_lut_weights(weights: dict) -> dict:
    """Trainable floats -> int8 arrays: round(clip(w, -1, 1) * 127)
    (ref: sr/3_finetune_lut.py:162-169)."""
    return {
        k: np.round(np.clip(np.asarray(w), -1, 1) * 127).astype(np.int8)
        for k, w in weights.items()
    }
