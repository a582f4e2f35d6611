"""Rotation ensemble + multi-stage LUT cascade with exact integer rounding.

The reference accumulates the four rotations and all sampling modes in
float64 and rounds with NumPy banker's rounding (ref: sr/4_test_lut.py:279-306).
Every intermediate quantity is a multiple of 1/q, so the whole cascade can be
carried in int32 and the stage mix becomes one exact rational
round-half-to-even — bit-identical to the reference and far friendlier to TPU
vector units than float64.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .simplex import simplex_interp_int
from .taps import mode_pad


def round_half_even_div(n, d: int):
    """round_half_to_even(n / d) for non-negative integer n, static int d."""
    quo = n // d
    rem = n - quo * d
    twice = 2 * rem
    round_up = (twice > d) | ((twice == d) & (quo % 2 == 1))
    return quo + round_up.astype(n.dtype)


def stage_mix(acc, *, q: int, avg_factor: int, bias: int):
    """clip(acc/(q*avg) + bias, 0, 255) with exact half-even rounding.

    `acc` is the integer rotation/mode accumulator (q times the reference's
    float `pred`).  Matches ref: sr/4_test_lut.py:300-302.
    """
    d = q * avg_factor
    n = jnp.clip(acc + bias * d, 0, 255 * d)
    return round_half_even_div(n, d)


def rotation_ensemble_int(lut, img, *, mode: str, upscale: int, interval: int):
    """Sum of the 4 rotated simplex-interp passes, integer accumulator.

    img: (..., H, W) int32 (unpadded).  Each rotation r rotates the image,
    pads bottom/right (replicate), interpolates, and rotates the output back
    (ref: sr/4_test_lut.py:293-298).
    """
    pad = mode_pad(mode)
    acc = None
    for r in range(4):
        x = jnp.rot90(img, r, axes=(-2, -1))
        pad_cfg = [(0, 0)] * (x.ndim - 2) + [(0, pad), (0, pad)]
        x = jnp.pad(x, pad_cfg, mode="edge")
        out = simplex_interp_int(lut, x, mode=mode, upscale=upscale, interval=interval)
        out = jnp.rot90(out, (4 - r) % 4, axes=(-2, -1))
        acc = out if acc is None else acc + out
    return acc


def lut_cascade_int(
    luts: dict,
    img,
    *,
    stages: int,
    modes: str,
    scale: int,
    interval: int = 4,
):
    """Full multi-stage x multi-mode x rotation-ensemble LUT cascade.

    Args:
      luts: {"s{stage}_{mode}": (L**4, v) int32} with v = scale**2 for the
        last stage and 1 otherwise (ref: sr/4_test_lut.py:323-333).
      img: (..., H, W) int32 in [0, 255]; channels (if any) ride the leading
        batch dims — the cascade is channel-agnostic.

    Returns:
      (..., H*scale, W*scale) int32 in [0, 255], bit-identical to the
      reference NumPy engine (ref: sr/4_test_lut.py:263-306).
    """
    q = 2 ** interval
    x = img.astype(jnp.int32)
    for s in range(stages):
        last = s + 1 == stages
        upscale = scale if last else 1
        avg_factor = len(modes) if last else len(modes) * 4
        bias = 0 if last else 127
        acc = None
        for mode in modes:
            lut = luts[f"s{s + 1}_{mode}"]
            out = rotation_ensemble_int(
                lut, x, mode=mode, upscale=upscale, interval=interval
            )
            acc = out if acc is None else acc + out
        x = stage_mix(acc, q=q, avg_factor=avg_factor, bias=bias)
    return x
