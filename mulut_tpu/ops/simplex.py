"""4-D simplex (tetrahedral) interpolation over MuLUT look-up tables.

Two device paths, both branchless (see `simplex_tables` for how the
reference's 24 masked-scatter branches become 64-entry decision tables):

  * `simplex_interp_int`  — exact integer path for deployment-grade LUT
    retrieval.  Bit-identical to the reference NumPy engine
    (ref: sr/4_test_lut.py:14-237) but expressed as 5 gathers + a 5x5
    integer mat-vec per pixel, which XLA/TPU vectorizes cleanly.
  * `simplex_interp_diff` — differentiable float path for STE LUT
    fine-tuning (ref: sr/model.py:69-287), gradients flow into the LUT
    entries through the corner gathers and into the input through the
    fractional weights.

Conventions: LUTs are flat (L**4, v) tables indexed a*L^3 + b*L^2 + c*L + d
(ref: sr/model.py:128); images are (..., H, W) with values in [0, 255]; the
integer path returns the accumulator *before* the final division by q so the
rotation/mode ensemble can be averaged with exact rational rounding
(see `ensemble.round_half_even_div`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import simplex_tables
from .taps import mode_pad, mode_taps

_WEIGHT_COEFFS = simplex_tables.weight_coeffs()  # (64, 5, 5) int32


@functools.lru_cache(maxsize=None)
def _tables(L: int):
    # NumPy constants (jnp conversion happens per-trace: caching device
    # arrays here would leak tracers out of jit scopes).
    offs = simplex_tables.corner_offsets(L)  # (64, 5) int32
    coeffs = _WEIGHT_COEFFS                  # (64, 5, 5) int32
    return offs, coeffs


def _comparison_code(fa, fb, fc, fd):
    """6-bit code from strict pairwise comparisons (bit layout of tables)."""
    code = (fa > fb).astype(jnp.int32) * 32
    code += (fa > fc).astype(jnp.int32) * 16
    code += (fa > fd).astype(jnp.int32) * 8
    code += (fb > fc).astype(jnp.int32) * 4
    code += (fb > fd).astype(jnp.int32) * 2
    code += (fc > fd).astype(jnp.int32)
    return code


def _tap_planes(img, mode: str, h: int, w: int):
    """The four sampled pixel planes (a, b, c, d), each (..., h, w)."""
    return [img[..., dy : dy + h, dx : dx + w] for dy, dx in mode_taps(mode)]


def _interleave(out, upscale: int):
    """(..., h, w, up*up) -> (..., h*up, w*up), ref: sr/model.py:283-285."""
    *lead, h, w, _ = out.shape
    out = out.reshape(*lead, h, w, upscale, upscale)
    out = jnp.moveaxis(out, -2, -3)  # (..., h, up, w, up)
    return out.reshape(*lead, h * upscale, w * upscale)


def simplex_interp_int(lut, img, *, mode: str, upscale: int, interval: int = 4):
    """Exact integer 4-D simplex interpolation.

    Args:
      lut: (L**4, upscale**2) int32 table (int8 values widened).
      img: (..., h + pad, w + pad) int32 image, values in [0, 255], already
        replicate-padded on the bottom/right by `mode_pad(mode)`.
      mode: sampling pattern in {'s', 'd', 'y', 'e', 'h', 'o'}.
      upscale: output pixels per input pixel per axis (1 for inner stages).
      interval: LSB bit width (q = 2**interval, L = 2**(8-interval) + 1).

    Returns:
      (..., h*upscale, w*upscale) int32 accumulator equal to q times the
      reference's float output (i.e. before the final `/ q`).
    """
    q = 2 ** interval
    L = 2 ** (8 - interval) + 1
    pad = mode_pad(mode)
    h = img.shape[-2] - pad
    w = img.shape[-1] - pad

    a, b, c, d = _tap_planes(img, mode, h, w)
    msb_a, msb_b, msb_c, msb_d = a // q, b // q, c // q, d // q
    fa, fb, fc, fd = a % q, b % q, c % q, d % q

    base = ((msb_a * L + msb_b) * L + msb_c) * L + msb_d
    code = _comparison_code(fa, fb, fc, fd)

    offs_t, coeffs_t = _tables(L)
    offs = jnp.take(jnp.asarray(offs_t), code, axis=0)      # (..., h, w, 5)
    coeff = jnp.take(jnp.asarray(coeffs_t), code, axis=0)   # (..., h, w, 5, 5)

    idx = base[..., None] + offs               # (..., h, w, 5)
    corners = jnp.take(lut, idx, axis=0)       # (..., h, w, 5, v)

    qv = jnp.full_like(fa, q)
    fvec = jnp.stack([qv, fa, fb, fc, fd], axis=-1)          # (..., h, w, 5)
    weights = jnp.einsum(
        "...ij,...j->...i", coeff, fvec, preferred_element_type=jnp.int32
    )
    out = jnp.einsum(
        "...k,...kv->...v", weights, corners, preferred_element_type=jnp.int32
    )
    return _interleave(out, upscale)


def round_ste(x):
    """Round with straight-through gradient (ref: sr/model.py:59-67)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def simplex_interp_diff(weight, img, *, mode: str, upscale: int, interval: int = 4):
    """Differentiable simplex interpolation for STE LUT fine-tuning.

    Args:
      weight: (L**4, upscale**2) float32 trainable LUT (values ~ [-1, 1]).
      img: (..., h + pad, w + pad) float32, values in [0, 255], already
        replicate-padded on the bottom/right by `mode_pad(mode)`.

    Returns:
      (..., h*upscale, w*upscale) float32, matching the torch fine-tune
      path (ref: sr/model.py:69-287) including the weight re-quantization
      round(weight*127) -> clamp(-127, 127) with straight-through gradients.
    """
    q = 2 ** interval
    L = 2 ** (8 - interval) + 1
    pad = mode_pad(mode)
    h = img.shape[-2] - pad
    w = img.shape[-1] - pad

    w127 = jnp.clip(round_ste(weight * 127.0), -127.0, 127.0)

    a, b, c, d = _tap_planes(img, mode, h, w)
    msb = [jnp.floor(p / q).astype(jnp.int32) for p in (a, b, c, d)]
    fa, fb, fc, fd = (p % q for p in (a, b, c, d))

    base = ((msb[0] * L + msb[1]) * L + msb[2]) * L + msb[3]
    base = jax.lax.stop_gradient(base)
    code = jax.lax.stop_gradient(_comparison_code(fa, fb, fc, fd))

    offs_t, coeffs_t = _tables(L)
    offs = jnp.take(jnp.asarray(offs_t), code, axis=0)
    coeff = jnp.take(jnp.asarray(coeffs_t), code, axis=0).astype(jnp.float32)

    idx = base[..., None] + offs
    corners = jnp.take(w127, idx, axis=0)      # (..., h, w, 5, v)

    qv = jnp.full_like(fa, float(q))
    fvec = jnp.stack([qv, fa, fb, fc, fd], axis=-1)
    weights = jnp.einsum("...ij,...j->...i", coeff, fvec)
    out = jnp.einsum("...k,...kv->...v", weights, corners) / q
    return _interleave(out, upscale)


def reference_oracle_int(lut, img, *, mode: str, upscale: int, interval: int = 4):
    """Slow, independent NumPy oracle used only by tests.

    Straightforward per-pixel evaluation of the simplex spec (sort the four
    fractions with the reference's strict-comparison decision chain via the
    same host tables, then accumulate the five weighted corners).  Written
    against the math, not the reference code; kept in NumPy + Python loops so
    a table/vectorization bug in the device path cannot hide here.
    """
    q = 2 ** interval
    L = 2 ** (8 - interval) + 1
    pad = mode_pad(mode)
    h = img.shape[-2] - pad
    w = img.shape[-1] - pad
    taps = mode_taps(mode)
    v = upscale * upscale
    offs = simplex_tables.corner_offsets(L)
    coeffs = simplex_tables.weight_coeffs()

    lead = img.shape[:-2]
    out = np.zeros(lead + (h, w, v), dtype=np.int64)
    for index in np.ndindex(*lead):
        for i in range(h):
            for j in range(w):
                px = [int(img[index + (i + dy, j + dx)]) for dy, dx in taps]
                msb = [p // q for p in px]
                f = [p % q for p in px]
                basev = ((msb[0] * L + msb[1]) * L + msb[2]) * L + msb[3]
                codev = simplex_tables.comparison_code(
                    np.int64(f[0]), np.int64(f[1]), np.int64(f[2]), np.int64(f[3])
                )
                wts = coeffs[codev] @ np.array([q] + f, dtype=np.int64)
                acc = np.zeros(v, dtype=np.int64)
                for k in range(5):
                    acc += wts[k] * lut[basev + offs[codev, k]]
                out[index + (i, j)] = acc
    out = out.reshape(lead + (h, w, upscale, upscale))
    out = np.moveaxis(out, -2, -3).reshape(lead + (h * upscale, w * upscale))
    return out
