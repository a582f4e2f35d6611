"""Bicubic resize as dense per-axis matmuls — the TPU-native resize.

The reference's YUV deployment mode (ref: sr/Test.py:317-398) upscales
chroma with PIL's bicubic on the host.  On TPU the natural formulation is
one dense (out, in) weight matrix per axis applied as two matmuls:

    out = Wv @ img @ Wh.T

The weight matrices are tiny (out x in, e.g. 1080x270 f32 = 1.2 MB), are
computed once on the host per (in, out) shape pair at trace time (shapes
are static under jit), and turn the whole resize into two MXU-friendly
dense contractions — no gathers, no dynamic slicing, fuses with the
surrounding color-transform matmuls.

Weight convention matches PIL's `Image.resize(..., BICUBIC)` float path:
Keys cubic with a = -0.5, support 2 (upscale keeps filterscale 1), sample
centers at (i + 0.5) / scale - 0.5, and border taps renormalized (PIL
clips the tap window to the image and renormalizes, NOT clamp-replicate).
Verified equal to PIL's FLOAT path (mode "F") to f32 precision.  The one
intended divergence from PIL's uint8 path: PIL quantizes AND clamps to
[0, 255] between the two axis passes (plus 22-bit fixed-point weights);
this implementation keeps f32 through both axes — strictly less
intermediate rounding, so uint8 outputs can differ where the cubic
overshoots (sharp edges / noise; negligible on smooth chroma).  Quality
parity with the host YUV path is pinned in tests/test_yuv.py.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _keys_cubic(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    ax = np.abs(x)
    return np.where(
        ax < 1, ((a + 2) * ax - (a + 3)) * ax * ax + 1,
        np.where(ax < 2, (((ax - 5) * ax + 8) * ax - 4) * a, 0.0),
    )


@functools.lru_cache(maxsize=64)
def _bicubic_matrix_np(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) f32 PIL-convention bicubic resampling matrix."""
    ratio = n_in / n_out
    filterscale = max(ratio, 1.0)
    support = 2.0 * filterscale
    w = np.zeros((n_out, n_in), np.float64)
    for i in range(n_out):
        center = (i + 0.5) * ratio
        lo = max(int(np.floor(center - support)), 0)
        hi = min(int(np.ceil(center + support)), n_in)
        taps = np.arange(lo, hi)
        ww = _keys_cubic((taps - center + 0.5) / filterscale)
        w[i, lo:hi] = ww / ww.sum()
    return w.astype(np.float32)


def bicubic_resize_hw(x, h_out: int, w_out: int):
    """Bicubic-resize the last two dims of `x` to (h_out, w_out), f32.

    Jit-safe: the weight matrices depend only on the (static) shapes and
    ride into the graph as constants.  `x` may have any leading dims.
    """
    import jax

    h_in, w_in = x.shape[-2], x.shape[-1]
    x = x.astype(jnp.float32)
    # HIGHEST: on TPU, f32 dots default to bf16 MXU passes — these
    # matmuls are tiny next to the SR cascade, and chroma deserves the
    # full f32 (that precision edge over PIL is the documented win).
    hp = jax.lax.Precision.HIGHEST
    if h_in != h_out:
        wv = jnp.asarray(_bicubic_matrix_np(h_in, h_out))
        x = jnp.einsum("oh,...hw->...ow", wv, x, precision=hp)
    if w_in != w_out:
        wh = jnp.asarray(_bicubic_matrix_np(w_in, w_out))
        x = jnp.einsum("ow,...hw->...ho", wh, x, precision=hp)
    return x


def bicubic_upscale(x, scale: int):
    """Integer-factor bicubic upscale of the last two dims (PIL phases)."""
    return bicubic_resize_hw(
        x, x.shape[-2] * scale, x.shape[-1] * scale
    )
