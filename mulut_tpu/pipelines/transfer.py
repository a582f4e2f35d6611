"""Step 2: exhaustively cache the trained network into 4-D LUTs.

The reference enumerates the 17**4 uniform grid as tiny images and runs the
spatial model in 100 GPU chunks (ref: sr/2_transfer_to_lut.py:12-110).  In the
tap-MLP formulation the spatial wrapper is the identity for a single site, so
caching one LUT is literally one (L**4, 4) @ MLP forward — a single MXU-sized
batch, no chunking, no mode-specific 3x3 re-embedding (the d/y geometry only
matters once images have real neighborhoods).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.blocks import apply_mulut_unit


@functools.lru_cache(maxsize=None)
def lut_grid(interval: int = 4) -> np.ndarray:
    """All 4-tap combinations in LUT row order, normalized to [0, 1].

    Row n = (base[ia], base[ib], base[ic], base[id]) / 255 with
    n = ia*L^3 + ib*L^2 + ic*L + id and base = (0, q, 2q, ..., 255)
    (ref: sr/2_transfer_to_lut.py:12-42 — the last grid point is 256-1 so
    MSB bin 16 is sampled at pixel value 255).
    """
    q = 2 ** interval
    base = np.arange(0, 257, q, dtype=np.int64)
    base[-1] -= 1
    L = base.size
    idx = np.indices((L, L, L, L)).reshape(4, -1).T  # lexicographic
    vals = base[idx].astype(np.float32) / 255.0
    return vals  # (L**4, 4)


def cache_lut(unit_params: dict, *, interval: int = 4,
              dense: bool | None = None) -> np.ndarray:
    """One unit -> int8 LUT (L**4, out_dim): round(clamp(out, -1, 1) * 127)
    (ref: sr/2_transfer_to_lut.py:108-109).

    `dense` defaults to None = inferred from the parameter shapes
    (`blocks.unit_layout`), so reference dense-concat units, the plain
    DMNet demosaic unit (ref: common/network.py:87-92 vs :276-317) and the
    mxu-arch variant all cache through the same call — LUT caching is
    architecture-blind (4 taps in, out_dim lanes out)."""
    grid = jnp.asarray(lut_grid(interval))

    @functools.partial(jax.jit, static_argnames="d")
    def fwd(p, g, d):
        out = apply_mulut_unit(p, g, dense=d)
        return jnp.round(jnp.clip(out, -1.0, 1.0) * 127.0)

    out = np.asarray(fwd(unit_params, grid, dense))
    return out.astype(np.int8)


def transfer_to_luts(params: dict, *, modes: str, stages: int,
                     interval: int = 4) -> dict:
    """Cache every stage x mode unit: {"s{stage}_{mode}": (L**4, v) int8}."""
    luts = {}
    for s in range(stages):
        for mode in modes:
            key = f"s{s + 1}_{mode}"
            luts[key] = cache_lut(params[key], interval=interval)
    return luts
