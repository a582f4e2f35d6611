"""Pallas TPU kernel: post-gather simplex corner contraction.

The LUT-retrieval hot loop is gather-bound on paper, but at XLA scope the
16-corner weighted sum re-materializes its (N, width) float32 accumulator
per corner term — at 1080p that is >10 GB of HBM accumulator traffic per
stage x mode, several times the gathered bytes themselves.  This kernel
streams the gathered int8 rows through VMEM row tiles and keeps the
accumulator on-chip: one read of the gathered rows, one write of the
result, nothing else touches HBM.

Division of labor (measured, not guessed):

  * XLA: the table gather itself (Mosaic cannot express a vector gather —
    `dynamic_gather` needs equal shapes — and XLA's gather already runs at
    the fixed ~2-5 ns/row hardware floor), plus the per-pixel simplex
    weights lambda (sort network + rank arithmetic on flat (N,) arrays,
    which XLA vectorizes perfectly and fuses into one pass).
  * Pallas (this kernel): the bandwidth-bound contraction
        out[n, r*W + w] = sum_m lam[n, m, r] * g[n, (m, r, w)]
    as 16 fused multiply-adds over (TILE, n_rot*W) blocks.

Layouts (chosen so every hot op is lane-contiguous):
  g   : (N, 16 * n_rot * W) int8/int32, corner-mask-major [m][r][W] —
        each corner's FMA reads one contiguous (TILE, n_rot*W) slice.
  lam : (N, 16 * n_rot) float32, [m][r] — per corner a (TILE, n_rot)
        slice lane-repeated W times to line up with g's row blocks.
  out : (N, n_rot * W) int32, [r][W] per-rotation partial accumulators
        (q x the reference's float values; rotation un-shift / summation
        stays at XLA scope where the spatial layout lives).

Used by `simplex.simplex_planes_folded_int` (n_rot=1, W=4v: the folded
rotation ensemble shares one lam across rotations) and the per-rotation
expanded path for non-symmetric modes (n_rot=4, W=v).  Bit-exact vs the
pure-XLA contraction: every addend is an integer-valued float32 below
2**24, so summation order is irrelevant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 2048


def _kernel(n_terms: int, n_rot: int, width: int, g_ref, lam_ref, out_ref,
            acc_ref):
    gw = n_rot * width
    # In-place accumulation into a VMEM scratch: an out-of-place `acc + term`
    # chain keeps all unrolled temporaries live and blows the 16 MB
    # scoped-VMEM budget.
    for m in range(n_terms):
        if n_rot == 1:
            lam = lam_ref[:, m : m + 1]                    # (T, 1) broadcast
        else:
            # (T, n_rot) -> (T, n_rot*W): per-rotation scalar spread over its
            # W-lane block (jnp.repeat lowers to a reshape Mosaic rejects).
            lam = jnp.concatenate(
                [
                    jnp.broadcast_to(
                        lam_ref[:, m * n_rot + r : m * n_rot + r + 1],
                        (lam_ref.shape[0], width),
                    )
                    for r in range(n_rot)
                ],
                axis=1,
            )
        term = lam * g_ref[:, m * gw : (m + 1) * gw].astype(jnp.float32)
        if m == 0:
            acc_ref[:] = term
        else:
            acc_ref[:] = acc_ref[:] + term
    out_ref[:] = acc_ref[:].astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("n_rot", "width", "interpret")
)
def simplex_contract(g, lam, *, n_rot: int, width: int,
                     interpret: bool = False):
    """out[n, r*W+w] = sum_m lam[n, m*n_rot+r] * g[n, (m*n_rot+r)*W+w].

    Args:
      g: (N, n_terms * n_rot * width) int8/int32 gathered corner rows,
        [m][r][W] — n_terms is 16 for corner-expanded tables, 5 for
        rank-expanded ones (inferred from the column count).
      lam: (N, n_terms * n_rot) float32 simplex corner weights, [m][r].
      interpret: run in the Pallas interpreter (CPU testing).

    Returns:
      (N, n_rot * width) int32 per-rotation accumulators.
    """
    n = g.shape[0]
    n_terms = g.shape[1] // (n_rot * width)
    assert n_terms * n_rot * width == g.shape[1]
    assert lam.shape[1] == n_terms * n_rot
    n_pad = -(-n // TILE) * TILE
    if n_pad != n:
        g = jnp.pad(g, ((0, n_pad - n), (0, 0)))
        lam = jnp.pad(lam, ((0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel, n_terms, n_rot, width),
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, g.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, lam.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, n_rot * width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_rot * width), jnp.int32),
        scratch_shapes=[pltpu.VMEM((TILE, n_rot * width), jnp.float32)],
        interpret=interpret,
    )(g, lam)
    return out[:n]
