"""Spatial (image-space) sharding for large-image LUT retrieval.

The reference scales eval over CPU processes per image
(ref: sr/4_test_lut.py:257-259).  The TPU-native scale axis is pixels: shard
the image's row axis over the mesh with `NamedSharding(P(None, 'data'))` and
jit the cascade — XLA inserts the halo exchanges (the cascade's taps reach at
most mode_pad(mode) = 2 rows across a shard boundary) as ICI collectives
automatically.  Batches of images shard the batch axis instead
(`mesh.shard_batch`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.ensemble import lut_cascade_int


def row_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard dim -2 (image rows) of an (..., H, W) array over the mesh."""
    spec = [None] * ndim
    spec[-2] = axis
    return NamedSharding(mesh, P(*spec))


def shard_image_rows(mesh: Mesh, img, axis: str = "data"):
    return jax.device_put(img, row_sharding(mesh, img.ndim, axis))


def cascade_row_sharded(
    mesh: Mesh,
    luts: dict,
    img,
    *,
    stages: int,
    modes: str,
    scale: int,
    interval: int = 4,
    expanded: bool = False,
    axis: str = "data",
):
    """Run the LUT cascade with the image rows sharded across the mesh.

    `img` is (..., H, W).  When H is not divisible by the mesh size the
    rows are edge-padded up to a device multiple and the cascade runs
    with `valid_hw` clamping (the bucketed-evaluation mechanism,
    `ops.ensemble.clamp_pad_region`, which re-syncs the pad region per
    stage) — bit-identical to the unsharded cascade at the true size;
    the pad rows are cropped off the output.  Returns the upscaled image
    with rows sharded the same way.
    """
    img = jnp.asarray(img)
    H, W = img.shape[-2], img.shape[-1]
    n = mesh.shape[axis]
    pad = -H % n
    if pad:
        cfg = [(0, 0)] * (img.ndim - 2) + [(0, pad), (0, 0)]
        img = jnp.pad(img, cfg, mode="edge")
    img = shard_image_rows(mesh, img, axis)
    out_sharding = row_sharding(mesh, img.ndim, axis)

    # Tables ride as jit ARGUMENTS (replicated device buffers), not
    # closure constants — corner-expanded tables baked into the program
    # blow remote-compile request limits.
    @jax.jit
    def run(tabs, x):
        out = lut_cascade_int(
            tabs, x, stages=stages, modes=modes, scale=scale,
            interval=interval, expanded=expanded,
            valid_hw=(H, W) if pad else None,
        )
        return jax.lax.with_sharding_constraint(out, out_sharding)

    out = run(luts, img)
    if pad:
        out = out[..., : H * scale, :]
    return out
