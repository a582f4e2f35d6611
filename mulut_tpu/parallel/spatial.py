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


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        from jax import shard_map

        kw = {"check_vma": False}
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

        kw = {"check_rep": False}
    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     **kw)


def net_row_sharded(mesh: Mesh, params: dict, x, *, modes: str, stages: int,
                    scale: int, axis: str = "data", halo: int | None = None,
                    fast_stacked: list | None = None,
                    interpret: bool = False, final_clip: bool | str = False):
    """Row-sharded NET-mode forward: one large image across the mesh.

    The net-path twin of `cascade_row_sharded` (VERDICT r4 #7; replaces
    the reference's Pool(24) per-image fan-out, ref sr/4_test_lut.py:
    257-259, for the single-huge-image case).  Each device computes one
    row band through the full cascade using the CLAMPED-slab scheme of
    `srnet.srnets_predict_tiled` — the slab carries `halo` context rows
    clamped INTO the image, so band-edge contamination stays inside the
    cropped halo and true image edges coincide with slab edges (where
    the cascade's own per-stage edge padding applies).  Outputs are
    bit-identical to the unsharded forward, uneven H included (the last
    device's band overlaps the previous one; the overlap rows are
    identical values and are dropped in the reassembly below).

    Args:
      x: (B, C, H, W) float in [0, 1], replicated (LR inputs are small;
        the COMPUTE and activations — the actual memory load — shard).
      fast_stacked: route each slab through the Pallas fast path
        (`srnets_predict_fast` stacks) instead of the f32 forward.

    Returns (B, C, H*scale, W*scale), rows sharded over the mesh.
    """
    from ..models.srnet import srnets_predict, srnets_predict_fast
    from ..ops.taps import mode_pad

    B, C, H, W = x.shape
    n = mesh.shape[axis]
    band = -(-H // n)
    if halo is None:
        halo = stages * max(mode_pad(m) for m in modes)
    slab_h = band + 2 * halo
    assert H >= slab_h, (H, band, halo)

    def one_band(xfull):
        d = jax.lax.axis_index(axis)
        kept0 = jnp.minimum(d * band, H - band)
        start = jnp.clip(kept0 - halo, 0, H - slab_h)
        slab = jax.lax.dynamic_slice_in_dim(xfull, start, slab_h, axis=2)
        if fast_stacked is not None:
            out = srnets_predict_fast(fast_stacked, slab, modes=modes,
                                      stages=stages, scale=scale,
                                      interpret=interpret,
                                      final_clip=final_clip)
        else:
            out = srnets_predict(params, slab, modes=modes, stages=stages,
                                 scale=scale, phase="valid")
        return jax.lax.dynamic_slice_in_dim(
            out, (kept0 - start) * scale, band * scale, axis=2)

    spec = [None] * 4
    spec[2] = axis
    out = _shard_map(one_band, mesh, P(), P(*spec))(x)
    if n * band != H:
        cut = (n - 1) * band * scale
        main = out[:, :, :cut]
        tail = out[:, :, cut + ((n - 1) * band - (H - band)) * scale :]
        out = jnp.concatenate([main, tail], axis=2)
    return out
