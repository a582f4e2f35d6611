"""Parity of the rotation-folded gather engine vs the per-rotation engine.

The folded engine serves all 4 rotations of a 90-degree-symmetric tap
pattern (s, d, e) from ONE gather per pixel (ops/simplex_tables.fold_lut +
ops/simplex.simplex_planes_folded_int); non-symmetric modes (y, h, o) get
the stacked-contraction quad path.  Both must be bit-identical to
`rotation_ensemble_lanes_int`, which is bit-identical to the reference
NumPy engine (ref: sr/4_test_lut.py:14-237).
"""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from mulut_tpu.ops import simplex_tables
from mulut_tpu.ops.ensemble import (
    prepare_expanded_luts,
    rotation_ensemble_lanes_folded_int,
    rotation_ensemble_lanes_int,
    rotation_ensemble_lanes_quad_int,
)
from mulut_tpu.ops.taps import TAPS, fold_geometry, lane_rotation_perm


def test_fold_geometry_symmetry_classes():
    # s/d/e are square point sets (90-degree symmetric); y/h/o are not.
    for mode in ("s", "d", "e"):
        geo = fold_geometry(mode)
        assert geo is not None and len(geo) == 4
        # rotation 0 must be the identity assignment with zero shift
        assert geo[0] == ((0, 0), (0, 1, 2, 3))
        for (sy, sx), sigma in geo:
            assert sorted(sigma) == [0, 1, 2, 3]
    for mode in ("y", "h", "o"):
        assert fold_geometry(mode) is None


@pytest.mark.parametrize("mode", ["s", "d", "e"])
@pytest.mark.parametrize("v", [1, 16])
def test_folded_matches_per_rotation(mode, v, rng):
    up = int(round(v ** 0.5))
    lut = jnp.asarray(rng.integers(-127, 128, (17 ** 4, v)), jnp.int32)
    geo = fold_geometry(mode)
    perms = [lane_rotation_perm(up, r) for r in range(4)] if v > 1 else None
    flut = jnp.asarray(
        simplex_tables.fold_lut(
            np.asarray(lut).astype(np.int8), geo, perms
        )
    )
    img = jnp.asarray(rng.integers(0, 256, (2, 9, 11)), jnp.int32)
    a = np.asarray(rotation_ensemble_lanes_int(
        lut, img, mode=mode, upscale=up, interval=4))
    b = np.asarray(rotation_ensemble_lanes_folded_int(
        flut, img, mode=mode, upscale=up, interval=4))
    np.testing.assert_array_equal(a, b)


def test_folded_tie_patterns(rng):
    """3-level pixel values hit every fraction rank order incl. all ties;
    the permuted tie-break must still land on zero-weight corners only."""
    lut = jnp.asarray(rng.integers(-127, 128, (17 ** 4, 1)), jnp.int32)
    flut = jnp.asarray(simplex_tables.fold_lut(
        np.asarray(lut).astype(np.int8), fold_geometry("s"), None))
    vals = np.array(list(itertools.product([16, 17, 18], repeat=4)))
    # lay the 81 combinations out on a grid the 2x2 window scans
    img = jnp.asarray(
        np.pad(vals.reshape(81, 2, 2), ((0, 0), (0, 3), (0, 3)), mode="edge"),
        jnp.int32,
    )
    a = np.asarray(rotation_ensemble_lanes_int(
        lut, img, mode="s", upscale=1, interval=4))
    b = np.asarray(rotation_ensemble_lanes_folded_int(
        flut, img, mode="s", upscale=1, interval=4))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("mode", ["y", "h", "o"])
@pytest.mark.parametrize("v", [1, 16])
def test_quad_matches_per_rotation(mode, v, rng):
    up = int(round(v ** 0.5))
    lut = jnp.asarray(rng.integers(-127, 128, (17 ** 4, v)), jnp.int32)
    # rank=False pins the 16-corner quad format (the rank-expanded quad has
    # its own parity test below).
    eluts = prepare_expanded_luts({f"s9_{mode}" if v > 1 else f"s1_{mode}":
                                   lut}, rank=False)
    elut = next(iter(eluts.values()))
    img = jnp.asarray(rng.integers(0, 256, (2, 8, 10)), jnp.int32)
    a = np.asarray(rotation_ensemble_lanes_int(
        lut, img, mode=mode, upscale=up, interval=4))
    b = np.asarray(rotation_ensemble_lanes_quad_int(
        elut, img, mode=mode, upscale=up, interval=4))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("mode", list(TAPS))
def test_prepare_expanded_formats(mode, rng):
    """prepare_expanded_luts picks rank-expanded rows for wide (v>1)
    tables, folded/int32-widened 16-corner rows for v=1."""
    for v in (1, 16):
        lut = jnp.asarray(rng.integers(-127, 128, (17 ** 4, v)), jnp.int32)
        out = prepare_expanded_luts({f"s1_{mode}": lut})[f"s1_{mode}"]
        sym = fold_geometry(mode) is not None
        if sym and v == 1:
            assert out.shape == (17 ** 4, 64) and out.dtype == jnp.int8
        elif sym:
            assert out.shape[0] == 17 ** 4 * 24 and out.shape[1] >= 20 * v
            assert out.dtype == jnp.int8
        elif v == 1:
            assert out.shape == (17 ** 4, 16) and out.dtype == jnp.int32
        else:
            assert out.shape == (4, 17 ** 4 * 24, 5 * v)
            assert out.dtype == jnp.int8
        # 16-corner fallback (memory-bounded configs)
        out = prepare_expanded_luts({f"s1_{mode}": lut},
                                    rank=False)[f"s1_{mode}"]
        if sym:
            assert out.shape == (17 ** 4, 64 * v) and out.dtype == jnp.int8
        elif v == 1:
            assert out.shape == (17 ** 4, 16) and out.dtype == jnp.int32
        else:
            assert out.shape == (4, 17 ** 4, 16 * v) and out.dtype == jnp.int8


@pytest.mark.parametrize("mode", ["s", "d"])
def test_rank_folded_matches_per_rotation(mode, rng):
    """Rank-expanded (5-corner) folded tables: bit parity vs base engine."""
    from mulut_tpu.ops.ensemble import lut_cascade_int

    lut = jnp.asarray(rng.integers(-127, 128, (17 ** 4, 16)), jnp.int32)
    geo = fold_geometry(mode)
    perms = [lane_rotation_perm(4, r) for r in range(4)]
    rflut = jnp.asarray(simplex_tables.rank_fold_lut(
        np.asarray(lut).astype(np.int8), geo, perms))
    assert rflut.shape == (17 ** 4 * 24, 384)  # 320 tile-padded
    img = jnp.asarray(rng.integers(0, 256, (2, 9, 11)), jnp.int32)
    a = np.asarray(rotation_ensemble_lanes_int(
        lut, img, mode=mode, upscale=4, interval=4))
    b = np.asarray(rotation_ensemble_lanes_folded_int(
        rflut, img, mode=mode, upscale=4, interval=4, rank=True))
    np.testing.assert_array_equal(a, b)


def test_rank_folded_tie_patterns(rng):
    """Every fraction rank order incl. all ties through the rank index."""
    lut = jnp.asarray(rng.integers(-127, 128, (17 ** 4, 4)), jnp.int32)
    perms = [lane_rotation_perm(2, r) for r in range(4)]
    rflut = jnp.asarray(simplex_tables.rank_fold_lut(
        np.asarray(lut).astype(np.int8), fold_geometry("s"), perms))
    vals = np.array(list(itertools.product([16, 17, 18], repeat=4)))
    img = jnp.asarray(
        np.pad(vals.reshape(81, 2, 2), ((0, 0), (0, 3), (0, 3)), mode="edge"),
        jnp.int32,
    )
    a = np.asarray(rotation_ensemble_lanes_int(
        lut, img, mode="s", upscale=2, interval=4))
    b = np.asarray(rotation_ensemble_lanes_folded_int(
        rflut, img, mode="s", upscale=2, interval=4, rank=True))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("mode", ["y", "h", "o"])
def test_rank_quad_matches_per_rotation(mode, rng):
    lut = jnp.asarray(rng.integers(-127, 128, (17 ** 4, 16)), jnp.int32)
    perms = [lane_rotation_perm(4, r) for r in range(4)]
    rluts = jnp.asarray(simplex_tables.rank_expand_rotations(
        np.asarray(lut).astype(np.int8), perms))
    assert rluts.shape == (4, 17 ** 4 * 24, 5 * 16)
    img = jnp.asarray(rng.integers(0, 256, (2, 8, 10)), jnp.int32)
    a = np.asarray(rotation_ensemble_lanes_int(
        lut, img, mode=mode, upscale=4, interval=4))
    b = np.asarray(rotation_ensemble_lanes_quad_int(
        rluts, img, mode=mode, upscale=4, interval=4, rank=True))
    np.testing.assert_array_equal(a, b)


def test_lehmer_roundtrip():
    """Device Lehmer code == host Lehmer code == chain-table row order."""
    import itertools as it

    from mulut_tpu.ops.simplex import _fraction_ranks, _lehmer_code

    seen = set()
    for ranks in it.permutations(range(4)):
        p = int(simplex_tables.lehmer_of_ranks(*ranks))
        assert 0 <= p < 24
        seen.add(p)
    assert len(seen) == 24
    # device path on exhaustive tie-heavy fractions
    vals = np.array(list(it.product([0, 7, 15], repeat=4)))
    f = [jnp.asarray(vals[:, k]) for k in range(4)]
    ranks = [np.asarray(r) for r in _fraction_ranks(*f)]
    dev = np.asarray(_lehmer_code(*f))
    host = simplex_tables.lehmer_of_ranks(*ranks)
    np.testing.assert_array_equal(dev, host)


@pytest.mark.parametrize("mode,rank", [("s", False), ("s", True),
                                       ("d", False), ("y", False),
                                       ("y", True)])
def test_fused_flat_paths(mode, rank, rng):
    """fused=True (flat contraction + 1-D shifted un-shift / rotation-summed
    einsum) must be bit-identical to the unfused 6-D-slicing path."""
    lut = jnp.asarray(rng.integers(-127, 128, (17 ** 4, 16)), jnp.int32)
    tab = prepare_expanded_luts(
        {f"s1_{mode}": np.asarray(lut, np.int8)}, rank=rank
    )[f"s1_{mode}"]
    img = jnp.asarray(rng.integers(0, 256, (2, 9, 11)), jnp.int32)
    want = np.asarray(rotation_ensemble_lanes_int(
        lut, img, mode=mode, upscale=4, interval=4))
    fn = (rotation_ensemble_lanes_folded_int
          if fold_geometry(mode) is not None
          else rotation_ensemble_lanes_quad_int)
    got = np.asarray(fn(
        tab, img, mode=mode, upscale=4, interval=4, fused=True, rank=rank))
    np.testing.assert_array_equal(want, got)
    unfused = np.asarray(fn(
        tab, img, mode=mode, upscale=4, interval=4, fused=False, rank=rank))
    np.testing.assert_array_equal(want, unfused)
