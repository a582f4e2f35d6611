"""Parity of the corner-expanded gather engine vs the 5-gather engine.

The expanded engine (one int8 gather of all 16 hypercube corners + rank
arithmetic, see ops/simplex.py:simplex_planes_expanded_int) must be
bit-identical to the table-driven 5-gather engine, which is itself
bit-identical to the reference NumPy engine (ref: sr/4_test_lut.py:14-237).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mulut_tpu.ops.ensemble import (
    lut_cascade_int,
    prepare_expanded_luts,
    rotation_ensemble_lanes_int,
)
from mulut_tpu.ops.simplex import simplex_planes_expanded_int, simplex_planes_int
from mulut_tpu.ops import simplex_tables


def _random_luts(rng, scale=4, stages=2, modes="sdy"):
    luts = {}
    for s in range(stages):
        v = scale * scale if s + 1 == stages else 1
        for m in modes:
            luts[f"s{s + 1}_{m}"] = jnp.asarray(
                rng.integers(-127, 128, (17 ** 4, v)), jnp.int32
            )
    return luts


@pytest.mark.parametrize("v", [1, 16])
def test_expanded_planes_match_base(v, rng):
    lut = jnp.asarray(rng.integers(-127, 128, (17 ** 4, v)), jnp.int32)
    e = simplex_tables.expand_lut(np.asarray(lut).astype(np.int8))
    elut = jnp.asarray(e.reshape(17 ** 4, -1))
    planes = [jnp.asarray(rng.integers(0, 256, (3, 7, 9)), jnp.int32)
              for _ in range(4)]
    a = np.asarray(simplex_planes_int(lut, planes))
    b = np.asarray(simplex_planes_expanded_int(elut, planes, v=v))
    np.testing.assert_array_equal(a, b)


def test_expanded_planes_tie_patterns(rng):
    """Exhaustive tie coverage: 3-level pixel values hit every rank order."""
    lut = jnp.asarray(rng.integers(-127, 128, (17 ** 4, 1)), jnp.int32)
    e = simplex_tables.expand_lut(np.asarray(lut).astype(np.int8))
    elut = jnp.asarray(e.reshape(17 ** 4, 16))
    import itertools

    vals = np.array(list(itertools.product([16, 17, 18], repeat=4)))  # (81, 4)
    planes = [jnp.asarray(vals[:, k].reshape(81, 1, 1), jnp.int32)
              for k in range(4)]
    a = np.asarray(simplex_planes_int(lut, planes))
    b = np.asarray(simplex_planes_expanded_int(elut, planes, v=1))
    np.testing.assert_array_equal(a, b)


def test_expanded_cascade_matches_base(rng):
    luts = _random_luts(rng)
    eluts = prepare_expanded_luts(luts)
    img = jnp.asarray(rng.integers(0, 256, (2, 13, 11)), jnp.int32)
    a = np.asarray(lut_cascade_int(luts, img, stages=2, modes="sdy", scale=4))
    b = np.asarray(lut_cascade_int(eluts, img, stages=2, modes="sdy", scale=4,
                                   expanded=True))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("mode", ["s", "d", "y", "e", "h", "o"])
def test_expanded_rotation_ensemble(mode, rng):
    lut = jnp.asarray(rng.integers(-127, 128, (17 ** 4, 16)), jnp.int32)
    # rank=False: this test pins the 16-corner per-rotation format, which
    # rotation_ensemble_lanes_int consumes directly (the rank-expanded
    # format goes through the folded/quad wrappers — test_folded_engine).
    eluts = prepare_expanded_luts({"k": lut}, rank=False)
    img = jnp.asarray(rng.integers(0, 256, (1, 8, 9)), jnp.int32)
    a = np.asarray(rotation_ensemble_lanes_int(
        lut, img, mode=mode, upscale=4, interval=4))
    b = np.asarray(rotation_ensemble_lanes_int(
        eluts["k"], img, mode=mode, upscale=4, interval=4, expanded=True))
    np.testing.assert_array_equal(a, b)
