"""x3 scale coverage: odd upscale factors exercise the 3x3 lane rotation
permutations and interleave."""

import jax.numpy as jnp
import numpy as np

from mulut_tpu.ops.ensemble import lut_cascade_int, prepare_expanded_luts


def test_x3_cascade_and_expanded_parity(rng):
    luts = {}
    for s, v in ((1, 1), (2, 9)):
        for m in "sdy":
            luts[f"s{s}_{m}"] = jnp.asarray(
                rng.integers(-127, 128, (17 ** 4, v)), jnp.int32
            )
    eluts = prepare_expanded_luts(luts)
    img = jnp.asarray(rng.integers(0, 256, (2, 7, 9)), jnp.int32)
    a = np.asarray(lut_cascade_int(luts, img, stages=2, modes="sdy", scale=3))
    b = np.asarray(lut_cascade_int(eluts, img, stages=2, modes="sdy", scale=3,
                                   expanded=True))
    assert a.shape == (2, 21, 27)
    assert a.min() >= 0 and a.max() <= 255
    np.testing.assert_array_equal(a, b)
