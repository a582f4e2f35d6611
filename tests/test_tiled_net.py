"""Band-tiled net forward must equal the untiled forward exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from mulut_tpu.models.srnet import (
    init_srnets,
    srnets_predict,
    srnets_predict_tiled,
)


def test_tiled_equals_untiled(rng):
    params = init_srnets(jax.random.PRNGKey(0), nf=4, scale=4, modes="sdy",
                         stages=2)
    # divisible and ragged band counts, including a minimal-height case
    for hw, band in (((24, 10), 8), ((27, 10), 8), ((17, 7), 8)):
        x = jnp.asarray(rng.random((2, 1) + hw).astype(np.float32))
        a = np.asarray(srnets_predict(params, x, modes="sdy", stages=2,
                                      scale=4, phase="valid"))
        b = np.asarray(srnets_predict_tiled(params, x, modes="sdy", stages=2,
                                            scale=4, phase="valid", band=band))
        np.testing.assert_allclose(a, b, atol=1e-4, err_msg=str((hw, band)))


def test_column_tiled_equals_untiled(rng):
    """A short-but-wide image tiles along columns (axis=3) and still matches
    the untiled forward exactly."""
    params = init_srnets(jax.random.PRNGKey(0), nf=4, scale=4, modes="sdy",
                         stages=2)
    x = jnp.asarray(rng.random((1, 1, 10, 41)).astype(np.float32))
    a = np.asarray(srnets_predict(params, x, modes="sdy", stages=2,
                                  scale=4, phase="valid"))
    b = np.asarray(srnets_predict_tiled(params, x, modes="sdy", stages=2,
                                        scale=4, phase="valid", band=8,
                                        axis=3))
    np.testing.assert_allclose(a, b, atol=1e-4)
