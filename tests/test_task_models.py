"""Denoise/deblock (DNNet) and demosaic (DMNet) model-family tests."""

import jax
import jax.numpy as jnp
import numpy as np

from mulut_tpu.models.blocks import apply_mulut_unit
from mulut_tpu.models.srnet import (
    dmnet_apply,
    dnnet_apply,
    dnnets_predict,
    init_dmnet,
    init_dnnets,
)


def test_dnnets_shapes():
    params = init_dnnets(jax.random.PRNGKey(0), nf=4, modes="sd", stages=2)
    x = jnp.zeros((2, 1, 8, 8), jnp.float32)
    out = dnnets_predict(params, x, modes="sd", stages=2, phase="valid")
    assert out.shape == (2, 1, 8, 8)


def test_dmnet_matches_per_cell_unit(rng):
    """The strided-view demosaic wrapper equals per-2x2-cell evaluation."""
    params = init_dmnet(jax.random.PRNGKey(1), nf=4)
    H = W = 6
    img = rng.random((1, 1, H, W)).astype(np.float32)
    got = np.asarray(dmnet_apply(params, jnp.asarray(img)))
    assert got.shape == (1, 3, H, W)

    for ci in range(H // 2):
        for cj in range(W // 2):
            cell = img[0, 0, 2 * ci : 2 * ci + 2, 2 * cj : 2 * cj + 2]
            taps = np.array([cell[0, 0], cell[0, 1], cell[1, 0], cell[1, 1]])
            o = np.asarray(
                apply_mulut_unit(params, jnp.asarray(taps[None]), dense=False)
            ).reshape(3, 2, 2)
            np.testing.assert_allclose(
                got[0, :, 2 * ci : 2 * ci + 2, 2 * cj : 2 * cj + 2],
                o, atol=2e-6,
            )


def test_dnnet_apply_shape(rng):
    from mulut_tpu.models.blocks import init_mulut_unit
    from mulut_tpu.ops.taps import mode_pad

    unit = init_mulut_unit(jax.random.PRNGKey(2), nf=4, upscale=1)
    pad = mode_pad("y")
    x = jnp.asarray(rng.random((1, 3, 5 + pad, 7 + pad)).astype(np.float32))
    out = dnnet_apply(unit, x, mode="y")
    assert out.shape == (1, 3, 5, 7)
