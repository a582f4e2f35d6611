"""x2 configurations (BASELINE.json config 1: single-stage mode=s SR-LUT
path; plus x2 two-stage) — the cascade/transfer machinery is scale-generic,
these pin it.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mulut_tpu.models.srnet import init_srnets, srnets_predict
from mulut_tpu.ops.ensemble import lut_cascade_int, prepare_expanded_luts
from mulut_tpu.pipelines.transfer import transfer_to_luts


def test_x2_single_stage_transfer_and_cascade(rng):
    """Train-net valid forward vs cached-LUT retrieval agree within
    quantization error on an x2 stages=1 modes=s config (the SR-LUT
    baseline path)."""
    params = init_srnets(jax.random.PRNGKey(9), nf=8, scale=2, modes="s",
                         stages=1)
    luts_i8 = transfer_to_luts(params, modes="s", stages=1)
    assert luts_i8["s1_s"].shape == (17 ** 4, 4)

    img = rng.integers(0, 256, (1, 1, 12, 14))
    net = np.asarray(srnets_predict(
        params, jnp.asarray(img / 255.0, jnp.float32), modes="s", stages=1,
        scale=2, phase="valid",
    ))
    luts = {k: jnp.asarray(v.astype(np.int32)) for k, v in luts_i8.items()}
    lut_out = np.asarray(lut_cascade_int(
        luts, jnp.asarray(img, jnp.int32), stages=1, modes="s", scale=2,
    ))
    # LUT path quantizes entries to int8 and interpolates on a 17^4 grid;
    # outputs must track the net closely (identical at grid points).
    assert lut_out.shape == (1, 1, 24, 28)
    diff = np.abs(lut_out - np.clip(np.round(net), 0, 255))
    assert float(np.mean(diff)) < 6.0
    assert float(np.median(diff)) <= 3.0


def test_x2_two_stage_expanded_parity(rng):
    luts = {}
    for s, v in ((1, 1), (2, 4)):
        for m in "sdy":
            luts[f"s{s}_{m}"] = jnp.asarray(
                rng.integers(-127, 128, (17 ** 4, v)), jnp.int32
            )
    eluts = prepare_expanded_luts(luts)
    img = jnp.asarray(rng.integers(0, 256, (2, 9, 8)), jnp.int32)
    a = np.asarray(lut_cascade_int(luts, img, stages=2, modes="sdy", scale=2))
    b = np.asarray(lut_cascade_int(eluts, img, stages=2, modes="sdy", scale=2,
                                   expanded=True))
    assert a.shape == (2, 18, 16)
    np.testing.assert_array_equal(a, b)
