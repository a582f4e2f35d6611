"""interval=3 (L=33, q=8) end-to-end: the engines must be interval-generic
in fact, not just in signature.

The reference has a bit-label inconsistency (writes {interval}bit, reads
{8-interval}bit — ref: sr/2_transfer_to_lut.py:115 vs sr/4_test_lut.py:332)
that makes interval != 4 un-round-trippable there; our IO accepts both
labels, so the whole transfer -> save -> load -> retrieve -> finetune chain
must work at interval=3.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mulut_tpu.models.srnet import init_srnets, srnets_predict
from mulut_tpu.ops.ensemble import lut_cascade_int, prepare_expanded_luts
from mulut_tpu.ops.simplex import (
    reference_oracle_int,
    simplex_planes_expanded_int,
    simplex_planes_int,
)
from mulut_tpu.ops import simplex_tables
from mulut_tpu.ops.taps import mode_pad, mode_taps
from mulut_tpu.pipelines.transfer import transfer_to_luts
from mulut_tpu.utils.lut_io import load_luts, save_lut

INTERVAL = 3
L = 2 ** (8 - INTERVAL) + 1  # 33


def test_interp_matches_scalar_oracle_interval3(rng):
    lut = rng.integers(-127, 128, (L ** 4, 4)).astype(np.int32)
    pad = mode_pad("s")
    img = rng.integers(0, 256, (6 + pad, 7 + pad)).astype(np.int64)

    want = reference_oracle_int(lut, img, mode="s", upscale=2,
                                interval=INTERVAL)

    h, w = 6, 7
    planes = [jnp.asarray(img[dy : dy + h, dx : dx + w], jnp.int32)
              for dy, dx in mode_taps("s")]
    got = np.asarray(simplex_planes_int(jnp.asarray(lut), planes,
                                        interval=INTERVAL))
    got = got.reshape(h, w, 2, 2)
    got = np.moveaxis(got, -2, -3).reshape(h * 2, w * 2)
    np.testing.assert_array_equal(got, want)


def test_expanded_matches_base_interval3(rng):
    lut = jnp.asarray(rng.integers(-127, 128, (L ** 4, 4)), jnp.int32)
    e = simplex_tables.expand_lut(np.asarray(lut).astype(np.int8), INTERVAL)
    elut = jnp.asarray(e.reshape(L ** 4, -1))
    planes = [jnp.asarray(rng.integers(0, 256, (2, 5, 6)), jnp.int32)
              for _ in range(4)]
    a = np.asarray(simplex_planes_int(lut, planes, interval=INTERVAL))
    b = np.asarray(simplex_planes_expanded_int(elut, planes, v=4,
                                               interval=INTERVAL))
    np.testing.assert_array_equal(a, b)


def test_interval3_transfer_roundtrip_and_retrieval(tmp_path, rng):
    """transfer(interval=3) -> save (3bit label) -> load -> cascade; the
    retrieval must track the CNN within quantization error, and the
    corner-expanded engine must match the 5-gather engine bit-for-bit."""
    params = init_srnets(jax.random.PRNGKey(3), nf=8, scale=2, modes="s",
                         stages=1)
    luts_i8 = transfer_to_luts(params, modes="s", stages=1, interval=INTERVAL)
    assert luts_i8["s1_s"].shape == (L ** 4, 4)

    save_lut(str(tmp_path), luts_i8["s1_s"], name="LUT", scale=2,
             interval=INTERVAL, stage=1, mode="s")
    luts = {
        k: jnp.asarray(v)
        for k, v in load_luts(str(tmp_path), stages=1, modes="s", scale=2,
                              interval=INTERVAL, name="LUT").items()
    }

    img = rng.integers(0, 256, (1, 1, 9, 11))
    net = np.asarray(srnets_predict(
        params, jnp.asarray(img / 255.0, jnp.float32), modes="s", stages=1,
        scale=2, phase="valid",
    ))
    out = np.asarray(lut_cascade_int(
        luts, jnp.asarray(img, jnp.int32), stages=1, modes="s", scale=2,
        interval=INTERVAL,
    ))
    assert out.shape == (1, 1, 18, 22)
    diff = np.abs(out - np.clip(np.round(net), 0, 255))
    # interval=3 grid (L=33) is FINER than interval=4 -> at most the same
    # quantization error budget as the x2 interval=4 test
    assert float(np.mean(diff)) < 6.0

    eluts = prepare_expanded_luts(
        {k: np.asarray(v).astype(np.int8) for k, v in luts.items()},
        interval=INTERVAL,
    )
    out_e = np.asarray(lut_cascade_int(
        eluts, jnp.asarray(img, jnp.int32), stages=1, modes="s", scale=2,
        interval=INTERVAL, expanded=True,
    ))
    np.testing.assert_array_equal(out, out_e)


def test_interval3_finetune_step(tmp_path, rng):
    """One STE fine-tune step at interval=3: finite loss, weights move."""
    from mulut_tpu.models.lut_model import init_lut_weights_from_arrays
    from mulut_tpu.pipelines.finetune import make_finetune_step
    from mulut_tpu.pipelines.train import make_optimizer

    luts = {"s1_s": rng.integers(-127, 128, (L ** 4, 4)).astype(np.int8)}
    weights = init_lut_weights_from_arrays(luts, stages=1, modes="s",
                                           upscale=2)
    optimizer = make_optimizer(1e-3, 1e-4, 10)
    state = optimizer.init(weights)
    step = make_finetune_step(optimizer, modes="s", stages=1, upscale=2,
                              interval=INTERVAL)
    im = rng.integers(0, 256, (2, 1, 8, 8), dtype=np.uint8)
    lb = rng.integers(0, 256, (2, 1, 16, 16), dtype=np.uint8)
    new_w, state, loss = step(weights, state, im, lb)
    assert np.isfinite(float(loss))
    assert not np.array_equal(np.asarray(new_w["s1_s"]),
                              np.asarray(weights["s1_s"]))
