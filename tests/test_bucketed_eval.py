"""Bucketed evaluation must be bit-identical to exact-shape evaluation.

The bucketed path pads the image into a static bucket-sized buffer and
clamp-resynchronizes the pad region to valid-edge replicas before every
stage (ops/ensemble.py:clamp_pad_region) — one compiled program serves all
image sizes below the bucket.
"""

import numpy as np
import pytest

from mulut_tpu.pipelines.evaluate import LutEvaluator


@pytest.fixture(scope="module")
def small_luts():
    rng = np.random.default_rng(3)
    luts = {}
    for s, v in ((1, 1), (2, 16)):
        for m in "sdy":
            luts[f"s{s}_{m}"] = rng.integers(-127, 128, (17 ** 4, v)).astype(
                np.int8
            )
    return luts


def test_bucketed_equals_exact(small_luts):
    rng = np.random.default_rng(5)
    exact = LutEvaluator(small_luts, stages=2, modes="sdy", scale=4)
    bucketed = LutEvaluator(small_luts, stages=2, modes="sdy", scale=4,
                            bucket=16)
    # two sizes sharing ONE bucket shape (16, 32) — exercises the jit-cache
    # hit and the clamp-resync with different valid extents
    for hw in ((13, 18), (16, 32)):
        img = rng.integers(0, 256, hw + (3,)).astype(np.uint8)
        np.testing.assert_array_equal(
            exact.upscale(img), bucketed.upscale(img), err_msg=str(hw)
        )


def test_batched_bucketed_equals_exact(small_luts):
    """upscale_many: mixed sizes, per-image valid extents, one dispatch per
    bucket group — must be bit-identical to per-image evaluation."""
    rng = np.random.default_rng(7)
    exact = LutEvaluator(small_luts, stages=2, modes="sdy", scale=4)
    bucketed = LutEvaluator(small_luts, stages=2, modes="sdy", scale=4,
                            bucket=16)
    sizes = [(13, 18), (16, 32), (9, 25), (16, 18), (5, 7)]
    imgs = [rng.integers(0, 256, hw + (3,)).astype(np.uint8) for hw in sizes]
    outs = bucketed.upscale_many(imgs)
    for img, out, hw in zip(imgs, outs, sizes):
        np.testing.assert_array_equal(exact.upscale(img), out,
                                      err_msg=str(hw))


def test_banded_cascade_bit_exact(small_luts):
    """lut_cascade_banded == lut_cascade_int, any size/band (halo crop)."""
    import jax.numpy as jnp

    from mulut_tpu.ops.ensemble import (
        lut_cascade_banded,
        lut_cascade_int,
        prepare_expanded_luts,
    )

    rng = np.random.default_rng(17)
    eluts = prepare_expanded_luts(small_luts)
    for hw in ((30, 12), (16, 9), (33, 7)):
        img = jnp.asarray(rng.integers(0, 256, (2,) + hw), jnp.int32)
        want = np.asarray(lut_cascade_int(
            eluts, img, stages=2, modes="sdy", scale=4, expanded=True))
        got = np.asarray(lut_cascade_banded(
            eluts, img, stages=2, modes="sdy", scale=4, expanded=True,
            band=8))
        np.testing.assert_array_equal(want, got, err_msg=str(hw))


def test_prepare_expanded_cache_roundtrip(small_luts, tmp_path):
    """Disk-cached expansion == fresh expansion, and the second call hits
    the cache (no rebuild)."""
    from mulut_tpu.ops.ensemble import (
        prepare_expanded_luts,
        prepare_expanded_luts_cached,
    )

    sub = {"s1_s": small_luts["s1_s"], "s1_y": small_luts["s1_y"]}
    fresh = prepare_expanded_luts(sub)
    cached1 = prepare_expanded_luts_cached(sub, cache_dir=str(tmp_path))
    files = list(tmp_path.iterdir())
    assert len(files) == 1
    mtime = files[0].stat().st_mtime_ns
    cached2 = prepare_expanded_luts_cached(sub, cache_dir=str(tmp_path))
    assert files[0].stat().st_mtime_ns == mtime  # not rebuilt
    for k in fresh:
        np.testing.assert_array_equal(np.asarray(fresh[k]),
                                      np.asarray(cached1[k]))
        np.testing.assert_array_equal(np.asarray(fresh[k]),
                                      np.asarray(cached2[k]))
