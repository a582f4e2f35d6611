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


def test_band_composes_with_bucket(small_luts):
    """band>0 + bucket>0: slabs re-sync the pad region slab-locally —
    bit-identical to per-image exact evaluation, including a mixed batch
    with one image spanning several bands (VERDICT r2 weak #6)."""
    rng = np.random.default_rng(23)
    exact = LutEvaluator(small_luts, stages=2, modes="sdy", scale=4)
    both = LutEvaluator(small_luts, stages=2, modes="sdy", scale=4,
                        bucket=16, band=8)
    sizes = [(13, 18), (37, 9), (16, 32)]  # 37 rows -> multiple slabs
    imgs = [rng.integers(0, 256, hw + (3,)).astype(np.uint8) for hw in sizes]
    outs = both.upscale_many(imgs)
    for img, out, hw in zip(imgs, outs, sizes):
        np.testing.assert_array_equal(exact.upscale(img), out,
                                      err_msg=str(hw))
    # single-image bucketed path composes too
    np.testing.assert_array_equal(
        exact.upscale(imgs[1]), both.upscale(imgs[1])
    )


def test_oversized_image_raises_without_band(small_luts):
    """An image whose bucket exceeds the HBM-safe untiled size must raise
    loudly (not OOM mid-dataset) unless a band is set (ADVICE r2)."""
    rng = np.random.default_rng(29)
    ev = LutEvaluator(small_luts, stages=2, modes="sdy", scale=4,
                      bucket=16, max_batch_pixels=3 * 16 * 16)
    small = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    big = rng.integers(0, 256, (20, 20, 3)).astype(np.uint8)  # bucket 32x32
    with pytest.raises(ValueError, match="evalBand"):
        ev.upscale_many([small, big])
    with pytest.raises(ValueError, match="evalBand"):
        ev.upscale(big)
    # with a band the same image streams fine and stays exact
    banded = LutEvaluator(small_luts, stages=2, modes="sdy", scale=4,
                          bucket=16, band=8, max_batch_pixels=3 * 16 * 16)
    exact = LutEvaluator(small_luts, stages=2, modes="sdy", scale=4)
    np.testing.assert_array_equal(exact.upscale(big), banded.upscale(big))


def test_bucket_group_chunking(small_luts):
    """A bucket group larger than max_batch_pixels splits into several
    dispatches with identical results (ADVICE r2: no unbounded stacking)."""
    rng = np.random.default_rng(31)
    exact = LutEvaluator(small_luts, stages=2, modes="sdy", scale=4)
    # cap allows ~2 images of bucket 16x16x3 per dispatch; 5 share a group
    ev = LutEvaluator(small_luts, stages=2, modes="sdy", scale=4,
                      bucket=16, max_batch_pixels=2 * 3 * 16 * 16)
    imgs = [rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            for h, w in ((13, 11), (16, 16), (9, 12), (15, 10), (8, 16))]
    outs = ev.upscale_many(imgs)
    for img, out in zip(imgs, outs):
        np.testing.assert_array_equal(exact.upscale(img), out)


def test_sharded_bucketed_eval_bit_exact(small_luts):
    """--gpuNum batch sharding of the bucketed eval (tables replicated,
    batch axis split over the mesh, odd batch padded by repeating the last
    image) is bit-identical to single-device evaluation."""
    import jax

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    rng = np.random.default_rng(41)
    exact = LutEvaluator(small_luts, stages=2, modes="sdy", scale=4)
    sharded = LutEvaluator(small_luts, stages=2, modes="sdy", scale=4,
                           bucket=16, n_devices=4)
    assert sharded.mesh is not None
    # 3 images sharing one bucket group -> padded to 4 shards
    sizes = [(13, 18), (16, 32), (9, 25)]
    imgs = [rng.integers(0, 256, hw + (3,)).astype(np.uint8) for hw in sizes]
    outs = sharded.upscale_many(imgs)
    for img, out, hw in zip(imgs, outs, sizes):
        np.testing.assert_array_equal(exact.upscale(img), out,
                                      err_msg=str(hw))


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
