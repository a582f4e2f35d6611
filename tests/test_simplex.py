"""Unit tests for the branchless 4-D simplex interpolation core."""

import jax.numpy as jnp
import numpy as np
import pytest

from mulut_tpu.ops import (
    mode_pad,
    reference_oracle_int,
    round_half_even_div,
    simplex_interp_diff,
    simplex_interp_int,
)
from mulut_tpu.ops import simplex_tables


def test_tables_cover_all_consistent_codes():
    """Every code reachable from a real total preorder maps to a branch."""
    coeffs = simplex_tables.weight_coeffs()
    rng = np.random.default_rng(1)
    for _ in range(2000):
        f = rng.integers(0, 16, size=4)
        code = simplex_tables.comparison_code(*[np.int64(x) for x in f])
        # weights must be the adjacent differences of the descending sort
        w = coeffs[code] @ np.concatenate([[16], f])
        srt = np.sort(f)[::-1]
        expect = np.array(
            [16 - srt[0], srt[0] - srt[1], srt[1] - srt[2], srt[2] - srt[3], srt[3]]
        )
        np.testing.assert_array_equal(w, expect)
        assert w.sum() == 16 and (w >= 0).all()


@pytest.mark.parametrize("mode", ["s", "d", "y"])
@pytest.mark.parametrize("upscale", [1, 4])
def test_interp_matches_scalar_oracle(mode, upscale, rng):
    L = 17
    lut = rng.integers(-127, 128, size=(L ** 4, upscale * upscale)).astype(np.int32)
    pad = mode_pad(mode)
    img = rng.integers(0, 256, size=(2, 6 + pad, 5 + pad)).astype(np.int32)
    got = np.asarray(
        simplex_interp_int(jnp.asarray(lut), jnp.asarray(img), mode=mode, upscale=upscale)
    )
    want = reference_oracle_int(lut, img, mode=mode, upscale=upscale)
    np.testing.assert_array_equal(got, want)


def test_interp_extreme_values():
    """Pixel value 255 indexes MSB bin 16 (the 17th bin) without overflow."""
    L = 17
    lut = np.arange(L ** 4, dtype=np.int32).reshape(-1, 1) % 255 - 127
    img = np.full((1, 4, 4), 255, dtype=np.int32)
    got = np.asarray(simplex_interp_int(jnp.asarray(lut), jnp.asarray(img), mode="s", upscale=1))
    want = reference_oracle_int(lut, img, mode="s", upscale=1)
    np.testing.assert_array_equal(got, want)
    # all-zeros image
    img0 = np.zeros((1, 4, 4), dtype=np.int32)
    got0 = np.asarray(simplex_interp_int(jnp.asarray(lut), jnp.asarray(img0), mode="s", upscale=1))
    want0 = reference_oracle_int(lut, img0, mode="s", upscale=1)
    np.testing.assert_array_equal(got0, want0)


def test_round_half_even_div():
    n = jnp.asarray([0, 8, 24, 40, 17, 15, 48])
    got = np.asarray(round_half_even_div(n, 16))
    # n/16 = 0, .5, 1.5, 2.5, 1.0625, .9375, 3 -> half-even: 0, 0, 2, 2, 1, 1, 3
    np.testing.assert_array_equal(got, [0, 0, 2, 2, 1, 1, 3])


def test_diff_path_matches_int_path_forward(rng):
    """The differentiable path (weight in [-1,1]) forward-matches the int path."""
    L = 17
    lut_i8 = rng.integers(-127, 128, size=(L ** 4, 1)).astype(np.int32)
    weight = jnp.asarray(lut_i8.astype(np.float32) / 127.0)
    img = rng.integers(0, 256, size=(1, 7, 7)).astype(np.int32)
    out_f = np.asarray(
        simplex_interp_diff(weight, jnp.asarray(img, dtype=jnp.float32), mode="s", upscale=1)
    )
    out_i = np.asarray(
        simplex_interp_int(jnp.asarray(lut_i8), jnp.asarray(img), mode="s", upscale=1)
    )
    np.testing.assert_allclose(out_f, out_i / 16.0, rtol=0, atol=1e-4)


def test_diff_path_gradient_flows_to_lut(rng):
    import jax

    L = 17
    weight = jnp.asarray(rng.normal(size=(L ** 4, 1)).astype(np.float32) * 0.5)
    img = jnp.asarray(rng.integers(0, 256, size=(1, 7, 7)).astype(np.float32))

    def loss(w):
        out = simplex_interp_diff(w, img, mode="s", upscale=1)
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(weight)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_expand_weight_custom_vjp_matches_autodiff(rng):
    """The shift-transpose backward of expand_weight == the gather's
    autodiff scatter.  Integer cotangents make both sums exact, so the
    comparison is bitwise."""
    import jax

    from mulut_tpu.ops import simplex_tables
    from mulut_tpu.ops.simplex import expand_weight

    L = 17
    v = 4
    w = jnp.asarray(rng.integers(-127, 128, (L ** 4, v)).astype(np.float32))
    cot = jnp.asarray(rng.integers(-8, 9, (L ** 4, 16 * v)).astype(np.float32))

    def f_custom(w):
        return jnp.sum(expand_weight(w, interval=4) * cot)

    idx = jnp.asarray(simplex_tables.expand_indices(4))

    def f_auto(w):
        return jnp.sum(jnp.take(w, idx, axis=0).reshape(L ** 4, -1) * cot)

    gc = np.asarray(jax.grad(f_custom)(w))
    ga = np.asarray(jax.grad(f_auto)(w))
    np.testing.assert_array_equal(gc, ga)
