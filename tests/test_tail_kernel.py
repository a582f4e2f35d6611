"""Pallas tail-assembly kernel: bit-parity vs the pure-XLA cascade.

The kernel path (ops.tail_kernel.lut_cascade_packed) fuses the final
stage's rotation un-shifts, exact stage mix, PixelShuffle interleave and
uint8 packing into one VMEM pass (ref behavior: sr/4_test_lut.py:263-306).
These tests run it in interpret mode on CPU against
`ensemble.lut_cascade_int` over the same tables — byte equality, across
image geometries including the small/odd sizes of the Set5 LR inputs.

interval=6 (L=5) keeps the rank-table expansion at milliseconds; the
kernel math is interval-generic (the production gate in
`supports_tail_kernel` restricts to the shipped interval-4 config only
because that is the validated deployment point).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mulut_tpu.ops import tail_kernel as tk
from mulut_tpu.ops.ensemble import lut_cascade_int, prepare_expanded_luts

INTERVAL = 6  # L = 5: tiny tables, fast host-side expansion
SCALE = 4
MODES = "sdy"
STAGES = 2


def _luts(rng):
    L = 2 ** (8 - INTERVAL) + 1
    luts = {}
    for s in range(STAGES):
        v = SCALE * SCALE if s + 1 == STAGES else 1
        for m in MODES:
            luts[f"s{s + 1}_{m}"] = (
                rng.integers(-127, 128, (L ** 4, v), dtype=np.int64)
                .astype(np.int8)
            )
    return luts


@pytest.fixture(scope="module")
def tables():
    rng = np.random.default_rng(7)
    luts = _luts(rng)
    tabs = prepare_expanded_luts(luts, interval=INTERVAL)
    ktabs = prepare_expanded_luts(luts, interval=INTERVAL, shared_quad=True)
    return tabs, ktabs


@pytest.mark.parametrize(
    "lead,h,w",
    [
        ((1,), 20, 40),     # tiny
        ((2,), 13, 57),     # odd h, small odd w (woman.png is 57x86)
        ((1,), 9, 130),     # h with no divisor in 2..8 (R=1), w > 128
        ((2, 3), 16, 48),   # 4-D batch x channel lead (upscale_many shape)
    ],
)
def test_packed_cascade_bit_equal(tables, lead, h, w):
    tabs, ktabs = tables
    rng = np.random.default_rng(11)
    img = jnp.asarray(
        rng.integers(0, 256, lead + (h, w), dtype=np.int64), jnp.int32
    )
    want = np.asarray(
        lut_cascade_int(tabs, img, stages=STAGES, modes=MODES, scale=SCALE,
                        interval=INTERVAL, expanded=True)
    )
    packed = tk.lut_cascade_packed(
        ktabs, img, stages=STAGES, modes=MODES, scale=SCALE,
        interval=INTERVAL, interpret=True
    )
    got = tk.unpack_u32(packed, lead, h, w, SCALE).astype(np.int32)
    assert np.array_equal(got, want)


def test_unpack_u32_device_matches_host(tables):
    """The in-graph unpack (lax.bitcast_convert_type) must enumerate the
    u32 bytes exactly like the host byte view — the device YUV pipeline
    consumes the cascade output through it."""
    _, ktabs = tables
    rng = np.random.default_rng(13)
    lead, h, w = (2, 1), 16, 48
    img = jnp.asarray(
        rng.integers(0, 256, lead + (h, w), dtype=np.int64), jnp.int32
    )
    packed = tk.lut_cascade_packed(
        ktabs, img, stages=STAGES, modes=MODES, scale=SCALE,
        interval=INTERVAL, interpret=True
    )
    host = tk.unpack_u32(packed, lead, h, w, SCALE)
    dev = np.asarray(tk.unpack_u32_device(packed, lead, h, w, SCALE))
    assert dev.dtype == np.uint8
    assert np.array_equal(dev, host)


def test_packed_cascade_valid_hw(tables):
    """Bucketed semantics: pad region re-synced from the valid extent."""
    tabs, ktabs = tables
    rng = np.random.default_rng(13)
    h, w, hv, wv = 16, 48, 11, 37
    base = rng.integers(0, 256, (2, 1, h, w), dtype=np.int64)
    img = jnp.asarray(base, jnp.int32)
    hw = (jnp.asarray([hv, hv], jnp.int32), jnp.asarray([wv, wv], jnp.int32))
    want = np.asarray(
        lut_cascade_int(tabs, img, stages=STAGES, modes=MODES, scale=SCALE,
                        interval=INTERVAL, expanded=True, valid_hw=hw)
    )
    packed = tk.lut_cascade_packed(
        ktabs, img, stages=STAGES, modes=MODES, scale=SCALE,
        interval=INTERVAL, valid_hw=hw, interpret=True
    )
    got = tk.unpack_u32(packed, (2, 1), h, w, SCALE).astype(np.int32)
    assert np.array_equal(got, want)


def test_quad_16corner_format(tables):
    """quad_flat also accepts the 16-corner shared table (7.5x smaller);
    the packed cascade stays bit-identical with it."""
    from mulut_tpu.ops import simplex_tables as stab

    tabs, ktabs = tables
    rng = np.random.default_rng(17)
    # rebuild the y table in 16-corner form from the same int8 LUT
    luts = _luts(np.random.default_rng(7))
    L = 2 ** (8 - INTERVAL) + 1
    k16 = dict(ktabs)
    k16["s2_y"] = stab.expand_lut(luts["s2_y"], INTERVAL).reshape(
        L ** 4, 16 * SCALE * SCALE
    )
    img = jnp.asarray(rng.integers(0, 256, (1, 14, 52), dtype=np.int64),
                      jnp.int32)
    want = np.asarray(
        lut_cascade_int(tabs, img, stages=STAGES, modes=MODES, scale=SCALE,
                        interval=INTERVAL, expanded=True)
    )
    packed = tk.lut_cascade_packed(
        k16, img, stages=STAGES, modes=MODES, scale=SCALE,
        interval=INTERVAL, interpret=True
    )
    got = tk.unpack_u32(packed, (1,), 14, 52, SCALE).astype(np.int32)
    assert np.array_equal(got, want)


def test_corner16_modes_all_quad(tables):
    """prepare_expanded_luts(corner16_modes=...) emits (L**4, 16*v)
    shared tables; the packed cascade routes them through the quad path
    (foldable modes included) and stays bit-identical."""
    tabs, _ = tables
    luts = _luts(np.random.default_rng(7))
    k16 = prepare_expanded_luts(
        luts, interval=INTERVAL, shared_quad=True, corner16_modes=MODES
    )
    L = 2 ** (8 - INTERVAL) + 1
    for m in MODES:
        assert k16[f"s2_{m}"].shape == (L ** 4, 16 * SCALE * SCALE)
    rng = np.random.default_rng(23)
    img = jnp.asarray(rng.integers(0, 256, (2, 12, 44), dtype=np.int64),
                      jnp.int32)
    want = np.asarray(
        lut_cascade_int(tabs, img, stages=STAGES, modes=MODES, scale=SCALE,
                        interval=INTERVAL, expanded=True)
    )
    packed = tk.lut_cascade_packed(
        k16, img, stages=STAGES, modes=MODES, scale=SCALE,
        interval=INTERVAL, interpret=True
    )
    got = tk.unpack_u32(packed, (2,), 12, 44, SCALE).astype(np.int32)
    assert np.array_equal(got, want)


def test_k128_stage1_formats(tables):
    """prepare_expanded_luts(k128_stage1=...) emits (L**4, 128) int8
    inner-stage tables (corner-major 8-lane groups for the group-fold
    kernel); the packed cascade shape-detects them per mode and stays
    bit-identical — including mixed configs (k128 s/d + stock s32 y, the
    shipped default) and composition with the 16-corner stage-2 forms."""
    tabs, _ = tables
    luts = _luts(np.random.default_rng(7))
    L = 2 ** (8 - INTERVAL) + 1
    rng = np.random.default_rng(31)
    img = jnp.asarray(rng.integers(0, 256, (2, 12, 44), dtype=np.int64),
                      jnp.int32)
    want = np.asarray(
        lut_cascade_int(tabs, img, stages=STAGES, modes=MODES, scale=SCALE,
                        interval=INTERVAL, expanded=True)
    )
    for kw in (
        dict(k128_stage1="sdy"),
        dict(k128_stage1="sd", corner16_modes="y", fold16_modes="sd"),
        # the shipped TPU default: + int8 stage-1 y quad table
        dict(k128_stage1="sd", corner16_modes="y", fold16_modes="sd",
             int8_stage1="y"),
    ):
        k1 = prepare_expanded_luts(
            luts, interval=INTERVAL, shared_quad=True, **kw
        )
        for m in kw["k128_stage1"]:
            assert k1[f"s1_{m}"].shape == (L ** 4, 128)
            assert k1[f"s1_{m}"].dtype == np.int8
        for m in kw.get("int8_stage1", ""):
            assert k1[f"s1_{m}"].shape == (L ** 4, 16)
            assert k1[f"s1_{m}"].dtype == np.int8
        packed = tk.lut_cascade_packed(
            k1, img, stages=STAGES, modes=MODES, scale=SCALE,
            interval=INTERVAL, interpret=True
        )
        got = tk.unpack_u32(packed, (2,), 12, 44, SCALE).astype(np.int32)
        assert np.array_equal(got, want)


def test_fold_kernel_xla_fallback_parity(tables, monkeypatch):
    """The group-fold Pallas contraction (default) and its XLA einsum
    fallback (MULUT_FOLD_KERNEL=0) produce byte-identical packed output
    on both table formats (rank-folded/rank-expanded AND 16-corner).

    Every other test in this file already runs the default (kernel)
    path in interpret mode; this one locks the fallback and the
    equivalence between the two lowerings.
    """
    tabs, ktabs = tables
    luts = _luts(np.random.default_rng(7))
    k16 = prepare_expanded_luts(
        luts, interval=INTERVAL, shared_quad=True, corner16_modes="y",
        fold16_modes="sd", k128_stage1="sd",
    )
    rng = np.random.default_rng(29)
    img = jnp.asarray(rng.integers(0, 256, (2, 12, 44), dtype=np.int64),
                      jnp.int32)
    for tables_ in (ktabs, k16):
        packed_kernel = tk.lut_cascade_packed(
            tables_, img, stages=STAGES, modes=MODES, scale=SCALE,
            interval=INTERVAL, interpret=True
        )
        monkeypatch.setenv("MULUT_FOLD_KERNEL", "0")
        packed_xla = tk.lut_cascade_packed(
            tables_, img, stages=STAGES, modes=MODES, scale=SCALE,
            interval=INTERVAL, interpret=True
        )
        monkeypatch.delenv("MULUT_FOLD_KERNEL")
        assert np.array_equal(np.asarray(packed_kernel),
                              np.asarray(packed_xla))
        want = np.asarray(
            lut_cascade_int(tabs, img, stages=STAGES, modes=MODES,
                            scale=SCALE, interval=INTERVAL, expanded=True)
        )
        got = tk.unpack_u32(packed_kernel, (2,), 12, 44,
                            SCALE).astype(np.int32)
        assert np.array_equal(got, want)


def test_supports_gate():
    assert tk.supports_tail_kernel("sdy", 4, interval=4, interpret=True)
    assert not tk.supports_tail_kernel("sdy", 2, interval=4, interpret=True)
    assert not tk.supports_tail_kernel("sdy", 4, interval=3, interpret=True)
