"""The MXU-shaped (plain-MLP) unit variant — `init_srnets(arch="mxu")`.

Beyond-parity feature: PERF.md's unit accounting shows the reference
dense-concat shapes (K<=320, N=64, 6 dependent matmuls/pass) cap the
net-mode Pallas kernel at 31% theoretical / 16.5% measured MFU; the mxu
variant (plain nf-wide MLP, depth 2, nf=128 in deployment) raises the
theoretical cap to ~71% at similar parameter count.  The LUT-transfer
contract is unchanged — 4 taps in, upscale**2 lanes out — so steps 2-4
(cache, finetune, retrieval) are architecture-blind.

These tests run the Pallas kernel in interpret mode on CPU; chip numbers
live in PERF.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mulut_tpu.models.blocks import (
    apply_mulut_unit,
    init_mulut_unit,
    unit_layout,
)
from mulut_tpu.models.srnet import (
    init_srnets,
    srnets_predict,
    srnets_predict_fast,
    stack_srnets_for_fast,
)
from mulut_tpu.pipelines.transfer import transfer_to_luts


@pytest.fixture(autouse=True)
def _restore_kernel_flags():
    """Module-level kernel flags (PLAIN_LAYOUT / PLAIN_SCHEDULE) are not
    jit keys; an assert failure mid-test must not leak a mutated flag
    into later tests (r4 advisor finding)."""
    import mulut_tpu.models.srnet as sn
    import mulut_tpu.ops.unit_kernel as uk

    saved = (sn.PLAIN_LAYOUT, sn.DENSE_LAYOUT, sn.PLAIN_WINDOW,
             uk.PLAIN_SCHEDULE, uk.PLAIN_T_SCHEDULE)
    yield
    (sn.PLAIN_LAYOUT, sn.DENSE_LAYOUT, sn.PLAIN_WINDOW,
     uk.PLAIN_SCHEDULE, uk.PLAIN_T_SCHEDULE) = saved
    uk.stage_ensemble_apply.clear_cache()
    uk.stage_ensemble_apply_t.clear_cache()
    uk.stage_ensemble_apply_w.clear_cache()


def test_unit_layout_inference():
    k = jax.random.PRNGKey(0)
    dense = init_mulut_unit(k, nf=8, upscale=4)
    assert unit_layout(dense) == (True, [2, 3, 4, 5])
    plain4 = init_mulut_unit(k, nf=8, upscale=2, out_c=3, dense=False)
    assert unit_layout(plain4) == (False, [2, 3, 4, 5])
    mxu = init_mulut_unit(k, nf=16, upscale=4, dense=False, depth=2)
    assert unit_layout(mxu) == (False, [2, 3])
    assert mxu["w2"].shape == (16, 16)
    assert mxu["w6"].shape == (16, 16)
    with pytest.raises(AssertionError):
        init_mulut_unit(k, nf=8, dense=True, depth=2)


def test_apply_infers_arch():
    """apply_mulut_unit with no `dense` kwarg == the explicit calls."""
    k = jax.random.PRNGKey(1)
    x = jnp.asarray(np.random.default_rng(0).random((32, 4)), jnp.float32)
    dense = init_mulut_unit(k, nf=8, upscale=1)
    np.testing.assert_array_equal(
        apply_mulut_unit(dense, x), apply_mulut_unit(dense, x, dense=True))
    plain = init_mulut_unit(k, nf=8, upscale=1, dense=False)
    np.testing.assert_array_equal(
        apply_mulut_unit(plain, x), apply_mulut_unit(plain, x, dense=False))


def test_mxu_registry_shapes_and_forward():
    params = init_srnets(jax.random.PRNGKey(2), nf=16, scale=4, modes="sdy",
                         stages=2, arch="mxu")
    assert set(params) == {f"s{s}_{m}" for s in (1, 2) for m in "sdy"}
    assert unit_layout(params["s1_s"]) == (False, [2, 3])
    assert params["s2_y"]["w6"].shape == (16, 16)
    x = jnp.asarray(np.random.default_rng(1).random((2, 1, 6, 7)),
                    jnp.float32)
    out = srnets_predict(params, x, modes="sdy", stages=2, scale=4,
                         phase="valid")
    assert out.shape == (2, 1, 24, 28)
    assert np.isfinite(np.asarray(out)).all()


def test_mxu_fast_kernel_matches_f32():
    """Plain-MLP stage-ensemble Pallas kernel vs the f32 forward."""
    rng = np.random.default_rng(3)
    params = init_srnets(jax.random.PRNGKey(3), nf=16, scale=4, modes="sdy",
                         stages=2, arch="mxu")
    stacked = stack_srnets_for_fast(params, modes="sdy", stages=2, scale=4)
    assert stacked[0]["hw"].shape == (2, 3, 16, 16)
    x = jnp.asarray(rng.random((1, 1, 6, 7)).astype(np.float32))
    want = np.asarray(srnets_predict(params, x, modes="sdy", stages=2,
                                     scale=4, phase="valid"))
    got = np.asarray(srnets_predict_fast(stacked, x, modes="sdy", stages=2,
                                         scale=4, interpret=True))
    assert got.shape == want.shape
    # bf16 params + activations: small quantization differences only
    assert float(np.abs(got - want).mean()) < 2.0
    assert float(np.median(np.abs(got - want))) <= 1.0


def test_mxu_interleaved_kernel_bit_matches_pass_major():
    """Layer-major plain kernel == pass-major plain kernel, bitwise.

    Same matmuls, same accumulation order of integer-valued f32 rounds;
    only the schedule differs."""
    import mulut_tpu.ops.unit_kernel as uk

    rng = np.random.default_rng(7)
    params = init_srnets(jax.random.PRNGKey(7), nf=16, scale=4, modes="sdy",
                         stages=2, arch="mxu")
    stacked = stack_srnets_for_fast(params, modes="sdy", stages=2, scale=4)
    x = jnp.asarray(rng.random((1, 1, 5, 6)).astype(np.float32))
    import mulut_tpu.models.srnet as sn

    sn.PLAIN_LAYOUT = "site"  # the schedule variants are site-major kernels
    want = np.asarray(srnets_predict_fast(stacked, x, modes="sdy", stages=2,
                                          scale=4, interpret=True))
    uk.PLAIN_INTERLEAVE = True
    uk.stage_ensemble_apply.clear_cache()  # schedule flag is not a jit key
    try:
        got = np.asarray(srnets_predict_fast(
            stacked, x, modes="sdy", stages=2, scale=4, interpret=True))
    finally:
        uk.PLAIN_INTERLEAVE = False
        uk.stage_ensemble_apply.clear_cache()
        sn.PLAIN_LAYOUT = "feature"
    assert np.array_equal(got, want)


def test_mxu_rotation_stacked_kernel_bit_matches_pass_major():
    """Rotation-row-stacked plain kernel == pass-major, bitwise.

    The 4 rotations of a mode share hidden weights, so stacking their rows
    into one (4T, nf) matmul per layer changes the MXU dispatch shape but
    not any per-row value, and the (mode, rotation) accumulation order is
    preserved."""
    import mulut_tpu.ops.unit_kernel as uk

    rng = np.random.default_rng(8)
    params = init_srnets(jax.random.PRNGKey(8), nf=16, scale=4, modes="sdy",
                         stages=2, arch="mxu")
    stacked = stack_srnets_for_fast(params, modes="sdy", stages=2, scale=4)
    x = jnp.asarray(rng.random((1, 1, 5, 6)).astype(np.float32))
    import mulut_tpu.models.srnet as sn

    sn.PLAIN_LAYOUT = "site"
    try:
        want = np.asarray(srnets_predict_fast(stacked, x, modes="sdy",
                                              stages=2, scale=4,
                                              interpret=True))
    finally:
        pass
    for sched in ("rs", "rsiv"):
        uk.PLAIN_SCHEDULE = sched
        uk.stage_ensemble_apply.clear_cache()  # flag is not a jit key
        try:
            got = np.asarray(srnets_predict_fast(
                stacked, x, modes="sdy", stages=2, scale=4, interpret=True))
        finally:
            uk.PLAIN_SCHEDULE = "pass"
            uk.stage_ensemble_apply.clear_cache()
        assert np.array_equal(got, want), sched


def test_mxu_inkernel_mix_bit_matches_xla_mix():
    """The in-kernel stage-mix epilogue (mix=("inner"/"final", M)) equals
    the XLA-side mixing it replaced, bitwise."""
    from mulut_tpu.models.srnet import _ensemble_taps
    from mulut_tpu.ops.unit_kernel import stage_ensemble_apply

    rng = np.random.default_rng(10)
    params = init_srnets(jax.random.PRNGKey(10), nf=16, scale=4,
                         modes="sdy", stages=2, arch="mxu")
    stacked = stack_srnets_for_fast(params, modes="sdy", stages=2, scale=4)
    x = jnp.asarray(rng.random((1, 1, 5, 6)).astype(np.float32))
    M, (B, C, H, W) = 3, x.shape

    # reference: raw kernel output + the XLA-side mix ops
    xb = x.astype(jnp.bfloat16)
    acc1 = stage_ensemble_apply(stacked[0], _ensemble_taps(xb, "sdy"),
                                n_modes=M, interpret=True)
    mixed = jnp.clip(jnp.round(acc1[:, 0] / (M * 4) + 127.0), 0, 255)
    x1_want = (mixed.reshape(B, C, H, W) / 255.0).astype(jnp.bfloat16)
    acc2 = stage_ensemble_apply(stacked[1], _ensemble_taps(x1_want, "sdy"),
                                n_modes=M, interpret=True)
    out_want = np.asarray(jnp.round(acc2[:, :16] / M))

    # in-kernel mix epilogues
    x1_got = stage_ensemble_apply(stacked[0], _ensemble_taps(xb, "sdy"),
                                  n_modes=M, interpret=True,
                                  mix=("inner", M))[:, 0]
    x1_got = x1_got.reshape(B, C, H, W)
    assert x1_got.dtype == jnp.bfloat16
    assert np.array_equal(np.asarray(x1_got, np.float32),
                          np.asarray(x1_want, np.float32))
    out_got = np.asarray(stage_ensemble_apply(
        stacked[1], _ensemble_taps(x1_got, "sdy"), n_modes=M,
        interpret=True, mix=("final", M))[:, :16])
    assert np.array_equal(out_got, out_want)


def test_mxu_group_interleaved_kernels_bit_match_pass_major():
    """Group-of-G interleave schedules == pass-major, bitwise (the G live
    chains advance layer-major but accumulate in (mode, rotation) order)."""
    import mulut_tpu.ops.unit_kernel as uk

    rng = np.random.default_rng(9)
    params = init_srnets(jax.random.PRNGKey(9), nf=16, scale=4, modes="sdy",
                         stages=2, arch="mxu")
    stacked = stack_srnets_for_fast(params, modes="sdy", stages=2, scale=4)
    x = jnp.asarray(rng.random((1, 1, 5, 6)).astype(np.float32))
    import mulut_tpu.models.srnet as sn

    sn.PLAIN_LAYOUT = "site"
    want = np.asarray(srnets_predict_fast(stacked, x, modes="sdy", stages=2,
                                          scale=4, interpret=True))
    for sched in ("ivg2", "ivg3", "ivg4", "ivg6"):
        uk.PLAIN_SCHEDULE = sched
        uk.stage_ensemble_apply.clear_cache()  # flag is not a jit key
        try:
            got = np.asarray(srnets_predict_fast(
                stacked, x, modes="sdy", stages=2, scale=4, interpret=True))
        finally:
            uk.PLAIN_SCHEDULE = "pass"
            uk.stage_ensemble_apply.clear_cache()
        assert np.array_equal(got, want), sched
    sn.PLAIN_LAYOUT = "feature"


def test_mxu_paired_stacking_rejected():
    params = init_srnets(jax.random.PRNGKey(4), nf=16, scale=4, modes="s",
                         stages=1, arch="mxu")
    with pytest.raises(ValueError, match="dense-unit stacks"):
        stack_srnets_for_fast(params, modes="s", stages=1, scale=4,
                              paired=True)


def test_mxu_transfers_to_standard_luts():
    """LUT caching is architecture-blind: mxu units emit the exact LUT
    shapes the retrieval engine consumes (ref: sr/2_transfer_to_lut.py)."""
    params = init_srnets(jax.random.PRNGKey(5), nf=16, scale=4, modes="sdy",
                         stages=2, arch="mxu")
    luts = transfer_to_luts(params, modes="sdy", stages=2, interval=4)
    assert luts["s1_s"].shape == (17 ** 4, 1)
    assert luts["s2_y"].shape == (17 ** 4, 16)
    assert luts["s1_d"].dtype == np.int8
    # entries really are round(clip(unit(grid))*127)
    from mulut_tpu.pipelines.transfer import lut_grid

    g = jnp.asarray(lut_grid(4)[:257])
    want = np.round(np.clip(np.asarray(
        apply_mulut_unit(params["s2_y"], g)), -1, 1) * 127).astype(np.int8)
    np.testing.assert_array_equal(luts["s2_y"][:257], want)


def test_mxu_training_step_descends():
    """One Adam step on the mxu cascade reduces the loss (gradients flow
    through the plain-MLP units and the STE rounds)."""
    import optax

    rng = np.random.default_rng(6)
    params = init_srnets(jax.random.PRNGKey(6), nf=16, scale=2, modes="s",
                         stages=2, arch="mxu")
    lr = jnp.asarray(rng.random((4, 1, 8, 8)), jnp.float32)
    hr = jnp.asarray(rng.random((4, 1, 16, 16)), jnp.float32)
    opt = optax.adam(1e-3)
    state = opt.init(params)

    def loss_fn(p):
        pred = srnets_predict(p, lr, modes="s", stages=2, scale=2,
                              phase="train")
        return jnp.mean(jnp.abs(pred - hr))

    l0, grads = jax.value_and_grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)
    for _ in range(5):
        grads = jax.grad(loss_fn)(params)
        updates, state = opt.update(grads, state)
        params = optax.apply_updates(params, updates)
    assert float(loss_fn(params)) < float(l0)


def test_mxu_bf16_train_step_descends_keeps_f32_masters():
    """The mixed-precision train step (--trainPrecision bf16): compute in
    bfloat16, f32 master params/optimizer state, loss still decreases."""
    from mulut_tpu.pipelines.train import make_optimizer, make_train_step

    rng = np.random.default_rng(7)
    params = init_srnets(jax.random.PRNGKey(7), nf=16, scale=2, modes="s",
                         stages=2, arch="mxu")
    optimizer = make_optimizer(1e-3, 1e-4, 100)
    opt_state = optimizer.init(params)
    step = make_train_step(optimizer, modes="s", stages=2, scale=2,
                           precision="bf16")
    im = rng.integers(0, 256, (4, 1, 8, 8), dtype=np.uint8)
    lb = rng.integers(0, 256, (4, 1, 16, 16), dtype=np.uint8)
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, im, lb)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    # master weights stay f32 (the cast lives inside the step)
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float32


def test_mxu_final_pack_bit_matches_final_u8():
    """The u32-packed kernel epilogue (final_clip='pack', feature layout,
    x4) equals the bf16 clip epilogue byte-for-byte after unpacking."""
    rng = np.random.default_rng(12)
    params = init_srnets(jax.random.PRNGKey(12), nf=16, scale=4,
                         modes="sdy", stages=2, arch="mxu")
    stacked = stack_srnets_for_fast(params, modes="sdy", stages=2, scale=4)
    x = jnp.asarray(rng.random((1, 1, 5, 6)).astype(np.float32))
    ref = np.asarray(srnets_predict_fast(
        stacked, x, modes="sdy", stages=2, scale=4, interpret=True,
        final_clip=True)).astype(np.float32)
    got = np.asarray(srnets_predict_fast(
        stacked, x, modes="sdy", stages=2, scale=4, interpret=True,
        final_clip="pack"))
    assert got.dtype == np.uint8
    assert np.array_equal(got.astype(np.float32), ref)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="exercises Mosaic's ragged last-block masking "
                           "on real TPU (interpret mode keeps the pad)")
def test_mxu_ragged_last_block_matches_padded_on_tpu():
    """The no-pad ragged path (N not a tile multiple, device Mosaic
    masking) must equal the explicitly padded form — CI runs interpret
    mode only, so a Pallas/Mosaic behavior change would otherwise first
    surface as a bench-time checksum mismatch (r4 advisor finding)."""
    import mulut_tpu.ops.unit_kernel as uk
    from mulut_tpu.models.srnet import _ensemble_taps, _ensemble_taps_t
    from mulut_tpu.ops.unit_kernel import (
        stage_ensemble_apply,
        stage_ensemble_apply_t,
        transpose_plain_stack,
    )

    rng = np.random.default_rng(13)
    params = init_srnets(jax.random.PRNGKey(13), nf=16, scale=4,
                         modes="sdy", stages=1, arch="mxu")
    stacked = stack_srnets_for_fast(params, modes="sdy", stages=1, scale=4)
    # N = 1*1*37*29 = 1073: not a multiple of any tile in use
    x = jnp.asarray(rng.random((1, 1, 37, 29)).astype(np.float32))
    xb = x.astype(jnp.bfloat16)
    n = 37 * 29

    # site-major kernel: ragged (device default) vs explicit pad
    taps = _ensemble_taps(xb, "sdy")
    ragged = np.asarray(stage_ensemble_apply(stacked[0], taps, n_modes=3))
    n_pad = -(-n // uk.ENSEMBLE_TILE) * uk.ENSEMBLE_TILE
    padded = np.asarray(stage_ensemble_apply(
        stacked[0], jnp.pad(taps, [(0, n_pad - n), (0, 0)]),
        n_modes=3))[:n]
    assert np.array_equal(ragged, padded)

    # feature-major (transposed) kernel
    st_t = transpose_plain_stack(stacked[0])
    taps_t = _ensemble_taps_t(xb, "sdy")
    ragged_t = np.asarray(stage_ensemble_apply_t(st_t, taps_t, n_modes=3))
    tile_t = uk.ENSEMBLE_TILE_T if 16 <= 128 else uk.ENSEMBLE_TILE
    np_t = -(-n // tile_t) * tile_t
    padded_t = np.asarray(stage_ensemble_apply_t(
        st_t, jnp.pad(taps_t, [(0, 0), (0, np_t - n)]),
        n_modes=3))[:, :n]
    assert np.array_equal(ragged_t, padded_t)


def test_mxu_transposed_schedules_bit_match_pass_major():
    """Feature-major rs/rsiv kernels == feature-major pass-major, bitwise
    (rotation stacking is a lane-axis concat; accumulation order kept)."""
    import mulut_tpu.models.srnet as sn
    import mulut_tpu.ops.unit_kernel as uk

    rng = np.random.default_rng(14)
    params = init_srnets(jax.random.PRNGKey(14), nf=16, scale=4,
                         modes="sdy", stages=2, arch="mxu")
    stacked = stack_srnets_for_fast(params, modes="sdy", stages=2, scale=4)
    x = jnp.asarray(rng.random((1, 1, 5, 6)).astype(np.float32))
    sn.PLAIN_LAYOUT = "feature"
    want = np.asarray(srnets_predict_fast(stacked, x, modes="sdy",
                                          stages=2, scale=4,
                                          interpret=True))
    for sched in ("rs", "rsiv"):
        uk.PLAIN_T_SCHEDULE = sched
        uk.stage_ensemble_apply_t.clear_cache()  # flag is not a jit key
        try:
            got = np.asarray(srnets_predict_fast(
                stacked, x, modes="sdy", stages=2, scale=4,
                interpret=True))
        finally:
            uk.PLAIN_T_SCHEDULE = "pass"
            uk.stage_ensemble_apply_t.clear_cache()
        assert np.array_equal(got, want), sched
    # and with the final_clip epilogues (the deployment path)
    for clip in (True, "pack"):
        ref = np.asarray(srnets_predict_fast(
            stacked, x, modes="sdy", stages=2, scale=4, interpret=True,
            final_clip=clip))
        uk.PLAIN_T_SCHEDULE = "rs"
        uk.stage_ensemble_apply_t.clear_cache()
        try:
            got = np.asarray(srnets_predict_fast(
                stacked, x, modes="sdy", stages=2, scale=4,
                interpret=True, final_clip=clip))
        finally:
            uk.PLAIN_T_SCHEDULE = "pass"
            uk.stage_ensemble_apply_t.clear_cache()
        assert np.array_equal(got.astype(np.float32),
                              ref.astype(np.float32)), clip


def test_dense_transposed_kernel_bit_matches_site_major():
    """_dense_t_kernel (feature layout) == the site-major dense kernel,
    bitwise: same VPU head, same accumulation order, mix epilogues carry
    the identical op sequence (VERDICT r4 #4)."""
    import mulut_tpu.models.srnet as sn

    rng = np.random.default_rng(15)
    params = init_srnets(jax.random.PRNGKey(15), nf=8, scale=4,
                         modes="sdy", stages=2, arch="dense")
    stacked = stack_srnets_for_fast(params, modes="sdy", stages=2, scale=4)
    x = jnp.asarray(rng.random((1, 1, 5, 6)).astype(np.float32))
    sn.DENSE_LAYOUT = "site"
    want = np.asarray(srnets_predict_fast(stacked, x, modes="sdy",
                                          stages=2, scale=4,
                                          interpret=True))
    sn.DENSE_LAYOUT = "feature"
    try:
        got = np.asarray(srnets_predict_fast(
            stacked, x, modes="sdy", stages=2, scale=4, interpret=True))
    finally:
        sn.DENSE_LAYOUT = "site"
    assert np.array_equal(got, want)


def test_dense_transposed_kernel_paired_and_quant_stay_site():
    """Paired stacks must not route through the transposed dense kernel
    (its weight layout is unpaired)."""
    import mulut_tpu.models.srnet as sn

    rng = np.random.default_rng(16)
    params = init_srnets(jax.random.PRNGKey(16), nf=8, scale=4,
                         modes="s", stages=1, arch="dense")
    stacked = stack_srnets_for_fast(params, modes="s", stages=1, scale=4,
                                    paired=True)
    x = jnp.asarray(rng.random((1, 1, 5, 6)).astype(np.float32))
    want = np.asarray(srnets_predict_fast(stacked, x, modes="s", stages=1,
                                          scale=4, interpret=True))
    sn.DENSE_LAYOUT = "feature"
    try:
        got = np.asarray(srnets_predict_fast(
            stacked, x, modes="s", stages=1, scale=4, interpret=True))
    finally:
        sn.DENSE_LAYOUT = "site"
    assert np.array_equal(got, want)


def test_window_kernel_matches_tap_matrix_path():
    """PLAIN_WINDOW (in-kernel tap extraction over the padded flat
    domain, deduplicated scattered heads) == the tap-matrix feature path
    on CPU interpret, for the plain forward and both final_clip
    epilogues, at a non-tile-multiple N and B > 1."""
    import mulut_tpu.models.srnet as sn
    import mulut_tpu.ops.unit_kernel as uk

    rng = np.random.default_rng(21)
    params = init_srnets(jax.random.PRNGKey(21), nf=16, scale=4,
                         modes="sdy", stages=2, arch="mxu")
    stacked = stack_srnets_for_fast(params, modes="sdy", stages=2, scale=4)
    x = jnp.asarray(rng.random((2, 1, 7, 9)).astype(np.float32))
    cases = [(False, None), (True, None), ("pack", None)]
    for clip, _ in cases:
        want = np.asarray(srnets_predict_fast(
            stacked, x, modes="sdy", stages=2, scale=4, interpret=True,
            final_clip=clip)).astype(np.float32)
        sn.PLAIN_WINDOW = True
        uk.stage_ensemble_apply_w.clear_cache()
        try:
            got = np.asarray(srnets_predict_fast(
                stacked, x, modes="sdy", stages=2, scale=4,
                interpret=True, final_clip=clip)).astype(np.float32)
        finally:
            sn.PLAIN_WINDOW = False
            uk.stage_ensemble_apply_w.clear_cache()
        assert np.array_equal(got, want), clip
    # window kernel composes with the rs schedule
    want = np.asarray(srnets_predict_fast(
        stacked, x, modes="sdy", stages=2, scale=4, interpret=True))
    sn.PLAIN_WINDOW = True
    uk.PLAIN_T_SCHEDULE = "rs"
    uk.stage_ensemble_apply_w.clear_cache()
    try:
        got = np.asarray(srnets_predict_fast(
            stacked, x, modes="sdy", stages=2, scale=4, interpret=True))
    finally:
        sn.PLAIN_WINDOW = False
        uk.PLAIN_T_SCHEDULE = "pass"
        uk.stage_ensemble_apply_w.clear_cache()
    assert np.array_equal(got, want)


def test_dense_window_kernel_bit_matches_site_major():
    """The dense WINDOW kernel (in-kernel tap extraction, VPU head from
    deduplicated R rows) == the site-major dense kernel, bitwise, under
    both rs and pass schedules."""
    import mulut_tpu.models.srnet as sn
    import mulut_tpu.ops.unit_kernel as uk

    rng = np.random.default_rng(32)
    params = init_srnets(jax.random.PRNGKey(32), nf=8, scale=4,
                         modes="sdy", stages=2, arch="dense")
    stacked = stack_srnets_for_fast(params, modes="sdy", stages=2, scale=4)
    x = jnp.asarray(rng.random((2, 1, 7, 9)).astype(np.float32))
    sn.DENSE_LAYOUT = "site"
    want = np.asarray(srnets_predict_fast(stacked, x, modes="sdy",
                                          stages=2, scale=4,
                                          interpret=True))
    sn.DENSE_LAYOUT = "feature"
    sn.PLAIN_WINDOW = True
    for sched in ("rs", "pass"):
        uk.PLAIN_T_SCHEDULE = sched
        uk.stage_ensemble_apply_w.clear_cache()
        got = np.asarray(srnets_predict_fast(
            stacked, x, modes="sdy", stages=2, scale=4, interpret=True))
        assert np.array_equal(got, want), sched


def test_window_kernel_scale2_matches_tap_matrix():
    """Window path at scale 2 (non-pack epilogues, upscale**2 = 4 of 16
    lanes) == tap-matrix path."""
    import mulut_tpu.models.srnet as sn

    rng = np.random.default_rng(33)
    params = init_srnets(jax.random.PRNGKey(33), nf=16, scale=2,
                         modes="sdy", stages=2, arch="mxu")
    stacked = stack_srnets_for_fast(params, modes="sdy", stages=2, scale=2)
    x = jnp.asarray(rng.random((1, 1, 7, 9)).astype(np.float32))
    sn.PLAIN_WINDOW = False
    want = np.asarray(srnets_predict_fast(stacked, x, modes="sdy",
                                          stages=2, scale=2,
                                          interpret=True))
    sn.PLAIN_WINDOW = True
    got = np.asarray(srnets_predict_fast(stacked, x, modes="sdy",
                                         stages=2, scale=2,
                                         interpret=True))
    assert np.array_equal(got, want)
