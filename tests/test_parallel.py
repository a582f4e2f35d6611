"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Data-parallel training (params replicated / batch sharded, grad psum over
the mesh — the reference's DataParallel equivalent, ref:
sr/1_train_model.py:141-142) and row-sharded LUT retrieval with XLA halo
exchange (`parallel/spatial.py`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mulut_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from mulut_tpu.parallel.spatial import cascade_row_sharded
from mulut_tpu.ops.ensemble import lut_cascade_int


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_dp_train_step_matches_single_device(mesh):
    from mulut_tpu.models.srnet import init_srnets
    from mulut_tpu.pipelines.train import make_optimizer, make_train_step

    params = init_srnets(jax.random.PRNGKey(0), nf=4, scale=2, modes="s",
                         stages=1)
    optimizer = make_optimizer(1e-3, 1e-4, 10)
    step = make_train_step(optimizer, modes="s", stages=1, scale=2)

    rng = np.random.default_rng(0)
    im = rng.random((8, 1, 6, 6), dtype=np.float32)
    lb = rng.random((8, 1, 12, 12), dtype=np.float32)

    # single device
    p1, s1, loss1 = step(params, optimizer.init(params),
                         jnp.asarray(im), jnp.asarray(lb))

    # sharded over the mesh
    pr = replicate_tree(mesh, params)
    sr = replicate_tree(mesh, optimizer.init(params))
    im_s, lb_s = shard_batch(mesh, im, lb)
    p8, s8, loss8 = step(pr, sr, im_s, lb_s)

    assert np.allclose(float(loss1), float(loss8), atol=1e-6)
    for k in p1:
        for name in p1[k]:
            np.testing.assert_allclose(
                np.asarray(p1[k][name]), np.asarray(p8[k][name]), atol=1e-6
            )


def test_dp_finetune_step_matches_single_device(mesh):
    """Mesh-sharded LUT fine-tune step == single-device step (VERDICT r2
    weak #7; the reference wraps fine-tuning in DataParallel too,
    ref: sr/3_finetune_lut.py:156-157)."""
    from mulut_tpu.pipelines.finetune import make_finetune_step
    from mulut_tpu.pipelines.train import make_optimizer

    rng = np.random.default_rng(1)
    weights = {
        "s1_s": jnp.asarray(
            rng.standard_normal((17 ** 4, 4)).astype(np.float32) * 0.3
        )
    }
    optimizer = make_optimizer(1e-3, 1e-4, 10)
    step = make_finetune_step(optimizer, modes="s", stages=1, upscale=2,
                              interval=4)

    im = rng.integers(0, 256, (8, 1, 6, 6)).astype(np.float32)
    lb = rng.integers(0, 256, (8, 1, 12, 12)).astype(np.float32)

    w1, s1, loss1 = step(weights, optimizer.init(weights),
                         jnp.asarray(im), jnp.asarray(lb))

    wr = replicate_tree(mesh, weights)
    sr = replicate_tree(mesh, optimizer.init(weights))
    im_s, lb_s = shard_batch(mesh, im, lb)
    w8, s8, loss8 = step(wr, sr, im_s, lb_s)

    assert np.allclose(float(loss1), float(loss8), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(w1["s1_s"]), np.asarray(w8["s1_s"]), atol=1e-6
    )


def test_row_sharded_cascade_bit_exact(mesh, rng):
    luts = {}
    for s, v in ((1, 1), (2, 4)):
        for m in "sdy":
            luts[f"s{s}_{m}"] = jnp.asarray(
                rng.integers(-127, 128, (17 ** 4, v)), jnp.int32
            )
    img = rng.integers(0, 256, (3, 16, 10))
    want = np.asarray(lut_cascade_int(
        luts, jnp.asarray(img, jnp.int32), stages=2, modes="sdy", scale=2,
    ))
    got = np.asarray(cascade_row_sharded(
        mesh, luts, jnp.asarray(img, jnp.int32), stages=2, modes="sdy",
        scale=2,
    ))
    np.testing.assert_array_equal(want, got)


def test_row_sharded_cascade_expanded_bit_exact(mesh, rng):
    """Row sharding over the corner-expanded engine (tables as replicated
    jit arguments), bit-exact vs the single-device expanded cascade."""
    from mulut_tpu.ops.ensemble import prepare_expanded_luts

    luts = {}
    for s, v in ((1, 1), (2, 4)):
        for m in "sdy":
            luts[f"s{s}_{m}"] = rng.integers(
                -127, 128, (17 ** 4, v)
            ).astype(np.int8)
    eluts = prepare_expanded_luts(luts)
    img = rng.integers(0, 256, (3, 16, 10))
    want = np.asarray(lut_cascade_int(
        eluts, jnp.asarray(img, jnp.int32), stages=2, modes="sdy", scale=2,
        expanded=True,
    ))
    got = np.asarray(cascade_row_sharded(
        mesh, eluts, jnp.asarray(img, jnp.int32), stages=2, modes="sdy",
        scale=2, expanded=True,
    ))
    np.testing.assert_array_equal(want, got)


def test_net_evaluator_batch_sharded_matches_single_device(mesh):
    """NetEvaluator(n_devices=8): upscale_batch and upscale_yuv_batch
    shard the batch over the mesh via shard_map (no collectives) and
    must equal the single-device outputs byte-for-byte — including a
    batch that does not divide the mesh (padded with replicas)."""
    from mulut_tpu.models.srnet import init_srnets
    from mulut_tpu.pipelines.evaluate import NetEvaluator

    rng = np.random.default_rng(11)
    params = init_srnets(jax.random.PRNGKey(11), nf=8, scale=2, modes="s",
                         stages=2, arch="mxu")
    imgs = rng.integers(0, 256, (5, 12, 14, 3), dtype=np.uint8)  # 5 % 8 != 0
    ev1 = NetEvaluator(params, stages=2, modes="s", scale=2)
    ev8 = NetEvaluator(params, stages=2, modes="s", scale=2, n_devices=8)
    assert ev8.mesh is not None
    out1 = ev1.upscale_batch(imgs)
    out8 = ev8.upscale_batch(imgs)
    assert out8.shape == (5, 24, 28, 3)
    assert np.array_equal(out1, out8)
    y1 = ev1.upscale_yuv_batch(imgs)
    y8 = ev8.upscale_yuv_batch(imgs)
    assert np.array_equal(y1, y8)


def test_net_row_sharded_bit_exact_uneven(mesh):
    """Row-sharded NET-mode forward == unsharded, bitwise, at an uneven
    H split (H=37 over 8 devices -> band 5, last device overlaps) for
    both the f32 path and the Pallas fast path (interpret kernels)."""
    from mulut_tpu.models.srnet import (
        init_srnets,
        srnets_predict,
        srnets_predict_fast,
        stack_srnets_for_fast,
    )
    from mulut_tpu.parallel.spatial import net_row_sharded

    rng = np.random.default_rng(5)
    params = init_srnets(jax.random.PRNGKey(5), nf=16, scale=4,
                         modes="sdy", stages=2, arch="mxu")
    x = jnp.asarray(rng.random((1, 1, 37, 12)).astype(np.float32))

    want = np.asarray(srnets_predict(params, x, modes="sdy", stages=2,
                                     scale=4, phase="valid"))
    got = np.asarray(net_row_sharded(mesh, params, x, modes="sdy",
                                     stages=2, scale=4))
    assert got.shape == want.shape
    assert np.array_equal(got, want)

    stacked = stack_srnets_for_fast(params, modes="sdy", stages=2, scale=4)
    want_f = np.asarray(srnets_predict_fast(
        stacked, x, modes="sdy", stages=2, scale=4, interpret=True))
    got_f = np.asarray(net_row_sharded(
        mesh, params, x, modes="sdy", stages=2, scale=4,
        fast_stacked=stacked, interpret=True))
    assert np.array_equal(got_f, want_f)
