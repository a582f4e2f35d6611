"""W8A8 quantized deployment of plain (mxu-arch) units — ops/quant.py.

Beyond-parity feature: the v5e MXU runs int8 matmuls at ~2x the bf16
rate; the quantized stage-ensemble kernel targets the MXU-bound nf256
point of the mxu arch (PERF.md).  These tests pin the calibration math
and the interpret-mode kernel's closeness to the f32 forward; chip
throughput lives in PERF.md.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mulut_tpu.models.srnet import (
    init_srnets,
    srnets_predict,
    srnets_predict_fast,
    stack_srnets_for_fast,
)
from mulut_tpu.ops.quant import (
    calibrate_plain_unit,
    quantize_plain_stack,
    quantize_srnets_for_fast,
)


def test_calibration_bounds_activations():
    """Grid-calibrated maxima really bound the activations of random
    off-grid inputs (the unit input domain is exactly [0,1]^4, so the
    margin only has to cover lattice gaps)."""
    from mulut_tpu.models.blocks import init_mulut_unit

    unit = init_mulut_unit(jax.random.PRNGKey(0), nf=16, upscale=4,
                           dense=False, depth=2)
    cal = calibrate_plain_unit(unit, grid_n=17)
    rng = np.random.default_rng(0)
    x = rng.random((4096, 4), dtype=np.float32)
    w1 = np.asarray(unit["w1"])
    a = np.maximum(x @ w1 + np.asarray(unit["b1"]), 0)
    assert (a.max(axis=0) <= cal["head"] * 1.05).all()
    for d, i in enumerate((2, 3)):
        a = np.maximum(a @ np.asarray(unit[f"w{i}"])
                       + np.asarray(unit[f"b{i}"]), 0)
        assert (a.max(axis=0) <= cal["hidden"][d] * 1.05).all()


def test_quantize_rejects_dense_stacks():
    params = init_srnets(jax.random.PRNGKey(1), nf=8, scale=4, modes="s",
                         stages=1)  # dense reference arch
    st = stack_srnets_for_fast(params, modes="s", stages=1, scale=4)
    with pytest.raises(ValueError, match="plain-unit stack"):
        quantize_plain_stack(st[0], params, stage=1, modes="s")


def test_quantized_stack_shapes_and_dtypes():
    params = init_srnets(jax.random.PRNGKey(2), nf=16, scale=4, modes="sdy",
                         stages=2, arch="mxu")
    q = quantize_srnets_for_fast(params, modes="sdy", stages=2, scale=4,
                                 requant="f32")
    assert len(q) == 2
    s2 = q[1]
    assert s2["hwq"].dtype == jnp.int8 and s2["hwq"].shape == (2, 3, 16, 16)
    assert s2["w6q"].dtype == jnp.int8 and s2["w6q"].shape == (3, 16, 64)
    assert s2["hcq"].dtype == jnp.float32
    assert s2["w1"].dtype == jnp.bfloat16
    # weight codes actually span the int8 range (per-column scales)
    assert int(np.abs(np.asarray(s2["hwq"])).max()) == 127
    # integer-requant form: fixed-point constants + sliceless head layout
    qi = quantize_srnets_for_fast(params, modes="sdy", stages=2, scale=4,
                                  requant="int")[1]
    assert qi["w6q"].dtype == jnp.int8 and qi["w6q"].shape == (3, 4, 16, 16)
    assert qi["hmq"].dtype == jnp.int32 and qi["hmq"].shape == (2, 3, 16)
    for k in ("hsq", "hhq", "hbi"):
        assert qi[k].dtype == jnp.int32
    assert "hcq" not in qi


@pytest.mark.parametrize("requant", ["f32", "f32w6", "int"])
def test_w8a8_kernel_tracks_f32_forward(requant):
    """Interpret-mode quantized cascade vs the f32 forward: within a few
    greylevels — comfortably inside the LUT path's 4-bit interpolation
    error (the deployment alternative it competes with)."""
    params = init_srnets(jax.random.PRNGKey(3), nf=16, scale=4, modes="sdy",
                         stages=2, arch="mxu")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 1, 8, 9)).astype(np.float32))
    want = np.asarray(srnets_predict(params, x, modes="sdy", stages=2,
                                     scale=4, phase="valid"))
    q = quantize_srnets_for_fast(params, modes="sdy", stages=2, scale=4,
                                 requant=requant)
    got = np.asarray(srnets_predict_fast(q, x, modes="sdy", stages=2,
                                         scale=4, interpret=True))
    assert got.shape == want.shape
    err = np.abs(got - want)
    assert float(err.mean()) < 2.0
    assert float(np.median(err)) <= 1.0


def test_int_requant_matches_f32_requant_closely():
    """The fixed-point datapath tracks the f32 requant datapath: same
    stack quantized both ways should agree to ~a greylevel (the only
    difference is <=1/(2M) relative multiplier error + bias rounding)."""
    params = init_srnets(jax.random.PRNGKey(5), nf=16, scale=4, modes="sd",
                         stages=1, arch="mxu")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((1, 1, 8, 8)).astype(np.float32))
    a = np.asarray(srnets_predict_fast(
        quantize_srnets_for_fast(params, modes="sd", stages=1, scale=4,
                                 requant="f32w6"),
        x, modes="sd", stages=1, scale=4, interpret=True))
    b = np.asarray(srnets_predict_fast(
        quantize_srnets_for_fast(params, modes="sd", stages=1, scale=4,
                                 requant="int"),
        x, modes="sd", stages=1, scale=4, interpret=True))
    assert float(np.abs(a.astype(np.float32) - b.astype(np.float32)).mean()) <= 1.0


def test_net_evaluator_quant_gating():
    """quant=True off-TPU raises with a pointer to the interpret path."""
    from mulut_tpu.pipelines.evaluate import NetEvaluator

    params = init_srnets(jax.random.PRNGKey(4), nf=16, scale=4, modes="s",
                         stages=1, arch="mxu")
    if jax.default_backend() == "tpu":  # pragma: no cover - CPU CI
        NetEvaluator(params, stages=1, modes="s", scale=4, quant=True)
    else:
        with pytest.raises(ValueError, match="TPU Pallas kernel"):
            NetEvaluator(params, stages=1, modes="s", scale=4, quant=True)
