"""Model-layer tests: tap-MLP units, spatial wrapper, torch import parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import REF_MODELS, require_reference

from mulut_tpu.models.blocks import apply_mulut_unit, init_mulut_unit
from mulut_tpu.models.srnet import init_srnets, srnet_apply, srnets_predict

REF_CKPT = f"{REF_MODELS}/Model_200000.pth"


def test_param_count_matches_reference():
    """SRNets(nf=64, scale=4, sdy, 2 stages) has 265,587 parameters."""
    params = init_srnets(jax.random.PRNGKey(0), nf=64, scale=4, modes="sdy", stages=2)
    n = sum(int(np.prod(a.shape)) for unit in params.values() for a in unit.values())
    assert n == 265_587


def test_unit_output_range_and_shape(rng):
    params = init_mulut_unit(jax.random.PRNGKey(1), nf=64, upscale=4)
    x = jnp.asarray(rng.random((32, 4)).astype(np.float32))
    out = np.asarray(apply_mulut_unit(params, x))
    assert out.shape == (32, 16)
    assert (np.abs(out) <= 1.0).all()


@pytest.mark.parametrize("mode,upscale", [("s", 4), ("d", 1), ("y", 1)])
def test_srnet_apply_equals_per_site_unit(mode, upscale, rng):
    """The shifted-view spatial wrapper equals per-site unit evaluation."""
    from mulut_tpu.ops.taps import mode_pad, mode_taps

    params = init_mulut_unit(jax.random.PRNGKey(2), nf=8, upscale=upscale)
    pad = mode_pad(mode)
    h, w = 5, 6
    img = rng.random((1, 2, h + pad, w + pad)).astype(np.float32)
    got = np.asarray(srnet_apply(params, jnp.asarray(img), mode=mode, upscale=upscale))
    want = np.zeros((1, 2, h * upscale, w * upscale), np.float32)
    for ch in range(2):
        for i in range(h):
            for j in range(w):
                taps = np.array(
                    [img[0, ch, i + dy, j + dx] for dy, dx in mode_taps(mode)]
                )
                o = np.asarray(
                    apply_mulut_unit(params, jnp.asarray(taps[None]))
                ).reshape(upscale, upscale)
                want[0, ch, i * upscale:(i + 1) * upscale,
                     j * upscale:(j + 1) * upscale] = o
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_srnets_predict_shapes():
    params = init_srnets(jax.random.PRNGKey(3), nf=8, scale=4, modes="sdy", stages=2)
    x = jnp.zeros((2, 1, 12, 10), jnp.float32)
    out_t = srnets_predict(params, x, modes="sdy", stages=2, scale=4, phase="train")
    out_v = srnets_predict(params, x, modes="sdy", stages=2, scale=4, phase="valid")
    assert out_t.shape == (2, 1, 48, 40)
    # train output ~[0,1]; valid output in [0,255]
    assert float(jnp.max(jnp.abs(out_v))) <= 255.0 + 1e-3


def test_torch_import_matches_torch_conv_math(rng):
    """Converted reference weights reproduce the torch conv stack exactly."""
    require_reference()
    torch = pytest.importorskip("torch")
    import torch.nn.functional as TF

    from mulut_tpu.models.torch_import import (
        load_torch_state_dict,
        srnets_params_from_torch,
    )

    state = load_torch_state_dict(REF_CKPT)
    params = srnets_params_from_torch(REF_CKPT)
    vals = rng.random((16, 1, 2, 2)).astype(np.float32)

    # independent torch-side evaluation of the s2_s unit
    x = TF.relu(
        TF.conv2d(
            torch.tensor(vals),
            torch.tensor(state["s2_s.model.conv1.conv.weight"]),
            torch.tensor(state["s2_s.model.conv1.conv.bias"]),
        )
    )
    for i in range(2, 6):
        w = torch.tensor(state[f"s2_s.model.conv{i}.conv1.conv.weight"])
        b = torch.tensor(state[f"s2_s.model.conv{i}.conv1.conv.bias"])
        x = torch.cat([x, TF.relu(TF.conv2d(x, w, b))], 1)
    t_out = torch.tanh(
        TF.conv2d(
            x,
            torch.tensor(state["s2_s.model.conv6.conv.weight"]),
            torch.tensor(state["s2_s.model.conv6.conv.bias"]),
        )
    ).numpy().reshape(16, -1)

    j_out = np.asarray(apply_mulut_unit(params["s2_s"], jnp.asarray(vals.reshape(16, 4))))
    np.testing.assert_allclose(t_out, j_out, atol=5e-5)


def test_mulut_c_unit_matches_torch_conv_math(rng):
    """apply_mulut_c_unit vs an independent torch 1x1-conv evaluation of
    the same weights (MuLUTcUnit, ref: common/network.py:108-133)."""
    import torch
    import torch.nn.functional as TF

    from mulut_tpu.models.blocks import apply_mulut_c_unit, init_mulut_c_unit

    params = init_mulut_c_unit(jax.random.PRNGKey(5), nf=8)
    rgb = rng.random((6, 3, 4, 5)).astype(np.float32)  # NCHW torch-side

    def conv1x1(x, w, b):
        # our dense weights are (in, out); torch conv wants (out, in, 1, 1)
        wt = torch.tensor(np.asarray(w).T[:, :, None, None])
        return TF.conv2d(x, wt, torch.tensor(np.asarray(b)))

    x = TF.relu(conv1x1(torch.tensor(rgb), params["w1"], params["b1"]))
    for i in range(2, 6):
        feat = TF.relu(conv1x1(x, params[f"w{i}"], params[f"b{i}"]))
        x = torch.cat([x, feat], 1)
    t_out = torch.tanh(
        conv1x1(x, params["w6"], params["b6"])
    ).numpy().transpose(0, 2, 3, 1)

    j_out = np.asarray(
        apply_mulut_c_unit(params, jnp.asarray(rgb.transpose(0, 2, 3, 1)))
    )
    assert j_out.shape == (6, 4, 5, 3)
    np.testing.assert_allclose(t_out, j_out, atol=5e-5)
