"""VERDICT r3 #8: the distilled-mxu params through steps 2+4 land within
the dense arch's own 4-bit LUT quantization gap.

The LUT-transfer contract is architecture-blind (4 taps -> v lanes), so
caching an mxu unit registry must produce LUT artifacts whose retrieval
quality tracks the net exactly like the dense chain's does.  Uses the
committed distilled artifacts + the reference checkpoint; evaluated on one
real Set5 image (butterfly — the smallest) to keep CI time bounded.  The
full-dataset chip numbers live in PERF.md (experiments/_r4_mxu_lut.py).
"""

import os

import numpy as np
import pytest

from .conftest import REF_SET5, require_reference

ART = os.path.join(os.path.dirname(__file__), "..", "artifacts")
CKPT = "/root/reference/models/sr_x2sdy/Model_200000.pth"


def _butterfly():
    from mulut_tpu.utils import load_image, modcrop

    lr = load_image(os.path.join(REF_SET5, "LR_bicubic/X4/butterfly.png"))
    hr = modcrop(load_image(os.path.join(REF_SET5, "HR/butterfly.png")), 4)
    return lr, hr


def _net_psnr(params, lr, hr):
    import jax
    import jax.numpy as jnp

    from mulut_tpu.models.srnet import srnets_predict
    from mulut_tpu.utils import psnr_ssim_y

    x = jnp.asarray(lr.astype(np.float32).transpose(2, 0, 1)[None] / 255.0)
    out = np.asarray(
        jax.jit(lambda p, v: srnets_predict(p, v, modes="sdy", stages=2,
                                            scale=4, phase="valid"))(params, x)
    )[0].transpose(1, 2, 0)
    sr = np.round(np.clip(out, 0, 255)).astype(np.uint8)
    return psnr_ssim_y(hr, sr, 4)[0]


def _lut_psnr(params, lr, hr):
    from mulut_tpu.pipelines.evaluate import LutEvaluator
    from mulut_tpu.pipelines.transfer import transfer_to_luts
    from mulut_tpu.utils import psnr_ssim_y

    luts = transfer_to_luts(params, modes="sdy", stages=2, interval=4)
    ev = LutEvaluator(luts, stages=2, modes="sdy", scale=4)
    return psnr_ssim_y(hr, ev.upscale(lr), 4)[0]


@pytest.mark.slow
def test_mxu_lut_chain_gap_within_dense_gap():
    require_reference()
    pytest.importorskip("torch")
    art = os.path.join(ART, "mxu_distilled_x4sdy_nf128_d3.npz")
    if not os.path.exists(art):
        pytest.skip("distilled artifacts not present")

    from mulut_tpu.models.torch_import import (
        load_params_npz,
        srnets_params_from_torch,
    )

    lr, hr = _butterfly()
    dense = srnets_params_from_torch(CKPT, modes="sdy", stages=2)
    students = load_params_npz(art)

    dense_net = _net_psnr(dense, lr, hr)
    dense_lut = _lut_psnr(dense, lr, hr)
    mxu_net = _net_psnr(students, lr, hr)
    mxu_lut = _lut_psnr(students, lr, hr)

    dense_gap = dense_net - dense_lut
    mxu_gap = mxu_net - mxu_lut
    # the 4-bit interpolation gap is a property of the LUT engine, not of
    # the cached architecture; allow 0.15 dB of per-image noise headroom
    assert mxu_gap <= dense_gap + 0.15, (
        f"mxu LUT chain gap {mxu_gap:.3f} dB exceeds dense gap "
        f"{dense_gap:.3f} dB (net {mxu_net:.2f} lut {mxu_lut:.2f}; "
        f"dense net {dense_net:.2f} lut {dense_lut:.2f})"
    )
    # and the chain must be in the right quality class at all
    assert mxu_lut > dense_lut - 1.0, (mxu_lut, dense_lut)
