"""YUV deployment mode (sr/Test.py --yuv).

The fork demo's YUV pipeline (ref: sr/Test.py:317-398) runs the LUT
cascade on the luma plane only and upsamples chroma bicubically — 1/3 of
the cascade work per output frame.  These tests pin its behavioral
contract on a real Set5 image with the shipped fine-tuned LUTs:

  * the luma of the YUV output IS the single-channel cascade output
    (up to the ycbcr<->rgb float round-trip and gamut clipping);
  * quality lands in the expected window — close to, and slightly below,
    the full-RGB cascade (the reference quotes ~0.1-0.5 dB of Y-PSNR
    give-back for bicubic chroma).
"""

import importlib.util
import os

import numpy as np
import pytest

from tests.conftest import REF_MODELS, REF_SET5, require_reference


def _load_test_module():
    path = os.path.join(os.path.dirname(__file__), "..", "sr", "Test.py")
    spec = importlib.util.spec_from_file_location("sr_test_demo", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def evaluator():
    require_reference()
    from mulut_tpu.pipelines.evaluate import LutEvaluator

    return LutEvaluator.from_folder(
        REF_MODELS, stages=2, modes="sdy", scale=4, lut_name="LUT_ft"
    )


@pytest.fixture(scope="module")
def butterfly():
    from mulut_tpu.utils import load_image

    lr = load_image(
        os.path.join(REF_SET5, "LR_bicubic", "X4", "butterfly.png")
    )
    hr = load_image(os.path.join(REF_SET5, "HR", "butterfly.png"))
    # crop for CPU speed; keep the HR window aligned to the LR crop
    lr = lr[:48, :48]
    hr = hr[: 48 * 4, : 48 * 4]
    return lr, hr


def test_yuv_luma_is_the_single_channel_cascade(evaluator, butterfly):
    from mulut_tpu.utils.metrics import rgb2ycbcr

    mod = _load_test_module()
    lr, _ = butterfly
    out = mod.upscale_yuv(evaluator, lr)

    ycc = rgb2ycbcr(lr)
    y_sr = evaluator.upscale(
        np.round(ycc[:, :, 0]).clip(0, 255).astype(np.uint8)
    )
    assert out.shape == (lr.shape[0] * 4, lr.shape[1] * 4, 3)
    y_out = rgb2ycbcr(np.asarray(out, dtype=np.float64))[:, :, 0]
    diff = np.abs(y_out - y_sr.astype(np.float64))
    # exact up to the ycbcr<->rgb float round-trip; gamut-clipped pixels
    # (rgb outside [0,255]) may deviate more
    assert np.median(diff) < 0.75
    assert np.percentile(diff, 95) < 2.0


def test_yuv_quality_tracks_rgb_cascade(evaluator, butterfly):
    from mulut_tpu.utils.metrics import psnr_ssim_y

    mod = _load_test_module()
    lr, hr = butterfly
    sr_yuv = np.asarray(mod.upscale_yuv(evaluator, lr))
    sr_rgb = evaluator.upscale(lr)

    p_yuv, s_yuv = psnr_ssim_y(hr, sr_yuv, 4)
    p_rgb, s_rgb = psnr_ssim_y(hr, sr_rgb, 4)
    # chroma is bicubic, luma is the same cascade: Y-PSNR stays within a
    # narrow window of the RGB path (rgb->ycbcr->cascade->rgb round trip)
    assert p_yuv > 20.0
    assert abs(p_yuv - p_rgb) < 1.0, (p_yuv, p_rgb)
    assert abs(s_yuv - s_rgb) < 0.03, (s_yuv, s_rgb)
