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


def test_device_yuv_matches_host_yuv(evaluator, butterfly):
    """LutEvaluator.upscale_yuv (one fused jit: color transforms, luma
    cascade, matmul-bicubic chroma) tracks the host path (PIL chroma,
    float64 color math) to ~1 greylevel and equal quality."""
    from mulut_tpu.utils.metrics import psnr_ssim_y

    mod = _load_test_module()
    lr, hr = butterfly
    host = np.asarray(mod.upscale_yuv(evaluator, lr), dtype=np.int32)
    dev = evaluator.upscale_yuv(lr).astype(np.int32)

    assert dev.shape == host.shape and dev.dtype == np.int32
    diff = np.abs(dev - host)
    # Measured isolation (see resize.py docstring): given the SAME chroma
    # plane, the fused program reproduces the host math EXACTLY (diff
    # 0.0); every remaining greylevel of divergence is PIL's fixed-point
    # + inter-pass-quantized uint8 resize vs our full-f32 matmul resize,
    # which peaks ~4 greylevels at butterfly's sharp chroma edges.
    assert np.mean(diff) < 1.5, np.mean(diff)
    assert np.percentile(diff, 99) <= 5, np.percentile(diff, 99)

    p_host, s_host = psnr_ssim_y(hr, host.astype(np.uint8), 4)
    p_dev, s_dev = psnr_ssim_y(hr, dev.astype(np.uint8), 4)
    assert abs(p_dev - p_host) < 0.05, (p_dev, p_host)
    assert abs(s_dev - s_host) < 0.005, (s_dev, s_host)


def test_device_yuv_batch_shape_and_determinism(evaluator, butterfly):
    lr, _ = butterfly
    batch = np.stack([lr, lr[::-1, :].copy()])
    out = evaluator.upscale_yuv_batch(batch)
    assert out.shape == (2, lr.shape[0] * 4, lr.shape[1] * 4, 3)
    assert out.dtype == np.uint8
    # image 0 of the batch == the single-image dispatch
    np.testing.assert_array_equal(out[0], evaluator.upscale_yuv(lr))


def test_net_device_yuv(butterfly):
    """NetEvaluator.upscale_yuv: the MXU-path YUV pipeline stays within
    the expected quality window of the LUT-path YUV output."""
    require_reference()
    from mulut_tpu.pipelines.evaluate import NetEvaluator
    from mulut_tpu.utils.metrics import psnr_ssim_y

    lr, hr = butterfly
    ckpt = os.path.join(REF_MODELS, "Model_200000.pth")
    if not os.path.exists(ckpt):
        pytest.skip("reference checkpoint not shipped")
    ev = NetEvaluator.from_checkpoint(ckpt, stages=2, modes="sdy", scale=4)
    out = ev.upscale_yuv(lr)
    assert out.shape == (lr.shape[0] * 4, lr.shape[1] * 4, 3)
    p, s = psnr_ssim_y(hr, out, 4)
    # net quality >= LUT quality on luma; chroma identical (same bicubic)
    p_rgb, _ = psnr_ssim_y(hr, ev.upscale(lr), 4)
    assert p > 20.0
    assert abs(p - p_rgb) < 1.0, (p, p_rgb)
    # batched surface == per-image surface
    batch = ev.upscale_batch(np.stack([lr, lr]))
    assert batch.shape == (2,) + out.shape
    np.testing.assert_array_equal(batch[0], ev.upscale(lr))
