"""ops.resize: bicubic-as-matmul vs PIL's float-path oracle.

The device YUV pipeline's chroma upscale must reproduce PIL's bicubic
sampling convention (centers, Keys a=-0.5, border renormalization) —
verified here against `Image.resize` in float ("F") mode, which removes
PIL's uint8-only fixed-point weights and inter-pass quantization (the
two documented divergences).
"""

import numpy as np
import pytest
from PIL import Image

from mulut_tpu.ops.resize import bicubic_resize_hw, bicubic_upscale


@pytest.mark.parametrize(
    "h,w,s", [(24, 32, 4), (17, 13, 2), (30, 20, 3), (9, 130, 4)]
)
def test_matches_pil_float_path(h, w, s):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (h, w)).astype(np.float32)
    pil = np.asarray(
        Image.fromarray(img, mode="F").resize((w * s, h * s), Image.BICUBIC)
    )
    ours = np.asarray(bicubic_upscale(img, s))
    assert ours.shape == (h * s, w * s)
    np.testing.assert_allclose(ours, pil, atol=2e-3)


def test_leading_dims_and_downscale():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 20, 24)).astype(np.float32)
    out = np.asarray(bicubic_resize_hw(x, 10, 36))
    assert out.shape == (2, 3, 10, 36)
    # per-plane equals the 2-D call (the weight matrices broadcast)
    one = np.asarray(bicubic_resize_hw(x[1, 2], 10, 36))
    np.testing.assert_allclose(out[1, 2], one, rtol=1e-6, atol=1e-5)


def test_identity_when_same_size():
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    np.testing.assert_array_equal(np.asarray(bicubic_resize_hw(x, 3, 4)), x)
