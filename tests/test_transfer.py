"""Step-2 transfer tests: grid enumeration + LUT caching + end-to-end PSNR."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.conftest import REF_MODELS, REF_SET5, require_reference

from mulut_tpu.models.blocks import apply_mulut_unit, init_mulut_unit
from mulut_tpu.pipelines.transfer import cache_lut, lut_grid, transfer_to_luts


def test_grid_geometry():
    grid = lut_grid(4)
    assert grid.shape == (17 ** 4, 4)
    vals = np.unique(np.round(grid * 255).astype(int))
    # sampled pixel levels are 0, 16, ..., 240, 255 (ref: 2_transfer_to_lut.py:13-15)
    np.testing.assert_array_equal(vals, list(range(0, 256, 16)) + [255])
    # lexicographic order: row n = indices (n//L^3, n//L^2 %L, n//L %L, n%L)
    L = 17
    n = 12345
    base = np.array(list(range(0, 256, 16)) + [255], dtype=np.float32)[
        [n // L ** 3, (n // L ** 2) % L, (n // L) % L, n % L]
    ]
    np.testing.assert_allclose(grid[n] * 255.0, base, atol=1e-4)


def test_cache_lut_matches_direct_forward(rng):
    params = init_mulut_unit(jax.random.PRNGKey(5), nf=8, upscale=2)
    lut = cache_lut(params)
    assert lut.shape == (17 ** 4, 4) and lut.dtype == np.int8
    # spot-check 100 random rows against a direct forward
    grid = lut_grid(4)
    idx = rng.integers(0, 17 ** 4, size=100)
    out = np.asarray(apply_mulut_unit(params, jnp.asarray(grid[idx])))
    want = np.round(np.clip(out, -1, 1) * 127).astype(np.int8)
    np.testing.assert_array_equal(lut[idx], want)


def test_reference_ckpt_transfer_psnr(reference_luts):
    """torch ckpt -> transfer -> int cascade reproduces the pre-finetune
    quality (lutft.log iter 1: Set5 30.52 dB)."""
    require_reference()
    import os

    from mulut_tpu.models.torch_import import srnets_params_from_torch
    from mulut_tpu.ops import lut_cascade_int
    from mulut_tpu.utils import load_image, modcrop, psnr_ssim_y

    params = srnets_params_from_torch(f"{REF_MODELS}/Model_200000.pth")
    luts_i8 = transfer_to_luts(params, modes="sdy", stages=2)
    luts = {k: jnp.asarray(v.astype(np.int32)) for k, v in luts_i8.items()}

    @jax.jit
    def run(img):
        return lut_cascade_int(luts, img, stages=2, modes="sdy", scale=4)

    # butterfly only (smallest image) to keep CPU CI fast; its per-image
    # pre-finetune PSNR from the full-run measurement is ~25.70 dB.
    lr = load_image(os.path.join(REF_SET5, "LR_bicubic", "X4", "butterfly.png"))
    gt = modcrop(load_image(os.path.join(REF_SET5, "HR", "butterfly.png")), 4)
    out = np.asarray(run(jnp.asarray(lr.astype(np.int32).transpose(2, 0, 1))))
    p, _ = psnr_ssim_y(gt, out.transpose(1, 2, 0).astype(np.uint8), 4)
    assert p > 25.5  # far above bicubic (~22.1), just below the ft value 25.87
