"""R3: record dn/db/dm quality numbers for PERF.md (VERDICT #7).

Mirrors tests/test_task_pipeline.py setups (synthetic structured images —
no real task datasets ship in this environment) and prints the measured
quality deltas for the train -> LUT-transfer -> LUT-deploy pipelines.
"""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from mulut_tpu.pipelines import tasks


def psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255.0 ** 2 / mse)


def blockiness(img):
    x = img.astype(np.float64)
    dh = np.abs(np.diff(x, axis=1))
    dv = np.abs(np.diff(x, axis=0))
    return (dh[:, 7::8].mean() - np.delete(dh, np.s_[7::8], axis=1).mean()) \
        + (dv[7::8, :].mean() - np.delete(dv, np.s_[7::8], axis=0).mean())


# --- denoise (sigma=15, nf=32, sd x 1 stage, 500 iters) ---
rng = np.random.default_rng(11)
yy, xx = np.mgrid[0:24, 0:24].astype(np.float32) / 24


def gen24():
    while True:
        f = rng.uniform(1, 4, size=2)
        ph = rng.uniform(0, 2 * np.pi, size=2)
        img = 127 + 90 * np.sin(2 * np.pi * (f[0] * xx + ph[0])) \
            * np.cos(2 * np.pi * (f[1] * yy + ph[1]))
        yield np.clip(np.stack([img] * 8)[:, None], 0, 255).astype(np.uint8)


nrng = np.random.default_rng(3)
params, losses = tasks.train_dn(
    gen24(), modes="sd", stages=1, nf=32, iters=500,
    degrade=lambda b: tasks.add_gaussian_noise(b, 15.0, nrng),
)
clean = next(gen24())[0, 0]
noisy = tasks.add_gaussian_noise(clean, 15.0, np.random.default_rng(7))
out = tasks.dn_lut_apply(params and tasks.dn_transfer(
    params, modes="sd", stages=1), noisy, modes="sd", stages=1)
print(f"denoise sigma=15: noisy {psnr(noisy, clean):.2f} dB -> "
      f"LUT {psnr(out, clean):.2f} dB "
      f"(gain {psnr(out, clean) - psnr(noisy, clean):+.2f} dB)", flush=True)

# --- deblock (JPEG qf=10, nf=16, sd x 1 stage, 600 iters) ---
rng = np.random.default_rng(13)
yy, xx = np.mgrid[0:32, 0:32].astype(np.float32) / 32


def gen32():
    while True:
        f = rng.uniform(0.5, 2.5, size=2)
        ph = rng.uniform(0, 2 * np.pi, size=2)
        img = 127 + 90 * np.sin(2 * np.pi * (f[0] * xx + ph[0])) \
            * np.cos(2 * np.pi * (f[1] * yy + ph[1]))
        yield np.clip(np.stack([img] * 8)[:, None], 0, 255).astype(np.uint8)


params, losses = tasks.train_dn(
    gen32(), modes="sd", stages=1, nf=16, iters=600,
    degrade=lambda b: np.stack(
        [tasks.jpeg_roundtrip(im[0], 10)[None] for im in b]),
)
luts = tasks.dn_transfer(params, modes="sd", stages=1)
clean = next(gen32())[0, 0]
jpeg = tasks.jpeg_roundtrip(clean, 10)
out = tasks.dn_lut_apply(luts, jpeg, modes="sd", stages=1)
print(f"deblock qf=10: JPEG {psnr(jpeg, clean):.2f} dB -> "
      f"LUT {psnr(out, clean):.2f} dB "
      f"(gain {psnr(out, clean) - psnr(jpeg, clean):+.2f} dB); "
      f"blockiness {blockiness(jpeg):.2f} -> {blockiness(out):.2f}",
      flush=True)

# --- demosaic (RGGB, nf=8, 200 iters) ---
rng = np.random.default_rng(9)
yy, xx = np.mgrid[0:16, 0:16].astype(np.float32) / 16


def gen16():
    while True:
        base = 127 + 80 * np.sin(
            2 * np.pi * (rng.uniform(1, 3) * xx + rng.uniform(1, 3) * yy))
        rgb = np.stack(
            [base, np.roll(base, 2, 0), np.roll(base, 2, 1)], axis=-1)
        yield np.clip(np.stack([rgb] * 4), 0, 255).astype(np.uint8)


params, losses = tasks.train_dm(gen16(), nf=8, iters=200)
lut = tasks.dm_transfer(params)
rgb = next(gen16())[0]
bayer = tasks.bayer_mosaic(rgb)
out = tasks.dm_lut_apply(lut, bayer)
bilinear = np.stack([
    np.asarray(__import__("PIL.Image", fromlist=["Image"]).fromarray(
        rgb[:, :, c]).resize((16, 16))) for c in range(3)], axis=-1)
print(f"demosaic RGGB: LUT recon {psnr(out, rgb):.2f} dB vs clean", flush=True)
