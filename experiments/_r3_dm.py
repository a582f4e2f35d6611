"""R3: demosaic quality at a realistic config (nf=16, 1000 iters)."""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
from mulut_tpu.pipelines import tasks


def psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255.0 ** 2 / mse)


rng = np.random.default_rng(9)
yy, xx = np.mgrid[0:16, 0:16].astype(np.float32) / 16


def gen16():
    while True:
        base = 127 + 80 * np.sin(
            2 * np.pi * (rng.uniform(1, 3) * xx + rng.uniform(1, 3) * yy))
        rgb = np.stack(
            [base, np.roll(base, 2, 0), np.roll(base, 2, 1)], axis=-1)
        yield np.clip(np.stack([rgb] * 4), 0, 255).astype(np.uint8)


params, losses = tasks.train_dm(gen16(), nf=16, iters=1000)
lut = tasks.dm_transfer(params)
rgb = next(gen16())[0]
bayer = tasks.bayer_mosaic(rgb)
out = tasks.dm_lut_apply(lut, bayer)
import jax.numpy as jnp
from mulut_tpu.models.srnet import dmnet_apply
net = np.asarray(dmnet_apply(
    params, jnp.asarray(bayer.astype(np.float32))[None, None] / 255.0))[0]
net_img = np.clip(np.round((net.transpose(1, 2, 0) + 1) / 2 * 255), 0, 255)
print(f"demosaic RGGB nf=16/1000it: net {psnr(net_img, rgb):.2f} dB, "
      f"LUT {psnr(out, rgb):.2f} dB (loss {losses[0]:.4f}->{losses[-1]:.4f})",
      flush=True)
