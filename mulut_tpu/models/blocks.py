"""MuLUT building blocks as pure-functional JAX modules.

TPU-first reformulation of the reference blocks (ref: common/network.py:16-133):
since every conv after the receptive-field head is 1x1, a MuLUT unit is an MLP
over the four sampled pixels.  Instead of unfold -> (B*C*L, 1, K, K) conv ->
fold (ref: common/network.py:193-225), we feed (N, 4) tap vectors straight
into dense layers — the same math, but expressed as large batched matmuls the
MXU tiles natively, with no K*K patch materialization.

Params are plain dicts of jnp arrays (a pytree), init mirrors the reference's
Kaiming-normal weights and zero biases (ref: common/network.py:23-25).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _kaiming_normal(key, shape, fan_in):
    """Torch nn.init.kaiming_normal_ default: gain sqrt(2), fan_in mode."""
    std = float(np.sqrt(2.0 / fan_in))
    return jax.random.normal(key, shape, dtype=jnp.float32) * std


def init_mulut_unit(key, *, nf: int = 64, upscale: int = 1, out_c: int = 1,
                    dense: bool = True) -> dict:
    """Parameters of one MuLUT unit (ref: common/network.py:62-105).

    Layout: w1 (4, nf) head over the 4 taps; w2..w5 dense(-concat) 1x1 layers;
    w6 (5nf or nf, out_c*upscale**2) output head followed by tanh.
    """
    keys = jax.random.split(key, 6)
    out_dim = out_c * upscale * upscale
    params = {
        "w1": _kaiming_normal(keys[0], (4, nf), fan_in=4),
        "b1": jnp.zeros((nf,), jnp.float32),
    }
    if dense:
        widths = [nf, 2 * nf, 3 * nf, 4 * nf]
        for i, w_in in enumerate(widths, start=2):
            params[f"w{i}"] = _kaiming_normal(keys[i - 1], (w_in, nf), fan_in=w_in)
            params[f"b{i}"] = jnp.zeros((nf,), jnp.float32)
        params["w6"] = _kaiming_normal(keys[5], (5 * nf, out_dim), fan_in=5 * nf)
    else:
        for i in range(2, 6):
            params[f"w{i}"] = _kaiming_normal(keys[i - 1], (nf, nf), fan_in=nf)
            params[f"b{i}"] = jnp.zeros((nf,), jnp.float32)
        params["w6"] = _kaiming_normal(keys[5], (nf, out_dim), fan_in=nf)
    params["b6"] = jnp.zeros((out_dim,), jnp.float32)
    return params


def apply_mulut_unit(params: dict, x4, *, dense: bool = True,
                     precision=jax.lax.Precision.HIGHEST):
    """(N, 4) tap pixels -> (N, out_c*upscale**2) in (-1, 1).

    Matches MuLUTUnit.forward (ref: common/network.py:96-105): relu head,
    four dense-concat (or plain) 1x1 layers, linear output, tanh.  The
    pixel-shuffle happens later during spatial assembly.

    precision: TPU MXU matmul precision.  HIGHEST (3-pass bf16 = fp32
    accuracy) by default: LUT caching rounds the outputs to int8 levels of
    width 2/254, so default bf16 matmuls would perturb entries by several
    levels.
    """
    def dot(a, b):
        return jnp.dot(a, b, precision=precision)

    x = jax.nn.relu(dot(x4, params["w1"]) + params["b1"])
    if dense:
        for i in range(2, 6):
            feat = jax.nn.relu(dot(x, params[f"w{i}"]) + params[f"b{i}"])
            x = jnp.concatenate([x, feat], axis=-1)
    else:
        for i in range(2, 6):
            x = jax.nn.relu(dot(x, params[f"w{i}"]) + params[f"b{i}"])
    return jnp.tanh(dot(x, params["w6"]) + params["b6"])


def init_mulut_c_unit(key, *, nf: int = 64) -> dict:
    """Channel-wise RGB->RGB unit (ref: common/network.py:108-133)."""
    keys = jax.random.split(key, 6)
    params = {
        "w1": _kaiming_normal(keys[0], (3, nf), fan_in=3),
        "b1": jnp.zeros((nf,), jnp.float32),
    }
    widths = [nf, 2 * nf, 3 * nf, 4 * nf]
    for i, w_in in enumerate(widths, start=2):
        params[f"w{i}"] = _kaiming_normal(keys[i - 1], (w_in, nf), fan_in=w_in)
        params[f"b{i}"] = jnp.zeros((nf,), jnp.float32)
    params["w6"] = _kaiming_normal(keys[5], (5 * nf, 3), fan_in=5 * nf)
    params["b6"] = jnp.zeros((3,), jnp.float32)
    return params


def apply_mulut_c_unit(params: dict, rgb, *, precision=jax.lax.Precision.HIGHEST):
    """(..., 3) -> (..., 3); dense 1x1 stack with tanh output."""
    def dot(a, b):
        return jnp.dot(a, b, precision=precision)

    x = jax.nn.relu(dot(rgb, params["w1"]) + params["b1"])
    for i in range(2, 6):
        feat = jax.nn.relu(dot(x, params[f"w{i}"]) + params[f"b{i}"])
        x = jnp.concatenate([x, feat], axis=-1)
    return jnp.tanh(dot(x, params["w6"]) + params["b6"])
