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
                    dense: bool = True, depth: int = 4) -> dict:
    """Parameters of one MuLUT unit (ref: common/network.py:62-105).

    Layout: w1 (4, nf) head over the 4 taps; w2..w{depth+1} dense(-concat)
    or plain 1x1 layers; w6 ((depth+1)*nf or nf, out_c*upscale**2) output
    head followed by tanh.

    The reference architecture is dense with depth 4.  `dense=False,
    depth=2, nf=128` is the MXU-shaped variant ("mxu" in `init_srnets`):
    plain 128-wide hidden matmuls fill all MXU lanes and cut the dependent
    chain from 6 to 3 matmuls per pass — see PERF.md's unit accounting
    (the dense-concat shapes cap at 31% theoretical / 16.5% measured MFU;
    the 128-wide plain shapes cap at ~71%).  LUT transfer is architecture-
    blind (same 4-tap receptive field -> identical LUT shapes).
    """
    assert not (dense and depth != 4), "the dense-concat unit is depth-4"
    keys = jax.random.split(key, depth + 2)
    out_dim = out_c * upscale * upscale
    params = {
        "w1": _kaiming_normal(keys[0], (4, nf), fan_in=4),
        "b1": jnp.zeros((nf,), jnp.float32),
    }
    for i in range(2, 2 + depth):
        w_in = (i - 1) * nf if dense else nf
        params[f"w{i}"] = _kaiming_normal(keys[i - 1], (w_in, nf), fan_in=w_in)
        params[f"b{i}"] = jnp.zeros((nf,), jnp.float32)
    head_in = (depth + 1) * nf if dense else nf
    params["w6"] = _kaiming_normal(keys[depth + 1], (head_in, out_dim),
                                   fan_in=head_in)
    params["b6"] = jnp.zeros((out_dim,), jnp.float32)
    return params


def unit_layout(params: dict) -> tuple:
    """Infer (dense, hidden_layer_indices) from a unit's parameter shapes.

    Hidden layers are the present w2..w5 keys; the unit is dense-concat iff
    the output head consumes the full concat width ((depth+1)*nf).  Plain
    units (DMNet ref: common/network.py:276-317; the mxu variant) feed the
    head nf columns.  Unambiguous for every unit this package creates
    (a depth-0 unit, where the two coincide, is never built).
    """
    nf = params["w1"].shape[1]
    hidden = [i for i in range(2, 6) if f"w{i}" in params]
    dense = params["w6"].shape[0] == (len(hidden) + 1) * nf and hidden
    return bool(dense), hidden


def apply_mulut_unit(params: dict, x4, *, dense: bool | None = None,
                     precision=jax.lax.Precision.HIGHEST):
    """(N, 4) tap pixels -> (N, out_c*upscale**2) in (-1, 1).

    Matches MuLUTUnit.forward (ref: common/network.py:96-105): relu head,
    dense-concat (or plain) 1x1 layers, linear output, tanh.  The
    pixel-shuffle happens later during spatial assembly.

    dense: None (default) infers the architecture from the parameter
    shapes (`unit_layout`); pass explicitly only to assert a layout.

    precision: TPU MXU matmul precision.  HIGHEST (3-pass bf16 = fp32
    accuracy) by default: LUT caching rounds the outputs to int8 levels of
    width 2/254, so default bf16 matmuls would perturb entries by several
    levels.
    """
    inferred, hidden = unit_layout(params)
    if dense is None:
        dense = inferred

    def dot(a, b):
        return jnp.dot(a, b, precision=precision)

    x = jax.nn.relu(dot(x4, params["w1"]) + params["b1"])
    for i in hidden:
        feat = jax.nn.relu(dot(x, params[f"w{i}"]) + params[f"b{i}"])
        x = jnp.concatenate([x, feat], axis=-1) if dense else feat
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
