"""Pallas stage-ensemble fast path vs the f32 reference forward.

Runs the kernel in the Pallas interpreter on CPU; on TPU the same code
compiles to the fused VMEM-resident kernel.  bf16 tolerance: outputs are
within a few gray levels of the f32 path (measured -0.014 dB on Set5 x4
with the reference checkpoint).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mulut_tpu.models.srnet import (
    init_srnets,
    srnets_predict,
    srnets_predict_fast,
    stack_srnets_for_fast,
)


def test_fast_matches_f32_within_bf16(rng):
    params = init_srnets(jax.random.PRNGKey(2), nf=8, scale=4, modes="sdy",
                         stages=2)
    stacked = stack_srnets_for_fast(params, modes="sdy", stages=2, scale=4)
    x = jnp.asarray(rng.random((1, 1, 6, 7)).astype(np.float32))
    want = np.asarray(srnets_predict(params, x, modes="sdy", stages=2,
                                     scale=4, phase="valid"))
    got = np.asarray(srnets_predict_fast(stacked, x, modes="sdy", stages=2,
                                         scale=4, interpret=True))
    assert got.shape == want.shape == (1, 1, 24, 28)
    # bf16 params + activations: small quantization differences only
    assert float(np.abs(got - want).mean()) < 2.0
    assert float(np.median(np.abs(got - want))) <= 1.0


def test_paired_kernel_bit_matches_pass_major(rng):
    """Rotation-pair block-diagonal kernel == pass-major kernel, bitwise.

    The off-diagonal zero blocks contribute exact float zeros, so every
    layer activation (and hence the rounded ensemble sum) is identical.
    """
    params = init_srnets(jax.random.PRNGKey(5), nf=8, scale=4, modes="sdy",
                         stages=2)
    x = jnp.asarray(rng.random((2, 1, 5, 6)).astype(np.float32))
    base = stack_srnets_for_fast(params, modes="sdy", stages=2, scale=4)
    pair = stack_srnets_for_fast(params, modes="sdy", stages=2, scale=4,
                                 paired=True)
    want = np.asarray(srnets_predict_fast(base, x, modes="sdy", stages=2,
                                          scale=4, interpret=True))
    got = np.asarray(srnets_predict_fast(pair, x, modes="sdy", stages=2,
                                         scale=4, interpret=True))
    assert np.array_equal(got, want)
