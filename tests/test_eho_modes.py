"""End-to-end coverage of the extended sampling modes (E/H/O).

The reference defines ExN/Hx1/Ox1 patterns (common/network.py:202-216)
but ships no trained artifacts for them; engine parity for these modes
is covered per-component elsewhere (tests/test_expanded_engine.py).
This test closes the end-to-end gap: an eho-mode cascade trains,
transfers to LUTs, and the integer LUT deployment tracks the network
within the 4-bit interpolation gap.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mulut_tpu.models.srnet import init_srnets, srnets_predict
from mulut_tpu.ops.ensemble import lut_cascade_int
from mulut_tpu.pipelines.train import make_optimizer, make_train_step
from mulut_tpu.pipelines.transfer import transfer_to_luts


def test_eho_train_transfer_deploy(rng):
    modes, stages, scale = "eho", 2, 2
    params = init_srnets(jax.random.PRNGKey(0), nf=8, scale=scale,
                         modes=modes, stages=stages)
    opt = make_optimizer(1e-3, 1e-4, 30)
    st = opt.init(params)
    step = make_train_step(opt, modes=modes, stages=stages, scale=scale)
    losses = []
    for _ in range(30):
        im = rng.integers(0, 256, (4, 1, 12, 12)).astype(np.uint8)
        lb = rng.integers(0, 256, (4, 1, 24, 24)).astype(np.uint8)
        params, st, loss = step(params, st, jnp.asarray(im),
                                jnp.asarray(lb))
        losses.append(float(loss))
    assert losses[-1] < losses[0]

    luts = transfer_to_luts(params, modes=modes, stages=stages)
    assert luts["s1_e"].shape == (17 ** 4, 1)
    assert luts["s2_o"].shape == (17 ** 4, scale * scale)

    x = rng.integers(0, 256, (1, 10, 11))
    out = np.asarray(lut_cascade_int(
        {k: jnp.asarray(v, jnp.int32) for k, v in luts.items()},
        jnp.asarray(x, jnp.int32), stages=stages, modes=modes, scale=scale,
    ))
    net = np.asarray(srnets_predict(
        params, jnp.asarray(x[None].astype(np.float32)) / 255.0,
        modes=modes, stages=stages, scale=scale, phase="valid",
    ))[0]
    net = np.clip(np.round(net), 0, 255)
    assert out.shape == net.shape
    # 4-bit simplex interpolation gap only
    assert float(np.abs(out - net).mean()) < 2.0
