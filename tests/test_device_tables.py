"""Device-side table construction is byte-identical to the host builders.

`prepare_expanded_luts(device=True)` builds every expanded-table format on
the accelerator from the small source LUTs (simplex_tables.*_device twins)
— the cold-start path on TPU, where uploading pre-built tables through a
remote-device tunnel costs minutes.  Each format must match the host
(NumPy) build byte for byte, since the cascade consuming them is pinned
bit-exact against the reference golden images.
"""

import numpy as np
import pytest

from mulut_tpu.ops.ensemble import prepare_expanded_luts


def _luts(rng, L, modes="sdy", stages=2, v_last=16):
    luts = {}
    for s in range(stages):
        v = v_last if s + 1 == stages else 1
        for m in modes:
            luts[f"s{s + 1}_{m}"] = rng.integers(
                -127, 128, (L ** 4, v)
            ).astype(np.int8)
    return luts


CONFIGS = [
    # (label, kwargs) — every engine config the evaluator/bench can select
    ("xla-rank", dict()),
    ("xla-16corner", dict(rank=False)),
    ("kernel-stock", dict(shared_quad=True)),
    ("kernel-winner", dict(shared_quad=True, corner16_modes="y",
                           fold16_modes="sd", k128_stage1="sd",
                           int8_stage1="y")),
    ("kernel-c16-only", dict(shared_quad=True, corner16_modes="y",
                             fold16_modes="sd")),
]


@pytest.mark.parametrize("label,kw", CONFIGS, ids=[c[0] for c in CONFIGS])
def test_device_tables_match_host(rng, label, kw):
    interval = 6  # L=5: every format in seconds, same code paths as L=17
    L = 2 ** (8 - interval) + 1
    luts = _luts(rng, L)
    host = prepare_expanded_luts(luts, interval=interval, **kw)
    dev = prepare_expanded_luts(luts, interval=interval, device=True, **kw)
    assert host.keys() == dev.keys()
    for k in host:
        h, d = host[k], np.asarray(dev[k])
        assert h.shape == d.shape, (label, k, h.shape, d.shape)
        assert h.dtype == d.dtype, (label, k, h.dtype, d.dtype)
        assert np.array_equal(h, d), (label, k)


def test_device_tables_interval4_winner_subset(rng):
    # One interval-4 spot check (real L=17 digit arithmetic) on the
    # small-table formats of the shipped winner config; the big rank
    # tables are covered at L=5 above.
    luts = {
        "s1_y": rng.integers(-127, 128, (17 ** 4, 1)).astype(np.int8),
        "s2_y": rng.integers(-127, 128, (17 ** 4, 16)).astype(np.int8),
    }
    kw = dict(shared_quad=True, corner16_modes="y", int8_stage1="y")
    host = prepare_expanded_luts(luts, interval=4, **kw)
    dev = prepare_expanded_luts(luts, interval=4, device=True, **kw)
    for k in host:
        assert host[k].dtype == np.asarray(dev[k]).dtype
        assert np.array_equal(host[k], np.asarray(dev[k])), k
