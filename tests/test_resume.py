"""Full checkpoint/resume: a resumed run reproduces an uninterrupted one.

The reference intended optimizer persistence but never shipped it (the save
is commented out at ref: sr/1_train_model.py:65-66 and the resume load is
broken at :157-164).  Here, saving {params, optimizer state} at iter N and
resuming must follow the SAME trajectory as training straight through —
Adam moments and the cosine-LR phase (step counts) included.
"""

import jax
import numpy as np

from mulut_tpu.models.srnet import init_srnets
from mulut_tpu.models.torch_import import (
    load_opt_state_npz,
    load_params_npz,
    save_opt_state_npz,
    save_params_npz,
)
from mulut_tpu.pipelines.train import make_optimizer, make_train_step


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_resume_reproduces_uninterrupted_trajectory(tmp_path, rng):
    n, half = 8, 4
    batches = [
        (
            rng.integers(0, 256, (2, 1, 8, 8), dtype=np.uint8),
            rng.integers(0, 256, (2, 1, 16, 16), dtype=np.uint8),
        )
        for _ in range(n)
    ]

    def fresh():
        params = init_srnets(jax.random.PRNGKey(0), nf=4, scale=2,
                             modes="s", stages=1)
        optimizer = make_optimizer(1e-3, 1e-4, n)
        return params, optimizer, optimizer.init(params)

    # uninterrupted: n steps
    params_a, optimizer, state_a = fresh()
    step = make_train_step(optimizer, modes="s", stages=1, scale=2)
    for im, lb in batches:
        params_a, state_a, _ = step(params_a, state_a, im, lb)

    # interrupted: half steps -> save -> reload -> remaining steps
    params_b, optimizer, state_b = fresh()
    for im, lb in batches[:half]:
        params_b, state_b, _ = step(params_b, state_b, im, lb)
    ppath, opath = str(tmp_path / "Model.npz"), str(tmp_path / "Opt.npz")
    save_params_npz(ppath, jax.device_get(params_b))
    save_opt_state_npz(opath, jax.device_get(state_b))

    params_c = load_params_npz(ppath)
    state_c = load_opt_state_npz(opath, optimizer.init(params_c))
    _tree_equal(state_b, state_c)  # moments AND step counts survive
    for im, lb in batches[half:]:
        params_c, state_c, _ = step(params_c, state_c, im, lb)

    # bit-identical trajectory: same ops on identical state
    _tree_equal(params_a, params_c)
    _tree_equal(state_a, state_c)


def test_resume_without_opt_state_diverges(tmp_path, rng):
    """Sanity check that the optimizer state actually matters here — a
    params-only resume (the round-1 behavior) must NOT reproduce the
    uninterrupted trajectory, or the test above proves nothing."""
    n, half = 8, 4
    batches = [
        (
            rng.integers(0, 256, (2, 1, 8, 8), dtype=np.uint8),
            rng.integers(0, 256, (2, 1, 16, 16), dtype=np.uint8),
        )
        for _ in range(n)
    ]
    params = init_srnets(jax.random.PRNGKey(0), nf=4, scale=2,
                         modes="s", stages=1)
    optimizer = make_optimizer(1e-3, 1e-4, n)
    step = make_train_step(optimizer, modes="s", stages=1, scale=2)

    pa, sa = params, optimizer.init(params)
    for im, lb in batches:
        pa, sa, _ = step(pa, sa, im, lb)

    pb, sb = params, optimizer.init(params)
    for im, lb in batches[:half]:
        pb, sb, _ = step(pb, sb, im, lb)
    sb = optimizer.init(pb)  # drop moments + LR phase
    for im, lb in batches[half:]:
        pb, sb, _ = step(pb, sb, im, lb)

    la = np.concatenate([np.asarray(x).ravel()
                         for x in jax.tree_util.tree_leaves(pa)])
    lb_ = np.concatenate([np.asarray(x).ravel()
                          for x in jax.tree_util.tree_leaves(pb)])
    assert not np.allclose(la, lb_)
