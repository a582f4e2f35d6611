"""Checkpoint distillation: fit MXU-shaped units to dense reference units.

The mxu deployment arch (`init_srnets(arch="mxu")`; PERF.md "The
architecture change, measured") deploys ~1.6x faster than the reference's
dense-concat shapes, but the reference checkpoint cannot be loaded into it
directly (different hidden widths).  Distillation closes the gap without
any training data: the unit contract is 4 taps in -> upscale**2 lanes out
(ref: common/network.py:62-105), so each imported dense unit DEFINES its
student's target function on the whole input domain [0, 1]^4.  Sampling
that domain — the 17^4 transfer lattice (ref: sr/2_transfer_to_lut.py:12-42)
densified with random interior and correlated "natural-statistics" points —
and regressing the student on the teacher's outputs converts the shipped
`Model_200000.pth` into mxu weights that can be scored on real Set5.

This is the reference's own LUT-caching idea taken one step further: step 2
memoizes each unit into a table over the same lattice; distillation
re-compresses the unit into a faster network instead of a table.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.blocks import apply_mulut_unit, init_mulut_unit


def transfer_lattice(interval: int = 4) -> np.ndarray:
    """(L**4, 4) float32 lattice in [0, 1] — the step-2 transfer grid.

    base = arange(0, 257, 2**interval) with base[-1] -= 1 (ref:
    sr/2_transfer_to_lut.py:13-15), all 4-tuples, /255.
    """
    base = np.arange(0, 257, 2 ** interval)
    base[-1] -= 1
    L = base.shape[0]
    idx = np.arange(L ** 4)
    digits = np.stack(
        [idx // L ** 3 % L, idx // L ** 2 % L, idx // L % L, idx % L], axis=1
    )
    return (base[digits] / 255.0).astype(np.float32)


def sample_taps(key, n: int, *, lattice=None):
    """(n, 4) training inputs: uniform + correlated + lattice mixture.

    Real-image taps are strongly correlated (neighboring pixels), so half
    the budget samples tap vectors clustered around a common base value at
    two spreads; a quarter is uniform over [0, 1]^4 (the worst-case
    corners the LUT grid also covers); the rest re-visits random lattice
    points (where step-2 caching will later evaluate the student
    exactly).
    """
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    n_nat = n // 2
    n_uni = n // 4
    n_lat = n - n_nat - n_uni
    uni = jax.random.uniform(k1, (n_uni, 4))
    base = jax.random.uniform(k2, (n_nat, 1))
    spread = jnp.where(
        jax.random.bernoulli(k3, 0.5, (n_nat, 1)), 0.03, 0.15
    )
    nat = jnp.clip(
        base + spread * jax.random.normal(k4, (n_nat, 4)), 0.0, 1.0
    )
    if lattice is None:
        lat = jax.random.uniform(k5, (n_lat, 4))
    else:
        idx = jax.random.randint(k6, (n_lat,), 0, lattice.shape[0])
        lat = jnp.take(lattice, idx, axis=0)
    return jnp.concatenate([uni, nat, lat], axis=0)


def distill_unit(key, teacher: dict, *, nf: int = 128, depth: int = 2,
                 upscale: int = 1, iters: int = 4000, batch: int = 65536,
                 lr0: float = 2e-3, lr1: float = 1e-5,
                 interval: int = 4, log_every: int = 0):
    """Fit one plain (mxu) unit to a dense teacher unit.

    Returns (student_params, metrics) where metrics carries the final
    domain-MSE and the max |error| over the full transfer lattice (the
    points step-2 caching evaluates — the LUT-artifact fidelity bound).
    """
    import optax

    out_dim = teacher["w6"].shape[1]
    assert out_dim == upscale * upscale, (out_dim, upscale)
    k_init, k_data = jax.random.split(key)
    student = init_mulut_unit(
        k_init, nf=nf, upscale=upscale, dense=False, depth=depth
    )
    lattice = jnp.asarray(transfer_lattice(interval))

    schedule = optax.cosine_decay_schedule(lr0, iters, alpha=lr1 / lr0)
    opt = optax.adam(schedule)
    opt_state = opt.init(student)

    @jax.jit
    def step(params, opt_state, key):
        x = sample_taps(key, batch, lattice=lattice)
        y = apply_mulut_unit(teacher, x)
        def loss_fn(p):
            pred = apply_mulut_unit(p, x)
            return jnp.mean((pred - y) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    keys = jax.random.split(k_data, iters)
    loss = jnp.zeros(())
    for i in range(iters):
        student, opt_state, loss = step(student, opt_state, keys[i])
        if log_every and (i + 1) % log_every == 0:
            print(f"  it {i + 1}/{iters} loss {float(loss):.3e}", flush=True)

    @jax.jit
    def lattice_err(params):
        y = apply_mulut_unit(teacher, lattice)
        p = apply_mulut_unit(params, lattice)
        err = p - y
        return jnp.mean(err ** 2), jnp.max(jnp.abs(err))

    mse, max_abs = lattice_err(student)
    metrics = {
        "final_batch_mse": float(loss),
        "lattice_mse": float(mse),
        "lattice_max_abs": float(max_abs),
        # in int8 LUT levels (the artifact quantum, 2/254 per level)
        "lattice_max_levels": float(max_abs) * 127.0,
    }
    return student, metrics


def distill_finetune_cascade(students: dict, dense_params: dict, *,
                             modes: str = "sdy", stages: int = 2,
                             scale: int = 4, iters: int = 2000,
                             batch: int = 16, crop: int = 48,
                             lr0: float = 2e-4, lr1: float = 1e-6,
                             seed: int = 0, sigma: float = 0.0,
                             extra_images=None, extra_weight: float = 0.7,
                             verbose: bool = False):
    """Image-space distillation: fine-tune the WHOLE mxu cascade onto the
    dense cascade's outputs.

    Per-unit domain distillation minimizes pointwise unit error under a
    synthetic input distribution; what Set5 scores is the COMPOSED
    cascade on natural-image statistics.  This pass closes that gap: crops
    of procedurally generated images (data/synthetic — no DIV2K needed)
    go through the frozen dense teacher cascade (valid phase), and the mxu
    student cascade (train phase, STE rounds active) regresses onto those
    outputs.  The teacher IS the reference checkpoint, so no ground-truth
    HR is involved — the student can only move toward the teacher.

    `sigma > 0` adds Gaussian noise to the crops (diversifies statistics).
    `extra_images` (list of HWC uint8 arrays — e.g. real LR training
    images; NEVER test images) are mixed in with probability
    `extra_weight` per crop: the r4 chip A/B measured that synthetic-only
    crops pull the students OFF real-image statistics (Set5 30.323 ->
    30.269 after a synthetic-only pass), so real inputs should dominate
    when available.  Returns (students, losses).
    """
    import optax

    from ..data.synthetic import _synth_image
    from ..models.srnet import srnets_predict

    # a pool of images to crop from (host, built once; variable sizes ok)
    rng = np.random.default_rng(seed)
    pool = [
        np.asarray(_synth_image(rng, 192), np.float32) / 255.0
        for _ in range(24)
    ]
    # drop images too small to crop from (rng.integers(0, 0) raises;
    # r4 advisor finding) — callers may pass unfiltered LR folders
    extra = [np.asarray(im, np.float32) / 255.0
             for im in (extra_images or [])
             if im.shape[0] >= crop and im.shape[1] >= crop]

    schedule = optax.cosine_decay_schedule(lr0, iters, alpha=lr1 / lr0)
    opt = optax.adam(schedule)
    opt_state = opt.init(students)

    @jax.jit
    def step(params, opt_state, x):
        target = srnets_predict(dense_params, x, modes=modes,
                                stages=stages, scale=scale, phase="train")
        target = jax.lax.stop_gradient(target)

        def loss_fn(p):
            pred = srnets_predict(p, x, modes=modes, stages=stages,
                                  scale=scale, phase="train")
            return jnp.mean((pred - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(iters):
        crops = []
        for _ in range(batch):
            src = (extra[rng.integers(len(extra))]
                   if extra and rng.random() < extra_weight
                   else pool[rng.integers(len(pool))])
            y = rng.integers(0, src.shape[0] - crop + 1)
            x = rng.integers(0, src.shape[1] - crop + 1)
            c = rng.integers(0, src.shape[2])
            patch = src[y : y + crop, x : x + crop, c]
            # rigid augmentation (flips + rot90, ref: sr/data.py:105-116)
            # multiplies the effective pool 8x — matters when only one
            # real image is available
            if rng.random() < 0.5:
                patch = patch[::-1]
            if rng.random() < 0.5:
                patch = patch[:, ::-1]
            patch = np.rot90(patch, rng.integers(4))
            crops.append(np.ascontiguousarray(patch))
        # (B, 1, crop, crop) — single random channel like the reference's
        # training crops (ref: sr/data.py:99)
        crops = np.stack(crops)[:, None]
        if sigma > 0:
            crops = np.clip(
                crops + rng.normal(0, sigma / 255.0, crops.shape), 0, 1
            )
        students, opt_state, loss = step(
            students, opt_state, jnp.asarray(crops, jnp.float32))
        losses.append(float(loss))
        if verbose and (i + 1) % max(1, iters // 8) == 0:
            print(f"  e2e it {i + 1}/{iters} loss {losses[-1]:.3e}",
                  flush=True)
    return students, losses


def distill_srnets(dense_params: dict, *, modes: str = "sdy",
                   stages: int = 2, scale: int = 4, nf: int = 128,
                   depth: int = 2, iters: int = 4000, batch: int = 65536,
                   lr0: float = 2e-3, lr1: float = 1e-5, seed: int = 0,
                   interval: int = 4, verbose: bool = False):
    """Distill every unit of an SRNets registry into mxu students.

    `dense_params` is the pytree from `torch_import.srnets_params_from_torch`
    (or any dense `init_srnets` result).  Returns (mxu_params, metrics)
    with matching "s{stage}_{mode}" keys (ref registry: sr/model.py:15-36).
    """
    key = jax.random.PRNGKey(seed)
    students, metrics = {}, {}
    for s in range(stages):
        upscale = scale if s + 1 == stages else 1
        # per-stage depth (tuple/list) mirrors init_srnets — e.g. (2, 3)
        # puts the extra hidden layer in the final stage, where the
        # hardest unit (s2_s, PERF.md) lives
        d_s = depth[s] if isinstance(depth, (tuple, list)) else depth
        for mode in modes:
            name = f"s{s + 1}_{mode}"
            key, sub = jax.random.split(key)
            if verbose:
                print(f"distilling {name} (upscale {upscale}, "
                      f"depth {d_s}) ...", flush=True)
            students[name], metrics[name] = distill_unit(
                sub, dense_params[name], nf=nf, depth=d_s,
                upscale=upscale, iters=iters, batch=batch, lr0=lr0,
                lr1=lr1, interval=interval,
                log_every=iters // 4 if verbose else 0,
            )
            if verbose:
                m = metrics[name]
                print(f"  {name}: lattice mse {m['lattice_mse']:.3e}, "
                      f"max |err| {m['lattice_max_levels']:.2f} LUT levels",
                      flush=True)
    return students, metrics
