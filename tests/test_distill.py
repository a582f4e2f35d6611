"""Checkpoint distillation (pipelines/distill.py): mxu students fit dense
teachers over the 4-tap domain.

The real use (distilling the reference Model_200000.pth and scoring Set5
on chip) runs in experiments/_r4_distill.py; here CI pins the machinery:
the sampler covers the domain, a small student actually converges onto a
small teacher, and the registry API preserves unit contracts.
"""

import jax
import numpy as np

from mulut_tpu.models.blocks import apply_mulut_unit, init_mulut_unit
from mulut_tpu.pipelines.distill import (
    distill_srnets,
    distill_unit,
    sample_taps,
    transfer_lattice,
)


def test_transfer_lattice_matches_reference_grid():
    # ref: sr/2_transfer_to_lut.py:13-15 — arange(0,257,16), last -= 1
    lat = transfer_lattice(4)
    assert lat.shape == (17 ** 4, 4)
    vals = np.unique(np.round(lat * 255).astype(int))
    assert vals.tolist() == list(range(0, 241, 16)) + [255]
    # lexicographic (a, b, c, d) order like the consumer index a*L^3+...
    assert np.allclose(lat[0], 0)
    assert np.allclose(lat[-1], 1)
    assert np.round(lat[1] * 255).astype(int).tolist() == [0, 0, 0, 16]


def test_sample_taps_in_domain():
    lat = transfer_lattice(4)
    x = np.asarray(sample_taps(jax.random.PRNGKey(0), 4096,
                               lattice=jax.numpy.asarray(lat)))
    assert x.shape == (4096, 4)
    assert x.min() >= 0.0 and x.max() <= 1.0
    # the mixture has both clustered and spread rows
    spread = x.max(axis=1) - x.min(axis=1)
    assert (spread < 0.2).sum() > 200      # correlated cluster present
    assert (spread > 0.5).sum() > 200      # uniform coverage present


def test_distill_unit_converges_onto_small_teacher():
    key = jax.random.PRNGKey(1)
    teacher = init_mulut_unit(key, nf=8, upscale=2, dense=True, depth=4)
    student, metrics = distill_unit(
        jax.random.PRNGKey(2), teacher, nf=32, depth=2, upscale=2,
        iters=300, batch=4096, lr0=5e-3,
    )
    # a 32-wide student has ample capacity for an nf=8 teacher: the
    # lattice error must land well below the int8 LUT quantum
    assert metrics["lattice_mse"] < 1e-3, metrics
    x = sample_taps(jax.random.PRNGKey(3), 512)
    err = np.abs(np.asarray(
        apply_mulut_unit(student, x) - apply_mulut_unit(teacher, x)
    ))
    assert err.mean() < 0.05, err.mean()


def test_distill_finetune_cascade_descends():
    """Image-space distillation: the composed mxu cascade regresses onto
    the frozen dense cascade's outputs (loss strictly improves)."""
    from mulut_tpu.models.srnet import init_srnets
    from mulut_tpu.pipelines.distill import distill_finetune_cascade

    dense = init_srnets(jax.random.PRNGKey(0), nf=8, scale=2, modes="s",
                        stages=2)
    students = init_srnets(jax.random.PRNGKey(1), nf=16, scale=2,
                           modes="s", stages=2, arch="mxu")
    students, losses = distill_finetune_cascade(
        students, dense, modes="s", stages=2, scale=2, iters=20, batch=4,
        crop=16)
    assert losses[-1] < losses[0], (losses[0], losses[-1])


def test_distill_srnets_registry_contract():
    key = jax.random.PRNGKey(0)
    from mulut_tpu.models.srnet import init_srnets

    dense = init_srnets(key, nf=8, scale=2, modes="sd", stages=2)
    students, metrics = distill_srnets(
        dense, modes="sd", stages=2, scale=2, nf=16, depth=2,
        iters=30, batch=1024,
    )
    assert set(students) == {"s1_s", "s1_d", "s2_s", "s2_d"}
    # unit contract: 4 taps in, upscale**2 lanes out (plain layout)
    assert students["s1_s"]["w6"].shape == (16, 1)
    assert students["s2_s"]["w6"].shape == (16, 4)
    from mulut_tpu.models.blocks import unit_layout

    assert unit_layout(students["s2_s"])[0] is False  # plain, not dense
    assert all("lattice_mse" in m for m in metrics.values())
