"""Chip-lab harness: the shared scaffold behind the experiments/ scripts.

Round 3 accumulated ~4.6k LoC of one-shot A/B scripts that each
re-declared the same pieces: compile-cache setup, config pins, marginal
device timing, checksum parity through a degraded tunnel, and a
keep-going-past-one-bad-config ladder loop.  This module factors those
into ~five functions so a new experiment is a ~20-line config (see
experiments/README.md).  No counterpart exists in the reference — this is
the repo's own measurement infrastructure (every PERF.md number and
negative result flows through it).
"""

from __future__ import annotations

import time

import numpy as np

from .profiling import device_time  # re-export: the one true timer
from .xla_opts import enable_compilation_cache, tpu_compiler_options

__all__ = [
    "device_time", "enable_compilation_cache", "tpu_compiler_options",
    "setup", "on_tpu", "row_checksums", "checksum_match", "ladder",
    "mfu",
]

#: v5e bf16 peak (dense), FLOP/s — the MFU denominator used across PERF.md.
V5E_BF16_PEAK = 197e12


def setup(compile_cache: bool = True):
    """Standard experiment preamble: persistent compile cache + backend id.

    Returns (backend, is_tpu).  Call BEFORE the first device touch.
    """
    import jax

    if compile_cache:
        enable_compilation_cache()
    backend = jax.default_backend()
    print(f"[lab] backend={backend} devices={jax.devices()}", flush=True)
    return backend, backend == "tpu"


def on_tpu() -> bool:
    import jax

    return jax.default_backend() == "tpu"


def row_checksums(out, moduli=(251, 241)):
    """Device-side parity fingerprint: per-row (sum, weighted sums).

    Full-array readbacks through a degraded tunnel stall for minutes, so
    A/B parity uses per-row int32 checksums with two coprime weight
    vectors — structured differences would have to collide at columns
    `moduli[0]*moduli[1]` apart (beyond any row width here) in BOTH
    weighted sums to escape.  This is CHECKSUM parity, not a bit-exact
    proof; report it as such (PERF.md wording).  Values must be bounded
    so |row| * 255 * max(weights) stays inside int32.

    Returns a tuple of host arrays (hashable-comparable via
    `checksum_match`).
    """
    import jax.numpy as jnp

    o = out.astype(jnp.int32)
    w = o.shape[-1]
    sums = [np.asarray(jnp.sum(o, axis=-1))]
    for m in moduli:
        weights = jnp.asarray((np.arange(w) % m) + 1, jnp.int32)
        sums.append(np.asarray(jnp.sum(o * weights, axis=-1)))
    return tuple(sums)


def checksum_match(a, b) -> bool:
    return all(np.array_equal(x, y) for x, y in zip(a, b))


def ladder(configs, run_one, *, label=lambda c: str(c)):
    """Run a config grid, keep going past failures, return results.

    `run_one(cfg)` returns a result dict (or raises).  Each entry is
    printed as it lands; the returned list holds (label, result_or_None).
    The try/except-per-config pattern is what kept round-3 chip sessions
    alive across compiler rejections and tunnel stalls.
    """
    out = []
    for cfg in configs:
        tag = label(cfg)
        t0 = time.perf_counter()
        try:
            res = run_one(cfg)
            print(f"[{tag}] {res} ({time.perf_counter() - t0:.0f}s)",
                  flush=True)
            out.append((tag, res))
        except Exception as e:  # noqa: BLE001 — ladder must survive
            print(f"[{tag}] FAILED {type(e).__name__}: {e}", flush=True)
            out.append((tag, None))
    return out


def mfu(flops_per_run: float, seconds_per_run: float,
        peak: float = V5E_BF16_PEAK) -> float:
    """Model-FLOP utilization fraction for a measured run time."""
    return flops_per_run / seconds_per_run / peak
