"""Per-executable TPU compiler options.

`--xla_tpu_*` flags are libtpu flags, NOT client-side XLA_FLAGS — putting
them in XLA_FLAGS aborts flag parsing on non-TPU backends (measured:
`Unknown flag in XLA_FLAGS` fatal on CPU).  The robust channel is JAX's
per-executable `compiler_options` (jax.jit(..., compiler_options=...)),
which reaches the backend compiler that actually owns the flag.

The one option this framework tunes is the scoped-VMEM budget:
a raised `xla_tpu_scoped_vmem_limit_kib` lets XLA stage the 21.4 MB
16-corner LUT tables into VMEM, where table gathers run ~4.4x faster
per row than from HBM (PERF.md r3 cost model).
"""

from __future__ import annotations

import os


def default_cache_root() -> str:
    """Durable root for this framework's on-disk caches.

    /tmp was measured to be wiped by container restarts three separate
    times in one round (NOTES_ROUND3.md) — a cold expanded-table +
    XLA-compile rebuild costs ~8-10 min and can blow an external bench
    timeout.  Preference order:
      1. $MULUT_CACHE_ROOT;
      2. `<source checkout>/.cache` when the package runs from a repo
         (detected by pyproject.toml two levels up) and it is writable;
      3. ~/.cache/mulut_tpu;
      4. /tmp/mulut_tpu_cache_root (last resort).
    """
    env = os.environ.get("MULUT_CACHE_ROOT")
    if env:
        return env
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(os.path.dirname(here))
    candidates = []
    if os.path.exists(os.path.join(repo, "pyproject.toml")):
        candidates.append(os.path.join(repo, ".cache"))
    home = os.path.expanduser("~")
    if home and home != "~":
        candidates.append(os.path.join(home, ".cache", "mulut_tpu"))
    candidates.append("/tmp/mulut_tpu_cache_root")
    for cand in candidates:
        try:
            os.makedirs(cand, exist_ok=True)
            if os.access(cand, os.W_OK):
                return cand
        except OSError:
            continue
    return candidates[-1]


def enable_compilation_cache(path: str | None = None) -> bool:
    """Turn on JAX's persistent compilation cache (best-effort).

    The bench autotune compiles three full-cascade candidates; a cold
    process spends ~8-10 minutes in XLA compilation alone (measured on
    the axon tunnel), which can exceed an external runner's timeout.
    With the on-disk cache warm, a repeat bench run skips straight to
    execution.  Lives under `default_cache_root()` (repo .cache/ in a
    source checkout) so container restarts that wipe /tmp do not cause
    a cold-start bench timeout.

    MULUT_COMPILE_CACHE=0 disables; a non-empty MULUT_COMPILE_CACHE
    overrides the directory.  Returns True when the cache was enabled.
    """
    import jax

    env = os.environ.get("MULUT_COMPILE_CACHE", "")
    if env == "0":
        return False
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            env or path or os.path.join(default_cache_root(), "jax"))
        # Default heuristics skip small/fast entries; the cascade
        # executables are exactly the entries we want, so cache all.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:  # noqa: BLE001 — unknown config names on old jax
        return False


def tpu_compiler_options(extra: dict | None = None, *,
                         scoped_vmem_kib: int | None = None) -> dict | None:
    """compiler_options dict for jax.jit on TPU, or None.

    The budget comes from `scoped_vmem_kib` when given (bench autotune
    candidates), else MULUT_SCOPED_VMEM_KIB (A/B experiment scripts).
    Returns None when unset or when the default backend is not a TPU
    (other backends reject unknown options at compile time).
    """
    import jax

    opts = dict(extra or {})
    kib = (scoped_vmem_kib if scoped_vmem_kib is not None
           else os.environ.get("MULUT_SCOPED_VMEM_KIB"))
    if kib and jax.default_backend() == "tpu":
        opts["xla_tpu_scoped_vmem_limit_kib"] = str(int(kib))
    return opts or None
