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
