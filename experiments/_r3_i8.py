"""R3 scratch: int8 MXU matmul rate inside a Pallas kernel (probe).

v5e peaks ~197 TFLOP/s bf16 vs ~394 TOP/s int8 — IF Mosaic lowers an
int8 x int8 -> s32 `jnp.dot` to the MXU's int8 mode, a W8A8 variant of
the plain stage kernel could double the MXU-bound nf256 point.  This
probes exactly that: one (T, K) x (K, N) matmul chain per kernel pass,
bf16 vs int8, standalone rate at deployment-relevant shapes.

Usage: _r3_i8.py [--cpu]   (CPU = interpret-mode semantics smoke only)
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CPU = "--cpu" in sys.argv
if CPU:
    jax.config.update("jax_platforms", "cpu")

from mulut_tpu.utils.profiling import device_time  # noqa: E402
from mulut_tpu.utils.xla_opts import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

TILE = 1024
DEPTH = 8  # dependent chain, like the unit kernels


def _bf16_kernel(x_ref, w_ref, o_ref):
    x = x_ref[:]
    for _ in range(DEPTH):
        x = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
        x = jnp.maximum(x, 0).astype(jnp.bfloat16) - 0.5  # keep bounded
        x = x.astype(jnp.bfloat16)
    o_ref[:] = x.astype(jnp.float32)


def _int8_kernel(x_ref, w_ref, o_ref):
    x = x_ref[:]
    for _ in range(DEPTH):
        acc = jnp.dot(x, w_ref[:], preferred_element_type=jnp.int32)
        # requant: shift-right keeps values in int8 range (probe only)
        x = jnp.clip(acc >> 8, -127, 127).astype(jnp.int8)
    o_ref[:] = x.astype(jnp.int32)


def run_case(name, kern, xdt, wdt, odt, n, k):
    rng = np.random.default_rng(0)
    if xdt == jnp.int8:
        x = jnp.asarray(rng.integers(-127, 127, (n, k), dtype=np.int8))
        w = jnp.asarray(rng.integers(-8, 8, (k, k), dtype=np.int8))
    else:
        x = jnp.asarray(rng.random((n, k), np.float32) - 0.5, xdt)
        w = jnp.asarray((rng.random((k, k), np.float32) - 0.5) * 0.1, wdt)
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, k), odt),
        grid=(n // TILE,),
        in_specs=[pl.BlockSpec((TILE, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=CPU,
    )
    f = jax.jit(f)
    try:
        t0 = time.perf_counter()
        out = f(x, w)
        np.asarray(out[:1, :1])
        print(f"[{name} K={k}] compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        if CPU:
            print(f"[{name} K={k}] ok (interpret)", flush=True)
            return
        dt = device_time(lambda: f(x, w), n=5)
        ops = 2 * n * k * k * DEPTH
        print(f"[{name} K={k}] {dt*1e3:.2f} ms  "
              f"{ops/dt/1e12:.1f} Tops/s", flush=True)
    except Exception as e:
        print(f"[{name} K={k}] FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)


N = TILE * (4 if CPU else 512)
for k in (128, 256):
    run_case("bf16", _bf16_kernel, jnp.bfloat16, jnp.bfloat16,
             jnp.float32, N, k)
    run_case("int8", _int8_kernel, jnp.int8, jnp.int8, jnp.int32, N, k)
