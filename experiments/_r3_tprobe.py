"""R3 scratch: does Mosaic lower 2-D transposes, and at what cost?

Gates two kernel designs:
  * a fused y-contraction consumer (raw gather rows (T, W) s8 {1,0} ->
    (16, T) f32 output) needs (T, W) -> (W, T) or (T,16) -> (16,T);
  * a transposed-output stage_ensemble kernel for the net path (kills
    the (N,16) -> interleave relayout copies, ~10 ms/run).

Probes, on the real chip:
  1. compile a trivial Pallas kernel writing x.T for (512,16),
     (512,64), (512,128) f32 and (512,128) s8 -> parity vs XLA + time;
  2. same but transpose built from jax.lax.transpose;
  3. a (T,80) s8 -> f32 convert -> (80,T) transpose -> weighted-sum
     consumer shaped like the y contraction, timed standalone at 3.33M
     rows for a ceiling estimate (in-context numbers are what count,
     but a standalone FAIL kills the design early).
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
INTERP = "--cpu" in sys.argv


def t_kernel(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :].T


def probe_transpose(T, W, dtype):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((T, W)), dtype)
    try:
        out = pl.pallas_call(
            t_kernel,
            out_shape=jax.ShapeDtypeStruct((W, T), dtype),
            interpret=INTERP,
        )(x)
        ok = np.array_equal(np.asarray(out), np.asarray(x).T)
        print(f"  transpose ({T},{W}) {dtype.__name__}: "
              f"{'OK' if ok else 'WRONG RESULT'}", flush=True)
        return ok
    except Exception as e:
        print(f"  transpose ({T},{W}) {dtype.__name__}: FAIL "
              f"{type(e).__name__}: {str(e)[:140]}", flush=True)
        return False


def ycontract_kernel(g_ref, lt_ref, o_ref):
    # g: (T, 80) s8 raw gather rows; lt: (8, T) f32 (lam.T, 5 used);
    # o: (16, T) f32
    gf = g_ref[:, :].astype(jnp.float32)      # (T, 80)
    gt = gf.T                                  # (80, T)
    acc = None
    for t in range(5):
        w = lt_ref[t, :]                       # (T,)
        blk = gt[t * 16:(t + 1) * 16, :] * w[None, :]
        acc = blk if acc is None else acc + blk
    o_ref[:, :] = acc


def probe_ycontract(n_rows=3_330_056, tile=2048):
    rng = np.random.default_rng(0)
    npad = -(-n_rows // tile) * tile
    g = jnp.asarray(rng.integers(-127, 128, (npad, 80)), jnp.int8)
    lt = jnp.asarray(rng.random((8, npad), np.float32))
    try:
        f = pl.pallas_call(
            ycontract_kernel,
            out_shape=jax.ShapeDtypeStruct((16, npad), jnp.float32),
            grid=(npad // tile,),
            in_specs=[
                pl.BlockSpec((tile, 80), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((16, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=INTERP,
        )
        fj = jax.jit(f)
        out = np.asarray(fj(g, lt))
        gf = np.asarray(g, np.float32).reshape(npad, 5, 16)
        want = np.einsum("nm,nmv->vn", np.asarray(lt)[:5].T, gf)
        ok = np.allclose(out, want, rtol=1e-5, atol=1e-3)
        print(f"  ycontract parity: {'OK' if ok else 'WRONG'}", flush=True)
        if INTERP:
            return
        from mulut_tpu.utils.profiling import device_time
        dt = device_time(lambda: fj(g, lt), n=3)
        print(f"  ycontract {npad} rows: {dt*1e3:.2f} ms "
              f"({dt/npad*1e9:.2f} ns/row)", flush=True)
    except Exception as e:
        print(f"  ycontract: FAIL {type(e).__name__}: {str(e)[:180]}",
              flush=True)


if __name__ == "__main__":
    print("transpose probes:", flush=True)
    for T, W, dt in [(512, 16, np.float32), (512, 64, np.float32),
                     (512, 128, np.float32), (512, 80, np.float32),
                     (512, 128, np.int8)]:
        probe_transpose(T, W, dt)
    print("y-contraction consumer probe:", flush=True)
    probe_ycontract(333_056 if INTERP else 3_330_056)
