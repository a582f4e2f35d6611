"""r4: TRANSPOSED stage-ensemble kernel prototype (feature-major).

The shipped plain kernel works site-major: taps (N, 48), activations
(T, nf), head out (T, 16).  This prototype flips everything: taps
(48, N) — built by stacking 48 full rows, which XLA emits row-major with
NO transpose copies (the (N, 48) form pays 2 x 0.58 ms of {0,1}->{1,0}
copies per batch, and the row-major concat alternative hits the 128-lane
padding trap, both measured) — activations (nf, T) with sites in LANES,
and the output head (16, nf) x (nf, T), which costs 16/8 x 8 = 16
MXU-cycles instead of the site-major form's 128 (8x cheaper head-out).
Weights are pre-transposed host-side (free).

Standalone A/B vs the shipped kernel at the bench shape; only integrate
if it wins here AND in-context (r3 lesson: standalone wins often don't
transfer).

Run:  python experiments/_r4_tk.py [--cpu]
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from mulut_tpu.utils import lab


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--nf", type=int, default=128)
    p.add_argument("--tile", type=int, default=1024)
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    lab.setup()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import mulut_tpu.ops.unit_kernel as uk
    from mulut_tpu.models.srnet import (
        _ensemble_taps,
        _rotation_taps_batch,
        stack_srnets_for_fast,
    )
    from mulut_tpu.models.srnet import init_srnets

    interp = args.cpu
    B, H, W = (1, 8, 16) if args.cpu else (8, 270, 480)
    N = B * 1 * H * W
    M, out_pad, depth, nf, T = 3, 16, args.depth, args.nf, args.tile
    rng = np.random.default_rng(0)
    params = init_srnets(jax.random.PRNGKey(0), nf=nf, scale=4,
                         modes="sdy", stages=2, arch="mxu", depth=depth)
    stacked = stack_srnets_for_fast(params, modes="sdy", stages=2, scale=4)
    st = stacked[1]  # final stage (v=16)
    x = jnp.asarray(rng.random((B, 1, H, W)).astype(np.float32))

    # ---- transposed weight layout (host-side, free) ----
    w1t = jnp.transpose(st["w1"], (0, 2, 1))          # (M, nf, 4)
    hwt = jnp.transpose(st["hw"], (0, 1, 3, 2))       # (D, M, nf, nf)
    w6t = jnp.transpose(st["w6"], (0, 2, 1))          # (M, 4*out_pad, nf)

    def taps_T(xx):
        """(48, N) bf16: 48 stacked full rows — no transpose copies."""
        rows = []
        for m in "sdy":
            rt = _rotation_taps_batch(xx, m)          # (4, B, C, h, w, 4)
            for r in range(4):
                for k in range(4):
                    rows.append(rt[r, ..., k].reshape(N))
        return jnp.stack(rows, axis=0).astype(jnp.bfloat16)

    def kern_t(t_ref, w1, b1, hw, hb, w6, b6, out_ref):
        acc = jnp.zeros((out_pad, t_ref.shape[1]), jnp.float32)
        for mi in range(M):
            for r in range(4):
                col = (mi * 4 + r) * 4
                t = t_ref[col : col + 4, :]           # (4, T)
                xk = jnp.dot(w1[mi], t,
                             preferred_element_type=jnp.float32)
                xk = jnp.maximum(xk + b1[mi].astype(jnp.float32)[:, None], 0)
                xa = xk.astype(jnp.bfloat16)          # (nf, T)
                for d in range(depth):
                    xk = jnp.dot(hw[d, mi], xa,
                                 preferred_element_type=jnp.float32)
                    xk = jnp.maximum(
                        xk + hb[d, mi].astype(jnp.float32)[:, None], 0)
                    xa = xk.astype(jnp.bfloat16)
                o = jnp.dot(w6[mi, out_pad * r : out_pad * (r + 1), :], xa,
                            preferred_element_type=jnp.float32)
                o = jnp.tanh(
                    o + b6[mi, out_pad * r : out_pad * (r + 1)]
                    .astype(jnp.float32)[:, None])
                acc = acc + jnp.round(o * 127.0)
        out_ref[:] = acc

    n_pad = -(-N // T) * T

    @jax.jit
    def run_t(xx):
        t = taps_T(xx)
        if interp and n_pad != N:
            t = jnp.pad(t, [(0, 0), (0, n_pad - N)])
        npx = t.shape[1]
        return pl.pallas_call(
            kern_t,
            out_shape=jax.ShapeDtypeStruct((out_pad, npx), jnp.float32),
            grid=(-(-npx // T),),
            in_specs=[pl.BlockSpec((16 * M, T), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec((out_pad, T), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interp,
        )(t, w1t, st["b1"], hwt, st["hb"], w6t, st["b6"])[:, :N]

    @jax.jit
    def run_s(xx):
        return uk.stage_ensemble_apply(
            st, _ensemble_taps(xx, "sdy"), n_modes=M, interpret=interp)

    ot = run_t(x)
    os_ = run_s(x)
    # parity: transposed acc == site-major acc (same op set, mxu head)
    a, b = np.asarray(ot), np.asarray(os_)[:N].T
    match = np.allclose(a, b, atol=1e-3)
    exact = np.array_equal(a, b)
    print(f"parity: allclose={match} exact={exact} "
          f"maxdiff={np.abs(a - b).max()}", flush=True)
    if not args.cpu:
        dt_t = lab.device_time(lambda: run_t(x), n=4)
        dt_s = lab.device_time(lambda: run_s(x), n=4)
        print(f"transposed: {dt_t * 1e3:.1f} ms | site-major: "
              f"{dt_s * 1e3:.1f} ms (one stage, taps+kernel)", flush=True)


if __name__ == "__main__":
    main()
