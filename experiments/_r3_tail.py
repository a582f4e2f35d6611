"""R3 scratch: Pallas stage-2 tail-assembly kernel prototype.

Consumes the flat per-mode einsum outputs (transposed — bitcast of XLA's
{0,1} layout), performs rotation un-shifts + stage mix + interleave +
uint8 cast per row block in VMEM.  Validates bit-exactness on CPU
(interpret mode) then times on the chip.
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import mulut_tpu.ops.ensemble as ens
import mulut_tpu.ops.simplex as sx
from mulut_tpu.ops.ensemble import (
    lut_cascade_int,
    prepare_expanded_luts_cached,
    stage_mix,
)
from mulut_tpu.ops.simplex import _interleave
from mulut_tpu.ops.taps import fold_geometry, mode_pad, mode_taps, rotated_taps
from mulut_tpu.utils.profiling import device_time

INTERPRET = "--cpu" in sys.argv


# ---------------------------------------------------------------------------
# Flat per-mode stage-2 producers (einsum only, no reshape/crop)
# ---------------------------------------------------------------------------

def folded_flat(flut, img, *, mode, v, interval):
    """Rank-folded s/d: returns (ext (n_ext, 4v) f32, he, we, offsets).

    Evaluates ONE extra (junk) extended row per image so the tail kernel's
    128-aligned DMA sizes never cross a bc-block boundary (~0.4% extra
    rows; the kernel requires w >= 126 for the slack to cover alignment).
    """
    geo = fold_geometry(mode)
    pad = mode_pad(mode) + 1   # +1 headroom for the extra junk row
    h, w = img.shape[-2], img.shape[-1]
    my = -min(s_[0] for s_, _ in geo)
    mx = -min(s_[1] for s_, _ in geo)
    he = h + my + 1               # +1 junk row at the end
    we = -(-(w + mx) // 128) * 128  # 128-aligned width: every DMA row
    # start (bc*he + y)*we is then divisible by 128 (junk columns)
    extra_cols = we - (w + mx)
    cfg = [(0, 0)] * (img.ndim - 2) + [(pad, pad), (pad, pad + extra_cols)]
    xp = jnp.pad(img, cfg, mode="edge")
    planes = [
        xp[..., pad - my + dy: pad - my + dy + he,
           pad - mx + dx: pad - mx + dx + we]
        for dy, dx in mode_taps(mode)
    ]
    n_ext = int(np.prod(planes[0].shape))
    base, fr = sx._base_and_fracs(planes, interval=interval)
    lam = sx.sorted_weights(*fr, interval=interval)
    # Index-vector pad: a gather whose index length is already
    # 1024-divisible skips XLA's pad_clamp fusion AND loses the S(1)
    # (VMEM) placement of the 13 MB index vector — HBM-resident indices
    # HALVE the gather rate (43.6 vs 22.5 ms measured).  +8 junk indices
    # force the pad fusion back; the junk rows are sliced off.
    idx = jnp.pad(base * 24 + sx._lehmer_code(*fr), (0, 8))
    g = jnp.take(flut, idx, axis=0)
    terms = flut.shape[1] // (4 * v)
    # keep the 8 junk rows through the einsum: slicing g would break the
    # s8-direct contraction fusion (a full f32[N,384] materialization +
    # transpose copy, ~25 ms/mode); the tail kernel's segment DMAs never
    # reach the trailing rows.
    lam = jnp.pad(lam, ((0, 8), (0, max(0, terms - 5))))
    ext = jnp.einsum(
        "nm,nmv->nv", lam,
        g.reshape(n_ext + 8, terms, 4 * v).astype(jnp.float32),
    )  # (n_ext + 8, 4v) f32
    offs = [(sy + my) * we + (sx_ + mx) for (sy, sx_), _ in geo]
    return ext, he, we, offs


def quad_flat(lut, img, *, mode, v, interval):
    """Rank y over ONE shared un-permuted table: the four per-rotation
    tables differ only by the baked output-lane permutation, so a single
    table serves every rotation (4x the gather locality, one table-side
    layout copy instead of four); the un-rotation becomes a static
    sublane read order in the tail kernel.  Returns a LIST of four
    per-rotation (N+8, v) f32 buffers in UN-permuted lane order, over
    h+1 rows (junk row = DMA alignment slack, see folded_flat)."""
    pad = mode_pad(mode) + 1
    h, w = img.shape[-2], img.shape[-1]
    hy = h + 1
    wy = -(-w // 128) * 128       # 128-aligned width (junk columns)
    cfg = [(0, 0)] * (img.ndim - 2) + [(pad, pad), (pad, pad + wy - w)]
    xp = jnp.pad(img, cfg, mode="edge")
    n = int(np.prod(img.shape[:-2])) * hy * wy
    outs = []
    terms = lut.shape[-1] // v          # rows may be tile-padded
    for r in range(4):
        planes = [
            xp[..., pad + dy: pad + dy + hy, pad + dx: pad + dx + wy]
            for dy, dx in rotated_taps(mode, r)
        ]
        base, fr = sx._base_and_fracs(planes, interval=interval)
        lam = sx.sorted_weights(*fr, interval=interval)
        idx = jnp.pad(base * 24 + sx._lehmer_code(*fr), (0, 8))
        g = jnp.take(lut, idx, axis=0)   # see folded_flat: S(1) idx
        lam = jnp.pad(lam, ((0, 8), (0, terms - 5)))
        o = jnp.einsum("nm,nmv->nv", lam,
                       g.reshape(n + 8, terms, v).astype(jnp.float32))
        outs.append(o)
    return outs, wy


# ---------------------------------------------------------------------------
# The tail kernel
# ---------------------------------------------------------------------------

def _tail_kernel(R, h, wp, wy, hes, wes, offs_s, hed, wed, offs_d, davg,
                 yperms,
                 s_hbm, d_hbm, y0_hbm, y1_hbm, y2_hbm, y3_hbm, out_hbm,
                 s_buf, d_buf, y_buf, obuf, sems):
    y_hbms = (y0_hbm, y1_hbm, y2_hbm, y3_hbm)
    bc = pl.program_id(0)
    yb = pl.program_id(1)
    nyb = pl.num_programs(1)
    step = bc * nyb + yb
    slot = jax.lax.rem(step, 2)
    Ls = s_buf.shape[2]
    Ld = d_buf.shape[2]
    Ly = y_buf.shape[3]

    def issue(st, sl):
        b = st // nyb
        y0_ = (st - b * nyb) * R
        pltpu.make_async_copy(
            s_hbm.at[:, pl.ds((b * hes + y0_) * wes, Ls)],
            s_buf.at[sl], sems.at[sl, 0]).start()
        pltpu.make_async_copy(
            d_hbm.at[:, pl.ds((b * hed + y0_) * wed, Ld)],
            d_buf.at[sl], sems.at[sl, 1]).start()
        for r in range(4):
            pltpu.make_async_copy(
                y_hbms[r].at[:, pl.ds((b * (h + 1) + y0_) * wy, Ly)],
                y_buf.at[sl, r], sems.at[sl, 2 + r]).start()

    @pl.when(step == 0)
    def _():
        issue(step, slot)

    @pl.when(step + 1 < pl.num_programs(0) * nyb)
    def _():
        issue(step + 1, jax.lax.rem(step + 1, 2))

    # wait for this step's copies (dummy copy objects with matching
    # shapes — wait() only decrements the semaphore by the byte count)
    pltpu.make_async_copy(
        s_hbm.at[:, pl.ds(0, Ls)], s_buf.at[slot], sems.at[slot, 0]).wait()
    pltpu.make_async_copy(
        d_hbm.at[:, pl.ds(0, Ld)], d_buf.at[slot], sems.at[slot, 1]).wait()
    for r in range(4):
        pltpu.make_async_copy(
            y0_hbm.at[:, pl.ds(0, Ly)], y_buf.at[slot, r],
            sems.at[slot, 2 + r]).wait()
    for yy in range(R):
        acc = None                                           # (16, wp)
        for r in range(4):
            # un-rotation = static sublane read order (the shared y table
            # carries no baked lane permutation)
            rows = [
                y_buf[slot, r, yperms[r][vv],
                      yy * wy: yy * wy + wp][None, :]
                for vv in range(16)
            ]
            piece = jnp.concatenate(rows, axis=0)
            acc = piece if acc is None else acc + piece
        for r, d_r in enumerate(offs_s):
            acc = acc + s_buf[slot, r * 16:(r + 1) * 16,
                              yy * wes + d_r: yy * wes + d_r + wp]
        for r, d_r in enumerate(offs_d):
            acc = acc + d_buf[slot, r * 16:(r + 1) * 16,
                              yy * wed + d_r: yy * wed + d_r + wp]
        # exact stage mix: clip(acc, 0, 255*davg), round-half-even(/davg)
        n = jnp.clip(acc, 0.0, 255.0 * davg)
        quo = jnp.floor(n / davg)
        rem = n - quo * davg
        odd = quo - 2.0 * jnp.floor(quo * 0.5)
        up = ((2.0 * rem > davg) |
              ((2.0 * rem == davg) & (odd == 1.0))).astype(jnp.float32)
        vi = (quo + up).astype(jnp.int32)                     # (16, w)
        packed = None
        for px in range(4):
            part = jnp.concatenate(
                [vi[4 * py + px: 4 * py + px + 1, :] for py in range(4)],
                axis=0,
            ) << (8 * px)                                     # (4, w)
            packed = part if packed is None else packed | part
        obuf[yy, :, :] = packed.astype(jnp.uint32)
    cpo = pltpu.make_async_copy(
        obuf, out_hbm.at[pl.ds(bc * h + yb * R, R)], sems.at[slot, 6])
    cpo.start()
    cpo.wait()


def tail_assemble(ext_s, hes, wes, offs_s, ext_d, hed, wed, offs_d, y_list,
                  wy, yperms, *, lead, h, w, scale, davg, interpret=False):
    """(flat mode buffers) -> (B..., h*scale, w*scale) uint8."""
    bc = int(np.prod(lead))
    v = scale * scale
    # R: largest divisor of h not exceeding 8 (small R keeps the kernel's
    # VMEM scratch out of the gather unit's scoped-memory budget)
    R = max(r for r in range(1, 9) if h % r == 0)
    mys, mxs = hes - h - 1, wes - w   # he carries one junk row
    myd, mxd = hed - h - 1, wed - w
    pad128 = lambda n: -(-n // 128) * 128  # noqa: E731
    # rows y0 .. y0+R-1+my contribute; last row's max lane is
    # (R-1+my)*we + w + mx - 1; the junk row provides >= we lanes of
    # slack, covering the 128-alignment round-up (requires w >= 126).
    wp = pad128(w)   # output rows are computed/stored at padded width;
    # the host view crops the junk columns for free
    Ls = pad128((R - 1 + mys) * wes + wp + mxs)
    Ld = pad128((R - 1 + myd) * wed + wp + mxd)
    Ly = pad128((R - 1) * wy + wp)
    st = ext_s.T    # (4v, n_s) — bitcast of XLA's {0,1} einsum layout
    dt = ext_d.T
    yts = [y.T for y in y_list]    # 4 x (v, N)
    kern = functools.partial(
        _tail_kernel, R, h, wp, wy, hes, wes, offs_s, hed, wed, offs_d,
        float(davg), tuple(tuple(int(x) for x in p_) for p_ in yperms))
    blocks_per_bc = h // R
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bc * h, scale, wp), jnp.uint32),
        grid=(bc, blocks_per_bc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 4 * v, Ls), jnp.float32),
            pltpu.VMEM((2, 4 * v, Ld), jnp.float32),
            pltpu.VMEM((2, 4, v, Ly), jnp.float32),
            pltpu.VMEM((R, scale, wp), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, 7)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            # cap the kernel's VMEM reservation: the pallas default budget
            # halves XLA's scoped-VMEM grants to the gather fusions
            # program-wide (gathers drop from 256- to 128-row staging)
            vmem_limit_bytes=6 * 1024 * 1024,
        ),
        interpret=interpret,
    )(st, dt, *yts)
    # Return the packed u32 (bch, py, x) as the PROGRAM output: program
    # outputs live in HBM (an XLA-side bitcast lowered as a broadcast and
    # re-placed the kernel output in VMEM, starving the gather unit's
    # scoped staging).  The host views the bytes for free:
    # np.asarray(out).view(np.uint8).reshape(B, C, h*scale, w*scale).
    return out


def cascade_tail_kernel(tabs, img, *, stages, modes, scale, interval,
                        interpret=False):
    """lut_cascade_int with the stage-2 tail in Pallas (sdy rank tables)."""
    q = 2 ** interval
    x = img.astype(jnp.int32)
    # stage 1: unchanged XLA path
    for s in range(stages - 1):
        acc = None
        for mode in modes:
            out = ens.rotation_ensemble_lanes_folded_int(
                tabs[f"s{s + 1}_{mode}"], x, mode=mode, upscale=1,
                interval=interval, fused=True, rank=False,
            ) if fold_geometry(mode) is not None else \
                ens.rotation_ensemble_lanes_quad_int(
                    tabs[f"s{s + 1}_{mode}"], x, mode=mode, upscale=1,
                    interval=interval, fused=True, rank=False,
                )
            acc = out if acc is None else acc + out
        mixed = stage_mix(acc, q=q, avg_factor=len(modes) * 4, bias=127)
        x = mixed[..., 0]
    # stage 2: flat producers + pallas tail
    v = scale * scale
    ext_s, hes, wes, offs_s = folded_flat(
        tabs["s2_s"], x, mode="s", v=v, interval=interval)
    ext_d, hed, wed, offs_d = folded_flat(
        tabs["s2_d"], x, mode="d", v=v, interval=interval)
    y_list, wy = quad_flat(tabs["s2_y"], x, mode="y", v=v, interval=interval)
    from mulut_tpu.ops.taps import lane_rotation_perm

    yperms = [lane_rotation_perm(scale, r) for r in range(4)]
    lead = x.shape[:-2]
    return tail_assemble(
        ext_s, hes, wes, offs_s, ext_d, hed, wed, offs_d, y_list, wy,
        yperms, lead=lead, h=x.shape[-2], w=x.shape[-1], scale=scale,
        davg=q * len(modes), interpret=interpret,
    )


if __name__ == "__main__":
    scale, stages, modes, interval = 4, 2, "sdy", 4
    rng = np.random.default_rng(0)
    luts = {}
    for s in range(stages):
        v = scale * scale if s + 1 == stages else 1
        for m in modes:
            luts[f"s{s + 1}_{m}"] = np.load(
                "/root/reference/models/sr_x2sdy/"
                f"LUT_ft_x{scale}_{interval}bit_int8_s{s + 1}_{m}.npy"
            ).reshape(-1, v).astype(np.int8)
    tabs = prepare_expanded_luts_cached(luts, interval=interval)

    def unpack(u32_out, shape):
        """Host-side byte view + crop: (bch, 4, wp) u32 -> image uint8."""
        b, c, h, w = shape
        wp = u32_out.shape[-1]
        out = np.asarray(u32_out).view(np.uint8).reshape(
            b, c, h * 4, wp * 4
        )
        return np.ascontiguousarray(out[..., : w * 4])

    chk = jnp.asarray(rng.integers(0, 256, (1, 40, 192), dtype=np.int64),
                      jnp.int32)
    if INTERPRET:
        jax.config.update("jax_platforms", "cpu")
        want = np.asarray(lut_cascade_int(
            tabs, chk, stages=2, modes=modes, scale=scale,
            interval=interval, expanded=True))
        from mulut_tpu.ops import simplex_tables as stab

        tabs2 = dict(tabs)
        tabs2["s2_y"] = stab.rank_expand_rotations(
            luts["s2_y"], None, interval)[0]
        got = unpack(cascade_tail_kernel(
            tabs2, chk, stages=2, modes=modes, scale=scale,
            interval=interval, interpret=True), (1, 1, 40, 192)
        )[0].astype(np.int32)
        print("MATCH" if np.array_equal(got, want) else "MISMATCH!!")
        if not np.array_equal(got, want):
            bad = np.argwhere(got != want)
            print(bad[:5], got[tuple(bad[0])], want[tuple(bad[0])])
        sys.exit(0)

    # chip: bit-check + timing
    H, W, B = 270, 480, 8
    img = jnp.asarray(rng.integers(0, 256, (B, 3, H, W), dtype=np.int64),
                      jnp.int32)

    run = jax.jit(functools.partial(
        cascade_tail_kernel, stages=2, modes=modes, scale=scale,
        interval=interval))
    want = np.asarray(jax.jit(functools.partial(
        lut_cascade_int, stages=2, modes=modes, scale=scale,
        interval=interval, expanded=True))(jax.device_put(tabs), chk))
    from mulut_tpu.ops import simplex_tables as stab

    tabs["s2_y"] = stab.rank_expand_rotations(
        luts["s2_y"], None, interval
    )[0]  # all four rotation blocks are identical without lane perms
    dtabs = jax.device_put(tabs)
    t0 = time.perf_counter()
    got = unpack(run(dtabs, chk), (1, 1, 40, 192))[0].astype(np.int32)
    print(f"compile {time.perf_counter()-t0:.0f}s",
          "MATCH" if np.array_equal(got, want) else "MISMATCH!!", flush=True)
    dt = device_time(lambda: run(dtabs, img), n=3)
    print(f"[tail] {dt*1e3:.1f} ms/batch = {B*H*W*16/1e6/dt:.1f} MPix/s")
    for B2 in (16, 24):
        img2 = jnp.asarray(
            rng.integers(0, 256, (B2, 3, H, W), dtype=np.int64), jnp.int32)
        try:
            np.asarray(run(dtabs, img2)[0, 0, :2])
            dt2 = device_time(lambda: run(dtabs, img2), n=2)
            print(f"[tail B={B2}] {dt2*1e3:.1f} ms = "
                  f"{B2*H*W*16/1e6/dt2:.1f} MPix/s", flush=True)
        except Exception as e:
            print(f"[tail B={B2}] failed: {type(e).__name__}", flush=True)
        del img2

    import jax.profiler
    TRACE = "/tmp/r3_trace_tail"
    jax.profiler.start_trace(TRACE)
    for _ in range(3):
        out = run(dtabs, img)
    np.asarray(out[0, 0, :4])
    jax.profiler.stop_trace()
    from mulut_tpu.utils.profiling import op_breakdown
    rows = op_breakdown(TRACE, top=25)
    tot = sum(ms for ms, _, _ in rows)
    print(f"traced {tot/3:.1f} ms/run")
    for ms, name, long_name in rows:
        print(f"{ms/3:8.2f} ms  {name}  | {long_name[:110]}")
