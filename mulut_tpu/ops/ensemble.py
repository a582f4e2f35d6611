"""Rotation ensemble + multi-stage LUT cascade with exact integer rounding.

The reference accumulates the four rotations and all sampling modes in
float64 and rounds with NumPy banker's rounding (ref: sr/4_test_lut.py:279-306).
Every intermediate quantity is a multiple of 1/q, so the whole cascade can be
carried in int32 and the stage mix becomes one exact rational
round-half-to-even — bit-identical to the reference and far friendlier to TPU
vector units than float64.

The rotation ensemble itself is fused into *tap-offset space*: instead of
rot90-ing the image, padding, interpolating and rot90-ing the output back
(which at 1080p materializes GBs of transposed int32 intermediates on TPU),
each rotation r reads the SAME all-sides-padded image through rotated tap
offsets (`taps.rotated_taps`) and permutes the unit's upscale**2 output
lanes (`taps.lane_rotation_perm`).  All 4 rotations x all modes accumulate
into one (..., h, w, v) lane buffer; the spatial interleave to
(..., h*up, w*up) happens exactly once per stage.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import simplex_tables
from .simplex import (
    _interleave,
    simplex_planes_expanded_int,
    simplex_planes_folded_int,
    simplex_planes_int,
    simplex_planes_quad_int,
    simplex_planes_rank_folded_int,
    simplex_planes_rank_quad_int,
)
from .taps import (
    TAPS,
    fold_geometry,
    lane_rotation_perm,
    mode_pad,
    mode_taps,
    rotated_taps,
)


def round_half_even_div(n, d: int):
    """round_half_to_even(n / d) for non-negative integer n, static int d."""
    quo = n // d
    rem = n - quo * d
    twice = 2 * rem
    round_up = (twice > d) | ((twice == d) & (quo % 2 == 1))
    return quo + round_up.astype(n.dtype)


def stage_mix(acc, *, q: int, avg_factor: int, bias: int):
    """clip(acc/(q*avg) + bias, 0, 255) with exact half-even rounding.

    `acc` is the integer rotation/mode accumulator (q times the reference's
    float `pred`).  Matches ref: sr/4_test_lut.py:300-302.
    """
    d = q * avg_factor
    n = jnp.clip(acc + bias * d, 0, 255 * d)
    return round_half_even_div(n, d)


def _pad_all(img, pad: int):
    cfg = [(0, 0)] * (img.ndim - 2) + [(pad, pad), (pad, pad)]
    return jnp.pad(img, cfg, mode="edge")


def rotation_ensemble_lanes_int(lut, img, *, mode: str, upscale: int,
                                interval: int, expanded: bool = False):
    """Sum over 4 rotations in fused tap-offset form.

    Args:
      lut: (L**4, v) int32 table, or — with expanded=True — a
        (L**4, 16 * v) int8 corner-expanded table (see
        `simplex_tables.expand_lut`), which cuts the per-pixel gather count
        from 5 rows to 1.
      img: (..., H, W) int32, unpadded.

    Returns:
      (..., H, W, upscale**2) int32 lane accumulator (q x reference float),
      lanes already un-rotated — interleave once to get pixels.
    """
    pad = mode_pad(mode)
    xp = _pad_all(img, pad)
    h = img.shape[-2]
    w = img.shape[-1]
    acc = None
    for r in range(4):
        planes = [
            xp[..., pad + dy : pad + dy + h, pad + dx : pad + dx + w]
            for dy, dx in rotated_taps(mode, r)
        ]
        if expanded:
            # Per-rotation table copies carry the un-rotation lane perm
            # pre-applied (see prepare_expanded_luts) — no runtime shuffle.
            table = lut[r] if lut.ndim == 3 else lut
            out = simplex_planes_expanded_int(
                table, planes, v=upscale * upscale, interval=interval
            )
        else:
            out = simplex_planes_int(lut, planes, interval=interval)
            if upscale > 1 and r:
                out = out[..., lane_rotation_perm(upscale, r)]
        acc = out if acc is None else acc + out
    return acc


def rotation_ensemble_lanes_quad_int(lut, img, *, mode: str, upscale: int,
                                     interval: int, fused: bool = True,
                                     rank: bool = False):
    """4-rotation ensemble of a non-symmetric mode, rotation-summed.

    Same semantics as `rotation_ensemble_lanes_int(expanded=True)` for y/h/o
    tables.  With rank=True, `lut` is the (4, L**4 * 24, 5 * v)
    rank-expanded form from `simplex_tables.rank_expand_rotations`
    (5-corner rows); with fused=True (default) the per-rotation
    contractions accumulate into one FLAT (N, v) buffer, avoiding the
    6-D spatial relayout of the unfused path.
    """
    pad = mode_pad(mode)
    xp = _pad_all(img, pad)
    h = img.shape[-2]
    w = img.shape[-1]
    planes4 = [
        [
            xp[..., pad + dy : pad + dy + h, pad + dx : pad + dx + w]
            for dy, dx in rotated_taps(mode, r)
        ]
        for r in range(4)
    ]
    luts4 = lut if lut.ndim == 3 else [lut] * 4
    v = upscale * upscale
    if fused and v > 1:  # v == 1 output is gather-floor-bound already
        from .simplex import (
            _base_and_fracs,
            _lehmer_code,
            corner_lams,
            sorted_weights,
        )

        lead = planes4[0][0].shape
        n = int(np.prod(lead))
        terms = 5 if rank else 16
        # Per-rotation einsums, NOT one concatenated contraction: the
        # concat buffer tempts XLA into materializing a full-width s32/f32
        # copy of all four gathers at once (observed 12 GB HLO temp ->
        # OOM at full-cascade scope).  Separate einsums fuse each int8
        # gather straight into its contraction; the rotation sum stays in
        # f32 (integer-valued, < 2**24 — exact) with one final convert.
        out = None
        for r in range(4):
            base, fr = _base_and_fracs(planes4[r], interval=interval)
            if rank:
                lam = sorted_weights(*fr, interval=interval)
                g = jnp.take(
                    luts4[r],
                    _lehmer_code(*fr) * (luts4[r].shape[0] // 24) + base,
                    axis=0, mode="clip",
                )
            else:
                lam = corner_lams(*fr, interval=interval)
                g = jnp.take(luts4[r], base, axis=0, mode="clip")
            o = jnp.einsum(
                "nm,nmv->nv", lam,
                g.reshape(n, terms, v).astype(jnp.float32),
            )
            out = o if out is None else out + o
        return out.astype(jnp.int32).reshape(*lead, v)
    if rank:
        return simplex_planes_rank_quad_int(
            luts4, planes4, v=v, interval=interval
        )
    return simplex_planes_quad_int(
        luts4, planes4, v=v, interval=interval
    )


def rotation_ensemble_lanes_folded_int(flut, img, *, mode: str, upscale: int,
                                       interval: int, fused: bool = True,
                                       rank: bool = False):
    """All 4 rotations of a symmetric-pattern mode in ONE gather per pixel.

    Requires `taps.fold_geometry(mode)` (s, d, e) and a rotation-folded
    table from `simplex_tables.fold_lut` — or, with rank=True, the
    rank-expanded (L**4 * 24, >= 5*4*v tile-padded) form from
    `simplex_tables.rank_fold_lut` (5-corner rows, 3.2x fewer bytes).
    Each rotation reads the shared 4-pixel window at a static shift, so
    the folded interpolation runs once over a slightly EXTENDED plane (all
    window origins any rotation needs) and the per-rotation outputs are
    summed through static un-shift slices.  Bit-identical to
    `rotation_ensemble_lanes_int` (tested), 4x fewer gathers and 4x fewer
    per-pixel weight computations.
    """
    geo = fold_geometry(mode)
    pad = mode_pad(mode)
    xp = _pad_all(img, pad)
    h = img.shape[-2]
    w = img.shape[-1]
    my = -min(s[0] for s, _ in geo)
    mx = -min(s[1] for s, _ in geo)
    he, we = h + my, w + mx
    planes = [
        xp[..., pad - my + dy : pad - my + dy + he,
           pad - mx + dx : pad - mx + dx + we]
        for dy, dx in mode_taps(mode)
    ]
    v = upscale * upscale
    if fused and v > 1:  # v == 1 output is gather-floor-bound already
        # Fused FLAT path: run the contraction on the flat (N, 4v) view
        # and turn the rotation un-shifts into 1-D shifted-slice adds
        # (flat offset d_r = oy*we + ox).  This sidesteps the
        # (..., he, we, 4, v) relayout XLA inserts for 6-D spatial slicing
        # — a 64-step lane-loop transpose worth ~21 ms per 1080p
        # stage-mode on a v5e.  Rows whose shift crosses a plane boundary
        # correspond to cropped (x >= w or y >= h) outputs, so the
        # wrapped values are never used.
        from .simplex import (
            _base_and_fracs,
            _lehmer_code,
            corner_lams,
            sorted_weights,
        )

        lead = planes[0].shape
        n_ext = int(np.prod(lead))
        dmax = my * we + mx
        base, fr = _base_and_fracs(planes, interval=interval)
        if rank:
            lam = sorted_weights(*fr, interval=interval)
            g = jnp.take(
                flut, _lehmer_code(*fr) * (flut.shape[0] // 24) + base,
                axis=0, mode="clip",
            )
            terms = flut.shape[1] // (4 * v)  # >= 5: rows tile-padded
            if terms > 5:
                lam = jnp.pad(lam, ((0, 0), (0, terms - 5)))
        else:
            lam = corner_lams(*fr, interval=interval)
            g = jnp.take(flut, base, axis=0, mode="clip")
            terms = 16
        ext = jnp.einsum(
            "nm,nmv->nv", lam,
            g.reshape(n_ext, terms, 4 * v).astype(jnp.float32),
        ).astype(jnp.int32)                                # (n_ext, 4v)
        m_rows = n_ext - dmax
        acc = None
        for r, ((sy, sx), _) in enumerate(geo):
            d = (sy + my) * we + (sx + mx)
            piece = ext[d : d + m_rows, r * v : (r + 1) * v]
            acc = piece if acc is None else acc + piece
        acc = jnp.pad(acc, ((0, n_ext - m_rows), (0, 0)))
        return acc.reshape(*lead, v)[..., :h, :w, :]
    if rank:
        ext = simplex_planes_rank_folded_int(
            flut, planes, v=v, interval=interval
        )
    else:
        ext = simplex_planes_folded_int(
            flut, planes, v=v, interval=interval
        )
    acc = None
    for r, ((sy, sx), _) in enumerate(geo):
        oy, ox = sy + my, sx + mx
        piece = ext[..., oy : oy + h, ox : ox + w, r, :]
        acc = piece if acc is None else acc + piece
    return acc


def prepare_expanded_luts_cached(luts: dict, *, interval: int = 4,
                                 rank: bool = True,
                                 shared_quad: bool = False,
                                 corner16_modes: str = "",
                                 fold16_modes: str = "",
                                 k128_stage1: str = "",
                                 int8_stage1: str = "",
                                 cache_dir: str | None = None) -> dict:
    """`prepare_expanded_luts` with a host-side disk cache.

    Building the rank-expanded tables costs minutes of host time (three
    641 MB fancy-index passes on this class of machine) per evaluator
    construction; the result is a pure function of the int8 tables, so it
    caches to one .npz keyed by a hash of (tables, interval, rank).
    Cache location: `cache_dir`, else $MULUT_CACHE_DIR, else
    `<default_cache_root()>/tables` (repo .cache/ in a source checkout —
    durable across the container restarts that wipe /tmp; entries that
    survive in the legacy /tmp location are adopted by hard link).
    Never writes next to the source LUTs (which may live in a read-only
    reference tree).

    Entries can reach multiple GB (rank tables are ~770 MB per wide
    stage-mode), so after each write the directory is pruned
    oldest-access-first down to $MULUT_CACHE_GB (default 24) — LUT sweeps
    no longer accumulate unbounded disk.
    """
    import hashlib
    import os

    if cache_dir is None:
        cache_dir = os.environ.get("MULUT_CACHE_DIR")
    if cache_dir is None:
        from ..utils.xla_opts import default_cache_root

        cache_dir = os.path.join(default_cache_root(), "tables")
    h = hashlib.sha256()
    # shared_quad extends the key only when set so pre-existing cache
    # entries for the default layout stay valid.
    # v3: rank tables switched to rank-major row order
    tag = (f"v3:{interval}:{rank}" + (":sq" if shared_quad else "")
           + (f":c16={corner16_modes}" if corner16_modes else "")
           + (f":f16={fold16_modes}" if fold16_modes else "")
           + (f":k1={k128_stage1}" if k128_stage1 else "")
           + (f":s18={int8_stage1}" if int8_stage1 else ""))
    h.update(tag.encode())
    for key in sorted(luts):
        arr = np.ascontiguousarray(np.asarray(luts[key], np.int8))
        h.update(key.encode())
        h.update(str(arr.shape).encode())
        h.update(arr.tobytes())
    fname = f"expanded_{h.hexdigest()[:24]}.npz"
    path = os.path.join(cache_dir, fname)
    if not os.path.exists(path):
        # Legacy location (rounds 1-3 cached to volatile /tmp): adopt a
        # surviving entry into the durable dir via hard link/copy rather
        # than paying the minutes-long rebuild.
        legacy = os.path.join("/tmp/mulut_tpu_cache", fname)
        if os.path.exists(legacy):
            try:
                os.makedirs(cache_dir, exist_ok=True)
                try:
                    os.link(legacy, path)
                except OSError:
                    import shutil

                    shutil.copy(legacy, path + f".tmp{os.getpid()}")
                    os.replace(path + f".tmp{os.getpid()}", path)
            except OSError:
                path = legacy  # adoptions are best-effort; read in place
    if os.path.exists(path):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    out = prepare_expanded_luts(
        luts, interval=interval, rank=rank, shared_quad=shared_quad,
        corner16_modes=corner16_modes, fold16_modes=fold16_modes,
        k128_stage1=k128_stage1, int8_stage1=int8_stage1,
    )
    os.makedirs(cache_dir, exist_ok=True)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:  # file handle: savez won't append ".npz"
        np.savez(f, **{k: np.asarray(v) for k, v in out.items()})
    os.replace(tmp, path)  # atomic: concurrent builders race benignly
    _prune_cache_dir(cache_dir, keep=path)
    return out


def prepare_expanded_luts_auto(luts: dict, *, interval: int = 4,
                               rank: bool = True,
                               shared_quad: bool = False,
                               corner16_modes: str = "",
                               fold16_modes: str = "",
                               k128_stage1: str = "",
                               int8_stage1: str = "") -> dict:
    """Pick the fastest table-construction route for the current backend.

    On an accelerator backend the tables are built ON DEVICE from the
    small source LUTs (`prepare_expanded_luts(device=True)`): a ~4 MB
    upload + on-chip gathers instead of a 200+ MB host->device transfer
    (measured ~5 min through a degraded remote-device tunnel) or a
    minutes-long host build.  On CPU backends the host build with its
    disk cache is used (CI determinism + no duplicate work across
    processes).  MULUT_DEVICE_TABLES=0 forces the host path.
    """
    import os

    import jax

    if (os.environ.get("MULUT_DEVICE_TABLES", "1") != "0"
            and jax.default_backend() != "cpu"):
        return prepare_expanded_luts(
            luts, interval=interval, rank=rank, shared_quad=shared_quad,
            corner16_modes=corner16_modes, fold16_modes=fold16_modes,
            k128_stage1=k128_stage1, int8_stage1=int8_stage1, device=True)
    return prepare_expanded_luts_cached(
        luts, interval=interval, rank=rank, shared_quad=shared_quad,
        corner16_modes=corner16_modes, fold16_modes=fold16_modes,
        k128_stage1=k128_stage1, int8_stage1=int8_stage1)


def _prune_cache_dir(cache_dir: str, *, keep: str,
                     max_bytes: int | None = None) -> None:
    """Evict oldest-accessed cache entries beyond the size cap."""
    import os

    if max_bytes is None:
        max_bytes = int(
            float(os.environ.get("MULUT_CACHE_GB", "24")) * 1e9
        )
    try:
        entries = [
            os.path.join(cache_dir, f)
            for f in os.listdir(cache_dir)
            if f.startswith("expanded_") and f.endswith(".npz")
        ]
        stats = []
        for p in entries:
            st = os.stat(p)
            stats.append((st.st_atime, st.st_size, p))
        total = sum(s for _, s, _ in stats)
        for _, size, p in sorted(stats):
            if total <= max_bytes:
                break
            if os.path.abspath(p) == os.path.abspath(keep):
                continue
            os.remove(p)
            total -= size
    except OSError:
        pass  # cache hygiene is best-effort; never fail the build


def prepare_expanded_luts(luts: dict, *, interval: int = 4,
                          rank: bool = True,
                          shared_quad: bool = False,
                          corner16_modes: str = "",
                          fold16_modes: str = "",
                          k128_stage1: str = "",
                          int8_stage1: str = "",
                          device: bool = False) -> dict:
    """Host-side: corner-expanded device tables, rotation-folded when legal.

    Per "s{stage}_{mode}" key:

      * 90-degree-symmetric modes (s, d, e), v > 1: rank-expanded
        rotation-folded rows (`simplex_tables.rank_fold_lut`) of shape
        (L**4 * 24, 5*4*v tile-padded) int8 — row `lehmer(rank)*L**4 + base` holds
        exactly the 5 simplex-chain corners of all 4 rotations, with the
        output-lane un-rotation pre-applied per rotation block.  One
        gather + 5 FMAs serve the whole rotation ensemble.
      * symmetric modes, v == 1: rotation-FOLDED 16-corner rows
        (`simplex_tables.fold_lut`), (L**4, 64) int8 — these gathers are
        row-floor-bound, so the 24x row expansion buys nothing.
      * non-symmetric modes (y, h, o), v > 1: (4, L**4 * 24, 5*v) int8
        rank-expanded per-rotation tables (each rotation gathers with its
        own base and rank code).
      * non-symmetric modes, v == 1: (L**4, 16) widened to int32 —
        unless listed in `int8_stage1`, which keeps the rows int8.
        The r1 rule was that 16-BYTE rows gather ~15x slower than
        64-byte rows (sub-tile rows defeat the gather unit on
        HBM-resident tables); the r3 in-context re-measurement shows
        the 1.3 MB int8 table gets VMEM-staged like the s32 one and
        the 4x smaller gathered buffers shave the downstream
        {1,0}->{0,1} layout copies (~2.6 ms per 8x1080p batch, so
        int8_stage1="y" is the TPU default in the evaluator/bench).
      * modes listed in k128_stage1 re-lay their v == 1 format as
        (L**4, 128) int8
        with corner m's values in lane group [m*8, m*8+8) (rotations
        0..3 for folded modes, lane m*8 only for non-symmetric ones,
        zeros elsewhere) — the layout the group-fold Pallas contraction
        kernel's 128-lane tree reduction consumes directly
        (`tail_kernel.fold_contract`, C=16, u=8).  This trades 2x
        gathered bytes (gathers at these widths are row-latency-bound,
        not byte-bound) for deleting the XLA contraction glue: the
        {1,0}->{0,1} layout copies, s8->f32 convert materializations and
        multiply_reduce passes cost ~26 ms per 8x1080p batch (r3 trace).

    rank=False falls back to the 16-corner formats everywhere (e.g. to
    bound table memory at small intervals: rank tables cost 24/16 * 5/16
    the rows x widths — ~640 MB per stage-2 mode at interval=4).

    With `device=False` (default) returns HOST (NumPy) arrays — callers
    `jax.device_put` them (or pass them to the jitted cascade as
    arguments).  `device=True` builds the tables ON the accelerator from
    the small source LUTs (every format is a pure gather/permutation —
    `simplex_tables.*_device` twins, byte-identical): behind a
    remote-device tunnel this replaces a 200+ MB host->device table
    upload (measured ~5 min when the tunnel is degraded) with a ~4 MB
    one, and it is also the fast path for evaluator startup on real
    hardware.

    Feed the result to `lut_cascade_int(..., expanded=True)`.
    """
    if device:
        import jax.numpy as jnp

        xp = jnp
        _expand = simplex_tables.expand_lut_device
        _fold = simplex_tables.fold_lut_device
        _rank_fold = simplex_tables.rank_fold_lut_device
        _rank_shared = simplex_tables.rank_expand_shared_device
        _rank_rot = simplex_tables.rank_expand_rotations_device

        def _src(a):
            return jnp.asarray(np.asarray(a).astype(np.int8))
    else:
        xp = np
        _expand = simplex_tables.expand_lut
        _fold = simplex_tables.fold_lut
        _rank_fold = simplex_tables.rank_fold_lut
        _rank_shared = simplex_tables.rank_expand_shared
        _rank_rot = simplex_tables.rank_expand_rotations

        def _src(a):
            return np.asarray(a).astype(np.int8)

    L = 2 ** (8 - interval) + 1
    out = {}
    for key, lut in luts.items():
        arr = np.asarray(lut)
        # Keys follow the reference's "s{stage}_{mode}" naming
        # (ref: sr/4_test_lut.py:323-333); anything else (ad-hoc tables that
        # may be evaluated under several modes) gets the generic
        # per-rotation format, which is valid for every mode.
        mode = key.rsplit("_", 1)[-1]
        geo = fold_geometry(mode) if mode in TAPS else None
        v = arr.shape[1] if arr.ndim == 2 else 1
        up = int(round(v ** 0.5))
        # Rank expansion is a byte-bound-gather optimization; only the
        # wide (v > 1) tables are byte-bound, and at interval < 4 the 24x
        # row blowup stops fitting HBM comfortably (L=33 -> 28.5M rows).
        use_rank = (rank and v > 1 and L <= 17
                    and mode not in fold16_modes)

        # One function per table so the device path compiles ONE XLA
        # program per table (eager per-op dispatch costs dozens of tiny
        # remote compiles on a cold start).
        def build_one(a8, *, geo=geo, v=v, up=up, use_rank=use_rank,
                      mode=mode):
            # fold16_modes: symmetric modes listed there keep the
            # rotation fold but drop the 24x rank expansion — plain
            # 16-corner folded rows (`fold_lut`, (L**4, 64*v) = 85.5 MB
            # at interval 4 / v 16, 9x smaller than the rank table).
            # Gathered bytes rise 16/5x, but the small table's locality
            # + the group-fold kernel's 128-lane tree reduction make the
            # 16-corner contraction cheap.
            if shared_quad and v > 1 and mode in corner16_modes:
                # Shared un-permuted 16-corner rows: (L**4, 16*v) s8 —
                # only 21.4 MB at interval 4 / v 16; consumed by the
                # tail kernel's quad path (which applies the lane
                # un-rotation itself).  Format is shape-detected
                # downstream.
                e = _expand(a8, interval)
                return e.reshape(e.shape[0], 16 * v)
            if v == 1 and mode in k128_stage1:
                # 128-lane kernel layout (see docstring): corner-major
                # groups of 8 lanes so `fold_contract(C=16, u=8)`'s tree
                # fold runs in full-128-lane space with zero relayouts.
                if geo is not None:
                    f = _fold(a8, geo, None, interval).reshape(-1, 16, 4)
                else:
                    f = _expand(a8, interval)
                    f = f.reshape(f.shape[0], 16, 1)
                k = xp.pad(f, ((0, 0), (0, 0), (0, 8 - f.shape[2])))
                return k.reshape(-1, 128)
            if geo is not None:
                perms = (
                    [lane_rotation_perm(up, r) for r in range(4)]
                    if v > 1 else None
                )
                build = _rank_fold if use_rank else _fold
                return build(a8, geo, perms, interval)
            if use_rank:
                if shared_quad:
                    # One un-permuted table serves all 4 rotations when
                    # the consumer (the Pallas tail kernel) applies the
                    # lane un-rotation itself — 4x gather locality, 1/4
                    # the HBM.
                    return _rank_shared(a8, interval)
                perms = [lane_rotation_perm(up, r) for r in range(4)]
                return _rank_rot(a8, perms, interval)
            e = _expand(a8, interval)
            if v == 1:
                dt = np.int8 if mode in int8_stage1 else np.int32
                return e.reshape(e.shape[0], 16).astype(dt)
            copies = [
                e[:, :, lane_rotation_perm(up, r)].reshape(e.shape[0], -1)
                for r in range(4)
            ]
            return xp.stack(copies)

        if device:
            import jax

            out[key] = jax.jit(build_one)(_src(arr))
        else:
            out[key] = build_one(_src(arr))
    return out


def rotation_ensemble_int(lut, img, *, mode: str, upscale: int, interval: int):
    """Sum of the 4 rotated simplex-interp passes, spatially interleaved.

    Equivalent to the reference's rot90 -> pad -> interp -> rot90-back loop
    (ref: sr/4_test_lut.py:293-298), computed without rotating any image.
    """
    acc = rotation_ensemble_lanes_int(
        lut, img, mode=mode, upscale=upscale, interval=interval
    )
    return _interleave(acc, upscale)


def clamp_pad_region(img, valid_hw):
    """Overwrite rows/cols beyond (h, w) with edge replicas of the valid
    region.

    `img` is (..., Hb, Wb) with static bucket dims; `valid_hw = (h, w)` may
    be traced scalars — or (B,) vectors for a batch of differently-sized
    images sharing one bucket buffer (leading img dim = B).  Equivalent to
    cropping each image to its (h, w) and edge-padding back to (Hb, Wb),
    but with static shapes — the key to compiling the cascade ONCE per
    bucket and serving every image size below it.
    """
    h, w = valid_hw
    Hb, Wb = img.shape[-2], img.shape[-1]
    h = jnp.asarray(h)
    if h.ndim == 0:
        rows = jnp.minimum(jnp.arange(Hb), h - 1)
        cols = jnp.minimum(jnp.arange(Wb), w - 1)
        return jnp.take(jnp.take(img, rows, axis=-2), cols, axis=-1)
    # Per-image sizes: broadcast (B,) against the leading batch dim and
    # gather along each spatial axis with take_along_axis.
    b = h.shape[0]
    lead = (b,) + (1,) * (img.ndim - 3)
    rows = jnp.minimum(
        jnp.arange(Hb), (h - 1).reshape(lead + (1,))
    )[..., None]                                   # (B, ..1.., Hb, 1)
    cols = jnp.minimum(
        jnp.arange(Wb), (jnp.asarray(w) - 1).reshape(lead + (1,))
    )[..., None, :]                                # (B, ..1.., 1, Wb)
    img = jnp.take_along_axis(
        img, jnp.broadcast_to(rows, img.shape[:-1] + (1,)), axis=-2
    )
    return jnp.take_along_axis(
        img, jnp.broadcast_to(cols, img.shape[:-2] + (1, Wb)), axis=-1
    )


def lut_cascade_int(
    luts: dict,
    img,
    *,
    stages: int,
    modes: str,
    scale: int,
    interval: int = 4,
    expanded: bool = False,
    fused: bool = True,
    valid_hw=None,
):
    """Full multi-stage x multi-mode x rotation-ensemble LUT cascade.

    Args:
      luts: {"s{stage}_{mode}": (L**4, v) int32} with v = scale**2 for the
        last stage and 1 otherwise (ref: sr/4_test_lut.py:323-333); with
        expanded=True, the corner-expanded int8 tables from
        `prepare_expanded_luts` instead.
      img: (..., H, W) int32 in [0, 255]; channels (if any) ride the leading
        batch dims — the cascade is channel-agnostic.
      fused: route wide (v > 1) stages through the fused FLAT contraction
        paths (rotation un-shifts as 1-D shifted-slice adds; rotation sum
        inside one einsum for non-symmetric modes) — bit-identical, and
        avoids a ~21 ms/stage-mode 6-D relayout XLA otherwise inserts at
        1080p.  Pure XLA (no Pallas); default on.
      valid_hw: optional (h, w) traced scalars for bucketed evaluation: the
        image occupies the top-left (h, w) of the static (H, W) buffer, the
        rest is don't-care.  The pad region is re-synchronized to edge
        replicas of the valid region before every stage, which keeps the
        valid part of the output bit-identical to an unbucketed run (the
        caller crops to (h*scale, w*scale)).

    Returns:
      (..., H*scale, W*scale) int32 in [0, 255], bit-identical to the
      reference NumPy engine (ref: sr/4_test_lut.py:263-306).
    """
    q = 2 ** interval
    x = img.astype(jnp.int32)
    for s in range(stages):
        if valid_hw is not None:
            x = clamp_pad_region(x, valid_hw)
        last = s + 1 == stages
        upscale = scale if last else 1
        avg_factor = len(modes) if last else len(modes) * 4
        bias = 0 if last else 127
        acc = None
        L4 = (2 ** (8 - interval) + 1) ** 4
        v = upscale * upscale
        for mode in modes:
            lut = luts[f"s{s + 1}_{mode}"]
            # Table format is recognized by shape (see prepare_expanded_luts):
            # rank-expanded tables have 24x the base rows.
            rows = lut.shape[1] if lut.ndim == 3 else lut.shape[0]
            rank = expanded and rows == L4 * 24
            folded = (
                expanded
                and lut.ndim == 2
                # rank rows may be tile-padded beyond the logical 20v
                and (rank or lut.shape[1] == 64 * v)
                and fold_geometry(mode) is not None
            )
            if folded:
                out = rotation_ensemble_lanes_folded_int(
                    lut, x, mode=mode, upscale=upscale, interval=interval,
                    fused=fused, rank=rank,
                )
            elif expanded and (lut.ndim == 3 or lut.shape[1] == 16):
                out = rotation_ensemble_lanes_quad_int(
                    lut, x, mode=mode, upscale=upscale, interval=interval,
                    fused=fused, rank=rank,
                )
            else:
                out = rotation_ensemble_lanes_int(
                    lut, x, mode=mode, upscale=upscale, interval=interval,
                    expanded=expanded,
                )
            acc = out if acc is None else acc + out
        mixed = stage_mix(acc, q=q, avg_factor=avg_factor, bias=bias)
        x = _interleave(mixed, upscale) if upscale > 1 else mixed[..., 0]
    return x


def lut_cascade_banded(
    luts: dict,
    img,
    *,
    stages: int,
    modes: str,
    scale: int,
    interval: int = 4,
    expanded: bool = False,
    fused: bool = True,
    band: int = 128,
    valid_hw=None,
):
    """Row-banded cascade for LARGE single images (streams HBM).

    The untiled cascade materializes ~1 KB of gathered corner bytes per
    input pixel per wide stage-mode; a 4K input would need >25 GB of HBM
    temporaries.  This variant scans over horizontal bands of `band` rows
    with a `halo` of extra rows per side — the cascade's receptive field
    is bounded by the per-stage tap pad, so band-edge contamination from
    the per-band edge padding stays inside the halo and is cropped,
    making the result BIT-IDENTICAL to the untiled cascade (same
    construction as `models.srnet.srnets_predict_tiled`; replaces the
    reference's per-image process fan-out for big inputs,
    ref: sr/4_test_lut.py:257-259).

    Args:
      img: (..., H, W) int32; when H does not divide into bands, the last
        band overlaps the previous one (identical overwrites).
      band: rows per scan step (compiled size; larger = fewer dispatches,
        more HBM per step).
      valid_hw: optional bucketed-evaluation extents, as in
        `lut_cascade_int` — (h, w) traced scalars or (B,) vectors.  Each
        slab re-synchronizes its pad region with the slab-local validity
        (rows `valid_h - start` of the slab), which composes banding with
        bucketing bit-identically: clamping the full buffer then slicing
        a slab equals slicing then clamping locally.
    """
    import jax

    halo = sum(max(mode_pad(m) for m in modes) for _ in range(stages))
    h = img.shape[-2]
    w = img.shape[-1]
    slab_h = band + 2 * halo
    if h <= slab_h:
        return lut_cascade_int(
            luts, img, stages=stages, modes=modes, scale=scale,
            interval=interval, expanded=expanded, fused=fused,
            valid_hw=valid_hw,
        )
    n_bands = -(-h // band)
    axis = img.ndim - 2

    # Slabs are clamped INTO the image (same construction as
    # srnet.srnets_predict_tiled): a halo of edge-replicated rows would
    # NOT reproduce the untiled result at true image edges — the cascade
    # of a replicated row differs from the replica of the cascade's row
    # (stage 1 evaluated on replicas sees a shifted window).  With
    # clamping, a slab boundary at a true edge coincides with the image
    # boundary so the cascade's own padding applies exactly; interior
    # contamination stays within `halo` and is cropped.  When band does
    # not divide h the last band overlaps — overwrites are identical.
    def one_band(i, out_buf):
        kept0 = jnp.minimum(i * band, h - band)
        start = jnp.clip(kept0 - halo, 0, h - slab_h)
        slab = jax.lax.dynamic_slice_in_dim(img, start, slab_h, axis=axis)
        slab_valid = None
        if valid_hw is not None:
            vh, vw = valid_hw
            # Slab-local row validity; slabs entirely in the pad region
            # clamp to >= 1 valid row (their output is cropped anyway).
            slab_valid = (jnp.clip(jnp.asarray(vh) - start, 1, slab_h), vw)
        out = lut_cascade_int(
            luts, slab, stages=stages, modes=modes, scale=scale,
            interval=interval, expanded=expanded, fused=fused,
            valid_hw=slab_valid,
        )
        out = jax.lax.dynamic_slice_in_dim(
            out, (kept0 - start) * scale, band * scale, axis=axis
        )
        return jax.lax.dynamic_update_slice_in_dim(
            out_buf, out, kept0 * scale, axis=axis
        )

    out_buf = jnp.zeros(
        img.shape[:-2] + (h * scale, w * scale), jnp.int32
    )
    return jax.lax.fori_loop(0, n_bands, one_band, out_buf)
