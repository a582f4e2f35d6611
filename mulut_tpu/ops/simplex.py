"""4-D simplex (tetrahedral) interpolation over MuLUT look-up tables.

Two device paths, both branchless (see `simplex_tables` for how the
reference's 24 masked-scatter branches become 64-entry decision tables):

  * `simplex_planes_int` / `simplex_planes_expanded_int` — exact integer
    paths for deployment-grade LUT retrieval, bit-identical to the
    reference NumPy engine (ref: sr/4_test_lut.py:14-237).  Weights come
    from a 5-comparator sorting network; the expanded variant folds the
    five corner gathers into ONE gather of a pre-expanded int8 row (TPU
    gathers cost fixed ns/row).
  * `simplex_planes_diff` / `simplex_planes_expanded_diff` — differentiable
    float paths for STE LUT fine-tuning (ref: sr/model.py:69-287);
    gradients flow into the LUT entries through the corner gathers and
    into the input through the fractional weights.

Conventions: LUTs are flat (L**4, v) tables indexed a*L^3 + b*L^2 + c*L + d
(ref: sr/model.py:128); images are (..., H, W) with values in [0, 255]; the
integer path returns the accumulator *before* the final division by q so the
rotation/mode ensemble can be averaged with exact rational rounding
(see `ensemble.round_half_even_div`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import simplex_tables
from .taps import mode_pad, mode_taps

_WEIGHT_COEFFS = simplex_tables.weight_coeffs()  # (64, 5, 5) int32


@functools.lru_cache(maxsize=None)
def _tables(L: int):
    # NumPy constants (jnp conversion happens per-trace: caching device
    # arrays here would leak tracers out of jit scopes).
    offs = simplex_tables.corner_offsets(L)  # (64, 5) int32
    coeffs = _WEIGHT_COEFFS                  # (64, 5, 5) int32
    return offs, coeffs


def _comparison_code(fa, fb, fc, fd):
    """6-bit code from strict pairwise comparisons (bit layout of tables)."""
    code = (fa > fb).astype(jnp.int32) * 32
    code += (fa > fc).astype(jnp.int32) * 16
    code += (fa > fd).astype(jnp.int32) * 8
    code += (fb > fc).astype(jnp.int32) * 4
    code += (fb > fd).astype(jnp.int32) * 2
    code += (fc > fd).astype(jnp.int32)
    return code


def _tap_planes(img, mode: str, h: int, w: int):
    """The four sampled pixel planes (a, b, c, d), each (..., h, w)."""
    return [img[..., dy : dy + h, dx : dx + w] for dy, dx in mode_taps(mode)]


def _interleave(out, upscale: int):
    """(..., h, w, up*up) -> (..., h*up, w*up), ref: sr/model.py:283-285."""
    *lead, h, w, _ = out.shape
    out = out.reshape(*lead, h, w, upscale, upscale)
    out = jnp.moveaxis(out, -2, -3)  # (..., h, up, w, up)
    return out.reshape(*lead, h * upscale, w * upscale)


def simplex_planes_int(lut, planes, *, interval: int = 4):
    """Exact integer 4-D simplex interpolation over four tap planes.

    The workhorse of the fused ensemble: the caller supplies the four
    sampled pixel planes (a, b, c, d) directly (shifted views of a padded
    image — see `ensemble.lut_cascade_int` for how the rotation ensemble
    becomes 4 static tap-offset sets instead of image rot90s).

    Args:
      lut: (L**4, v) int32 table (int8 values widened).
      planes: sequence of four (..., h, w) int32 arrays in [0, 255].
      interval: LSB bit width (q = 2**interval, L = 2**(8-interval) + 1).

    Returns:
      (..., h, w, v) int32 accumulator equal to q times the reference's
      float output (i.e. before the final `/ q`), output lanes NOT yet
      interleaved spatially.
    """
    q = 2 ** interval
    L = 2 ** (8 - interval) + 1

    a, b, c, d = planes
    msb_a, msb_b, msb_c, msb_d = a // q, b // q, c // q, d // q
    fa, fb, fc, fd = a % q, b % q, c % q, d % q

    base = ((msb_a * L + msb_b) * L + msb_c) * L + msb_d
    code = _comparison_code(fa, fb, fc, fd)

    offs_t, _ = _tables(L)
    offs = jnp.take(jnp.asarray(offs_t), code, axis=0)      # (..., h, w, 5)

    # Simplex weights = adjacent differences of the DESC-sorted fractions:
    # (q - s0, s0 - s1, s1 - s2, s2 - s3, s3).  The reference's 24 branches
    # produce exactly this multiset (ref: sr/4_test_lut.py:148-231); tie
    # order only affects which CORNER a weight pairs with (handled by the
    # `code` table above), never the weight values.  A 5-comparator min/max
    # network keeps this pure-VPU — no per-pixel int matvec, which XLA
    # lowers to catastrophically slow s32 dot_generals on TPU.
    hi_ab, lo_ab = jnp.maximum(fa, fb), jnp.minimum(fa, fb)
    hi_cd, lo_cd = jnp.maximum(fc, fd), jnp.minimum(fc, fd)
    s0 = jnp.maximum(hi_ab, hi_cd)
    s3 = jnp.minimum(lo_ab, lo_cd)
    mid_hi = jnp.minimum(hi_ab, hi_cd)
    mid_lo = jnp.maximum(lo_ab, lo_cd)
    s1 = jnp.maximum(mid_hi, mid_lo)
    s2 = jnp.minimum(mid_hi, mid_lo)
    weights = (q - s0, s0 - s1, s1 - s2, s2 - s3, s3)

    # Accumulate corner-by-corner: never materializes the (..., 5, v)
    # corner tensor (at 1080p x batch that intermediate is GBs).
    out = None
    for k in range(5):
        term = weights[k][..., None] * jnp.take(lut, base + offs[..., k], axis=0)
        out = term if out is None else out + term
    return out


def _sorted_fractions(fa, fb, fc, fd):
    """Descending sort of the four fractions via a 5-comparator network."""
    hi_ab, lo_ab = jnp.maximum(fa, fb), jnp.minimum(fa, fb)
    hi_cd, lo_cd = jnp.maximum(fc, fd), jnp.minimum(fc, fd)
    s0 = jnp.maximum(hi_ab, hi_cd)
    s3 = jnp.minimum(lo_ab, lo_cd)
    mid_hi = jnp.minimum(hi_ab, hi_cd)
    mid_lo = jnp.maximum(lo_ab, lo_cd)
    return s0, jnp.maximum(mid_hi, mid_lo), jnp.minimum(mid_hi, mid_lo), s3


def _fraction_ranks(fa, fb, fc, fd):
    """Descending rank (0 = largest) of each fraction, with the reference's
    tie-breaking.

    rank_x = #{y : y beats x}, where y beats x iff f_y > f_x strictly, or
    f_y == f_x and y is the later letter.  Verified exhaustively equal to
    the permutation implied by the reference's 24-branch chain
    (ref: sr/4_test_lut.py:148-231) for every outcome of the six strict
    comparisons, including all tie patterns.
    """
    cab = (fa > fb).astype(jnp.int32)
    cac = (fa > fc).astype(jnp.int32)
    cad = (fa > fd).astype(jnp.int32)
    cbc = (fb > fc).astype(jnp.int32)
    cbd = (fb > fd).astype(jnp.int32)
    ccd = (fc > fd).astype(jnp.int32)
    rank_a = 3 - cab - cac - cad
    rank_b = 2 + cab - cbc - cbd
    rank_c = 1 + cac + cbc - ccd
    rank_d = cad + cbd + ccd
    return rank_a, rank_b, rank_c, rank_d


def corner_lams(fa, fb, fc, fd, *, interval: int = 4):
    """Per-pixel weights of all 16 hypercube corners, (..., 16) float32.

    lam[..., m] = w_popcount(m) if corner mask m equals the set of dims
    whose fraction ranks above popcount(m), else 0 — the branchless form of
    the reference's 24-branch corner selection (ref: sr/4_test_lut.py:148-231).
    Weights are the adjacent differences of the descending-sorted fractions;
    ranks carry the reference's tie-breaking.  Everything is exact in f32
    (integer values below 2**24).
    """
    q = 2 ** interval
    s0, s1, s2, s3 = _sorted_fractions(fa, fb, fc, fd)
    w = [
        x.astype(jnp.float32)
        for x in (q - s0, s0 - s1, s1 - s2, s2 - s3, s3)
    ]
    ranks = _fraction_ranks(fa, fb, fc, fd)
    # Vectorized over all 16 corners at once: broadcast (N, 1) pixel data
    # against (1, 16) corner-constant rows so the whole thing is ONE
    # (N, 16) elementwise fusion.  (A per-corner stack of (N,) pieces
    # materializes sixteen 128-lane-padded (N, 1) copies when the
    # consumer is a Pallas kernel — 1.5 GB each at 1080p.)
    bits = np.array(
        [[(m >> 3) & 1, (m >> 2) & 1, (m >> 1) & 1, m & 1]
         for m in range(16)]
    )
    kk = jnp.asarray(bits.sum(1))                      # (16,)
    ok = None
    for x, r in enumerate(ranks):
        want = jnp.asarray(bits[:, x] == 1)            # (16,)
        cond = (r[..., None] < kk) == want
        ok = cond if ok is None else ok & cond
    ws = None
    for k in range(5):
        term = jnp.where(kk == k, w[k][..., None], 0.0)
        ws = term if ws is None else ws + term
    return jnp.where(ok, ws, 0.0)


def corner_lams_t(fa, fb, fc, fd, *, interval: int = 4):
    """`corner_lams` transposed: (16, N) float32 over FLAT (N,) fracs.

    The transposed layout is the TPU-native weight form: with N on the
    minor (lane) axis the array tiles at full 128-lane density, whereas
    an (N, 16) array wastes 112 of every 128 lanes — on v5e each touch
    of an (N, 16) f32 weight buffer (pad, relayout copy) measured ~5 ms
    per 3.3M-row rotation at 1/8 effective bandwidth.  Built by
    broadcasting (1, N) pixel rows against (16, 1) corner-constant
    columns so the output is ONE natural-{1,0} (16, N) fusion.
    """
    q = 2 ** interval
    s0, s1, s2, s3 = _sorted_fractions(fa, fb, fc, fd)
    w = [
        x.astype(jnp.float32)
        for x in (q - s0, s0 - s1, s1 - s2, s2 - s3, s3)
    ]
    ranks = _fraction_ranks(fa, fb, fc, fd)
    bits = np.array(
        [[(m >> 3) & 1, (m >> 2) & 1, (m >> 1) & 1, m & 1]
         for m in range(16)]
    )
    kk = jnp.asarray(bits.sum(1))                      # (16,)
    ok = None
    for x, r in enumerate(ranks):
        want = jnp.asarray(bits[:, x] == 1)            # (16,)
        cond = (r[None, :] < kk[:, None]) == want[:, None]
        ok = cond if ok is None else ok & cond
    ws = None
    for k in range(5):
        term = jnp.where(kk[:, None] == k, w[k][None, :], 0.0)
        ws = term if ws is None else ws + term
    return jnp.where(ok, ws, 0.0)                      # (16, N)


def _base_and_fracs(planes, *, interval: int):
    """Flat (N,) LUT base index and the four LSB fractions."""
    q = 2 ** interval
    L = 2 ** (8 - interval) + 1
    a, b, c, d = (p.reshape(-1) for p in planes)
    base = (((a // q) * L + b // q) * L + c // q) * L + d // q
    return base, (a % q, b % q, c % q, d % q)


def simplex_planes_expanded_int(elut, planes, *, v: int, interval: int = 4):
    """Single-gather integer simplex interpolation over an expanded LUT.

    The TPU-first formulation of the hot path: XLA's TPU gather costs a
    fixed ~2-7 ns per row regardless of width, so the five corner gathers
    per pixel (ref: sr/4_test_lut.py:61-110) are folded into ONE gather of
    a pre-expanded row holding all 16 hypercube corners
    (`simplex_tables.expand_lut`); the five simplex corners are then picked
    out arithmetically: corner mask m participates with weight w_popcount(m)
    iff m == {dims with rank < popcount(m)}.

    Args:
      elut: (L**4, 16 * v) int8 expanded table (device array).
      planes: four (..., h, w) int32 tap planes in [0, 255].
      v: output lanes per pixel (upscale**2).

    Returns:
      (..., h, w, v) int32 accumulator (q x the reference's float output).
    """
    q = 2 ** interval
    L = 2 ** (8 - interval) + 1

    # Work on flat (N,) planes: high-rank intermediates tile poorly on TPU.
    lead = planes[0].shape
    a, b, c, d = (p.reshape(-1) for p in planes)
    fa, fb, fc, fd = a % q, b % q, c % q, d % q
    base = (((a // q) * L + b // q) * L + c // q) * L + d // q

    s0, s1, s2, s3 = _sorted_fractions(fa, fb, fc, fd)
    # Everything below fits in f32 exactly (|values| < 2^24), which lets the
    # per-pixel 16-corner weighted sum run as one fp dot instead of int32
    # multiply-add chains (XLA handles s32 reductions poorly on TPU).
    w = [
        x.astype(jnp.float32)
        for x in (q - s0, s0 - s1, s1 - s2, s2 - s3, s3)
    ]
    ra, rb, rc, rd = _fraction_ranks(fa, fb, fc, fd)

    g = jnp.take(elut, base, axis=0, mode="clip")       # (N, 16*v) int8
    g = g.reshape(-1, 16, v).astype(jnp.float32)

    # rank_x < k indicators for k = 1..3 (k=0: no dims, k=4: all dims)
    lt = {
        x: [None] + [(r < k) for k in (1, 2, 3)] + [None]
        for x, r in (("a", ra), ("b", rb), ("c", rc), ("d", rd))
    }

    lams = []
    for m in range(16):
        bits = ((m >> 3) & 1, (m >> 2) & 1, (m >> 1) & 1, m & 1)
        k = sum(bits)
        used = None
        for x, bit in zip("abcd", bits):
            if k in (0, 4):
                continue  # membership test is vacuous at the path endpoints
            cond = lt[x][k] if bit else ~lt[x][k]
            used = cond if used is None else used & cond
        lams.append(w[k] if used is None else jnp.where(used, w[k], 0.0))
    lam = jnp.stack(lams, axis=-1)                       # (N, 16) f32
    out = jnp.einsum("nm,nmv->nv", lam, g)               # exact in f32
    return out.astype(jnp.int32).reshape(*lead, v)


def simplex_planes_folded_int(flut, planes, *, v: int, interval: int = 4):
    """Rotation-folded single-gather simplex interpolation.

    The four rotations of a 90-degree-symmetric tap pattern read the same
    4-pixel window with permuted letter roles (`taps.fold_geometry`), and
    simplex interpolation is permutation-equivariant, so a table whose rows
    carry all 4 rotations' corner blocks (`simplex_tables.fold_lut`) serves
    the whole rotation ensemble with ONE gather per pixel — the per-pixel
    weights AND the corner-selection masks are computed once and shared:
    the k-th simplex corner is the mask of the k largest fractions, which
    is frame-independent.

    The 16-corner contraction runs as ONE einsum over the gathered int8
    row (m-major column order): XLA fuses the gather + int8 convert into
    the contraction loop.  Pallas consumers were tried and measured
    SLOWER three different ways — see PERF.md "negative results".

    Args:
      flut: (L**4, 16 * 4 * v) int8 folded table (device array).
      planes: four (..., h, w) int32 rotation-0 tap planes in [0, 255],
        evaluated over the EXTENDED window range (see
        `ensemble.rotation_ensemble_lanes_folded_int`).
      v: output lanes per pixel (upscale**2).

    Returns:
      (..., h, w, 4, v) int32 per-rotation accumulators (q x the reference
      float output); rotation r's plane still needs its static spatial
      un-shift before summing.
    """
    lead = planes[0].shape
    base, (fa, fb, fc, fd) = _base_and_fracs(planes, interval=interval)
    lam = corner_lams(fa, fb, fc, fd, interval=interval)  # (N, 16)
    g = jnp.take(flut, base, axis=0, mode="clip")        # (N, 16*4*v) int8
    width = 4 * v
    out = jnp.einsum(
        "nm,nmv->nv", lam, g.reshape(-1, 16, width).astype(jnp.float32)
    )
    return out.astype(jnp.int32).reshape(*lead, 4, v)


def _lehmer_code(fa, fb, fc, fd):
    """Bijective 0..23 code of the descending fraction-rank permutation.

    Must match `simplex_tables.lehmer_of_ranks` (the rank tables' row
    order); ranks carry the reference's tie-breaking via `_fraction_ranks`.
    """
    ra, rb, rc, rd = _fraction_ranks(fa, fb, fc, fd)
    l2 = rb - (rb > ra).astype(jnp.int32)
    l3 = rc - (rc > ra).astype(jnp.int32) - (rc > rb).astype(jnp.int32)
    return ra * 6 + l2 * 2 + l3


def sorted_weights(fa, fb, fc, fd, *, interval: int = 4):
    """The 5 simplex weights in rank order, (..., 5) float32.

    (q - s0, s0 - s1, s1 - s2, s2 - s3, s3) over the descending-sorted
    fractions — the weight multiset of every one of the reference's 24
    branches (ref: sr/4_test_lut.py:148-231); the rank-expanded tables
    put the matching corner chain at `lehmer * L**4 + base` (rank-major
    — see simplex_tables.rank_fold_lut for why the order matters).
    """
    q = 2 ** interval
    s0, s1, s2, s3 = _sorted_fractions(fa, fb, fc, fd)
    return jnp.stack(
        [x.astype(jnp.float32) for x in (q - s0, s0 - s1, s1 - s2, s2 - s3,
                                         s3)],
        axis=-1,
    )


def sorted_weights_t(fa, fb, fc, fd, *, interval: int = 4):
    """`sorted_weights` transposed: (5, N) float32 over FLAT (N,) fracs.

    N on the minor (lane) axis tiles at full 128-lane density — the
    TPU-native weight form for Pallas (C, T) weight blocks (see
    `corner_lams_t` for the measured cost of the (N, C) orientation).
    """
    q = 2 ** interval
    s0, s1, s2, s3 = _sorted_fractions(fa, fb, fc, fd)
    return jnp.stack(
        [x.astype(jnp.float32) for x in (q - s0, s0 - s1, s1 - s2, s2 - s3,
                                         s3)],
        axis=0,
    )


def simplex_planes_rank_folded_int(rflut, planes, *, v: int,
                                   interval: int = 4):
    """Rank-expanded rotation-folded interpolation: 5-corner rows.

    Like `simplex_planes_folded_int` but over `simplex_tables.rank_fold_lut`
    tables: the gather row at `lehmer(ranks) * L**4 + base` already holds
    exactly the 5 simplex-chain corners of all 4 rotations, so the
    contraction is 5 fused multiply-adds with the sorted-difference
    weights — no corner-mask selection, 3.2x fewer gathered bytes.

    Returns (..., h, w, 4, v) int32 per-rotation accumulators.
    """
    lead = planes[0].shape
    terms = rflut.shape[1] // (4 * v)  # >= 5: rows may be tile-padded
    base, (fa, fb, fc, fd) = _base_and_fracs(planes, interval=interval)
    lam = sorted_weights(fa, fb, fc, fd, interval=interval)   # (N, 5)
    if terms > 5:
        lam = jnp.pad(lam, ((0, 0), (0, terms - 5)))
    idx = _lehmer_code(fa, fb, fc, fd) * (rflut.shape[0] // 24) + base
    g = jnp.take(rflut, idx, axis=0, mode="clip")        # (N, terms*4*v)
    out = jnp.einsum(
        "nk,nkv->nv", lam, g.reshape(-1, terms, 4 * v).astype(jnp.float32)
    )
    return out.astype(jnp.int32).reshape(*lead, 4, v)


def simplex_planes_rank_quad_int(rluts4, planes4, *, v: int,
                                 interval: int = 4):
    """Rank-expanded per-rotation interpolation for non-symmetric modes.

    Each rotation keeps its own base/rank/gather (different pixels), from
    its own (L**4 * 24, 5 * v) table block; the rotation sum happens in
    the accumulator.  Returns (..., h, w, v) int32.
    """
    lead = planes4[0][0].shape
    out = None
    for r in range(4):
        base, (fa, fb, fc, fd) = _base_and_fracs(planes4[r],
                                                 interval=interval)
        lam = sorted_weights(fa, fb, fc, fd, interval=interval)
        idx = (_lehmer_code(fa, fb, fc, fd) * (rluts4[r].shape[0] // 24)
               + base)
        g = jnp.take(rluts4[r], idx, axis=0, mode="clip")    # (N, 5*v)
        o = jnp.einsum(
            "nk,nkv->nv", lam, g.reshape(-1, 5, v).astype(jnp.float32)
        )
        out = o if out is None else out + o
    return out.astype(jnp.int32).reshape(*lead, v)


def simplex_planes_quad_int(luts4, planes4, *, v: int, interval: int = 4):
    """All 4 rotations of a NON-symmetric mode, rotation-summed.

    y/h/o tap patterns have no 90-degree symmetry, so each rotation keeps
    its own gather (different pixels -> different table rows; the
    per-rotation tables differ only by the baked-in output-lane
    permutation).  The rotation SUM commutes with the corner contraction,
    so the four per-rotation einsums accumulate straight into one (N, v)
    buffer (in exact integer-valued f32).  The einsums stay SEPARATE —
    concatenating the gathers first tempts XLA into materializing a
    full-width upcast copy of all four (12 GB HLO temp, observed OOM).

    Args:
      luts4: (4, L**4, 16 * v) per-rotation expanded tables (or a shared
        2-D table repeated 4x for v == 1, where no lane permutation exists).
      planes4: sequence over rotations of four (..., h, w) int32 tap planes.
      v: output lanes per pixel.

    Returns:
      (..., h, w, v) int32 rotation-summed accumulator.
    """
    lead = planes4[0][0].shape
    out = None
    for r in range(4):
        base, fr = _base_and_fracs(planes4[r], interval=interval)
        lam = corner_lams(*fr, interval=interval)          # (N, 16)
        g = jnp.take(luts4[r], base, axis=0, mode="clip")  # (N, 16*v)
        o = jnp.einsum(
            "nm,nmv->nv", lam, g.reshape(-1, 16, v).astype(jnp.float32)
        )
        out = o if out is None else out + o
    return out.astype(jnp.int32).reshape(*lead, v)


def simplex_interp_int(lut, img, *, mode: str, upscale: int, interval: int = 4):
    """Single-pattern integer simplex interpolation on a padded image.

    Args:
      lut: (L**4, upscale**2) int32 table (int8 values widened).
      img: (..., h + pad, w + pad) int32 image, values in [0, 255], already
        replicate-padded on the bottom/right by `mode_pad(mode)`.
      mode: sampling pattern in {'s', 'd', 'y', 'e', 'h', 'o'}.
      upscale: output pixels per input pixel per axis (1 for inner stages).

    Returns:
      (..., h*upscale, w*upscale) int32 accumulator equal to q times the
      reference's float output (i.e. before the final `/ q`).
    """
    pad = mode_pad(mode)
    h = img.shape[-2] - pad
    w = img.shape[-1] - pad
    planes = _tap_planes(img, mode, h, w)
    out = simplex_planes_int(lut, planes, interval=interval)
    return _interleave(out, upscale)


def round_ste(x):
    """Round with straight-through gradient (ref: sr/model.py:59-67)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def simplex_planes_diff(w127, planes, *, interval: int = 4):
    """Differentiable simplex interpolation over four tap planes.

    Args:
      w127: (L**4, v) float32 LUT already re-quantized to int8 levels with
        STE (round(weight*127) -> clamp(-127, 127)); gradients flow into it
        through the 5 corner gathers and into the planes through the
        fractional weights.
      planes: four (..., h, w) float32 arrays in [0, 255].

    Returns:
      (..., h, w, v) float32 (already divided by q), lanes not interleaved.
    """
    q = 2 ** interval
    L = 2 ** (8 - interval) + 1

    a, b, c, d = planes
    msb = [jnp.floor(p / q).astype(jnp.int32) for p in (a, b, c, d)]
    fa, fb, fc, fd = (p % q for p in (a, b, c, d))

    base = ((msb[0] * L + msb[1]) * L + msb[2]) * L + msb[3]
    base = jax.lax.stop_gradient(base)
    code = jax.lax.stop_gradient(_comparison_code(fa, fb, fc, fd))

    offs_t, _ = _tables(L)
    offs = jnp.take(jnp.asarray(offs_t), code, axis=0)

    # Sorted-fraction weight formulation (see simplex_planes_int).  The
    # min/max network is differentiable: each weight's gradient flows to
    # the fraction it came from, matching the reference's per-branch
    # expressions (ref: sr/model.py:199-282).
    hi_ab, lo_ab = jnp.maximum(fa, fb), jnp.minimum(fa, fb)
    hi_cd, lo_cd = jnp.maximum(fc, fd), jnp.minimum(fc, fd)
    s0 = jnp.maximum(hi_ab, hi_cd)
    s3 = jnp.minimum(lo_ab, lo_cd)
    mid_hi = jnp.minimum(hi_ab, hi_cd)
    mid_lo = jnp.maximum(lo_ab, lo_cd)
    s1 = jnp.maximum(mid_hi, mid_lo)
    s2 = jnp.minimum(mid_hi, mid_lo)
    weights = (q - s0, s0 - s1, s1 - s2, s2 - s3, s3)

    out = None
    for k in range(5):
        term = weights[k][..., None] * jnp.take(w127, base + offs[..., k], axis=0)
        out = term if out is None else out + term
    return out / q


def expand_weight(w127, *, interval: int = 4):
    """Differentiable corner expansion: (L**4, v) -> (L**4, 16*v).
    (Keyword-friendly wrapper; see `_expand_weight` for the math and the
    custom forward/backward.)"""
    return _expand_weight(w127, interval)


def _shift_fwd(x, axis):
    """(S x) along a digit axis: out[i] = x[min(i+1, L-1)]."""
    L = x.shape[axis]
    hi = jax.lax.slice_in_dim(x, 1, L, axis=axis)
    last = jax.lax.slice_in_dim(x, L - 1, L, axis=axis)
    return jnp.concatenate([hi, last], axis=axis)


def _shiftT(x, axis):
    """(S^T x) along a digit axis: out[j] = x[j-1] (+ x[L-1] at j = L-1)."""
    L = x.shape[axis]
    lo = jax.lax.slice_in_dim(x, 0, L - 2, axis=axis)
    zero = jnp.zeros_like(jax.lax.slice_in_dim(x, 0, 1, axis=axis))
    last = (jax.lax.slice_in_dim(x, L - 2, L - 1, axis=axis)
            + jax.lax.slice_in_dim(x, L - 1, L, axis=axis))
    return jnp.concatenate([zero, lo, last], axis=axis)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _expand_weight(w127, interval: int = 4):
    """Differentiable corner expansion: (L**4, v) -> (L**4, 16*v).

    Exploits the expansion's tensor-product structure in BOTH directions:
    corner mask m's rows are `w[min(digits + bits(m), L-1)]`, i.e.
    (S (x) S (x) S (x) S) w with the per-digit shift matrix
    S[i, j] = [j == min(i+1, L-1)] applied on m's bit dims.  The forward
    builds all 16 corners in 4 doubling steps (one shifted copy per digit
    dim); the backward folds the 4 bit axes with the transposed shift
    (shift-down + accumulate-into-the-last-bin).  Pure slice/concat/add
    vector ops — no gather rows, no scatter.  XLA's scatter-add lowering
    for the naive gather backward runs at ~5 GB/s on TPU and dominated
    the whole fine-tune step (~113 of 155 ms); the 1-lane gather forward
    for v=1 tables cost another ~27 ms.
    """
    L = 2 ** (8 - interval) + 1
    L4, v = w127.shape
    x = w127.reshape(L, L, L, L, v)
    for d in range(4):
        # insert bit axis for digit d after the existing bit axes
        x = jnp.stack([x, _shift_fwd(x, d)], axis=4 + d)
    return x.reshape(L4, 16 * v)


def _expand_weight_fwd(w127, interval):
    return _expand_weight(w127, interval), w127.shape


def _expand_weight_bwd(interval, shape, de):
    L = 2 ** (8 - interval) + 1
    L4, v = shape
    g = de.reshape(L, L, L, L, 2, 2, 2, 2, v)
    for d in (3, 2, 1, 0):  # fold innermost bit axis first
        bit_axis = 4 + d
        g0 = jax.lax.index_in_dim(g, 0, axis=bit_axis, keepdims=False)
        g1 = jax.lax.index_in_dim(g, 1, axis=bit_axis, keepdims=False)
        g = g0 + _shiftT(g1, d)
    return (g.reshape(L4, v),)


_expand_weight.defvjp(_expand_weight_fwd, _expand_weight_bwd)


def simplex_planes_expanded_diff(e127, planes, *, v: int, interval: int = 4):
    """Differentiable single-gather simplex interpolation.

    The fine-tuning counterpart of `simplex_planes_expanded_int`: `e127` is
    the differentiably-expanded float table from `expand_weight`, so the
    five corner gathers AND their five backward scatters collapse into one
    wide row gather/scatter per tapset.  Forward values are bit-identical
    to `simplex_planes_diff` (all addends are integer-valued floats below
    2**24, so f32 summation order is irrelevant).

    Args:
      e127: (L**4, 16 * v) float32 expanded table.
      planes: four (..., h, w) float32 tap planes in [0, 255].

    Returns:
      (..., h, w, v) float32 (already divided by q), lanes not interleaved.
    """
    q = 2 ** interval
    L = 2 ** (8 - interval) + 1

    lead = planes[0].shape
    a, b, c, d = (p.reshape(-1) for p in planes)
    fa, fb, fc, fd = (p % q for p in (a, b, c, d))
    msb = [jnp.floor(p / q).astype(jnp.int32) for p in (a, b, c, d)]
    base = ((msb[0] * L + msb[1]) * L + msb[2]) * L + msb[3]
    base = jax.lax.stop_gradient(base)

    s0, s1, s2, s3 = _sorted_fractions(fa, fb, fc, fd)
    w = (q - s0, s0 - s1, s1 - s2, s2 - s3, s3)
    ranks = _fraction_ranks(
        *(jax.lax.stop_gradient(f) for f in (fa, fb, fc, fd))
    )
    lt = {
        x: [None] + [(r < k) for k in (1, 2, 3)] + [None]
        for x, r in zip("abcd", ranks)
    }

    g = jnp.take(e127, base, axis=0).reshape(-1, 16, v)

    lams = []
    for m in range(16):
        bits = ((m >> 3) & 1, (m >> 2) & 1, (m >> 1) & 1, m & 1)
        k = sum(bits)
        used = None
        for x, bit in zip("abcd", bits):
            if k in (0, 4):
                continue
            cond = lt[x][k] if bit else ~lt[x][k]
            used = cond if used is None else used & cond
        lams.append(w[k] if used is None else jnp.where(used, w[k], 0.0))
    lam = jnp.stack(lams, axis=-1)                       # (N, 16) f32
    out = jnp.einsum("nm,nmv->nv", lam, g) / q
    return out.reshape(*lead, v)


def simplex_interp_diff(weight, img, *, mode: str, upscale: int, interval: int = 4):
    """Differentiable simplex interpolation for STE LUT fine-tuning.

    Args:
      weight: (L**4, upscale**2) float32 trainable LUT (values ~ [-1, 1]).
      img: (..., h + pad, w + pad) float32, values in [0, 255], already
        replicate-padded on the bottom/right by `mode_pad(mode)`.

    Returns:
      (..., h*upscale, w*upscale) float32, matching the torch fine-tune
      path (ref: sr/model.py:69-287) including the weight re-quantization
      round(weight*127) -> clamp(-127, 127) with straight-through gradients.
    """
    pad = mode_pad(mode)
    h = img.shape[-2] - pad
    w = img.shape[-1] - pad
    w127 = jnp.clip(round_ste(weight * 127.0), -127.0, 127.0)
    planes = _tap_planes(img, mode, h, w)
    out = simplex_planes_diff(w127, planes, interval=interval)
    return _interleave(out, upscale)


def reference_oracle_int(lut, img, *, mode: str, upscale: int, interval: int = 4):
    """Slow, independent NumPy oracle used only by tests.

    Straightforward per-pixel evaluation of the simplex spec (sort the four
    fractions with the reference's strict-comparison decision chain via the
    same host tables, then accumulate the five weighted corners).  Written
    against the math, not the reference code; kept in NumPy + Python loops so
    a table/vectorization bug in the device path cannot hide here.
    """
    q = 2 ** interval
    L = 2 ** (8 - interval) + 1
    pad = mode_pad(mode)
    h = img.shape[-2] - pad
    w = img.shape[-1] - pad
    taps = mode_taps(mode)
    v = upscale * upscale
    offs = simplex_tables.corner_offsets(L)
    coeffs = simplex_tables.weight_coeffs()

    lead = img.shape[:-2]
    out = np.zeros(lead + (h, w, v), dtype=np.int64)
    for index in np.ndindex(*lead):
        for i in range(h):
            for j in range(w):
                px = [int(img[index + (i + dy, j + dx)]) for dy, dx in taps]
                msb = [p // q for p in px]
                f = [p % q for p in px]
                basev = ((msb[0] * L + msb[1]) * L + msb[2]) * L + msb[3]
                codev = simplex_tables.comparison_code(
                    np.int64(f[0]), np.int64(f[1]), np.int64(f[2]), np.int64(f[3])
                )
                wts = coeffs[codev] @ np.array([q] + f, dtype=np.int64)
                acc = np.zeros(v, dtype=np.int64)
                for k in range(5):
                    acc += wts[k] * lut[basev + offs[codev, k]]
                out[index + (i, j)] = acc
    out = out.reshape(lead + (h, w, upscale, upscale))
    out = np.moveaxis(out, -2, -3).reshape(lead + (h * upscale, w * upscale))
    return out
