"""Variable-base multi-scalar multiplication on TPU (Pippenger).

The flagship kernel (SURVEY.md §7.1 F4): every prover/verifier hot spot in
the reference is an MSM (``StarkPoint::msm_iter`` — 13 call sites; verifier
mega-check src/r1cs/verifier.rs:516-547; IPP round L/R
src/inner_product_proof.rs:90-114).

Design (TPU-first, branchless):

1. **Signed digits**: scalars are decomposed into ``ceil(252/c)`` windows
   of ``c`` bits, then digits >= 2^(c-1) borrow from the next window,
   leaving digits in ``[-2^(c-1), 2^(c-1)]``.  Negation of a point is one
   field negation, so a signed digit just flips the gathered point — and
   the bucket count per window halves, which both shrinks the bucket
   reduction term and lets a larger ``c`` (fewer windows) win.  The top
   window stays unsigned (scalars < 2^252 leave it < 2^12 + 1 at c=16).
2. **Bucket accumulation without scatter**: points are sorted by digit per
   window (one batched XLA sort), then an *unsegmented* inclusive prefix
   scan of points is taken.  Because group elements have cheap inverses,
   per-bucket sums never need a segmented scan:

       cum_b   = prefix[last index with digit <= b]
       S_j     = total - cum_{j-1}          (sum of buckets >= j)
       window  = sum_{j=1..B-1} S_j         (the classic running-sum value)

   so the whole bucket phase is one scan, one gather, one batched
   subtract-add, and one tree reduction — all complete-formula point adds
   (:mod:`.kernels`), ~``n + 2^c`` adds per window.
3. **Window combination**: Horner over windows, ``c`` doublings + 1 add per
   window (``lax.scan`` so the graph stays small).

The prefix scan is the grid-sequential pallas kernel
:func:`.kernels.point_scan_steps`: lanes hold (windows x chunks), the grid
walks chunk-local positions with the running prefix in VMEM scratch — n
adds total (work-optimal) with no inter-kernel XLA glue, which on TPU is
HBM-bound and costs more than the adds themselves.  Chunk base offsets are
folded in only at the gathered bucket boundaries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import curve_jax as cj
from . import kernels
from .limb import BASE_BITS, NL, NLZ

FIELD_BITS = 252


def select_window(n: int, bits: int = FIELD_BITS) -> int:
    """Pick the signed-digit window size minimizing ~windows*(n + 2^c).

    (The grid-scan bucket phase costs n adds per window; the signed-bucket
    boundary term is 2*2^(c-1) = 2^c: 2^(c-1) gathers for the suffix sums
    plus the same again in the reduction tree.)
    """
    forced = _os.environ.get("BP_FORCE_C")
    if forced:
        return int(forced)
    if bits == SPLIT_CHUNK_BITS:
        # Table-path MSMs (round-5 on-chip sweep, pair at 16,388 lanes with
        # the pre-laid wide scan): ceil(64/9) = 8 windows exactly fills the
        # scan-lane cap (T=17; c=7's 10 windows double T, measured 7.96 ms
        # vs c=9's 8.38 pre-boundary-fix) and the 1-bit top window stays
        # within the signed bucket range (c=8 does NOT: 64%8==0 makes the
        # top window full-width and overflows the buckets).
        return 9
    # Cap c at 16: measured on v5e at n=2^20, c=16 beats c=14 by 1.07x
    # (1.77 vs 1.65 Mpoints/s); c=15 regresses (1.45) and c=17's 2^16-bucket
    # boundary phase eats the window savings.
    best_c, best_cost = 5, None
    for c in range(5, 17):
        top_width = bits - (bits // c) * c if bits % c else c
        if top_width > c - 2:
            # top window must stay within the signed bucket range
            # [0, 2^(c-1)]: its width is bits mod c — or a FULL c bits when
            # c divides bits exactly, which overflows the buckets (2^c + 1
            # with the final borrow; round-5 bug found at bits=64, c=8)
            continue
        windows = -(-bits // c)
        cost = windows * (n + (1 << c))
        if best_cost is None or cost < best_cost:
            best_c, best_cost = c, cost
    return best_c


def _digits(scalars: jnp.ndarray, c: int, bits: int = FIELD_BITS) -> jnp.ndarray:
    """``(NL, n)`` limbs -> ``(num_windows, n)`` c-bit digit rows.

    One batched gather of the three limbs each window can touch plus
    per-row shift-ors — a handful of whole-(nw, n) tensor ops.  (The
    obvious per-window loop emits ~5 tiny ops per window; measured on
    v5e those dominated the whole MSM at ~0.8 ms/op.)

    Safety of the clamped limb indices: a clamped (out-of-range) limb's
    contribution starts at bit 13-off (limb1) / 26-off (limb2), which for
    every c <= 14 used here lies at or above c and is masked off.
    """
    import numpy as np

    nw = -(-bits // c)
    lo = np.arange(nw, dtype=np.int32) * c
    k0 = lo // BASE_BITS
    off = (lo % BASE_BITS).astype(np.int32)
    idx = np.minimum(
        np.stack([k0, k0 + 1, k0 + 2]), scalars.shape[0] - 1
    )  # (3, nw)
    limbs = jnp.take(scalars, jnp.asarray(idx.reshape(-1)), axis=0).reshape(
        3, nw, scalars.shape[-1]
    )
    off_col = jnp.asarray(off)[:, None]
    val = (limbs[0] >> off_col)
    val = val | (limbs[1] << (BASE_BITS - off_col))
    val = val | (limbs[2] << (2 * BASE_BITS - off_col))
    return val & ((1 << c) - 1)


def _signed_digits(scalars: jnp.ndarray, c: int, bits: int = FIELD_BITS) -> jnp.ndarray:
    """``(NL, n)`` limbs -> ``(nw, n)`` signed digits in [-2^(c-1), 2^(c-1)].

    Window i borrows 2^c from window i+1 when its digit is > 2^(c-1); the
    carry chain is ``nw`` sequential vector steps.  The top window absorbs
    the final carry unsigned (bounded by 2^(bits - (nw-1)*c) + 1).
    """
    top_width = bits - (bits // c) * c if bits % c else c
    if top_width > c - 2:
        raise ValueError(f"window c={c}: top window would overflow signed buckets")
    raw = _digits(scalars, c, bits)
    half = 1 << (c - 1)
    full = 1 << c
    nw = raw.shape[0]
    # Borrow chain as carry-lookahead: window i generates a borrow when
    # raw_i > half and propagates one when raw_i == half (then
    # raw_i + carry_in > half iff carry_in).  Kogge-Stone over the window
    # axis: log2(nw) whole-(nw, n) steps instead of nw sequential rows.
    gen = raw > half
    prop = raw == half
    shift = 1
    while shift < nw:
        gs = jnp.concatenate([jnp.zeros_like(gen[:shift]), gen[:-shift]], axis=0)
        ps = jnp.concatenate([jnp.zeros_like(prop[:shift]), prop[:-shift]], axis=0)
        gen = gen | (prop & gs)
        prop = prop & ps
        shift *= 2
    carry_in = jnp.concatenate(
        [jnp.zeros_like(gen[:1]), gen[:-1]], axis=0
    ).astype(raw.dtype)
    d = raw + carry_in
    signed = jnp.where(d > half, d - full, d)
    return jnp.concatenate([signed[:-1], d[-1:]], axis=0)


_SCAN_CHUNK = 1 << 14


def _compile_friendly() -> bool:
    """True on backends where pallas bodies inline into XLA (non-TPU)."""
    return jax.default_backend() != "tpu"


def _inclusive_scan_hs(pts: jnp.ndarray) -> jnp.ndarray:
    """Hillis-Steele prefix point-sum: ONE point-add instance scanned over
    ceil(log2 n) shift levels.

    n*log(n) adds instead of the tree's 2n — but a single inlined
    point-add body.  Used on non-TPU backends, where the Pallas interpreter
    inlines every instance into XLA and compile time (~10 s per instance on
    CPU) dwarfs execution; the TPU path keeps the work-efficient tree."""
    n = pts.shape[-1]
    if n == 1:
        return pts
    levels = (n - 1).bit_length()
    shifts = jnp.asarray([1 << k for k in range(levels)], dtype=jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)

    def body(x, sh):
        src = jnp.clip(idx - sh, 0)
        shifted = cj._point_select((idx < sh), identity_n, jnp.take(x, src, axis=-1))
        return kernels.point_add(x, shifted), None

    identity_n = cj.identity((n,))
    out, _ = jax.lax.scan(body, pts, shifts)
    return out


def _reduce_sum_tree(pts: jnp.ndarray) -> jnp.ndarray:
    """Sum of points along the lane axis -> ``(3, NLZ, 1)``."""
    n = pts.shape[-1]
    while n > 1:
        half = (n + 1) // 2
        if 2 * half != n:
            pts = jnp.concatenate([pts, cj.identity((2 * half - n,))], axis=-1)
        pts = kernels.point_add(pts[..., :half], pts[..., half:])
        n = half
    return pts


def _reduce_sum(pts: jnp.ndarray) -> jnp.ndarray:
    """Point sum along the batch axis -> ``(3, NLZ, 1)``."""
    if _compile_friendly():
        return _inclusive_scan_hs(pts)[..., -1:]
    # one pallas program: grid chunk accumulation + in-kernel granule tree
    return kernels.point_reduce(pts)


# ---------------------------------------------------------------------------
# Proof-scale MSM (n <= _PERM_MAX): sort/gather on the MXU
# ---------------------------------------------------------------------------
#
# The serial path below pays, per window, an argsort over n lanes and a
# 63-row dynamic gather — on a TPU both are far more expensive than the
# point additions they arrange.  For proof-scale widths (every prover/
# verifier MSM: IPP rounds at n+1, commitment MSMs at 2nm+1) the reorder is
# instead computed with dense one-hot algebra that rides the MXU:
#
# * **ranks without sort**: digits are c-bit values, so a stable sort rank
#   is counting: rank_j = (# keys < k_j) + (# earlier ties).  Both terms
#   come from the (n, B) one-hot matrix of the digits — a column cumsum and
#   a row dot — O(n*B) instead of an O(n log^2 n) bitonic sort.
# * **gather as a permutation matmul**: reordering 65 int32 rows by rank is
#   rows @ P with P the (n, n) 0/1 permutation matrix.  Limbs are split
#   into 7-bit halves so every operand is exact in bfloat16, and each
#   output column receives exactly one nonzero product — the f32
#   accumulation is exact.  Two (rows, n) x (n, n) MXU matmuls replace the
#   dynamic gather.
# * **window batching**: the per-window scans/bucket phases then run over a
#   (nw, n) trailing block — one tree, full lane utilization, no serial
#   window loop; bucket boundary positions fall out of the one-hot counts
#   (cumsum) so searchsorted disappears too.
#
# Above _PERM_MAX the (n, n) permutation matrix is no longer worth its
# bandwidth and the serial sort path below takes over.

_PERM_MAX = 12288


def _rank_by_digit(keys: jnp.ndarray, B: int):
    """Stable ascending sort ranks for ``(n,)`` int keys in [0, B).

    Returns ``(rank, counts)``: ``rank[j]`` is the sorted position of key j
    (ties by index), ``counts[v]`` the number of keys equal to v.
    """
    oh = (keys[:, None] == jnp.arange(B, dtype=keys.dtype)[None, :]).astype(
        jnp.int32
    )  # (n, B)
    counts = jnp.sum(oh, axis=0)  # (B,)
    below = jnp.cumsum(counts) - counts  # keys strictly less than v
    run = jnp.cumsum(oh, axis=0) - oh  # earlier ties, exclusive
    rank = jnp.sum(oh * (below[None, :] + run), axis=1)
    return rank, counts


def _permute_columns(rows: jnp.ndarray, rank: jnp.ndarray) -> jnp.ndarray:
    """Reorder ``(k, n)`` int32 columns so output column ``rank[j]`` is input
    column j.  Values must lie in (-2^14, 2^14) (SN limbs / digits do).

    Exact MXU form: 7-bit low/high splits (both exact in bf16; arithmetic
    shift keeps negatives consistent) against the 0/1 permutation matrix;
    each output element is a single product, so f32 accumulation is exact.
    """
    n = rows.shape[-1]
    perm = (rank[:, None] == jnp.arange(n, dtype=rank.dtype)[None, :]).astype(
        jnp.bfloat16
    )  # (n_src, n_dst)
    lo = (rows & 0x7F).astype(jnp.bfloat16)
    hi = (rows >> 7).astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    out_lo = jax.lax.dot_general(lo, perm, dims, preferred_element_type=jnp.float32)
    out_hi = jax.lax.dot_general(hi, perm, dims, preferred_element_type=jnp.float32)
    return (out_hi.astype(jnp.int32) << 7) + out_lo.astype(jnp.int32)


def _point_op_flat(op, *pts4):
    """Apply a (3, NLZ, lanes) point kernel over (3, NLZ, nw, w) batches."""
    nw, w = pts4[0].shape[-2], pts4[0].shape[-1]
    flat = [p.reshape(*p.shape[:-2], nw * w) for p in pts4]
    return op(*flat).reshape(*pts4[0].shape[:-1], w)


def _scan_batched(pts4: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix point-sum along the LAST axis of a (3, NLZ, nw, n)
    batch — each window scanned independently, all windows in one kernel."""
    nw = pts4.shape[-2]
    if _compile_friendly():
        # Hillis-Steele along the last axis (one point-add instance).
        n = pts4.shape[-1]
        levels = (n - 1).bit_length() if n > 1 else 0
        shifts = jnp.asarray([1 << k for k in range(levels)], dtype=jnp.int32)
        idx = jnp.arange(n, dtype=jnp.int32)
        ident = jnp.broadcast_to(cj.identity((1, 1)), pts4.shape)

        def body(x, sh):
            src = jnp.clip(idx - sh, 0)
            shifted = cj._point_select(
                (idx < sh)[None], ident, jnp.take(x, src, axis=-1)
            )
            return _point_op_flat(kernels.point_add, x, shifted), None

        out, _ = jax.lax.scan(body, pts4, shifts)
        return out
    n = pts4.shape[-1]
    if n == 1:
        return pts4
    if n % 2:
        pts4 = jnp.concatenate([pts4, cj.identity((nw, 1))], axis=-1)
    pairs = _point_op_flat(kernels.point_add, pts4[..., 0::2], pts4[..., 1::2])
    sp = _scan_batched(pairs)
    shifted = jnp.concatenate([cj.identity((nw, 1)), sp[..., :-1]], axis=-1)
    evens = _point_op_flat(kernels.point_add, shifted, pts4[..., 0::2])
    out = jnp.stack([evens, sp], axis=-1).reshape(
        *pts4.shape[:-1], pts4.shape[-1]
    )
    return out[..., :n]


def _reduce_batched(pts4: jnp.ndarray) -> jnp.ndarray:
    """Point sum along the last axis of (3, NLZ, nw, w) -> (3, NLZ, nw)."""
    nw = pts4.shape[-2]
    w = pts4.shape[-1]
    while w > 1:
        half = (w + 1) // 2
        if 2 * half != w:
            pts4 = jnp.concatenate([pts4, cj.identity((nw, 2 * half - w))], axis=-1)
        pts4 = _point_op_flat(kernels.point_add, pts4[..., :half], pts4[..., half:])
        w = half
    return pts4[..., 0]


# Max lanes per grid-scan step.  Round-5 sweep (granule-aligned widths,
# chained in-program iterations): L=16384 sustains ~139 Madds/s per step vs
# ~32 M at the round-4 width of 2560-5376 — per-step latency is nearly flat
# in L, so wider tiles amortize it.  L=32768 exceeds the scan kernel's
# VMEM budget.  Env-tunable for on-chip sweeps.
import os as _os

_SCAN_LANES = int(_os.environ.get("BP_SCAN_LANES", "16384"))


def _chunk_shape(W: int, n: int) -> tuple[int, int]:
    """Pick (chunks-per-window, steps): lanes ``L = W*nt`` as wide as the
    scoped-VMEM limit allows; ``T = ceil(n/nt)`` sequential grid steps."""
    nt = 1
    while W * nt * 2 <= _SCAN_LANES and nt * 2 <= n:
        nt *= 2
    return nt, -(-n // nt)


def _scan_lanes_hs(pts4: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix point-sum along the LAST axis of ``(3, NLZ, W, m)``:
    Hillis-Steele over the lane axis — ``log2(m)`` full-width point-add
    kernels instead of ``m`` sequential grid steps of ``W`` lanes.  Work is
    m*log(m) adds, but every add runs at the wide-batch kernel throughput,
    which beats the work-optimal sequential scan by >10x at chunk-offset
    shapes (m up to 1024, W ~ 10)."""
    m = pts4.shape[-1]
    sh = 1
    while sh < m:
        ident = jnp.broadcast_to(
            cj.identity((1, 1)), (*pts4.shape[:-1], sh)
        )
        shifted = jnp.concatenate([ident, pts4[..., :-sh]], axis=-1)
        pts4 = _point_op_flat(kernels.point_add, pts4, shifted)
        sh *= 2
    return pts4


def _windowed_bucket_sums(pts4: jnp.ndarray, pos: jnp.ndarray, B: int) -> jnp.ndarray:
    """Bucket phase over ``W`` windows at once -> per-window sums.

    ``pts4``: ``(3, NLZ, W, n)`` digit-sorted, sign-applied points.
    ``pos``: ``(W, B-1)`` sorted index of the last element with |digit| <= t
    for targets t = 0..B-2 (may be -1 when empty).

    Window value = sum_t (total - prefix[pos_t]) — the running-sum identity.
    On TPU the prefix runs as the grid-sequential pallas scan over contiguous
    chunks (``kernels.point_scan_steps``): work-optimal n adds, no XLA glue;
    chunk base offsets are fixed up only at the B-1 gathered boundaries.  On
    interpreter backends the one-instance Hillis-Steele scan keeps compile
    time sane.  Returns ``(W, 3, NLZ)`` (most-significant window last).
    """
    _, rows_nlz, W, n = pts4.shape
    valid = pos >= 0
    posc = jnp.clip(pos, 0)

    if _compile_friendly():
        cumsum = _scan_batched(pts4)  # (3, NLZ, W, n)
        total = cumsum[..., -1]  # (3, NLZ, W)
        cums = jnp.take_along_axis(cumsum, posc[None, None], axis=-1)
        return _bucket_sums_tail(cums, total, valid)
    nt, T = _chunk_shape(W, n)
    n2 = nt * T
    if n2 != n:
        pts4 = jnp.concatenate(
            [pts4, jnp.broadcast_to(cj.identity((1, 1)), (3, rows_nlz, W, n2 - n))],
            axis=-1,
        )
    # sorted position p = chunk*T + step: contiguous chunks on lanes,
    # steps on the sequential grid axis.
    x5 = pts4.reshape(3, rows_nlz, W, nt, T)
    x = jnp.transpose(x5, (0, 1, 4, 2, 3)).reshape(3, rows_nlz, T, W * nt)
    return _windowed_bucket_sums_prelaid(x, pos, B, W, nt, T)


def _windowed_bucket_sums_prelaid(x: jnp.ndarray, pos: jnp.ndarray, B: int,
                                  W: int, nt: int, T: int) -> jnp.ndarray:
    """Bucket phase over a PRE-LAID ``(3, NLZ, T, W*nt)`` tensor (sorted
    position ``p = chunk*T + step``; identity-padded to ``nt*T``): the grid
    scan walks the step axis in place — callers that gather points from a
    record table land them in this layout directly and skip the ~2.7 ms
    materialized transpose of the point tensor (round-5 profile)."""
    rows_nlz = x.shape[1]
    valid = pos >= 0
    posc = jnp.clip(pos, 0)
    prefix = kernels.point_scan_steps_inner(x)  # (3, NLZ, T, W*nt)
    prefix5 = prefix.reshape(3, rows_nlz, T, W, nt)
    # chunk totals -> per-window chunk prefix via a LOG-DEPTH lane scan:
    # a sequential grid scan here would be nt steps of only W lanes each
    # (~3-4 ms/round at the m=64 shape, round-4 profile); Hillis-Steele
    # over the lane axis is log2(nt) full-width adds.
    ct = prefix5[:, :, -1]  # (3, NLZ, W, nt) chunk totals
    cum = _scan_lanes_hs(ct)  # inclusive prefix over nt
    total = cum[..., -1]  # (3, NLZ, W)
    offex = jnp.concatenate(
        [cj.identity((W, 1)), cum[..., :-1]], axis=-1
    )  # (3, NLZ, W, nt) exclusive offsets
    # gather the B-1 boundary prefixes and add their chunk offsets
    cpos = posc // T
    r = posc % T
    w_col = jnp.arange(W, dtype=pos.dtype)[:, None]
    within = prefix5[:, :, r, w_col, cpos]  # (3, NLZ, W, B-1)
    offsel = offex[:, :, w_col, cpos]  # (3, NLZ, W, B-1)
    cums = _point_op_flat(kernels.point_add, within, offsel)
    return _bucket_sums_tail(cums, total, valid)


def _bucket_sums_fetch_prelaid(fetch, ident_idx: int, rec_g, neg_g, pos,
                               B: int, W: int, n: int):
    """Gather-fed bucket phase in the scan layout (TPU path).

    ``fetch(order) -> (3, NLZ, *order.shape)`` gathers table records;
    ``ident_idx`` must reference an identity record (used to pad ``n`` up
    to ``nt*T``).  The int32 index/sign arrays are transposed instead of
    the 240x larger point tensor."""
    nt, T = _chunk_shape(W, n)
    n2 = nt * T
    if n2 != n:
        rec_g = jnp.pad(
            rec_g, [(0, 0), (0, n2 - n)], constant_values=ident_idx
        )
        neg_g = jnp.pad(neg_g, [(0, 0), (0, n2 - n)])
    rec_t = jnp.transpose(rec_g.reshape(W, nt, T), (2, 0, 1)).reshape(-1)
    neg_t = jnp.transpose(neg_g.reshape(W, nt, T), (2, 0, 1)).reshape(-1)
    pts = fetch(rec_t)  # (3, NLZ, T*W*nt)
    pts = cj._point_select(neg_t != 0, cj._point_neg(pts), pts)
    x = pts.reshape(3, pts.shape[1], T, W * nt)
    return _windowed_bucket_sums_prelaid(x, pos, B, W, nt, T)


def _bucket_sums_tail(cums, total, valid):
    """Shared tail: mask empty boundaries, form suffix sums, reduce."""
    cums = cj._point_select(
        ~valid, jnp.broadcast_to(cj.identity((1, 1)), cums.shape), cums
    )
    s_vals = _point_op_flat(
        kernels.point_add,
        jnp.broadcast_to(total[..., None], cums.shape),
        _point_op_flat(kernels.point_neg, cums),
    )
    return jnp.moveaxis(_reduce_batched(s_vals), -1, 0)  # (W, 3, NLZ)


def _horner_windows(window_sums: jnp.ndarray, c: int) -> jnp.ndarray:
    """Combine ``(nw, 3, NLZ)`` window sums: c doublings + 1 add per window."""
    return _horner_windows_multi(window_sums[..., None], c)[..., 0]


def _horner_windows_multi(window_sums: jnp.ndarray, c: int) -> jnp.ndarray:
    """Horner window combine for ``k`` independent MSM outputs at once.

    ``window_sums``: ``(nw, 3, NLZ, k)`` — the k outputs ride the lane axis
    of the SAME serial doubling chain, so a merged L/R pair (or a whole
    verification batch) pays the ~nw*(c+1) sequential point ops once.

    On TPU the whole chain is ONE grid-sequential pallas program
    (:func:`.kernels.point_horner_multi`); the lax.scan fallback keeps a
    single inlined point-add instance for interpreter backends.
    """
    k = window_sums.shape[-1]
    if not _compile_friendly() and k <= kernels._GRAN:
        return kernels.point_horner_multi(window_sums, c)

    def horner_body(acc, w_sum):
        for _ in range(c):
            acc = kernels.point_add(acc, acc)
        acc = kernels.point_add(acc, w_sum)
        return acc, None

    acc, _ = jax.lax.scan(
        horner_body, cj.identity((k,)), window_sums, reverse=True
    )
    return acc


def _msm_batched_impl(scalars: jnp.ndarray, points: jnp.ndarray, c: int,
                      bits: int = FIELD_BITS):
    """MSM with MXU reorder + window-batched bucket phase (n <= _PERM_MAX)."""
    n = scalars.shape[-1]
    B = (1 << (c - 1)) + 1
    rows_nlz = points.shape[1]

    digits = _signed_digits(scalars, c, bits)  # (nw, n)
    keys = jnp.abs(digits)
    negs = (digits < 0).astype(jnp.int32)
    pts_rows = points.reshape(3 * rows_nlz, n)

    def reorder_one(_, inputs):
        k_w, neg_w = inputs
        rank, counts = _rank_by_digit(k_w, B)
        rows = jnp.concatenate([pts_rows, neg_w[None]], axis=0)
        out = _permute_columns(rows, rank)
        return None, (out, counts)

    _, (sorted_rows, counts) = jax.lax.scan(reorder_one, None, (keys, negs))
    # sorted_rows: (nw, 3*NLZ + 1, n); counts: (nw, B)
    pts4 = jnp.moveaxis(sorted_rows[:, : 3 * rows_nlz], 0, -2).reshape(
        3, rows_nlz, digits.shape[0], n
    )
    neg4 = sorted_rows[:, 3 * rows_nlz]  # (nw, n)
    pts4 = cj._point_select(neg4 != 0, _point_op_flat(kernels.point_neg, pts4), pts4)

    # boundary positions from the one-hot counts
    ends = jnp.cumsum(counts, axis=-1)  # (nw, B)
    pos = ends[:, : B - 1] - 1  # (nw, B-1) for targets 0..B-2
    window_sums = _windowed_bucket_sums(pts4, pos, B)
    return _horner_windows(window_sums, c)


def _msm_batched_pair_impl(sA: jnp.ndarray, pA: jnp.ndarray,
                           sB: jnp.ndarray, pB: jnp.ndarray,
                           c: int, bits: int = FIELD_BITS) -> jnp.ndarray:
    """TWO same-width MSMs as one program -> ``(3, NLZ, 2)``.

    The IPP prover needs an L and an R MSM every round
    (reference src/inner_product_proof.rs:90-114); merging them doubles the
    window axis of the shared bucket phase and runs ONE Horner chain with
    both outputs on the lane axis — the serial window-combine (the dominant
    per-MSM cost at proof scale) is paid once instead of twice.
    """
    n = sA.shape[-1]
    B = (1 << (c - 1)) + 1
    rows_nlz = pA.shape[1]

    dA = _signed_digits(sA, c, bits)
    dB = _signed_digits(sB, c, bits)
    nw = dA.shape[0]
    digits = jnp.concatenate([dA, dB], axis=0)  # (2nw, n)
    keys = jnp.abs(digits)
    negs = (digits < 0).astype(jnp.int32)
    rowsA = pA.reshape(3 * rows_nlz, n)
    rowsB = pB.reshape(3 * rows_nlz, n)
    which = (jnp.arange(2 * nw, dtype=jnp.int32) < nw)

    def reorder_one(_, inputs):
        k_w, neg_w, isA = inputs
        rank, counts = _rank_by_digit(k_w, B)
        src = jnp.where(isA, rowsA, rowsB)
        rows = jnp.concatenate([src, neg_w[None]], axis=0)
        out = _permute_columns(rows, rank)
        return None, (out, counts)

    _, (sorted_rows, counts) = jax.lax.scan(reorder_one, None, (keys, negs, which))
    pts4 = jnp.moveaxis(sorted_rows[:, : 3 * rows_nlz], 0, -2).reshape(
        3, rows_nlz, 2 * nw, n
    )
    neg4 = sorted_rows[:, 3 * rows_nlz]
    pts4 = cj._point_select(neg4 != 0, _point_op_flat(kernels.point_neg, pts4), pts4)

    ends = jnp.cumsum(counts, axis=-1)
    pos = ends[:, : B - 1] - 1
    window_sums = _windowed_bucket_sums(pts4, pos, B)  # (2nw, 3, NLZ)
    pair = jnp.stack(
        [window_sums[:nw], window_sums[nw:]], axis=-1
    )  # (nw, 3, NLZ, 2)
    return _horner_windows_multi(pair, c)


msm_device_pair = functools.partial(jax.jit, static_argnums=(4, 5))(
    _msm_batched_pair_impl
)


def _pack_rows16(points: jnp.ndarray) -> jnp.ndarray:
    """Pack limb-row pairs into 16-bit fields of one int32: ``(3, R, n)`` ->
    ``(3, ceil(R/2), n)``.  Halves the rows moved by the digit-order point
    gather (TPU gathers are element-throughput-bound).  Valid for limb
    values < 2^16 (canonical limbs are < 2^13; lazy carries stay well
    under 2^16)."""
    rows = points.shape[1]
    if rows % 2:
        points = jnp.concatenate(
            [points, jnp.zeros_like(points[:, :1])], axis=1
        )
    lo = points[:, 0::2]
    hi = points[:, 1::2]
    return lo | (hi << 16)


def _unpack_rows16(pk: jnp.ndarray, rows: int) -> jnp.ndarray:
    """Inverse of :func:`_pack_rows16` over any trailing shape."""
    lo = pk & 0xFFFF
    hi = (pk >> 16) & 0xFFFF
    out = jnp.stack([lo, hi], axis=2).reshape(
        pk.shape[0], 2 * pk.shape[1], *pk.shape[2:]
    )
    return out[:, :rows]


# Measured on v5e: row-major gathers of <= 24 int32 per record run at
# 95-176 M records/s; 32-row records collapse to ~25 M/s (the record no
# longer fits whatever the gather engine moves per descriptor).  All
# digit-order point gathers therefore move row-major tables whose record
# width stays under this cliff.
_GATHER_ROW_SPLIT = 16


_PACK13_WORDS = 8  # canonical coords < p < 2^252 fit 8 dense 32-bit words


def _pack13(coord: jnp.ndarray) -> jnp.ndarray:
    """Canonical ``(NLZ, n)`` 13-bit limbs (value < 2^252) -> ``(8, n)``
    dense 32-bit words (bit k of the value lands in word k//32 bit k%32)."""
    words = []
    for w in range(_PACK13_WORDS):
        lo = 32 * w
        acc = None
        for i in range(lo // BASE_BITS, min(NL, -(-(lo + 32) // BASE_BITS))):
            sh = BASE_BITS * i - lo
            term = coord[i] << sh if sh >= 0 else coord[i] >> (-sh)
            acc = term if acc is None else acc | term
        words.append(acc)
    return jnp.stack(words)


def _unpack13(words: jnp.ndarray, rows_nlz: int) -> jnp.ndarray:
    """Inverse of :func:`_pack13` over any batch shape (top limbs zero).

    Int32-sign-safe: every partial extraction masks to the bits actually
    taken from its word before OR-ing the continuation bits."""
    limbs = []
    for i in range(NL):
        lo = BASE_BITS * i
        k, off = divmod(lo, 32)
        take = min(BASE_BITS, 32 - off)
        v = (words[k] >> off) & ((1 << take) - 1)
        if take < BASE_BITS and k + 1 < _PACK13_WORDS:
            v = v | ((words[k + 1] & ((1 << (BASE_BITS - take)) - 1)) << take)
        limbs.append(v)
    limbs.extend([jnp.zeros_like(limbs[0])] * (rows_nlz - NL))
    return jnp.stack(limbs)


def _rows_affine_table(points: jnp.ndarray):
    """``(3, NLZ, n)`` affine-or-identity points -> ``(n, 16)`` row table.

    Affine device points (everything :func:`.curve_jax.points_from_host`
    produces: decompressed proof points, generators) have ``z`` equal to
    the Montgomery-form 1 (limbs of ``FP.mont_r``) — or 0 for the identity
    — and canonical coordinates < p < 2^252.  x and y therefore pack into
    8 dense 32-bit words each, and the identity indicator rides in x's
    spare bit 252 (word 7 bit 28): a 16-int32 record, well under the
    24-row gather cliff, ONE gather per point, 30% less gather traffic
    than 16-bit limb-pair packing.
    """
    px = _pack13(points[0])  # (8, n)
    py = _pack13(points[1])
    nz = jnp.any(points[2] != 0, axis=0).astype(jnp.int32)  # 0 iff identity
    px = px.at[7].set(px[7] | (nz << 28))
    return jnp.concatenate([px, py], axis=0).T  # (n, 16)


_MONT_ONE_LIMBS = cj.identity(())[1]  # (NLZ,) limbs of R = 1 in Montgomery form


def _rows_affine_fetch(table: jnp.ndarray, order: jnp.ndarray) -> jnp.ndarray:
    """Gather ``order`` (any shape) rows -> points ``(3, NLZ, *order.shape)``."""
    g = jnp.moveaxis(table[order], -1, 0)  # (16, *order.shape)
    rows_nlz = _MONT_ONE_LIMBS.shape[0]
    nz = (g[7] >> 28) & 1
    xw = jnp.concatenate([g[:7], (g[7] & ((1 << 28) - 1))[None]], axis=0)
    x = _unpack13(xw, rows_nlz)
    y = _unpack13(g[8:16], rows_nlz)
    one = _MONT_ONE_LIMBS.reshape(rows_nlz, *([1] * nz.ndim))
    z = one * nz[None]
    return jnp.stack([x, y, z], axis=0)


def _rows_general_table(points: jnp.ndarray):
    """``(3, R, n)`` projective points -> two row tables each <= 16 wide."""
    n = points.shape[-1]
    flat = _pack_rows16(points).reshape(-1, n).T  # (n, 3P)
    return flat[:, :_GATHER_ROW_SPLIT], flat[:, _GATHER_ROW_SPLIT:]


def _rows_general_fetch(tables, order: jnp.ndarray, rows_nlz: int) -> jnp.ndarray:
    ta, tb = tables
    g = jnp.concatenate([ta[order], tb[order]], axis=-1)
    rows = jnp.moveaxis(g, -1, 0)  # (3P, *order.shape)
    return _unpack_rows16(rows.reshape(3, -1, *rows.shape[1:]), rows_nlz)


_GROUP_BUDGET = 1 << 23  # window-group lanes: 2*240B*budget of HBM in flight


def _window_group(nw: int, n: int) -> int:
    """Windows per serial-path scan step: the largest divisor of ``nw`` whose
    group keeps the sorted-point + prefix tensors within ~4 GB of HBM
    (``2 * 240 B * Wg * n``) — wide lanes for the grid scan, bounded
    footprint at n = 2^20.  Measured on v5e at n=2^20/c=16: wg=8 beats
    wg=4 by 1.13x (2.01 vs 1.77 Mpoints/s); wg=2 drops to 1.15."""
    budget = max(1, _GROUP_BUDGET // n)
    best = 1
    for d in range(1, nw + 1):
        if nw % d == 0 and d <= budget:
            best = d
    return best


def _msm_device_impl(scalars: jnp.ndarray, points: jnp.ndarray, c: int | None = None,
                     bits: int = FIELD_BITS, affine: bool = False):
    """MSM over ``(NL, n)`` scalars and ``(3, NL, n)`` points -> ``(3, NL)``.

    ``affine=True`` promises every point has ``z in {0, mont_one}`` (the
    :func:`.curve_jax.points_from_host` invariant) and gathers 21-row
    records instead of 30 (see the gather-cliff note above).
    """
    n = scalars.shape[-1]
    if c is None:
        c = select_window(n, bits)
    if 1 < n <= _PERM_MAX:
        return _msm_batched_impl(scalars, points, c, bits)
    B = (1 << (c - 1)) + 1  # signed buckets: |digit| in [0, 2^(c-1)]

    digits = _signed_digits(scalars, c, bits)  # (nw, n) in [-2^(c-1), 2^(c-1)]
    nw = digits.shape[0]
    keys = jnp.abs(digits)
    # ONE two-operand sort: the key is |digit|; the payload packs the source
    # index with the sign bit (index needs log2(n) bits, sign one more — n up
    # to 2^30).  vs argsort + take_along_axis passes, or a third sort
    # operand: the sort network moves every operand through every compare
    # stage, so each packed-away operand is a third of the sort's data.
    sh = max(1, (n - 1).bit_length())
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (nw, n))
    payload = iota | ((digits < 0).astype(jnp.int32) << sh)
    d_sorted, pay_sorted = jax.lax.sort((keys, payload), dimension=-1, num_keys=1)
    order = pay_sorted & ((1 << sh) - 1)
    neg_sorted = pay_sorted >> sh
    wg = _window_group(nw, n)
    grp = lambda a: a.reshape(nw // wg, wg, n)

    # gather points as row-major records (digit-order point transport is
    # the dominant MSM cost on TPU; see the gather-cliff note above)
    nlz_rows = points.shape[1]
    if affine:
        # trailing identity record pads the pre-laid fetch — it must be the
        # REAL projective identity (0, 1_mont, 0); an all-zero row is not a
        # valid point for the complete formulas
        table = jnp.concatenate(
            [_rows_affine_table(points), _rows_affine_table(cj.identity((1,)))],
            axis=0,
        )
        fetch = lambda og: _rows_affine_fetch(table, og)
    else:
        ta, tb = _rows_general_table(points)
        ia, ib = _rows_general_table(cj.identity((1,)))
        tables = (
            jnp.concatenate([ta, ia], axis=0),
            jnp.concatenate([tb, ib], axis=0),
        )
        fetch = lambda og: _rows_general_fetch(tables, og, nlz_rows)

    def group_body(_, inputs):
        order_g, d_g, neg_g = inputs  # (wg, n) each
        # cum_{j-1} for j = 1..B-1: last prefix position with digit <= j-1
        targets = jnp.arange(0, B - 1, dtype=d_g.dtype)
        pos = jax.vmap(
            lambda d: jnp.searchsorted(d, targets, side="right") - 1
        )(d_g)
        if _compile_friendly():
            pts = fetch(order_g)  # (3, NLZ, wg, n)
            pts = cj._point_select(
                neg_g != 0, _point_op_flat(kernels.point_neg, pts), pts
            )
            return None, _windowed_bucket_sums(pts, pos, B)  # (wg, 3, NLZ)
        return None, _bucket_sums_fetch_prelaid(
            fetch, n, order_g, neg_g, pos, B, wg, n
        )

    _, wins = jax.lax.scan(
        group_body, None, (grp(order), grp(d_sorted), grp(neg_sorted))
    )
    return _horner_windows(wins.reshape(nw, *wins.shape[2:]), c)


def msm_host_points(scalars, points, c: int | None = None):
    """Host API: lists of ``Scalar`` / ``StarkPoint`` -> ``StarkPoint``, on TPU."""
    s = cj.scalars_from_host(scalars)
    p = cj.points_from_host(points)  # affine-or-identity by construction
    out = msm_device(s, p, c, FIELD_BITS, True)
    return cj.points_to_host(out[..., None])[0]


msm_device = functools.partial(jax.jit, static_argnums=(2, 3, 4))(_msm_device_impl)


# ---------------------------------------------------------------------------
# 64-bit scalar-chunk splitting against pre-shifted bases (fixed-generator
# MSMs: IPP rounds, commitment MSMs).  Mirrors the native split tables
# (native/bpcore.cpp bp_points_new_split): s*P = sum_j chunk_j(s) * (2^64j P),
# so the Horner window-combine chain shrinks from 252 to 64 doublings and
# the window count from ~18-50 to ~5 — the serial tail of the device MSM.
# Bucket-phase work is invariant (4n points x 64 bits == n x 252).
# ---------------------------------------------------------------------------

SPLIT_CHUNK_BITS = 64
SPLIT_CHUNKS = 4


def split_points_device(points: jnp.ndarray) -> jnp.ndarray:
    """``(3, NLZ, n)`` -> ``(3, NLZ, 4n)`` blocks [P | 2^64 P | 2^128 P | 2^192 P].

    192 sequential full-width doublings (complete-formula adds); one-time
    per generator set — cache the result next to the gens device arrays.
    """
    def dbl(p, _):
        return kernels.point_add(p, p), None

    blocks = [points]
    for _ in range(SPLIT_CHUNKS - 1):
        # lax.scan keeps ONE point-add instance in the program (192 unrolled
        # adds take minutes to compile on the CPU backend)
        p, _ = jax.lax.scan(dbl, blocks[-1], None, length=SPLIT_CHUNK_BITS)
        blocks.append(p)
    return jnp.concatenate(blocks, axis=-1)


def split_scalars_device(scalars: jnp.ndarray) -> jnp.ndarray:
    """``(NL, n)`` -> ``(NL, 4n)``: chunk j holds bits [64j, 64j+64) in the
    low limbs (block-major order matching :func:`split_points_device`)."""
    n = scalars.shape[-1]
    chunks = []
    for j in range(SPLIT_CHUNKS):
        rows = []
        for t in range(NL):
            lo = SPLIT_CHUNK_BITS * j + BASE_BITS * t
            width = min(BASE_BITS, SPLIT_CHUNK_BITS * (j + 1) - lo)
            if BASE_BITS * t >= SPLIT_CHUNK_BITS or lo >= FIELD_BITS + BASE_BITS:
                rows.append(jnp.zeros((n,), dtype=scalars.dtype))
                continue
            # gather bits [lo, lo+width) of the original limb tensor
            k, off = divmod(lo, BASE_BITS)
            val = scalars[k] >> off if k < NL else jnp.zeros((n,), scalars.dtype)
            got = BASE_BITS - off
            k += 1
            while got < width and k < NL:
                take = min(BASE_BITS, width - got)
                val = val | ((scalars[k] & ((1 << take) - 1)) << got)
                got += take
                k += 1
            rows.append(val & ((1 << width) - 1))
        chunks.append(jnp.stack(rows, axis=0))
    return jnp.concatenate(chunks, axis=-1)


def _msm_split_impl(scalars: jnp.ndarray, points4: jnp.ndarray,
                    c: int | None = None):
    """MSM of ``(NL, n)`` scalars against a pre-shifted ``(3, NLZ, 4n)``
    table; 64-bit chunk windows."""
    s4 = split_scalars_device(scalars)
    if c is None:
        c = select_window(s4.shape[-1], SPLIT_CHUNK_BITS)
    return _msm_device_impl(s4, points4, c, SPLIT_CHUNK_BITS)


msm_device_split = functools.partial(jax.jit, static_argnums=(2,))(_msm_split_impl)


# ---------------------------------------------------------------------------
# Split-table MSMs against a shared packed affine record table.
#
# The fused provers' MSMs all hit FIXED bases (the G/H generator chains and
# the Pedersen base B; the IPP's Q = w*B rides B with scalar c_L*w).  A
# per-gens cached table of the 2^64-shifted affine records lets every such
# MSM run as 64-bit chunks: the serial Horner window-combine drops from
# ~252+nw to ~nw_64*(c+1) ~ 72 grid steps, the digit-order point transport
# rides the 16-word record gather (the measured fast path), and the MXU
# permutation matrix (whose (n, n) footprint outgrows bandwidth past
# ~12k lanes) is not needed at all — ranks come from one lax.sort.
# ---------------------------------------------------------------------------


def build_split_affine_table(points: jnp.ndarray) -> jnp.ndarray:
    """``(3, NLZ, n)`` affine base points -> ``(4n + 1, 16)`` packed records
    of ``[P | 2^64 P | 2^128 P | 2^192 P]`` plus a trailing IDENTITY record
    (the pre-laid bucket fetch pads with it) — jittable; cache per gens."""
    pts4 = split_points_device(points)          # 192 sequential doublings
    aff = cj._to_affine_mont(pts4)              # one batched Fermat ladder
    tab = _rows_affine_table(aff)
    ident_row = _rows_affine_table(cj.identity((1,)))  # (0, 1_mont, z=0)
    return jnp.concatenate([tab, ident_row], axis=0)


def split_record_indices(base_idx: "np.ndarray", n_table: int) -> "np.ndarray":
    """Static lane->record map for split MSMs: lane ``b*(k) + i`` (chunk-
    block-major, matching :func:`split_scalars_device`) reads record
    ``b*n_table + base_idx[i]``."""
    import numpy as np

    k = base_idx.shape[0]
    blocks = np.arange(SPLIT_CHUNKS, dtype=np.int32)[:, None] * np.int32(n_table)
    return (blocks + base_idx[None, :].astype(np.int32)).reshape(SPLIT_CHUNKS * k)


def _msm_multi_table_impl(parts, table: jnp.ndarray, c: int,
                          bits: int = SPLIT_CHUNK_BITS) -> jnp.ndarray:
    """``k`` same-width MSMs against one packed affine record table ->
    ``(3, NLZ, k)``.

    ``parts``: list of ``(scalars, recs)`` — ``(NL, n)`` pre-split 64-bit
    chunk scalars and the ``(n,)`` int32 record indices of their points.
    All MSMs share one digit sort, one bucket phase (their windows ride the
    window axis together) and ONE Horner combine with the k outputs on the
    lane axis (reference hot spot: the per-round L/R MSM pair,
    src/inner_product_proof.rs:90-114).
    """
    k = len(parts)
    n = parts[0][0].shape[-1]
    B = (1 << (c - 1)) + 1

    digit_rows = [_signed_digits(s, c, bits) for s, _ in parts]
    nw = digit_rows[0].shape[0]
    digits = jnp.concatenate(digit_rows, axis=0)            # (k*nw, n)
    keys = jnp.abs(digits)
    sh = max(1, (n - 1).bit_length())
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], digits.shape)
    payload = iota | ((digits < 0).astype(jnp.int32) << sh)
    d_sorted, pay = jax.lax.sort((keys, payload), dimension=-1, num_keys=1)
    order = pay & ((1 << sh) - 1)                           # (k*nw, n)
    negs = pay >> sh

    # lane -> table record, per originating MSM (static per-window select)
    rec_stack = jnp.stack([r for _, r in parts], axis=0)    # (k, n)
    which = jnp.repeat(jnp.arange(k, dtype=jnp.int32), nw)  # (k*nw,)
    recs = jnp.take_along_axis(
        jnp.take(rec_stack, which, axis=0), order, axis=-1
    )                                                       # (k*nw, n)

    W = k * nw
    wg = _window_group(W, n)
    grp = lambda a: a.reshape(W // wg, wg, n)

    def group_body(_, inputs):
        rec_g, d_g, neg_g = inputs
        targets = jnp.arange(0, B - 1, dtype=d_g.dtype)
        pos = jax.vmap(
            lambda d: jnp.searchsorted(d, targets, side="right") - 1
        )(d_g)
        if _compile_friendly():
            pts = _rows_affine_fetch(table, rec_g)          # (3, NLZ, wg, n)
            pts = cj._point_select(
                neg_g != 0, _point_op_flat(kernels.point_neg, pts), pts
            )
            return None, _windowed_bucket_sums(pts, pos, B)
        # pre-laid fetch: transpose the (cheap, int32) INDEX arrays into the
        # grid-scan layout and gather records straight into it — the point
        # tensor never exists in (W, n) order, so no materialized transpose
        return None, _bucket_sums_fetch_prelaid(
            lambda o: _rows_affine_fetch(table, o),
            int(table.shape[0]) - 1,  # identity record (builder appends it)
            rec_g, neg_g, pos, B, wg, n,
        )

    _, wins = jax.lax.scan(
        group_body, None, (grp(recs), grp(d_sorted), grp(negs))
    )
    wins = wins.reshape(W, 3, NLZ)                          # window-major
    multi = jnp.stack(
        [wins[i * nw : (i + 1) * nw] for i in range(k)], axis=-1
    )                                                       # (nw, 3, NLZ, k)
    return _horner_windows_multi(multi, c)


# ---------------------------------------------------------------------------
# Fixed-base windowed tables (Pedersen commitments inside fused provers).
#
# A 252-step Shamir double-and-add scan costs ~504 sequential granule
# point-adds regardless of lane count; every fused-prover Pedersen commit
# (V_j, T_1/T_2, Q, the A/S blind terms) was one of those.  With an 8-bit
# window table  T[w, d] = d * 2^(8w) * B  (w < 32, d < 256) a commit is 32
# gathered points + a log-depth tree — ~6 granule adds for a whole batch.
# Tables are built on device ONCE per base (one jitted program), converted
# to affine, and stored as packed 16-word gather records
# (:func:`_rows_affine_table`); callers cache them next to the generator
# device arrays.
# ---------------------------------------------------------------------------

FB_WINDOW_BITS = 8
FB_WINDOWS = 32  # 32 * 8 = 256 bits >= 252
FB_TABLE = 1 << FB_WINDOW_BITS


def fixed_base_table(base_pt: jnp.ndarray) -> jnp.ndarray:
    """``(3, NLZ, 1)`` point -> ``(FB_WINDOWS * FB_TABLE, 16)`` packed affine
    row table of all windowed multiples (row ``w * 256 + d`` = ``d 2^{8w} B``).

    One-time per base; the whole build is jit-compiled (doubling ladder +
    one batched Fermat inversion for the affine convert).
    """
    from . import transcript_jax as tj

    @jax.jit
    def build(b):
        # multiples [0..255] * B by doubling concat: out_{2k} = out_k ++ (out_k + kB)
        row = jnp.concatenate([cj.identity((1,)), b], axis=-1)
        step = kernels.point_add(b, b)  # 2B
        while row.shape[-1] < FB_TABLE:
            # explicit broadcast: point_add zero-PADS ragged widths, it does
            # not broadcast a 1-lane operand
            row = jnp.concatenate(
                [row, kernels.point_add(row, jnp.broadcast_to(step, row.shape))],
                axis=-1,
            )
            step = kernels.point_add(step, step)

        def shift8(r, _):
            for _ in range(FB_WINDOW_BITS):
                r = kernels.point_add(r, r)
            return r, r

        _, shifted = jax.lax.scan(shift8, row, None, length=FB_WINDOWS - 1)
        all_rows = jnp.concatenate(
            [row[None], shifted], axis=0
        )  # (FB_WINDOWS, 3, NLZ, FB_TABLE)
        flat = jnp.moveaxis(all_rows, 0, -2).reshape(
            3, all_rows.shape[2], FB_WINDOWS * FB_TABLE
        )
        x, y, is_id = tj.lazy_points_to_affine(flat)
        # back to Montgomery form: the gather/fetch path (and every point
        # kernel) works on x*R coordinates, lazy_points_to_affine strips R.
        r_limbs = jnp.asarray(limb.int_to_limbs_np(_MONT_ONE_INT, NL))
        x = limb._mod_mul(x, r_limbs, limb.FP)
        y = limb._mod_mul(y, r_limbs, limb.FP)
        pad = lambda a: jnp.pad(a, [(0, all_rows.shape[2] - a.shape[0]), (0, 0)])
        one = jnp.asarray(limb.int_to_limbs_np(_MONT_ONE_INT, all_rows.shape[2]))
        z = jnp.where(is_id[None, :], 0, jnp.broadcast_to(one, pad(x).shape))
        return _rows_affine_table(jnp.stack([pad(x), pad(y), z], axis=0))

    from . import limb

    return build(base_pt)


def _fb_digits(scalars: jnp.ndarray) -> jnp.ndarray:
    """``(NL, k)`` limbs -> ``(FB_WINDOWS, k)`` 8-bit digits (LSB window 0)."""
    rows = []
    for w in range(FB_WINDOWS):
        lo = FB_WINDOW_BITS * w
        a, off = divmod(lo, BASE_BITS)
        if a >= scalars.shape[0]:
            rows.append(jnp.zeros_like(scalars[0]))
            continue
        v = scalars[a] >> off
        if a + 1 < scalars.shape[0]:
            v = v | (scalars[a + 1] << (BASE_BITS - off))
        rows.append(v & (FB_TABLE - 1))
    return jnp.stack(rows, axis=0)


def fixed_commit(table: jnp.ndarray, base_off_l: jnp.ndarray, sc_l: jnp.ndarray,
                 base_off_r: jnp.ndarray, sc_r: jnp.ndarray) -> jnp.ndarray:
    """Batched two-base fixed commitment ``sc_l * base_l + sc_r * base_r``.

    ``table``: concatenation of per-base :func:`fixed_base_table` rows.
    ``base_off_*``: ``(k,)`` row offsets selecting each lane's base (multiples
    of ``FB_WINDOWS * FB_TABLE``).  ``sc_*``: ``(NL, k)`` scalars.
    Returns ``(3, NLZ, k)`` points.
    """
    k = sc_l.shape[-1]
    w_off = jnp.arange(FB_WINDOWS, dtype=jnp.int32)[:, None] * FB_TABLE
    idx_l = base_off_l[None, :] + w_off + _fb_digits(sc_l)
    idx_r = base_off_r[None, :] + w_off + _fb_digits(sc_r)
    idx = jnp.concatenate([idx_l, idx_r], axis=0)  # (2*FB_WINDOWS, k)
    pts = _rows_affine_fetch(table, idx)  # (3, NLZ, 2*FB_WINDOWS, k)
    w = pts.shape[-2]
    while w > 1:
        half = w // 2
        pts = _point_op_flat(kernels.point_add, pts[..., :half, :], pts[..., half : 2 * half, :])
        w = half
    return pts[..., 0, :]


_MONT_ONE_INT = cj.FP.mont_r
