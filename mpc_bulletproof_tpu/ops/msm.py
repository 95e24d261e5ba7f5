"""Variable-base multi-scalar multiplication on TPU (Pippenger).

The flagship kernel (SURVEY.md §7.1 F4): every prover/verifier hot spot in
the reference is an MSM (``StarkPoint::msm_iter`` — 13 call sites; verifier
mega-check src/r1cs/verifier.rs:516-547; IPP round L/R
src/inner_product_proof.rs:90-114).

Design (TPU-first, branchless):

1. **Digits**: scalars are decomposed into ``ceil(252/c)`` windows of ``c``
   bits.  With ``c = 13`` a scalar's limbs *are* its digits (see
   :mod:`.limb`).
2. **Bucket accumulation without scatter**: points are sorted by digit per
   window (one batched XLA sort), then an *unsegmented* inclusive prefix
   scan of points is taken.  Because group elements have cheap inverses,
   per-bucket sums never need a segmented scan:

       cum_b   = prefix[last index with digit <= b]
       S_j     = total - cum_{j-1}          (sum of buckets >= j)
       window  = sum_{j=1..B-1} S_j         (the classic running-sum value)

   so the whole bucket phase is one scan, one gather, one batched
   subtract-add, and one tree reduction — all complete-formula point adds
   (:mod:`.kernels`), ~``2n + 2^c`` adds per window.
3. **Window combination**: Horner over windows, ``c`` doublings + 1 add per
   window (``lax.scan`` so the graph stays small).

The prefix scan is a halving tree (2n work, log n depth), not Hillis-Steele
(n log n): on a VPU both cost the same per level, but the tree's level
widths shrink geometrically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import curve_jax as cj
from . import kernels
from .limb import BASE_BITS, NL

FIELD_BITS = 252


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def select_window(n: int) -> int:
    """Pick the Pippenger window size minimizing ~windows*(2n + 2^c)."""
    best_c, best_cost = 4, None
    for c in range(4, 14):
        windows = -(-FIELD_BITS // c)
        cost = windows * (2 * n + (1 << c))
        if best_cost is None or cost < best_cost:
            best_c, best_cost = c, cost
    return best_c


def _digits(scalars: jnp.ndarray, c: int) -> jnp.ndarray:
    """``(NL, n)`` limbs -> ``(num_windows, n)`` c-bit digit rows."""
    n = scalars.shape[-1]
    # bits: (NL*13, n)
    bits = jnp.stack(
        [(scalars[i] >> j) & 1 for i in range(NL) for j in range(BASE_BITS)], axis=0
    )[:FIELD_BITS]
    nw = -(-FIELD_BITS // c)
    pad = nw * c - FIELD_BITS
    if pad:
        bits = jnp.pad(bits, [(0, pad), (0, 0)])
    weights = jnp.asarray([1 << j for j in range(c)], dtype=jnp.int32)[None, :, None]
    return jnp.sum(bits.reshape(nw, c, n) * weights, axis=1)


def _inclusive_scan(pts: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix point-sum along the lane axis (halving tree, 2n adds)."""
    n = pts.shape[-1]
    if n == 1:
        return pts
    pairs = kernels.point_add(pts[..., 0::2], pts[..., 1::2])
    sp = _inclusive_scan(pairs)  # prefix sums of pairs
    shifted = jnp.concatenate([cj.identity((1,)), sp[..., :-1]], axis=-1)
    evens = kernels.point_add(shifted, pts[..., 0::2])
    return jnp.stack([evens, sp], axis=-1).reshape(*pts.shape[:-1], n)


def _reduce_sum(pts: jnp.ndarray) -> jnp.ndarray:
    """Sum of points along the lane axis -> ``(3, NL, 1)``."""
    n = pts.shape[-1]
    while n > 1:
        half = (n + 1) // 2
        if 2 * half != n:
            pts = jnp.concatenate([pts, cj.identity((2 * half - n,))], axis=-1)
        pts = kernels.point_add(pts[..., :half], pts[..., half:])
        n = half
    return pts


def _msm_device_impl(scalars: jnp.ndarray, points: jnp.ndarray, c: int | None = None):
    """MSM over ``(NL, n)`` scalars and ``(3, NL, n)`` points -> ``(3, NL)``."""
    n = scalars.shape[-1]
    if c is None:
        c = select_window(n)
    npad = _next_pow2(n)
    if npad != n:
        scalars = jnp.pad(scalars, [(0, 0), (0, npad - n)])
        points = jnp.concatenate([points, cj.identity((npad - n,))], axis=-1)
        n = npad
    B = 1 << c

    digits = _digits(scalars, c)  # (nw, n)
    order = jnp.argsort(digits, axis=-1)  # (nw, n)
    d_sorted = jnp.take_along_axis(digits, order, axis=-1)

    def window_body(_, inputs):
        order_w, d_w = inputs
        pts = points[:, :, order_w]
        cumsum = _inclusive_scan(pts)
        total = cumsum[..., -1:]
        # cum_{j-1} for j = 1..B-1: last prefix position with digit <= j-1
        targets = jnp.arange(0, B - 1, dtype=d_w.dtype)
        pos = jnp.searchsorted(d_w, targets, side="right") - 1
        valid = pos >= 0
        cums = cumsum[:, :, jnp.clip(pos, 0)]
        cums = cj._point_select(~valid, cj.identity((B - 1,)), cums)
        s_vals = kernels.point_add(
            jnp.broadcast_to(total, cums.shape), kernels.point_neg(cums)
        )
        win = _reduce_sum(s_vals)[..., 0]
        return None, win

    _, window_sums = jax.lax.scan(window_body, None, (order, d_sorted))

    # Horner over windows, most-significant first.
    def horner_body(acc, w_sum):
        for _ in range(c):
            acc = kernels.point_add(acc, acc)
        acc = kernels.point_add(acc, w_sum[..., None])
        return acc, None

    acc0 = cj.identity((1,))
    acc, _ = jax.lax.scan(horner_body, acc0, window_sums, reverse=True)
    return acc[..., 0]


def msm_host_points(scalars, points, c: int | None = None):
    """Host API: lists of ``Scalar`` / ``StarkPoint`` -> ``StarkPoint``, on TPU."""
    s = cj.scalars_from_host(scalars)
    p = cj.points_from_host(points)
    out = msm_device(s, p, c)
    return cj.points_to_host(out[..., None])[0]


msm_device = functools.partial(jax.jit, static_argnums=(2,))(_msm_device_impl)
