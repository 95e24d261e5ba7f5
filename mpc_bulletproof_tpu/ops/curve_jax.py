"""Batched STARK-curve group arithmetic on TPU.

Points are projective ``(X : Y : Z)`` **lazy** limb tensors of shape
``(3, NLZ, n)`` (int32, 13-bit semi-normalized limbs, batch-last — see the
"Lazy arithmetic" section of :mod:`.limb`).  The identity is ``(0 : 1 : 0)``.
Coordinates carry values in ``[0, 16m)`` rather than canonical ``[0, m)``:
the group law never inspects a coordinate, so intermediate chains skip both
exact carry resolution and canonical reduction — the two dominant costs of
the round-1 exact pipeline — and host conversion reduces mod p anyway.

Addition uses the *complete* formulas of Renes-Costello-Batina 2016
(eprint 2015/1060, Algorithm 1 for arbitrary ``a``): one straight-line
sequence of 12 field multiplications (plus multiplications by curve
constants) that is correct for **all** input pairs — identity, doubling,
inverses — with no data-dependent branching.  That is exactly what the TPU
wants: every point operation is a fixed fused kernel, and the bucket/scan
MSM (:mod:`.msm`) never special-cases coincident points, unlike the
reference's CPU path which branches per case (mpc-stark / ark-ec —
SURVEY.md §2.4).

Static value-bound discipline (inputs ``<= 16m``): every ``lazy_sub`` site
carries a slack constant (k8/k16/k32 = that multiple of m) exceeding the
statically-known bound of its subtrahend, keeping all values nonnegative;
the worst multiplication input is < 38m, so wide products stay < beta^40
(the Barrett precondition).  Output coordinates are < 14m — below the 16m
input bound, so chains of additions are stable.  See the bound table in
``_point_add``.
"""

from __future__ import annotations

import types

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import ALPHA, BETA, P
from .limb import (
    FP,
    NL,
    NLZ,
    int_to_limbs_np,
    ints_to_limbs,
    lazy_add,
    lazy_mul,
    lazy_sub,
    lazy_to_canonical,
    limbs_to_ints,
)

_B3 = (3 * BETA) % P  # 3b constant of the addition formulas

assert ALPHA == 1, "formulas below exploit a = 1 (mul by a is free)"


def default_ctx():
    """Curve context: lazy-arithmetic constants as ``(limbs, 1)`` arrays.

    Pallas kernels rebuild this from kernel operands (Mosaic forbids captured
    array constants); the plain XLA path uses these module constants.
    """
    return types.SimpleNamespace(
        m=jnp.asarray(FP.m),
        mu=jnp.asarray(FP.mu),
        d21=jnp.asarray(FP.d21),
        b3=jnp.asarray(int_to_limbs_np(_B3, NLZ)),
        k8=jnp.asarray(FP.k8),
        k16=jnp.asarray(FP.k16),
        k32=jnp.asarray(FP.k32),
    )


def identity(batch_shape=()) -> jnp.ndarray:
    """The projective identity (0 : 1 : 0), broadcast to ``batch_shape``."""
    pt = np.zeros((3, NLZ, 1), dtype=np.int32)
    pt[1, 0, 0] = 1
    return jnp.broadcast_to(
        jnp.asarray(pt).reshape((3, NLZ) + (1,) * len(batch_shape)),
        (3, NLZ) + batch_shape,
    )


def _point_add(p: jnp.ndarray, q: jnp.ndarray, ctx=None) -> jnp.ndarray:
    """Complete projective addition (RCB16 Algorithm 1, a = 1), lazy.

    ``p``, ``q``: ``(3, NLZ, ...)`` with coordinate values <= 16m;
    broadcasting over batch dims is allowed.  Outputs < 14m.  The value
    bound of each intermediate is noted; ``lazy_sub`` slack constants are
    chosen per site to exceed the subtrahend's bound.
    """
    if ctx is None:
        ctx = default_ctx()
    _mul = lambda a, b: lazy_mul(a, b, ctx)
    X1, Y1, Z1 = p[0], p[1], p[2]
    X2, Y2, Z2 = q[0], q[1], q[2]

    t0 = _mul(X1, X2)                                   # < 6m
    t1 = _mul(Y1, Y2)                                   # < 6m
    t2 = _mul(Z1, Z2)                                   # < 6m
    t3 = _mul(lazy_add(X1, Y1), lazy_add(X2, Y2))       # adds < 32m; < 6m
    t3 = lazy_sub(t3, lazy_add(t0, t1), ctx.k16)        # < 22m
    t4 = _mul(lazy_add(X1, Z1), lazy_add(X2, Z2))       # < 6m
    t4 = lazy_sub(t4, lazy_add(t0, t2), ctx.k16)        # < 22m
    t5 = _mul(lazy_add(Y1, Z1), lazy_add(Y2, Z2))       # < 6m
    t5 = lazy_sub(t5, lazy_add(t1, t2), ctx.k16)        # < 22m
    Z3 = t4                                             # a * t4 with a = 1
    X3 = _mul(ctx.b3, t2)                               # < 6m
    Z3 = lazy_add(X3, Z3)                               # < 28m
    X3 = lazy_sub(t1, Z3, ctx.k32)                      # < 38m
    Z3 = lazy_add(t1, Z3)                               # < 34m
    Y3 = _mul(X3, Z3)                                   # 38m*34m < beta^40; < 6m
    t1 = lazy_add(lazy_add(t0, t0), t0)                 # 3*t0 < 18m
    t4b = _mul(ctx.b3, t4)                              # < 6m
    t1 = lazy_add(t1, t2)                               # 3*t0 + a*t2 < 24m
    t2 = lazy_sub(t0, t2, ctx.k8)                       # (t0 - a*t2) < 14m
    t4 = lazy_add(t4b, t2)                              # < 20m
    t0 = _mul(t1, t4)                                   # < 6m
    Y3 = lazy_add(Y3, t0)                               # < 12m  (output)
    t0 = _mul(t5, t4)                                   # < 6m
    X3 = lazy_sub(_mul(t3, X3), t0, ctx.k8)             # < 14m  (output)
    t0 = _mul(t3, t1)                                   # < 6m
    Z3 = lazy_add(_mul(t5, Z3), t0)                     # < 12m  (output)
    return jnp.stack([X3, Y3, Z3], axis=0)


def _point_neg(p: jnp.ndarray, ctx=None) -> jnp.ndarray:
    if ctx is None:
        ctx = default_ctx()
    # -Y as k16 - Y: input < 16m keeps the result <= 16m (still a valid
    # input bound; negation sites never chain without a reduction between).
    zero = jnp.zeros_like(p[1])
    return jnp.stack([p[0], lazy_sub(zero, p[1], ctx.k16), p[2]], axis=0)


def _point_select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Branchless per-point select; ``cond`` has the batch shape."""
    return jnp.where(cond[None, None], a, b)


def _point_reduce_sum(pts: jnp.ndarray) -> jnp.ndarray:
    """Sum of points along the batch (last) axis -> ``(3, NLZ)``."""
    n = pts.shape[-1]
    while n > 1:
        half = (n + 1) // 2
        pad = 2 * half - n
        if pad:
            pts = jnp.concatenate([pts, identity((pad,))], axis=-1)
        pts = _point_add(pts[..., :half], pts[..., half:])
        n = half
    return pts[..., 0]


def _is_identity(p: jnp.ndarray) -> jnp.ndarray:
    """Exact identity test: canonicalize Z (lazy limbs may encode a nonzero
    multiple of p for the identity), then test for zero."""
    z = lazy_to_canonical(p[2].reshape(NLZ, -1), FP)
    return jnp.all(z == 0, axis=0).reshape(p.shape[2:])


point_add = jax.jit(_point_add)
point_neg = jax.jit(_point_neg)
point_double = jax.jit(lambda p: _point_add(p, p))
point_reduce_sum = jax.jit(_point_reduce_sum)
is_identity = jax.jit(_is_identity)


# ---------------------------------------------------------------------------
# host <-> device conversion
# ---------------------------------------------------------------------------

def points_from_host(points) -> np.ndarray:
    """List of host ``StarkPoint`` -> ``(3, NLZ, n)`` projective limb array."""
    xs, ys, zs = [], [], []
    for pt in points:
        if pt.is_identity():
            xs.append(0), ys.append(1), zs.append(0)
        else:
            xs.append(pt.x), ys.append(pt.y), zs.append(1)
    return np.stack(
        [ints_to_limbs(xs, NLZ), ints_to_limbs(ys, NLZ), ints_to_limbs(zs, NLZ)],
        axis=0,
    )


def points_to_host(arr) -> list:
    """``(3, NLZ, ...)`` projective limb array -> list of host ``StarkPoint``.

    Accepts lazy values: coordinates are reduced mod p on the host.
    """
    from .curve import StarkPoint

    a = np.asarray(arr).reshape(3, NLZ, -1)
    Xs = limbs_to_ints(a[0])
    Ys = limbs_to_ints(a[1])
    Zs = limbs_to_ints(a[2])
    out = []
    for X, Y, Z in zip(Xs, Ys, Zs):
        if Z % P == 0:
            out.append(StarkPoint.identity())
        else:
            zinv = pow(int(Z), -1, P)
            out.append(StarkPoint(X * zinv % P, Y * zinv % P))
    return out


def scalars_from_host(scalars) -> np.ndarray:
    """List of host ``Scalar`` (or ints) -> ``(NL, n)`` limb array."""
    return ints_to_limbs([int(s) for s in scalars])


def scalars_to_host(arr) -> list:
    from .field import Scalar

    return [Scalar(v) for v in limbs_to_ints(arr)]
