"""Batched STARK-curve group arithmetic on TPU.

Points are projective ``(X : Y : Z)`` limb tensors of shape ``(3, NL, n)``
(int32, 13-bit limbs, batch-last — see :mod:`.limb`).  The identity is
``(0 : 1 : 0)``.

Addition uses the *complete* formulas of Renes-Costello-Batina 2016
(eprint 2015/1060, Algorithm 1 for arbitrary ``a``): one straight-line
sequence of 12 field multiplications (plus multiplications by curve
constants) that is correct for **all** input pairs — identity, doubling,
inverses — with no data-dependent branching.  That is exactly what the TPU
wants: every point operation is a fixed fused kernel, and the bucket/scan
MSM (:mod:`.msm`) never special-cases coincident points, unlike the
reference's CPU path which branches per case (mpc-stark / ark-ec —
SURVEY.md §2.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import ALPHA, BETA, P
from .limb import (
    FP,
    NL,
    _mod_add,
    _mod_mul,
    _mod_neg,
    _mod_sub,
    int_to_limbs_np,
    ints_to_limbs,
    limbs_to_ints,
)

_B3 = (3 * BETA) % P  # 3b constant of the addition formulas

assert ALPHA == 1, "formulas below exploit a = 1 (mul by a is free)"

import types


def default_ctx():
    """Curve context: base-field ModParams + the 3b constant, as arrays.

    Pallas kernels rebuild this from kernel operands (Mosaic forbids captured
    array constants); the plain XLA path uses these module constants.
    """
    return types.SimpleNamespace(mp=FP, b3=jnp.asarray(int_to_limbs_np(_B3, NL)))


def identity(batch_shape=()) -> jnp.ndarray:
    """The projective identity (0 : 1 : 0), broadcast to ``batch_shape``."""
    pt = np.zeros((3, NL, 1), dtype=np.int32)
    pt[1, 0, 0] = 1
    return jnp.broadcast_to(
        jnp.asarray(pt).reshape((3, NL) + (1,) * len(batch_shape)),
        (3, NL) + batch_shape,
    )


def _point_add(p: jnp.ndarray, q: jnp.ndarray, ctx=None) -> jnp.ndarray:
    """Complete projective addition (RCB16 Algorithm 1, a = 1).

    ``p``, ``q``: ``(3, NL, ...)``; broadcasting over batch dims is allowed.
    """
    if ctx is None:
        ctx = default_ctx()
    mp, b3 = ctx.mp, ctx.b3
    _mul = lambda a, b: _mod_mul(a, b, mp)
    _add = lambda a, b: _mod_add(a, b, mp)
    _sub = lambda a, b: _mod_sub(a, b, mp)
    X1, Y1, Z1 = p[0], p[1], p[2]
    X2, Y2, Z2 = q[0], q[1], q[2]

    t0 = _mul(X1, X2)
    t1 = _mul(Y1, Y2)
    t2 = _mul(Z1, Z2)
    t3 = _mul(_add(X1, Y1), _add(X2, Y2))
    t3 = _sub(t3, _add(t0, t1))
    t4 = _mul(_add(X1, Z1), _add(X2, Z2))
    t4 = _sub(t4, _add(t0, t2))
    t5 = _mul(_add(Y1, Z1), _add(Y2, Z2))
    t5 = _sub(t5, _add(t1, t2))
    Z3 = t4  # a * t4 with a = 1
    X3 = _mul(b3, t2)
    Z3 = _add(X3, Z3)
    X3 = _sub(t1, Z3)
    Z3 = _add(t1, Z3)
    Y3 = _mul(X3, Z3)
    t1 = _add(_add(t0, t0), t0)  # 3*t0
    t4b = _mul(b3, t4)
    t1 = _add(t1, t2)  # 3*t0 + a*t2
    t2 = _sub(t0, t2)  # (t0 - a*t2), then * a with a = 1
    t4 = _add(t4b, t2)
    t0 = _mul(t1, t4)
    Y3 = _add(Y3, t0)
    t0 = _mul(t5, t4)
    X3 = _sub(_mul(t3, X3), t0)
    t0 = _mul(t3, t1)
    Z3 = _add(_mul(t5, Z3), t0)
    return jnp.stack([X3, Y3, Z3], axis=0)


def _point_neg(p: jnp.ndarray, ctx=None) -> jnp.ndarray:
    mp = FP if ctx is None else ctx.mp
    return jnp.stack([p[0], _mod_neg(p[1], mp), p[2]], axis=0)


def _point_select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Branchless per-point select; ``cond`` has the batch shape."""
    return jnp.where(cond[None, None], a, b)


def _point_reduce_sum(pts: jnp.ndarray) -> jnp.ndarray:
    """Sum of points along the batch (last) axis -> ``(3, NL)``."""
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
    return jnp.all(p[2] == 0, axis=0)


point_add = jax.jit(_point_add)
point_neg = jax.jit(_point_neg)
point_double = jax.jit(lambda p: _point_add(p, p))
point_reduce_sum = jax.jit(_point_reduce_sum)
is_identity = jax.jit(_is_identity)


# ---------------------------------------------------------------------------
# host <-> device conversion
# ---------------------------------------------------------------------------

def points_from_host(points) -> np.ndarray:
    """List of host ``StarkPoint`` -> ``(3, NL, n)`` projective limb array."""
    xs, ys, zs = [], [], []
    for pt in points:
        if pt.is_identity():
            xs.append(0), ys.append(1), zs.append(0)
        else:
            xs.append(pt.x), ys.append(pt.y), zs.append(1)
    return np.stack([ints_to_limbs(xs), ints_to_limbs(ys), ints_to_limbs(zs)], axis=0)


def points_to_host(arr) -> list:
    """``(3, NL, ...)`` projective limb array -> list of host ``StarkPoint``."""
    from .curve import StarkPoint

    a = np.asarray(arr).reshape(3, NL, -1)
    Xs = limbs_to_ints(a[0])
    Ys = limbs_to_ints(a[1])
    Zs = limbs_to_ints(a[2])
    out = []
    for X, Y, Z in zip(Xs, Ys, Zs):
        if Z % P == 0:
            out.append(StarkPoint.identity())
        else:
            zinv = pow(Z, -1, P)
            out.append(StarkPoint(X * zinv % P, Y * zinv % P))
    return out


def scalars_from_host(scalars) -> np.ndarray:
    """List of host ``Scalar`` (or ints) -> ``(NL, n)`` limb array."""
    return ints_to_limbs([int(s) for s in scalars])


def scalars_to_host(arr) -> list:
    from .field import Scalar

    return [Scalar(v) for v in limbs_to_ints(arr)]
