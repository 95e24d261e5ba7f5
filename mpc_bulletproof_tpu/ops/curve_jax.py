"""Batched STARK-curve group arithmetic on TPU.

Points are projective ``(X : Y : Z)`` **lazy Montgomery-form** limb tensors
of shape ``(3, NLZ, n)`` (int32, 13-bit semi-normalized limbs, batch-last —
see the "Lazy arithmetic" section of :mod:`.limb`).  The identity is
``(0 : R : 0)`` with ``R = beta^NLZ mod p``.  Coordinates carry values in
``[0, 16m)`` rather than canonical ``[0, m)``, in Montgomery representation
``x*R mod p``: the group law never inspects a coordinate, so intermediate
chains skip exact carry resolution, canonical reduction, *and* Barrett
quotient estimation (REDC needs none) — the dominant costs of the round-1
exact pipeline.  Host conversion multiplies by R / R^-1 for free (python
ints), and the device transcript path converts once per absorbed point.

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


_B3_MONT = (_B3 * FP.mont_r) % P  # 3b in Montgomery form


def default_ctx():
    """Curve context: lazy-arithmetic constants as ``(limbs, 1)`` arrays
    (plus the static int ``m_prime`` for REDC).

    Pallas kernels rebuild this from kernel operands (Mosaic forbids captured
    array constants); the plain XLA path uses these module constants.
    """
    return types.SimpleNamespace(
        m=jnp.asarray(FP.m),
        m_prime=FP.m_prime,
        sparse_limbs=FP.sparse_limbs,
        b3=jnp.asarray(int_to_limbs_np(_B3_MONT, NLZ)),
        k8=jnp.asarray(FP.k8),
        k16=jnp.asarray(FP.k16),
        k32=jnp.asarray(FP.k32),
    )


_IDENTITY_NP = np.zeros((3, NLZ, 1), dtype=np.int32)
_IDENTITY_NP[1] = int_to_limbs_np(FP.mont_r, NLZ)  # 1 in Montgomery form


def identity(batch_shape=()) -> jnp.ndarray:
    """The projective identity (0 : R : 0) — Montgomery form — broadcast."""
    return jnp.broadcast_to(
        jnp.asarray(_IDENTITY_NP).reshape((3, NLZ) + (1,) * len(batch_shape)),
        (3, NLZ) + batch_shape,
    )


def _point_add(p: jnp.ndarray, q: jnp.ndarray, ctx=None) -> jnp.ndarray:
    """Complete projective addition (RCB16 Algorithm 1, a = 1), lazy.

    ``p``, ``q``: ``(3, NLZ, ...)`` Montgomery-form coords with values
    <= 16m; broadcasting over batch dims is allowed.  Outputs < 10m.  The
    value bound of each intermediate is noted; ``lazy_sub`` slack constants
    are chosen per site to exceed the subtrahend's bound, and every REDC
    input stays far below m * beta^NLZ (products of values < 32m).
    """
    if ctx is None:
        ctx = default_ctx()
    _mul = lambda a, b: lazy_mul(a, b, ctx)
    X1, Y1, Z1 = p[0], p[1], p[2]
    X2, Y2, Z2 = q[0], q[1], q[2]

    t0 = _mul(X1, X2)                                   # < 2m
    t1 = _mul(Y1, Y2)                                   # < 2m
    t2 = _mul(Z1, Z2)                                   # < 2m
    t3 = _mul(lazy_add(X1, Y1), lazy_add(X2, Y2))       # adds < 32m; < 2m
    t3 = lazy_sub(t3, lazy_add(t0, t1), ctx.k8)         # < 10m
    t4 = _mul(lazy_add(X1, Z1), lazy_add(X2, Z2))       # < 2m
    t4 = lazy_sub(t4, lazy_add(t0, t2), ctx.k8)         # < 10m
    t5 = _mul(lazy_add(Y1, Z1), lazy_add(Y2, Z2))       # < 2m
    t5 = lazy_sub(t5, lazy_add(t1, t2), ctx.k8)         # < 10m
    Z3 = t4                                             # a * t4 with a = 1
    X3 = _mul(ctx.b3, t2)                               # < 2m
    Z3 = lazy_add(X3, Z3)                               # < 12m
    X3 = lazy_sub(t1, Z3, ctx.k16)                      # < 18m
    Z3 = lazy_add(t1, Z3)                               # < 14m
    Y3 = _mul(X3, Z3)                                   # < 2m
    t1 = lazy_add(lazy_add(t0, t0), t0)                 # 3*t0 < 6m
    t4b = _mul(ctx.b3, t4)                              # < 2m
    t1 = lazy_add(t1, t2)                               # 3*t0 + a*t2 < 8m
    t2 = lazy_sub(t0, t2, ctx.k8)                       # (t0 - a*t2) < 10m
    t4 = lazy_add(t4b, t2)                              # < 12m
    t0 = _mul(t1, t4)                                   # < 2m
    Y3 = lazy_add(Y3, t0)                               # < 4m   (output)
    t0 = _mul(t5, t4)                                   # < 2m
    X3 = lazy_sub(_mul(t3, X3), t0, ctx.k8)             # < 10m  (output)
    t0 = _mul(t3, t1)                                   # < 2m
    Z3 = lazy_add(_mul(t5, Z3), t0)                     # < 4m   (output)
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
    """List of host ``StarkPoint`` -> ``(3, NLZ, n)`` Montgomery projective
    limb array (coords scaled by R on the host — free in python ints)."""
    R_mont = FP.mont_r
    one_m = R_mont
    xs, ys, zs = [], [], []
    for pt in points:
        if pt.is_identity():
            xs.append(0), ys.append(one_m), zs.append(0)
        else:
            xs.append(pt.x * R_mont % P), ys.append(pt.y * R_mont % P), zs.append(one_m)
    return np.stack(
        [ints_to_limbs(xs, NLZ), ints_to_limbs(ys, NLZ), ints_to_limbs(zs, NLZ)],
        axis=0,
    )


def _to_affine_mont(pts: jnp.ndarray) -> jnp.ndarray:
    """``(3, NLZ, k)`` lazy Montgomery projective -> affine-or-identity points
    with canonical Montgomery coords and ``z in {0, mont_one}`` — the
    :func:`points_from_host` invariant, so the result can feed the packed
    affine gather tables (``ops/msm._rows_affine_table``).

    One batched Fermat inversion (``kernels.mod_pow_static``, a single
    in-kernel ladder).  Montgomery bookkeeping (all multiplies below are
    PLAIN modular products, not Montgomery products): coords are ``x R``;
    the inverse of ``z R`` is ``z^-1 R^-1``, so one extra multiply by the
    constant ``R`` (folded into zinv) lands ``(x R)(z^-1 R^-1)(R) =
    x z^-1 R`` — Montgomery-form affine.
    """
    from .limb import _lazy_to_canonical, _mod_mul, from_const

    k = pts.shape[-1]
    xc = _lazy_to_canonical(pts[0], FP)
    yc = _lazy_to_canonical(pts[1], FP)
    zc = _lazy_to_canonical(pts[2], FP)
    is_id = jnp.all(zc == 0, axis=0)  # (k,)
    z_safe = jnp.where(is_id[None], from_const(1, (k,)), zc)
    from . import kernels  # local import: kernels imports this module

    zinv = kernels.mod_pow_static(z_safe, P - 2, FP)          # z^-1 R^-1
    r1 = from_const(FP.mont_r, (1,))
    zinv = _mod_mul(zinv, r1, FP)                             # z^-1
    x_aff = _mod_mul(xc, zinv, FP)
    y_aff = _mod_mul(yc, zinv, FP)
    one_c = from_const(FP.mont_r, (k,))
    nz = (~is_id)[None]
    x_out = jnp.where(nz, x_aff, 0)
    y_out = jnp.where(nz, y_aff, one_c)
    z_out = jnp.where(nz, one_c, 0)
    pad = [(0, NLZ - NL), (0, 0)]
    return jnp.stack(
        [jnp.pad(x_out, pad), jnp.pad(y_out, pad), jnp.pad(z_out, pad)], axis=0
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
    # coords are Montgomery (x*R); the R factors cancel in X/Z and Y/Z.
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
