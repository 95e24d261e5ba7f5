"""TPU limb arithmetic for 251-bit prime fields.

This is the device-side foundation replacing the reference's CPU bignum stack
(``mpc-stark`` algebra / ark-ff — SURVEY.md §2.4): batched modular add / sub /
mul / inner products over the STARK base field ``P`` and scalar field ``R``.

Representation
--------------
A batch of field elements is ``NL = 20`` limbs of ``BASE_BITS = 13`` bits in
an ``int32`` tensor laid out **limb-major**: shape ``(NL, n)`` with the batch
on the *last* (lane) dimension.  The choices are dictated by TPU hardware:

* batch-last means every limb operation is a full-width VPU op across 128
  lanes — a ``(n, NL)`` layout would waste 6/7 of each vector register;
* products of two 13-bit limbs are < 2^26, so a full 20-term convolution
  column sums to < 20 * 2^26 < 2^31 and **never overflows int32** — no
  per-product carry handling, everything is straight-line vector arithmetic;
* 13-bit limbs are also the native Pippenger window for the MSM kernels
  (:mod:`.msm`): a scalar's limbs *are* its bucket digits.

Carry propagation is **branchless Kogge-Stone carry-lookahead**: one or two
shift-add sweeps reduce limb magnitudes until carries are in {-1,0,1}, then a
log2(L)-step generate/propagate prefix resolves the exact carries.  This
keeps the op count per modular multiply small, which matters both for VPU
throughput and for XLA graph size (the point formulas instantiate many
multiplies).

Reduction is word-aligned Barrett (HAC 14.42): for modulus ``m`` with
``beta^(NL-1) <= m < beta^NL`` precompute ``mu = floor(beta^(2*NL) / m)``;
then for ``c < beta^(2*NL)``::

    q  = floor( floor(c / beta^(NL-1)) * mu / beta^(NL+1) )
    r  = (c - q*m) mod beta^(NL+1)      # then at most 2 corrective subtractions

The same code path serves both fields; per-modulus constants live in
:class:`ModParams` (``FP`` base field, ``FR`` scalar field).  All limb loops
are unrolled over static limb counts — no data-dependent control flow — and
the plain ``_impl`` bodies run unchanged inside Pallas kernels.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import P, R

BASE_BITS = 13
BASE = 1 << BASE_BITS
MASK = BASE - 1
NL = 20  # limbs per field element: 20 * 13 = 260 bits >= 252
WIDE = 2 * NL  # limbs in an unreduced product
NLZ = NL + 1  # limbs of a *lazy* (redundant) element — see "Lazy arithmetic"


# ---------------------------------------------------------------------------
# host <-> limb conversion (numpy, exact).  Limb-major: (limbs, batch).
# ---------------------------------------------------------------------------

def int_to_limbs_np(x: int, n: int = NL) -> np.ndarray:
    """Single int -> (n, 1) limb column."""
    out = np.zeros((n, 1), dtype=np.int32)
    for i in range(n):
        out[i, 0] = x & MASK
        x >>= BASE_BITS
    if x:
        raise ValueError("value does not fit in limb count")
    return out


def ints_to_limbs(values: Sequence[int], n: int = NL) -> np.ndarray:
    """Pack python ints into an ``(n, len)`` int32 limb array.

    Vectorized: each value serializes once (``int.to_bytes``, C-speed), then
    numpy unpacks bits and folds 13-bit groups — the per-limb python loop
    was the dominant host cost of large device transfers (8k generators =
    500k python iterations)."""
    k = len(values)
    if k == 0:
        return np.zeros((n, 0), dtype=np.int32)
    nbytes = (n * BASE_BITS + 7) // 8
    try:
        buf = b"".join(v.to_bytes(nbytes, "little") for v in values)
    except (OverflowError, AttributeError):  # too wide / non-int: exact path
        out = np.zeros((n, k), dtype=np.int32)
        for j, v in enumerate(values):
            v = int(v)
            for i in range(n):
                out[i, j] = v & MASK
                v >>= BASE_BITS
            if v:
                raise ValueError("value does not fit in limb count")
        return out
    b = np.frombuffer(buf, dtype=np.uint8).reshape(k, nbytes).astype(np.int32)
    b = np.pad(b, [(0, 0), (0, 2)])  # safe 3-byte window at the tail
    out = np.empty((n, k), dtype=np.int32)
    for i in range(n):
        byte, off = divmod(BASE_BITS * i, 8)
        word = b[:, byte] | (b[:, byte + 1] << 8) | (b[:, byte + 2] << 16)
        out[i] = (word >> off) & MASK
    return out


def limbs_to_ints(arr) -> list[int]:
    """Unpack an ``(n, ...)`` limb array into python ints (flattened batch)."""
    a = np.asarray(arr)
    flat = a.reshape(a.shape[0], -1)
    n, k = flat.shape
    if k and flat.dtype.kind in "iu" and flat.min() >= 0 and flat.max() < BASE:
        # canonical limbs: reassemble bytes -> int.from_bytes (C-speed)
        w = (n * BASE_BITS + 7) // 8
        f = flat.astype(np.int64)
        out = np.zeros((k, w), dtype=np.uint8)
        for j in range(w):
            a = (8 * j) // BASE_BITS
            off = 8 * j - BASE_BITS * a
            word = f[a] >> off
            if a + 1 < n:
                word = word | (f[a + 1] << (BASE_BITS - off))
            out[:, j] = word & 0xFF
        data = out.tobytes()
        return [
            int.from_bytes(data[j * w : (j + 1) * w], "little") for j in range(k)
        ]
    weights = np.array([1 << (BASE_BITS * i) for i in range(n)], dtype=object)
    return list(weights @ flat.astype(object))


class ModParams:
    """Static per-modulus constants (host numpy; closed over by jitted fns)."""

    def __init__(self, modulus: int):
        self.modulus = modulus
        self.m = int_to_limbs_np(modulus, NL)  # (NL, 1)
        self.m21 = int_to_limbs_np(modulus, NL + 1)
        self.mu = int_to_limbs_np((1 << (BASE_BITS * 2 * NL)) // modulus, NL + 1)
        # Lazy-arithmetic constants (see "Lazy arithmetic" below):
        # d21 = m * floor(beta^NLZ / m) — the multiple of m subtracted to
        # undo a beta^NLZ wrap; k16/k32 = slack constants for lazy_sub.
        beta_nlz = 1 << (BASE_BITS * NLZ)
        self.d21 = int_to_limbs_np(modulus * (beta_nlz // modulus), NLZ)
        self.k8 = int_to_limbs_np(8 * modulus, NLZ)
        self.k16 = int_to_limbs_np(16 * modulus, NLZ)
        self.k32 = int_to_limbs_np(32 * modulus, NLZ)
        # Montgomery constants for the lazy point path: R = beta^NLZ.
        self.mont_r = (1 << (BASE_BITS * NLZ)) % modulus
        self.mont_r_inv = pow(self.mont_r, -1, modulus)
        self.m_prime = (-pow(modulus, -1, BASE)) % BASE  # -m^-1 mod beta
        # Sparse-REDC structure: when every nonzero limb of m above limb 0
        # is a power of two, limb 0 == 1, and m' == beta-1 (i.e. m = 1 mod
        # beta), the REDC inner loop needs NO multiplies: u = (-c) & MASK
        # and the u*m axpy is a handful of shift-adds.  The STARK base
        # field p = 2^251 + 17*2^192 + 1 qualifies (limbs {0:1, 14:2^10,
        # 15:2^1, 19:2^4}); see _redc.
        shifts = []
        ok = self.m_prime == MASK and int(self.m[0, 0]) == 1
        for i in range(1, NL):
            v = int(self.m[i, 0])
            if v == 0:
                continue
            if v & (v - 1):
                ok = False
                break
            shifts.append((i, v.bit_length() - 1))
        self.sparse_limbs = tuple(shifts) if ok else None

    def __repr__(self):
        return f"ModParams(0x{self.modulus:x})"

    # Hashable on the modulus so instances can be jit static arguments.
    def __hash__(self):
        return hash(self.modulus)

    def __eq__(self, other):
        return isinstance(other, ModParams) and self.modulus == other.modulus


FP = ModParams(P)
FR = ModParams(R)


# ---------------------------------------------------------------------------
# carry propagation (branchless, log-depth)
# ---------------------------------------------------------------------------

def _shift_down(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Move limb i to position i+d (multiply by beta^d), zero-filling."""
    if d == 0:
        return x
    pad = [(d, 0)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)[: x.shape[0]]


def _sweep(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """One shift-add carry sweep; output has ``out_len`` limbs."""
    if x.shape[0] < out_len:
        x = jnp.pad(x, [(0, out_len - x.shape[0])] + [(0, 0)] * (x.ndim - 1))
    elif x.shape[0] > out_len:
        x = x[:out_len]
    r = x & MASK
    c = x >> BASE_BITS
    return r + _shift_down(c, 1)


def _shift_down_fill(x: jnp.ndarray, d: int, fill: int) -> jnp.ndarray:
    if d == 0:
        return x
    pad = [(d, 0)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=fill)[: x.shape[0]]


def _ks_resolve(y: jnp.ndarray) -> jnp.ndarray:
    """Exact carry resolution for limbs with carries/borrows in {-1, 0, 1}.

    Each limb's carry transfer function ``f(c_in) = (y + c_in) >> 13`` is a
    monotone map {-1,0,1} -> {-1,0,1} represented by the triple
    ``(f(-1), f(0), f(1))``; a Kogge-Stone prefix composes the maps in
    log2(L) steps and the final carry into limb i is ``prefix_{i-1}(0)``.
    Precondition: ``-BASE < y_i < 2*BASE - 1`` so the triples stay in range.
    """
    n = y.shape[0]
    lo = (y - 1) >> BASE_BITS
    mid = y >> BASE_BITS
    hi = (y + 1) >> BASE_BITS

    def apply_map(f_lo, f_mid, f_hi, v):
        return jnp.where(v == -1, f_lo, jnp.where(v == 0, f_mid, f_hi))

    d = 1
    while d < n:
        plo = _shift_down_fill(lo, d, -1)
        pmid = _shift_down_fill(mid, d, 0)
        phi = _shift_down_fill(hi, d, 1)
        lo, mid, hi = (
            apply_map(lo, mid, hi, plo),
            apply_map(lo, mid, hi, pmid),
            apply_map(lo, mid, hi, phi),
        )
        d *= 2
    carry_in = _shift_down(mid, 1)
    return (y + carry_in) & MASK


def carry_prop(x: jnp.ndarray, out_len: int, sweeps: int = 2) -> jnp.ndarray:
    """Normalize limbs to [0, BASE); output ``out_len`` limbs (mod beta^out_len).

    ``sweeps`` shift-add passes bound the residual limb magnitudes, then a
    Kogge-Stone prefix resolves the exact {-1,0,1} carries.  Two sweeps
    suffice for any int32 input (|carry| <= 2^18 -> <= 2^5 -> {-1,0,1});
    ``sweeps=0`` is valid when input limbs are already in
    ``(-BASE, 2*BASE-1)`` — e.g. sums/differences of normalized values.
    """
    y = x
    if y.shape[0] != out_len and sweeps == 0:
        if y.shape[0] < out_len:
            y = jnp.pad(y, [(0, out_len - y.shape[0])] + [(0, 0)] * (y.ndim - 1))
        else:
            y = y[:out_len]
    for _ in range(sweeps):
        y = _sweep(y, out_len)
    return _ks_resolve(y)


# ---------------------------------------------------------------------------
# convolution (schoolbook polynomial product, unrolled)
# ---------------------------------------------------------------------------

def _mul16u(a, b):
    """Limb product via the VPU's native 16x16->32 multiply.

    The masks are semantic no-ops when both operands are already in
    [0, 2^16), but they let Mosaic prove the operands are 16-bit and emit
    the single-pass multiply — measured 829 vs 389 Gops/s for plain int32
    multiply on v5e (OPTIMIZATIONS.md round-3 table, benches/micro_mul.py).
    MUST NOT be used with possibly-negative operands: the mask corrupts
    them (use :func:`_mul16s` for the SN-limb path).
    """
    return (a & 0xFFFF) * (b & 0xFFFF)


def _mul16s(a, b):
    """Signed 16-bit limb product: sign-extending shifts are semantic
    no-ops for operands in [-2^15, 2^15) — SN limbs qualify (within ~22 of
    [0, 2^13]) — and mark the operands 16-bit for the same fast multiply
    as :func:`_mul16u` (benches/micro_mul.py ``mul16(sext)``)."""
    return ((a << 16) >> 16) * ((b << 16) >> 16)


def _broadcast_batch(a: jnp.ndarray, b: jnp.ndarray):
    """Broadcast both operands to a common batch shape up front.

    Mosaic cannot lower a broadcast that expands sublanes and lanes at once
    (e.g. (1,1) -> (20,64)); pre-broadcasting the lane dims keeps every
    later broadcast single-axis.
    """
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    if a.shape[1:] != batch:
        a = jnp.broadcast_to(a, (a.shape[0],) + batch)
    if b.shape[1:] != batch:
        b = jnp.broadcast_to(b, (b.shape[0],) + batch)
    return a, b


def conv_full(a: jnp.ndarray, b: jnp.ndarray, nn: bool = False) -> jnp.ndarray:
    """Product of limb vectors; output unnormalized, length ``la + lb - 1``.

    Shift-and-add formulation (pad + add, no scatter) so the same body
    lowers both through XLA and through Mosaic inside Pallas kernels.
    ``nn=True`` asserts both operands are nonnegative (< 2^16) — canonical
    limbs qualify — and routes the products through the 2.1x-faster 16-bit
    VPU multiply (:func:`_mul16u`).
    """
    mul = _mul16u if nn else (lambda x, y: x * y)
    a, b = _broadcast_batch(a, b)
    na, nb = a.shape[0], b.shape[0]
    out_len = na + nb - 1
    out = None
    for i in range(na):
        prod = mul(a[i][None], b)  # (nb, batch)
        pad = [(i, out_len - nb - i)] + [(0, 0)] * (prod.ndim - 1)
        shifted = jnp.pad(prod, pad)
        out = shifted if out is None else out + shifted
    return out


def conv_low(a: jnp.ndarray, b: jnp.ndarray, keep: int, nn: bool = False) -> jnp.ndarray:
    """Truncated product: only the low ``keep`` output rows."""
    mul = _mul16u if nn else (lambda x, y: x * y)
    a, b = _broadcast_batch(a, b)
    out = None
    for i in range(min(a.shape[0], keep)):
        width = min(b.shape[0], keep - i)
        prod = mul(a[i][None], b[:width])
        pad = [(i, keep - width - i)] + [(0, 0)] * (prod.ndim - 1)
        shifted = jnp.pad(prod, pad)
        out = shifted if out is None else out + shifted
    return out


# ---------------------------------------------------------------------------
# comparison / conditional subtraction
# ---------------------------------------------------------------------------

def _ge(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lexicographic >= for normalized equal-length limb vectors."""
    n = a.shape[0]
    shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    gt = jnp.zeros(shape, dtype=jnp.bool_)
    eq = jnp.ones(shape, dtype=jnp.bool_)
    for i in range(n - 1, -1, -1):
        gt = gt | (eq & (a[i] > b[i]))
        eq = eq & (a[i] == b[i])
    return gt | eq


def _cond_sub(r: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """r - m if r >= m else r (normalized limbs, same length).

    Computed as one extended subtraction: the carry-out limb of
    ``(r - m) mod beta^(L+1)`` is MASK exactly when r < m (the difference
    wrapped), so no separate lexicographic compare is needed.
    """
    L = r.shape[0]
    d = carry_prop(r - m, L + 1, sweeps=0)
    neg = d[L] == MASK
    return jnp.where(neg[None], r, d[:L])


# ---------------------------------------------------------------------------
# modular ops
# ---------------------------------------------------------------------------

def _barrett_reduce(c_wide: jnp.ndarray, mp: ModParams) -> jnp.ndarray:
    """Reduce a normalized value of <= WIDE limbs mod ``m`` -> ``NL`` limbs."""
    if c_wide.shape[0] < WIDE:
        c_wide = jnp.pad(
            c_wide, [(0, WIDE - c_wide.shape[0])] + [(0, 0)] * (c_wide.ndim - 1)
        )
    m21 = jnp.asarray(mp.m21)
    mu = jnp.asarray(mp.mu)
    q1 = c_wide[NL - 1 :]  # floor(c / beta^(NL-1)): NL+1 limbs
    q2 = carry_prop(conv_full(q1, mu, nn=True), 2 * NL + 2)
    q3 = q2[NL + 1 :]  # floor(q2 / beta^(NL+1)): NL+1 limbs
    r1 = c_wide[: NL + 1]
    r2 = carry_prop(conv_low(q3, jnp.asarray(mp.m), NL + 1, nn=True), NL + 1)
    r = carry_prop(r1 - r2, NL + 1, sweeps=0)  # mod beta^(NL+1)
    r = _cond_sub(r, m21)
    r = _cond_sub(r, m21)
    return r[:NL]


def _mod_mul(a: jnp.ndarray, b: jnp.ndarray, mp: ModParams) -> jnp.ndarray:
    """Batched modular multiplication ``(a * b) mod m``.

    Inputs must be normalized canonical limbs (every caller's contract —
    also the precondition for the int32 convolution and Barrett), which
    makes the 16-bit multiply fast path valid."""
    wide = carry_prop(conv_full(a, b, nn=True), WIDE)
    return _barrett_reduce(wide, mp)


def _mod_add(a: jnp.ndarray, b: jnp.ndarray, mp: ModParams) -> jnp.ndarray:
    s = carry_prop(a + b, NL + 1, sweeps=0)
    return _cond_sub(s, jnp.asarray(mp.m21))[:NL]


def _mod_sub(a: jnp.ndarray, b: jnp.ndarray, mp: ModParams) -> jnp.ndarray:
    # a + (m - b): limbs in (-2^13, 2^14), single sweep leaves {-1,0,1}.
    d = carry_prop(a + jnp.asarray(mp.m) - b, NL + 1, sweeps=0)
    return _cond_sub(d, jnp.asarray(mp.m21))[:NL]


def _mod_neg(a: jnp.ndarray, mp: ModParams) -> jnp.ndarray:
    d = carry_prop(jnp.asarray(mp.m) - a, NL + 1, sweeps=0)
    return _cond_sub(d, jnp.asarray(mp.m21))[:NL]


def mod_select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Branchless where over limb vectors; ``cond`` has the batch shape."""
    return jnp.where(cond[None], a, b)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=0)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=0)


def zeros(batch_shape=()) -> jnp.ndarray:
    return jnp.zeros((NL,) + batch_shape, dtype=jnp.int32)


def from_const(value: int, batch_shape=()) -> jnp.ndarray:
    limb = jnp.asarray(int_to_limbs_np(value, NL)).reshape((NL,) + (1,) * len(batch_shape))
    return jnp.broadcast_to(limb, (NL,) + batch_shape)


# ---------------------------------------------------------------------------
# vector reductions
# ---------------------------------------------------------------------------

# Max summands accumulated in a single int32 pass: limb sums stay < 2^29 and
# wide totals stay well under beta^(2*NL), preserving the Barrett precondition.
_ACC_CHUNK = 1 << 16


def _sum_mod(a: jnp.ndarray, mp: ModParams) -> jnp.ndarray:
    """Sum of normalized ``(NL, n)`` elements over the batch axis -> ``(NL,)``."""
    n = a.shape[-1]
    while n > _ACC_CHUNK:
        pads = (-n) % _ACC_CHUNK
        padded = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pads)])
        chunked = jnp.sum(padded.reshape(*a.shape[:-1], -1, _ACC_CHUNK), axis=-1)
        a = _barrett_reduce(carry_prop(chunked, NL + 2), mp)
        n = a.shape[-1]
    s = jnp.sum(a, axis=-1, keepdims=True)
    return _barrett_reduce(carry_prop(s, WIDE), mp)[..., 0]


def _inner_product_mod(a: jnp.ndarray, b: jnp.ndarray, mp: ModParams) -> jnp.ndarray:
    """<a, b> mod m for ``(NL, n)`` inputs -> ``(NL,)``.

    Wide products are carry-normalized per element, summed in chunks of 2^16
    lanes, then Barrett-reduced.
    """
    n = a.shape[-1]
    prods = carry_prop(conv_full(a, b, nn=True), WIDE)  # (WIDE, n), limbs < 2^13
    if n <= _ACC_CHUNK:
        acc = jnp.sum(prods, axis=-1, keepdims=True)
        return _barrett_reduce(carry_prop(acc, WIDE), mp)[..., 0]
    pads = (-n) % _ACC_CHUNK
    padded = jnp.pad(prods, [(0, 0), (0, pads)])
    chunk_sums = jnp.sum(padded.reshape(WIDE, -1, _ACC_CHUNK), axis=-1)
    partials = _barrett_reduce(carry_prop(chunk_sums, WIDE), mp)
    return _sum_mod(partials, mp)


def _mod_pow(a: jnp.ndarray, exponent: int, mp: ModParams) -> jnp.ndarray:
    """a^exponent (static integer exponent), square-and-multiply ladder.

    Implemented as a ``lax.scan`` over the exponent bits so the compiled
    graph stays small (body is one square + one select-multiply).
    """
    e = int(exponent)
    if e == 0:
        return from_const(1, a.shape[1:])
    nbits = e.bit_length()
    bits = jnp.asarray([(e >> i) & 1 for i in range(nbits)], dtype=jnp.bool_)

    def body(carry, bit):
        result, base = carry
        mult = _mod_mul(result, base, mp)
        result = jnp.where(bit, mult, result)
        base = _mod_mul(base, base, mp)
        return (result, base), None

    init = (from_const(1, a.shape[1:]), a)
    (result, _), _ = jax.lax.scan(body, init, bits)
    return result


def mod_inverse(a: jnp.ndarray, mp: ModParams) -> jnp.ndarray:
    """Batched inversion by Fermat: a^(m-2).  ~250 squarings; use sparingly."""
    return mod_pow(a, mp.modulus - 2, mp)


def _powers(x: jnp.ndarray, n: int, mp: ModParams) -> jnp.ndarray:
    """[1, x, x^2, ..., x^(n-1)] for a single ``(NL,)`` element -> ``(NL, n)``.

    Doubling construction: P_{2k} = P_k ++ x^k * P_k (log-depth).
    """
    out = from_const(1, (1,))
    cur_len = 1
    x_pow = x[:, None]  # x^(cur_len)
    while cur_len < n:
        scaled = _mod_mul(out, x_pow, mp)
        out = jnp.concatenate([out, scaled], axis=-1)
        x_pow = _mod_mul(x_pow, x_pow, mp)
        cur_len *= 2
    return out[:, :n]


# ---------------------------------------------------------------------------
# Lazy (redundant) arithmetic — the point-layer fast path
# ---------------------------------------------------------------------------
#
# The exact ops above resolve carries to canonical [0, BASE) limbs with a
# Kogge-Stone prefix and land values in [0, m) with conditional subtractions.
# Both are pure overhead inside a point-addition chain: the group law never
# inspects a coordinate, so intermediate values only need (a) limbs small
# enough for the next int32 convolution and (b) values small enough for the
# Barrett precondition.  The lazy layer exploits that:
#
# * **SN (semi-normalized) limbs**: int32 in [-1, BASE] (note: signed, and
#   BASE itself allowed).  Restored after any op by 1-3 *sweeps* only —
#   no exact carry resolution anywhere.  A sweep is signed-safe: ``>>`` is an
#   arithmetic shift (floor division) and ``& MASK`` a nonnegative remainder,
#   so borrows propagate as negative carries.
# * **Lazy values**: elements are NLZ=21-limb tensors with *value* in
#   [0, 16m) (m = modulus ~2^251.8; 16m ~ 2^255.8 << beta^21).  ``lazy_mul``
#   outputs < 6m; ``lazy_add`` adds bounds; ``lazy_sub(a, b, k)`` computes
#   ``a + (k*m - b)`` for a static slack constant k*m >= bound(b).  Callers
#   track value bounds statically (see curve_jax._point_add_lazy) such that
#   every multiplication input stays < ~40m, keeping the wide product
#   < (40m)^2 ~ 2^514 < beta^40 — the Barrett precondition.
#
# Lazy Barrett (on a 41-limb SN wide value x < beta^40):
#   q1 = x[NL-1:]            (22 limbs; slice of SN limbs == floor division
#                             up to +-2, absorbed by the error analysis)
#   q2 = q1 * mu             (42 limbs, 3 sweeps)
#   q_hat = q2[NL+1:]        (21 limbs; q_hat in [q-3, q+1])
#   r = x - q_hat*m + m      (full-width, hence *nonnegative*: in (0, 6m))
# The only subtlety is truncating r's 41 SN limbs to 21: limbs >= NLZ encode
# hi in {-1, 0} (as a number), and hi == -1  iff  r[NLZ] = -1 (mod BASE) —
# a single limb test.  When hi == -1 the kept low part equals r + beta^NLZ,
# so subtract d21 = m*floor(beta^NLZ/m): the result is < 6m and congruent.
#
# Exactness is restored only at protocol boundaries (host conversion reduces
# mod m anyway; on-device canonicalization uses lazy_to_canonical).


def _sn_sweeps(x: jnp.ndarray, out_len: int, sweeps: int) -> jnp.ndarray:
    """Sweeps-only normalization to SN limbs in [-1, BASE].

    Unlike :func:`_sweep`, the **top limb is left unsplit** (its would-be
    carry is folded back), so no carry — in particular no negative borrow —
    is ever dropped and the represented value is exactly preserved for any
    ``out_len`` covering it.  The top limb may exceed BASE by the carry it
    reabsorbed; all lazy values here are << beta^out_len so it stays within
    a few units of [-1, BASE].  3 sweeps suffice for any int32 limbs; 1
    sweep when limbs are within ~2^17 of SN (sums/differences).
    """
    y = x
    if y.shape[0] < out_len:
        y = jnp.pad(y, [(0, out_len - y.shape[0])] + [(0, 0)] * (y.ndim - 1))
    elif y.shape[0] > out_len:
        raise ValueError("lazy sweeps cannot truncate")
    for _ in range(sweeps):
        r = y & MASK
        c = y >> BASE_BITS
        swept = r + _shift_down(c, 1)
        top = swept[out_len - 1] + c[out_len - 1] * BASE
        y = jnp.concatenate([swept[: out_len - 1], top[None]], axis=0)
    return y


def _redc(wide: jnp.ndarray, ctx) -> jnp.ndarray:
    """Montgomery REDC: 41-limb SN value ``x`` -> 21 SN limbs, value
    ``x * beta^-NLZ mod-lazy`` < 2m (for ``x < m * beta^NLZ``).

    NLZ sequential limb-elimination steps: step ``i`` picks
    ``u = (x_i * m') mod beta`` (``m' = -m^-1 mod beta``, a static int) and
    adds ``u * m * beta^i``, zeroing limb ``i`` exactly; its full value
    moves into the carry.  All accumulation stays within int32 (axpy terms
    <= 20 * 2^26 on any row).  Cheaper than Barrett by ~2x: no quotient
    convolution, and the output bound drops from 6m to 2m.
    """
    mp_int = ctx.m_prime
    m_rows = ctx.m  # (NL, ...) canonical limbs
    w, m_rows = _broadcast_batch(wide, m_rows)
    sparse = getattr(ctx, "sparse_limbs", None)
    if sparse:
        # Multiply-free REDC for sparse power-of-two moduli (the STARK base
        # prime): m' == beta-1 makes u = (-c_i) & MASK, and the u*m axpy is
        # one shift-add per nonzero limb of m.  Row-value bound: row j
        # receives at most one contribution per (k, shift) pair — here
        # u<<10 + u<<1 + u<<4 < 2^23.2 — plus its post-sweep SN value, well
        # inside int32; carries stay < 2^11.
        rows = [w[i] for i in range(w.shape[0])]
        carry = jnp.zeros_like(rows[0])
        for i in range(NLZ):
            c_i = rows[i] + carry
            u = (-c_i) & MASK
            carry = (c_i + u) >> BASE_BITS
            for k, sh in sparse:
                rows[i + k] = rows[i + k] + (u << sh)
        rows[NLZ] = rows[NLZ] + carry
        res = jnp.stack(rows[NLZ:], axis=0)
        return _sn_sweeps(res, NLZ, 2)
    # Limb i is never written back: after its step its entire value lives
    # in the carry.  Two emissions of the same recurrence:
    # * Mosaic (inside pallas kernels): per-row scalar updates — no
    #   concats/scatters, which Mosaic lowers poorly or not at all;
    # * XLA/interpreter: compact slice+concat (~8 ops per step) — the
    #   pallas interpreter inlines this body at every point-add site on
    #   CPU, where HLO count is the compile-time driver.
    if getattr(ctx, "unrolled_rows", False):
        rows = [w[i] for i in range(w.shape[0])]
        mr = [m_rows[k] for k in range(NL)]
        carry = jnp.zeros_like(rows[0])
        for i in range(NLZ):
            c_i = rows[i] + carry
            # u and the m rows are nonnegative < 2^13: 16-bit multiplies
            u = _mul16u(c_i & MASK, mp_int) & MASK
            carry = (c_i + _mul16u(u, mr[0])) >> BASE_BITS
            for k in range(1, NL):
                rows[i + k] = rows[i + k] + _mul16u(u, mr[k])
        rows[NLZ] = rows[NLZ] + carry
        res = jnp.stack(rows[NLZ:], axis=0)
        return _sn_sweeps(res, NLZ, 2)
    carry = jnp.zeros_like(w[0])
    for i in range(NLZ):
        c_i = w[i] + carry
        u = _mul16u(c_i & MASK, mp_int) & MASK
        carry = (c_i + _mul16u(u, m_rows[0])) >> BASE_BITS
        w = jnp.concatenate(
            [w[: i + 1], w[i + 1 : i + NL] + _mul16u(u[None], m_rows[1:]), w[i + NL :]],
            axis=0,
        )
    res = jnp.concatenate([(w[NLZ] + carry)[None], w[NLZ + 1 :]], axis=0)
    return _sn_sweeps(res, NLZ, 2)


def lazy_mul(a: jnp.ndarray, b: jnp.ndarray, ctx) -> jnp.ndarray:
    """Montgomery product ``a * b * beta^-NLZ`` mod-lazy.

    NLZ-limb SN inputs in Montgomery form (values < ~2^260), output < 2m,
    also Montgomery form.  The MSM/point layer keeps all coordinates in
    Montgomery form; host conversion multiplies by R / R^-1 for free.
    """
    a, b = _broadcast_batch(a, b)
    # 2 sweeps leave limbs within ~22 of [0, BASE) — safe for both the
    # next convolution (column sums stay < 2^31) and REDC's congruence-
    # based u extraction; the exact-SN third sweep is never needed here.
    na, nb = a.shape[0], b.shape[0]
    out_len = na + nb - 1
    out = None
    for i in range(na):
        prod = _mul16s(a[i][None], b)  # SN operands: signed 16-bit multiply
        pad = [(i, out_len - nb - i)] + [(0, 0)] * (prod.ndim - 1)
        shifted = jnp.pad(prod, pad)
        out = shifted if out is None else out + shifted
    wide = _sn_sweeps(out, 2 * NLZ - 1, 2)
    return _redc(wide, ctx)


def lazy_add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a + b on SN limbs; value bound is the sum of the operand bounds."""
    return _sn_sweeps(a + b, NLZ, 1)


def lazy_sub(a: jnp.ndarray, b: jnp.ndarray, slack: jnp.ndarray) -> jnp.ndarray:
    """a - b + slack, for a static slack constant (a multiple of m exceeding
    bound(b), keeping the value nonnegative)."""
    return _sn_sweeps(a + (slack - b), NLZ, 1)


def lazy_from_canonical(x: jnp.ndarray) -> jnp.ndarray:
    """(NL, ...) canonical limbs -> (NLZ, ...) lazy (pad a zero top limb)."""
    return jnp.pad(x, [(0, NLZ - x.shape[0])] + [(0, 0)] * (x.ndim - 1))


def _lazy_to_canonical(x: jnp.ndarray, mp: ModParams) -> jnp.ndarray:
    """(NLZ, ...) lazy SN value < 16m -> canonical (NL, ...) in [0, m).

    Boundary-only path (exact): full Barrett + Kogge-Stone + two
    conditional subtractions.
    """
    wide = jnp.pad(x, [(0, WIDE - x.shape[0])] + [(0, 0)] * (x.ndim - 1))
    # KS needs limbs in (-BASE, 2*BASE-1): SN limbs [-1, BASE] qualify.
    exact = _ks_resolve(_sweep(wide, WIDE))
    return _barrett_reduce(exact, mp)


lazy_to_canonical = functools.partial(jax.jit, static_argnums=(1,))(_lazy_to_canonical)


# ---------------------------------------------------------------------------
# public API: jit exactly once at this boundary (nested jit compiles slowly);
# internal callers and Pallas kernel bodies use the plain _impl functions.
# ---------------------------------------------------------------------------

barrett_reduce = functools.partial(jax.jit, static_argnums=(1,))(_barrett_reduce)
mod_mul = functools.partial(jax.jit, static_argnums=(2,))(_mod_mul)
mod_add = functools.partial(jax.jit, static_argnums=(2,))(_mod_add)
mod_sub = functools.partial(jax.jit, static_argnums=(2,))(_mod_sub)
mod_neg = functools.partial(jax.jit, static_argnums=(1,))(_mod_neg)
sum_mod = functools.partial(jax.jit, static_argnums=(1,))(_sum_mod)
inner_product_mod = functools.partial(jax.jit, static_argnums=(2,))(_inner_product_mod)
powers = functools.partial(jax.jit, static_argnums=(1, 2))(_powers)
mod_pow = functools.partial(jax.jit, static_argnums=(1, 2))(_mod_pow)
