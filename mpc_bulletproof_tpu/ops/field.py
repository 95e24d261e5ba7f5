"""Host-side scalar-field arithmetic (``Scalar``) and base-field helpers.

This mirrors the capability surface of ``mpc_stark::algebra::scalar::Scalar``
(reference Cargo.toml:21; API observed in SURVEY.md §2.4): construction,
random sampling, inversion, batch inversion, BE byte codecs.

Host scalars are exact Python integers — they are used for the sequential
Fiat-Shamir path (challenges, per-round folding coefficients) and as the
golden reference for the TPU limb kernels in
:mod:`mpc_bulletproof_tpu.ops.limb`.  Bulk scalar *vectors* live on device;
see :class:`mpc_bulletproof_tpu.ops.scalar_vector.ScalarVector`.
"""

from __future__ import annotations

import secrets
from typing import Iterable, Sequence

from ..constants import R, SCALAR_BYTES


_StarkPoint = None


class Scalar:
    """An element of the STARK-curve scalar field (integers mod ``R``)."""

    __slots__ = ("value",)

    MODULUS = R

    def __init__(self, value: int | "Scalar" = 0):
        if isinstance(value, Scalar):
            self.value = value.value
        else:
            self.value = value % R

    # -- constructors -------------------------------------------------------

    @staticmethod
    def zero() -> "Scalar":
        return Scalar(0)

    @staticmethod
    def one() -> "Scalar":
        return Scalar(1)

    @staticmethod
    def random(rng=None) -> "Scalar":
        """Uniformly random scalar. ``rng`` may supply ``randbytes(n)``."""
        if rng is None:
            raw = secrets.token_bytes(SCALAR_BYTES + 16)
        else:
            raw = rng.randbytes(SCALAR_BYTES + 16)
        return Scalar(int.from_bytes(raw, "big"))

    @staticmethod
    def from_be_bytes_mod_order(data: bytes) -> "Scalar":
        """Interpret ``data`` as a big-endian integer, reduced mod ``R``.

        Mirrors ``Scalar::from_be_bytes_mod_order`` (used at reference
        src/inner_product_proof.rs:451-452, src/util.rs:266).
        """
        return Scalar(int.from_bytes(data, "big"))

    # -- codecs -------------------------------------------------------------

    def to_bytes_be(self) -> bytes:
        """Canonical 32-byte big-endian encoding (``Scalar::to_bytes_be``)."""
        return self.value.to_bytes(SCALAR_BYTES, "big")

    # -- arithmetic ---------------------------------------------------------

    def __add__(self, other):
        if type(other) is Scalar:  # fast path: the proving hot loops
            r = Scalar.__new__(Scalar)
            r.value = (self.value + other.value) % R
            return r
        if not isinstance(other, (Scalar, int)):
            return NotImplemented  # let Variable/LC reflected ops engage
        return Scalar(self.value + _coerce(other))

    __radd__ = __add__

    def __sub__(self, other):
        if type(other) is Scalar:
            r = Scalar.__new__(Scalar)
            r.value = (self.value - other.value) % R
            return r
        if not isinstance(other, (Scalar, int)):
            return NotImplemented
        return Scalar(self.value - _coerce(other))

    def __rsub__(self, other):
        if not isinstance(other, (Scalar, int)):
            return NotImplemented
        return Scalar(_coerce(other) - self.value)

    def __mul__(self, other):
        if type(other) is Scalar:
            r = Scalar.__new__(Scalar)
            r.value = self.value * other.value % R
            return r
        # Scalar * StarkPoint is delegated to the point type.
        global _StarkPoint
        if _StarkPoint is None:
            from .curve import StarkPoint as _SP

            _StarkPoint = _SP
        if isinstance(other, _StarkPoint):
            return other.scalar_mul(self)
        if not isinstance(other, (Scalar, int)):
            return NotImplemented
        return Scalar(self.value * _coerce(other))

    def __rmul__(self, other):
        if not isinstance(other, (Scalar, int)):
            return NotImplemented
        return Scalar(self.value * _coerce(other))

    def __neg__(self) -> "Scalar":
        return Scalar(-self.value)

    def __pow__(self, exponent: int) -> "Scalar":
        return Scalar(pow(self.value, exponent, R))

    def inverse(self) -> "Scalar":
        """Multiplicative inverse (raises ``ZeroDivisionError`` on zero)."""
        return Scalar(pow(self.value, -1, R))

    def is_zero(self) -> bool:
        return self.value == 0

    # -- comparisons / hashing ---------------------------------------------

    def __eq__(self, other) -> bool:
        if isinstance(other, Scalar):
            return self.value == other.value
        if isinstance(other, int):
            return self.value == other % R
        return NotImplemented

    def __hash__(self) -> int:
        return hash(("Scalar", self.value))

    def __repr__(self) -> str:
        return f"Scalar(0x{self.value:x})"

    def __int__(self) -> int:
        return self.value

    # -- batch helpers ------------------------------------------------------

    @staticmethod
    def batch_inverse(values: Sequence["Scalar"]) -> list["Scalar"]:
        """Montgomery's trick: invert ``values`` with a single field inversion.

        Mirrors ``Scalar::batch_inverse`` (used at reference
        src/inner_product_proof.rs:283).  Zero inputs raise.
        """
        n = len(values)
        if n == 0:
            return []
        prefix = [0] * n
        acc = 1
        for i, v in enumerate(values):
            acc = acc * v.value % R
            prefix[i] = acc
        inv = pow(acc, -1, R)
        out: list[Scalar] = [Scalar(0)] * n
        for i in range(n - 1, 0, -1):
            out[i] = Scalar(prefix[i - 1] * inv)
            inv = inv * values[i].value % R
        out[0] = Scalar(inv)
        return out


def _coerce(other) -> int:
    if isinstance(other, Scalar):
        return other.value
    if isinstance(other, int):
        return other
    raise TypeError(f"cannot coerce {type(other)!r} to Scalar")


def inner_product(a: Sequence[Scalar], b: Sequence[Scalar]) -> Scalar:
    """<a, b> over the scalar field (reference src/inner_product_proof.rs:463)."""
    if len(a) != len(b):
        raise ValueError("inner_product(a,b): lengths of vectors do not match")
    acc = 0
    for x, y in zip(a, b):
        acc += x.value * y.value
    return Scalar(acc)


def exp_iter(x: Scalar):
    """Infinite iterator 1, x, x^2, ... (reference src/util.rs:73-76)."""
    cur = 1
    xv = x.value
    while True:
        yield Scalar(cur)
        cur = cur * xv % R


def scalar_powers(x: Scalar, n: int) -> list[Scalar]:
    """First ``n`` powers of ``x``: [1, x, ..., x^(n-1)]."""
    out = []
    cur = 1
    xv = x.value
    for _ in range(n):
        out.append(Scalar(cur))
        cur = cur * xv % R
    return out


def add_vec(a: Sequence[Scalar], b: Sequence[Scalar]) -> list[Scalar]:
    """Element-wise vector addition (reference src/util.rs:92-102)."""
    return [x + y for x, y in zip(a, b)]


def sum_of_powers(x: Scalar, n: int) -> Scalar:
    """Sum of the first ``n`` powers of ``x`` (reference src/util.rs:218-239).

    Uses the O(lg n) doubling recurrence when ``n`` is a power of two.
    """
    if n == 0:
        return Scalar(0)
    if n & (n - 1) != 0:  # not a power of two: slow path
        return Scalar(sum(s.value for s in scalar_powers(x, n)))
    if n == 1:
        return Scalar(1)
    m = n
    result = (1 + x.value) % R
    factor = x.value
    while m > 2:
        factor = factor * factor % R
        result = (result + factor * result) % R
        m //= 2
    return Scalar(result)


def scalar_exp_vartime(x: Scalar, n: int) -> Scalar:
    """x^n by binary exponentiation (reference src/util.rs:200-212)."""
    return Scalar(pow(x.value, n, R))


def scalars_from_ints(values: Iterable[int]) -> list[Scalar]:
    return [Scalar(v) for v in values]
