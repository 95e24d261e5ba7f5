"""The 2-party MPC fabric: SPDZ-style authenticated sharing, Beaver
multiplication, and batched MAC-checked openings.

Re-imagines ``mpc_stark::MpcFabric`` (SURVEY.md §2.4) for an eager,
round-explicit design: where the reference hides communication inside a
lazy async dataflow graph executed as network results arrive, this fabric
makes every communication round a single batched exchange, which is the
right shape both for a TCP/DCN link (fewer round trips) and for mapping
share tensors onto device collectives later.

Value model (maliciously-secure opening):

* global MAC key ``alpha = alpha_0 + alpha_1``; party ``i`` holds ``alpha_i``
  (from the pre-processing source);
* a shared value ``x`` is ``(x_i, m_i)`` with ``x_0 + x_1 = x`` and
  ``m_0 + m_1 = alpha * x``;
* addition / public-scalar multiplication are local; public addition adjusts
  party 0's share and both MAC shares;
* multiplication consumes a Beaver triple and one batched open round;
* ``open_authenticated*`` opens, then runs a **commit-then-reveal** exchange
  of the MAC-check values ``sigma_i = m_i - alpha_i * x``: each party first
  sends ``keccak256(sigmas || salt)``, then reveals; a commitment mismatch or
  a nonzero sigma sum raises
  :class:`~mpc_bulletproof_tpu.utils.errors.AuthenticationError` (the
  malleability tests pin this — reference integration/mpc_prover.rs:336-351).
  The commitment round is what makes the opening maliciously secure against
  a *rushing* adversary: without it a party that waits for the honest
  ``sigma`` can reply with its negation and pass the sum check.
* input sharing uses SPDZ input tuples (owner-known authenticated masks from
  pre-processing), so the owner broadcasts ``x - r`` without any online mask
  opening a malicious peer could shift.
"""

from __future__ import annotations

import os
import struct
from typing import Iterable, Sequence

from ..ops.keccak import keccak256

from ..constants import SCALAR_BYTES
from ..ops.curve import StarkPoint
from ..ops.field import Scalar
from ..utils.errors import AuthenticationError, MPCError
from .beaver import SharedValueSource
from .network import PARTY0, PARTY1, TwoPartyNetwork


def _pack_scalars(values: Sequence[Scalar]) -> bytes:
    return struct.pack(">I", len(values)) + b"".join(v.to_bytes_be() for v in values)


def _unpack_scalars(data: bytes) -> list[Scalar]:
    (count,) = struct.unpack(">I", data[:4])
    out = []
    for i in range(count):
        off = 4 + i * SCALAR_BYTES
        out.append(Scalar.from_be_bytes_mod_order(data[off : off + SCALAR_BYTES]))
    return out


# Fabric wire format for points: uncompressed x|y (32 LE bytes each) plus an
# infinity flag.  Proof CODECS stay compressed (32 bytes); the party link is
# our own transport, and decompression costs a Tonelli-Shanks square root —
# P-1 has 2-adicity 192, making it the single most expensive scalar op in
# the whole library.  Validation on receive is the on-curve check (cheap).
_POINT_WIRE = 65


def _pack_points(points: Sequence[StarkPoint]) -> bytes:
    parts = [struct.pack(">I", len(points))]
    for p in points:
        if p.is_identity():
            parts.append(b"\x00" * 64 + b"\x01")
        else:
            parts.append(
                p.x.to_bytes(32, "little") + p.y.to_bytes(32, "little") + b"\x00"
            )
    return b"".join(parts)


def _unpack_points(data: bytes) -> list[StarkPoint]:
    (count,) = struct.unpack(">I", data[:4])
    out = []
    for i in range(count):
        off = 4 + i * _POINT_WIRE
        raw = data[off : off + _POINT_WIRE]
        if raw[64]:
            out.append(StarkPoint.identity())
            continue
        out.append(
            StarkPoint.from_affine(
                int.from_bytes(raw[:32], "little"),
                int.from_bytes(raw[32:64], "little"),
            )
        )
    return out


class AuthenticatedScalarVector:
    """A vector of authenticated secret shares (this party's view)."""

    __slots__ = ("fabric", "shares", "macs")

    def __init__(self, fabric: "MpcFabric", shares: list[Scalar], macs: list[Scalar]):
        self.fabric = fabric
        self.shares = shares
        self.macs = macs

    def __len__(self) -> int:
        return len(self.shares)

    def __getitem__(self, idx):
        if isinstance(idx, slice):
            return AuthenticatedScalarVector(self.fabric, self.shares[idx], self.macs[idx])
        return AuthenticatedScalarVector(self.fabric, [self.shares[idx]], [self.macs[idx]])

    @staticmethod
    def concat(parts: Iterable["AuthenticatedScalarVector"]) -> "AuthenticatedScalarVector":
        parts = list(parts)
        fabric = parts[0].fabric
        shares, macs = [], []
        for p in parts:
            shares.extend(p.shares)
            macs.extend(p.macs)
        return AuthenticatedScalarVector(fabric, shares, macs)

    # -- linear (local) algebra --------------------------------------------

    def __add__(self, other):
        if isinstance(other, AuthenticatedScalarVector):
            return AuthenticatedScalarVector(
                self.fabric,
                [a + b for a, b in zip(self.shares, other.shares)],
                [a + b for a, b in zip(self.macs, other.macs)],
            )
        return self.add_public(other)

    def __sub__(self, other):
        if isinstance(other, AuthenticatedScalarVector):
            return AuthenticatedScalarVector(
                self.fabric,
                [a - b for a, b in zip(self.shares, other.shares)],
                [a - b for a, b in zip(self.macs, other.macs)],
            )
        return self.add_public(_neg_public(other, len(self)))

    def __neg__(self):
        return AuthenticatedScalarVector(
            self.fabric, [-s for s in self.shares], [-m for m in self.macs]
        )

    def add_public(self, public) -> "AuthenticatedScalarVector":
        """Add public constants: party 0 adjusts shares, both adjust MACs."""
        values = _as_public_list(public, len(self))
        alpha = self.fabric.mac_key_share
        if self.fabric.party_id == PARTY0:
            shares = [s + v for s, v in zip(self.shares, values)]
        else:
            shares = list(self.shares)
        macs = [m + alpha * v for m, v in zip(self.macs, values)]
        return AuthenticatedScalarVector(self.fabric, shares, macs)

    def mul_public(self, public) -> "AuthenticatedScalarVector":
        values = _as_public_list(public, len(self))
        return AuthenticatedScalarVector(
            self.fabric,
            [s * v for s, v in zip(self.shares, values)],
            [m * v for m, v in zip(self.macs, values)],
        )

    def __mul__(self, other):
        if isinstance(other, AuthenticatedScalarVector):
            return self.fabric.beaver_mul(self, other)
        return self.mul_public(other)

    __rmul__ = mul_public

    def sum(self) -> "AuthenticatedScalarVector":
        return AuthenticatedScalarVector(
            self.fabric,
            [Scalar(sum(int(s) for s in self.shares))],
            [Scalar(sum(int(m) for m in self.macs))],
        )

    # -- openings -----------------------------------------------------------

    def open(self) -> list[Scalar]:
        return self.fabric.open_batch(self)

    def open_authenticated(self) -> list[Scalar]:
        return self.fabric.open_authenticated_batch(self)


class AuthenticatedPoint:
    """An authenticated secret-shared curve point (value + MAC shares)."""

    __slots__ = ("fabric", "share", "mac")

    def __init__(self, fabric: "MpcFabric", share: StarkPoint, mac: StarkPoint):
        self.fabric = fabric
        self.share = share
        self.mac = mac

    def __add__(self, other: "AuthenticatedPoint") -> "AuthenticatedPoint":
        return AuthenticatedPoint(self.fabric, self.share + other.share, self.mac + other.mac)

    def add_public(self, point: StarkPoint) -> "AuthenticatedPoint":
        share = self.share + point if self.fabric.party_id == PARTY0 else self.share
        return AuthenticatedPoint(
            self.fabric, share, self.mac + self.fabric.mac_key_share * point
        )

    def open(self) -> StarkPoint:
        return self.fabric.open_points([self])[0]

    def open_authenticated(self) -> StarkPoint:
        return self.fabric.open_authenticated_points([self])[0]


class MpcFabric:
    """The per-party MPC runtime (eager, round-batched)."""

    def __init__(self, network: TwoPartyNetwork, beaver_source: SharedValueSource):
        self.net = network
        self.beaver = beaver_source
        self.party_id = network.party_id
        self.mac_key_share = beaver_source.mac_key_share()

    # -- allocation / sharing ----------------------------------------------

    def batch_share_scalars(
        self, values: Sequence[Scalar] | None, owner: int, count: int | None = None
    ) -> AuthenticatedScalarVector:
        """Secret-share ``values`` held by ``owner``; the other party passes
        ``None`` and the expected ``count``.

        Sharing uses SPDZ input tuples: the owner holds the plaintext mask
        ``r`` from pre-processing alongside the authenticated share ``[r]``,
        computes ``delta = x - r`` locally, and broadcasts it; ``[x] = [r] +
        delta``.  No mask is opened online, so a malicious peer cannot shift
        an honest owner's input.
        """
        if self.party_id == owner:
            if values is None:
                raise MPCError("owner must supply values")
            k = len(values)
        else:
            if count is None:
                raise MPCError("non-owner must supply the expected count")
            k = count

        masks, plain = self.beaver.next_input_mask_batch(k, owner)
        mask_vec = AuthenticatedScalarVector(
            self, [s for s, _ in masks], [m for _, m in masks]
        )
        if self.party_id == owner:
            deltas = [x - r for x, r in zip(values, plain)]
            self.net.send_bytes(_pack_scalars(deltas))
        else:
            deltas = _unpack_scalars(self.net.recv_bytes())
        return mask_vec.add_public(deltas)

    def share_scalar(self, value: Scalar | None, owner: int) -> AuthenticatedScalarVector:
        return self.batch_share_scalars(
            [value] if value is not None else None, owner, count=1
        )

    def zeros_authenticated(self, k: int) -> AuthenticatedScalarVector:
        zero = Scalar(0)
        return AuthenticatedScalarVector(self, [zero] * k, [zero] * k)

    def one_authenticated(self) -> AuthenticatedScalarVector:
        return self.zeros_authenticated(1).add_public([Scalar(1)])

    def random_shared_scalars_authenticated(self, k: int) -> AuthenticatedScalarVector:
        vals = self.beaver.next_shared_value_batch(k)
        return AuthenticatedScalarVector(
            self, [s for s, _ in vals], [m for _, m in vals]
        )

    def allocate_scalars(self, values: Sequence[Scalar]) -> AuthenticatedScalarVector:
        """Lift public constants into authenticated form (both parties know
        the values; mirrors ``fabric.allocate_scalar``)."""
        return self.zeros_authenticated(len(values)).add_public(list(values))

    def authenticate_preshared(
        self, raw_shares: Sequence[Scalar]
    ) -> AuthenticatedScalarVector:
        """Attach MACs to values the parties already hold as plain additive
        shares (the ``commit_preshared`` entry path, reference
        mpc_prover.rs:402-456): open ``x - r`` against an authenticated
        random mask — one plain exchange, no MAC leakage."""
        k = len(raw_shares)
        masks = self.beaver.next_shared_value_batch(k)
        mask_vec = AuthenticatedScalarVector(
            self, [s for s, _ in masks], [m for _, m in masks]
        )
        delta_shares = [x - r for x, r in zip(raw_shares, mask_vec.shares)]
        theirs = self.exchange_scalars(delta_shares)
        deltas = [a + b for a, b in zip(delta_shares, theirs)]
        return mask_vec.add_public(deltas)

    def share_point(self, point: StarkPoint | None, owner: int) -> "AuthenticatedPoint":
        """Secret-share a curve point held by ``owner``.

        Same SPDZ input-tuple shape as :meth:`batch_share_scalars` lifted to
        the group: the owner knows the plaintext scalar mask ``r``, forms the
        mask point ``r * G`` locally, and broadcasts ``delta = P - r*G``; the
        authenticated mask point is ``([r] * G, [alpha r] * G)``.
        """
        gen = StarkPoint.generator()
        masks, plain = self.beaver.next_input_mask_batch(1, owner)
        (mask_share, mask_mac) = masks[0]
        mask_pt = AuthenticatedPoint(self, mask_share * gen, mask_mac * gen)
        if self.party_id == owner:
            if point is None:
                raise MPCError("owner must supply the point")
            delta = point + (-(plain[0] * gen))
            self.net.send_bytes(_pack_points([delta]))
        else:
            delta = _unpack_points(self.net.recv_bytes())[0]
        return mask_pt.add_public(delta)

    # -- raw exchange -------------------------------------------------------

    def exchange_scalars(self, values: Sequence[Scalar]) -> list[Scalar]:
        return _unpack_scalars(self.net.exchange_bytes(_pack_scalars(values)))

    def exchange_points(self, points: Sequence[StarkPoint]) -> list[StarkPoint]:
        return _unpack_points(self.net.exchange_bytes(_pack_points(points)))

    def send_scalars(self, values: Sequence[Scalar]) -> None:
        self.net.send_bytes(_pack_scalars(values))

    def receive_scalars(self) -> list[Scalar]:
        return _unpack_scalars(self.net.recv_bytes())

    # -- opening ------------------------------------------------------------

    def open_batch(self, vec: AuthenticatedScalarVector) -> list[Scalar]:
        theirs = self.exchange_scalars(vec.shares)
        return [a + b for a, b in zip(vec.shares, theirs)]

    def _committed_exchange(self, payload: bytes) -> bytes:
        """Commit-then-reveal exchange of ``payload``.

        Both parties first exchange ``keccak256(payload || salt)`` and only
        then the payloads; a peer cannot choose its message after seeing
        ours (no rushing).  Raises on commitment mismatch.
        """
        salt = os.urandom(32)
        their_commit = self.net.exchange_bytes(keccak256(payload + salt))
        their_blob = self.net.exchange_bytes(payload + salt)
        if len(their_blob) < 32 or keccak256(their_blob) != their_commit:
            raise AuthenticationError("commitment mismatch in MAC-check reveal")
        return their_blob[:-32]

    def open_authenticated_batch(self, vec: AuthenticatedScalarVector) -> list[Scalar]:
        opened = self.open_batch(vec)
        sigmas = [
            m - self.mac_key_share * v for m, v in zip(vec.macs, opened)
        ]
        their_sigmas = _unpack_scalars(self._committed_exchange(_pack_scalars(sigmas)))
        if len(their_sigmas) != len(sigmas):
            raise AuthenticationError("MAC check reveal length mismatch")
        for mine, theirs in zip(sigmas, their_sigmas):
            if not (mine + theirs).is_zero():
                raise AuthenticationError("MAC check failed on opening")
        return opened

    def open_points(self, pts: Sequence[AuthenticatedPoint]) -> list[StarkPoint]:
        theirs = self.exchange_points([p.share for p in pts])
        return [mine.share + other for mine, other in zip(pts, theirs)]

    def open_authenticated_points(self, pts: Sequence[AuthenticatedPoint]) -> list[StarkPoint]:
        opened = self.open_points(pts)
        sigmas = [p.mac - self.mac_key_share * v for p, v in zip(pts, opened)]
        their_sigmas = _unpack_points(self._committed_exchange(_pack_points(sigmas)))
        if len(their_sigmas) != len(sigmas):
            raise AuthenticationError("MAC check reveal length mismatch")
        for mine, theirs in zip(sigmas, their_sigmas):
            if not (mine + theirs).is_identity():
                raise AuthenticationError("MAC check failed on point opening")
        return opened

    # -- multiplication -----------------------------------------------------

    def beaver_mul(
        self, x: AuthenticatedScalarVector, y: AuthenticatedScalarVector
    ) -> AuthenticatedScalarVector:
        """Batched Beaver multiplication: one triple per element, one
        batched open round for all (x - a, y - b)."""
        k = len(x)
        if len(y) != k:
            raise MPCError("beaver_mul length mismatch")
        a_raw, b_raw, c_raw = self.beaver.next_triplet_batch(k)
        a = AuthenticatedScalarVector(self, [s for s, _ in a_raw], [m for _, m in a_raw])
        b = AuthenticatedScalarVector(self, [s for s, _ in b_raw], [m for _, m in b_raw])
        c = AuthenticatedScalarVector(self, [s for s, _ in c_raw], [m for _, m in c_raw])

        d_e = AuthenticatedScalarVector.concat([x - a, y - b])
        opened = self.open_batch(d_e)
        d, e = opened[:k], opened[k:]

        # z = c + d*b + e*a + d*e (public d*e added by party 0 + MAC adjust)
        z = c + b.mul_public(d) + a.mul_public(e)
        de = [di * ei for di, ei in zip(d, e)]
        return z.add_public(de)

    def inner_product(
        self, x: AuthenticatedScalarVector, y: AuthenticatedScalarVector
    ) -> AuthenticatedScalarVector:
        """<x, y> as a length-1 authenticated vector (one beaver round)."""
        return self.beaver_mul(x, y).sum()

    # -- authenticated MSM over public points --------------------------------

    def shared_msm(
        self, scalars: AuthenticatedScalarVector, points: Sequence[StarkPoint]
    ) -> AuthenticatedPoint:
        """MSM with shared scalars over public points — local per party
        (reference mpc_prover.rs:592-594: generators are public so the MSM
        itself needs no communication).

        Both the share row and the MAC row route through the standard
        backend dispatcher, so large MPC commitment MSMs ride the device /
        mesh path exactly like the single-prover ones (SURVEY.md §3.3)."""
        from ..ops import backend

        pts = list(points)
        share = backend.dispatch_msm(scalars.shares, pts)
        mac = backend.dispatch_msm(scalars.macs, pts)
        return AuthenticatedPoint(self, share, mac)

    def shutdown(self) -> None:
        self.net.close()


def _as_public_list(public, k: int) -> list[Scalar]:
    if isinstance(public, Scalar):
        return [public] * k
    if isinstance(public, int):
        return [Scalar(public)] * k
    values = list(public)
    if len(values) != k:
        raise MPCError("public operand length mismatch")
    return [v if isinstance(v, Scalar) else Scalar(v) for v in values]


def _neg_public(public, k: int):
    return [-v for v in _as_public_list(public, k)]
