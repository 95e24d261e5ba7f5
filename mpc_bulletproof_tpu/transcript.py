"""Keccak hash-chain Fiat-Shamir transcript.

Re-implements the capability of renegade's merlin fork (``HashChainTranscript``,
a git dependency of the reference — Cargo.toml:34) plus the protocol-level
``TranscriptProtocol`` trait (reference src/transcript.rs:25-121).

The reference replaced upstream merlin's STROBE sponge with a **keccak256 hash
chain** so a Cairo (StarkNet) verifier can recompute challenges.  The chain
maintained here:

* ``state`` is 32 bytes.
* ``new(label)``:            ``state = keccak256(pad_label(label))``
* ``append_message(l, m)``:  ``state = keccak256(state || pad_label(l) || m)``
* ``append_u64(l, v)``:      ``append_message(l, v as 8-byte little-endian)``
* ``challenge_bytes(l)``:    ``state = keccak256(state || pad_label(l))``;
  the new state is the 32-byte challenge.

Labels are zero-padded to 32-byte (felt) boundaries.  Scalars are absorbed
little-endian (BE bytes reversed — reference src/transcript.rs:87-92); points
are absorbed as ``x || y`` 32-byte LE felts with the identity as 64 zero bytes
(src/util.rs:274-289); challenges map to scalars through ``hash_to_scalar``
(src/util.rs:252-267).

This is host-side on purpose: the hash chain is sequential and tiny, and is
the synchronization spine between prover/verifier (and between MPC parties);
putting it on the TPU would serialize the device pipeline (SURVEY.md §7.3).
"""

from __future__ import annotations

import secrets

from .constants import R
from .ops.curve import StarkPoint, stark_point_to_transcript_bytes
from .ops.field import Scalar
from .ops.keccak import keccak256, pad_label
from .utils.errors import ProofError


def hash_to_scalar(low_u256: bytes) -> Scalar:
    """Uniform 32-byte buffer -> Scalar, Cairo-compatible.

    Extends the 32 uniform bytes to 64 via one more keccak, then interprets
    the reversed concatenation as a big-endian integer reduced mod ``R``
    (reference src/util.rs:252-267).
    """
    high_u256 = keccak256(low_u256)
    bytes_be = bytes(reversed(low_u256 + high_u256))
    return Scalar.from_be_bytes_mod_order(bytes_be)


class HashChainTranscript:
    """The keccak-chain transcript (merlin-fork ``HashChainTranscript``)."""

    __slots__ = ("state",)

    def __init__(self, label: bytes = b""):
        self.state = keccak256(pad_label(label))

    def clone(self) -> "HashChainTranscript":
        t = HashChainTranscript.__new__(HashChainTranscript)
        t.state = self.state
        return t

    # -- raw chain ops ------------------------------------------------------

    def append_message(self, label: bytes, message: bytes) -> None:
        self.state = keccak256(self.state + pad_label(label) + message)

    def append_u64(self, label: bytes, value: int) -> None:
        self.append_message(label, int(value).to_bytes(8, "little"))

    def challenge_bytes(self, label: bytes) -> bytes:
        self.state = keccak256(self.state + pad_label(label))
        return self.state

    # -- TranscriptProtocol (reference src/transcript.rs:25-121) ------------

    def rangeproof_domain_sep(self, n: int, m: int) -> None:
        self.append_message(b"dom-sep", pad_label(b"rangeproof v1"))
        self.append_u64(b"n", n)
        self.append_u64(b"m", m)

    def innerproduct_domain_sep(self, n: int) -> None:
        self.append_message(b"dom-sep", pad_label(b"ipp v1"))
        self.append_u64(b"n", n)

    def r1cs_domain_sep(self) -> None:
        self.append_message(b"dom-sep", pad_label(b"r1cs v1"))

    def r1cs_1phase_domain_sep(self) -> None:
        self.append_message(b"dom-sep", pad_label(b"r1cs-1phase"))

    def r1cs_2phase_domain_sep(self) -> None:
        self.append_message(b"dom-sep", pad_label(b"r1cs-2phase"))

    def append_scalar(self, label: bytes, scalar: Scalar) -> None:
        # Scalars are absorbed little-endian to match the Cairo implementation
        # (reference src/transcript.rs:87-92).
        self.append_message(label, bytes(reversed(scalar.to_bytes_be())))

    def append_point(self, label: bytes, point: StarkPoint) -> None:
        self.append_message(label, stark_point_to_transcript_bytes(point))

    def validate_and_append_point(self, label: bytes, point: StarkPoint) -> None:
        """Reject the identity point, then absorb (src/transcript.rs:101-113)."""
        if point.is_identity():
            raise ProofError("verification error: identity point in transcript")
        self.append_point(label, point)

    def challenge_scalar(self, label: bytes) -> Scalar:
        return hash_to_scalar(self.challenge_bytes(label))

    # -- witness-seeded RNG (merlin build_rng) ------------------------------

    def build_rng(self) -> "TranscriptRngBuilder":
        return TranscriptRngBuilder(self.state)


class TranscriptRngBuilder:
    """Builder for a transcript-and-witness-seeded RNG.

    Mirrors merlin's ``build_rng`` / ``rekey_with_witness_bytes`` / ``finalize``
    flow used for prover blinding factors (reference src/r1cs/prover.rs:435-445).
    """

    __slots__ = ("state",)

    def __init__(self, state: bytes):
        self.state = state

    def rekey_with_witness_bytes(self, label: bytes, witness: bytes) -> "TranscriptRngBuilder":
        self.state = keccak256(self.state + pad_label(label) + witness)
        return self

    def finalize(self, entropy: bytes | None = None) -> "TranscriptRng":
        if entropy is None:
            entropy = secrets.token_bytes(32)
        return TranscriptRng(keccak256(self.state + entropy))


class TranscriptRng:
    """Counter-mode keccak RNG (deterministic given its seed state)."""

    __slots__ = ("state", "counter")

    def __init__(self, state: bytes):
        self.state = state
        self.counter = 0

    def randbytes(self, n: int) -> bytes:
        nblocks = (n + 31) // 32
        try:
            from .utils import native

            if native.available():
                out = native.rng_fill(self.state, self.counter, nblocks)
                self.counter += nblocks
                return out[:n]
        except Exception:  # pragma: no cover - fall through to pure python
            pass
        out = bytearray()
        while len(out) < n:
            out += keccak256(self.state + self.counter.to_bytes(8, "little"))
            self.counter += 1
        return bytes(out[:n])

    def random_scalar(self) -> Scalar:
        return Scalar(int.from_bytes(self.randbytes(48), "big") % R)

    def random_scalars(self, k: int) -> list[Scalar]:
        """Batch: one native call fills all blocks."""
        raw = self.randbytes(48 * k)
        return [
            Scalar(int.from_bytes(raw[48 * i : 48 * (i + 1)], "big") % R)
            for i in range(k)
        ]


class MpcTranscript:
    """Transcript for the multiprover setting.

    The reference sequences transcript mutations as dummy gates in its lazy
    MPC dataflow graph so both parties absorb opened values in a canonical
    order (reference src/transcript.rs:127-268).  This fabric is eager and
    round-explicit, so program order *is* the canonical order: both parties
    execute the identical protocol sequence and absorb identical opened
    values, keeping their Fiat-Shamir challenges synchronized.  The wrapper
    therefore simply guards that only opened (public) values are absorbed.
    """

    __slots__ = ("inner",)

    def __init__(self, transcript: HashChainTranscript):
        self.inner = transcript

    def innerproduct_domain_sep(self, n: int) -> None:
        self.inner.innerproduct_domain_sep(n)

    def r1cs_domain_sep(self) -> None:
        self.inner.r1cs_domain_sep()

    def r1cs_1phase_domain_sep(self) -> None:
        self.inner.r1cs_1phase_domain_sep()

    def r1cs_2phase_domain_sep(self) -> None:
        self.inner.r1cs_2phase_domain_sep()

    def append_u64(self, label: bytes, value: int) -> None:
        self.inner.append_u64(label, value)

    def append_scalar(self, label: bytes, scalar: Scalar) -> None:
        if not isinstance(scalar, Scalar):
            raise TypeError("MpcTranscript absorbs opened (public) scalars only")
        self.inner.append_scalar(label, scalar)

    def append_point(self, label: bytes, point: StarkPoint) -> None:
        if not isinstance(point, StarkPoint):
            raise TypeError("MpcTranscript absorbs opened (public) points only")
        self.inner.append_point(label, point)

    def challenge_scalar(self, label: bytes) -> Scalar:
        return self.inner.challenge_scalar(label)
