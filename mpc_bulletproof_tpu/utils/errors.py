"""Error taxonomy, mirroring the reference's four error enums
(reference src/errors.rs:13-189) as Python exception classes.
"""

from __future__ import annotations


class BulletproofError(Exception):
    """Base class for all errors raised by mpc_bulletproof_tpu."""


class ProofError(BulletproofError):
    """Errors from proof creation/verification (src/errors.rs:13-55)."""


class VerificationError(ProofError):
    """The proof failed to verify (``ProofError::VerificationError``)."""


class FormatError(ProofError):
    """Byte-level proof parsing failed (``ProofError::FormatError``)."""


class MPCError(BulletproofError):
    """Errors in the MPC substrate (src/errors.rs:98-142 and the
    ``mpc_stark::error::MpcError`` surface)."""


class AuthenticationError(MPCError):
    """A MAC check failed when opening an authenticated value
    (``MpcError::AuthenticationError``; exercised by the malleability
    integration tests, reference integration/mpc_prover.rs:336-351)."""


class NetworkError(MPCError):
    """The two-party transport failed."""


class SetupFailedError(MPCError):
    """Fabric/network setup failed (``MultiproverError::SetupFailed``)."""


class MultiproverError(BulletproofError):
    """Errors from the collaborative prover (src/errors.rs:71-87)."""

    def __init__(self, message: str = "", cause: Exception | None = None):
        super().__init__(message or (str(cause) if cause else ""))
        self.cause = cause


class R1CSError(BulletproofError):
    """Errors from the constraint-system API (src/errors.rs:150-177)."""


class MissingAssignmentError(R1CSError):
    """A prover-side variable was allocated without an assignment
    (``R1CSError::MissingAssignment``)."""


class InvalidGeneratorsLengthError(R1CSError):
    """``BulletproofGens`` capacity is smaller than the circuit requires."""


class GadgetError(R1CSError):
    """A gadget failed to build its constraints
    (``R1CSError::GadgetError { description }``)."""
