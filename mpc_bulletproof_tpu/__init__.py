"""mpc_bulletproof_tpu — a TPU-native collaboratively-proved Bulletproofs
framework over the STARK curve.

A from-scratch re-design of the capability surface of
renegade-fi/mpc-bulletproof (see SURVEY.md): inner-product arguments, R1CS
constraint-system proofs, range proofs, and a 2-party collaborative (MPC)
prover — with the hot compute path (field/curve limb arithmetic, Pippenger
MSM, IPP folds) built on JAX/XLA/Pallas for TPU and the sequential
Fiat-Shamir spine on host.
"""

from .constants import P, R, SCALAR_BYTES, STARK_POINT_BYTES  # noqa: F401
from .ops.field import Scalar, inner_product  # noqa: F401
from .ops.curve import StarkPoint, random_point  # noqa: F401
from .generators import BulletproofGens, BulletproofGensShare, PedersenGens  # noqa: F401
from .transcript import HashChainTranscript, hash_to_scalar  # noqa: F401
from .utils import errors  # noqa: F401

__version__ = "0.2.0"


def __getattr__(name):
    """Lazy top-level re-exports of the proof systems (mirrors the reference
    crate root's re-exports, reference src/lib.rs:27-49) without importing
    JAX at package-import time."""
    if name == "InnerProductProof":
        from .models.inner_product import InnerProductProof

        return InnerProductProof
    if name in ("Prover", "Verifier", "R1CSProof", "Variable", "LinearCombination"):
        from .models import r1cs

        return getattr(r1cs, name)
    if name == "RangeProof":
        from .models.range_proof import RangeProof

        return RangeProof
    if name in ("MpcProver", "SharedInnerProductProof", "PartiallySharedR1CSProof"):
        from .models import r1cs_mpc

        return getattr(r1cs_mpc, name)
    if name == "MpcFabric":
        from .parallel.fabric import MpcFabric

        return MpcFabric
    raise AttributeError(f"module 'mpc_bulletproof_tpu' has no attribute {name!r}")
