"""Collaborative (2-party MPC) R1CS proofs (reference src/r1cs_mpc/).

The witness is additively secret-shared between two parties; proof
generation runs inside the eager MPC fabric
(:mod:`mpc_bulletproof_tpu.parallel.fabric`), producing a
:class:`PartiallySharedR1CSProof` that opens to a standard
:class:`~mpc_bulletproof_tpu.models.r1cs.R1CSProof` verifiable by the plain
single-prover verifier — the key compatibility invariant of the design
(reference integration/mpc_prover.rs:167-190).
"""

from .authenticated_poly import (  # noqa: F401
    AuthenticatedPoly6,
    AuthenticatedVecPoly3,
)
from .mpc_constraint_system import (  # noqa: F401
    MpcConstraintSystem,
    MpcRandomizableConstraintSystem,
    MpcRandomizedConstraintSystem,
)
from .mpc_linear_combination import MpcLinearCombination, MpcVariable  # noqa: F401
from .mpc_inner_product import SharedInnerProductProof  # noqa: F401
from .mpc_prover import MpcProver  # noqa: F401
from .proof import PartiallySharedR1CSProof  # noqa: F401
