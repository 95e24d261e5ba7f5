"""Single-prover R1CS constraint-system proofs (reference src/r1cs/)."""

from .constraint_system import (  # noqa: F401
    CircuitWeights,
    ConstraintSystem,
    RandomizableConstraintSystem,
    RandomizedConstraintSystem,
    SparseReducedMatrix,
    SparseWeightRow,
)
from .linear_combination import LinearCombination, Variable  # noqa: F401
from .proof import R1CSProof  # noqa: F401
from .prover import Prover, RandomizingProver  # noqa: F401
from .verifier import RandomizingVerifier, Verifier  # noqa: F401
