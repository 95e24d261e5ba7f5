"""Variables and linear combinations for the collaborative prover.

The reference defines parallel ``MpcVariable`` / ``MpcLinearCombination``
types whose coefficients are fabric graph nodes
(src/r1cs_mpc/mpc_linear_combination.rs).  In this eager fabric the
coefficients are ordinary public scalars, so the single-prover DSL types
are reused directly — gadget code is *identical* between the single and
collaborative provers, which is the point of the shared-DSL design.
"""

from ..r1cs.linear_combination import LinearCombination, Variable

MpcVariable = Variable
MpcLinearCombination = LinearCombination
