"""IPP witness/generator folding on TPU.

Mirrors the per-round fold of the reference's inner-product argument
(``fold_witness``, src/inner_product_proof.rs:202-248): given a round
challenge ``u``,

    a' = u * a_L + u_inv * a_R            (scalar-field vectors)
    b' = u_inv * b_L + u * b_R
    G' = u_inv (.) G_L + u (.) G_R        (per-element double scalar-mult)
    H' = u (.) H_L + u_inv (.) H_R

Scalar folds are two fused vector mul-adds.  Point folds are a batched joint
double-and-add (Shamir's trick): one ``lax.scan`` over the 252 scalar bits
whose body is one batched complete doubling plus one batched complete
addition of a 4-way-selected addend {identity, G_L, G_R, G_L+G_R}.  The
scalar bits are data (not trace constants) so the whole fold jits once per
shape and is reused across rounds and proofs.

Supports per-element scalars (``bits`` of shape ``(252, h)``) so the first
round's ``G_factors``/``H_factors`` scaling (src/inner_product_proof.rs:90-146)
can be folded into the same pass without materializing scaled generators.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import curve_jax as cj
from . import kernels
from .limb import BASE_BITS, FR, NL, ModParams, _mod_add, _mod_mul

FIELD_BITS = 252


def scalar_bits(x: jnp.ndarray) -> jnp.ndarray:
    """``(NL, h)`` limb scalars -> ``(FIELD_BITS, h)`` bits, LSB first."""
    rows = [(x[i] >> j) & 1 for i in range(NL) for j in range(BASE_BITS)]
    return jnp.stack(rows[:FIELD_BITS], axis=0)


@functools.partial(jax.jit, static_argnums=(4,))
def fold_scalars(u, u_inv, left, right, mp: ModParams = FR):
    """``u * left + u_inv * right`` for ``(NL, h)`` vectors; ``u`` is ``(NL, 1)``."""
    lu = _mod_mul(left, u, mp)
    ru = _mod_mul(right, u_inv, mp)
    return _mod_add(lu, ru, mp)


@jax.jit
def fold_points(bits_l: jnp.ndarray, bits_r: jnp.ndarray, G_L: jnp.ndarray, G_R: jnp.ndarray):
    """``s_l (.) G_L + s_r (.) G_R`` per element.

    ``bits_l``/``bits_r``: ``(FIELD_BITS, h)`` (LSB first; may be broadcast
    from a single shared scalar).  ``G_L``/``G_R``: ``(3, NL, h)``.
    """
    h = G_L.shape[-1]
    both = kernels.point_add(G_L, G_R)
    ident = cj.identity((h,))

    def body(acc, bits):
        bl, br = bits
        acc = kernels.point_add(acc, acc)
        sel = bl + 2 * br  # (h,) in {0,1,2,3}
        addend = cj._point_select(sel == 3, both, ident)
        addend = cj._point_select(sel == 1, G_L, addend)
        addend = cj._point_select(sel == 2, G_R, addend)
        acc = kernels.point_add(acc, addend)
        return acc, None

    # MSB-first over the bit rows.
    acc, _ = jax.lax.scan(body, ident, (bits_l, bits_r), reverse=True)
    return acc


def fold_points_shared(u_l: jnp.ndarray, u_r: jnp.ndarray, G_L, G_R):
    """Point fold with shared ``(NL, 1)`` scalars for all lanes."""
    h = G_L.shape[-1]
    bl = jnp.broadcast_to(scalar_bits(u_l), (FIELD_BITS, h))
    br = jnp.broadcast_to(scalar_bits(u_r), (FIELD_BITS, h))
    return fold_points(bl, br, G_L, G_R)
