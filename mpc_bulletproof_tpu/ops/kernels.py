"""Pallas TPU kernels for the hot point/field vector operations.

Every kernel wraps the straight-line limb math from :mod:`.limb` /
:mod:`.curve_jax` into a single fused Mosaic kernel.  This matters twice:

* **graph size** — a complete point addition is ~12 modular multiplies of
  ~500 vector ops each; inlined into XLA that is ~50k HLO instructions *per
  call site*, which makes MSM-sized graphs uncompilable.  As a
  ``pallas_call`` each site is one custom-call and Mosaic compiles the body
  once per block shape (~1 s on a v5e).
* **locality** — the whole add runs out of VMEM registers; XLA would
  materialize dozens of (3, 20, n) intermediates in HBM.

Blocks are ``(3, NL, T)`` / ``(NL, T)`` tiles with the batch on the lane
dimension (see :mod:`.limb` for the layout rationale).  On CPU backends the
kernels run through the Pallas interpreter, so the exact same code path is
exercised by the test suite's virtual 8-device CPU mesh.

Modulus constants are passed as kernel operands (Mosaic forbids captured
array constants).
"""

from __future__ import annotations

import functools
import types

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import curve_jax, limb
from .limb import FP, FR, NL, NLZ, ModParams

# Lane tile: full vector-register width.
_TILE = 256


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_lanes(x: jnp.ndarray, mult: int) -> tuple[jnp.ndarray, int]:
    """Pad the lane (last) dim up to a multiple of ``mult``.

    Everything below one tile pads to a full tile: Mosaic compiles one
    kernel per distinct block shape and the Montgomery point-add kernel is
    expensive to compile, so ONE shape serves every small width (<= 255
    wasted lanes, negligible work)."""
    n = x.shape[-1]
    padded = (n + mult - 1) // mult * mult
    if padded != n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, padded - n)]
        x = jnp.pad(x, pad)
    return x, n


def _mp_operands(mp: ModParams, t: int):
    # Constants are pre-broadcast to the tile width: Mosaic cannot lower the
    # scalar->2D broadcasts that (NL, 1) columns would otherwise induce.
    return (
        jnp.broadcast_to(jnp.asarray(mp.m), (NL, t)),
        jnp.broadcast_to(jnp.asarray(mp.m21), (NL + 1, t)),
        jnp.broadcast_to(jnp.asarray(mp.mu), (NL + 1, t)),
    )


def _mp_specs(t: int):
    cs = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    return [cs((NL, t)), cs((NL + 1, t)), cs((NL + 1, t))]


def _kernel_mp(m_ref, m21_ref, mu_ref, modulus: int) -> ModParams:
    ns = types.SimpleNamespace(
        m=m_ref[...], m21=m21_ref[...], mu=mu_ref[...], modulus=modulus
    )
    return ns  # duck-typed ModParams for the _impl functions


# ---------------------------------------------------------------------------
# point kernels (lazy arithmetic — see curve_jax / limb "Lazy arithmetic")
# ---------------------------------------------------------------------------

_B3_LIMBS = limb.int_to_limbs_np(curve_jax._B3_MONT, NLZ)


def _curve_operands(t: int):
    bc = lambda a, rows: jnp.broadcast_to(jnp.asarray(a), (rows, t))
    return (
        bc(FP.m, NL),
        bc(_B3_LIMBS, NLZ),
        bc(FP.k8, NLZ),
        bc(FP.k16, NLZ),
        bc(FP.k32, NLZ),
    )


def _curve_specs(t: int):
    cs = lambda rows: pl.BlockSpec((rows, t), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return [cs(NL), cs(NLZ), cs(NLZ), cs(NLZ), cs(NLZ)]


def _kernel_curve_ctx(m_ref, b3_ref, k8_ref, k16_ref, k32_ref):
    # m_prime is a static python int — baked into the kernel body.
    # unrolled_rows: Mosaic-friendly REDC emission (see limb._redc).
    return types.SimpleNamespace(
        m=m_ref[...],
        m_prime=FP.m_prime,
        b3=b3_ref[...],
        k8=k8_ref[...],
        k16=k16_ref[...],
        k32=k32_ref[...],
        unrolled_rows=not _interpret(),
    )


def _padd_kernel(m_ref, b3_ref, k8_ref, k16_ref, k32_ref, a_ref, b_ref, o_ref):
    ctx = _kernel_curve_ctx(m_ref, b3_ref, k8_ref, k16_ref, k32_ref)
    o_ref[...] = curve_jax._point_add(a_ref[...], b_ref[...], ctx)


@jax.jit
def point_add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Complete point addition over ``(3, NLZ, n)`` lazy batches (RCB16)."""
    a, n = _pad_lanes(a, _TILE)
    b, _ = _pad_lanes(b, _TILE)
    t = min(_TILE, a.shape[-1])
    pts_spec = pl.BlockSpec((3, NLZ, t), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _padd_kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.int32),
        grid=(a.shape[-1] // t,),
        in_specs=_curve_specs(t) + [pts_spec, pts_spec],
        out_specs=pts_spec,
        interpret=_interpret(),
    )(*_curve_operands(t), a, b)
    return out[..., :n]


def point_double(a: jnp.ndarray) -> jnp.ndarray:
    return point_add(a, a)


# ---------------------------------------------------------------------------
# grid-sequential prefix scan — the MSM bucket-phase workhorse
# ---------------------------------------------------------------------------

def _pscan_kernel(m_ref, b3_ref, k8_ref, k16_ref, k32_ref, x_ref, o_ref, carry_ref):
    ctx = _kernel_curve_ctx(m_ref, b3_ref, k8_ref, k16_ref, k32_ref)
    i = pl.program_id(0)
    x = x_ref[...].reshape(3, NLZ, x_ref.shape[-1])

    @pl.when(i == 0)
    def _first():
        carry_ref[...] = x

    @pl.when(i > 0)
    def _rest():
        carry_ref[...] = curve_jax._point_add(carry_ref[...], x, ctx)

    o_ref[...] = carry_ref[...].reshape(o_ref.shape)


@jax.jit
def point_scan_steps(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix point-sum along axis 1 of a ``(3, T, NLZ, L)`` batch.

    ONE pallas program whose grid walks the T step axis sequentially with
    the running prefix held in VMEM scratch: n point-adds total (work
    optimal — half the halving tree's 2n) and zero inter-level XLA glue,
    which on this backend is HBM-bound and costs more than the adds.  The
    L lanes are independent scans; callers lay out (windows x chunks)
    there and fix up chunk offsets separately (see ops/msm.py).
    """
    _, T, _, L0 = x.shape
    if L0 % 128:
        L = (L0 + 127) // 128 * 128
        x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, L - L0)])
    else:
        L = L0
    spec = pl.BlockSpec(
        (3, 1, NLZ, L), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _pscan_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
        grid=(T,),
        in_specs=_curve_specs(L) + [spec],
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((3, NLZ, L), jnp.int32)],
        interpret=_interpret(),
    )(*_curve_operands(L), x)
    return out[..., :L0]


# ---------------------------------------------------------------------------
# scalar-field vector kernels
# ---------------------------------------------------------------------------

def _make_vec2_kernel(op):
    def kernel(m_ref, m21_ref, mu_ref, a_ref, b_ref, o_ref):
        mp = _kernel_mp(m_ref, m21_ref, mu_ref, 0)
        o_ref[...] = op(a_ref[...], b_ref[...], mp)

    return kernel


_VEC2_KERNELS = {
    "mul": _make_vec2_kernel(limb._mod_mul),
    "add": _make_vec2_kernel(limb._mod_add),
    "sub": _make_vec2_kernel(limb._mod_sub),
}


def _vec2(opname: str, a: jnp.ndarray, b: jnp.ndarray, mp: ModParams) -> jnp.ndarray:
    """Elementwise binary modular op over ``(NL, n)`` with broadcasting of b."""
    if b.ndim == a.ndim and b.shape[-1] == 1 and a.shape[-1] != 1:
        b = jnp.broadcast_to(b, a.shape)
    a, n = _pad_lanes(a, _TILE)
    b, _ = _pad_lanes(b, _TILE)
    t = min(_TILE, a.shape[-1])
    spec = pl.BlockSpec((NL, t), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _VEC2_KERNELS[opname],
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.int32),
        grid=(a.shape[-1] // t,),
        in_specs=_mp_specs(t) + [spec, spec],
        out_specs=spec,
        interpret=_interpret(),
    )(*_mp_operands(mp, t), a, b)
    return out[..., :n]


@functools.partial(jax.jit, static_argnums=(2,))
def vec_mul(a, b, mp: ModParams = FR):
    return _vec2("mul", a, b, mp)


@functools.partial(jax.jit, static_argnums=(2,))
def vec_add(a, b, mp: ModParams = FR):
    return _vec2("add", a, b, mp)


@functools.partial(jax.jit, static_argnums=(2,))
def vec_sub(a, b, mp: ModParams = FR):
    return _vec2("sub", a, b, mp)


def point_neg(p: jnp.ndarray) -> jnp.ndarray:
    """Point negation (cheap: one field negation; stays in plain XLA)."""
    return curve_jax._point_neg(p)
