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

Blocks are ``(3, NL, 8, 128)`` / ``(NL, 8, 128)`` tiles: the batch is split
over BOTH the sublane and lane dimensions (a "granule" of 8*128 = 1024
elements), with the limb index as a plain outer axis.  The earlier
``(rows, lanes)`` layout put limbs on sublanes, so every per-limb-row
operation — the Montgomery REDC inner loop is ~500 of them per point add —
ran as a 1-sublane vector op at 1/8 VPU utilization (measured 11.6 M
point-adds/s, 23% VPU).  With the batch granule owning the full (8, 128)
vector register, per-row ops are full-width; the reshape from the HBM-side
``(rows, n)`` layout is free (row-major view).  On CPU backends the kernels
run through the Pallas interpreter, so the exact same code path is
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

# Batch granule: one full (sublane, lane) vector register of batch elements.
_SUB = 8
_LANE = 128
_GRAN = _SUB * _LANE  # 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_lanes(x: jnp.ndarray, mult: int) -> tuple[jnp.ndarray, int]:
    """Pad the lane (last) dim up to a multiple of ``mult``.

    Everything below one granule pads to a full granule: Mosaic compiles one
    kernel per distinct block shape and the Montgomery point-add kernel is
    expensive to compile, so ONE shape serves every small width (<= 1023
    wasted lanes, negligible work)."""
    n = x.shape[-1]
    padded = (n + mult - 1) // mult * mult
    if padded != n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, padded - n)]
        x = jnp.pad(x, pad)
    return x, n


def _gran_split(x: jnp.ndarray) -> jnp.ndarray:
    """``(..., g*GRAN)`` -> ``(..., g, SUB, LANE)`` (free row-major view)."""
    return x.reshape(*x.shape[:-1], x.shape[-1] // _GRAN, _SUB, _LANE)


def _bcast_const(a, rows: int, s: int = _SUB) -> jnp.ndarray:
    """Constant ``(rows, 1)`` limb column -> ``(rows, s, LANE)`` operand.

    Pre-broadcast on the host: Mosaic cannot lower the multi-axis
    broadcasts that (rows, 1, 1) columns would otherwise induce.  ``s``
    matches the batch sublane count of the kernel's data blocks (constants
    must broadcast against the batch shape)."""
    col = jnp.asarray(a).reshape(rows, 1, 1)
    return jnp.broadcast_to(col, (rows, s, _LANE))


def _mp_operands(mp: ModParams, s: int = _SUB):
    return (
        _bcast_const(mp.m, NL, s),
        _bcast_const(mp.m21, NL + 1, s),
        _bcast_const(mp.mu, NL + 1, s),
    )


def _mp_specs(s: int = _SUB):
    cs = lambda rows: pl.BlockSpec(
        (rows, s, _LANE), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    return [cs(NL), cs(NL + 1), cs(NL + 1)]


def _kernel_mp(m_ref, m21_ref, mu_ref, modulus: int) -> ModParams:
    ns = types.SimpleNamespace(
        m=m_ref[...], m21=m21_ref[...], mu=mu_ref[...], modulus=modulus
    )
    return ns  # duck-typed ModParams for the _impl functions


# ---------------------------------------------------------------------------
# point kernels (lazy arithmetic — see curve_jax / limb "Lazy arithmetic")
# ---------------------------------------------------------------------------

_B3_LIMBS = limb.int_to_limbs_np(curve_jax._B3_MONT, NLZ)


def _curve_operands(s: int = _SUB):
    return (
        _bcast_const(FP.m, NL, s),
        _bcast_const(_B3_LIMBS, NLZ, s),
        _bcast_const(FP.k8, NLZ, s),
        _bcast_const(FP.k16, NLZ, s),
        _bcast_const(FP.k32, NLZ, s),
    )


def _curve_specs(s: int = _SUB):
    cs = lambda rows: pl.BlockSpec(
        (rows, s, _LANE), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    return [cs(NL), cs(NLZ), cs(NLZ), cs(NLZ), cs(NLZ)]


def _kernel_curve_ctx(m_ref, b3_ref, k8_ref, k16_ref, k32_ref):
    # m_prime is a static python int — baked into the kernel body.
    # unrolled_rows: Mosaic-friendly REDC emission (see limb._redc).
    return types.SimpleNamespace(
        m=m_ref[...],
        m_prime=FP.m_prime,
        sparse_limbs=FP.sparse_limbs,  # static: multiply-free REDC
        b3=b3_ref[...],
        k8=k8_ref[...],
        k16=k16_ref[...],
        k32=k32_ref[...],
        unrolled_rows=not _interpret(),
    )


def _padd_kernel(m_ref, b3_ref, k8_ref, k16_ref, k32_ref, a_ref, b_ref, o_ref):
    ctx = _kernel_curve_ctx(m_ref, b3_ref, k8_ref, k16_ref, k32_ref)
    # squeeze the singleton granule-grid dim so batch ranks match the
    # (rows, SUB, LANE) constants
    a = a_ref[...].reshape(3, NLZ, _SUB, _LANE)
    b = b_ref[...].reshape(3, NLZ, _SUB, _LANE)
    o_ref[...] = curve_jax._point_add(a, b, ctx).reshape(o_ref.shape)


@jax.jit
def point_add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Complete point addition over ``(3, NLZ, n)`` lazy batches (RCB16)."""
    a, n = _pad_lanes(a, _GRAN)
    b, _ = _pad_lanes(b, _GRAN)
    a3 = _gran_split(a)
    b3 = _gran_split(b)
    pts_spec = pl.BlockSpec(
        (3, NLZ, 1, _SUB, _LANE), lambda i: (0, 0, i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _padd_kernel,
        out_shape=jax.ShapeDtypeStruct(a3.shape, jnp.int32),
        grid=(a3.shape[2],),
        in_specs=_curve_specs() + [pts_spec, pts_spec],
        out_specs=pts_spec,
        interpret=_interpret(),
    )(*_curve_operands(), a3, b3)
    return out.reshape(3, NLZ, -1)[..., :n]


def point_double(a: jnp.ndarray) -> jnp.ndarray:
    return point_add(a, a)


# ---------------------------------------------------------------------------
# grid-sequential prefix scan — the MSM bucket-phase workhorse
# ---------------------------------------------------------------------------

def _pscan_kernel(m_ref, b3_ref, k8_ref, k16_ref, k32_ref, x_ref, o_ref, carry_ref):
    ctx = _kernel_curve_ctx(m_ref, b3_ref, k8_ref, k16_ref, k32_ref)
    i = pl.program_id(0)
    x = x_ref[...].reshape(carry_ref.shape)

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
    if L0 % _GRAN:
        L = (L0 + _GRAN - 1) // _GRAN * _GRAN
        x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, L - L0)])
    else:
        L = L0
    S = L // _LANE
    x5 = x.reshape(3, T, NLZ, S, _LANE)
    spec = pl.BlockSpec(
        (3, 1, NLZ, S, _LANE), lambda i: (0, i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _pscan_kernel,
        out_shape=jax.ShapeDtypeStruct(x5.shape, jnp.int32),
        grid=(T,),
        in_specs=_curve_specs(S) + [spec],
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((3, NLZ, S, _LANE), jnp.int32)],
        # wide lane tiles need headroom: at L = 16384 the in/out/carry
        # blocks + constants are ~30 MB double-buffered (v5e VMEM is 128)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*_curve_operands(S), x5)
    return out.reshape(3, T, NLZ, L)[..., :L0]


@jax.jit
def point_scan_steps_inner(x: jnp.ndarray) -> jnp.ndarray:
    """:func:`point_scan_steps` over a ``(3, NLZ, T, L)`` layout (step axis
    INSIDE), so record-gather-produced tensors scan directly — without this
    the caller pays a materialized (3, T, NLZ, L) transpose (~2.7 ms per
    fused-prover round at the m=64 shape, round-5 profile)."""
    _, _, T, L0 = x.shape
    if L0 % _GRAN:
        L = (L0 + _GRAN - 1) // _GRAN * _GRAN
        x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, L - L0)])
    else:
        L = L0
    S = L // _LANE
    x5 = x.reshape(3, NLZ, T, S, _LANE)
    spec = pl.BlockSpec(
        (3, NLZ, 1, S, _LANE), lambda i: (0, 0, i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _pscan_kernel,
        out_shape=jax.ShapeDtypeStruct(x5.shape, jnp.int32),
        grid=(T,),
        in_specs=_curve_specs(S) + [spec],
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((3, NLZ, S, _LANE), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*_curve_operands(S), x5)
    return out.reshape(3, NLZ, T, L)[..., :L0]


# ---------------------------------------------------------------------------
# grid-sequential Horner window combine — the MSM's serial tail
# ---------------------------------------------------------------------------
#
# The window combine acc = sum_w 2^(cw) S_w was a lax.scan whose body issued
# c+1 separate point_add pallas calls: nw*(c+1) ~ 270 sequential kernel
# launches per MSM, each on a single padded granule — launch overhead, not
# compute, and the dominant per-MSM cost of the fused prover (every IPP
# round runs one).  Here the WHOLE chain is one pallas program: the grid
# walks nw*(c+1) steps with the accumulator in VMEM scratch; each step is
# one point add whose second operand is either the accumulator (a doubling)
# or the step's window block (selected by a scalar predicate), so the body
# contains a single point-add instance and Mosaic compile time stays flat.


def _phorner_kernel(m_ref, b3_ref, k8_ref, k16_ref, k32_ref, one_ref,
                    w_ref, o_ref, acc_ref, *, c: int):
    ctx = _kernel_curve_ctx(m_ref, b3_ref, k8_ref, k16_ref, k32_ref)
    t = pl.program_id(0)
    T = pl.num_programs(0)
    w = w_ref[...].reshape(3, NLZ, _SUB, _LANE)

    @pl.when(t == 0)
    def _init():
        zero = jnp.zeros_like(one_ref[...])
        acc_ref[...] = jnp.stack([zero, one_ref[...], zero], axis=0)

    is_window = (t % (c + 1)) == c
    acc = acc_ref[...]
    operand = jnp.where(is_window, w, acc)
    acc = curve_jax._point_add(acc, operand, ctx)
    acc_ref[...] = acc

    @pl.when(t == T - 1)
    def _out():
        o_ref[...] = acc


_MONT_ONE_NLZ = limb.int_to_limbs_np(curve_jax.FP.mont_r, NLZ)


@functools.partial(jax.jit, static_argnums=(1,))
def point_horner_multi(window_sums: jnp.ndarray, c: int) -> jnp.ndarray:
    """Horner combine of ``(nw, 3, NLZ, k)`` window sums (window 0 = least
    significant) -> ``(3, NLZ, k)``, ONE pallas dispatch.

    k independent MSM outputs ride the lane axis of the same serial chain
    (an L/R pair, a verification batch).  Requires k <= GRAN; zero-padding
    of dead lanes is harmless (their values are discarded).
    """
    nw, _, _, k = window_sums.shape
    ws = window_sums[::-1]  # most significant window first
    if k < _GRAN:
        ws = jnp.pad(ws, [(0, 0)] * 3 + [(0, _GRAN - k)])
    ws5 = ws.reshape(nw, 3, NLZ, _SUB, _LANE)
    spec = pl.BlockSpec(
        (1, 3, NLZ, _SUB, _LANE),
        lambda t: (t // (c + 1), 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (3, NLZ, _SUB, _LANE), lambda t: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_phorner_kernel, c=c),
        out_shape=jax.ShapeDtypeStruct((3, NLZ, _SUB, _LANE), jnp.int32),
        grid=(nw * (c + 1),),
        in_specs=_curve_specs() + [
            pl.BlockSpec((NLZ, _SUB, _LANE), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            spec,
        ],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((3, NLZ, _SUB, _LANE), jnp.int32)],
        interpret=_interpret(),
    )(*_curve_operands(), _bcast_const(_MONT_ONE_NLZ, NLZ), ws5)
    return out.reshape(3, NLZ, _GRAN)[..., :k]


# ---------------------------------------------------------------------------
# single-dispatch point reduction (sum over the batch axis)
# ---------------------------------------------------------------------------
#
# The XLA halving tree (ops/msm._reduce_sum_tree) issues log2(n) separate
# pallas calls; measured on v5e each call carries ~4-5 ms of fixed cost, so
# an 8192-point sum took 60 ms for ~0.5 ms of VPU work.  Here the whole
# reduction is ONE program: the grid accumulates granule chunks into a VMEM
# carry, and the final step folds the (8, 128) granule in-registers (lane
# then sublane halvings, curve constants sliced to match).


def _ctx_slice(ctx, s: int, w: int):
    return types.SimpleNamespace(
        m=ctx.m[:, :s, :w],
        m_prime=ctx.m_prime,
        sparse_limbs=ctx.sparse_limbs,
        b3=ctx.b3[:, :s, :w],
        k8=ctx.k8[:, :s, :w],
        k16=ctx.k16[:, :s, :w],
        k32=ctx.k32[:, :s, :w],
        unrolled_rows=ctx.unrolled_rows,
    )


def _preduce_kernel(m_ref, b3_ref, k8_ref, k16_ref, k32_ref, x_ref, o_ref, carry_ref):
    ctx = _kernel_curve_ctx(m_ref, b3_ref, k8_ref, k16_ref, k32_ref)
    i = pl.program_id(0)
    T = pl.num_programs(0)
    x = x_ref[...].reshape(3, NLZ, _SUB, _LANE)

    @pl.when(i == 0)
    def _first():
        carry_ref[...] = x

    @pl.when(i > 0)
    def _rest():
        carry_ref[...] = curve_jax._point_add(carry_ref[...], x, ctx)

    @pl.when(i == T - 1)
    def _tree():
        acc = carry_ref[...]
        w = _LANE
        while w > 1:
            h = w // 2
            acc = curve_jax._point_add(
                acc[..., :h], acc[..., h:w], _ctx_slice(ctx, _SUB, h)
            )
            w = h
        s = _SUB
        while s > 1:
            h = s // 2
            acc = curve_jax._point_add(
                acc[:, :, :h], acc[:, :, h:s], _ctx_slice(ctx, h, 1)
            )
            s = h
        o_ref[...] = acc.reshape(o_ref.shape)


@jax.jit
def point_reduce(pts: jnp.ndarray) -> jnp.ndarray:
    """Sum of ``(3, NLZ, n)`` lazy points over the batch axis -> (3, NLZ, 1).

    Requires identity-padded inputs to be harmless (the caller pads with
    the projective identity, which this does internally)."""
    n = pts.shape[-1]
    padded = (n + _GRAN - 1) // _GRAN * _GRAN
    if padded != n:
        pts = jnp.concatenate([pts, curve_jax.identity((padded - n,))], axis=-1)
    T = padded // _GRAN
    x = pts.reshape(3, NLZ, T, _SUB, _LANE)
    in_spec = pl.BlockSpec(
        (3, NLZ, 1, _SUB, _LANE), lambda i: (0, 0, i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _preduce_kernel,
        out_shape=jax.ShapeDtypeStruct((3, NLZ, 1, 1), jnp.int32),
        grid=(T,),
        in_specs=_curve_specs() + [in_spec],
        out_specs=pl.BlockSpec(
            (3, NLZ, 1, 1), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((3, NLZ, _SUB, _LANE), jnp.int32)],
        interpret=_interpret(),
    )(*_curve_operands(), x)
    return out.reshape(3, NLZ, 1)


# ---------------------------------------------------------------------------
# in-kernel square-and-multiply ladder (batched modular exponentiation)
# ---------------------------------------------------------------------------
#
# The XLA formulation (limb._mod_pow: lax.scan over exponent bits) pays a
# per-step kernel-launch tax — ~500 sequential tiny-tensor steps measure
# 75 ms on v5e for ONE scalar inverse, which dominated the fused prover
# (every IPP round needs u^-1, every transcript point absorb a z^-1).  The
# whole ladder runs here inside one pallas program: a fori_loop over the
# exponent bits (int32 SMEM operand) with the Montgomery state held in
# registers.  One dispatch, ~0.5 ms.


def _pow_kernel(m_ref, m21_ref, mu_ref, digs_ref, x_ref, o_ref):
    """4-bit-window square-and-multiply: ``digs`` are MSB-first base-16
    digits of the exponent (SMEM).  14 table mults + 5 mults per digit
    (vs 2 per bit for the plain ladder — 1.5x fewer sequential muls,
    which is the entire cost of this inherently serial kernel)."""
    mp = _kernel_mp(m_ref, m21_ref, mu_ref, 0)
    x = x_ref[...].reshape(NL, _SUB, _LANE)
    one = (
        jax.lax.broadcasted_iota(jnp.int32, (NL, _SUB, _LANE), 0) == 0
    ).astype(jnp.int32)

    pows = [one, x]
    for _ in range(14):
        pows.append(limb._mod_mul(pows[-1], x, mp))
    table = jnp.stack(pows)  # (16, NL, SUB, LANE)

    def body(i, acc):
        for _ in range(4):
            acc = limb._mod_mul(acc, acc, mp)
        d = digs_ref[i]
        sel = table[0]
        for t in range(1, 16):
            sel = jnp.where(d == t, table[t], sel)
        return limb._mod_mul(acc, sel, mp)

    result = jax.lax.fori_loop(0, digs_ref.shape[0], body, one)
    o_ref[...] = result.reshape(o_ref.shape)


@functools.partial(jax.jit, static_argnums=(1, 2))
def mod_pow_static(x: jnp.ndarray, exponent: int, mp: ModParams = FR) -> jnp.ndarray:
    """Batched ``x^exponent mod m`` over ``(NL, n)`` for a static exponent.

    Drop-in for :func:`..limb.mod_pow` on the device path; exponent digits
    (base 16, MSB first) ride an SMEM operand so one compiled kernel serves
    every same-length exponent."""
    e = int(exponent)
    if e == 0:
        return jnp.broadcast_to(
            jnp.asarray(limb.int_to_limbs_np(1, NL)), (NL,) + x.shape[1:]
        )
    ndig = (e.bit_length() + 3) // 4
    digs = jnp.asarray(
        [(e >> (4 * (ndig - 1 - i))) & 0xF for i in range(ndig)],
        dtype=jnp.int32,
    )
    a, n = _pad_lanes(x, _GRAN)
    a3 = _gran_split(a)
    spec = pl.BlockSpec(
        (NL, 1, _SUB, _LANE), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _pow_kernel,
        out_shape=jax.ShapeDtypeStruct(a3.shape, jnp.int32),
        grid=(a3.shape[1],),
        in_specs=_mp_specs()
        + [pl.BlockSpec(memory_space=pltpu.SMEM), spec],
        out_specs=spec,
        interpret=_interpret(),
    )(*_mp_operands(mp), digs, a3)
    return out.reshape(NL, -1)[..., :n]


# ---------------------------------------------------------------------------
# scalar-field vector kernels
# ---------------------------------------------------------------------------

def _make_vec2_kernel(op):
    def kernel(m_ref, m21_ref, mu_ref, a_ref, b_ref, o_ref):
        mp = _kernel_mp(m_ref, m21_ref, mu_ref, 0)
        a = a_ref[...].reshape(NL, _SUB, _LANE)
        b = b_ref[...].reshape(NL, _SUB, _LANE)
        o_ref[...] = op(a, b, mp).reshape(o_ref.shape)

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
    a, n = _pad_lanes(a, _GRAN)
    b, _ = _pad_lanes(b, _GRAN)
    a3 = _gran_split(a)
    b3 = _gran_split(b)
    spec = pl.BlockSpec(
        (NL, 1, _SUB, _LANE), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _VEC2_KERNELS[opname],
        out_shape=jax.ShapeDtypeStruct(a3.shape, jnp.int32),
        grid=(a3.shape[1],),
        in_specs=_mp_specs() + [spec, spec],
        out_specs=spec,
        interpret=_interpret(),
    )(*_mp_operands(mp), a3, b3)
    return out.reshape(NL, -1)[..., :n]


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
