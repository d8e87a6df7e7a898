"""Fused Pallas kernel: signed fixed-window (w=4) batched scalar multiplication.

A beyond-reference fast path (~10.7 field-mults/bit vs the co-Z ladder's
~14.4; the reference implements only the ladder) that keeps the constant-time
discipline: the window digits come from a closed-form signed-odd recoding
(oracle/window.py), table lookups are masked 8-way selects, and control flow
is fully uniform. Same digit-per-vreg layout and VGFp group-law style as the
ladder kernel.

Per 4 bits: 4 Jacobian doublings + 1 general Jacobian add (11M+5S) against
a per-lane table of odd multiples P..15P. Formulas dispatch on the field's
reduction strategy and the curve's a (kernels/coz.dbl_any): fused
dbl-2001-b (3M+5S) for Solinas a = -3, per-op general-a doubling otherwise
— so the fast path also covers curves outside the reference's a = -3
concept (e.g. secp256k1).

Domain: same exclusions as the ladder, plus (measure-zero for random k)
scalars whose intermediate 16*acc collides with a table entry's x line
(degenerate add). Use the ladder for adversarially-chosen scalars.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ecsimd_tpu.kernels import digits as dg
from ecsimd_tpu.kernels.coz import add_any, add_complete_any, add_z2_1_any, dbl_any
from ecsimd_tpu.kernels.digits import VGFp
from ecsimd_tpu.specs import DIGIT_BITS, CurveSpec

DEFAULT_TILE = 2048
LANES = 128
W = 4


def _window_core(
    read_plane, x: VGFp, y: VGFp, curve: CurveSpec, unroll: bool = False,
    strict: bool = False,
):
    """The full windowed scalar-mult computation on VGFp digit lists.

    ``read_plane(dig)`` returns the scalar digit plane ``dig`` (possibly a
    traced index) as an array shaped like the digits of ``x``. Shared by the
    Pallas kernel (VMEM-ref reads) and the CPU-compilable XLA twin
    (``window_xla_planes``) so the compute path — table build, masked
    gathers, fused group law, parity fixup — is testable without TPU
    hardware or interpret mode (which degenerates on this kernel's table
    build; see tests/test_kernels.py).

    ``unroll=True`` replaces the fori_loops with Python loops (static digit
    indices and shift counts). The Pallas kernel keeps rolled loops (compact
    Mosaic trace); the XLA twin unrolls because XLA:CPU's while-loop
    execution degenerates on this body (minutes per toy-curve run vs
    milliseconds unrolled — same ops, loop overhead only).

    ``strict=True`` replaces the accumulation adds (and the parity fixup)
    with the exception-free complete add (coz.add_complete_any), closing the
    measure-zero degenerate scalar class at ~+1 doubling per add (~+15% ops)
    — total on the full ladder domain k in [1, order-1). The per-lane TABLE
    build keeps plain adds: (2j+1)P degenerates only if P's order is < 17,
    i.e. an invalid input on any cryptographic curve."""
    fs = curve.field
    d = fs.ndigits

    one = x.const_like(1)
    opp_y = y.opposite()

    # table of odd multiples: T[t] = (2t+1)P, per lane (Jacobian)
    two = dbl_any(x, y, one, curve)
    T = [(x, y, one)]
    for _ in range(7):
        px, py, pz = T[-1]
        T.append(add_any(px, py, pz, *two, curve))

    def window_step(plane, plane_next, off, state):
        accx, accy, accz = (VGFp(v, fs) for v in state)
        # off == 0 would shift plane_next by 16 (undefined for int32); the
        # window is fully inside `plane` then, so mask the contribution
        if isinstance(off, int):
            spill = 0 if off == 0 else plane_next << (DIGIT_BITS - off)
        else:
            spill = jnp.where(off == 0, 0, plane_next << (DIGIT_BITS - off))
        w5 = (lax.shift_right_logical(plane, off) | spill) & 31
        v = w5 | 1
        sd = v - 16  # odd, in [-15, 15]
        neg = sd < 0
        mag = jnp.where(neg, -sd, sd)
        idx = lax.shift_right_logical(mag - 1, 1)  # 0..7

        tx, ty, tz = T[7]
        txd, tyd, tzd = list(tx.digs), list(ty.digs), list(tz.digs)
        for t_ in range(6, -1, -1):
            m = (idx == t_)
            ex, ey, ez = T[t_]
            txd = [jnp.where(m, a, b) for a, b in zip(ex.digs, txd)]
            tyd = [jnp.where(m, a, b) for a, b in zip(ey.digs, tyd)]
            tzd = [jnp.where(m, a, b) for a, b in zip(ez.digs, tzd)]
        ty_opp = dg.mod_opposite(tyd, fs)
        tyd = [jnp.where(neg, a, b) for a, b in zip(ty_opp, tyd)]

        for _ in range(W):
            accx, accy, accz = dbl_any(accx, accy, accz, curve)
        adder = add_complete_any if strict else add_any
        accx, accy, accz = adder(
            accx, accy, accz, VGFp(txd, fs), VGFp(tyd, fs), VGFp(tzd, fs), curve
        )
        return accx.digs, accy.digs, accz.digs

    # Outer loop over scalar digits (MSB->LSB), inner over the 4 windows per
    # digit — the dynamic VMEM row reads happen once per digit, not per
    # window (each costs ~thousands of cycles; same hoist as the ladder).
    # init: d_{m-1} = 1 always => acc = P
    state = (list(x.digs), list(y.digs), list(one.digs))
    if unroll:
        zero_plane = jnp.zeros_like(x.digs[0])
        for dig in range(d - 1, -1, -1):
            plane = read_plane(dig)
            plane_next = read_plane(dig + 1) if dig + 1 < d else zero_plane
            for u in range(DIGIT_BITS // W):
                off = DIGIT_BITS - W - u * W  # 12, 8, 4, 0
                state = window_step(plane, plane_next, off, state)
    else:
        def outer(t, state):
            dig = (d - 1) - t
            plane = read_plane(dig)
            nxt = jnp.minimum(dig + 1, d - 1)
            plane_next = jnp.where(dig == d - 1, 0, read_plane(nxt))

            def inner(u, st):
                off = DIGIT_BITS - W - u * W  # 12, 8, 4, 0
                return window_step(plane, plane_next, off, st)

            return lax.fori_loop(0, DIGIT_BITS // W, inner, state)

        state = lax.fori_loop(0, d, outer, state)
    accx, accy, accz = (VGFp(v, fs) for v in state)

    # parity fixup for even scalars (as in the ladder), fused reductions.
    # strict: the complete add also covers acc == infinity, i.e. k =
    # order(P) - 1 (even), where the result is exactly -P — strict mode is
    # total on [1, order), one scalar MORE than the ladder's domain.
    if strict:
        sx, sy, sz = add_complete_any(accx, accy, accz, x, opp_y, one, curve)
    else:
        sx, sy, sz = add_z2_1_any(accx, accy, accz, x, opp_y, curve)
    bit0 = read_plane(0) & 1
    meven = 1 - bit0
    accx = sx.select(meven, accx)
    accy = sy.select(meven, accy)
    accz = sz.select(meven, accz)
    return accx, accy, accz


def _window_kernel(
    scalars_ref, x_ref, y_ref, ax_ref, ay_ref, z_ref, *, curve: CurveSpec,
    strict: bool = False,
):
    d = curve.field.ndigits
    fs = curve.field
    x = VGFp([x_ref[0, k] for k in range(d)], fs)
    y = VGFp([y_ref[0, k] for k in range(d)], fs)
    accx, accy, accz = _window_core(
        lambda dig: scalars_ref[0, pl.ds(dig, 1)][0], x, y, curve, strict=strict
    )
    for k in range(d):
        ax_ref[0, k] = accx.digs[k]
        ay_ref[0, k] = accy.digs[k]
        z_ref[0, k] = accz.digs[k]


@functools.partial(jax.jit, static_argnames=("curve", "tile", "interpret", "strict"))
def window_mont_planes(
    scalars, xm, ym, curve: CurveSpec, tile: int = DEFAULT_TILE, interpret: bool = False,
    strict: bool = False,
):
    """Windowed scalar mult on internal-domain planes; same I/O contract as
    ladder.ladder_mont_planes. ``strict=True`` uses complete accumulation
    adds: total scalar domain [1, order), ~+15% ops (see _window_core)."""
    d = curve.field.ndigits
    b = scalars.shape[1]
    assert scalars.shape == (d, b) and xm.shape == (d, b) and ym.shape == (d, b)
    assert b % tile == 0, f"batch {b} not a multiple of tile {tile}"
    lanes = min(LANES, tile)
    s = tile // lanes
    assert s * lanes == tile, f"tile {tile} not a multiple of {lanes}"
    nblk = b // tile

    def to_blocks(a):
        return a.reshape(d, nblk, s, lanes).transpose(1, 0, 2, 3)

    def from_blocks(a):
        return a.transpose(1, 0, 2, 3).reshape(d, b)

    spec = pl.BlockSpec((1, d, s, lanes), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((nblk, d, s, lanes), jnp.int32)
    ax, ay, z = pl.pallas_call(
        functools.partial(_window_kernel, curve=curve, strict=strict),
        grid=(nblk,),
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
    )(to_blocks(scalars), to_blocks(xm), to_blocks(ym))
    return from_blocks(ax), from_blocks(ay), from_blocks(z)


def window_xla_planes(scalars, xm, ym, curve: CurveSpec, strict: bool = False):
    """XLA twin of window_mont_planes: the SAME compute graph
    (_window_core — fused formulas, masked gathers, parity fixup) on (D, B)
    planes without the Pallas plumbing, so pytest exercises the window path
    end-to-end without TPU hardware.

    Runs the unrolled core EAGERLY (op-by-op on the host backend): XLA:CPU
    degenerates on this body under jit in every form tried — rolled loops
    execute at >600s/run, the unrolled graph compiles at >600s — while the
    identical ops dispatch eagerly in seconds. Correctness coverage only;
    the performance path is the Pallas kernel."""
    fs = curve.field
    d = fs.ndigits
    x = VGFp([xm[k] for k in range(d)], fs)
    y = VGFp([ym[k] for k in range(d)], fs)
    accx, accy, accz = _window_core(
        lambda dig: scalars[dig], x, y, curve, unroll=True, strict=strict
    )
    return jnp.stack(accx.digs), jnp.stack(accy.digs), jnp.stack(accz.digs)


def scalar_mult(scalars, pt, tile: int = DEFAULT_TILE, interpret: bool = False,
                strict: bool = False):
    """Windowed drop-in for kernels.ladder.scalar_mult (fast path).
    Batch is auto-padded to a tile multiple.

    interpret=True (CPU testing) routes to the eager XLA twin
    window_xla_planes — the SAME compute graph — because the interpret-mode
    window kernel is impractically slow on CPU both eagerly (~10 min for 16
    toy lanes: ~80 fused formula instantiations dispatched op-by-op through
    the interpreter) and jitted (XLA:CPU needs ~10 min to compile the traced
    interpret graph). The Pallas kernel itself is covered on hardware
    (bench verification + scripts/check_tpu_kats.py)."""
    import functools

    from ecsimd_tpu.curves.point import JacobianPoint
    from ecsimd_tpu.field import GFp
    from ecsimd_tpu.kernels.ladder import _run_padded

    if interpret:
        curve = pt.curve
        fs = curve.field
        ax, ay, z = window_xla_planes(
            scalars, pt.x.planes, pt.y.planes, curve, strict=strict)
        return JacobianPoint(
            GFp.from_mont(ax, fs), GFp.from_mont(ay, fs), GFp.from_mont(z, fs), curve)
    kern = functools.partial(window_mont_planes, strict=strict) if strict else window_mont_planes
    return _run_padded(kern, scalars, pt, tile, False)
