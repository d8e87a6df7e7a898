"""Fused Pallas kernel: GLV double-scalar signed-window multiplication.

secp256k1-class fast path (ecsimd_tpu/glv.py): k*P = k1*P + k2*phi(P) with
|k1|, |k2| ~ sqrt(n), phi(x, y, z) = (beta*x, y, z) free on Jacobian
coordinates. The shared-doubling window chain runs over ~half the bits of
the plain window kernel (kernels/window.py): per 4 bits, 4 doublings + TWO
table adds (one per half-scalar) — ~(4*dbl + 2*add) * nbits/8 versus
(4*dbl + 1*add) * nbits/4, i.e. ~1.3x fewer field mults for secp256k1's
general-a doubling shape.

The second table is free: T2[i] = (beta * T1[i].x, T1[i].y, T1[i].z)
(the endomorphism commutes with scalar multiplication), so only 8 extra
field mults beyond the plain window's table build.

Signs: half-scalars arrive as (magnitude, sign-mask); the sign folds into
the gathered entry's y negation mask (XOR with the window-digit sign), so
the kernel body stays uniform. Same signed-odd force-odd recoding as the
window kernel, with one parity fixup per half-scalar.

Domain: k in [1, order) via the strict=True complete-add chain (k1 or k2
may be ZERO or collide mid-chain for adversarially chosen k — e.g. k =
lambda gives k1 = 0 — so unlike the plain window kernel the degenerate
classes here are trivially reachable; strict is the default and the plain
chain is for trusted uniform-random scalars only).

No reference counterpart (the reference's P-256 has no endomorphism).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ecsimd_tpu.glv import glv_params, split_planes
from ecsimd_tpu.kernels import digits as dg
from ecsimd_tpu.kernels.coz import add_any, add_complete_any, add_z2_1_any, dbl_any
from ecsimd_tpu.kernels.digits import VGFp
from ecsimd_tpu.specs import DIGIT_BITS, CurveSpec

DEFAULT_TILE = 2048
LANES = 128
W = 4


def _recode(plane, plane_next, off):
    """Signed-odd window digit: returns (idx in 0..7, neg mask)."""
    if isinstance(off, int):
        spill = 0 if off == 0 else plane_next << (DIGIT_BITS - off)
    else:
        spill = jnp.where(off == 0, 0, plane_next << (DIGIT_BITS - off))
    w5 = (lax.shift_right_logical(plane, off) | spill) & 31
    v = w5 | 1
    sd = v - 16
    neg = sd < 0
    mag = jnp.where(neg, -sd, sd)
    return lax.shift_right_logical(mag - 1, 1), neg


def _gather(xs, ys, zs, idx, neg_y, fs):
    """Masked 8-way table select + conditional y negation (uniform flow)."""
    txd, tyd, tzd = list(xs[7]), list(ys[7]), list(zs[7])
    for t_ in range(6, -1, -1):
        m = idx == t_
        txd = [jnp.where(m, a, b) for a, b in zip(xs[t_], txd)]
        tyd = [jnp.where(m, a, b) for a, b in zip(ys[t_], tyd)]
        tzd = [jnp.where(m, a, b) for a, b in zip(zs[t_], tzd)]
    ty_opp = dg.mod_opposite(tyd, fs)
    tyd = [jnp.where(neg_y, a, b) for a, b in zip(ty_opp, tyd)]
    return VGFp(txd, fs), VGFp(tyd, fs), VGFp(tzd, fs)


def _glv_core(read_row, x: VGFp, y: VGFp, curve: CurveSpec,
              strict: bool = True, unroll: bool = False):
    """The GLV double-scalar window chain on VGFp digit lists.

    ``read_row(r)`` returns row r of the packed scalar block: rows
    [0, dk) = |k1| digits, [dk, 2dk) = |k2| digits, 2dk = neg1 mask,
    2dk+1 = neg2 mask (ecsimd_tpu/glv.split_planes layout).
    """
    fs = curve.field
    params = glv_params(curve)
    dk = params.dk

    one = x.const_like(1)
    beta = x.const_like(params.beta)
    opp_y = y.opposite()

    neg1 = read_row(2 * dk) & 1
    neg2 = read_row(2 * dk + 1) & 1

    # odd-multiple table of P (unsigned); T2 shares y, z and scales x by
    # beta (phi((2t+1)P) = (2t+1)phi(P))
    two = dbl_any(x, y, one, curve)
    T = [(x, y, one)]
    for _ in range(7):
        px, py, pz = T[-1]
        T.append(add_any(px, py, pz, *two, curve))
    xs1 = [tx.digs for tx, _, _ in T]
    ys = [ty.digs for _, ty, _ in T]
    zs = [tz.digs for _, _, tz in T]
    xs2 = [(beta * tx).digs for tx, _, _ in T]
    x2 = VGFp(xs2[0], fs)  # beta * x, z = 1

    adder = add_complete_any if strict else add_any

    # init acc = sigma1*P + sigma2*phi(P): never degenerate for valid P
    # (equality would need lambda = +-1 mod ord(P)); plain add suffices,
    # but strict mode keeps every add complete for uniformity
    y1 = y.select(1 - neg1, opp_y)
    y2 = y.select(1 - neg2, opp_y)
    ix, iy, iz = adder(x, y1, one, x2, y2, one, curve)

    def window_step(p1, p1n, p2, p2n, off, state):
        accx, accy, accz = (VGFp(v, fs) for v in state)
        i1, s1 = _recode(p1, p1n, off)
        i2, s2 = _recode(p2, p2n, off)
        for _ in range(W):
            accx, accy, accz = dbl_any(accx, accy, accz, curve)
        t1 = _gather(xs1, ys, zs, i1, s1 ^ neg1.astype(bool), fs)
        accx, accy, accz = adder(accx, accy, accz, *t1, curve)
        t2 = _gather(xs2, ys, zs, i2, s2 ^ neg2.astype(bool), fs)
        accx, accy, accz = adder(accx, accy, accz, *t2, curve)
        return accx.digs, accy.digs, accz.digs

    state = (list(ix.digs), list(iy.digs), list(iz.digs))
    if unroll:
        zero_plane = jnp.zeros_like(x.digs[0])
        for dig in range(dk - 1, -1, -1):
            p1 = read_row(dig)
            p1n = read_row(dig + 1) if dig + 1 < dk else zero_plane
            p2 = read_row(dk + dig)
            p2n = read_row(dk + dig + 1) if dig + 1 < dk else zero_plane
            for u in range(DIGIT_BITS // W):
                off = DIGIT_BITS - W - u * W
                state = window_step(p1, p1n, p2, p2n, off, state)
    else:
        def outer(t, state):
            dig = (dk - 1) - t
            p1 = read_row(dig)
            p2 = read_row(dk + dig)
            nxt = jnp.minimum(dig + 1, dk - 1)
            p1n = jnp.where(dig == dk - 1, 0, read_row(nxt))
            p2n = jnp.where(dig == dk - 1, 0, read_row(dk + nxt))

            def inner(u, st):
                off = DIGIT_BITS - W - u * W
                return window_step(p1, p1n, p2, p2n, off, st)

            return lax.fori_loop(0, DIGIT_BITS // W, inner, state)

        state = lax.fori_loop(0, dk, outer, state)
    accx, accy, accz = (VGFp(v, fs) for v in state)

    # parity fixups: |k_i| even -> subtract sigma_i * base_i
    def fixup(accx, accy, accz, bx, row, negm):
        fy = y.select(negm, opp_y)  # -(sigma*y): sigma=+1 -> -y, else +y
        if strict:
            sx, sy, sz = add_complete_any(accx, accy, accz, bx, fy, one, curve)
        else:
            sx, sy, sz = add_z2_1_any(accx, accy, accz, bx, fy, curve)
        meven = 1 - (read_row(row) & 1)
        return (sx.select(meven, accx), sy.select(meven, accy),
                sz.select(meven, accz))

    accx, accy, accz = fixup(accx, accy, accz, x, 0, neg1)
    accx, accy, accz = fixup(accx, accy, accz, x2, dk, neg2)
    return accx, accy, accz


def _glv_kernel(packed_ref, x_ref, y_ref, ax_ref, ay_ref, z_ref, *,
                curve: CurveSpec, strict: bool = True):
    d = curve.field.ndigits
    fs = curve.field
    x = VGFp([x_ref[0, k] for k in range(d)], fs)
    y = VGFp([y_ref[0, k] for k in range(d)], fs)
    accx, accy, accz = _glv_core(
        lambda r: packed_ref[0, pl.ds(r, 1)][0], x, y, curve, strict=strict
    )
    for k in range(d):
        ax_ref[0, k] = accx.digs[k]
        ay_ref[0, k] = accy.digs[k]
        z_ref[0, k] = accz.digs[k]


def pack_scalars(scalars, curve: CurveSpec):
    """(D, B) classical scalar planes -> (2dk+2, B) packed GLV planes."""
    k1, k2, n1, n2 = split_planes(scalars, curve)
    return jnp.concatenate([k1, k2, n1[None], n2[None]], axis=0)


@functools.partial(jax.jit, static_argnames=("curve", "tile", "interpret", "strict"))
def glv_mont_planes(packed, xm, ym, curve: CurveSpec, tile: int = DEFAULT_TILE,
                    interpret: bool = False, strict: bool = True):
    """GLV double-scalar window mult on internal-domain planes. ``packed``
    is pack_scalars' (2dk+2, B) layout; same output contract as
    window.window_mont_planes."""
    params = glv_params(curve)
    rows = 2 * params.dk + 2
    d = curve.field.ndigits
    b = packed.shape[1]
    assert packed.shape == (rows, b) and xm.shape == (d, b) and ym.shape == (d, b)
    assert b % tile == 0, f"batch {b} not a multiple of tile {tile}"
    lanes = min(LANES, tile)
    s = tile // lanes
    nblk = b // tile

    def to_blocks(a):
        r = a.shape[0]
        return a.reshape(r, nblk, s, lanes).transpose(1, 0, 2, 3)

    def from_blocks(a):
        return a.transpose(1, 0, 2, 3).reshape(d, b)

    def spec(r):
        return pl.BlockSpec((1, r, s, lanes), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    out_shape = jax.ShapeDtypeStruct((nblk, d, s, lanes), jnp.int32)
    ax, ay, z = pl.pallas_call(
        functools.partial(_glv_kernel, curve=curve, strict=strict),
        grid=(nblk,),
        in_specs=[spec(rows), spec(d), spec(d)],
        out_specs=(spec(d), spec(d), spec(d)),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
    )(to_blocks(packed), to_blocks(xm), to_blocks(ym))
    return from_blocks(ax), from_blocks(ay), from_blocks(z)


def glv_xla_planes(packed, xm, ym, curve: CurveSpec, strict: bool = True):
    """Eager XLA twin of glv_mont_planes (same compute graph, CPU-testable;
    see window.window_xla_planes for why eager)."""
    fs = curve.field
    d = fs.ndigits
    x = VGFp([xm[k] for k in range(d)], fs)
    y = VGFp([ym[k] for k in range(d)], fs)
    accx, accy, accz = _glv_core(
        lambda r: packed[r], x, y, curve, strict=strict, unroll=True
    )
    return jnp.stack(accx.digs), jnp.stack(accy.digs), jnp.stack(accz.digs)


def scalar_mult(scalars, pt, tile: int = DEFAULT_TILE, interpret: bool = False,
                strict: bool = True):
    """GLV drop-in for kernels.window.scalar_mult on GLV-capable curves:
    k_i * P_i per lane through the endomorphism-split kernel. ``scalars``
    are full-width classical planes; the split runs in XLA ahead of the
    kernel. Batch auto-pads to a tile multiple.

    interpret=True routes to the eager XLA twin (CPU testing), as the
    window kernel does."""
    from ecsimd_tpu.curves.point import JacobianPoint
    from ecsimd_tpu.field import GFp
    from ecsimd_tpu.kernels.ladder import _run_padded

    curve = pt.curve
    packed = jax.jit(pack_scalars, static_argnames=("curve",))(scalars, curve)
    if interpret:
        fs = curve.field
        ax, ay, z = glv_xla_planes(
            packed, pt.x.planes, pt.y.planes, curve, strict=strict)
        return JacobianPoint(
            GFp.from_mont(ax, fs), GFp.from_mont(ay, fs), GFp.from_mont(z, fs), curve)
    kern = functools.partial(glv_mont_planes, strict=strict)
    return _run_padded(kern, packed, pt, tile, False)


def strict_varbase(scalars, pt, tile: int = DEFAULT_TILE,
                   interpret: bool = False):
    """Strict (total-domain) variable-base dispatch: the GLV double-scalar
    kernel on capable curves (~1.2x the strict window it replaces), the
    strict window kernel otherwise. The shared router for every
    adversarial-input consumer (ecdsa.verify/recover, ecdh, MSM)."""
    from ecsimd_tpu.glv import glv_capable
    from ecsimd_tpu.kernels import window

    if glv_capable(pt.curve):
        return scalar_mult(scalars, pt, tile=tile, interpret=interpret,
                           strict=True)
    return window.scalar_mult(scalars, pt, tile=tile, interpret=interpret,
                              strict=True)
