"""Fused Pallas TPU kernel for the co-Z scalar-multiplication ladder.

The XLA path (curves/group.py) round-trips the 5-coordinate ladder state
through HBM every fori_loop iteration. This kernel pins the whole state —
scalars + (ax, ay, bx, by, z) — in VMEM/vregs for all 254 steps; per-step
memory traffic is zero and throughput is set by VPU int32 arithmetic.

Data layout: a batch tile of S*L lanes (L = 128 vector lanes, S sublanes) is
held as per-digit (S, L) registers — a Python list of D arrays. This is the
reference's register file layout (one AVX2 register per limb, bignum.h:38-102)
mapped onto the VPU: digit indexing is free, every instruction is a full-vreg
elementwise op, and none of the sublane shuffles that (D, T) plane slicing
costs in Mosaic ever happen (measured ~2x). The group-law formulas trace
unchanged from curves/group.py via the duck-typed VGFp element.

Grid: (B / tile,) programs, each running the full ladder for its tile;
Pallas double-buffers the HBM loads/stores across grid steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ecsimd_tpu.field import GFp, gfp_swap_if
from ecsimd_tpu.curves import group
from ecsimd_tpu.kernels import digits as dg
from ecsimd_tpu.kernels.digits import VGFp
from ecsimd_tpu.specs import DIGIT_BITS, CurveSpec

DEFAULT_TILE = 2048
LANES = 128


def _zdau_fused(x1, y1, x2, y2, z):
    """ZDAU (curve_group.h:120-153) with every output coordinate produced by
    one fused Solinas reduction of its full polynomial (kernels/digits.
    reduce_combo) — shared raw grids, no separate dp reduction, no trailing
    mod_sub chains. Bit-identical to group.zdau (same algebra mod p)."""
    fs = x1.fs
    d = fs.ndigits

    def C(*terms):
        return VGFp(dg.reduce_combo(list(terms), fs), fs)

    gs = lambda v: dg._grid_sqr(v.digs, d)
    gm = lambda a, b: dg._grid(a.digs, b.digs, d)

    dx = x1 - x2
    cp = dx.sqr()
    w1p = x1 * cp
    w2p = x2 * cp
    dy = y1 - y2
    g_dy = gs(dy)  # raw grid of dp = dy^2, shared by two combos
    a1p = y1 * (w1p - w2p)
    x3pc = C((g_dy, 1), (w1p.digs, -1), (w2p.digs, -1))
    c = (x3pc - w1p).sqr()
    a1p2 = a1p.double()
    y3p = C((gs(dy + (w1p - x3pc)), 1), (g_dy, -1), (c.digs, -1), (a1p2.digs, -1))
    w1 = x3pc.mul_scaled(c, 4)
    w2 = w1p.mul_scaled(c, 4)
    t_minus = y3p - a1p2
    a1 = y3p * (w1 - w2)
    x3 = C((gs(t_minus), 1), (w1.digs, -1), (w2.digs, -1))
    y3 = C((gm(t_minus, w1 - x3), 1), (a1.digs, -1))
    z3 = z * C((gs(dx + (x3pc - w1p)), 1), (cp.digs, -1), (c.digs, -1))
    t_plus = y3p + a1p2
    xq = C((gs(t_plus), 1), (w1.digs, -1), (w2.digs, -1))
    yq = C((gm(t_plus, w1 - xq), 1), (a1.digs, -1))
    return x3, y3, xq, yq, z3


def _zdau(x1, y1, x2, y2, z):
    if x1.fs.reduction == "solinas":
        return _zdau_fused(x1, y1, x2, y2, z)
    return group.zdau(x1, y1, x2, y2, z)


def _ladder_kernel(scalars_ref, x_ref, y_ref, ax_ref, ay_ref, z_ref, *, curve: CurveSpec):
    fs = curve.field
    d = fs.ndigits
    nbits = fs.nbits

    x = VGFp([x_ref[0, k] for k in range(d)], fs)
    y = VGFp([y_ref[0, k] for k in range(d)], fs)

    opp_y = y.opposite()
    bx, by, ax, ay, z = group.tplu(x, y, curve)

    def bit_at(i):
        digit = lax.div(i, DIGIT_BITS)
        off = lax.rem(i, DIGIT_BITS)
        plane = scalars_ref[0, pl.ds(digit, 1)][0]  # (S, L)
        return lax.shift_right_logical(plane, off) & 1

    def swap2(m, a, b):
        return gfp_swap_if(m, a, b)

    m1 = bit_at(1)
    ax, bx = swap2(m1, ax, bx)
    ay, by = swap2(m1, ay, by)

    # Nested digit/bit loops: the dynamic VMEM row read costs ~thousands of
    # cycles per occurrence (ablation), so it runs once per 16-bit digit in
    # the outer loop; the inner loop shifts the held register per bit.
    def outer(dig, state):
        plane = scalars_ref[0, pl.ds(dig, 1)][0]  # (S, L)

        def inner(off, state):
            axd, ayd, bxd, byd, zd = state
            ax, ay = VGFp(axd, fs), VGFp(ayd, fs)
            bx, by = VGFp(bxd, fs), VGFp(byd, fs)
            zz = VGFp(zd, fs)
            m = lax.shift_right_logical(plane, off) & 1
            ax, bx = swap2(m, ax, bx)
            ay, by = swap2(m, ay, by)
            bx, by, ax, ay, zz = _zdau(bx, by, ax, ay, zz)
            ax, bx = swap2(m, ax, bx)
            ay, by = swap2(m, ay, by)
            return ax.digs, ay.digs, bx.digs, by.digs, zz.digs

        start = jnp.where(dig == 0, 2, 0)  # bits 0/1 consumed by the seed
        return lax.fori_loop(start, DIGIT_BITS, inner, state)

    state = lax.fori_loop(
        0, nbits // DIGIT_BITS, outer, (ax.digs, ay.digs, bx.digs, by.digs, z.digs)
    )
    axd, ayd, bxd, byd, zd = state
    ax, ay, z = VGFp(axd, fs), VGFp(ayd, fs), VGFp(zd, fs)

    # parity fixup for even scalars (curve_group.h:214-217)
    sx, sy, sz = group.add_z2_1(ax, ay, z, x, opp_y)
    meven = 1 - bit_at(0)
    ax = sx.select(meven, ax)
    ay = sy.select(meven, ay)
    z = sz.select(meven, z)
    for k in range(d):
        ax_ref[0, k] = ax.digs[k]
        ay_ref[0, k] = ay.digs[k]
        z_ref[0, k] = z.digs[k]


@functools.partial(jax.jit, static_argnames=("curve", "tile", "interpret"))
def ladder_mont_planes(
    scalars, xm, ym, curve: CurveSpec, tile: int = DEFAULT_TILE, interpret: bool = False
):
    """Run the ladder kernel on internal-domain affine planes (z = 1).

    scalars: (D, B) classical digit planes; xm, ym: (D, B) internal-domain
    planes. Returns Jacobian (ax, ay, z) planes. B must be a multiple of
    ``tile`` (use parallel.pad_batch upstream); tile should be a multiple of
    128 on hardware.
    """
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
        functools.partial(_ladder_kernel, curve=curve),
        grid=(nblk,),
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
    )(to_blocks(scalars), to_blocks(xm), to_blocks(ym))
    return from_blocks(ax), from_blocks(ay), from_blocks(z)


def _run_padded(kernel_planes, scalars, pt, tile: int, interpret: bool):
    """Pad the batch to a tile multiple (lane-padding with valid lane-0 copies,
    SURVEY.md §7 batch-edge hazard), run, slice back, rewrap as a point."""
    from ecsimd_tpu import parallel
    from ecsimd_tpu.curves.point import JacobianPoint

    curve = pt.curve
    fs = curve.field
    s, b = parallel.pad_batch(scalars, tile)
    xm, _ = parallel.pad_batch(pt.x.planes, tile)
    ym, _ = parallel.pad_batch(pt.y.planes, tile)
    ax, ay, z = kernel_planes(s, xm, ym, curve, tile=tile, interpret=interpret)
    ax, ay, z = ax[:, :b], ay[:, :b], z[:, :b]
    return JacobianPoint(GFp.from_mont(ax, fs), GFp.from_mont(ay, fs), GFp.from_mont(z, fs), curve)


def scalar_mult(scalars, pt, tile: int = DEFAULT_TILE, interpret: bool = False):
    """Drop-in replacement for curves.group.scalar_mult using the fused kernel.

    pt: JacobianPoint batch with z = 1 (from_affine). Returns JacobianPoint.
    Batch is auto-padded to a tile multiple.
    """
    return _run_padded(ladder_mont_planes, scalars, pt, tile, interpret)
