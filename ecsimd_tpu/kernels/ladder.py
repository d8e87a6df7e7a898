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
from ecsimd_tpu.kernels import coz as coz_k
from ecsimd_tpu.kernels.digits import VGFp
from ecsimd_tpu.specs import DIGIT_BITS, CurveSpec

DEFAULT_TILE = 2048
LANES = 128


def _zdau(x1, y1, x2, y2, z):
    if x1.fs.plain:
        return coz_k.zdau_fused(x1, y1, x2, y2, z)
    return group.zdau(x1, y1, x2, y2, z)


def _add_z2_1(x1, y1, z1, x2, y2):
    if x1.fs.plain:
        return coz_k.add_z2_1_fused(x1, y1, z1, x2, y2)
    return group.add_z2_1(x1, y1, z1, x2, y2)


def _ladder_core(read_plane, x: VGFp, y: VGFp, curve: CurveSpec):
    """The full co-Z ladder computation on VGFp digit lists.

    ``read_plane(dig)`` returns scalar digit plane ``dig`` (possibly traced)
    shaped like the digits of ``x``. Shared by the Pallas kernel (VMEM-ref
    reads) and the XLA twin (``ladder_xla_planes``), so the kernel's exact
    compute path is CPU-compilable for tests and analytic op counting
    (bench/roofline.py)."""
    fs = curve.field
    d = fs.ndigits
    nbits = fs.nbits

    opp_y = y.opposite()
    bx, by, ax, ay, z = group.tplu(x, y, curve)

    def bit_at(i):
        digit = lax.div(i, DIGIT_BITS)
        off = lax.rem(i, DIGIT_BITS)
        return lax.shift_right_logical(read_plane(digit), off) & 1

    def swap2(m, a, b):
        return gfp_swap_if(m, a, b)

    m1 = bit_at(1)
    ax, bx = swap2(m1, ax, bx)
    ay, by = swap2(m1, ay, by)

    # Nested digit/bit loops: the dynamic VMEM row read costs ~thousands of
    # cycles per occurrence (ablation), so it runs once per 16-bit digit in
    # the outer loop; the inner loop shifts the held register per bit.
    def outer(dig, state):
        plane = read_plane(dig)

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
    sx, sy, sz = _add_z2_1(ax, ay, z, x, opp_y)
    meven = 1 - bit_at(0)
    ax = sx.select(meven, ax)
    ay = sy.select(meven, ay)
    z = sz.select(meven, z)
    return ax, ay, z


def _ladder_kernel(scalars_ref, x_ref, y_ref, ax_ref, ay_ref, z_ref, *, curve: CurveSpec):
    fs = curve.field
    d = fs.ndigits
    x = VGFp([x_ref[0, k] for k in range(d)], fs)
    y = VGFp([y_ref[0, k] for k in range(d)], fs)
    ax, ay, z = _ladder_core(
        lambda dig: scalars_ref[0, pl.ds(dig, 1)][0], x, y, curve
    )
    for k in range(d):
        ax_ref[0, k] = ax.digs[k]
        ay_ref[0, k] = ay.digs[k]
        z_ref[0, k] = z.digs[k]


@functools.partial(jax.jit, static_argnames=("curve",))
def _ladder_xla_flat(scalars, xm, ym, curve: CurveSpec):
    fs = curve.field
    d = fs.ndigits
    x = VGFp([xm[k] for k in range(d)], fs)
    y = VGFp([ym[k] for k in range(d)], fs)
    ax, ay, z = _ladder_core(
        lambda dig: lax.dynamic_index_in_dim(scalars, dig, 0, keepdims=False),
        x, y, curve,
    )
    return tuple(ax.digs), tuple(ay.digs), tuple(z.digs)


def ladder_xla_planes(scalars, xm, ym, curve: CurveSpec):
    """XLA-compiled twin of ladder_mont_planes: the SAME compute graph
    (_ladder_core — fused ZDAU, masked swaps, parity fixup) on (D, B) planes
    without the Pallas plumbing. CPU-compilable.

    The jitted core returns FLAT per-digit arrays and the (D, B) stacking
    happens outside the jit: XLA:CPU's emitter degenerates on a concatenate
    whose producers are deep fused elementwise chains (the compiled
    executable runs essentially forever — minutes-to-unbounded for a toy
    64-bit ladder; measured 40 s with the concat hoisted out vs >40 min
    with it inside, jaxlib 0.9.0). Outside the jit the stack is a trivial
    copy of materialized arrays on every backend."""
    axd, ayd, zd = _ladder_xla_flat(scalars, xm, ym, curve)
    return jnp.stack(axd), jnp.stack(ayd), jnp.stack(zd)


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
    SURVEY.md §7 batch-edge hazard), run, slice back, rewrap as a point.

    interpret mode dispatches the unjitted kernel eagerly — jitting a traced
    interpret-mode pallas_call hands XLA:CPU a program shape it cannot
    compile in reasonable time (same pathology comb.scalar_mult_base
    documents); eager dispatch runs it in seconds."""
    import functools

    from ecsimd_tpu import parallel
    from ecsimd_tpu.curves.point import JacobianPoint

    fn = kernel_planes
    if interpret:
        if isinstance(fn, functools.partial):
            fn = functools.partial(fn.func.__wrapped__, *fn.args, **fn.keywords)
        else:
            fn = getattr(fn, "__wrapped__", fn)

    curve = pt.curve
    fs = curve.field
    s, b = parallel.pad_batch(scalars, tile)
    xm, _ = parallel.pad_batch(pt.x.planes, tile)
    ym, _ = parallel.pad_batch(pt.y.planes, tile)
    ax, ay, z = fn(s, xm, ym, curve, tile=tile, interpret=interpret)
    ax, ay, z = ax[:, :b], ay[:, :b], z[:, :b]
    return JacobianPoint(GFp.from_mont(ax, fs), GFp.from_mont(ay, fs), GFp.from_mont(z, fs), curve)


def scalar_mult(scalars, pt, tile: int = DEFAULT_TILE, interpret: bool = False):
    """Drop-in replacement for curves.group.scalar_mult using the fused kernel.

    pt: JacobianPoint batch with z = 1 (from_affine). Returns JacobianPoint.
    Batch is auto-padded to a tile multiple.
    """
    return _run_padded(ladder_mont_planes, scalars, pt, tile, interpret)
