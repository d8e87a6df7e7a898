"""Fused Pallas TPU kernel for the co-Z scalar-multiplication ladder.

The XLA path (curves/group.py) round-trips the 5-coordinate ladder state
through HBM every fori_loop iteration. This kernel pins the whole state —
scalars + (ax, ay, bx, by, z) digit planes for a batch tile — in VMEM for all
254 steps, so the per-step traffic is zero and throughput is set by VPU int32
arithmetic (the reference's analogous move is keeping the 4-lane state in AVX2
registers for the whole ladder, curve_group.h:189-218).

Layout per tile: (D, T) int32 planes, T lanes on the minor (vector-lane) axis.
The grid walks batch tiles; Pallas double-buffers the HBM loads/stores.

The group-law arithmetic is the *same* pure-jnp code as the XLA path
(curves/group.py, ops/mont.py) — traced into the kernel body; only the memory
orchestration differs.
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
from ecsimd_tpu.specs import DIGIT_BITS, CurveSpec

DEFAULT_TILE = 512


def _ladder_kernel(scalars_ref, x_ref, y_ref, ax_ref, ay_ref, z_ref, *, curve: CurveSpec):
    fs = curve.field
    nbits = fs.nbits

    x = GFp.from_mont(x_ref[:], fs)
    y = GFp.from_mont(y_ref[:], fs)

    opp_y = y.opposite()
    bx, by, ax, ay, z = group.tplu(x, y, curve)

    def bit_at(i):
        # dynamic row read from the VMEM ref (Mosaic supports dynamic ref
        # slicing, not dynamic_slice on values)
        digit = lax.div(i, DIGIT_BITS)
        off = lax.rem(i, DIGIT_BITS)
        plane = scalars_ref[pl.ds(digit, 1), :][0]
        return lax.shift_right_logical(plane, off) & 1

    m1 = bit_at(1)
    ax, bx = gfp_swap_if(m1, ax, bx)
    ay, by = gfp_swap_if(m1, ay, by)

    def body(i, state):
        ax, ay, bx, by, z = state
        m = bit_at(i)
        ax, bx = gfp_swap_if(m, ax, bx)
        ay, by = gfp_swap_if(m, ay, by)
        bx, by, ax, ay, z = group.zdau(bx, by, ax, ay, z)
        ax, bx = gfp_swap_if(m, ax, bx)
        ay, by = gfp_swap_if(m, ay, by)
        return ax, ay, bx, by, z

    ax, ay, bx, by, z = lax.fori_loop(2, nbits, body, (ax, ay, bx, by, z))

    # parity fixup for even scalars (curve_group.h:214-217)
    sx, sy, sz = group.add_z2_1(ax, ay, z, x, opp_y)
    meven = 1 - bit_at(0)
    ax_ref[:] = jnp.where(meven[None].astype(bool), sx.planes, ax.planes)
    ay_ref[:] = jnp.where(meven[None].astype(bool), sy.planes, ay.planes)
    z_ref[:] = jnp.where(meven[None].astype(bool), sz.planes, z.planes)


@functools.partial(
    jax.jit, static_argnames=("curve", "tile", "interpret")
)
def ladder_mont_planes(scalars, xm, ym, curve: CurveSpec, tile: int = DEFAULT_TILE, interpret: bool = False):
    """Run the ladder kernel on Montgomery-domain affine planes (z = 1).

    scalars: (D, B) classical digit planes; xm, ym: (D, B) Montgomery planes.
    Returns Montgomery Jacobian (ax, ay, z) planes. B must be a multiple of
    ``tile`` (use parallel.pad_batch upstream).
    """
    d = curve.field.ndigits
    b = scalars.shape[1]
    assert scalars.shape == (d, b) and xm.shape == (d, b) and ym.shape == (d, b)
    assert b % tile == 0, f"batch {b} not a multiple of tile {tile}"

    spec = pl.BlockSpec((d, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((d, b), jnp.int32)
    return pl.pallas_call(
        functools.partial(_ladder_kernel, curve=curve),
        grid=(b // tile,),
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
    )(scalars, xm, ym)


def scalar_mult(scalars, pt, tile: int = DEFAULT_TILE, interpret: bool = False):
    """Drop-in replacement for curves.group.scalar_mult using the fused kernel.

    pt: JacobianPoint batch with z = 1 (from_affine). Returns JacobianPoint.
    """
    from ecsimd_tpu.curves.point import JacobianPoint

    curve = pt.curve
    fs = curve.field
    ax, ay, z = ladder_mont_planes(
        scalars, pt.x.planes, pt.y.planes, curve, tile=tile, interpret=interpret
    )
    return JacobianPoint(GFp.from_mont(ax, fs), GFp.from_mont(ay, fs), GFp.from_mont(z, fs), curve)
