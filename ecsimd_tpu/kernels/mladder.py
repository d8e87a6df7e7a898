"""Fused Pallas kernel: Montgomery x-only ladder (RFC 7748 X25519 class).

The x-coordinate ladder needs no y and works on curve AND twist points —
the conformance property X25519 requires (x25519.py module docstring). Per
bit: one masked conditional swap + the standard 5M + 4S + 1 a24-mult step
(RFC 7748 §5) — ~9 field ops/bit vs the co-Z ladder's ~16, so this is also
the fastest variable-point path for Montgomery-form curves.

Same VMEM-resident digit-per-vreg structure as kernels/ladder.py: state
(x2, z2, x3, z3, swap) lives in registers for all ``nbits_scan`` steps; the
XLA twin shares the core for CPU tests and op counting. Generic over
(field, A24, bit count) — any Montgomery curve, not just Curve25519.

Scalars are CALLER-CLAMPED (x25519.clamp for X25519); the ladder itself
processes bits [nbits_scan-1 .. 0] uniformly for any scalar value.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ecsimd_tpu.kernels.digits import VGFp
from ecsimd_tpu.specs import DIGIT_BITS, FieldSpec

DEFAULT_TILE = 2048
LANES = 128


def _mladder_core(read_plane, u: VGFp, fs: FieldSpec, a24: int, nbits_scan: int):
    """RFC 7748 §5 ladder on VGFp digit lists (deferred-cswap form)."""
    one = u.const_like(1)
    zero = u.const_like(0)
    a24c = u.const_like(a24)

    def bit_at(i):
        digit = lax.div(i, DIGIT_BITS)
        off = lax.rem(i, DIGIT_BITS)
        return lax.shift_right_logical(read_plane(digit), off) & 1

    def step(kt, state):
        x2d, z2d, x3d, z3d, swap = state
        x2, z2 = VGFp(x2d, fs), VGFp(z2d, fs)
        x3, z3 = VGFp(x3d, fs), VGFp(z3d, fs)
        sw = swap ^ kt
        x2, x3 = x3.select(sw, x2), x2.select(sw, x3)
        z2, z3 = z3.select(sw, z2), z2.select(sw, z3)
        a = x2 + z2
        aa = a.sqr()
        b = x2 - z2
        bb = b.sqr()
        e = aa - bb
        c = x3 + z3
        d_ = x3 - z3
        da = d_ * a
        cb = c * b
        x3n = (da + cb).sqr()
        z3n = u * (da - cb).sqr()
        x2n = aa * bb
        z2n = e * (aa + a24c * e)
        return x2n.digs, z2n.digs, x3n.digs, z3n.digs, kt

    def body(t, state):
        return step(bit_at(nbits_scan - 1 - t), state)

    init = (one.digs, zero.digs, u.digs, one.digs,
            jnp.zeros_like(u.digs[0]))
    x2d, z2d, x3d, z3d, swap = lax.fori_loop(0, nbits_scan, body, init)
    x2, z2 = VGFp(x2d, fs), VGFp(z2d, fs)
    x3, z3 = VGFp(x3d, fs), VGFp(z3d, fs)
    x2 = x3.select(swap, x2)
    z2 = z3.select(swap, z2)
    return x2, z2


def _mladder_kernel(scalars_ref, u_ref, x_ref, z_ref, *, fs: FieldSpec,
                    a24: int, nbits_scan: int):
    d = fs.ndigits
    u = VGFp([u_ref[0, k] for k in range(d)], fs)
    x2, z2 = _mladder_core(
        lambda dig: scalars_ref[0, pl.ds(dig, 1)][0], u, fs, a24, nbits_scan
    )
    for k in range(d):
        x_ref[0, k] = x2.digs[k]
        z_ref[0, k] = z2.digs[k]


@functools.partial(jax.jit,
                   static_argnames=("fs", "a24", "nbits_scan", "tile", "interpret"))
def mladder_planes(scalars, u, fs: FieldSpec, a24: int, nbits_scan: int,
                   tile: int = DEFAULT_TILE, interpret: bool = False):
    """(x2, z2) projective result planes of the x-only ladder; callers
    finish with x2 * z2^-1 (GFp.batch_inverse amortizes that). Plain-domain
    (solinas/crandall) fields only — the x-only formulas assume internal ==
    classical residues."""
    assert fs.plain, "x-only ladder: plain-domain fields only"
    d = fs.ndigits
    b = scalars.shape[1]
    assert scalars.shape == (d, b) and u.shape == (d, b)
    assert b % tile == 0, f"batch {b} not a multiple of tile {tile}"
    lanes = min(LANES, tile)
    s = tile // lanes
    nblk = b // tile

    def to_blocks(a):
        return a.reshape(d, nblk, s, lanes).transpose(1, 0, 2, 3)

    def from_blocks(a):
        return a.transpose(1, 0, 2, 3).reshape(d, b)

    spec = pl.BlockSpec((1, d, s, lanes), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((nblk, d, s, lanes), jnp.int32)
    x2, z2 = pl.pallas_call(
        functools.partial(_mladder_kernel, fs=fs, a24=a24, nbits_scan=nbits_scan),
        grid=(nblk,),
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(to_blocks(scalars), to_blocks(u))
    return from_blocks(x2), from_blocks(z2)


def mladder_xla_planes(scalars, u, fs: FieldSpec, a24: int, nbits_scan: int):
    """XLA twin (same core) for CPU tests; (D, B) planes in/out."""
    d = fs.ndigits

    @functools.partial(jax.jit, static_argnames=("fs_", "a24_", "nb_"))
    def flat(scalars, u, fs_, a24_, nb_):
        uv = VGFp([u[k] for k in range(d)], fs_)
        x2, z2 = _mladder_core(
            lambda dig: lax.dynamic_index_in_dim(scalars, dig, 0, keepdims=False),
            uv, fs_, a24_, nb_,
        )
        return tuple(x2.digs), tuple(z2.digs)

    x2d, z2d = flat(scalars, u, fs, a24, nbits_scan)
    return jnp.stack(x2d), jnp.stack(z2d)
