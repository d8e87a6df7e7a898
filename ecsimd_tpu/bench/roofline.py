"""Roofline: analytic vreg-op counts vs an empirically measured VPU ceiling.

BASELINE.md row 2 tracks "% of speed-of-light limb-mul throughput". This
module makes that number reproducible:

1. ``count_vreg_ops(fn, *args)`` traces ``fn`` to a jaxpr and counts VPU
   vector-register operations: every elementwise arithmetic/logic/select/
   compare equation costs ceil(size / 1024) vreg-ops (a TPU vreg holds an
   (8, 128) tile of int32). Scans multiply by their trip count; branches
   count the max branch. This is the TPU analogue of counting AVX2
   instructions in the reference's kernels (its L0, simd_vector.h).

2. ``kernel_op_counts(curve)`` composes per-algorithm totals out of the SAME
   fused building blocks the Pallas kernels call (kernels/coz.py,
   field.gfp_swap_if over VGFp), so the counts track the shipped kernels.

3. ``measure_vpu_ceiling()`` times a calibration Pallas kernel — long chains
   of 8-way-independent int32 multiply/add/shift/mask ops (the EC kernels'
   op mix) on VMEM-resident vregs — giving the achievable vreg-ops/sec on
   this chip without assuming a clock rate.

``roofline(rate, algo)`` then reports achieved vreg-ops/sec
(= rate / 1024 * ops_per_1024_lanes) as a fraction of the ceiling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# elementwise primitives that map 1:1 onto VPU vreg instructions
_ELEMENTWISE = {
    "add", "sub", "mul", "neg",
    "and", "or", "xor", "not",
    "shift_left", "shift_right_logical", "shift_right_arithmetic",
    "select_n", "eq", "ne", "lt", "le", "gt", "ge", "min", "max",
    "rem", "div",
}
# shape/plumbing primitives that cost nothing (or fold away in Mosaic)
_FREE = {
    "broadcast_in_dim", "reshape", "squeeze", "convert_element_type",
    "slice", "concatenate", "transpose", "copy", "stop_gradient",
    "dynamic_slice", "dynamic_update_slice", "iota", "pjit", "closed_call",
}

VREG_ELEMS = 8 * 128  # int32 elements per (8, 128) vreg


def _aval_vregs(aval) -> float:
    size = 1
    for s in aval.shape:
        size *= s
    return max(1.0, size / VREG_ELEMS)


def _walk(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "scan":
            total += _walk(eqn.params["jaxpr"].jaxpr) * eqn.params["length"]
        elif name == "while":
            raise ValueError(
                "dynamic-trip while_loop in traced fn; count its body per "
                "iteration instead (pass the step function)"
            )
        elif name == "cond":
            total += max(_walk(b.jaxpr) for b in eqn.params["branches"])
        elif name == "pjit":
            total += _walk(eqn.params["jaxpr"].jaxpr)
        elif name in _ELEMENTWISE:
            total += _aval_vregs(eqn.outvars[0].aval)
        elif name in _FREE:
            continue
        # anything else (reductions, dots) is not VPU elementwise work;
        # ignored here — the EC kernels contain none in their hot path
    return total


def count_vreg_ops(fn, *args) -> float:
    """Vreg-ops of one call of fn on example args (abstract trace)."""
    return _walk(jax.make_jaxpr(fn)(*args).jaxpr)


def _vreg_args(n, d):
    return [jnp.zeros((8, 128), jnp.int32) for _ in range(n * d)]


@functools.cache
def kernel_op_counts(curve) -> dict:
    """Analytic vreg-ops per 1024 lanes for each scalar-mult kernel,
    composed from the same fused blocks the Pallas kernels execute."""
    from ecsimd_tpu.curves import group
    from ecsimd_tpu.field import gfp_swap_if
    from ecsimd_tpu.kernels import coz as coz_k
    from ecsimd_tpu.kernels import digits as dg
    from ecsimd_tpu.kernels.digits import VGFp

    fs = curve.field
    d = fs.ndigits
    nbits = fs.nbits

    def V(flat, i):
        return VGFp(list(flat[i * d:(i + 1) * d]), fs)

    def c(fn, nin):
        args = _vreg_args(nin, d)
        def wrapped(*flat):
            outs = fn(*[V(flat, i) for i in range(nin)])
            flat_out = []
            for o in (outs if isinstance(outs, tuple) else (outs,)):
                flat_out += o.digs if isinstance(o, VGFp) else [o]
            return flat_out
        return count_vreg_ops(wrapped, *args)

    zdau = c(lambda x1, y1, x2, y2, z: coz_k.zdau_fused(x1, y1, x2, y2, z), 5)
    addz21 = c(lambda x1, y1, z1, x2, y2: coz_k.add_z2_1_fused(x1, y1, z1, x2, y2), 5)
    jdbl = c(lambda x, y, z: coz_k.jac_dbl(x, y, z, curve), 3)
    jadd = c(lambda x1, y1, z1, x2, y2, z2: coz_k.jac_add(x1, y1, z1, x2, y2, z2), 6)
    tplu = c(lambda x, y: group.tplu(x, y, curve), 2)
    swap_pair = c(lambda a, b: gfp_swap_if(jnp.zeros((8, 128), jnp.int32), a, b).__iter__().__next__(), 2)
    opp = c(lambda y: y.opposite(), 1)
    sel3 = 3 * d  # three coordinate selects in the parity fixup

    # ladder: tplu seed + per bit (bit extract ~2 + 2 swap-pairs before and
    # after the ZDAU = 4 swap pairs total) + fixup (add_z2_1 + selects)
    ladder_bit = zdau + 4 * swap_pair + 2
    ladder = tplu + opp + 2 * swap_pair + (nbits - 2) * ladder_bit + addz21 + sel3

    # window (w=4): table build (1 dbl + 7 general adds) + per window
    # (4 dbl + 1 general add + masked 8-way gather: 7 selects x 3 coords x d
    # + mod_opposite + sign select) + fixup
    gather = 7 * 3 * d + c(lambda y: VGFp(dg.mod_opposite(y.digs, fs), fs), 1) + d + 6
    win_step = 4 * jdbl + jadd + gather
    window = jdbl + 7 * jadd + opp + (nbits // 4) * win_step + addz21 + sel3

    # comb (w=8 fixed base), serial chain: npos mixed adds + fixup (the MXU
    # gather and the index recoding are not VPU elementwise work)
    npos = nbits // 8
    comb = npos * addz21 + addz21 + sel3 + 2

    # comb tree chain: one aff-aff add per pair at level 1, then general
    # jac_adds down the halving levels (npos-even; odd levels carry one)
    aff = c(lambda x1, y1, x2, y2: coz_k.aff_add_fused(x1, y1, x2, y2), 4)
    n, tree_adds = npos // 2, 0
    while n > 1:
        tree_adds += n // 2
        n = n // 2 + n % 2
    comb_tree = (npos // 2) * aff + tree_adds * jadd + addz21 + sel3

    return {
        "ladder": ladder, "window": window, "comb": comb, "comb_tree": comb_tree,
        "blocks": {"zdau_fused": zdau, "add_z2_1_fused": addz21,
                   "jac_dbl": jdbl, "jac_add": jadd, "aff_add_fused": aff},
    }


def _calib_kernel(a_ref, b_ref, o_ref, *, reps: int):
    """8 independent accumulator chains of mul/add/shift/mask — enough ILP to
    saturate VPU issue; op mix mirrors the field-mul grids."""
    from jax import lax

    a = a_ref[...]
    b = b_ref[...]
    accs = [a + i for i in range(8)]

    def body(_, accs):
        for _ in range(4):  # manual 4x unroll (Mosaic rejects partial unroll)
            out = []
            for acc in accs:
                acc = acc * b                               # mul
                acc = (acc & 0xFFFF) + a                    # mask + add
                acc = lax.shift_right_logical(acc, 1) + b   # shift + add
                out.append(acc)
            accs = out
        return accs

    accs = lax.fori_loop(0, reps // 4, body, accs)
    r = accs[0]
    for acc in accs[1:]:
        r = r + acc
    o_ref[...] = r


_OPS_PER_REP = 8 * 5  # 8 chains x (mul, and, add, shift, add)


def measure_vpu_ceiling(reps: int = 32_000_000, iters: int = 8) -> float:
    """Achievable int32 vreg-ops/sec on this chip (calibration kernel)."""
    import time

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = (8, 128)
    a = jnp.ones(shape, jnp.int32)
    b = jnp.full(shape, 3, jnp.int32)
    fn = jax.jit(
        lambda a, b: pl.pallas_call(
            functools.partial(_calib_kernel, reps=reps),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
        )(a, b)
    )
    out = fn(a, b)
    np.asarray(out)  # sync through the tunnel
    t0 = time.perf_counter()
    x = a
    for _ in range(iters):
        x = fn(x, b)
    np.asarray(x)
    dt = time.perf_counter() - t0
    return _OPS_PER_REP * (reps // 4 * 4) * iters / dt


def roofline(rate_mults_per_sec: float, algo: str, curve=None,
             ceiling: float | None = None) -> dict:
    """Fraction of the VPU speed-of-light a measured scalar-mult rate hits."""
    from ecsimd_tpu.specs import P256

    curve = curve or P256
    counts = kernel_op_counts(curve)
    ops = counts[algo]
    achieved = rate_mults_per_sec / VREG_ELEMS * ops
    ceiling = ceiling or measure_vpu_ceiling()
    return {
        "algo": algo,
        "vreg_ops_per_1024_mults": round(ops),
        "achieved_vreg_ops_per_sec": round(achieved),
        "ceiling_vreg_ops_per_sec": round(ceiling),
        "fraction_of_ceiling": round(achieved / ceiling, 4),
    }
