"""L6: the library façade — batched scalar-multiplication entry points.

The analogue of the reference's one compiled entry point
``scalar_mult_p256(WBN const&, WJCP const&)`` (``lib/scalar_mult_p256.cpp:10-12``),
widened from 4 SIMD lanes to arbitrary batches and generalized over curves.

Two call styles, mirroring the reference's two ladders:
  * ``scalar_mult(scalars, points)``      — k_i · P_i per lane (curve_group.h:189)
  * ``scalar_mult_shared(k, points)``     — one public scalar, many points (curve_group.h:221)
plus generator-multiple convenience wrappers and host-friendly int interfaces.

Everything here is jit-compiled once per (curve, batch-shape) and cached.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ecsimd_tpu import convert
from ecsimd_tpu.curves import group
from ecsimd_tpu.curves.point import AffinePoint, JacobianPoint
from ecsimd_tpu.specs import P256, CurveSpec


@partial(jax.jit, static_argnames=("curve",))
def _scalar_mult_planes(scalars, xs, ys, curve: CurveSpec):
    """(D,*B) scalar planes x classical affine planes -> affine result planes."""
    pt = JacobianPoint.from_affine(AffinePoint(xs, ys, curve))
    res = group.scalar_mult(scalars, pt)
    out = res.to_affine()
    return out.x, out.y


@partial(jax.jit, static_argnames=("curve",))
def _scalar_mult_shared_planes(xs, ys, kbits, curve: CurveSpec):
    pt = JacobianPoint.from_affine(AffinePoint(xs, ys, curve))
    res = group.scalar_mult_shared(kbits, pt)
    out = res.to_affine()
    return out.x, out.y


def scalar_mult(scalars, points: AffinePoint) -> AffinePoint:
    """Batched constant-time k_i * P_i (the reference's scalar_mult ladder)."""
    x, y = _scalar_mult_planes(scalars, points.x, points.y, points.curve)
    return AffinePoint(x, y, points.curve)


def scalar_mult_shared(k: int, points: AffinePoint) -> AffinePoint:
    """One host scalar times a batch of points (reference scalar_mult_1s).

    The scalar travels as a traced LSB-first bit vector, so one compiled
    ladder serves every k."""
    nbits = points.curve.field.nbits
    kk = int(k)
    kbits = jnp.array([(kk >> i) & 1 for i in range(nbits)], jnp.int32)
    x, y = _scalar_mult_shared_planes(points.x, points.y, kbits, points.curve)
    return AffinePoint(x, y, points.curve)


def scalar_mult_shared_fast(k: int, points: AffinePoint, tile: int | None = None) -> AffinePoint:
    """Shared-scalar fast path: k broadcast through the fused window Pallas
    kernel (~1.5x the masked ladder that scalar_mult_shared compiles).

    Why no dedicated shared-scalar kernel exists: the reference's
    scalar_mult_1s (curve_group.h:221-251) wins on AVX2 by dropping per-lane
    masks, but on TPU the per-lane masked table gather costs ~450 of the
    ~76,600 vreg-ops in a window step (<1%), so a uniform-control-flow
    shared-scalar kernel has no headroom over the per-lane kernel — measured
    analysis in bench/roofline.py. The shared structure that IS worth a
    dedicated kernel on TPU is a shared *base* (kernels/comb.py, ~4x).
    For a public scalar reused across many batches, trace-time
    specialization (zero gathers, wNAF skipping) would save ~15% more at the
    cost of a per-scalar Mosaic compile — the wrong trade below ~10^9 points.

    Same (measure-zero) degenerate-scalar caveat as scalar_mult_fast; one
    compiled kernel serves every k (the broadcast happens in plane data).
    """
    batch = int(np.prod(points.x.shape[1:], initial=1))
    scalars = jnp.asarray(convert.broadcast_int(int(k), points.curve.field.ndigits, batch))
    return scalar_mult_fast(scalars.reshape(points.x.shape), points, tile=tile)


def scalar_mult_p256(scalars, points: AffinePoint) -> AffinePoint:
    """The reference's exported symbol (lib/scalar_mult_p256.cpp:10-12)."""
    assert points.curve is P256 or points.curve.name == P256.name
    return scalar_mult(scalars, points)


def scalar_mult_fast(
    scalars, points: AffinePoint, tile: int | None = None, strict: bool = False
) -> AffinePoint:
    """Batched k_i * P_i through the fused signed-window Pallas kernel —
    the TPU fast path (~1.35x the ladder). Constant-time (masked lookups);
    see kernels/window.py for the (measure-zero) degenerate-scalar caveat.
    ``strict=True`` uses complete accumulation adds: total scalar domain
    [1, order) at ~+15% ops — safe for adversarially chosen scalars (the
    plain ladder ``scalar_mult`` remains the reference-parity alternative)."""
    from ecsimd_tpu.curves.point import JacobianPoint
    from ecsimd_tpu.kernels import ladder, window

    jg = JacobianPoint.from_affine(points)
    kwargs = {} if tile is None else {"tile": tile}
    fn = partial(window.window_mont_planes, strict=True) if strict else window.window_mont_planes
    res = ladder._run_padded(fn, scalars, jg, kwargs.get("tile", window.DEFAULT_TILE), False)
    out = res.to_affine()
    return AffinePoint(out.x, out.y, points.curve)


def scalar_mult_glv(
    scalars, points: AffinePoint, tile: int | None = None,
    strict: bool = True, interpret: bool = False,
) -> AffinePoint:
    """Batched k_i * P_i through the GLV endomorphism-split window kernel —
    the variable-base fast path for j-invariant-0 curves (secp256k1):
    k = k1 + k2*lambda with |k_i| ~ sqrt(n) halves the doubling count
    (~1.3x fewer field mults than scalar_mult_fast; kernels/glv.py).
    Derivation, decomposition and domain notes in ecsimd_tpu/glv.py.
    ``strict`` defaults True: unlike the plain window kernel the degenerate
    classes here are trivially reachable (k = lambda makes k1 = 0)."""
    from ecsimd_tpu.kernels import glv as kglv

    jg = JacobianPoint.from_affine(points)
    t = kglv.DEFAULT_TILE if tile is None else tile
    res = kglv.scalar_mult(scalars, jg, tile=t, interpret=interpret, strict=strict)
    out = res.to_affine()
    return AffinePoint(out.x, out.y, points.curve)


def scalar_mult_base(scalars, curve: CurveSpec = P256,
                     base: tuple[int, int] | None = None,
                     tile: int | None = None, strict: bool = False) -> AffinePoint:
    """Fixed-base fast path: k_i * B for a base shared by every lane (default
    the curve generator) through the comb Pallas kernel — the TPU-native
    answer to the reference's headline workload (benchs/curve_group.cpp:30-34
    multiplies G). ~4x the per-lane window kernel; tables are host-built and
    cached per (curve, base). Same degenerate-scalar caveat as the window
    path (kernels/comb.py docstring); ``strict=True`` removes it with
    complete accumulation adds — total domain [1, order) at ~2x the chain's
    field ops (still far ahead of the window path)."""
    from ecsimd_tpu.kernels import comb

    kwargs = {} if tile is None else {"tile": tile}
    res = comb.scalar_mult_base(scalars, curve, base=base, strict=strict, **kwargs)
    out = res.to_affine()
    return AffinePoint(out.x, out.y, curve)


def multi_scalar_mult(
    scalars, points: AffinePoint, tile: int | None = None,
    use_kernel: bool = True, interpret: bool = False,
) -> JacobianPoint:
    """Multi-scalar multiplication: sum_i k_i * P_i over the whole batch,
    returned as a 1-lane JacobianPoint (the sum may be the point at
    infinity, Z == 0 — callers check before to_affine). Beyond the
    reference (its 4 SIMD lanes never communicate).

    TPU-native shape: per-lane STRICT window multiplications (complete
    accumulation adds — partial-sum collisions between lanes are
    adversarially reachable in the MSM setting, so every add in sight must
    be total) followed by a log2(B) pairwise tree of complete adds
    (curves/group.batch_sum, ~1 add per lane amortized — <0.1% of the mult
    work). A Pippenger bucket method does asymptotically fewer group ops
    (~w-fold for large B) but is scatter/sort-bound — the access pattern
    TPU vector memory is worst at; the dense per-lane form keeps the VPU at
    the measured issue ceiling. Scalar domain per lane: [1, order)."""
    from ecsimd_tpu.curves.point import JacobianPoint
    from ecsimd_tpu.kernels import window

    # scalars live in [1, order): a placeholder order makes the domain
    # claim (and any caller reasoning mod n) silently wrong
    assert points.curve.order_exact, (
        f"{points.curve.name}: order is a placeholder (order_exact=False)"
    )
    jg = JacobianPoint.from_affine(points)
    if use_kernel:
        from ecsimd_tpu.kernels import glv as kglv

        t = window.DEFAULT_TILE if tile is None else tile
        # strict dispatch: GLV double-scalar kernel on capable curves
        res = kglv.strict_varbase(scalars, jg, tile=t, interpret=interpret)
    else:
        res = group.scalar_mult(scalars, jg)
    return group.batch_sum(res)


def multi_scalar_mult_ints(ks, xs, ys, curve: CurveSpec = P256, **kw):
    """Int-list MSM: returns (x, y) ints or None for the point at infinity."""
    res = multi_scalar_mult(scalars_from_ints(ks, curve), points_from_ints(xs, ys, curve), **kw)
    if not bool(np.asarray(res.z.is_zero())[0]):
        out = res.to_affine()
        return (convert.planes_to_ints(out.x)[0], convert.planes_to_ints(out.y)[0])
    return None


# --- host-friendly integer interfaces ----------------------------------------


def generator_batch(curve: CurveSpec, batch: int) -> AffinePoint:
    """The curve generator broadcast across a batch."""
    d = curve.field.ndigits
    gx = convert.broadcast_int(curve.gx, d, batch)
    gy = convert.broadcast_int(curve.gy, d, batch)
    return AffinePoint(jnp.asarray(gx), jnp.asarray(gy), curve)


def points_from_ints(xs, ys, curve: CurveSpec) -> AffinePoint:
    d = curve.field.ndigits
    return AffinePoint(
        jnp.asarray(convert.ints_to_planes(xs, d)),
        jnp.asarray(convert.ints_to_planes(ys, d)),
        curve,
    )


def scalars_from_ints(ks, curve: CurveSpec):
    return jnp.asarray(convert.ints_to_planes(ks, curve.field.ndigits))


def scalar_mult_ints(ks, xs, ys, curve: CurveSpec = P256):
    """Pure-int convenience API: returns (x, y) int lists."""
    pts = points_from_ints(xs, ys, curve)
    res = scalar_mult(scalars_from_ints(ks, curve), pts)
    return convert.planes_to_ints(res.x), convert.planes_to_ints(res.y)
