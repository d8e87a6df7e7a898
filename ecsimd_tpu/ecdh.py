"""Batched ECDH key agreement — beyond the reference (which stops at the
scalar-mult primitive, ``lib/scalar_mult_p256.cpp:10-12``; ECDH is the
protocol its variable-base workload exists for, and the OpenSSL competitor
baseline in ``benchs/p256_ref.cpp`` benches exactly this shape).

Two halves, each a thin facade over the scalar-mult layers:

* ``derive_public``: Q_i = d_i * G — fixed-base, so the comb kernel
  (kernels/comb.py) applies: key generation runs at the headline rate.
* ``shared_secret``: S_i = d_i * Q_i with peer-key validation — variable
  base through the strict (complete-add, total-domain) window kernel, or
  the XLA co-Z ladder twin on hosts without Mosaic.

Validation (NIST SP 800-56A §5.6.2.3 partial public-key validation, done
batched on device): Q on the curve, Q not the point at infinity, and
coordinates canonical (< p). For prime-order curves (every curve in
specs.CURVES except WEI25519's ambient group) on-curve membership implies
subgroup membership; for cofactor > 1 curves the caller must additionally
check n*Q = infinity or use a cofactor-multiplied protocol — documented,
not silently assumed.

Scalar domain: d in [1, n-1) as everywhere in the framework (k = n-1
degenerates in the parity fixup — same as the reference ladder,
curve_group.h:214-217); the strict window path is otherwise total.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ecsimd_tpu import convert
from ecsimd_tpu.curves import group
from ecsimd_tpu.curves.point import AffinePoint, JacobianPoint
from ecsimd_tpu.ecdsa import _on_curve, order_field
from ecsimd_tpu.field import GFp
from ecsimd_tpu.ops import bignum as bn
from ecsimd_tpu.ops import mont
from ecsimd_tpu.specs import P256, CurveSpec


def _scalar_ok(ds, curve: CurveSpec):
    """1 <= d < n, lane-wise."""
    fs_n = order_field(curve)
    n_pl = mont.p_planes(fs_n, ds)
    return (1 - bn.is_zero(ds)) & bn.cmp_lt(ds, n_pl)


def validate_public(qx, qy, curve: CurveSpec):
    """Batched partial public-key validation (SP 800-56A §5.6.2.3): canonical
    coordinates, on-curve, not infinity. Returns a (B,) int32 mask."""
    fs = curve.field
    p_pl = mont.p_planes(fs, qx)
    ok = bn.cmp_lt(qx, p_pl) & bn.cmp_lt(qy, p_pl)
    qxf = GFp.from_classical(qx, fs)
    qyf = GFp.from_classical(qy, fs)
    ok = ok & _on_curve(qxf, qyf, curve)
    # (0, y) can satisfy the equation when b is a QR; infinity is not
    # representable affinely, but reject the all-zero encoding convention
    return ok & (1 - (bn.is_zero(qx) & bn.is_zero(qy)))


def derive_public_planes(
    ds, curve: CurveSpec, tile: int | None = None, use_kernel: bool = True,
    interpret: bool = False,
):
    """Q_i = d_i * G on classical digit planes -> (qx, qy, ok) classical
    planes + validity mask. Fixed-base comb path (the headline kernel)."""
    from ecsimd_tpu.kernels import comb

    ok = _scalar_ok(ds, curve)
    kwargs = {} if tile is None else {"tile": tile}
    res = comb.scalar_mult_base(ds, curve, use_kernel=use_kernel,
                                interpret=interpret, **kwargs)
    out = res.to_affine()
    return out.x, out.y, ok


def shared_secret_planes(
    ds, qx, qy, curve: CurveSpec, tile: int | None = None,
    use_kernel: bool = True, interpret: bool = False,
):
    """S_i = d_i * Q_i -> (sx, ok): the shared-secret x coordinates
    (classical planes) and the validity mask (scalar in range AND peer key
    valid). Invalid-lane inputs are steered to the generator so the kernel's
    preconditions hold; their outputs are meaningless and masked by ok."""
    from ecsimd_tpu.kernels import window

    ok = _scalar_ok(ds, curve) & validate_public(qx, qy, curve)
    d = curve.field.ndigits
    gx = jnp.asarray(convert.ints_to_planes([curve.gx], d))
    gy = jnp.asarray(convert.ints_to_planes([curve.gy], d))
    qx = bn.select(ok, qx, jnp.broadcast_to(gx, qx.shape))
    qy = bn.select(ok, qy, jnp.broadcast_to(gy, qy.shape))
    one = jnp.zeros_like(ds).at[0].set(1)
    dss = bn.select(ok, ds, one)

    jq = JacobianPoint.from_affine(AffinePoint(qx, qy, curve))
    if use_kernel:
        from ecsimd_tpu.kernels import glv as kglv

        t = window.DEFAULT_TILE if tile is None else tile
        # GLV routing on capable curves (secp256k1), strict window otherwise
        res = kglv.strict_varbase(dss, jq, tile=t, interpret=interpret)
    else:
        res = group.scalar_mult(dss, jq)
    out = res.to_affine()
    return out.x, ok


def derive_public_ints(ds, curve: CurveSpec = P256, **kw):
    """Int-list key generation: [d_i] -> ([qx_i], [qy_i]). Raises on any
    out-of-range scalar."""
    d = curve.field.ndigits
    qx, qy, ok = derive_public_planes(
        jnp.asarray(convert.ints_to_planes(ds, d)), curve, **kw
    )
    assert np.asarray(ok).all(), "private key out of [1, n)"
    return convert.planes_to_ints(np.asarray(qx)), convert.planes_to_ints(np.asarray(qy))


def shared_secret_ints(ds, qxs, qys, curve: CurveSpec = P256, **kw):
    """Int-list ECDH: returns ([sx_i or None], [ok_i]) — None where the
    scalar or peer key failed validation."""
    d = curve.field.ndigits
    pl = [jnp.asarray(convert.ints_to_planes(v, d)) for v in (ds, qxs, qys)]
    sx, ok = shared_secret_planes(*pl, curve, **kw)
    oks = [bool(v) for v in np.asarray(ok)]
    xs = convert.planes_to_ints(np.asarray(sx))
    return [x if o else None for x, o in zip(xs, oks)], oks
