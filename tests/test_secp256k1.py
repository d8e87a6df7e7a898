"""secp256k1 coverage — beyond the reference, which uses this prime only in
its Montgomery-arithmetic tests (tests/mgry.cpp:26): the generic-a co-Z group
law (a = 0 here) plus the CIOS Montgomery field path give the full curve.
The a = -3 fast paths (window/comb kernels) decline it at trace time."""

import pytest

from ecsimd_tpu import api, convert
from ecsimd_tpu.oracle import coz
from ecsimd_tpu.specs import SECP256K1


def test_oracle_self_check(rng):
    k = rng.randrange(1, SECP256K1.order)
    assert coz.scalar_mult_affine(k, SECP256K1.gx, SECP256K1.gy, SECP256K1) == \
        coz.naive_scalar_mult(k, SECP256K1.gx, SECP256K1.gy, SECP256K1)


def test_secp256k1_known_multiples():
    # 2G, verified against the curve equation and the naive oracle
    x2, y2 = coz.naive_scalar_mult(2, SECP256K1.gx, SECP256K1.gy, SECP256K1)
    p = SECP256K1.p
    assert (y2 * y2 - (x2**3 + 7)) % p == 0


def test_secp256k1_scalar_mult(rng):
    """Full ladder through the Montgomery-reduction XLA path, per-lane
    distinct scalars, both parities."""
    ks = [1, 2, 5, rng.randrange(1, SECP256K1.order)]
    g = api.generator_batch(SECP256K1, len(ks))
    got = api.scalar_mult(api.scalars_from_ints(ks, SECP256K1), g)
    want = [coz.scalar_mult_affine(k, SECP256K1.gx, SECP256K1.gy, SECP256K1) for k in ks]
    assert list(zip(convert.planes_to_ints(got.x), convert.planes_to_ints(got.y))) == want


def test_window_general_a_toy(rng):
    """Window path on an a != -3 curve (the secp256k1 shape) via the
    general-a doubling dispatch — toy Montgomery field, eager twin."""
    import jax.numpy as jnp
    import numpy as np

    from ecsimd_tpu.curves.point import AffinePoint, JacobianPoint
    from ecsimd_tpu.kernels import window
    from tests.toy import TOYA5

    fs = TOYA5.field
    d = fs.ndigits
    ks = [1, 2, 5, 6, 255, rng.randrange(1, 1 << 63)]
    xs = jnp.asarray(convert.broadcast_int(TOYA5.gx, d, len(ks)))
    ys = jnp.asarray(convert.broadcast_int(TOYA5.gy, d, len(ks)))
    jg = JacobianPoint.from_affine(AffinePoint(xs, ys, TOYA5))
    scalars = jnp.asarray(convert.ints_to_planes(ks, d))
    ax, ay, z = window.window_xla_planes(scalars, jg.x.planes, jg.y.planes, TOYA5)
    p = fs.p
    R_inv = pow(fs.R, p - 2, p)
    got = []
    for X, Y, Z in zip(convert.planes_to_ints(np.asarray(ax)),
                       convert.planes_to_ints(np.asarray(ay)),
                       convert.planes_to_ints(np.asarray(z))):
        X, Y, Z = X * R_inv % p, Y * R_inv % p, Z * R_inv % p
        zi = pow(Z, p - 2, p)
        got.append((X * zi * zi % p, Y * zi * zi * zi % p))
    assert got == [coz.scalar_mult_affine(k, TOYA5.gx, TOYA5.gy, TOYA5) for k in ks]
