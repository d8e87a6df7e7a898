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


def test_window_kernel_declines_non_am3():
    from ecsimd_tpu.kernels import window
    from ecsimd_tpu.kernels.digits import VGFp
    import jax.numpy as jnp

    d = SECP256K1.field.ndigits
    z = [jnp.zeros((1, 1), jnp.int32)] * d
    with pytest.raises(AssertionError, match="a = -3"):
        window._window_core(lambda dig: z[0], VGFp(z, SECP256K1.field),
                            VGFp(z, SECP256K1.field), SECP256K1)
