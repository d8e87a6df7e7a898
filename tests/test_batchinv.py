"""GFp.batch_inverse — Montgomery-trick batch inversion differential tests.

The reference pays a per-element Fermat power for every inversion
(gfp.h:42-44); batch_inverse amortizes ONE Fermat chain over the whole batch
(~3 mults/lane). These tests pin it bit-exactly to Python pow(x, -1, p)
across every reduction strategy, batch shapes (odd, 1, power-of-two),
zero-lane handling, and the to_affine / ECDSA epilogue call sites.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from ecsimd_tpu import convert
from ecsimd_tpu.field import GFp
from ecsimd_tpu.specs import P256, P256_FIELD, SECP256K1_FIELD, W25519_FIELD

from tests.toy import GOLDILOCKS, MONT64


def _planes(vals, fs):
    return jnp.asarray(convert.ints_to_planes(vals, fs.ndigits))


def _check(vals, fs):
    a = GFp.from_classical(_planes(vals, fs), fs)
    inv = a.batch_inverse()
    got = convert.planes_to_ints(np.asarray(inv.to_classical()))
    want = [pow(v, -1, fs.p) if v % fs.p else 0 for v in vals]
    assert got == want


@pytest.mark.parametrize(
    "fs", [P256_FIELD, SECP256K1_FIELD, W25519_FIELD, GOLDILOCKS, MONT64],
    ids=lambda f: f.name,
)
def test_batch_inverse_matches_pow(fs):
    rng = random.Random(1234)
    vals = [rng.randrange(1, fs.p) for _ in range(13)]  # odd batch
    vals[3] = 0  # inverse(0) == 0 contract
    vals[7] = fs.p - 1
    vals[8] = 1
    _check(vals, fs)


def test_batch_inverse_shapes():
    fs = GOLDILOCKS
    rng = random.Random(99)
    for b in (1, 2, 3, 8, 17):
        _check([rng.randrange(1, fs.p) for _ in range(b)], fs)


def test_batch_inverse_all_zero():
    _check([0, 0, 0, 0], GOLDILOCKS)


def test_batch_inverse_order_field():
    """The GF(n) Montgomery field ECDSA's kinv/w epilogues invert in."""
    from ecsimd_tpu.ecdsa import order_field

    fs_n = order_field(P256)
    rng = random.Random(7)
    _check([rng.randrange(1, fs_n.p) for _ in range(9)] + [0], fs_n)


def test_batch_inverse_multidim_batch():
    fs = GOLDILOCKS
    rng = random.Random(5)
    vals = [rng.randrange(1, fs.p) for _ in range(6)]
    pl = _planes(vals, fs).reshape(fs.ndigits, 2, 3)
    inv = GFp.from_classical(pl, fs).batch_inverse()
    got = convert.planes_to_ints(
        np.asarray(inv.to_classical()).reshape(fs.ndigits, 6)
    )
    assert got == [pow(v, -1, fs.p) for v in vals]


def test_to_affine_batch_inv_matches_per_lane():
    """to_affine default (batch) vs per-lane Fermat path, incl. an
    infinity lane (z == 0 -> (0, 0))."""
    from ecsimd_tpu.curves.point import AffinePoint, JacobianPoint
    from tests.toy import TOY64E

    curve = TOY64E
    fs = curve.field
    rng = random.Random(21)
    ks = [rng.randrange(1, curve.order) for _ in range(5)]
    g = AffinePoint(
        _planes([curve.gx] * 5, fs), _planes([curve.gy] * 5, fs), curve
    )
    from ecsimd_tpu.curves import group

    res = group.scalar_mult(_planes(ks, fs), JacobianPoint.from_affine(g))
    # zero lane 2's z -> infinity
    z0 = GFp(res.z.planes.at[:, 2].set(0), fs)
    res = JacobianPoint(res.x, res.y, z0, curve)
    fast = res.to_affine()
    slow = res.to_affine(batch_inv=False)
    np.testing.assert_array_equal(np.asarray(fast.x), np.asarray(slow.x))
    np.testing.assert_array_equal(np.asarray(fast.y), np.asarray(slow.y))
    assert convert.planes_to_ints(np.asarray(fast.x))[2] == 0
    assert convert.planes_to_ints(np.asarray(fast.y))[2] == 0
