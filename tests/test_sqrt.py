"""GFp.sqrt beyond p = 3 (mod 4) — Atkin (p = 5 mod 8) and Tonelli-Shanks.

The reference's sqrt static_asserts p = 3 (mod 4) (gfp.h:84-87); the
framework dispatches on FieldSpec.sqrt_kind and covers every odd prime.
Differential vs the host oracle (oracle/field.mont_sqrt, itself verified by
squaring) and Python pow.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from ecsimd_tpu import convert
from ecsimd_tpu.field import GFp
from ecsimd_tpu.oracle import field as ofield
from ecsimd_tpu.specs import W25519_FIELD

from tests.toy import TS64


def _device_sqrt(vals, fs):
    pl = jnp.asarray(convert.ints_to_planes(vals, fs.ndigits))
    r, ok = GFp.from_classical(pl, fs).sqrt()
    roots = convert.planes_to_ints(np.asarray(r.to_classical()))
    return roots, [bool(v) for v in np.asarray(ok)]


@pytest.mark.parametrize("fs", [W25519_FIELD, TS64], ids=lambda f: f.name)
def test_sqrt_differential(fs):
    rng = random.Random(42)
    p = fs.p
    squares = [pow(rng.randrange(1, p), 2, p) for _ in range(5)]
    nonres = []
    while len(nonres) < 3:
        v = rng.randrange(2, p)
        if pow(v, (p - 1) // 2, p) == p - 1:
            nonres.append(v)
    vals = squares + nonres + [0, 1]
    roots, ok = _device_sqrt(vals, fs)
    for v, r, o in zip(vals, roots, ok):
        if v == 0:
            assert o and r == 0
        elif pow(v, (p - 1) // 2, p) == 1:
            assert o and r * r % p == v
        else:
            assert not o
        # oracle agreement (same root branch, not just a valid root)
        want = ofield.mont_sqrt(ofield.mont_from_classical(v, fs), fs)
        if o:
            assert ofield.mont_to_classical(want, fs) == r
        else:
            assert want is None


def test_sqrt_kinds():
    assert W25519_FIELD.sqrt_kind == "p5mod8"
    assert TS64.sqrt_kind == "tonelli"
    m1 = W25519_FIELD.sqrt_m1
    assert m1 * m1 % W25519_FIELD.p == W25519_FIELD.p - 1
    q, s, c = TS64.ts_params
    assert q * (1 << s) == TS64.p - 1 and q % 2 == 1 and s == 5


def test_affine_from_x_wei25519():
    """Point decompression on Wei25519 (was impossible before r5): from_x
    on generator multiples recovers +-y."""
    from ecsimd_tpu.curves import group
    from ecsimd_tpu.oracle import coz
    from ecsimd_tpu.specs import WEI25519

    rng = random.Random(7)
    pts = [coz.scalar_mult_affine(rng.randrange(1, WEI25519.order),
                                  WEI25519.gx, WEI25519.gy, WEI25519)
           for _ in range(3)]
    d = WEI25519.field.ndigits
    xpl = jnp.asarray(convert.ints_to_planes([x for x, _ in pts], d))
    dec, ok = group.affine_from_x(xpl, WEI25519)
    assert np.asarray(ok).all()
    p = WEI25519.p
    ys = convert.planes_to_ints(np.asarray(dec.y))
    for (x, y), yd in zip(pts, ys):
        assert yd in (y, p - y)
