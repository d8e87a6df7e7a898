"""P-521 and Wei25519 coverage — beyond the reference (which hard-codes
P-256, curve_nist_p256.h:14-32). Both run on the generic machinery with no
curve-specific code:

- P-521: p = 2^521 - 1 stored in 33 digits (nbits = 528, the first odd digit
  count and the first curve whose order leaves 7 always-zero top bits in
  storage), a = -3, CIOS Montgomery field (the Mersenne residue 2^528 mod p
  = 2^7 is not word-aligned +-1/+-2, so the Solinas planner declines it).
- Wei25519: Curve25519 in short-Weierstrass form (generic a, CIOS field,
  odd prime-order subgroup generator; constants derived + verified in
  specs.py).

Oracle is the same Python-int co-Z implementation, cross-checked per-curve
against the independent naive double-and-add (as tests/test_p384.py does).
"""

import numpy as np
import pytest

from ecsimd_tpu import api, convert
from ecsimd_tpu.oracle import coz
from ecsimd_tpu.specs import P521, WEI25519


@pytest.mark.parametrize("curve", [P521, WEI25519], ids=lambda c: c.name)
def test_oracle_self_check(rng, curve):
    k = rng.randrange(1, curve.order)
    assert coz.scalar_mult_affine(k, curve.gx, curve.gy, curve) == \
        coz.naive_scalar_mult(k, curve.gx, curve.gy, curve)


@pytest.mark.parametrize("curve", [P521, WEI25519], ids=lambda c: c.name)
def test_scalar_mult_ladder(rng, curve):
    """Full XLA ladder, per-lane distinct scalars, both parities, a top-range
    scalar (P-521: exercises the 7 always-zero storage bits above the order)."""
    from tests.helpers import ladder_xy_host

    ks = [1, 2, 5, curve.order - 2, rng.randrange(1, curve.order)]
    want = [coz.scalar_mult_affine(k, curve.gx, curve.gy, curve) for k in ks]
    # jitted-single-step ladder: the full while-graph jit of either curve is
    # pathological on XLA:CPU (see tests/helpers.ladder_xy_host / CLAUDE.md)
    assert ladder_xy_host(ks, curve) == want


@pytest.mark.parametrize("curve", [P521, WEI25519], ids=lambda c: c.name)
def test_comb_tree(rng, curve):
    """Fixed-base comb through the eager tree twin: P-521 has npos = 66
    (the largest position count yet, odd tree levels 33 -> 17 -> 9 -> 5 ->
    3 -> 2 -> 1); Wei25519 builds Montgomery-domain tables with generic a."""
    from ecsimd_tpu.kernels import comb

    ks = [1, 2, 5, 256, curve.order - 2] + [rng.randrange(1, curve.order) for _ in range(2)]
    scalars = api.scalars_from_ints(ks, curve)
    pt = comb.scalar_mult_base(scalars, curve, use_kernel=False, chain="tree")
    p = curve.field.p
    got = []
    for X, Y, Z in zip(convert.planes_to_ints(np.asarray(pt.x.to_classical())),
                       convert.planes_to_ints(np.asarray(pt.y.to_classical())),
                       convert.planes_to_ints(np.asarray(pt.z.to_classical()))):
        zi = pow(Z, p - 2, p)
        got.append((X * zi * zi % p, Y * zi * zi * zi % p))
    assert got == [coz.scalar_mult_affine(k, curve.gx, curve.gy, curve) for k in ks]


def test_w25519_matches_rfc7748_x25519():
    """The Weierstrass model agrees with RFC 7748 X25519 through the inverse
    map u = x - A/3: k * G here must land on the u-coordinate X25519(k, 9)
    produces. Vector: RFC 7748 section 5.2's iterated test, first iteration
    k = u = 9 (clamped)."""
    p = WEI25519.field.p
    A = 486662
    a24 = (A - 2) // 4

    def x25519_ladder(k, u):  # RFC 7748 section 5, Python-int model
        x1, x2, z2, x3, z3, swap = u, 1, 0, u, 1, 0
        for t in range(254, -1, -1):
            kt = (k >> t) & 1
            swap ^= kt
            if swap:
                x2, x3 = x3, x2
                z2, z3 = z3, z2
            swap = kt
            a_ = (x2 + z2) % p
            aa = a_ * a_ % p
            b_ = (x2 - z2) % p
            bb = b_ * b_ % p
            e = (aa - bb) % p
            c_ = (x3 + z3) % p
            d_ = (x3 - z3) % p
            da = d_ * a_ % p
            cb = c_ * b_ % p
            x3 = (da + cb) % p * (da + cb) % p
            z3 = u * (da - cb) % p * (da - cb) % p
            x2 = aa * bb % p
            z2 = e * (aa + a24 * e) % p
        if swap:
            x2, x3 = x3, x2
            z2, z3 = z3, z2
        return x2 * pow(z2, p - 2, p) % p

    # clamped scalar from the RFC's iterated vector step 1 (k = encoded 9)
    kb = (9).to_bytes(32, "little")
    k = int.from_bytes(kb, "little")
    k &= ~7
    k &= ~(128 << 8 * 31)
    k |= 64 << 8 * 31
    u_want = x25519_ladder(k, 9)
    # RFC 7748 section 5.2 test vector (1 iteration)
    assert u_want == int.from_bytes(
        bytes.fromhex("422c8e7a6227d7bca1350b3e2bb7279f7897b87bb6854b783c60e80311ae3079"),
        "little",
    )
    gx, gy = coz.scalar_mult_affine(k, WEI25519.gx, WEI25519.gy, WEI25519)
    inv3 = pow(3, -1, p)
    assert (gx - A * inv3) % p == u_want


def test_p521_ecdsa_oracle(rng):
    """ECDSA round-trip on P-521 at the oracle level (n is 521 bits; the
    device sign/verify pipeline is curve-generic and covered per-plane on
    the toy curve + P-256 — interpret-mode 33-digit kernels are intractable,
    tests/test_kernels.py:1-9)."""
    from ecsimd_tpu.oracle import ecdsa as oe

    n = P521.order
    for _ in range(3):
        z, d, k = (rng.randrange(1, n) for _ in range(3))
        sig = oe.sign(z, d, k, P521)
        assert sig is not None
        r, s = sig
        qx, qy = oe.keypair(d, P521)
        assert oe.verify(z, r, s, qx, qy, P521)
        assert not oe.verify(z ^ 1, r, s, qx, qy, P521)
