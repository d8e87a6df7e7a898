"""Validate the Python-int oracle against the reference's known-answer vectors.

This is build-plan step 1 (SURVEY.md section 7): the oracle must reproduce every
KAT from /root/reference/tests before any TPU kernel is written against it.
"""

import pytest

import vectors as V
from ecsimd_tpu import specs
from ecsimd_tpu.oracle import coz, field

K1 = specs.SECP256K1_FIELD
P256 = specs.P256


def test_reference_prime_matches():
    assert K1.p == V.MGRY_P
    assert P256.field.p == specs.P256_FIELD.p


def test_mont_from_to_roundtrip():
    for x in V.MGRY_FROMTO:
        m = field.mont_from_classical(x, K1)
        assert field.mont_to_classical(m, K1) == x % K1.p


def test_mont_reduce_pairs():
    # mont_reduce(a*b) == a*b*R^-1 mod p (differential contract, tests/mgry.cpp:52-76)
    for a, b in V.MGRY_REDUCE_PAIRS:
        assert field.mont_reduce(a * b, K1) == (a * b * K1.R_inv) % K1.p


def test_mont_ops_vectors():
    ma = field.mont_from_classical(V.MGRY_OPS_A, K1)
    mb = field.mont_from_classical(V.MGRY_OPS_B, K1)
    assert field.mont_to_classical(field.mont_add(ma, mb, K1), K1) == V.MGRY_OPS_ADD
    assert field.mont_to_classical(field.mont_sub(ma, mb, K1), K1) == V.MGRY_OPS_SUB_AB
    assert field.mont_to_classical(field.mont_sub(mb, ma, K1), K1) == V.MGRY_OPS_SUB_BA
    for e, expected in V.MGRY_OPS_POW:
        assert field.mont_to_classical(field.mont_pow(ma, e, K1), K1) == expected


def test_gfp_inverse_sqrt_opposite():
    ma = field.mont_from_classical(V.GFP_INV_IN, K1)
    assert field.mont_to_classical(field.mont_inverse(ma, K1), K1) == V.GFP_INV_OUT

    ms = field.mont_from_classical(V.GFP_SQRT_IN, K1)
    r = field.mont_sqrt(ms, K1)
    assert r is not None
    assert field.mont_to_classical(r, K1) == V.GFP_SQRT_OUT

    assert field.mont_add(ms, field.mont_opposite(ms, K1), K1) == 0


def test_mont_sqrt_nonresidue_returns_none():
    # 3 is a non-residue mod secp256k1 p iff sqrt fails the square-back check.
    x = 5  # pick by search below
    for x in range(2, 50):
        m = field.mont_from_classical(x, K1)
        r = field.mont_sqrt(m, K1)
        if r is None:
            return
    pytest.fail("no non-residue found in range (impossible)")


G = (P256.gx, P256.gy, 1)


def test_dblu_matches_2g():
    dbl, upd = coz.dblu(G, P256)
    assert coz.jacobian_to_affine(dbl, P256) == (V.G2_X, V.G2_Y)
    # co-Z update preserves the original point's value (tests/curve_group.cpp:44-45)
    assert coz.jacobian_to_affine(upd, P256) == (P256.gx, P256.gy)
    assert dbl[2] == upd[2]


def test_zaddu_and_tplu_match_3g():
    dbl, g1 = coz.dblu(G, P256)
    s, g2 = coz.zaddu(g1, dbl, P256)
    assert coz.jacobian_to_affine(s, P256) == (V.G3_X, V.G3_Y)
    assert coz.jacobian_to_affine(g2, P256) == (P256.gx, P256.gy)
    t, _ = coz.tplu(G, P256)
    assert coz.jacobian_to_affine(t, P256) == (V.G3_X, V.G3_Y)


def test_zdau_matches_5g():
    dbl, g1 = coz.dblu(G, P256)
    r, _ = coz.zdau(dbl, g1, P256)
    assert coz.jacobian_to_affine(r, P256) == (V.G5_X, V.G5_Y)


def test_add_z2_1():
    # 2G + G with Z2 = 1 must give 3G
    dbl, _ = coz.dblu(G, P256)
    s = coz.add_z2_1(dbl, G, P256)
    assert coz.jacobian_to_affine(s, P256) == (V.G3_X, V.G3_Y)


def test_scalar_mult_kats():
    for k, x, y in V.SCALAR_MULT_KATS:
        assert coz.scalar_mult_affine(k, P256.gx, P256.gy, P256) == (x, y)


def test_scalar_mult_vs_naive_double_and_add(rng):
    for _ in range(12):
        k = rng.randrange(1, P256.order)
        got = coz.scalar_mult_affine(k, P256.gx, P256.gy, P256)
        want = coz.naive_scalar_mult(k, P256.gx, P256.gy, P256)
        assert got == want


def test_scalar_mult_even_and_small_scalars():
    for k in [2, 3, 4, 6, 7, 8, 16, 255, 256, 2**255 - 19]:
        got = coz.scalar_mult_affine(k, P256.gx, P256.gy, P256)
        want = coz.naive_scalar_mult(k, P256.gx, P256.gy, P256)
        assert got == want, k


def test_scalar_mult_p384(rng):
    c = specs.P384
    for _ in range(3):
        k = rng.randrange(1, c.order)
        got = coz.scalar_mult_affine(k, c.gx, c.gy, c)
        want = coz.naive_scalar_mult(k, c.gx, c.gy, c)
        assert got == want


def test_compute_y_from_x():
    # y^2 = x^3 - 3x + b; decompression KAT (tests/curve_point.cpp:22-26)
    f = P256.field
    x = V.FROMX_X
    rhs = (pow(x, 3, f.p) + P256.a * x + P256.b) % f.p
    m = field.mont_from_classical(rhs, f)
    y = field.mont_sqrt(m, f)
    assert y is not None
    assert field.mont_to_classical(y, f) == V.FROMX_Y
