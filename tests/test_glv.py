"""GLV endomorphism decomposition + double-scalar window kernel
(ecsimd_tpu/glv.py, kernels/glv.py).

No reference counterpart (P-256 has no efficient endomorphism). Coverage:
derivation invariants (secp256k1's well-known constants reproduced from
scratch), device split vs host split bit-exact, end-to-end XLA twin vs the
naive oracle on the 2-digit TOYGLV curve (strict and plain chains,
adversarial scalars incl. k = lambda where k1 = 0), and trace-time gating.
The d = 16 Mosaic kernel is covered on hardware (scripts/check_tpu_kats.py
secp256k1:glv cell + scripts/glv_ab.py)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from ecsimd_tpu import api, convert, glv
from ecsimd_tpu.curves.point import JacobianPoint
from ecsimd_tpu.oracle import coz
from ecsimd_tpu.specs import P256, SECP256K1
from tests.toy import TOYGLV


def test_params_secp256k1_derivation():
    """The from-scratch derivation must land on secp256k1's well-known GLV
    constants (SEC 2 / libsecp256k1) — an external cross-check that the
    cube-root pairing and EEA basis are right."""
    pp = glv.glv_params(SECP256K1)
    assert pp.beta == 0x7AE96A2B657C07106E64479EAC3434E99CF0497512F58995C1396C28719501EE
    assert pp.lam == 0x5363AD4CC05C30E0A5261C028812645A122E22EA20816678DF02967C1B23BD72
    assert pp.a1 == 0x3086D221A7D46BCDE86C90E49284EB15
    assert pp.b1 == -0xE4437ED6010E88286F547FA90ABFE4C3
    assert pp.b2 == pp.a1
    p, n = SECP256K1.p, SECP256K1.order
    assert pow(pp.beta, 3, p) == 1 and pow(pp.lam, 3, n) == 1
    assert (pp.a1 + pp.b1 * pp.lam) % n == 0
    assert (pp.a2 + pp.b2 * pp.lam) % n == 0


@pytest.mark.parametrize("curve", [SECP256K1, TOYGLV], ids=lambda c: c.name)
def test_split_device_matches_host(curve, rng):
    pp = glv.glv_params(curve)
    n = curve.order
    d = curve.field.ndigits
    ks = [1, 2, pp.lam, pp.lam - 1, pp.lam + 1, n - 1, n - 2] + [
        rng.randrange(1, n) for _ in range(9)
    ]
    pl = jnp.asarray(convert.ints_to_planes(ks, d))
    k1, k2, n1, n2 = glv.split_planes(pl, curve)
    k1h = convert.planes_to_ints(np.asarray(k1))
    k2h = convert.planes_to_ints(np.asarray(k2))
    for k, a, b, s1, s2 in zip(ks, k1h, k2h, np.asarray(n1), np.asarray(n2)):
        wa, ws1, wb, ws2 = glv.split_int(k, pp, n)
        assert (a, bool(s1), b, bool(s2)) == (wa, ws1, wb, ws2)
        v = ((-a if s1 else a) + ((-b if s2 else b) * pp.lam)) % n
        assert v == k
        assert max(a, b).bit_length() <= pp.max_half_bits <= 16 * pp.dk - 1


@pytest.mark.parametrize("strict", [True, False], ids=["strict", "plain"])
def test_toyglv_end_to_end(strict, rng):
    """Full GLV scalar mult through the XLA twin vs the naive double-and-add
    oracle. strict covers the adversarial corners (k = lambda makes k1 = 0,
    k = n - 1); the plain chain gets random scalars only (its documented
    domain)."""
    curve = TOYGLV
    pp = glv.glv_params(curve)
    n = curve.order
    if strict:
        ks = [1, 2, pp.lam, n - 1, n - 2, (n - 1) // 2] + [
            rng.randrange(1, n) for _ in range(6)
        ]
    else:
        ks = [rng.randrange(1, n) for _ in range(8)]
    pts = api.generator_batch(curve, len(ks))
    res = api.scalar_mult_glv(
        jnp.asarray(convert.ints_to_planes(ks, curve.field.ndigits)),
        pts, strict=strict, interpret=True,
    )
    got = list(zip(convert.planes_to_ints(np.asarray(res.x)),
                   convert.planes_to_ints(np.asarray(res.y))))
    want = [coz.naive_scalar_mult(k, curve.gx, curve.gy, curve) for k in ks]
    assert got == want


def test_toyglv_distinct_points(rng):
    """Per-lane distinct base points (the variable-base contract)."""
    curve = TOYGLV
    n = curve.order
    base = [coz.naive_scalar_mult(e, curve.gx, curve.gy, curve)
            for e in range(2, 8)]
    ks = [rng.randrange(1, n) for _ in range(6)]
    pts = api.points_from_ints([x for x, _ in base], [y for _, y in base], curve)
    res = api.scalar_mult_glv(
        jnp.asarray(convert.ints_to_planes(ks, curve.field.ndigits)),
        pts, strict=True, interpret=True,
    )
    got = list(zip(convert.planes_to_ints(np.asarray(res.x)),
                   convert.planes_to_ints(np.asarray(res.y))))
    want = [coz.naive_scalar_mult(k, bx, by, curve)
            for k, (bx, by) in zip(ks, base)]
    assert got == want


def test_glv_gating():
    """Non-GLV curves must be rejected at trace time."""
    with pytest.raises(AssertionError, match="j-invariant"):
        glv.glv_params(P256)
    from tests.toy import TOYA5  # a != 0, placeholder order

    with pytest.raises(AssertionError):
        glv.glv_params(TOYA5)


def test_verify_glv_routing(rng):
    """ecdsa.verify auto-routes through the GLV kernel on capable curves:
    valid + tampered signatures on TOYGLV (strict default and fast paths),
    and glv=False still works (the plain strict-window route)."""
    import hashlib

    from ecsimd_tpu import ecdsa
    from ecsimd_tpu.oracle import ecdsa as oecdsa

    curve = TOYGLV
    n = curve.order
    d = curve.field.ndigits
    zs, rs, ss, qxs, qys = [], [], [], [], []
    for i in range(6):
        dk = rng.randrange(1, n)
        qx, qy = oecdsa.keypair(dk, curve)
        z = rng.randrange(0, 1 << 32)
        sig = None
        while sig is None:
            sig = oecdsa.sign(z, dk, rng.randrange(1, n), curve)
        r, s = sig
        zs.append(z); rs.append(r); ss.append(s); qxs.append(qx); qys.append(qy)
    rs[2] = (rs[2] + 1) % n or 1
    pl = [jnp.asarray(convert.ints_to_planes(v, d))
          for v in (zs, rs, ss, qxs, qys)]
    expect = [True, True, False, True, True, True]
    for kw in ({}, {"allow_fast_paths": True}, {"glv": False}):
        ok = ecdsa.verify_planes(*pl, curve, tile=8, interpret=True, **kw)
        assert [bool(v) for v in np.asarray(ok)] == expect, kw


def test_ecdh_and_msm_glv_routing(rng):
    """ECDH shared_secret and MSM route their strict mults through the GLV
    kernel on capable curves (kernels/glv.strict_varbase) — results bit-
    exact vs the naive oracle on TOYGLV."""
    from ecsimd_tpu import ecdh

    curve = TOYGLV
    n = curve.order
    d = curve.field.ndigits
    ds = [rng.randrange(1, n) for _ in range(4)]
    peers = [coz.naive_scalar_mult(e, curve.gx, curve.gy, curve)
             for e in range(3, 7)]
    dpl = jnp.asarray(convert.ints_to_planes(ds, d))
    qx = jnp.asarray(convert.ints_to_planes([x for x, _ in peers], d))
    qy = jnp.asarray(convert.ints_to_planes([y for _, y in peers], d))
    sx, ok = ecdh.shared_secret_planes(dpl, qx, qy, curve, tile=4,
                                       interpret=True)
    assert np.asarray(ok).all()
    got = convert.planes_to_ints(np.asarray(sx))
    want = [coz.naive_scalar_mult(k, bx, by, curve)[0]
            for k, (bx, by) in zip(ds, peers)]
    assert got == want

    ks = [rng.randrange(1, n) for _ in range(4)]
    pts = api.points_from_ints([x for x, _ in peers], [y for _, y in peers],
                               curve)
    res = api.multi_scalar_mult(
        jnp.asarray(convert.ints_to_planes(ks, d)), pts, tile=4,
        interpret=True)
    # host expectation via int adds
    from ecsimd_tpu.oracle.window import _jac_add
    acc = None
    for k, (bx, by) in zip(ks, peers):
        q = coz.naive_scalar_mult(k, bx, by, curve)
        j = (q[0], q[1], 1)
        acc = j if acc is None else _jac_add(acc, j, curve)
    wx = coz.jacobian_to_affine(acc, curve)
    gx = convert.planes_to_ints(np.asarray(res.to_affine().x))[0]
    gy = convert.planes_to_ints(np.asarray(res.to_affine().y))[0]
    assert (gx, gy) == wx
