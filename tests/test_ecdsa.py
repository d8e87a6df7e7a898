"""Batched ECDSA (ecsimd_tpu/ecdsa.py) — oracle, differential, device paths.

Correctness stack:
1. Python-int oracle self-consistency + tamper rejection (P-256 + toy).
2. Differential vs the independent `cryptography` (OpenSSL) implementation
   on P-256: our oracle verifies OpenSSL signatures and vice versa.
3. Device pipeline end-to-end on the toy curve (interpret-mode kernels):
   verify_planes (strict window path + comb fast path) and sign_planes,
   per-lane-distinct inputs, adversarial/edge lanes in the same batch.
4. jac_add_complete / jac_dbl XLA-dialect unit tests vs the oracle,
   including the degenerate operand classes they exist to resolve.
"""

import hashlib
import secrets

import jax.numpy as jnp
import numpy as np
import pytest

from ecsimd_tpu import convert, ecdsa
from ecsimd_tpu.oracle import coz
from ecsimd_tpu.oracle import ecdsa as oecdsa
from ecsimd_tpu.specs import P256
from tests.toy import TOY64E


def _sign_ok(z, d, curve, rng):
    """Oracle-sign with retries (r == 0 / s == 0 are ~2^-bits)."""
    while True:
        k = rng.randrange(1, curve.order)
        sig = oecdsa.sign(z, d, k, curve)
        if sig:
            return sig


def test_oracle_roundtrip(rng):
    for curve in (TOY64E, P256):
        for _ in range(4):
            d = rng.randrange(1, curve.order)
            qx, qy = oecdsa.keypair(d, curve)
            z = rng.randrange(0, 1 << curve.field.nbits)
            r, s = _sign_ok(z, d, curve, rng)
            assert oecdsa.verify(z, r, s, qx, qy, curve)
            # tampering: each field flipped independently must fail
            assert not oecdsa.verify(z ^ 1, r, s, qx, qy, curve)
            assert not oecdsa.verify(z, r ^ 1, s, qx, qy, curve)
            assert not oecdsa.verify(z, r, s ^ 1, qx, qy, curve)
            d2 = rng.randrange(1, curve.order)
            if d2 != d:
                q2 = oecdsa.keypair(d2, curve)
                assert not oecdsa.verify(z, r, s, q2[0], q2[1], curve)


def test_oracle_range_rejection(rng):
    d = rng.randrange(1, TOY64E.order)
    qx, qy = oecdsa.keypair(d, TOY64E)
    z = rng.randrange(0, 1 << 64)
    r, s = _sign_ok(z, d, TOY64E, rng)
    n = TOY64E.order
    for bad_r, bad_s in ((0, s), (n, s), (r, 0), (r, n)):
        assert not oecdsa.verify(z, bad_r, bad_s, qx, qy, TOY64E)


def test_oracle_zero_hash(rng):
    """e == 0 mod n (u1 == 0): R = u2*Q alone — a valid signature class."""
    d = rng.randrange(1, TOY64E.order)
    qx, qy = oecdsa.keypair(d, TOY64E)
    r, s = _sign_ok(0, d, TOY64E, rng)
    assert oecdsa.verify(0, r, s, qx, qy, TOY64E)


def test_differential_vs_cryptography(rng):
    """Cross-check against OpenSSL (via `cryptography`) on P-256: their
    signatures verify under our oracle, ours under theirs — the analogue of
    the reference benching against OpenSSL (benchs/p256_ref.cpp:100), raised
    to a correctness contract."""
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import ec
    from cryptography.hazmat.primitives.asymmetric.utils import (
        Prehashed, decode_dss_signature, encode_dss_signature,
    )

    for _ in range(4):
        dpriv = rng.randrange(1, P256.order)
        key = ec.derive_private_key(dpriv, ec.SECP256R1())
        pub = key.public_key().public_numbers()
        qx, qy = pub.x, pub.y
        assert (qx, qy) == oecdsa.keypair(dpriv, P256)  # key derivation agrees
        msg = secrets.token_bytes(32)
        digest = hashlib.sha256(msg).digest()
        z = int.from_bytes(digest, "big")

        # theirs -> our oracle
        der = key.sign(digest, ec.ECDSA(Prehashed(hashes.SHA256())))
        r, s = decode_dss_signature(der)
        assert oecdsa.verify(z, r, s, qx, qy, P256)
        assert not oecdsa.verify(z ^ 2, r, s, qx, qy, P256)

        # ours -> theirs
        r2, s2 = _sign_ok(z, dpriv, P256, rng)
        key.public_key().verify(
            encode_dss_signature(r2, s2), digest, ec.ECDSA(Prehashed(hashes.SHA256()))
        )  # raises InvalidSignature on failure


def _planes(vals, curve):
    return jnp.asarray(convert.ints_to_planes(vals, curve.field.ndigits))


def _toy_batch(rng, lanes=16):
    """Per-lane-distinct keys/hashes/signatures on the toy curve."""
    curve = TOY64E
    ds = [rng.randrange(1, curve.order) for _ in range(lanes)]
    qs = [oecdsa.keypair(d, curve) for d in ds]
    zs = [rng.randrange(0, 1 << 64) for _ in range(lanes)]
    zs[0] = 0  # u1 == 0 lane in-batch
    sigs = [_sign_ok(z, d, curve, rng) for z, d in zip(zs, ds)]
    return ds, qs, zs, sigs


@pytest.mark.parametrize("fast", [False, True])
def test_verify_planes_toy(rng, fast):
    """Device verify pipeline end-to-end (interpret kernels), strict and
    fast-path variants, valid + tampered + malformed lanes in ONE batch."""
    curve = TOY64E
    ds, qs, zs, sigs = _toy_batch(rng)
    rs = [r for r, _ in sigs]
    ss = [s for _, s in sigs]
    n = curve.order
    # lanes 8..15 corrupted in distinct ways; 0..7 stay valid
    zs[8] ^= 1
    rs[9] ^= 1
    ss[10] ^= 1
    rs[11] = 0
    ss[12] = 0
    rs[13] = n  # out of range
    qs[14] = (qs[14][0], (qs[14][1] + 1) % curve.p)  # off-curve Q
    ss[15] = (-pow(1, 1) * ss[15]) % n  # s -> n - s: forges the OTHER parity
    want = [oecdsa.verify(z, r, s, qx, qy, curve)
            for z, r, s, (qx, qy) in zip(zs, rs, ss, qs)]
    assert want[:8] == [True] * 8 and want[8:15] == [False] * 7
    got = ecdsa.verify_planes(
        _planes(zs, curve), _planes(rs, curve), _planes(ss, curve),
        _planes([q[0] for q in qs], curve), _planes([q[1] for q in qs], curve),
        curve, tile=16, interpret=True, allow_fast_paths=fast,
    )
    assert [bool(v) for v in np.asarray(got)] == want


def test_sign_planes_toy(rng):
    """Device signing through the comb kernel (interpret), verified lane by
    lane with the oracle — including that s matches the closed form."""
    curve = TOY64E
    lanes = 16
    ds = [rng.randrange(1, curve.order) for _ in range(lanes)]
    zs = [rng.randrange(0, 1 << 64) for _ in range(lanes)]
    ks = [rng.randrange(1, curve.order) for _ in range(lanes)]
    r, s, ok = ecdsa.sign_planes(
        _planes(zs, curve), _planes(ds, curve), _planes(ks, curve),
        curve, tile=16, interpret=True,
    )
    rs = convert.planes_to_ints(np.asarray(r))
    ss = convert.planes_to_ints(np.asarray(s))
    oks = [bool(v) for v in np.asarray(ok)]
    for i in range(lanes):
        want = oecdsa.sign(zs[i], ds[i], ks[i], curve)
        if want is None:
            assert not oks[i]
            continue
        assert oks[i] and (rs[i], ss[i]) == want
        qx, qy = oecdsa.keypair(ds[i], curve)
        assert oecdsa.verify(zs[i], rs[i], ss[i], qx, qy, curve)


def test_sign_ints_verify_ints_toy(rng):
    """Host int convenience API round trip on the toy curve."""
    curve = TOY64E
    ds = [rng.randrange(1, curve.order) for _ in range(8)]
    zs = [rng.randrange(0, 1 << 64) for _ in range(8)]
    rs, ss = ecdsa.sign_ints(zs, ds, curve, tile=8, interpret=True)
    qs = [oecdsa.keypair(d, curve) for d in ds]
    got = ecdsa.verify_ints(
        zs, rs, ss, [q[0] for q in qs], [q[1] for q in qs], curve,
        tile=8, interpret=True,
    )
    assert got == [True] * 8


def test_jac_add_complete_degenerate(rng):
    """XLA complete add vs oracle on every operand class in one batch:
    generic, P == Q (doubling), P == -Q (infinity), P1 == inf, P2 == inf."""
    from ecsimd_tpu.curves.point import JacobianPoint
    from ecsimd_tpu.curves import group
    from ecsimd_tpu.field import GFp
    from ecsimd_tpu.oracle.window import _jac_add, _jac_dbl

    curve = TOY64E
    p = curve.p
    fs = curve.field

    def rand_jac():
        k = rng.randrange(2, curve.order - 1)
        x, y = coz.scalar_mult_affine(k, curve.gx, curve.gy, curve)
        lam = rng.randrange(1, p)
        return (x * pow(lam, 4, p) % p, y * pow(lam, 6, p) % p, lam * lam % p)

    a_pts, b_pts, want = [], [], []
    for _ in range(3):  # generic
        pa, pb = rand_jac(), rand_jac()
        a_pts.append(pa), b_pts.append(pb), want.append(_jac_add(pa, pb, curve))
    pa = rand_jac()  # P == Q with different Z
    lam = rng.randrange(2, p)
    pb = (pa[0] * pow(lam, 2, p) % p, pa[1] * pow(lam, 3, p) % p, pa[2] * lam % p)
    a_pts.append(pa), b_pts.append(pb), want.append(_jac_dbl(pa, curve))
    pa = rand_jac()  # P == -Q -> infinity
    pb = (pa[0], (p - pa[1]) % p, pa[2])
    a_pts.append(pa), b_pts.append(pb), want.append(None)
    pa, pb = (1, 1, 0), rand_jac()  # P1 == inf
    a_pts.append(pa), b_pts.append(pb), want.append(pb)
    pa, pb = rand_jac(), (1, 1, 0)  # P2 == inf
    a_pts.append(pa), b_pts.append(pb), want.append(pa)
    pa, pb = (1, 1, 0), (1, 1, 0)  # inf + inf
    a_pts.append(pa), b_pts.append(pb), want.append(None)

    def to_jac(pts):
        d = fs.ndigits
        return JacobianPoint(
            GFp.from_classical(_planes([q[0] for q in pts], curve), fs),
            GFp.from_classical(_planes([q[1] for q in pts], curve), fs),
            GFp.from_classical(_planes([q[2] for q in pts], curve), fs),
            curve,
        )

    res = group.jac_add_complete(to_jac(a_pts), to_jac(b_pts))
    xs = convert.planes_to_ints(np.asarray(res.x.to_classical()))
    ys = convert.planes_to_ints(np.asarray(res.y.to_classical()))
    zs = convert.planes_to_ints(np.asarray(res.z.to_classical()))
    for i, w in enumerate(want):
        if w is None:
            assert zs[i] == 0, f"lane {i}: expected infinity"
            continue
        assert zs[i] != 0
        got_aff = coz.jacobian_to_affine((xs[i], ys[i], zs[i]), curve)
        assert got_aff == coz.jacobian_to_affine(w, curve), f"lane {i}"


def test_recover_oracle_roundtrip(rng):
    """Oracle recovery: sign_recoverable -> recover returns the signing key
    for every curve shape (incl. the p = 1 mod 4 TOYGLV via Tonelli sqrt)."""
    from tests.toy import TOYGLV

    for curve in (TOY64E, TOYGLV, P256):
        n = curve.order
        for _ in range(4):
            d = rng.randrange(1, n)
            qx, qy = oecdsa.keypair(d, curve)
            z = rng.randrange(0, 1 << curve.field.nbits)
            out = None
            while out is None:
                out = oecdsa.sign_recoverable(z, d, rng.randrange(1, n), curve)
            r, s, v = out
            assert oecdsa.recover(z, r, s, v, curve) == (qx, qy)
            # the OTHER parity id recovers a DIFFERENT (or no) key
            other = oecdsa.recover(z, r, s, v ^ 1, curve)
            assert other != (qx, qy)


def test_recover_planes_toy(rng):
    """Device recovery pipeline end-to-end (interpret kernels) on both toy
    shapes: recovered keys bit-exact, wrong-parity and tampered lanes
    rejected or different."""
    from tests.toy import TOYGLV

    for curve in (TOY64E, TOYGLV):
        n = curve.order
        d = curve.field.ndigits
        lanes = 6
        zs, rs, ss, vs, want = [], [], [], [], []
        for i in range(lanes):
            dk = rng.randrange(1, n)
            q = oecdsa.keypair(dk, curve)
            z = rng.randrange(0, 1 << curve.field.nbits)
            out = None
            while out is None:
                out = oecdsa.sign_recoverable(z, dk, rng.randrange(1, n), curve)
            r, s, v = out
            zs.append(z); rs.append(r); ss.append(s); vs.append(v); want.append(q)
        # lane 3: invalid recovery id (r + n >= p for these toys since n ~ p)
        vs[3] |= 2
        import jax.numpy as jnp

        pl = [jnp.asarray(convert.ints_to_planes(x, d)) for x in (zs, rs, ss)]
        qx, qy, ok = ecdsa.recover_planes(
            *pl, jnp.asarray(np.asarray(vs, np.int32)), curve,
            tile=8, interpret=True)
        okh = [bool(b) for b in np.asarray(ok)]
        gx = convert.planes_to_ints(np.asarray(qx))
        gy = convert.planes_to_ints(np.asarray(qy))
        for i in range(lanes):
            if i == 3:
                expect = oecdsa.recover(zs[i], rs[i], ss[i], vs[i], curve)
                if expect is None:
                    assert not okh[i] and gx[i] == 0 and gy[i] == 0
                else:
                    assert okh[i] and (gx[i], gy[i]) == expect
            else:
                assert okh[i] and (gx[i], gy[i]) == want[i], i
