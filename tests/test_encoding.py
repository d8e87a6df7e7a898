"""SEC1 point encoding (ecsimd_tpu/encoding.py) round trips + differential
vs the `cryptography` package's SEC1 serializer, + adversarial rejects.

Reference parity: serialization.h:12-48 covers bignum bytes only; the point
octet-string layer is beyond the reference."""

import numpy as np
import pytest

from ecsimd_tpu import api, convert, encoding
from ecsimd_tpu.oracle import coz
from ecsimd_tpu.specs import P256, WEI25519
from tests.toy import TOYM  # p = 3 mod 4: the sqrt/decompression-capable toy


def _points(curve, rng, n):
    ks = [rng.randrange(1, curve.order) for _ in range(n)]
    pts = [coz.scalar_mult_affine(k, curve.gx, curve.gy, curve) for k in ks]
    return pts


def _batch(pts, curve):
    return api.points_from_ints([x for x, _ in pts], [y for _, y in pts], curve)


@pytest.mark.parametrize("curve", [TOYM, P256], ids=lambda c: c.name)
@pytest.mark.parametrize("compressed", [False, True], ids=["u", "c"])
def test_roundtrip(curve, compressed, rng):
    pts = _points(curve, rng, 6)
    blobs = encoding.points_to_bytes(_batch(pts, curve), compressed=compressed)
    length = encoding.coordinate_bytes(curve)
    want_len = 1 + (length if compressed else 2 * length)
    assert all(len(b) == want_len for b in blobs)
    dec, ok = encoding.points_from_bytes(blobs, curve)
    assert ok.all()
    got = list(zip(convert.planes_to_ints(np.asarray(dec.x)),
                   convert.planes_to_ints(np.asarray(dec.y))))
    assert got == pts


def test_mixed_batch(rng):
    pts = _points(P256, rng, 4)
    batch = _batch(pts, P256)
    blobs = encoding.points_to_bytes(batch, compressed=True)
    ublobs = encoding.points_to_bytes(batch, compressed=False)
    mixed = [blobs[0], ublobs[1], blobs[2], ublobs[3]]
    dec, ok = encoding.points_from_bytes(mixed, P256)
    assert ok.all()
    got = list(zip(convert.planes_to_ints(np.asarray(dec.x)),
                   convert.planes_to_ints(np.asarray(dec.y))))
    assert got == pts


def test_differential_vs_cryptography(rng):
    """Byte-exact vs cryptography's SEC1 encoder, both directions."""
    from cryptography.hazmat.primitives.asymmetric import ec
    from cryptography.hazmat.primitives.serialization import (
        Encoding, PublicFormat)

    pts = _points(P256, rng, 3)
    batch = _batch(pts, P256)
    for compressed, fmt in ((True, PublicFormat.CompressedPoint),
                            (False, PublicFormat.UncompressedPoint)):
        ours = encoding.points_to_bytes(batch, compressed=compressed)
        for (x, y), blob in zip(pts, ours):
            pub = ec.EllipticCurvePublicNumbers(x, y, ec.SECP256R1()).public_key()
            assert pub.public_bytes(Encoding.X962, fmt) == blob
            back = ec.EllipticCurvePublicKey.from_encoded_point(ec.SECP256R1(), blob)
            nums = back.public_numbers()
            assert (nums.x, nums.y) == (x, y)


def test_invalid_encodings_rejected(rng):
    curve = TOYM
    p = curve.p
    length = encoding.coordinate_bytes(curve)
    good = encoding.points_to_bytes(_batch(_points(curve, rng, 1), curve))[0]
    # a residue class with no curve point: scan for x where rhs is a non-residue
    x = 0
    while True:
        rhs = (x**3 + curve.a * x + curve.b) % p
        if pow(rhs, (p - 1) // 2, p) == p - 1:
            break
        x += 1
    bad = [
        b"\x00",                                   # SEC1 infinity: not a public key
        b"\x05" + good[1:],                        # unknown prefix
        good[:-1],                                 # truncated
        good + b"\x00",                            # overlong
        bytes([good[0]]) + p.to_bytes(length, "big"),        # x = p (non-canonical)
        bytes([0x02]) + x.to_bytes(length, "big"),           # x off curve
    ]
    dec, ok = encoding.points_from_bytes(bad + [good], curve)
    assert list(ok) == [False] * len(bad) + [True]
    # failed lanes are zeroed, not garbage
    xs = convert.planes_to_ints(np.asarray(dec.x))
    assert xs[: len(bad)] == [0] * len(bad)


def test_uncompressed_offcurve_rejected(rng):
    pts = _points(P256, rng, 2)
    blobs = encoding.points_to_bytes(_batch(pts, P256), compressed=False)
    # corrupt y of lane 0
    length = encoding.coordinate_bytes(P256)
    y_bad = (pts[0][1] + 1) % P256.p
    blobs[0] = blobs[0][: 1 + length] + y_bad.to_bytes(length, "big")
    dec, ok = encoding.points_from_bytes(blobs, P256)
    assert list(ok) == [False, True]


def test_wei25519_uncompressed_roundtrip(rng):
    """p = 1 mod 4 uncompressed decode (no sqrt involved)."""
    pts = _points(WEI25519, rng, 3)
    blobs = encoding.points_to_bytes(_batch(pts, WEI25519), compressed=False)
    dec, ok = encoding.points_from_bytes(blobs, WEI25519)
    assert ok.all()
    got = list(zip(convert.planes_to_ints(np.asarray(dec.x)),
                   convert.planes_to_ints(np.asarray(dec.y))))
    assert got == pts


def test_wei25519_compressed_roundtrip(rng):
    """p = 5 mod 8 compressed decode through the Atkin sqrt (beyond the
    reference's p = 3 mod 4 static_assert, gfp.h:84-87)."""
    pts = _points(WEI25519, rng, 4)
    blobs = encoding.points_to_bytes(_batch(pts, WEI25519), compressed=True)
    dec, ok = encoding.points_from_bytes(blobs, WEI25519)
    assert ok.all()
    got = list(zip(convert.planes_to_ints(np.asarray(dec.x)),
                   convert.planes_to_ints(np.asarray(dec.y))))
    assert got == pts


def test_wei25519_compressed_nonresidue_rejected(rng):
    """A compressed x whose rhs is a non-residue must fail cleanly (ok = 0,
    zeroed coords) — the advisor's r4 crash repro, now a decode."""
    p = WEI25519.p
    while True:
        x = rng.randrange(2, p)
        rhs = (x * x * x + WEI25519.a * x + WEI25519.b) % p
        if pow(rhs, (p - 1) // 2, p) == p - 1:
            break
    length = encoding.coordinate_bytes(WEI25519)
    good = _points(WEI25519, rng, 1)[0]
    blobs = [bytes([0x02]) + x.to_bytes(length, "big"),
             bytes([0x03]) + good[0].to_bytes(length, "big")]
    dec, ok = encoding.points_from_bytes(blobs, WEI25519)
    assert list(ok) == [False, True]
    assert convert.planes_to_ints(np.asarray(dec.x))[0] == 0
    assert convert.planes_to_ints(np.asarray(dec.y))[0] == 0
