"""Batched ECDH (ecsimd_tpu/ecdh.py): toy-curve device pipeline (interpret
kernels) with adversarial lanes, P-256 differential against the
`cryptography` package's ECDH exchange, and key-generation agreement."""

import secrets

import jax.numpy as jnp
import numpy as np
import pytest

from ecsimd_tpu import api, convert, ecdh
from ecsimd_tpu.oracle import coz
from ecsimd_tpu.specs import P256
from tests.toy import TOY64E


def _planes(vals, curve):
    return jnp.asarray(convert.ints_to_planes(vals, curve.field.ndigits))


def test_ecdh_toy_device(rng):
    """Full device pipeline on the toy curve (interpret kernels): keygen
    through the comb, shared secret through the strict window kernel,
    invalid lanes (zero scalar, out-of-range scalar, off-curve peer,
    non-canonical coordinate) rejected in-batch."""
    curve = TOY64E
    lanes = 16
    ds = [rng.randrange(1, 1 << 62) for _ in range(lanes)]
    es = [rng.randrange(1, 1 << 62) for _ in range(lanes)]

    qx, qy, okq = ecdh.derive_public_planes(
        _planes(es, curve), curve, tile=lanes, interpret=True)
    assert np.asarray(okq).all()
    want_q = [coz.scalar_mult_affine(e, curve.gx, curve.gy, curve) for e in es]
    got_q = list(zip(convert.planes_to_ints(np.asarray(qx)),
                     convert.planes_to_ints(np.asarray(qy))))
    assert got_q == want_q

    qxs = [q[0] for q in want_q]
    qys = [q[1] for q in want_q]
    ds[12] = 0  # zero scalar
    ds[13] = curve.order  # out of range
    qys[14] = (qys[14] + 1) % curve.p  # off-curve peer
    qxs[15] = curve.p  # non-canonical coordinate (== p; fits the 64-bit planes)
    sx, ok = ecdh.shared_secret_planes(
        _planes(ds, curve), _planes(qxs, curve), _planes(qys, curve),
        curve, tile=lanes, interpret=True)
    oks = [bool(v) for v in np.asarray(ok)]
    assert oks == [True] * 12 + [False] * 4
    got = convert.planes_to_ints(np.asarray(sx))
    for i in range(12):
        wx, _ = coz.scalar_mult_affine(ds[i], qxs[i], qys[i], curve)
        assert got[i] == wx


def test_ecdh_p256_vs_cryptography(rng):
    """P-256 exchange differential (XLA ladder path): our shared x must equal
    cryptography's ECDH-derived bytes, both directions, and keygen must agree
    with its public numbers."""
    from cryptography.hazmat.primitives.asymmetric import ec

    lanes = 4
    k1 = [ec.generate_private_key(ec.SECP256R1()) for _ in range(lanes)]
    k2 = [ec.generate_private_key(ec.SECP256R1()) for _ in range(lanes)]
    d1 = [k.private_numbers().private_value for k in k1]
    d2 = [k.private_numbers().private_value for k in k2]
    pub2 = [k.public_key().public_numbers() for k in k2]

    # keygen agreement (XLA comb twin)
    gx, gy = ecdh.derive_public_ints(d2, P256, use_kernel=False)
    assert gx == [p.x for p in pub2] and gy == [p.y for p in pub2]

    want = [int.from_bytes(a.exchange(ec.ECDH(), b.public_key()), "big")
            for a, b in zip(k1, k2)]
    sx, ok = ecdh.shared_secret_ints(
        d1, [p.x for p in pub2], [p.y for p in pub2], P256, use_kernel=False)
    assert all(ok) and sx == want
    # symmetry: d2 * Q1 gives the same secret
    pub1 = [k.public_key().public_numbers() for k in k1]
    sx2, ok2 = ecdh.shared_secret_ints(
        d2, [p.x for p in pub1], [p.y for p in pub1], P256, use_kernel=False)
    assert all(ok2) and sx2 == want


def test_x25519_interop():
    """Wei25519 scalar mult agrees with the `cryptography` package's X25519
    through the Weierstrass->Montgomery map u = x - A/3. Clamped scalars
    exceed the subgroup order n (they sit near 2^254), which the integer
    ladder handles by construction — so this goes through the raw ladder
    directly rather than the [1, n)-validated ECDH facade."""
    from cryptography.hazmat.primitives.asymmetric.x25519 import X25519PrivateKey
    from ecsimd_tpu.specs import WEI25519

    p = WEI25519.field.p
    a24_off = 486662 * pow(3, -1, p) % p  # A/3: u = x - A/3

    raws = [secrets.token_bytes(32) for _ in range(3)]
    keys = [X25519PrivateKey.from_private_bytes(r) for r in raws]
    want_u = [int.from_bytes(
        k.public_key().public_bytes_raw(), "little") % p for k in keys]

    def clamp(raw: bytes) -> int:
        k = bytearray(raw)
        k[0] &= 248
        k[31] &= 127
        k[31] |= 64
        return int.from_bytes(bytes(k), "little")

    from tests.helpers import ladder_xy_host

    ks = [clamp(r) for r in raws]
    # jitted-single-step ladder (full wei25519 while-graph jit is
    # pathological on XLA:CPU — tests/helpers.ladder_xy_host / CLAUDE.md)
    got = ladder_xy_host(ks, WEI25519)
    got_u = [(x - a24_off) % p for x, _ in got]
    assert got_u == want_u
