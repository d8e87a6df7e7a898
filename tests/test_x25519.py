"""RFC 7748 X25519 (ecsimd_tpu/x25519.py): RFC §5.2 vectors, differential
vs the `cryptography` package's X25519, exchange symmetry, and the
twist/low-order inputs the Weierstrass path cannot represent.

Every call uses batch 4 (padded with repeats) so the whole file shares ONE
compiled 255-step ladder executable (~100 s XLA:CPU compile, paid once)."""

import secrets

from ecsimd_tpu import x25519

V1_K = bytes.fromhex("a546e36bf0527c9d3b16154b82465edd62144c0ac1fc5a18506a2244ba449ac4")
V1_U = bytes.fromhex("e6db6867583030db3594c1a424b15f7c726624ec26b3353b10a903a6d0ab1c4c")
V1_OUT = "c3da55379de9c6908e94ea4df28d084f32eccf03491c71f754b4075577a28552"
V2_K = bytes.fromhex("4b66e9d4d1b4673c5ad22691957d6af5c11b6421e0ea01d42ca4169e7918ba0d")
V2_U = bytes.fromhex("e5210f12786811d3f4b7959d0538ae2c31dbe7106fc03c3efc4cd549c715a493")
V2_OUT = "95cbde9476e8907d7aade45cb4b873f88b595a68799fa152e6f8f7647aac7957"
BASE = (9).to_bytes(32, "little")
# X25519(k, 9) for k = the base-point bytes — iteration 1 of the RFC's
# §5.2 iteration test
ITER1 = "422c8e7a6227d7bca1350b3e2bb7279f7897b87bb6854b783c60e80311ae3079"


def _run4(ks, us):
    """Pad to batch 4 with repeats of lane 0 (one compiled shape)."""
    n = len(ks)
    ks = (ks + [ks[0]] * 4)[:4]
    us = (us + [us[0]] * 4)[:4]
    return x25519.x25519_batch(ks, us)[:n]


def test_rfc7748_vectors():
    out1, out2, it1 = _run4([V1_K, V2_K, BASE], [V1_U, V2_U, BASE])
    assert out1.hex() == V1_OUT
    assert out2.hex() == V2_OUT
    assert it1.hex() == ITER1


def test_differential_vs_cryptography():
    from cryptography.hazmat.primitives.asymmetric.x25519 import (
        X25519PrivateKey, X25519PublicKey)

    ks = [secrets.token_bytes(32) for _ in range(4)]
    us = [X25519PrivateKey.generate().public_key().public_bytes_raw()
          for _ in range(4)]
    got = _run4(ks, us)
    for k, u, g in zip(ks, us, got):
        want = X25519PrivateKey.from_private_bytes(k).exchange(
            X25519PublicKey.from_public_bytes(u))
        assert g == want


def test_exchange_symmetry():
    a, b = secrets.token_bytes(32), secrets.token_bytes(32)
    qa, qb = _run4([a, b], [BASE, BASE])
    s1, s2 = _run4([a, b], [qb, qa])
    assert s1 == s2 and s1 != bytes(32)


def test_low_order_and_masked_bit():
    """u = 0 is low-order (the ladder output collapses to 0 — the all-zero
    check RFC callers make); the top bit of u MUST be masked before use."""
    k = secrets.token_bytes(32)
    u_hi = bytearray(V1_U)
    u_hi[31] |= 0x80
    z0, out_masked = _run4(
        [k, V1_K], [(0).to_bytes(32, "little"), bytes(u_hi)])
    assert z0 == bytes(32)
    assert out_masked.hex() == V1_OUT


def test_derive_public_fixed_base():
    """X25519 keygen through the Wei25519 fixed-base comb (clamped scalars
    sit ABOVE the subgroup order — the comb is value-linear over the full
    256-bit range) == cryptography's X25519 public keys."""
    from cryptography.hazmat.primitives.asymmetric.x25519 import X25519PrivateKey

    ks = [secrets.token_bytes(32) for _ in range(4)]
    got = x25519.derive_public_batch(ks)
    for k, g in zip(ks, got):
        want = X25519PrivateKey.from_private_bytes(k).public_key().public_bytes_raw()
        assert g == want
