"""RFC 6979 deterministic ECDSA nonces — bit-exact against the RFC's own
P-256/SHA-256 test vectors (RFC 6979 A.2.5), plus end-to-end plumbing through
the batched device sign path on the toy curve.

The reference has no ECDSA at all; this closes VERDICT r4 item 5 (the
framework claimed "RFC 6979 callers" could supply ks but nothing derived
them)."""

import hashlib

from ecsimd_tpu import ecdsa
from ecsimd_tpu.oracle import ecdsa as oecdsa
from ecsimd_tpu.specs import P256

# RFC 6979 A.2.5: NIST P-256, private key x, SHA-256
X_A25 = 0xC9AFA9D845BA75166B5C215767B1D6934E50C3DB36E89B127B8A622B120F6721
UX_A25 = 0x60FED4BA255A9D31C961EB74C6356D68C049B8923B61FA6CE669622E60F29FB6
UY_A25 = 0x7903FE1008B8BC99A41AE9E95628BC64F2F1B20C2D7E9F5177A3C294D4462299

VECTORS = [
    # (message, k, r, s) — SHA-256 rows of A.2.5
    (
        b"sample",
        0xA6E3C57DD01ABE90086538398355DD4C3B17AA873382B0F24D6129493D8AAD60,
        0xEFD48B2AACB6A8FD1140DD9CD45E81D69D2C877B56AAF991C34D0EA84EAF3716,
        0xF7CB1C942D657C41D436C7A1B6E29F65F3E900DBB9AFF4064DC4AB2F843ACDA8,
    ),
    (
        b"test",
        0xD16B6AE827F17175E040871A1C7EC3500192C4C92677336EC2537ACAEE0008E0,
        0xF1ABB023518351CD71D881567B1EA663ED3EFCF6C5132B354F28D3B0B7D38367,
        0x019F4113742A2B14BD25926B49C649155F267E60D3814B4C0CC84250E46F0083,
    ),
]


def test_keypair_matches_rfc():
    assert oecdsa.keypair(X_A25, P256) == (UX_A25, UY_A25)


def test_nonces_match_rfc_vectors():
    for msg, k, _, _ in VECTORS:
        h1 = hashlib.sha256(msg).digest()
        assert ecdsa.rfc6979_nonce(h1, X_A25, P256) == k


def test_signatures_match_rfc_vectors():
    """Full (r, s) via the oracle signer with the derived k — pins both the
    nonce derivation and the e = bits2int(H(m)) convention."""
    for msg, k, r, s in VECTORS:
        h1 = hashlib.sha256(msg).digest()
        kk = ecdsa.rfc6979_nonce(h1, X_A25, P256)
        z = int.from_bytes(h1, "big")
        assert oecdsa.sign(z, X_A25, kk, P256) == (r, s)
        assert oecdsa.verify(z, r, s, UX_A25, UY_A25, P256)


def test_signatures_verify_with_cryptography():
    """Independent acceptance: the deterministic signatures validate under
    the cryptography package's OpenSSL-backed verifier."""
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import ec
    from cryptography.hazmat.primitives.asymmetric.utils import (
        Prehashed, encode_dss_signature)

    pub = ec.EllipticCurvePublicNumbers(UX_A25, UY_A25, ec.SECP256R1()).public_key()
    for msg, _, r, s in VECTORS:
        h1 = hashlib.sha256(msg).digest()
        sig = encode_dss_signature(r, s)
        pub.verify(sig, h1, ec.ECDSA(Prehashed(hashes.SHA256())))


def test_sign_hashes_device_toy(rng):
    """sign_hashes end-to-end through the batched device signer (interpret
    kernels) on the exact-order toy curve: deterministic => reproducible."""
    from tests.toy import TOY64E

    curve = TOY64E
    ds = [rng.randrange(1, curve.order) for _ in range(4)]
    h1s = [hashlib.sha256(bytes([i])).digest() for i in range(4)]
    r1, s1 = ecdsa.sign_hashes(h1s, ds, curve, tile=8, interpret=True)
    r2, s2 = ecdsa.sign_hashes(h1s, ds, curve, tile=8, interpret=True)
    assert (r1, s1) == (r2, s2)
    q = curve.order
    qlen = q.bit_length()
    for h, d, r, s in zip(h1s, ds, r1, s1):
        z = ecdsa._bits2int(h, qlen)
        qx, qy = oecdsa.keypair(d, curve)
        assert oecdsa.verify(z, r, s, qx, qy, curve)


def test_placeholder_order_rejected():
    """order_exact=False toys must be refused by protocol entry points at
    trace time (the disarmed r3 footgun)."""
    import jax.numpy as jnp
    import pytest

    from ecsimd_tpu import api
    from tests.toy import TOY64

    with pytest.raises(AssertionError, match="placeholder"):
        ecdsa.order_field(TOY64)
    pts = api.generator_batch(TOY64, 2)
    ks = api.scalars_from_ints([3, 5], TOY64)
    with pytest.raises(AssertionError, match="placeholder"):
        api.multi_scalar_mult(ks, pts, use_kernel=False)
