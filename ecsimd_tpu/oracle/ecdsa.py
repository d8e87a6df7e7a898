"""Python-int ECDSA model (sign + verify) over any CurveSpec.

The bit-exactness contract for ecsimd_tpu.ecdsa, exactly as oracle/coz.py is
for the scalar-mult kernels. No reference counterpart (aguinet/ecsimd stops
at scalar multiplication); the construction follows FIPS 186-5 / SEC 1 v2
section 4.1 with e = z mod n (for curves whose order length equals the hash
length the leftmost-bits truncation is the identity, so the only reduction
needed is the final mod n).
"""

from __future__ import annotations

from ecsimd_tpu.oracle import coz
from ecsimd_tpu.oracle.window import _jac_add, _jac_dbl
from ecsimd_tpu.specs import CurveSpec


def _jac_mult(k: int, pt, curve: CurveSpec):
    """Total double-and-add on Jacobian ints (handles every k >= 0,
    including the identity); second opinion independent of the co-Z oracle."""
    acc = None
    base = pt
    while k:
        if k & 1:
            acc = base if acc is None else _jac_add(acc, base, curve)
        k >>= 1
        if k:
            base = _jac_dbl(base, curve)
    return acc  # None encodes infinity


def sign(z: int, d: int, k: int, curve: CurveSpec) -> tuple[int, int] | None:
    """ECDSA signature (r, s) for hash int z, private key d, nonce k.

    Returns None when r == 0 or s == 0 (caller retries with a fresh k —
    probability ~2^-bits). k, d in [1, n-1]."""
    n = curve.order
    assert 1 <= d < n and 1 <= k < n
    rx, _ = coz.scalar_mult_affine(k, curve.gx, curve.gy, curve)
    r = rx % n
    if r == 0:
        return None
    s = pow(k, -1, n) * (z % n + r * d) % n
    if s == 0:
        return None
    return r, s


def verify(z: int, r: int, s: int, qx: int, qy: int, curve: CurveSpec) -> bool:
    """ECDSA verification for signature (r, s) on hash int z under public
    key Q = (qx, qy). Validates r, s ranges and Q on-curve."""
    n, p = curve.order, curve.p
    if not (1 <= r < n and 1 <= s < n):
        return False
    if qy * qy % p != (qx * qx % p * qx + curve.a * qx + curve.b) % p:
        return False
    e = z % n
    w = pow(s, -1, n)
    u1 = e * w % n
    u2 = r * w % n
    acc = None
    if u1:
        acc = _jac_mult(u1, (curve.gx, curve.gy, 1), curve)
    s2 = _jac_mult(u2, (qx, qy, 1), curve)
    if acc is None:
        acc = s2
    elif acc[0] * pow(s2[2], 2, p) % p == s2[0] * pow(acc[2], 2, p) % p:
        # same x line: doubling or infinity (the _jac_add degeneracy)
        if acc[1] * pow(s2[2], 3, p) % p == s2[1] * pow(acc[2], 3, p) % p:
            acc = _jac_dbl(acc, curve)
        else:
            acc = None
    else:
        acc = _jac_add(acc, s2, curve)
    if acc is None or acc[2] % p == 0:
        return False
    x_aff = acc[0] * pow(pow(acc[2], 2, p), -1, p) % p
    return x_aff % n == r


def keypair(d: int, curve: CurveSpec) -> tuple[int, int]:
    """Public key d*G for private key d."""
    return coz.scalar_mult_affine(d, curve.gx, curve.gy, curve)


def sign_recoverable(z: int, d: int, k: int, curve: CurveSpec):
    """(r, s, v) with the recovery id v: bit 0 = parity of R.y, bit 1 =
    whether R.x overflowed mod n (x = r + n). None on r == 0 / s == 0."""
    n = curve.order
    assert 1 <= d < n and 1 <= k < n
    rx, ry = coz.scalar_mult_affine(k, curve.gx, curve.gy, curve)
    r = rx % n
    if r == 0:
        return None
    s = pow(k, -1, n) * (z % n + r * d) % n
    if s == 0:
        return None
    return r, s, (ry & 1) | (2 if rx >= n else 0)


def recover(z: int, r: int, s: int, v: int, curve: CurveSpec):
    """Public-key recovery: the unique Q with verify(z, r, s, Q) == True
    for this recovery id, or None if (r, s, v) encodes no valid point.
    SEC 1 v2 §4.1.6, cofactor-1 curves."""
    n, p = curve.order, curve.p
    if not (1 <= r < n and 1 <= s < n and 0 <= v <= 3):
        return None
    x = r + (n if v & 2 else 0)
    if x >= p:
        return None
    rhs = (x * x * x + curve.a * x + curve.b) % p
    from ecsimd_tpu.oracle.field import mont_sqrt, mont_from_classical, mont_to_classical

    fsr = curve.field
    root = mont_sqrt(mont_from_classical(rhs, fsr), fsr)
    if root is None:
        return None
    y = mont_to_classical(root, fsr)
    if (y & 1) != (v & 1):
        y = p - y
    rinv = pow(r, -1, n)
    u1 = (-z % n) * rinv % n
    u2 = s * rinv % n
    q1 = _jac_mult(u1, (curve.gx, curve.gy, 1), curve) if u1 else None
    q2 = _jac_mult(u2, (x, y, 1), curve)
    q = q2 if q1 is None else _jac_add(q1, q2, curve)
    if q is None:
        return None
    qx, qy = coz.jacobian_to_affine(q, curve)
    return qx, qy
