"""Python-int oracle for the signed fixed-window scalar multiplication.

A beyond-reference fast path (the reference implements only the co-Z ladder):
width-4 signed-odd fixed windows — ~10.7 field-mults/bit vs the ladder's
~14.4 — with uniform control flow (masked table lookups), so it keeps the
reference's constant-time discipline on TPU.

Recoding: force k odd (parity fixed up at the end, as in the ladder), then
    d_i = (((k >> 4i) | 1) & 31) - 16        for i = 0..m-2   (odd, in [-15,15])
    d_{m-1} = 1
with m = nbits/4 + 1. This closed form follows from the recurrence
k_{i+1} = (k_i >> 4) | 1 of the textbook odd signed-window recoding
(d_i = (k_i mod 32) - 16; k_{i+1} = (k_i - d_i)/16 = 2*(k_i >> 5) + 1).
"""

from __future__ import annotations

from ecsimd_tpu.oracle import coz
from ecsimd_tpu.specs import CurveSpec

WINDOW = 4


def recode(k: int, nbits: int) -> list[int]:
    """Signed-odd window digits, LSB first; sum(d_i * 16^i) == k | 1."""
    assert 0 < k < (1 << nbits)
    m = nbits // WINDOW
    digs = [((((k >> (WINDOW * i)) | 1) & 31) - 16) for i in range(m)]
    digs.append(1)
    assert sum(d << (WINDOW * i) for i, d in enumerate(digs)) == (k | 1)
    assert all(d % 2 == 1 and 0 < abs(d) <= 15 for d in digs[:-1])
    return digs


def scalar_mult(k: int, pt, curve: CurveSpec):
    """Windowed k*P in Jacobian coords; same domain caveats as the ladder
    (degenerate when an intermediate add hits a doubling/infinity case —
    measure-zero for k drawn from [1, order-1))."""
    nbits = curve.field.nbits
    digs = recode(k, nbits)
    x, y, _ = pt
    # table of odd multiples 1P..15P (affine-int oracle uses plain Jacobian)
    table = {1: (x, y, 1)}
    two = coz.dblu((x, y, 1), curve)[0]
    prev = table[1]
    for j in range(3, 17, 2):
        # j*P = (j-2)*P + 2P via generic Jacobian add on ints
        prev = _jac_add(prev, two, curve)
        table[j] = prev
    acc = table[1]  # d_{m-1} == 1
    for d in reversed(digs[:-1]):
        for _ in range(WINDOW):
            acc = _jac_dbl(acc, curve)
        tx, ty, tz = table[abs(d)]
        if d < 0:
            ty = (-ty) % curve.p
        acc = _jac_add(acc, (tx, ty, tz), curve)
    if k % 2 == 0:
        acc = coz.add_z2_1(acc, (x, (-y) % curve.p, 1), curve)
    return acc


def _jac_dbl(pt, curve):
    """Generic-a Jacobian doubling (dbl-2007-bl shape on Python ints).

    Valid for ANY short-Weierstrass a (host oracle — table builds and
    verification go through here for every curve in specs.CURVES, so the
    a = -3 specialization the kernels use for am3 curves must NOT be
    hard-coded here; for a = -3 the M term below reduces to the same value
    3*(X1-ZZ)(X1+ZZ) the dbl-2001-b alpha computes)."""
    p = curve.p
    x1, y1, z1 = pt
    xx = x1 * x1 % p
    yy = y1 * y1 % p
    yyyy = yy * yy % p
    zz = z1 * z1 % p
    s = 2 * ((x1 + yy) * (x1 + yy) - xx - yyyy) % p
    m = (3 * xx + curve.a * zz % p * zz) % p
    x3 = (m * m - 2 * s) % p
    y3 = (m * (s - x3) - 8 * yyyy) % p
    z3 = ((y1 + z1) * (y1 + z1) - yy - zz) % p
    return (x3, y3, z3)


def _jac_add(p1, p2, curve):
    """General Jacobian add (no infinity handling — degenerate inputs raise)."""
    p = curve.p
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    z1z1 = z1 * z1 % p
    z2z2 = z2 * z2 % p
    u1 = x1 * z2z2 % p
    u2 = x2 * z1z1 % p
    s1 = y1 * z2z2 % p * z2 % p
    s2 = y2 * z1z1 % p * z1 % p
    h = (u2 - u1) % p
    r = (s2 - s1) % p
    if h == 0:
        raise ZeroDivisionError("degenerate add (equal or opposite x)")
    hh = h * h % p
    hhh = h * hh % p
    v = u1 * hh % p
    x3 = (r * r - hhh - 2 * v) % p
    y3 = (r * (v - x3) - s1 * hhh) % p
    z3 = z1 * z2 % p * h % p
    return (x3, y3, z3)


def scalar_mult_affine(k: int, x: int, y: int, curve: CurveSpec):
    return coz.jacobian_to_affine(scalar_mult(k, (x, y, 1), curve), curve)
