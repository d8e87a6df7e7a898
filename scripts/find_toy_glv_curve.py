"""Find the toy GLV curve (tests/toy.py TOYGLV): y^2 = x^3 + b over a
32-bit prime p = 1 (mod 3) with EXACT prime order n = 1 (mod 3) — the shape
the GLV endomorphism split (ecsimd_tpu/glv.py) requires, at 2 digits so the
unrolled GLV XLA twin runs in seconds on CPU.

Method (the Cornacchia variant; a Hasse-interval BSGS at 64 bits was too
slow at ~10 s/candidate x hundreds of candidates): for j-invariant-0 curves
over p = a^2 + 3b^2 (p = 1 mod 3), the six twist orders are known
analytically: N = p + 1 - t for t in {+-2a, +-(a+3b), +-(a-3b)}. So
1. scan 32-bit primes p = 1 (mod 3), solve p = a^2 + 3b^2 (Cornacchia:
   Euclid descent from sqrt(-3) mod p),
2. keep p whose candidate set contains an ODD PRIME N = 1 (mod 3),
3. scan b until a curve point G selects that twist: exactly one candidate
   kills G (N*G = inf) and it is the good one; N prime + N*G = inf +
   (N-1)*G != inf makes N the exact order of <G> = E.

Prints the CurveSpec constants. Run: python scripts/find_toy_glv_curve.py
(finds p = 0xFFFFFEC5, b = 13, G = (2, 213086585), n = 0xFFFF9403 in ~10 s).
"""

import math
import sys

sys.path.insert(0, "scripts")
from find_toy_ecdsa_curve import is_prime  # noqa: E402


def sqrt_any(a, p):
    if a == 0:
        return 0
    if pow(a, (p - 1) // 2, p) != 1:
        return None
    if p % 4 == 3:
        return pow(a, (p + 1) // 4, p)
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, t2 = 0, t
        while t2 != 1:
            t2 = t2 * t2 % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c, t, r = i, b * b % p, t * b * b % p, r * b % p
    return r


def jac_add(p1, p2, p):
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    if z1 == 0:
        return p2
    if z2 == 0:
        return p1
    z1z1, z2z2 = z1 * z1 % p, z2 * z2 % p
    u1, u2 = x1 * z2z2 % p, x2 * z1z1 % p
    s1, s2 = y1 * z2z2 % p * z2 % p, y2 * z1z1 % p * z1 % p
    h, r = (u2 - u1) % p, (s2 - s1) % p
    if h == 0:
        if r != 0:
            return (1, 1, 0)
        return jac_dbl(p1, p)
    hh = h * h % p
    hhh = h * hh % p
    v = u1 * hh % p
    x3 = (r * r - hhh - 2 * v) % p
    return (x3, (r * (v - x3) - s1 * hhh) % p, z1 * z2 % p * h % p)


def jac_dbl(pt, p):
    # a = 0 doubling
    x1, y1, z1 = pt
    if z1 == 0 or y1 == 0:
        return (1, 1, 0)
    xx, yy = x1 * x1 % p, y1 * y1 % p
    yyyy = yy * yy % p
    s = 2 * ((x1 + yy) * (x1 + yy) - xx - yyyy) % p
    m = 3 * xx % p
    x3 = (m * m - 2 * s) % p
    return (x3, (m * (s - x3) - 8 * yyyy) % p, 2 * y1 * z1 % p)


def jac_mult(k, pt, p):
    acc, base = (1, 1, 0), pt
    while k:
        if k & 1:
            acc = jac_add(acc, base, p)
        k >>= 1
        if k:
            base = jac_dbl(base, p)
    return acc


def x_affine(pt, p):
    x, _, z = pt
    if z == 0:
        return None
    return x * pow(z * z % p, -1, p) % p


def twist_orders(p):
    """The 6 candidate orders of y^2 = x^3 + b over p = a^2 + 3b^2, or None
    if the Cornacchia descent fails (it cannot for prime p = 1 mod 3)."""
    r = sqrt_any(p - 3, p)
    if r is None:
        return None
    a_, b_ = p, r
    while b_ * b_ > p:
        a_, b_ = b_, a_ % b_
    x = b_
    y2, rem = divmod(p - x * x, 3)
    ys = math.isqrt(y2)
    if rem or ys * ys != y2:
        return None
    a, b = x, ys
    return sorted({p + 1 - t for t in (2 * a, -2 * a, a + 3 * b,
                                       -(a + 3 * b), a - 3 * b, -(a - 3 * b))})


def main():
    x = (1 << 32) - 1
    while x > (1 << 31):
        if is_prime(x) and x % 3 == 1:
            orders = twist_orders(x)
            good = [N for N in (orders or [])
                    if N % 2 == 1 and N % 3 == 1 and N > (1 << 31) and is_prime(N)]
            if good:
                p = x
                print(f"p={hex(p)} good orders={[hex(N) for N in good]}")
                for bb in range(2, 100000):
                    G = None
                    for gx in range(1, 50):
                        yy = sqrt_any((gx ** 3 + bb) % p, p)
                        if yy:
                            G = (gx, yy)
                            break
                    if not G:
                        continue
                    hits = [N for N in orders
                            if jac_mult(N, (G[0], G[1], 1), p)[2] == 0]
                    if len(hits) == 1 and hits[0] in good:
                        N = hits[0]
                        assert jac_mult(N - 1, (G[0], G[1], 1), p)[2] != 0
                        print(f"FOUND b={bb} gx={G[0]} gy={G[1]} n={hex(N)}")
                        print("TOYGLV = CurveSpec(")
                        print(f'    name="toy-glv32", field=GLV32, a=0, b={bb},')
                        print(f"    gx={G[0]}, gy={G[1]}, order={hex(N)},")
                        print(")")
                        return
        x -= 2


if __name__ == "__main__":
    main()
