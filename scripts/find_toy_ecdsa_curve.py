"""Find a toy curve over the Goldilocks field with a KNOWN PRIME group order.

The existing toy curves (tests/toy.py) carry placeholder orders — fine for
scalar-mult differentials (the algorithms never consult the order's value
beyond parity), but ECDSA needs the exact prime order n of G for the mod-n
scalar field. This script searches y^2 = x^3 - 3x + b over
p = 2^64 - 2^32 + 1 for a b whose group order (computed exactly by
baby-step/giant-step inside the Hasse interval) is prime and < 2^64, then
prints the CurveSpec constants baked into tests/toy.py (TOY64E).

Exactness argument: BSGS finds N in [p+1-2sqrt(p), p+1+2sqrt(p)] with
N*G = infinity. If N is prime, the order of G divides N, and being > 1 it
IS N; a prime N in the Hasse interval is also the unique group order
(any other multiple of |G| in the interval would be a second multiple of N
inside a window of width 4sqrt(p) < N). Run time ~10 s per candidate.
"""

import math
import random
import sys


def is_prime(n, k=48):
    if n < 2:
        return False
    for q in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % q == 0:
            return n == q
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for _ in range(k):
        a = random.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def sqrt_mod(a, p):
    """Tonelli-Shanks (p = 1 mod 4 here)."""
    a %= p
    if a == 0:
        return 0
    if pow(a, (p - 1) // 2, p) != 1:
        return None
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


def jac_dbl(pt, p, a=-3):
    x1, y1, z1 = pt
    if z1 == 0 or y1 == 0:
        return (1, 1, 0)
    xx, yy = x1 * x1 % p, y1 * y1 % p
    yyyy, zz = yy * yy % p, z1 * z1 % p
    s = 2 * ((x1 + yy) * (x1 + yy) - xx - yyyy) % p
    m = (3 * xx + a * zz % p * zz) % p
    x3 = (m * m - 2 * s) % p
    return (x3, (m * (s - x3) - 8 * yyyy) % p, ((y1 + z1) * (y1 + z1) - yy - zz) % p)


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


def neg(pt, p):
    return (pt[0], (p - pt[1]) % p, pt[2])


def group_order(gx, gy, p):
    """Exact N with N*G = inf via BSGS over the Hasse interval."""
    w = 2 * math.isqrt(p) + 2
    lo = p + 1 - w
    m = math.isqrt(2 * w) + 1
    g = (gx, gy, 1)
    # baby steps: j*G for j in [0, m)
    baby = {}
    pt = (1, 1, 0)
    for j in range(m):
        xa = x_affine(pt, p)
        if xa is not None and xa not in baby:
            baby[xa] = (j, pt)
        pt = jac_add(pt, g, p)
    # giant steps: find lo*G + i*(m*G) == -j*G  ->  (lo + i*m + j)*G = inf
    mg = jac_mult(m, g, p)
    cur = jac_mult(lo, g, p)
    for i in range(2 * w // m + 2):
        xa = x_affine(cur, p)
        if xa is None:
            n = lo + i * m
            if lo <= n <= p + 1 + w and jac_mult(n, g, p)[2] == 0:
                return n
        elif xa in baby:
            j, bpt = baby[xa]
            for cand in (lo + i * m + j, lo + i * m - j):
                if lo <= cand <= p + 1 + w and jac_mult(cand, g, p)[2] == 0:
                    return cand
        cur = jac_add(cur, mg, p)
    raise RuntimeError("BSGS failed")


def main():
    p = (1 << 64) - (1 << 32) + 1
    a = p - 3
    random.seed(0xEC51)
    tried = 0
    for b in range(7, 2000):
        rhs_x = None
        for x in range(1, 50):
            rhs = (x * x % p * x + a * x + b) % p
            y = sqrt_mod(rhs, p)
            if y is not None and y != 0:
                rhs_x = (x, min(y, p - y))
                break
        if rhs_x is None:
            continue
        gx, gy = rhs_x
        tried += 1
        n = group_order(gx, gy, p)
        ok = is_prime(n) and n < (1 << 64)
        print(f"b={b} G=({gx},{gy}) N={n:#x} prime={is_prime(n)} fits={n < (1 << 64)}",
              flush=True)
        if ok:
            assert jac_mult(n, (gx, gy, 1), p)[2] == 0
            assert jac_mult(n - 1, (gx, gy, 1), p)[2] != 0
            print(f"\nFOUND: a=p-3 b={b} gx={gx} gy={gy} order={n:#x}")
            return
    print("no curve found", tried)
    sys.exit(1)


if __name__ == "__main__":
    main()
