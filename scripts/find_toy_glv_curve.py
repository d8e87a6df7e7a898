"""Find a toy GLV curve: y^2 = x^3 + b over Goldilocks p = 2^64 - 2^32 + 1
(p = 1 mod 3) with exact ODD order n, n = 1 (mod 3) — so the full GLV path
(cube roots, lattice split, endomorphism kernel) runs at 4 digits in CPU
tests. Same BSGS order-finding argument as find_toy_ecdsa_curve.py; here n
need not be prime, only odd with a known factorization-free exactness
argument — so we REQUIRE n prime anyway (prime in the Hasse interval is the
unique group order, and lambda mod n needs the full group = <G>)."""

import math
import random
import sys

sys.path.insert(0, "scripts")
from find_toy_ecdsa_curve import is_prime, sqrt_mod  # noqa: E402

P = (1 << 64) - (1 << 32) + 1


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


def group_order(gx, gy, p):
    w = 2 * math.isqrt(p) + 2
    m = math.isqrt(w) + 1
    G = (gx, gy, 1)
    base = jac_mult(p + 1 - w // 2, G, p)
    # baby steps: x-coords of j*G, j in [0, m)
    baby = {}
    pt = (1, 1, 0)
    for j in range(m):
        xa = x_affine(pt, p)
        baby.setdefault(xa, []).append(j)
        pt = jac_add(pt, G, p)
    # giant steps
    mG = jac_mult(m, G, p)
    cur = base
    for i in range(m + 2):
        xa = x_affine(cur, p)
        if xa in baby:
            for j in baby[xa]:
                for sj in (j, -j):
                    N = p + 1 - w // 2 + i * m + sj
                    if N > 0 and jac_mult(N, G, p)[2] == 0:
                        return N
        cur = jac_add(cur, mG, p)
    return None


def main():
    assert P % 3 == 1

    for b in range(2, 2000):
        # pick G by solving y^2 = x^3 + b for successive x
        found = None
        for x in range(1, 50):
            rhs = (x * x * x + b) % P
            y = sqrt_mod(rhs, P)
            if y is not None:
                found = (x, y)
                break
        if not found:
            continue
        gx, gy = found
        N = group_order(gx, gy, P)
        if N is None or N % 2 == 0 or N % 3 != 1:
            continue
        if not is_prime(N):
            continue
        print(f"b={b} G=({gx},{hex(gy)}) n={hex(N)} n%3={N%3} bits={N.bit_length()}")
        print("TOYGLV = CurveSpec(")
        print(f'    name="toy-glv-goldilocks", field=GOLDILOCKS, a=0, b={b},')
        print(f"    gx={gx}, gy={gy}, order={hex(N)},")
        print(")")
        return


if __name__ == "__main__":
    main()
