"""Test-only toy curve over the 64-bit Goldilocks prime.

p = 2^64 - 2^32 + 1 is a genuine Solinas prime (cbar = 2^32 - 1, balanced
words (0,-1),(1,+1)), so the whole stack — digit planes, Solinas reduction
matrix derivation, group law, both Pallas kernels — runs at 4 digits instead
of 16, making interpret-mode end-to-end kernel tests tractable on CPU.

The curve y^2 = x^3 - 3x + 6 with G = (1, 2) is constructed so G lies on it
by definition; it is nonsingular (4a^3 + 27b^2 = 864 != 0 mod p). The true
group order is irrelevant for these differential tests (the ladder/window
algorithms never consult it); CurveSpec only asserts it is odd, so p is used.
"""

from ecsimd_tpu.specs import CurveSpec, FieldSpec

GOLDILOCKS = FieldSpec(
    name="goldilocks64",
    p=(1 << 64) - (1 << 32) + 1,
    nbits=64,
    reduction="solinas",
)

TOY64 = CurveSpec(
    name="toy-goldilocks",
    field=GOLDILOCKS,
    a=GOLDILOCKS.p - 3,
    b=6,
    gx=1,
    gy=2,
    order=GOLDILOCKS.p,  # placeholder odd value; see module docstring
    order_exact=False,
)


# Toy *Montgomery-reduction* field/curve: p = 2^64 - 189 is prime (= 3 mod 4)
# with no Solinas structure, so the full CIOS path — kernel-dialect mont mul,
# generic-a group-law fallbacks inside the ladder kernel — runs end-to-end at
# 4 digits in interpret mode (the Solinas toy above cannot reach that code).
MONT64 = FieldSpec(
    name="mont64",
    p=(1 << 64) - 189,
    nbits=64,
    reduction="montgomery",
)

TOYM = CurveSpec(
    name="toy-mont64",
    field=MONT64,
    a=MONT64.p - 3,
    b=6,
    gx=1,
    gy=2,
    order=MONT64.p,  # placeholder odd value, as TOY64
    order_exact=False,
)


# Toy curve with a != -3 on the Montgomery toy field: y^2 = x^3 + 5x - 2,
# G = (1, 2) (4 == 1 + 5 - 2). Exercises the general-a doubling dispatch
# (kernels/coz.jac_dbl_general_a) — the shape secp256k1 (a = 0) takes.
TOYA5 = CurveSpec(
    name="toy-a5-mont64",
    field=MONT64,
    a=5,
    b=MONT64.p - 2,
    gx=1,
    gy=2,
    order=MONT64.p,  # placeholder odd value, as TOY64
    order_exact=False,
)


# Same a != -3 curve shape on the SOLINAS toy field: covers the general-a
# doubling + fused-add mix on the Solinas reduction (no reference
# counterpart — wst_curve_am3 hard-codes a = -3; here the framework stays
# generic) and guards the host table builder (oracle/window._jac_dbl) being
# generic in a.
TOYA5S = CurveSpec(
    name="toy-a5-goldilocks",
    field=GOLDILOCKS,
    a=5,
    b=GOLDILOCKS.p - 2,
    gx=1,
    gy=2,
    order=GOLDILOCKS.p,  # placeholder odd value, as TOY64
    order_exact=False,
)


# Toy *Crandall* field/curve: p = 2^61 - 1 is the Mersenne prime M61, stored
# in 64 bits (nbits - k = 3, cc = 2^3 = 8) — the 4-digit analogue of P-521's
# 2^521 - 1, running the Crandall fold (ops/crandall.py) through the kernel
# dialect in interpret mode. p = 2^61 - 1 = 3 mod 4, so sqrt works too.
CRAN64 = FieldSpec(
    name="cran61",
    p=(1 << 61) - 1,
    nbits=64,
    reduction="crandall",
)

TOYC = CurveSpec(
    name="toy-cran61",
    field=CRAN64,
    a=CRAN64.p - 3,
    b=6,
    gx=1,
    gy=2,
    order=CRAN64.p,  # placeholder odd value, as TOY64
    order_exact=False,
)


# Toy curve with an EXACT PRIME order — required wherever the order's value
# enters the arithmetic (ECDSA's mod-n scalar field, adversarial
# degenerate-scalar construction for the strict comb/window paths). Found by
# scripts/find_toy_ecdsa_curve.py: BSGS point-order inside the Hasse
# interval; N prime in the interval is the unique group order. Verified:
# N*G = inf, (N-1)*G != inf, N prime (Miller-Rabin), N < 2^64 so the mod-N
# scalar field fits the same 4-digit planes.
TOY64E = CurveSpec(
    name="toy-ecdsa-goldilocks",
    field=GOLDILOCKS,
    a=GOLDILOCKS.p - 3,
    b=354,
    gx=5,
    gy=1762323685373532378,
    order=0xFFFFFFFEA209ADB5,
)


# Toy *Tonelli-Shanks* field: p = 2^64 - 95 is prime with p = 1 (mod 8)
# (2-adicity s = 5), so the general Tonelli-Shanks sqrt path — the one
# shape neither the p = 3 (mod 4) exponent nor the Atkin p = 5 (mod 8)
# trick covers — runs its masked 4-round schedule at 4 digits. Montgomery
# reduction (no Solinas/Crandall structure). Field-only: sqrt tests need no
# curve on top.
TS64 = FieldSpec(
    name="ts64",
    p=(1 << 64) - 95,
    nbits=64,
    reduction="montgomery",
)


# Toy *GLV* curve: j-invariant 0 (a = 0) over the 32-bit prime
# p = 0xFFFFFEC5 = 1 (mod 3), with EXACT prime order n = 0xFFFF9403 = 1
# (mod 3) — the shape the GLV endomorphism split (ecsimd_tpu/glv.py)
# requires, at 2 digits so the unrolled GLV XLA twin runs in seconds on
# CPU. Found by scripts/find_toy_glv_curve.py's Cornacchia variant: the 6
# twist orders of y^2 = x^3 + b over p = a^2 + 3b^2 are known analytically;
# b = 13 selects the twist whose (prime) order is odd and 1 mod 3, verified
# by N*G = inf, (N-1)*G != inf.
GLV32 = FieldSpec(
    name="glv32",
    p=0xFFFFFEC5,
    nbits=32,
    reduction="montgomery",
)

TOYGLV = CurveSpec(
    name="toy-glv32",
    field=GLV32,
    a=0,
    b=13,
    gx=2,
    gy=213086585,
    order=0xFFFF9403,
)
