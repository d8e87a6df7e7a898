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
)
