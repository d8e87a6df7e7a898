"""Pure-Python arbitrary-precision oracle.

Plays the role ctbignum plays for the reference (scalar differential oracle in
tests, ``tests/mgry.cpp:52-76``) and of the ``work/`` Python prototypes
(algorithm-level validation, ``work/coz.py``, ``work/coz_swap.py``): every TPU
kernel must agree bit-exactly with these functions.
"""

from ecsimd_tpu.oracle.field import (
    mont_from_classical,
    mont_mul,
    mont_pow,
    mont_reduce,
    mont_to_classical,
)
from ecsimd_tpu.oracle.coz import (
    add_z2_1,
    dblu,
    jacobian_to_affine,
    point_opposite,
    scalar_mult,
    tplu,
    zaddu,
    zdau,
)

__all__ = [
    "mont_from_classical",
    "mont_mul",
    "mont_pow",
    "mont_reduce",
    "mont_to_classical",
    "add_z2_1",
    "dblu",
    "jacobian_to_affine",
    "point_opposite",
    "scalar_mult",
    "tplu",
    "zaddu",
    "zdau",
]
