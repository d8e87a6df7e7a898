"""ecsimd_tpu — TPU-native batched elliptic-curve arithmetic.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
AVX2 library (aguinet/ecsimd): constant-time batched P-256 scalar multiplication
built on fixed-width multi-limb bignums, Montgomery modular arithmetic, GF(p)
fields, and co-Z Jacobian group law — vectorized over thousands of TPU vector
lanes per chip instead of 4 SIMD lanes, and sharded over device meshes.

Layer map (TPU analogue of SURVEY.md section 1):
  L0  TPU VPU int32 lanes via XLA/Pallas        (reference: vendored EVE SIMD)
  L0' Python ints at trace time                 (reference: vendored ctbignum)
  L1  ops.bignum — digit-plane bignum ops       (reference: bignum.h, add/sub/mul/...)
  L2  ops.mont   — Montgomery modular field     (reference: mgry*.h, modular.h)
  L3  field.GFp  — prime-field value type       (reference: gfp.h)
  L4  curves     — curve specs + points         (reference: curve*.h)
  L5  curves.group — co-Z group law + ladder    (reference: curve_group.h)
  L6  api        — batched scalar_mult facade   (reference: lib/scalar_mult_p256.cpp)
      kernels    — fused Pallas ladder megakernel (the performance path)
      parallel   — mesh sharding / multi-host   (new; pod-scale batch axis)
"""

from ecsimd_tpu.specs import (
    CURVES,
    DIGIT_BITS,
    FIELDS,
    P256,
    P256_FIELD,
    P384,
    SECP256K1_FIELD,
    CurveSpec,
    FieldSpec,
)

__version__ = "0.2.0"

__all__ = [
    "CURVES",
    "DIGIT_BITS",
    "FIELDS",
    "P256",
    "P256_FIELD",
    "P384",
    "SECP256K1_FIELD",
    "CurveSpec",
    "FieldSpec",
    "__version__",
]
