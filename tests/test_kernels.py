"""Pallas kernel tests (interpret mode on CPU — same trace as the TPU kernel).

The compiled-mode equivalence TPU run happens in bench.py (which spot-checks
lane 0 against the Python-int oracle on real hardware).
"""

import numpy as np

import tests.vectors as V
from ecsimd_tpu import api, convert
from ecsimd_tpu.curves.point import JacobianPoint
from ecsimd_tpu.kernels import ladder
from ecsimd_tpu.oracle import coz
from ecsimd_tpu.specs import P256


def test_ladder_kernel_vs_oracle(rng):
    ks = [k for k, _, _ in V.SCALAR_MULT_KATS]  # 3 KATs
    ks += [2, 6, rng.randrange(1, P256.order), 1, 3]  # even lanes + random
    g = api.generator_batch(P256, len(ks))
    jg = JacobianPoint.from_affine(g)

    res = ladder.scalar_mult(api.scalars_from_ints(ks, P256), jg, tile=4, interpret=True)
    aff = res.to_affine()
    got = list(zip(convert.planes_to_ints(aff.x), convert.planes_to_ints(aff.y)))
    want = [coz.scalar_mult_affine(k, P256.gx, P256.gy, P256) for k in ks]
    assert got == want


def test_ladder_kernel_distinct_points(rng):
    ks, pts = [], []
    for _ in range(4):
        ks.append(rng.randrange(1, P256.order))
        pts.append(coz.scalar_mult_affine(rng.randrange(2, P256.order), P256.gx, P256.gy, P256))
    aff = api.points_from_ints([p[0] for p in pts], [p[1] for p in pts], P256)
    jg = JacobianPoint.from_affine(aff)
    res = ladder.scalar_mult(api.scalars_from_ints(ks, P256), jg, tile=4, interpret=True)
    out = res.to_affine()
    got = list(zip(convert.planes_to_ints(out.x), convert.planes_to_ints(out.y)))
    want = [coz.scalar_mult_affine(k, x, y, P256) for k, (x, y) in zip(ks, pts)]
    assert got == want
