"""P-384 coverage: the framework is generic over wst_curve_am3-style curves
(the reference hard-codes P-256; SURVEY.md §2 curve concept, curve.h:12-15).
Oracle is the same Python-int co-Z implementation, which naive-double-and-add
cross-checks (test_oracle)."""

import pytest

from ecsimd_tpu import api, convert
from ecsimd_tpu.curves import group
from ecsimd_tpu.curves.point import JacobianPoint
from ecsimd_tpu.oracle import coz
from ecsimd_tpu.specs import P384


def test_oracle_p384_self_check(rng):
    k = rng.randrange(1, P384.order)
    assert coz.scalar_mult_affine(k, P384.gx, P384.gy, P384) == coz.naive_scalar_mult(
        k, P384.gx, P384.gy, P384
    )


def test_p384_group_law_vs_oracle(rng):
    pts = [coz.scalar_mult_affine(rng.randrange(1, P384.order), P384.gx, P384.gy, P384) for _ in range(4)]
    batch = JacobianPoint.from_affine(
        api.points_from_ints([x for x, _ in pts], [y for _, y in pts], P384)
    )
    dbl, upd = group.point_dblu(batch)
    want = [coz.dblu((x, y, 1), P384) for x, y in pts]

    def triples(pt):
        return list(
            zip(
                convert.planes_to_ints(pt.x.to_classical()),
                convert.planes_to_ints(pt.y.to_classical()),
                convert.planes_to_ints(pt.z.to_classical()),
            )
        )

    assert triples(dbl) == [w[0] for w in want]
    assert triples(upd) == [w[1] for w in want]


def test_p384_scalar_mult(rng):
    from tests.helpers import ladder_xy_host

    ks = [5, 2, rng.randrange(1, P384.order), 1]
    want = [coz.scalar_mult_affine(k, P384.gx, P384.gy, P384) for k in ks]
    # jitted-single-step ladder: since the r4 jaxlib update, XLA:CPU's
    # compile of full-width while-graph ladders at d >= 24 balloons past
    # 25 GB and its cache serialization of the result segfaults
    # (tests/helpers.ladder_xy_host / CLAUDE.md; d = 16 curves unaffected)
    assert ladder_xy_host(ks, P384) == want


def test_p384_comb_tree(rng):
    """Fixed-base comb on P-384 through the eager tree twin — npos = 48
    exercises the odd-level carry path of the pairwise tree (24 -> 12 -> 6
    -> 3 -> 2 -> 1)."""
    import numpy as np

    from ecsimd_tpu.kernels import comb

    ks = [1, 2, 5, 256] + [rng.randrange(1, P384.order) for _ in range(3)]
    scalars = api.scalars_from_ints(ks, P384)
    pt = comb.scalar_mult_base(scalars, P384, use_kernel=False, chain="tree")
    p = P384.field.p
    got = []
    for X, Y, Z in zip(convert.planes_to_ints(np.asarray(pt.x.planes)),
                       convert.planes_to_ints(np.asarray(pt.y.planes)),
                       convert.planes_to_ints(np.asarray(pt.z.planes))):
        zi = pow(Z, p - 2, p)
        got.append((X * zi * zi % p, Y * zi * zi * zi % p))
    assert got == [coz.scalar_mult_affine(k, P384.gx, P384.gy, P384) for k in ks]
