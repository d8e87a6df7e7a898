"""Multi-scalar multiplication (api.multi_scalar_mult / group.batch_sum):
sum_i k_i * P_i — beyond the reference (its SIMD lanes never communicate).

Oracle: an independent Python-int COMPLETE affine adder (None = infinity,
equal/opposite handled) over naive per-lane multiples. Adversarial batches
place equal, opposite, and infinity-producing partial sums in the tree."""

import numpy as np
import pytest

from ecsimd_tpu import api, convert
from ecsimd_tpu.oracle import coz
from ecsimd_tpu.specs import P256
from tests.toy import TOY64E


def _aff_add(p1, p2, curve):
    """Complete affine add on Python ints; None encodes infinity."""
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    p = curve.p
    (x1, y1), (x2, y2) = p1, p2
    if x1 == x2:
        if (y1 + y2) % p == 0:
            return None
        lam = (3 * x1 * x1 + curve.a) * pow(2 * y1, -1, p) % p
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
    x3 = (lam * lam - x1 - x2) % p
    return (x3, (lam * (x1 - x3) - y1) % p)


def _oracle_msm(ks, pts, curve):
    acc = None
    for k, (x, y) in zip(ks, pts):
        acc = _aff_add(acc, coz.naive_scalar_mult(k, x, y, curve), curve)
    return acc


def _got(res, curve):
    if bool(np.asarray(res.z.is_zero())[0]):
        return None
    p = curve.p
    X = convert.planes_to_ints(np.asarray(res.x.to_classical()))[0]
    Y = convert.planes_to_ints(np.asarray(res.y.to_classical()))[0]
    Z = convert.planes_to_ints(np.asarray(res.z.to_classical()))[0]
    zi = pow(Z, p - 2, p)
    return (X * zi * zi % p, Y * zi * zi * zi % p)


def _run(ks, pts, curve, **kw):
    scalars = api.scalars_from_ints(ks, curve)
    points = api.points_from_ints([x for x, _ in pts], [y for _, y in pts], curve)
    return _got(api.multi_scalar_mult(scalars, points, **kw), curve)


def test_msm_toy_random(rng):
    """Batch 9 (odd: exercises every odd-tail carry) on the exact-order toy
    curve through the window path (interpret -> XLA twin)."""
    curve = TOY64E
    ks = [rng.randrange(1, curve.order) for _ in range(9)]
    pts = [coz.scalar_mult_affine(rng.randrange(1, curve.order),
                                  curve.gx, curve.gy, curve) for _ in range(9)]
    want = _oracle_msm(ks, pts, curve)
    assert _run(ks, pts, curve, use_kernel=True, interpret=True, tile=16) == want


def test_msm_toy_adversarial(rng):
    """Colliding partial sums inside the reduction tree: equal points
    (doubling), opposite points (infinity mid-tree), and a batch whose TOTAL
    is infinity."""
    curve = TOY64E
    g = (curve.gx, curve.gy)
    q = coz.scalar_mult_affine(7, *g, curve)
    qneg = (q[0], (curve.p - q[1]) % curve.p)

    # equal lanes -> first tree level doubles
    assert _run([3, 3], [q, q], curve, interpret=True, tile=16) == \
        _oracle_msm([3, 3], [q, q], curve)
    # opposite partial sums -> infinity at level 1, then resurrected
    ks = [5, 5, 2]
    pts = [q, qneg, q]
    assert _run(ks, pts, curve, interpret=True, tile=16) == _oracle_msm(ks, pts, curve)
    # total sum == infinity
    assert _run([5, 5], [q, qneg], curve, interpret=True, tile=16) is None
    # k*G + (order-k)*G == infinity through the strict per-lane mults
    k = rng.randrange(2, curve.order - 1)
    assert _run([k, curve.order - k], [g, g], curve, interpret=True, tile=16) is None


def test_msm_p256(rng):
    """P-256 through the XLA ladder path (use_kernel=False), batch 5."""
    curve = P256
    ks = [rng.randrange(1, curve.order - 1) for _ in range(5)]
    pts = [coz.scalar_mult_affine(rng.randrange(1, curve.order),
                                  curve.gx, curve.gy, curve) for _ in range(5)]
    want = _oracle_msm(ks, pts, curve)
    assert _run(ks, pts, curve, use_kernel=False) == want
