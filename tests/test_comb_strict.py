"""Strict (complete-add) comb chain: adversarial degenerate scalars.

The plain comb chain documents a measure-zero degenerate class — scalars
whose prefix sums collide with a table entry (doubling / opposite) or hit
infinity mid-chain (kernels/comb.py:31-34). ``strict=True`` replaces the
mixed adds with complete adds (kernels/coz.add_complete_any), making the
chain total on [1, order). This file CONSTRUCTS scalars inside the
degenerate class on the exact-prime-order toy curve (tests/toy.TOY64E) and
checks, per class:

  * the strict kernel chain (interpret) and the strict XLA twin agree with
    the independent naive double-and-add oracle, and
  * the plain chain actually corrupts these lanes (documents that the test
    bites — the collision formulas produce garbage, not accidental truth).

Construction: the w=8 signed-odd recoding satisfies the closed-form prefix
identity  prefix(k, i) = 2^64 + sum_{j<=i} d_j 2^8j  with
prefix(k, 7) = k|1 (verified below), and prefix(k, 5) spans an interval of
width ~2^57 around 2^64 that contains the group order n — so a fixed-point
iteration on k solves prefix(k,5) = n (mid-chain infinity), n + d_6 2^48
(accumulator equals the next entry: doubling), and n - d_6 2^48
(accumulator equals its opposite: infinity at the add).
"""

import numpy as np
import pytest

from ecsimd_tpu import api, convert
from ecsimd_tpu.kernels import comb
from ecsimd_tpu.oracle import coz
from tests.toy import TOY64E

N = TOY64E.order
NPOS = 8


def _recode(k):
    return [2 * (((k >> (8 * i)) & 511) >> 1) - 255 for i in range(NPOS)]


def _prefix(k, i):
    d = _recode(k | 1)
    return (1 << 64) + sum(d[j] << (8 * j) for j in range(i + 1))


def _solve(seed_k, target_fn):
    """Fixed-point: adjust k until prefix(k, 5) hits target_fn(digits(k))."""
    k = seed_k | 1
    for _ in range(100):
        t = target_fn(_recode(k | 1))
        r = t - _prefix(k, 5)
        if r == 0:
            return k
        k = k + r
        if not (1 <= k < N):
            k = (k % N) | 1
    raise AssertionError("no adversarial k found")


def _adversarial_batch(rng):
    k_inf = _solve(rng.randrange(1, N), lambda d: N)
    k_dbl = _solve(rng.randrange(1, N), lambda d: N + (d[6] << 48))
    k_opp = _solve(rng.randrange(1, N), lambda d: N - (d[6] << 48))
    ks = [k_inf, k_dbl, k_opp]
    ks += [k - 1 for k in ks if k - 1 >= 1]  # even variants: same chain + fixup
    ks.append(N - 1)  # chain ends at infinity, fixup resolves inf - B = -B
    ks.append(rng.randrange(1, N))  # a benign control lane
    assert _prefix(k_inf, 5) % N == 0
    assert (_prefix(k_dbl, 5) - (_recode(k_dbl | 1)[6] << 48)) % N == 0
    assert (_prefix(k_opp, 5) + (_recode(k_opp | 1)[6] << 48)) % N == 0
    return ks


def _run(ks, **kw):
    scalars = api.scalars_from_ints(ks, TOY64E)
    pt = comb.scalar_mult_base(scalars, TOY64E, **kw)
    p = TOY64E.field.p
    out = []
    for X, Y, Z in zip(convert.planes_to_ints(np.asarray(pt.x.to_classical())),
                       convert.planes_to_ints(np.asarray(pt.y.to_classical())),
                       convert.planes_to_ints(np.asarray(pt.z.to_classical()))):
        if Z == 0:
            out.append(None)
            continue
        zi = pow(Z, p - 2, p)
        out.append((X * zi * zi % p, Y * zi * zi * zi % p))
    return out


def test_prefix_identity(rng):
    for _ in range(20):
        k = rng.randrange(1, 1 << 64)
        assert _prefix(k, NPOS - 1) == (k | 1)


@pytest.mark.parametrize("path", ["kernel", "xla"])
def test_strict_comb_adversarial(rng, path):
    ks = _adversarial_batch(rng)
    want = [coz.naive_scalar_mult(k, TOY64E.gx, TOY64E.gy, TOY64E) for k in ks]
    kw = (dict(use_kernel=True, interpret=True, tile=len(ks))
          if path == "kernel" else dict(use_kernel=False))
    got = _run(ks, strict=True, **kw)
    assert got == want
    # the plain chain must corrupt the constructed lanes (collision formulas
    # degenerate); the benign control lane stays correct
    plain = _run(ks, strict=False, **kw)
    assert plain[-1] == want[-1]
    assert all(plain[i] != want[i] for i in range(3))
