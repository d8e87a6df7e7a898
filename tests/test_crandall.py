"""Crandall fold reduction (ops/crandall.py) — differential vs Python ints.

The reference has no per-prime fast reduction (its only strategy is CIOS
Montgomery, mgry_mul.h:84-121); these tests hold the Crandall path to the
same bit-exactness contract as the Solinas path (tests/test_mont.py model):
every output equals the arbitrary-precision result, for canonical and
non-canonical (>= p) inputs, across both dialects and all fused variants.
"""

import random

import jax.numpy as jnp
import pytest

from ecsimd_tpu import convert
from ecsimd_tpu.kernels import digits as dg
from ecsimd_tpu.ops import crandall
from ecsimd_tpu.specs import FieldSpec, P521_FIELD, W25519_FIELD


def make_planes(vals, d):
    return convert.ints_to_planes(vals, d)


def planes_to_ints(arr):
    return convert.planes_to_ints(arr)

FIELDS = [P521_FIELD, W25519_FIELD]
IDS = [f.name for f in FIELDS]


def _cases(fs, rng, n):
    edge = [0, 1, 2, fs.p - 1, fs.p - 2, fs.p, fs.p + 12345, (1 << fs.nbits) - 1]
    return edge + [rng.randrange(1 << fs.nbits) for _ in range(n - len(edge))]


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)


@pytest.mark.parametrize("fs", FIELDS, ids=IDS)
def test_fast_mul_sqr_vs_ints(fs, rng):
    av = _cases(fs, rng, 10)
    bv = list(reversed(_cases(fs, rng, 10)))
    a = make_planes(av, fs.ndigits)
    b = make_planes(bv, fs.ndigits)
    for scale in (1, 2, 3, 4, 8):
        got = planes_to_ints(crandall.fast_mul(a, b, fs, scale))
        assert got == [(scale * x * y) % fs.p for x, y in zip(av, bv)]
        got = planes_to_ints(crandall.fast_sqr(a, fs, scale))
        assert got == [(scale * x * x) % fs.p for x in av]


@pytest.mark.parametrize("fs", FIELDS, ids=IDS)
def test_kernel_dialect_matches(fs, rng):
    """digit-list (Pallas-dialect) path, incl. scaled + fused combos."""
    av = _cases(fs, rng, 10)
    bv = list(reversed(_cases(fs, rng, 10)))
    d = fs.ndigits
    a = make_planes(av, d)
    b = make_planes(bv, d)
    al = [a[k] for k in range(d)]
    bl = [b[k] for k in range(d)]
    got = planes_to_ints(jnp.stack(dg.field_mul(al, bl, fs)))
    assert got == [(x * y) % fs.p for x, y in zip(av, bv)]
    got = planes_to_ints(jnp.stack(dg.field_sqr(al, fs)))
    assert got == [(x * x) % fs.p for x in av]
    got = planes_to_ints(jnp.stack(dg.field_mul_scaled(al, bl, fs, 8)))
    assert got == [(8 * x * y) % fs.p for x, y in zip(av, bv)]
    # signed fused combination: a^2 - 2ab + 3b (grids + digit rows)
    ga = dg._grid(al, al, d)
    gb = dg._grid(al, bl, d)
    got = planes_to_ints(jnp.stack(dg.reduce_combo([(ga, 1), (gb, -2), (bl, 3)], fs)))
    assert got == [(x * x - 2 * x * y + 3 * y) % fs.p for x, y in zip(av, bv)]


@pytest.mark.parametrize("fs", FIELDS, ids=IDS)
def test_plan_proofs_hold(fs):
    """The trace-time interval proofs accept the grid bounds actually used."""
    d = fs.ndigits
    for scale in (1, 8):
        # the PRODUCTION bound (grid_col_bound), not a weaker stand-in:
        # (2d+2)*scale*2^16 exceeds scale<<22 for P-521 (ADVICE r4)
        plan = crandall._plan(fs, 2 * d + 1, crandall.grid_col_bound(fs, scale))
        assert plan.nbitfold >= 1  # 2^nbits >> 2p for these fields
        assert plan.cc == (1 << fs.nbits) % fs.p


def test_non_crandall_prime_rejected():
    """A generic prime must fail the spec's Crandall validation loudly."""
    with pytest.raises(AssertionError):
        FieldSpec(
            name="bad",
            p=0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F,
            nbits=256,
            reduction="crandall",
        )  # secp256k1: 2^256 - 2^32 - 977 -> cc = 2^32 + 977, too large


def test_gfp_plain_domain(rng):
    """GFp over a Crandall field stores plain residues; inverse round-trips."""
    from ecsimd_tpu.field import GFp

    for fs in FIELDS:
        vals = [rng.randrange(1, fs.p) for _ in range(4)]
        g = GFp.from_classical(make_planes(vals, fs.ndigits), fs)
        assert planes_to_ints(g.planes) == vals  # identity conversion
        assert planes_to_ints((g * g.inverse()).to_classical()) == [1] * 4


def test_default_fori_ladder_crandall(rng):
    """The PRODUCTION fori_loop ladder graph over a Crandall field, compiled
    and run (d = 4 TOYC compiles in seconds on XLA:CPU). The big crandall
    curves (P-521/Wei25519) run host_loop in this suite for compile-RSS
    reasons (CLAUDE.md), which would otherwise leave the default ladder path
    over crandall fields with zero CPU compile coverage (ADVICE r4)."""
    from ecsimd_tpu import api
    from ecsimd_tpu.oracle import coz
    from tests.toy import TOYC

    ks = [rng.randrange(1, TOYC.p // 2) for _ in range(4)]
    g = api.generator_batch(TOYC, len(ks))
    res = api.scalar_mult(api.scalars_from_ints(ks, TOYC), g)
    got = list(zip(planes_to_ints(res.x), planes_to_ints(res.y)))
    assert got == [coz.scalar_mult_affine(k, TOYC.gx, TOYC.gy, TOYC) for k in ks]


def test_p521_negative_combo_offset(rng):
    """The P-521 fused-formula column shape (ncols = 2d+1, col_lo = -8x grid
    bound) needs an offset one bit beyond d+2 16-bit digits; the plan now
    carries the excess in the top SLOT (int32), which this differential
    pins: a^2 - 8*b reduced in one combo == ints (r5; was an AssertionError
    that excluded the P-521 window/comb kernels entirely)."""
    import jax.numpy as jnp

    from ecsimd_tpu.kernels import digits as dg
    from ecsimd_tpu.specs import P521

    fs = P521.field
    d = fs.ndigits
    vals_a = [rng.randrange(fs.p) for _ in range(4)]
    vals_b = [rng.randrange(fs.p) for _ in range(4)]
    al = [jnp.asarray(convert.ints_to_planes(vals_a, d))[k] for k in range(d)]
    bl = [jnp.asarray(convert.ints_to_planes(vals_b, d))[k] for k in range(d)]
    ga = dg._grid(al, al, d)
    gb = dg._grid(al, bl, d)
    got = planes_to_ints(jnp.stack(dg.reduce_combo([(ga, 1), (gb, -8)], fs)))
    assert got == [(x * x - 8 * x * y) % fs.p for x, y in zip(vals_a, vals_b)]
