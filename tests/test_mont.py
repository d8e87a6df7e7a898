"""L2 Montgomery/modular ops vs reference mgry.cpp + ops.cpp vectors and oracle."""

import functools

import jax
import numpy as np
import pytest

import vectors as V
from ecsimd_tpu import convert, specs
from ecsimd_tpu.ops import mont as _mont
from ecsimd_tpu.oracle import field as ofield

K1 = specs.SECP256K1_FIELD
D = K1.ndigits


class _Jitted:
    """jit every mont op with the FieldSpec (and other non-array args) static."""

    _static = {
        "mod_add": (2,),
        "mod_sub": (2,),
        "mod_shift_left_one": (1,),
        "mod_shift_left": (1, 2),
        "mod_opposite": (1,),
        "mont_reduce": (1,),
        "mont_mul": (2,),
        "mont_sqr": (1,),
        "mont_from_classical": (1,),
        "mont_to_classical": (1,),
        "mont_pow_const": (1, 2),
        "mont_pow_planes": (2,),
    }

    def __getattr__(self, name):
        wrapped = jax.jit(getattr(_mont, name), static_argnums=self._static[name])
        setattr(self, name, wrapped)  # memoize so jit caches hit across calls
        return wrapped


mont = _Jitted()


def planes(vals):
    return convert.ints_to_planes(vals, D)


def planes2(vals):
    return convert.ints_to_planes(vals, 2 * D)


def ints(arr):
    return convert.planes_to_ints(arr)


def rand_mod_p(rng, n, fs=K1):
    return [rng.randrange(fs.p) for _ in range(n)]


# --- modular (non-Montgomery) ops vs ops.cpp:221-252 ---------------------------


def test_mod_add_vectors():
    a = planes([x for x, _, _ in V.MOD_ADD])
    b = planes([y for _, y, _ in V.MOD_ADD])
    assert ints(mont.mod_add(a, b, K1)) == [z for _, _, z in V.MOD_ADD]


def test_mod_sub_vectors():
    a = planes([x for x, _, _ in V.MOD_SUB])
    b = planes([y for _, y, _ in V.MOD_SUB])
    assert ints(mont.mod_sub(a, b, K1)) == [z for _, _, z in V.MOD_SUB]


def test_mod_shift_left_one_vectors():
    a = planes([x for x, _ in V.MOD_SHL1])
    assert ints(mont.mod_shift_left_one(a, K1)) == [y for _, y in V.MOD_SHL1]


def test_mod_ops_random(rng):
    av, bv = rand_mod_p(rng, 16), rand_mod_p(rng, 16)
    a, b = planes(av), planes(bv)
    assert ints(mont.mod_add(a, b, K1)) == [(x + y) % K1.p for x, y in zip(av, bv)]
    assert ints(mont.mod_sub(a, b, K1)) == [(x - y) % K1.p for x, y in zip(av, bv)]
    assert ints(mont.mod_shift_left(a, 3, K1)) == [(x << 3) % K1.p for x in av]
    assert ints(mont.mod_opposite(a, K1)) == [(-x) % K1.p for x in av]
    assert ints(mont.mod_opposite(planes([0, 1]), K1)) == [0, K1.p - 1]


# --- Montgomery reduce / mul vs mgry.cpp -----------------------------------------


def test_mont_reduce_reference_pairs():
    for a, b in V.MGRY_REDUCE_PAIRS:
        t = planes2([a * b])
        want = ofield.mont_reduce(a * b, K1)
        assert ints(mont.mont_reduce(t, K1)) == [want]


def test_mont_from_to_roundtrip_vectors():
    a = planes(V.MGRY_FROMTO)
    m = mont.mont_from_classical(a, K1)
    assert ints(m) == [ofield.mont_from_classical(x, K1) for x in V.MGRY_FROMTO]
    back = mont.mont_to_classical(m, K1)
    assert ints(back) == list(V.MGRY_FROMTO)


def test_mont_ops_vectors():
    ma = mont.mont_from_classical(planes([V.MGRY_OPS_A]), K1)
    mb = mont.mont_from_classical(planes([V.MGRY_OPS_B]), K1)
    assert ints(mont.mont_to_classical(mont.mod_add(ma, mb, K1), K1)) == [V.MGRY_OPS_ADD]
    assert ints(mont.mont_to_classical(mont.mod_sub(ma, mb, K1), K1)) == [V.MGRY_OPS_SUB_AB]
    assert ints(mont.mont_to_classical(mont.mod_sub(mb, ma, K1), K1)) == [V.MGRY_OPS_SUB_BA]


@pytest.mark.parametrize("e,want", V.MGRY_OPS_POW)
def test_mont_pow_vectors(e, want):
    ma = mont.mont_from_classical(planes([V.MGRY_OPS_A]), K1)
    got = mont.mont_to_classical(mont.mont_pow_const(ma, e, K1), K1)
    assert ints(got) == [want]


def test_mont_mul_sqr_random_vs_oracle(rng):
    av, bv = rand_mod_p(rng, 16), rand_mod_p(rng, 16)
    a, b = planes(av), planes(bv)
    am = mont.mont_from_classical(a, K1)
    bm = mont.mont_from_classical(b, K1)
    amv = [ofield.mont_from_classical(x, K1) for x in av]
    bmv = [ofield.mont_from_classical(x, K1) for x in bv]
    assert ints(mont.mont_mul(am, bm, K1)) == [
        ofield.mont_mul(x, y, K1) for x, y in zip(amv, bmv)
    ]
    assert ints(mont.mont_sqr(am, K1)) == [ofield.mont_sqr(x, K1) for x in amv]


def test_mont_mul_edge_values():
    edge = [0, 1, 2, K1.p - 1, K1.p - 2, K1.R_mod_p, (1 << 255) % K1.p]
    a, b = planes(edge), planes(edge[::-1])
    assert ints(mont.mont_mul(a, b, K1)) == [
        ofield.mont_mul(x, y, K1) for x, y in zip(edge, edge[::-1])
    ]


def test_mont_pow_planes_per_lane(rng):
    av = rand_mod_p(rng, 4)
    ev = [rng.getrandbits(256) for _ in range(4)]
    am = mont.mont_from_classical(planes(av), K1)
    got = mont.mont_pow_planes(am, planes(ev), K1)
    want = [
        ofield.mont_pow(ofield.mont_from_classical(x, K1), e, K1) for x, e in zip(av, ev)
    ]
    assert ints(got) == want


def test_mont_p384(rng):
    fs = specs.P384_FIELD
    av = rand_mod_p(rng, 4, fs)
    bv = rand_mod_p(rng, 4, fs)
    a = convert.ints_to_planes(av, fs.ndigits)
    b = convert.ints_to_planes(bv, fs.ndigits)
    am, bm = mont.mont_from_classical(a, fs), mont.mont_from_classical(b, fs)
    got = ints(mont.mont_to_classical(mont.mont_mul(am, bm, fs), fs))
    assert got == [x * y % fs.p for x, y in zip(av, bv)]


def _removed_test_mont_mul_jit():
    import jax

    a = planes([V.MGRY_OPS_A, V.MGRY_OPS_B])
    am = jax.jit(mont.mont_from_classical, static_argnums=1)(a, K1)
    out = jax.jit(mont.mont_mul, static_argnums=2)(am, am, K1)
    want = [
        ofield.mont_mul(ofield.mont_from_classical(x, K1), ofield.mont_from_classical(x, K1), K1)
        for x in (V.MGRY_OPS_A, V.MGRY_OPS_B)
    ]
    assert ints(out) == want


def test_gfp_pow_planes_solinas(rng):
    """Per-lane exponents through the generic GFp.pow_planes (solinas field)."""
    import jax.numpy as jnp

    from ecsimd_tpu import convert
    from ecsimd_tpu.field import GFp
    from ecsimd_tpu.specs import P256_FIELD

    fs = P256_FIELD
    d = fs.ndigits
    xs = [rng.randrange(1, fs.p) for _ in range(4)]
    es = [0x10001, 2, fs.p - 2, rng.randrange(fs.p)]
    x = GFp.from_classical(jnp.asarray(convert.ints_to_planes(xs, d)), fs)
    e = jnp.asarray(convert.ints_to_planes(es, d))
    got = convert.planes_to_ints(x.pow_planes(e).to_classical())
    assert got == [pow(a, b, fs.p) for a, b in zip(xs, es)]
