"""L1 digit-plane bignum ops vs reference ops.cpp vectors + Python-int oracle.

Per-lane-distinct inputs are used throughout (closing the lane-uniformity gap
noted in SURVEY.md section 4).
"""

import numpy as np
import pytest

import vectors as V
from ecsimd_tpu import convert
from ecsimd_tpu.ops import bignum as bn

D128, D256 = 8, 16
M128 = (1 << 128) - 1
M256 = (1 << 256) - 1


def planes(vals, d):
    return convert.ints_to_planes(vals, d)


def ints(arr):
    return convert.planes_to_ints(arr)


def rand_ints(rng, n, bits):
    return [rng.getrandbits(bits) for _ in range(n)]


# --- reference vectors (tests/ops.cpp) ---------------------------------------


def test_add_vectors_ops128():
    a = planes([x for x, _, _ in V.OPS128_ADD], D128)
    b = planes([y for _, y, _ in V.OPS128_ADD], D128)
    want = [z for _, _, z in V.OPS128_ADD]
    assert ints(bn.add_no_carry(a, b)) == want


def test_sub_vectors_ops128():
    a = planes([x for x, _, _ in V.OPS128_SUB], D128)
    b = planes([y for _, y, _ in V.OPS128_SUB], D128)
    want = [z for _, _, z in V.OPS128_SUB]
    assert ints(bn.sub_no_carry(a, b)) == want


def test_sub_if_above_per_lane_distinct():
    a = planes([x for x, _, _ in V.OPS128_SUB_IF_ABOVE], D128)
    b = planes([y for _, y, _ in V.OPS128_SUB_IF_ABOVE], D128)
    want = [z for _, _, z in V.OPS128_SUB_IF_ABOVE]
    assert ints(bn.sub_if_above(a, b)) == want


@pytest.mark.parametrize("bits,a,b,want", V.OPS_MUL)
def test_mul_vectors(bits, a, b, want):
    d = bits // 16
    out = bn.mul(planes([a], d), planes([b], d))
    assert ints(out) == [want]


def test_limb_mul_vector():
    a, w, want = V.OPS_LIMB_MUL
    out = bn.limb_mul(planes([a], D128), w)
    assert ints(out) == [want]


@pytest.mark.parametrize("bits,a,want", V.OPS_SQR)
def test_square_vectors(bits, a, want):
    d = bits // 16
    assert ints(bn.square(planes([a], d))) == [want]


def test_cmp_vectors():
    a, b = V.OPS_CMP_LT
    pa, pb = planes([a], D128), planes([b], D128)
    assert bn.cmp_lt(pa, pb).tolist() == [1]
    assert bn.cmp_le(pa, pb).tolist() == [1]
    assert bn.cmp_le(pa, pa).tolist() == [1]
    assert bn.cmp_gt(pb, pa).tolist() == [1]
    assert bn.cmp_ge(pb, pa).tolist() == [1]
    assert bn.cmp_ge(pa, pa).tolist() == [1]
    assert bn.cmp_lt(pb, pa).tolist() == [0]
    assert bn.cmp_gt(pa, pb).tolist() == [0]


def test_shift_left_one_per_lane_carries():
    a = planes([x for x, _, _ in V.OPS_SHL1], D128)
    out, carry = bn.shift_left_one(a)
    assert ints(out) == [y for _, y, _ in V.OPS_SHL1]
    assert carry.tolist() == [c for _, _, c in V.OPS_SHL1]


def test_swap_if_per_lane():
    # masked swap with per-lane-distinct mask (tests/ops.cpp:179-208 analogue)
    rngv = [(i * 0x9E3779B97F4A7C15) % (1 << 128) for i in range(4)]
    a = planes(rngv, D128)
    b = planes(rngv[::-1], D128)
    mask = np.array([1, 0, 0, 1], dtype=np.int32)
    na, nb = bn.swap_if(mask, a, b)
    ia, ib = ints(na), ints(nb)
    for lane in range(4):
        if mask[lane]:
            assert ia[lane] == rngv[::-1][lane] and ib[lane] == rngv[lane]
        else:
            assert ia[lane] == rngv[lane] and ib[lane] == rngv[::-1][lane]
    z = np.zeros(4, dtype=np.int32)
    na, nb = bn.swap_if(z, a, b)
    assert ints(na) == rngv and ints(nb) == rngv[::-1]


# --- randomized differential vs Python ints ----------------------------------


def test_add_sub_random(rng):
    av = rand_ints(rng, 64, 256)
    bv = rand_ints(rng, 64, 256)
    a, b = planes(av, D256), planes(bv, D256)
    s, carry = bn.add(a, b)
    assert ints(s) == [(x + y) & M256 for x, y in zip(av, bv)]
    assert carry.tolist() == [(x + y) >> 256 for x, y in zip(av, bv)]
    d, borrow = bn.sub(a, b)
    assert ints(d) == [(x - y) & M256 for x, y in zip(av, bv)]
    assert borrow.tolist() == [int(x < y) for x, y in zip(av, bv)]


def test_mul_square_random(rng):
    av = rand_ints(rng, 32, 256)
    bv = rand_ints(rng, 32, 256)
    a, b = planes(av, D256), planes(bv, D256)
    assert ints(bn.mul(a, b)) == [x * y for x, y in zip(av, bv)]
    assert ints(bn.square(a)) == [x * x for x in av]


def test_mul_edge_values():
    edge = [0, 1, M256, M256 - 1, 1 << 255, (1 << 128) - 1, (1 << 128) + 1]
    a = planes(edge, D256)
    b = planes(edge[::-1], D256)
    assert ints(bn.mul(a, b)) == [x * y for x, y in zip(edge, edge[::-1])]


def test_digit_mul_random(rng):
    av = rand_ints(rng, 16, 256)
    qv = [rng.getrandbits(16) for _ in range(16)]
    out = bn.digit_mul(planes(av, D256), np.array(qv, dtype=np.int32))
    assert ints(out) == [x * q for x, q in zip(av, qv)]


def test_bit_mask_random(rng):
    av = rand_ints(rng, 8, 256)
    a = planes(av, D256)
    for bit in [0, 1, 15, 16, 17, 63, 64, 255]:
        assert bn.bit_mask(a, bit).tolist() == [(x >> bit) & 1 for x in av]


def test_pad_truncate_digit_shifts(rng):
    av = rand_ints(rng, 8, 128)
    a = planes(av, D128)
    assert ints(bn.pad(a, D256)) == av
    assert ints(bn.truncate(bn.pad(a, D256), D128)) == av
    assert ints(bn.digit_shift_left(a, 3)) == [(x << 48) for x in av]
    assert ints(bn.digit_shift_right(bn.digit_shift_left(a, 3), 3)) == av
    assert ints(bn.digit_shift_right(a, 2)) == [x >> 32 for x in av]


# --- serialization round-trips (serialization.h analogue) ---------------------


def test_bytes_be_roundtrip(rng):
    av = rand_ints(rng, 8, 256)
    p = planes(av, D256)
    raw = convert.planes_to_bytes_be(p)
    assert len(raw) == 8 * 32
    # big-endian check on first value
    assert int.from_bytes(raw[:32], "big") == av[0]
    back = convert.bytes_be_to_planes(raw, D256)
    assert ints(back) == av


def test_broadcast_int():
    p = convert.broadcast_int(V.FROMX_X, D256, 5)
    assert ints(p) == [V.FROMX_X] * 5


def test_jit_compatibility(rng):
    import jax

    av, bv = rand_ints(rng, 8, 256), rand_ints(rng, 8, 256)
    a, b = planes(av, D256), planes(bv, D256)
    out = jax.jit(bn.mul)(a, b)
    assert ints(out) == [x * y for x, y in zip(av, bv)]
