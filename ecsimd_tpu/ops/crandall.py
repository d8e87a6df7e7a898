"""Fast fold reduction for Crandall primes p = 2^k - c (small c).

The reference's only reduction strategy is generic-prime Montgomery CIOS
(``mgry_mul.h:84-121``); its compile-time constants make that free of
per-prime cost on CPUs. On the TPU VPU the CIOS q*p multiplies are ~half of
every field multiply, so primes of Crandall form — P-521's Mersenne
2^521 - 1, Curve25519's 2^255 - 19 — get a multiply-light fold instead: the
digit-plane analogue of the classic "high part times c folds into the low
part" reduction (Crandall's patent trick, generalized by Solinas 1999).

Relation to ops/solinas.py: Solinas requires 2^nbits mod p to decompose into
few word-aligned +-1/+-2 terms (NIST P-256/P-384). Here the only requirement
is cc = 2^nbits mod p = c * 2^(nbits - k) small enough that cc * column fits
int32 — every high product column folds down d digit positions with one
small scalar multiplier. Values are plain residues in [0, p), same domain as
Solinas fields (the mgry.h:47-55 conversions become identities).

The epilogue differs from Solinas' single conditional subtract: 2^nbits may
be far above 2p (P-521 stores 521 bits in 528), so bit-aligned folds at k
(value = (value mod 2^k) + c * (value >> 2^k)) bring the bound under 2p
before the one conditional subtract.

Every bound is proven by interval arithmetic at trace time (_plan), the same
discipline as ops/solinas._plan / ops/mont.py; the kernel dialect
(kernels/digits._crandall_reduce_list) reuses the same plan and the same
list-based core, so both dialects share one proof.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from ecsimd_tpu.ops.solinas import _signed_normalize
from ecsimd_tpu.specs import DIGIT_BITS, DIGIT_MASK, FieldSpec, int_to_digits

I32 = jnp.int32


def grid_col_bound(fs: FieldSpec, scale: int = 1) -> int:
    """Proven upper bound for schoolbook product-grid columns: each column
    accumulates <= d lo parts (< 2^16) + d hi parts (< 2^16) for the full
    grid (ops/mont._product_columns, kernels/digits._grid), and <= (2d+2)
    such parts for the doubled-off-diagonal squaring grids — NOT the 2^22
    constant the d <= 24 Solinas fields use (d = 33 P-521 columns exceed
    2^22)."""
    return (2 * fs.ndigits + 2) * scale << DIGIT_BITS


class _Plan(NamedTuple):
    cc: int  # 2^nbits mod p = c << (nbits - k)
    c: int  # 2^k - p
    kr: int  # k mod 16 (bit offset of the fold point inside the top digit)
    offset_digits: tuple  # m*p digits making the signed fold nonnegative
    c1_max: int  # carry bound out of the (d+2)-slot normalize
    ncarryfolds: int  # 0 or 2 digit-aligned carry folds at 2^nbits
    nbitfold: int  # bit-aligned folds at 2^k to get under 2p


@functools.cache
def _plan(fs: FieldSpec, ncols: int, col_bound: int, col_lo: int = 0) -> _Plan:
    """Trace-time interval proof for crandall_reduce.

    Input columns lie in [col_lo, col_bound); every assert below is a proved
    bound (int32 safety, carry ranges, the c4 = 0 argument, final < 2p)."""
    d = fs.ndigits
    k = fs.p.bit_length()
    c = (1 << k) - fs.p
    cc = (1 << fs.nbits) % fs.p
    assert c > 0 and cc == c << (fs.nbits - k), f"{fs.name}: not a Crandall prime"
    assert fs.nbits > k and fs.nbits - k < DIGIT_BITS, "top digit must hold bit k"
    assert cc < (1 << 14), f"{fs.name}: fold multiplier 2^nbits mod p too large"
    assert ncols <= 2 * d + 1

    # stage 1 (digit fold): split each high column t into t_hi*2^16 + t_lo
    # (exact for signed int32: arithmetic >> pairs with & mask), add cc*t_lo
    # at slot j and cc*t_hi at slot j+1. Per-slot signed interval:
    nh = max(0, ncols - d)
    lo = [col_lo] * min(ncols, d) + [0] * (d + 2 - min(ncols, d))
    hi = [col_bound - 1] * min(ncols, d) + [0] * (d + 2 - min(ncols, d))
    tlo_hi = DIGIT_MASK  # t & MASK in [0, 2^16)
    thi_lo = col_lo >> DIGIT_BITS  # floor, matches arithmetic shift
    thi_hi = (col_bound - 1) >> DIGIT_BITS
    for j in range(nh):
        hi[j] += cc * tlo_hi
        lo[j + 1] += min(cc * thi_lo, 0)
        hi[j + 1] += max(cc * thi_hi, 0)
    min_value = sum(l << (DIGIT_BITS * s) for s, l in enumerate(lo))
    max_value = sum(h << (DIGIT_BITS * s) for s, h in enumerate(hi))
    # offset m*p makes the folded value provably nonnegative (cf. solinas._plan).
    # Slots hold int32, not 16-bit digits, so the offset's top slot may carry
    # the whole excess above 2^(16*(d+1)) — P-521's fused-formula combos
    # (col_lo = -8 * grid bound) need one bit more than d+2 16-bit digits
    # (r5: this was an assert; the window/comb kernels were unreachable for
    # d = 33 without it).
    m = (-min_value + fs.p - 1) // fs.p if min_value < 0 else 0
    off = m * fs.p
    low_mask = (1 << (DIGIT_BITS * (d + 1))) - 1
    offset_digits = tuple(int_to_digits(off & low_mask, d + 1)) + (off >> (DIGIT_BITS * (d + 1)),)
    assert offset_digits[d + 1] + max(hi) + (1 << DIGIT_BITS) < (1 << 31), (
        "offset top slot overflows int32"
    )
    assert min(lo) > -(1 << 30) and max(hi) + (1 << DIGIT_BITS) < (1 << 31), "slot overflow"

    # stage 2: normalize d+2 slots; value >= 0 so the carry-out is >= 0
    v1_max = max_value + m * fs.p
    c1_max = v1_max >> (DIGIT_BITS * (d + 2))

    # stage 3: fold slots d (cc at digit 0), d+1 (cc at digit 1) and the
    # carry (cc at digit 2; weight 2^(16(d+2)) = 2^nbits * 2^32)
    assert (1 << DIGIT_BITS) * (1 + cc) < (1 << 31), "stage-3 digit overflow"
    assert (1 << DIGIT_BITS) + cc * max(c1_max, 1) < (1 << 31), "stage-3 carry slot overflow"
    v2_max = ((1 << fs.nbits) - 1) + cc * (
        DIGIT_MASK + (DIGIT_MASK << DIGIT_BITS) + (c1_max << 32)
    )
    c2_max = v2_max >> fs.nbits

    # carry folds at 2^nbits: with w < 2^nbits and carry m <= c2_max,
    # fold A: V3 = w + cc*m -> c3 <= 1 (needs cc*c2_max < 2^nbits) and
    #         w3 < cc*c2_max when c3 = 1;
    # fold B: V4 = w3 + cc*c3 < max(2^nbits, cc*(c2_max + 1)) -> c4 = 0.
    ncarryfolds = 0
    if c2_max > 0:
        assert cc * c2_max < (1 << fs.nbits), "fold A carry not in {0,1}"
        assert cc * (c2_max + 1) < (1 << fs.nbits), "fold B carry not provably 0"
        ncarryfolds = 2

    # bit folds at 2^k: value < 2^nbits, repeat V -> (V mod 2^k) + c*(V >> k)
    # until provably < 2p, tracking the exact bound
    kd, kr = divmod(k, DIGIT_BITS)
    assert kd == d - 1  # implied by nbits - k < 16
    bound = (1 << fs.nbits) - 1
    nbitfold = 0
    while bound >= 2 * fs.p:
        hi_max = bound >> k
        assert c * hi_max < (1 << 30), "bit-fold addend overflow"
        bound = min(bound, (1 << k) - 1) + c * hi_max
        nbitfold += 1
        assert nbitfold <= 4, f"{fs.name}: bit folds do not converge"
        assert bound < (1 << fs.nbits), "bit-fold bound must shrink"
    return _Plan(cc, c, kr, offset_digits, c1_max, ncarryfolds, nbitfold)


def _reduce_rows(cols, fs: FieldSpec, col_bound: int, col_lo: int = 0):
    """Shared XLA/kernel-dialect core: list of redundant column arrays ->
    (normalized digit list with value in [0, 2p), carry provably 0).

    Kernel-dialect safe: scalar int32 constants only, no captured arrays,
    no scatter, arithmetic >> for the signed lo/hi splits."""
    plan = _plan(fs, len(cols), col_bound, col_lo)
    d = fs.ndigits
    cc = jnp.int32(plan.cc)
    zero = jnp.zeros_like(cols[0])
    r = [cols[s] if s < min(len(cols), d) else zero for s in range(d + 2)]
    r = [rs + jnp.int32(od) if od else rs for rs, od in zip(r, plan.offset_digits)]
    for j in range(max(0, len(cols) - d)):
        t = cols[d + j]
        t_lo = t & DIGIT_MASK
        t_hi = t >> DIGIT_BITS  # arithmetic: exact signed split with the mask
        r[j] = r[j] + cc * t_lo
        r[j + 1] = r[j + 1] + cc * t_hi

    w1, c1 = _signed_normalize(r, d + 2)
    r2 = list(w1[:d])
    r2[0] = r2[0] + cc * w1[d]
    r2[1] = r2[1] + cc * w1[d + 1]
    r2[2] = r2[2] + cc * c1
    w, cy = _signed_normalize(r2, d)

    for _ in range(plan.ncarryfolds):
        rn = list(w)
        rn[0] = rn[0] + cc * cy
        w, cy = _signed_normalize(rn, d)

    # cy provably 0 here (fold-B argument / c2_max == 0); bit folds at 2^k
    mask = jnp.int32((1 << plan.kr) - 1)
    cf = jnp.int32(plan.c)
    for _ in range(plan.nbitfold):
        top = lax.shift_right_logical(w[d - 1], jnp.int32(plan.kr))
        rn = list(w)
        rn[d - 1] = w[d - 1] & mask
        rn[0] = rn[0] + cf * top
        w, cy2 = _signed_normalize(rn, d)
        cy = cy + cy2  # both provably 0; kept for the cond-sub carry contract
    return w, cy


def crandall_reduce(cols, fs: FieldSpec, col_bound: int | None = None, col_lo: int = 0):
    """Reduce redundant product columns (ncols, *batch) mod p to [0, p)."""
    from ecsimd_tpu.ops import mont

    if col_bound is None:
        col_bound = grid_col_bound(fs)
    rows = [cols[s] for s in range(cols.shape[0])]
    w, cy = _reduce_rows(rows, fs, col_bound, col_lo)
    return mont._cond_sub_p(jnp.stack(w), cy, fs)


def fast_mul(a, b, fs: FieldSpec, scale: int = 1):
    """scale*a*b mod p (plain domain), grid + Crandall fold; any normalized
    inputs < 2^nbits, small trace-time scale fused into the column bound
    (same contract as ops/solinas.fast_mul)."""
    from ecsimd_tpu.ops.mont import _product_columns

    cols = _product_columns(a, b)
    if scale != 1:
        cols = cols * jnp.int32(scale)
    return crandall_reduce(cols, fs, col_bound=grid_col_bound(fs, scale))


def fast_sqr(a, fs: FieldSpec, scale: int = 1):
    from ecsimd_tpu.ops.solinas import _product_columns_sqr

    cols = _product_columns_sqr(a)
    if scale != 1:
        cols = cols * jnp.int32(scale)
    return crandall_reduce(cols, fs, col_bound=grid_col_bound(fs, scale))
