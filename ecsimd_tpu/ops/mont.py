"""L2: Montgomery modular arithmetic over digit planes.

Montgomery radix R = 2^nbits (identical to the reference, ``mgry_csts.h:15``),
digit-serial CIOS reduction with mprime = -p^-1 mod 2^16 (the 16-bit analogue
of the reference's 32-bit half-limb reduction, ``mgry_mul.h:33-40,84-121``).

The key deviation from the reference: where the reference normalizes carries at
every step with mask-and-shift (``mgry_mul.h:52-82``), these kernels accumulate
digit columns in *redundant form* (unnormalized int32 partial sums, bounded
below 2^23) and ripple carries once per field op — fewer VPU ops, and the form
XLA fuses well. Overflow budget: every partial sum is bounded by
  grid accumulation:  <= 2*D*(2^16-1)          < 2^21
  CIOS additions:     <= D*(2*(2^16-1))        < 2^21
  rippled carries:    <  2^7
so all intermediates stay far below 2^31 for D <= 24 (384-bit fields).

All functions take a FieldSpec (constants resolved at trace time — the
analogue of the reference's constexpr ctbignum constants) and (D, *batch)
int32 plane arrays.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ecsimd_tpu.ops import bignum as bn
from ecsimd_tpu.specs import DIGIT_BITS, DIGIT_MASK, FieldSpec

I32 = jnp.int32


def _shr(x, n):
    return lax.shift_right_logical(x, jnp.int32(n))


def _const_planes(digits, like):
    """Constant digit tuple -> (D, 1, ..) planes broadcasting over the batch.

    Built from scalar broadcasts (not a jnp.array literal) so the same code
    traces cleanly inside Pallas kernels, which reject captured array
    constants; XLA constant-folds the concat away.
    """
    shape = (1,) + (1,) * (like.ndim - 1)
    return jnp.concatenate([jnp.full(shape, int(x), I32) for x in digits])


def p_planes(fs: FieldSpec, like):
    return _const_planes(fs.p_digits, like)


# --- non-Montgomery modular ops (modular.h) -----------------------------------


def _cond_sub_p(s, carry, fs: FieldSpec):
    """Subtract p iff carry-out or s >= p (one conditional subtract)."""
    p = p_planes(fs, s)
    d, borrow = bn.sub(s, p)
    take = carry | (1 - borrow)
    return bn.select(take, d, s)


def mod_add(a, b, fs: FieldSpec):
    """(a + b) mod p for a, b in [0, p) (modular.h:10-15)."""
    s, carry = bn.add(a, b)
    return _cond_sub_p(s, carry, fs)


def mod_sub(a, b, fs: FieldSpec):
    """(a - b) mod p for a, b in [0, p) (modular.h:24-41)."""
    d, borrow = bn.sub(a, b)
    dd, _ = bn.add(d, p_planes(fs, d))
    return bn.select(borrow, dd, d)


def mod_shift_left_one(a, fs: FieldSpec):
    """(2a) mod p for a in [0, p) (modular.h:17-22)."""
    s, carry = bn.shift_left_one(a)
    return _cond_sub_p(s, carry, fs)


def mod_shift_left(a, count: int, fs: FieldSpec):
    """(a << count) mod p by repeated modular doubling (mgry_ops.h:15-24)."""
    for _ in range(count):
        a = mod_shift_left_one(a, fs)
    return a


def mod_opposite(a, fs: FieldSpec):
    """(-a) mod p for a in [0, p); 0 stays 0 (constant-time masked)."""
    d, _ = bn.sub(p_planes(fs, a), a)
    return bn.select(bn.is_zero(a), a, d)


# --- Montgomery reduction / multiplication (mgry_mul.h, mgry_ops.h) ------------


def _cios_reduce(cols, fs: FieldSpec):
    """Digit-serial CIOS Montgomery reduction of a redundant column array.

    ``cols`` is a (2D+1, *batch) int32 array of unnormalized column sums for
    digit weights 0..2D. Returns normalized planes of the D-digit result in
    [0, p) — exactly t*R^-1 mod p (contract: oracle.field.mont_reduce;
    reference mgry_reduce, mgry_mul.h:84-121).

    The outer loop over the D retired digits is inherently serial (q_i depends
    on the running sum); the inner digit loop is one vectorized multiply plus
    two slice-adds, keeping the traced graph at O(D) ops, not O(D^2).
    """
    d = fs.ndigits
    mprime = jnp.int32(fs.mprime)
    p_vec = _const_planes(fs.p_digits, cols)

    for i in range(d):
        # q = (t_i mod 2^16) * mprime mod 2^16; lower positions are already
        # zeroed and their carries absorbed, so cols[i] is exact mod 2^16.
        q = (cols[i] * mprime) & DIGIT_MASK
        prod = q[None] * p_vec  # (D, batch), < 2^32, exact as u32 bit pattern
        cols = bn.slice_add(cols, i, prod & DIGIT_MASK)
        cols = bn.slice_add(cols, i + 1, _shr(prod, DIGIT_BITS))
        # position i is now = 0 mod 2^16: push its carry and retire it
        cols = bn.slice_add(cols, i + 1, _shr(cols[i], DIGIT_BITS)[None])

    # result = cols[d..2d] (value < 2p), normalize then one conditional subtract
    r, carry = bn.normalize(cols[d : 2 * d])
    carry = carry + cols[2 * d]  # top column (0 or small) folds into carry-out
    return _cond_sub_p(r, carry, fs)


def _product_columns(a, b):
    """Schoolbook product grid as a redundant (2D+1, *batch) column array.

    One (D, D, batch) widening-free multiply, lo/hi split, then D slice-adds —
    the whole 256-product grid is three vector ops plus 2D accumulations.
    """
    d = a.shape[0]
    p = a[:, None] * b[None]  # (D, D, batch) int32, exact as u32 bit patterns
    lo = p & DIGIT_MASK
    hi = _shr(p, DIGIT_BITS)
    cols = jnp.zeros((2 * d + 1,) + a.shape[1:], I32)
    for i in range(d):
        cols = bn.slice_add(cols, i, lo[i])
        cols = bn.slice_add(cols, i + 1, hi[i])
    return cols


def mont_reduce(t, fs: FieldSpec):
    """Montgomery-reduce a 2D-digit normalized value t < R*p (mgry_mul.h:84)."""
    return _cios_reduce(bn.pad(t, 2 * fs.ndigits + 1), fs)


def mont_mul(a, b, fs: FieldSpec):
    """Fused a*b*R^-1 mod p: product grid feeds CIOS in redundant form without
    an intermediate normalization (mgry_ops.h:31-35 fused with mul.h:150)."""
    return _cios_reduce(_product_columns(a, b), fs)


def mont_sqr(a, fs: FieldSpec):
    """a^2*R^-1 mod p (mgry_ops.h:37-42). Uses the full vectorized grid: on
    vector hardware one (D, D, batch) multiply beats the reference's
    symmetric-term sharing (mul.h:160-212), which exists to save scalar-issue
    multiplies; the Pallas kernel layer applies the sharing where it pays."""
    return _cios_reduce(_product_columns(a, a), fs)


def mont_from_classical(a, fs: FieldSpec):
    """a -> a*R mod p = mont_mul(a, R^2 mod p) (mgry.h:47-50)."""
    r2 = _const_planes(fs.R2_digits(), a)
    return mont_mul(a, jnp.broadcast_to(r2, a.shape), fs)


def mont_to_classical(am, fs: FieldSpec):
    """a*R -> a: reduce the zero-extended value (mgry.h:52-55)."""
    return mont_reduce(bn.pad(am, 2 * fs.ndigits), fs)


def mont_one(fs: FieldSpec, like):
    """R mod p, the Montgomery representation of 1 (mgry.h:43-45)."""
    from ecsimd_tpu.specs import int_to_digits

    return jnp.broadcast_to(_const_planes(int_to_digits(fs.R_mod_p, fs.ndigits), like), like.shape)


def mont_pow_const(am, e: int, fs: FieldSpec):
    """Montgomery-domain power with compile-time public exponent.

    Left-to-right square-and-multiply over the exponent's bits, driven by a
    lax.fori_loop with the bit string baked in as a constant — uniform 2-mul
    body per bit (one masked), so the trace stays small for 256-bit exponents.
    Semantics match mgry_pow (mgry_ops.h:44-86): exponent is classical, result
    Montgomery; like the reference, NOT side-channel-uniform in the exponent
    (exponents here are public curve constants).
    """
    if e == 0:
        return mont_one(fs, am)
    nb = e.bit_length()
    ebits = jnp.array([(e >> (nb - 1 - i)) & 1 for i in range(nb)], I32)

    def body(i, acc):
        acc = mont_sqr(acc, fs)
        m = mont_mul(acc, am, fs)
        return bn.select(jnp.broadcast_to(ebits[i], acc.shape[1:]), m, acc)

    # bit 0 (MSB) initializes acc = am, skipping the leading square
    return lax.fori_loop(1, nb, body, am)


def mont_pow_planes(am, e, fs: FieldSpec):
    """Per-lane variable exponent (e as (D, *batch) classical digit planes).

    Generalizes the reference's broadcast-scalar exponent to lane-distinct
    exponents; uniform control flow (masked multiply per bit).
    """
    d = fs.ndigits

    def body(i, acc):
        # bits MSB -> LSB: bit index nb-1-i
        bit_idx = d * DIGIT_BITS - 1 - i
        digit, off = bit_idx // DIGIT_BITS, bit_idx % DIGIT_BITS
        ebit = _shr(e[digit], off) & 1
        acc = mont_sqr(acc, fs)
        m = mont_mul(acc, am, fs)
        return bn.select(ebit, m, acc)

    one = mont_one(fs, am)
    return lax.fori_loop(0, d * DIGIT_BITS, body, one)
