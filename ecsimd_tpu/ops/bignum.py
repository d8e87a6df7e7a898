"""L1: fixed-width multi-digit bignum ops over structure-of-arrays limb planes.

A B-bit unsigned integer batch is an int32 array of shape ``(D, *batch)`` where
``D = B/16`` and plane ``k`` holds base-2^16 digit ``k`` (little-endian digits)
of every batch element. This is the reference's EVE SoA product-type layout
(``bignum.h:38-102``) with the lane axis widened from 4 to the whole batch, and
the limb width chosen so 16x16->32 digit products are exact in int32 lanes —
the TPU version of the reference's 64->32-bit half-limb zero-extension trick
(``mul.h:63-83``).

Invariant: *normalized* operands have every digit in [0, 2^16). All functions
are pure jnp on int32 arrays, jit/vmap/pallas-compatible, with uniform control
flow (constant-time by construction, like the reference's masked SIMD ops).
Carries/borrows ripple across the digit axis as data-parallel lane vectors —
the analogue of the reference's vectorized carry masks (``add.h:11-35``,
``sub.h:12-38``).

Masks are int32 0/1 arrays of the batch shape (the reference's
``eve::logical`` lane masks, ``bignum.h:135-137``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ecsimd_tpu.specs import DIGIT_BITS, DIGIT_MASK

I32 = jnp.int32


def _shr(x, n):
    """Logical (unsigned) right shift on int32 bit patterns."""
    return lax.shift_right_logical(x, jnp.int32(n))


def ndigits(a) -> int:
    return a.shape[0]


def zeros_like_planes(a, d: int | None = None):
    d = a.shape[0] if d is None else d
    return jnp.zeros((d,) + a.shape[1:], I32)


def slice_add(x, start: int, v):
    """x with v added into digit rows [start, start+len(v)), start static.

    Written as static slices + concatenate — the only in-place-update shape
    Mosaic/Pallas can lower (no scatter, no dynamic_(update_)slice on values);
    XLA folds it into the same fusion as ``.at[].add`` would produce."""
    n = v.shape[0]
    parts = []
    if start > 0:
        parts.append(x[:start])
    parts.append(x[start : start + n] + v)
    if start + n < x.shape[0]:
        parts.append(x[start + n :])
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


# --- addition / subtraction (add.h, sub.h) ----------------------------------


def add(a, b):
    """Digit-wise add with full carry ripple.

    Returns ``(sum mod 2^(16D), carry_out mask)`` — the analogue of the
    reference's ``add`` (add.h:11-35) whose carry is a lane mask.
    """
    d = ndigits(a)
    s = a + b
    outs = []
    carry = jnp.zeros_like(s[0])
    for k in range(d):
        t = s[k] + carry
        outs.append(t & DIGIT_MASK)
        carry = _shr(t, DIGIT_BITS)
    return jnp.stack(outs), carry


def add_no_carry(a, b):
    """Truncating add (add.h:37-41)."""
    return add(a, b)[0]


def sub(a, b):
    """Digit-wise subtract with full borrow ripple.

    Returns ``(diff mod 2^(16D), borrow_out mask)`` (sub.h:12-38). The borrow
    mask doubles as the unsigned compare a < b (cmp.h:11-29).
    """
    d = ndigits(a)
    outs = []
    borrow = jnp.zeros_like(a[0])
    for k in range(d):
        t = a[k] - b[k] - borrow
        borrow = _shr(t, 31)  # t in (-2^17, 2^16): sign bit = borrow
        outs.append(t & DIGIT_MASK)
    return jnp.stack(outs), borrow


def sub_no_carry(a, b):
    """Truncating subtract (sub.h:40-43)."""
    return sub(a, b)[0]


def sub_if_above(a, b):
    """Constant-time conditional reduction: ``a >= b ? a - b : a``.

    The masked-select conditional subtract the reference uses for modular
    reduction (sub.h:46-75).
    """
    d, borrow = sub(a, b)
    return select(1 - borrow, d, a)


# --- comparisons (cmp.h:11-51) ----------------------------------------------


def cmp_lt(a, b):
    return sub(a, b)[1]


def cmp_gt(a, b):
    return sub(b, a)[1]


def cmp_le(a, b):
    return 1 - cmp_gt(a, b)


def cmp_ge(a, b):
    return 1 - cmp_lt(a, b)


def cmp_eq(a, b):
    return jnp.all(a == b, axis=0).astype(I32)


def is_zero(a):
    return jnp.all(a == 0, axis=0).astype(I32)


# --- constant-time select / swap (ifelse.h, swap.h) --------------------------


def select(mask, a, b):
    """Per-lane masked select: mask ? a : b (ifelse.h:15-49)."""
    return jnp.where(mask[None].astype(bool), a, b)


def swap_if(mask, a, b):
    """Per-lane masked swap, returned functionally (swap.h:15-45)."""
    m = mask[None].astype(bool)
    return jnp.where(m, b, a), jnp.where(m, a, b)


# --- multiplication (mul.h) ---------------------------------------------------


def _accumulate_product(a, b, square: bool = False):
    """Schoolbook digit-product grid accumulated into 2D unnormalized planes.

    Each int32 product of two 16-bit digits is exact mod 2^32; its lo/hi
    16-bit halves are accumulated into redundant (unnormalized) column sums
    bounded by 2*D*2^16 < 2^22 — the redundant-carry accumulation that
    replaces the reference's per-step mask-and-shift (mul.h:115-148).
    """
    d = ndigits(a)
    acc = zeros_like_planes(a, 2 * d)
    for i in range(d):
        p = a[i][None] * b  # (D, batch) int32 wrapping products, exact as u32
        lo = p & DIGIT_MASK
        hi = _shr(p, DIGIT_BITS)
        acc = slice_add(acc, i, lo)
        acc = slice_add(acc, i + 1, hi)
    return acc


def normalize(acc, carry_in=None):
    """Full carry ripple of an unnormalized accumulator (digits < 2^31)."""
    d = ndigits(acc)
    outs = []
    carry = jnp.zeros_like(acc[0]) if carry_in is None else carry_in
    for k in range(d):
        t = acc[k] + carry
        outs.append(t & DIGIT_MASK)
        carry = _shr(t, DIGIT_BITS)
    return jnp.stack(outs), carry


def mul(a, b):
    """Full schoolbook multiply: (D, ...) x (D, ...) -> (2D, ...) normalized.

    The analogue of the reference's ``mul`` (mul.h:150-158).
    """
    out, carry = normalize(_accumulate_product(a, b))
    # product of D-digit operands fits exactly in 2D digits
    return out


def square(a):
    """Squaring (mul.h:214-221). Same grid; symmetric-term sharing is applied
    in the fused kernels, not here (this is the clarity-first reference path)."""
    return mul(a, a)


def limb_mul(a, w: int):
    """Multiply by a fixed word w < 2^32, widening by two digits.

    Mirrors the reference's bignum-by-32-bit-limb multiply that returns
    nlimbs+1 64-bit limbs (mul.h:254-265) — same 32 extra bits, expressed
    here as two extra 16-bit digits.
    """
    assert 0 <= w < (1 << 32)
    d = ndigits(a)
    w_lo, w_hi = w & DIGIT_MASK, w >> DIGIT_BITS
    acc = zeros_like_planes(a, d + 2)
    for wi, wd in enumerate((w_lo, w_hi)):
        p = a * jnp.int32(wd)
        acc = slice_add(acc, wi, p & DIGIT_MASK)
        acc = slice_add(acc, wi + 1, _shr(p, DIGIT_BITS))
    out, _ = normalize(acc)
    return out


def digit_mul(a, q):
    """Multiply by a per-lane 16-bit digit q (batch-shaped), widening by one digit."""
    d = ndigits(a)
    p = q[None] * a
    acc = zeros_like_planes(a, d + 1)
    acc = slice_add(acc, 0, p & DIGIT_MASK)
    acc = slice_add(acc, 1, _shr(p, DIGIT_BITS))
    out, _ = normalize(acc)
    return out


# --- shifts (shift.h) ---------------------------------------------------------


def shift_left_one(a):
    """Bit shift left by one with cross-digit carry; returns (shifted, carry mask).

    shift.h:13-32.
    """
    d = ndigits(a)
    lo = jnp.concatenate([jnp.zeros((1,) + a.shape[1:], I32), _shr(a[:-1], DIGIT_BITS - 1)])
    out = ((a << 1) & DIGIT_MASK) | lo
    carry = _shr(a[d - 1], DIGIT_BITS - 1)
    return out, carry


def pad(a, new_ndigits: int):
    """Zero-extend to more digits (shift.h:34-51)."""
    d = ndigits(a)
    assert new_ndigits >= d
    return jnp.concatenate([a, zeros_like_planes(a, new_ndigits - d)])


def truncate(a, new_ndigits: int):
    return a[:new_ndigits]


def digit_shift_left(a, count: int, out_ndigits: int | None = None):
    """Digit-granularity left shift (limb_shift_left, shift.h:53-78)."""
    d = ndigits(a)
    out_ndigits = d + count if out_ndigits is None else out_ndigits
    z = zeros_like_planes(a, count)
    return jnp.concatenate([z, a])[:out_ndigits]


def digit_shift_right(a, count: int):
    """Digit-granularity right shift (limb_shift_right, shift.h:80-96)."""
    return a[count:]


# --- bit extraction (utility.h:44-51) ----------------------------------------


def bit_mask(a, bit: int):
    """Broadcast bit `bit` (global, little-endian) of each lane into a 0/1 mask.

    The analogue of ``wide_mask_bit`` (utility.h:44-51), used by the ladder to
    turn per-lane scalar bits into swap masks.
    """
    digit, off = divmod(bit, DIGIT_BITS)
    return _shr(a[digit], off) & 1
