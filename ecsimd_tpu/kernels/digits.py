"""Kernel-side field arithmetic over per-digit vector registers.

Inside a Pallas kernel, a bignum batch is a *Python list* of D int32 arrays,
each shaped (S, 128) — one full VPU vreg tile per digit. This is exactly the
reference's register layout (each 64-bit limb lives in its own AVX2 register,
``bignum.h:38-102``) transplanted to the TPU: digit indexing is free at trace
time, every op is a whole-register elementwise instruction, and none of the
sublane shuffles/copies that (D, T) plane slicing costs in Mosaic ever happen.

``VGFp`` duck-types the XLA-path ``field.GFp`` (operators, sqr, double,
shift_left, opposite, select, const_like), so the co-Z group-law code in
curves/group.py traces unchanged inside kernels.

Reduction dispatch mirrors field.py: Solinas fast reduction for NIST primes
and the Crandall fold for 2^k - c primes (both plain domain), CIOS
Montgomery for generic primes (Montgomery domain) — constants and bound
proofs shared with ops/solinas.py / ops/crandall.py / ops/mont.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ecsimd_tpu.ops import crandall, solinas
from ecsimd_tpu.specs import DIGIT_BITS, DIGIT_MASK, FieldSpec, int_to_digits

I32 = jnp.int32


def _shr(x, n):
    return lax.shift_right_logical(x, jnp.int32(n))


# --- digit-list primitives ----------------------------------------------------

_GROUP = 4  # carry-select group width


def normalize(rows, d):
    """Unsigned redundant digits -> [0, 2^16) digits + carry (all nonnegative)."""
    outs = []
    carry = None
    for k in range(d):
        t = rows[k] if carry is None else rows[k] + carry
        outs.append(t & DIGIT_MASK)
        carry = _shr(t, DIGIT_BITS)
    return outs, carry


def add_select(a, b):
    """a + b with carry-select carries: digit sums have carries in {0, 1}, so
    groups of 4 ripple both carry-in variants in parallel (depth 4) and a
    4-deep group-carry chain selects between them — ~13-deep total instead of
    the 32-deep serial ripple, which ablation shows is latency-bound on the
    VPU (the muls around it run near the multi-issue ceiling).

    Requires a, b normalized (digits < 2^16). Returns (digits, carry_out)."""
    d = len(a)
    if d % _GROUP:
        return normalize([x + y for x, y in zip(a, b)], d)
    s = [x + y for x, y in zip(a, b)]
    d0, d1, g0, g1 = [], [], [], []
    for j in range(0, d, _GROUP):
        c0, c1 = None, None
        for k in range(j, j + _GROUP):
            t0 = s[k] if c0 is None else s[k] + c0
            t1 = s[k] + 1 if c1 is None else s[k] + c1
            d0.append(t0 & DIGIT_MASK)
            d1.append(t1 & DIGIT_MASK)
            c0 = _shr(t0, DIGIT_BITS)
            c1 = _shr(t1, DIGIT_BITS)
        g0.append(c0)
        g1.append(c1)
    outs = list(d0[: _GROUP])  # first group has carry-in 0
    c = g0[0]
    for j in range(1, d // _GROUP):
        m = c.astype(bool)
        for k in range(j * _GROUP, (j + 1) * _GROUP):
            outs.append(jnp.where(m, d1[k], d0[k]))
        c = jnp.where(m, g1[j], g0[j])
    return outs, c


def sub_select(a, b):
    """a - b with carry-select borrows (counterpart of add_select).

    Requires a, b normalized (digits < 2^16).
    Returns (digits, borrow_out in {0,1})."""
    d = len(a)
    if d % _GROUP:
        return sub_borrow(a, b)
    s = [x - y for x, y in zip(a, b)]
    d0, d1, g0, g1 = [], [], [], []
    for j in range(0, d, _GROUP):
        c0, c1 = None, None
        for k in range(j, j + _GROUP):
            t0 = s[k] if c0 is None else s[k] - c0
            t1 = s[k] - 1 if c1 is None else s[k] - c1
            d0.append(t0 & DIGIT_MASK)
            d1.append(t1 & DIGIT_MASK)
            c0 = _shr(t0, 31)
            c1 = _shr(t1, 31)
        g0.append(c0)
        g1.append(c1)
    outs = list(d0[: _GROUP])
    c = g0[0]
    for j in range(1, d // _GROUP):
        m = c.astype(bool)
        for k in range(j * _GROUP, (j + 1) * _GROUP):
            outs.append(jnp.where(m, d1[k], d0[k]))
        c = jnp.where(m, g1[j], g0[j])
    return outs, c


def normalize_signed(rows, d):
    """Signed redundant digits -> [0, 2^16) digits + signed carry (int32 >> is
    arithmetic, so t = (t>>16)*2^16 + (t&MASK) holds for negatives too)."""
    outs = []
    carry = None
    for k in range(d):
        t = rows[k] if carry is None else rows[k] + carry
        outs.append(t & DIGIT_MASK)
        carry = t >> DIGIT_BITS
    return outs, carry


def sub_borrow(a, b):
    """Digit-wise a - b with borrow ripple; returns (digits, borrow mask)."""
    outs = []
    borrow = None
    for ak, bk in zip(a, b):
        t = ak - bk if borrow is None else ak - bk - borrow
        borrow = _shr(t, 31)
        outs.append(t & DIGIT_MASK)
    return outs, borrow


def select(mask, a, b):
    """mask ? a : b per lane (digit lists)."""
    m = mask.astype(bool)
    return [jnp.where(m, x, y) for x, y in zip(a, b)]


def is_zero(digs):
    """Per-lane zero test over normalized digit lists (value == 0 mod p ⟺
    every digit 0, since mod_* outputs live in [0, p))."""
    m = digs[0] == 0
    for v in digs[1:]:
        m = m & (v == 0)
    return m


def _p_digits(fs: FieldSpec):
    return [jnp.int32(x) for x in fs.p_digits]


def cond_sub_p(digs, carry, fs: FieldSpec):
    """Subtract p iff carry-out or digs >= p (one conditional subtract)."""
    d, borrow = sub_select(digs, _p_digits(fs))
    take = (1 - borrow) if carry is None else (carry | (1 - borrow))
    return select(take, d, digs)


# --- modular add/sub/double/opposite (modular.h semantics) --------------------


def mod_add(a, b, fs: FieldSpec):
    s, carry = add_select(a, b)
    return cond_sub_p(s, carry, fs)


def mod_sub(a, b, fs: FieldSpec):
    d, borrow = sub_select(a, b)
    dd, _ = add_select(d, _p_digits(fs))
    return select(borrow, dd, d)


def mod_double(a, fs: FieldSpec):
    nd = fs.ndigits
    out = [((a[k] << 1) & DIGIT_MASK) | (_shr(a[k - 1], DIGIT_BITS - 1) if k else 0) for k in range(nd)]
    carry = _shr(a[nd - 1], DIGIT_BITS - 1)
    return cond_sub_p(out, carry, fs)


def mod_opposite(a, fs: FieldSpec):
    d, _ = sub_borrow(_p_digits(fs), a)
    zero = None
    for x in a:
        zero = (x == 0) if zero is None else (zero & (x == 0))
    m = zero.astype(I32)
    return select(m, a, d)


# --- multiplication -----------------------------------------------------------


def _grid(a, b, d):
    """Schoolbook digit grid into 2d+1 redundant columns (unrolled, per-vreg)."""
    cols = [None] * (2 * d + 1)

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(d):
        for j in range(d):
            pr = a[i] * b[j]
            acc(i + j, pr & DIGIT_MASK)
            acc(i + j + 1, _shr(pr, DIGIT_BITS))
    return [c if c is not None else jnp.zeros_like(a[0]) for c in cols]


def _grid_sqr(a, d):
    """Triangular squaring grid (off-diagonals once, doubled; mul.h:160-212).

    The off-diagonal parts accumulate undoubled into their own columns and the
    column sums are doubled once at the end: 2 ops per *column* instead of 2
    per *product* (~180 fewer vreg-ops for d=16). Bit-identical values: the
    shift distributes over the sum and the column bound (<= 16 parts * 2^16
    before doubling < 2^21) keeps every intermediate far from int32 overflow,
    so the reduction's col_bound proof is unchanged."""
    cols = [None] * (2 * d + 1)
    off = [None] * (2 * d + 1)

    def acc(c, k, v):
        c[k] = v if c[k] is None else c[k] + v

    for i in range(d):
        pr = a[i] * a[i]
        acc(cols, 2 * i, pr & DIGIT_MASK)
        acc(cols, 2 * i + 1, _shr(pr, DIGIT_BITS))
        for j in range(i + 1, d):
            pr = a[i] * a[j]
            acc(off, i + j, pr & DIGIT_MASK)
            acc(off, i + j + 1, _shr(pr, DIGIT_BITS))
    out = []
    for c, o in zip(cols, off):
        if o is not None:
            c = (o << 1) if c is None else c + (o << 1)
        out.append(c if c is not None else jnp.zeros_like(a[0]))
    return out


def _solinas_reduce_list(cols, fs: FieldSpec, col_bound: int = 1 << 22, col_lo: int = 0):
    """List-based Solinas reduction; same plan/bounds as ops/solinas.py."""
    d = fs.ndigits
    nwords = d // solinas.DIGITS_PER_WORD
    ncols = len(cols)
    mat, offset_digits, c1_max = solinas._plan(fs, ncols, col_bound, col_lo)
    assert c1_max * ((1 << fs.nbits) % fs.p) < (1 << fs.nbits)
    cterms = solinas._cbar_digit_terms(fs)

    r = [cols[k] + jnp.int32(offset_digits[k]) for k in range(d)]
    extra_carry = jnp.int32(offset_digits[d])
    for dk in range(d, ncols):
        h, par = divmod(dk, solinas.DIGITS_PER_WORD)
        for w, c in mat[h - nwords]:
            k = w * solinas.DIGITS_PER_WORD + par
            r[k] = r[k] + (cols[dk] if c == 1 else (-cols[dk] if c == -1 else jnp.int32(c) * cols[dk]))

    w1, c1 = normalize_signed(r, d)
    c1 = c1 + extra_carry

    def fold(w, c):
        rows = list(w)
        for pos, coef in cterms:
            rows[pos] = rows[pos] + (c if coef == 1 else (-c if coef == -1 else jnp.int32(coef) * c))
        return normalize_signed(rows, d)

    w2, c2 = fold(w1, c1)
    w3, c3 = fold(w2, c2)
    w4, c4 = fold(w3, c3)  # c4 = 0 by the w3 < cbar argument (ops/solinas.py)
    return cond_sub_p(w4, c4, fs)


def _crandall_reduce_list(cols, fs: FieldSpec, col_bound: int | None = None, col_lo: int = 0):
    """List-based Crandall fold; the core and proofs live in ops/crandall.py
    (the shared _reduce_rows is already kernel-dialect safe)."""
    if col_bound is None:
        col_bound = crandall.grid_col_bound(fs)
    digs, carry = crandall._reduce_rows(cols, fs, col_bound, col_lo)
    return cond_sub_p(digs, carry, fs)


def _fast_reduce_list(cols, fs: FieldSpec, col_bound: int | None = None, col_lo: int = 0):
    """Plain-domain fused-reduction dispatch (solinas | crandall). The
    Solinas branch keeps its historical 2^22 default (valid for its d <= 24
    fields); the Crandall branch derives the bound from d (P-521's d = 33
    grid columns exceed 2^22)."""
    if fs.reduction == "solinas":
        return _solinas_reduce_list(cols, fs, col_bound if col_bound is not None else 1 << 22, col_lo)
    assert fs.reduction == "crandall"
    return _crandall_reduce_list(cols, fs, col_bound, col_lo)


def _cios_reduce_list(cols, fs: FieldSpec):
    """List-based CIOS Montgomery reduction (mgry_reduce, mgry_mul.h:84-121)."""
    d = fs.ndigits
    mprime = jnp.int32(fs.mprime)
    pd = [jnp.int32(x) for x in fs.p_digits]
    cols = list(cols) + [jnp.zeros_like(cols[0])] * (2 * d + 1 - len(cols))
    for i in range(d):
        q = (cols[i] * mprime) & DIGIT_MASK
        for j in range(d):
            pr = q * pd[j]
            cols[i + j] = cols[i + j] + (pr & DIGIT_MASK)
            cols[i + j + 1] = cols[i + j + 1] + _shr(pr, DIGIT_BITS)
        cols[i + 1] = cols[i + 1] + _shr(cols[i], DIGIT_BITS)
    r, carry = normalize(cols[d : 2 * d], d)
    return cond_sub_p(r, carry + cols[2 * d], fs)


def field_mul(a, b, fs: FieldSpec):
    if fs.plain:
        return _fast_reduce_list(_grid(a, b, fs.ndigits), fs)
    return _cios_reduce_list(_grid(a, b, fs.ndigits), fs)


def field_sqr(a, fs: FieldSpec):
    if fs.plain:
        return _fast_reduce_list(_grid_sqr(a, fs.ndigits), fs)
    return _cios_reduce_list(_grid_sqr(a, fs.ndigits), fs)


def _scale_list(cols, scale: int):
    s = jnp.int32(scale)
    return [c * s for c in cols]


def _scaled_bound(fs: FieldSpec, scale: int) -> int:
    return (scale << 22) if fs.reduction == "solinas" else crandall.grid_col_bound(fs, scale)


def field_mul_scaled(a, b, fs: FieldSpec, scale: int):
    """scale*a*b mod p, scale fused into the fast reduction (see
    ops/solinas.fast_mul); Montgomery fields fall back at the VGFp level."""
    assert fs.plain
    return _fast_reduce_list(_scale_list(_grid(a, b, fs.ndigits), scale), fs, col_bound=_scaled_bound(fs, scale))


def field_sqr_scaled(a, fs: FieldSpec, scale: int):
    assert fs.plain
    return _fast_reduce_list(_scale_list(_grid_sqr(a, fs.ndigits), scale), fs, col_bound=_scaled_bound(fs, scale))


def reduce_combo(terms, fs: FieldSpec):
    """One Solinas reduction of a signed linear combination of raw product
    grids and digit values: terms = [(rows, scale)], rows of length 2d+1
    (grid columns in [0, 2^22)) or d (normalized digits in [0, 2^16)), scale
    a small trace-time int (|scale| <= 8).

    Fuses patterns like x3 = r^2 - hhh - 2v into a single reduction —
    removing one full reduction plus the mod_sub chains per fused term. The
    interval proof runs in ops/solinas._plan (or ops/crandall._plan) with
    the combined signed bounds.
    """
    assert fs.plain
    d = fs.ndigits
    ncols = 2 * d + 1
    grid_bound = (1 << 22) if fs.reduction == "solinas" else crandall.grid_col_bound(fs)
    cols = [None] * ncols
    lo = hi = 0
    for rows, scale in terms:
        bound = grid_bound if len(rows) == ncols else (1 << 16)
        lo += min(scale * bound, 0)
        hi += max(scale * bound, 0)
        s = jnp.int32(scale)
        for k, r in enumerate(rows):
            v = r if scale == 1 else (-r if scale == -1 else r * s)
            cols[k] = v if cols[k] is None else cols[k] + v
    cols = [c if c is not None else jnp.zeros_like(terms[0][0][0]) for c in cols]
    return _fast_reduce_list(cols, fs, col_bound=hi if hi else 1, col_lo=lo)


# --- GFp-compatible element wrapper ------------------------------------------


class VGFp:
    """Duck-typed field.GFp over digit-list vregs (kernel-internal)."""

    __slots__ = ("digs", "fs")

    def __init__(self, digs, fs: FieldSpec):
        self.digs = list(digs)
        self.fs = fs

    # group.py compatibility surface
    @property
    def planes(self):  # used only for shape probing (ladder mask broadcast)
        return self.digs[0][None]

    def const_like(self, value: int) -> "VGFp":
        m = value % self.fs.p
        if not self.fs.plain:
            m = (value << self.fs.nbits) % self.fs.p
        like = self.digs[0]
        return VGFp(
            [jnp.full(like.shape, int(x), I32) for x in int_to_digits(m, self.fs.ndigits)],
            self.fs,
        )

    def __add__(self, o):
        return VGFp(mod_add(self.digs, o.digs, self.fs), self.fs)

    def __sub__(self, o):
        return VGFp(mod_sub(self.digs, o.digs, self.fs), self.fs)

    def __mul__(self, o):
        return VGFp(field_mul(self.digs, o.digs, self.fs), self.fs)

    def sqr(self):
        return VGFp(field_sqr(self.digs, self.fs), self.fs)

    def mul_scaled(self, o, scale: int):
        if self.fs.plain:
            return VGFp(field_mul_scaled(self.digs, o.digs, self.fs, scale), self.fs)
        from ecsimd_tpu.field import _scale_fallback

        return _scale_fallback(self * o, scale)

    def sqr_scaled(self, scale: int):
        if self.fs.plain:
            return VGFp(field_sqr_scaled(self.digs, self.fs, scale), self.fs)
        from ecsimd_tpu.field import _scale_fallback

        return _scale_fallback(self.sqr(), scale)

    def double(self):
        return VGFp(mod_double(self.digs, self.fs), self.fs)

    def shift_left(self, count: int):
        d = self.digs
        for _ in range(count):
            d = mod_double(d, self.fs)
        return VGFp(d, self.fs)

    def opposite(self):
        return VGFp(mod_opposite(self.digs, self.fs), self.fs)

    def select(self, mask, other: "VGFp") -> "VGFp":
        return VGFp(select(mask, self.digs, other.digs), self.fs)
