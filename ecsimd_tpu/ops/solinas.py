"""Fast (multiply-free) modular reduction for Solinas/NIST primes.

The reference's only reduction is generic-prime Montgomery CIOS
(``mgry_mul.h:84-121``) — free of per-prime cost on CPUs where constants are
compile-time. On the TPU VPU the CIOS q*p multiplies are ~half of every field
multiply, so primes of Solinas form (2^nbits = sum of few +-2^(32k) mod p,
e.g. NIST P-256/P-384, FIPS 186-4 D.2) instead get a reduction made only of
word-aligned signed additions.

The per-prime reduction matrix is *derived programmatically* at trace time
from p (no transcribed FIPS tables): express 2^(32h) mod p, for each high
word h, as a small signed combination of low words by repeatedly folding
2^nbits -> cbar = 2^nbits mod p in balanced word form. This reproduces the
FIPS s1..s9 tables for P-256/P-384 and generalizes to any Solinas prime.

Values are *plain* residues in [0, p) (no Montgomery domain); the domain
conversions of mgry.h:47-55 become identities for these fields.

All bounds are proven by interval arithmetic at trace time (asserts below),
mirroring the overflow-budget discipline of ops/mont.py.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from jax import lax

from ecsimd_tpu.ops import bignum as bn
from ecsimd_tpu.specs import DIGIT_BITS, DIGIT_MASK, FieldSpec, int_to_digits

I32 = jnp.int32
WORD_BITS = 32
DIGITS_PER_WORD = WORD_BITS // DIGIT_BITS


def _shr(x, n):
    return lax.shift_right_logical(x, jnp.int32(n))


def _balanced_words(v: int, nwords: int) -> list[tuple[int, int]]:
    """v as a signed sum of +-small * 2^(32w): [(word, coeff)], |coeff| small."""
    out = []
    w = 0
    while v:
        d = v & 0xFFFFFFFF
        v >>= 32
        if d > 0x80000000:
            d -= 1 << 32
            v += 1
        if d:
            out.append((w, d))
        w += 1
    assert all(w < nwords + 1 for w, _ in out)
    return out


@functools.cache
def reduction_matrix(fs: FieldSpec) -> tuple[tuple[tuple[int, int], ...], ...]:
    """For each high word h = nwords..2*nwords: 2^(32h) mod p as a signed
    combination of low-word positions: matrix[h - nwords] = ((word, coeff), ...).

    Derivation: start with the unit vector at h; while any coefficient sits at
    a word >= nwords, replace it with coeff * cbar shifted down by nwords
    (cbar = 2^nbits mod p in balanced word form). Converges with small
    coefficients exactly when p is a Solinas prime (asserted)."""
    nwords = fs.nbits // WORD_BITS
    cbar = (1 << fs.nbits) % fs.p
    cw = _balanced_words(cbar, nwords)
    assert all(abs(c) <= 2 for _, c in cw), f"{fs.name}: not a Solinas prime"

    rows = []
    for h in range(nwords, 2 * nwords + 1):
        coeffs = {h: 1}
        for _ in range(64):
            high = [(w, c) for w, c in coeffs.items() if w >= nwords and c]
            if not high:
                break
            for w, c in high:
                del coeffs[w]
                for cw_w, cw_c in cw:
                    t = w - nwords + cw_w
                    coeffs[t] = coeffs.get(t, 0) + c * cw_c
        else:
            raise AssertionError(f"{fs.name}: reduction did not converge")
        assert all(abs(c) <= 8 for c in coeffs.values())
        # verify exactly against Python ints
        val = sum(c << (32 * w) for w, c in coeffs.items())
        assert val % fs.p == pow(2, 32 * h, fs.p), f"matrix row {h} wrong"
        rows.append(tuple(sorted((w, c) for w, c in coeffs.items() if c)))
    return tuple(rows)


@functools.cache
def _plan(fs: FieldSpec, ncols: int, col_bound: int, col_lo: int = 0):
    """Trace-time interval analysis: offset constant (multiple of p making the
    combined value provably nonnegative) and bounds for each stage.

    Input columns lie in [col_lo, col_bound) — col_lo may be negative for
    fused multi-term reductions (kernels/digits.reduce_combo)."""
    d = fs.ndigits
    nwords = d // DIGITS_PER_WORD
    mat = reduction_matrix(fs)

    # per-output-digit signed bounds of the combination
    lo = [col_lo] * d
    hi = [col_bound] * d  # identity part: cols[k] in [col_lo, col_bound)
    for dk in range(d, ncols):
        h, par = divmod(dk, DIGITS_PER_WORD)
        for w, c in mat[h - nwords]:
            k = w * DIGITS_PER_WORD + par
            lo[k] += min(c * col_lo, c * col_bound)
            hi[k] += max(c * col_lo, c * col_bound)
    min_value = sum(l << (DIGIT_BITS * k) for k, l in enumerate(lo))
    max_value = sum(h << (DIGIT_BITS * k) for k, h in enumerate(hi))
    # offset = m*p >= -min_value so the folded value is nonnegative
    m = (-min_value + fs.p - 1) // fs.p if min_value < 0 else 0
    offset_digits = int_to_digits(m * fs.p, d + 2)
    assert offset_digits[d + 1] == 0, "offset exceeds one extra digit"
    offset_digits = offset_digits[: d + 1]
    assert min(lo) > -(1 << 30) and max(hi) < (1 << 30), "combination overflow"
    assert max(hi) + max(offset_digits) < (1 << 31), "digit overflow"
    c1_max = (max_value + m * fs.p) >> fs.nbits
    return mat, offset_digits, c1_max


def _signed_normalize(rows, d):
    """Signed redundant digits -> digits in [0, 2^16) plus signed carry-out.

    Works for negative digits because int32 ``>>`` is arithmetic (floor), so
    t = (t >> 16)*2^16 + (t & 0xFFFF) holds for all t."""
    outs = []
    carry = jnp.zeros_like(rows[0])
    for k in range(d):
        t = rows[k] + carry
        outs.append(t & DIGIT_MASK)
        carry = t >> DIGIT_BITS
    return outs, carry


@functools.cache
def _cbar_digit_terms(fs: FieldSpec):
    nwords = fs.nbits // WORD_BITS
    cbar = (1 << fs.nbits) % fs.p
    return tuple((w * DIGITS_PER_WORD, c) for w, c in _balanced_words(cbar, nwords))


@functools.cache
def _combine_matrix(fs: FieldSpec, ncols: int):
    """Dense (d, ncols - d) signed matrix mapping high columns to low digits."""
    import numpy as np

    d = fs.ndigits
    nwords = d // DIGITS_PER_WORD
    mat = reduction_matrix(fs)
    M = np.zeros((d, ncols - d), np.int32)
    for dk in range(d, ncols):
        h, par = divmod(dk, DIGITS_PER_WORD)
        for w, c in mat[h - nwords]:
            M[w * DIGITS_PER_WORD + par, dk - d] = c
    return M


def _cbar_planes(fs: FieldSpec, like):
    rows = [0] * fs.ndigits
    for pos, c in _cbar_digit_terms(fs):
        rows[pos] = c
    shape = (1,) + (1,) * (like.ndim - 1)
    return jnp.concatenate([jnp.full(shape, int(c), I32) for c in rows])


def solinas_reduce(cols, fs: FieldSpec, col_bound: int = 1 << 22):
    """Reduce redundant product columns (ncols, *batch) mod p to [0, p).

    cols[k] in [0, col_bound); the combined + offset value is normalized and
    folded three times (bounds proven in _plan / by the c3=1 => w3 < cbar
    argument), then one conditional subtract.

    XLA-path formulation: the word-aligned signed combination is one constant
    int32 contraction (the kernel path unrolls it per-vreg instead,
    kernels/digits.py) — avoids the row-extract/concat patterns that send
    XLA's algebraic simplifier into circular-rewrite loops.
    """
    d = fs.ndigits
    ncols = cols.shape[0]
    _, offset_digits, c1_max = _plan(fs, ncols, col_bound)
    assert c1_max * ((1 << fs.nbits) % fs.p) < (1 << fs.nbits)

    M = jnp.asarray(_combine_matrix(fs, ncols))  # (d, ncols - d)
    off = jnp.asarray(
        jnp.array(offset_digits[:d], I32).reshape((d,) + (1,) * (cols.ndim - 1))
    )
    combined = cols[:d] + off + jnp.tensordot(M, cols[d:], axes=1)

    w1, c1 = _signed_normalize([combined[k] for k in range(d)], d)
    c1 = c1 + jnp.int32(offset_digits[d])  # offset may have d+1 digits

    cbar = _cbar_planes(fs, cols)

    def fold(w, c):
        r = jnp.stack(w) + cbar * c[None]
        return _signed_normalize([r[k] for k in range(d)], d)

    w2, c2 = fold(w1, c1)  # c2 in {0, 1}
    w3, c3 = fold(w2, c2)  # c3 in {0, 1}
    w4, c4 = fold(w3, c3)  # c4 = 0: c3=1 implies w3 < cbar
    out = jnp.stack(w4)

    # final conditional subtract: out < 2^nbits => out - p < cbar < p
    from ecsimd_tpu.ops import mont

    return mont._cond_sub_p(out, c4, fs)


def _product_columns_sqr(a):
    """Triangular squaring grid: off-diagonal products computed once, doubled
    (the reference's square_u32_zext sharing, mul.h:160-212) — ~45% fewer
    digit multiplies than the full grid."""
    d = a.shape[0]
    cols = jnp.zeros((2 * d + 1,) + a.shape[1:], I32)
    for i in range(d):
        p = a[i][None] * a[i:]  # rows i..d-1
        lo = p & DIGIT_MASK
        hi = _shr(p, DIGIT_BITS)
        # diagonal term once, off-diagonal terms twice (skip the pure-diagonal
        # last row: a zero-size slice breaks the Mosaic lowering)
        if lo.shape[0] > 1:
            lo = bn.slice_add(lo, 1, lo[1:])
            hi = bn.slice_add(hi, 1, hi[1:])
        cols = bn.slice_add(cols, 2 * i, lo)
        cols = bn.slice_add(cols, 2 * i + 1, hi)
    return cols


def fast_mul(a, b, fs: FieldSpec, scale: int = 1):
    """scale*a*b mod p (plain domain) via grid + Solinas reduction.

    ``scale`` (a small positive trace-time constant, <= 8) multiplies the
    redundant columns before reduction — one vector op replacing the 1-3
    modular doublings the group-law formulas otherwise spend on 2x/3x/4x/8x
    products (the reduction's interval proof re-runs with the scaled bound)."""
    from ecsimd_tpu.ops.mont import _product_columns

    cols = _product_columns(a, b)
    if scale != 1:
        cols = cols * jnp.int32(scale)
    return solinas_reduce(cols, fs, col_bound=scale << 22)


def fast_sqr(a, fs: FieldSpec, scale: int = 1):
    cols = _product_columns_sqr(a)
    if scale != 1:
        cols = cols * jnp.int32(scale)
    return solinas_reduce(cols, fs, col_bound=scale << 22)
