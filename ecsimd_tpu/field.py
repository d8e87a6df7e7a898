"""L3: GF(p) prime-field value type in Montgomery form.

The analogue of the reference's ``GFp<WBN, P>`` (``gfp.h:17-115``): a pytree
wrapping Montgomery-domain digit planes with operator sugar, Fermat inversion,
and p = 3 (mod 4) square roots. Field ops dispatch to the L2 plane kernels, so
a GFp behaves identically inside jit, vmap, shard_map, and Pallas kernel bodies.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ecsimd_tpu.ops import bignum as bn
from ecsimd_tpu.ops import crandall, mont, solinas
from ecsimd_tpu.specs import FieldSpec, int_to_digits


# --- reduction-strategy dispatch ---------------------------------------------
# Montgomery (generic primes; the reference's only strategy) stores residues
# x*R mod p; Solinas (NIST primes) and Crandall (2^k - c primes) store plain
# residues with multiply-free/-light reduction. GFp hides the distinction
# behind one interface.


def _mul_planes(a, b, fs: FieldSpec):
    if fs.reduction == "solinas":
        return solinas.fast_mul(a, b, fs)
    if fs.reduction == "crandall":
        return crandall.fast_mul(a, b, fs)
    return mont.mont_mul(a, b, fs)


def _sqr_planes(a, fs: FieldSpec):
    if fs.reduction == "solinas":
        return solinas.fast_sqr(a, fs)
    if fs.reduction == "crandall":
        return crandall.fast_sqr(a, fs)
    return mont.mont_sqr(a, fs)


def _one_planes(fs: FieldSpec, like):
    if fs.plain:
        one = mont._const_planes(int_to_digits(1, fs.ndigits), like)
        return jnp.broadcast_to(one, like.shape)
    return mont.mont_one(fs, like)


def _pow_const_planes(am, e: int, fs: FieldSpec):
    """Square-and-multiply with a compile-time public exponent, generic over
    the reduction strategy (structure of mont.mont_pow_const)."""
    from jax import lax

    if e == 0:
        return _one_planes(fs, am)
    nb = e.bit_length()
    ebits = jnp.array([(e >> (nb - 1 - i)) & 1 for i in range(nb)], jnp.int32)

    def body(i, acc):
        acc = _sqr_planes(acc, fs)
        m = _mul_planes(acc, am, fs)
        return bn.select(jnp.broadcast_to(ebits[i], acc.shape[1:]), m, acc)

    return lax.fori_loop(1, nb, body, am)


def _pow_const_planes_unrolled(am, e: int, fs: FieldSpec, w: int = 4):
    """Trace-time-unrolled fixed-window power for a PUBLIC exponent.

    The rolled loop above issues (sqr + mul + select) per bit — ~2 serial
    field ops/bit — because the bit value is only known on device. But e is
    a Python int at trace time, so the window values are compile-time
    literals: unrolling gives sqr-per-bit plus one mul per NONZERO window
    and zero selects — ~1.2 serial ops/bit, ~1.7x shorter critical path.
    SHELVED (r5): kept for reference/bench experiments only — inlined into
    the ECDSA sign graph it OOM-killed the TPU remote-compile helper, and
    on XLA:CPU each unrolled field op costs 0.75-2.5 s of compile (see
    batch_inverse for the measurement note). No production caller."""
    if e == 0:
        return _one_planes(fs, am)
    if e == 1:
        return am
    # odd-power table a^1, a^3, ..., a^(2^w - 1)
    a2 = _sqr_planes(am, fs)
    tbl = {1: am}
    for i in range(3, 1 << w, 2):
        tbl[i] = _mul_planes(tbl[i - 2], a2, fs)
    # left-to-right sliding window over e's bits
    bits = bin(e)[2:]
    i, n = 0, len(bits)
    acc = None
    while i < n:
        if bits[i] == "0":
            if acc is not None:
                acc = _sqr_planes(acc, fs)
            i += 1
            continue
        j = min(i + w, n)
        while bits[j - 1] == "0":
            j -= 1
        val = int(bits[i:j], 2)
        if acc is None:
            acc = tbl[val]
        else:
            for _ in range(j - i):
                acc = _sqr_planes(acc, fs)
            acc = _mul_planes(acc, tbl[val], fs)
        i = j
    return acc


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GFp:
    """A batch of field elements, stored as Montgomery-domain digit planes."""

    planes: jax.Array  # (D, *batch) int32, digits in [0, 2^16), value in [0, p)
    fs: FieldSpec = dataclasses.field(metadata=dict(static=True))

    # -- constructors --------------------------------------------------------

    @classmethod
    def from_classical(cls, planes, fs: FieldSpec) -> "GFp":
        """classical planes -> internal domain (Montgomery for generic primes,
        mgry.h:47-50; identity for the plain-domain fast-reduction fields)."""
        if fs.plain:
            return cls(planes, fs)
        return cls(mont.mont_from_classical(planes, fs), fs)

    @classmethod
    def from_mont(cls, planes, fs: FieldSpec) -> "GFp":
        return cls(planes, fs)

    @classmethod
    def constant(cls, value: int, fs: FieldSpec, like) -> "GFp":
        """Compile-time constant, pre-converted to the internal domain on host."""
        m = value % fs.p if fs.plain else (value << fs.nbits) % fs.p
        c = mont._const_planes(int_to_digits(m, fs.ndigits), like)
        return cls(jnp.broadcast_to(c, like.shape), fs)

    @classmethod
    def one(cls, fs: FieldSpec, like) -> "GFp":
        """The internal-domain 1 (R mod p for Montgomery, gfp.h:30-32)."""
        return cls(_one_planes(fs, like), fs)

    @classmethod
    def zero(cls, fs: FieldSpec, like) -> "GFp":
        return cls(jnp.zeros_like(like), fs)

    # -- accessors -----------------------------------------------------------

    def to_classical(self):
        if self.fs.plain:
            return self.planes
        return mont.mont_to_classical(self.planes, self.fs)

    @property
    def batch_shape(self):
        return self.planes.shape[1:]

    # -- arithmetic (gfp.h:97-115) --------------------------------------------

    def __add__(self, o: "GFp") -> "GFp":
        return GFp(mont.mod_add(self.planes, o.planes, self.fs), self.fs)

    def __sub__(self, o: "GFp") -> "GFp":
        return GFp(mont.mod_sub(self.planes, o.planes, self.fs), self.fs)

    def __mul__(self, o: "GFp") -> "GFp":
        return GFp(_mul_planes(self.planes, o.planes, self.fs), self.fs)

    def sqr(self) -> "GFp":
        return GFp(_sqr_planes(self.planes, self.fs), self.fs)

    def mul_scaled(self, o: "GFp", scale: int) -> "GFp":
        """scale * self * o for a small constant scale (2/3/4/8) — fused into
        the Solinas/Crandall reduction; falls back to double/add chains for
        Montgomery fields (whose reduction contract t < R*p forbids
        pre-scaling)."""
        if self.fs.reduction == "solinas":
            return GFp(solinas.fast_mul(self.planes, o.planes, self.fs, scale), self.fs)
        if self.fs.reduction == "crandall":
            return GFp(crandall.fast_mul(self.planes, o.planes, self.fs, scale), self.fs)
        return _scale_fallback(self * o, scale)

    def sqr_scaled(self, scale: int) -> "GFp":
        """scale * self^2 (see mul_scaled)."""
        if self.fs.reduction == "solinas":
            return GFp(solinas.fast_sqr(self.planes, self.fs, scale), self.fs)
        if self.fs.reduction == "crandall":
            return GFp(crandall.fast_sqr(self.planes, self.fs, scale), self.fs)
        return _scale_fallback(self.sqr(), scale)

    def double(self) -> "GFp":
        return GFp(mont.mod_shift_left_one(self.planes, self.fs), self.fs)

    def shift_left(self, count: int) -> "GFp":
        """x * 2^count by repeated modular doubling (gfp_shift_left, gfp.h:112-115)."""
        return GFp(mont.mod_shift_left(self.planes, count, self.fs), self.fs)

    def opposite(self) -> "GFp":
        """-x mod p (gfp.h:60-64)."""
        return GFp(mont.mod_opposite(self.planes, self.fs), self.fs)

    def pow_const(self, e: int) -> "GFp":
        return GFp(_pow_const_planes(self.planes, e, self.fs), self.fs)

    def pow_planes(self, e_planes) -> "GFp":
        """Per-lane exponent (classical digit planes) — the wide-exponent
        mgry_pow of the reference (mgry_ops.h:44-86), generic over the
        reduction strategy. Uniform control flow (masked multiply per bit)."""
        from jax import lax

        fs = self.fs
        d = fs.ndigits

        def body(i, acc):
            bit_idx = d * 16 - 1 - i
            digit, off = bit_idx // 16, bit_idx % 16
            ebit = lax.shift_right_logical(e_planes[digit], off) & 1
            acc = _sqr_planes(acc, fs)
            m = _mul_planes(acc, self.planes, fs)
            return bn.select(ebit, m, acc)

        out = lax.fori_loop(0, d * 16, body, _one_planes(fs, self.planes))
        return GFp(out, fs)

    def inverse(self) -> "GFp":
        """Fermat inversion x^(p-2) (gfp.h:42-44). inverse(0) = 0."""
        return self.pow_const(self.fs.fermat_exponent)

    def batch_inverse(self) -> "GFp":
        """Montgomery-trick batch inversion over the batch axis.

        Every lane's inverse for ~3 field mults per lane plus ONE Fermat
        inversion of the whole-batch product, vs the per-lane Fermat power
        (``inverse``, ~1.5*nbits mults per lane — the reference's only
        strategy, gfp.h:42-44). inverse(0) = 0 per lane, same as ``inverse``
        (zero lanes are masked to 1 inside the product so they don't
        annihilate it, and masked back to 0 on the way out).

        TPU shape: a pairwise product tree down the batch axis (log2 B
        levels of halving-width field mults, ~B lane-mults total), the
        Fermat chain at the 1-lane root, then the standard unwind
        (inv_left = inv_parent * right, inv_right = inv_parent * left;
        ~2B lane-mults) — every level a full-width vectorized plane op, no
        gathers. NOTE: the tree mixes lanes across the batch axis, so under
        a batch-sharded jit XLA will insert collectives; shard_map callers
        get a per-shard tree for free (each shard inverts locally).
        """
        # One jitted computation: the tree + unrolled root are thousands of
        # ops, and EAGER per-op dispatch through a remote-TPU tunnel costs
        # ~2 ms each (a ~35-minute stall at d = 16, observed r5 in the
        # verification paths of bench scripts, which call to_affine outside
        # any jit). Under an outer jit this inlines as before.
        return GFp(_batch_inverse_planes(self.planes, self.fs), self.fs)


    def sqrt(self) -> tuple["GFp", jax.Array]:
        """Per-lane square root, any odd prime — beyond the reference, whose
        sqrt static_asserts p = 3 (mod 4) (gfp.h:46-54,84-87).

        Dispatch (host-side, on public field constants):
          p = 3 (mod 4): x^((p+1)/4) — the reference's only case.
          p = 5 (mod 8): Atkin — r = x^((p+3)/8); if r^2 == -x multiply by
            sqrt(-1) (trace-time constant). Wei25519's 2^255 - 19 lands here.
          else: uniform-control-flow Tonelli-Shanks (masked selects per
            round, fixed s-round schedule — no data-dependent trips).

        Returns (root, ok_mask): ok is 0 on non-residue lanes (the reference
        collapses any-lane failure to nullopt; batched per-lane masks are the
        TPU-native shape of that optional). sqrt(0) = 0 with ok = 1.
        """
        fs = self.fs
        kind = fs.sqrt_kind
        if kind == "p3mod4":
            r = self.pow_const(fs.sqrt_exponent)
        elif kind == "p5mod8":
            r = self.pow_const((fs.p + 3) // 8)
            fixed = r * self.const_like(fs.sqrt_m1)
            r = r.select(bn.cmp_eq(r.sqr().planes, self.planes), fixed)
        else:
            r = self._tonelli_shanks()
        ok = bn.cmp_eq(r.sqr().planes, self.planes)
        return r, ok

    def _tonelli_shanks(self) -> "GFp":
        """Constant-time Tonelli-Shanks (the RFC 9380 general-case shape):
        fixed s-1 rounds, per-lane masked multiplies. ~2 full exponent
        chains + s^2/2 squarings; s is small for random primes."""
        fs = self.fs
        q, s, c_int = fs.ts_params
        c = self.const_like(c_int)
        t = self.pow_const(q)
        r = self.pow_const((q + 1) // 2)
        one = _one_planes(fs, self.planes)
        for i in range(s, 1, -1):
            b = t
            for _ in range(i - 2):
                b = b.sqr()
            e = bn.cmp_eq(b.planes, one)  # b == 1: this round is a no-op
            r = r.select(e, r * c)
            c = c.sqr()
            t = t.select(e, t * c)
        return r

    # -- predicates / selection ------------------------------------------------

    def __eq__(self, o):  # lane mask, not bool (eve-style comparison)
        return bn.cmp_eq(self.planes, o.planes)

    def is_zero(self):
        return bn.is_zero(self.planes)

    def select(self, mask, other: "GFp") -> "GFp":
        """mask ? self : other, per lane (ifelse.h:15-49)."""
        return GFp(bn.select(mask, self.planes, other.planes), self.fs)

    def const_like(self, value: int) -> "GFp":
        """Compile-time field constant shaped like self (internal domain)."""
        return GFp.constant(value, self.fs, self.planes)


def _scale_fallback(r, scale: int):
    """r * scale via double/add chains (any element type with double/+)."""
    if scale == 2:
        return r.double()
    if scale == 3:
        return r + r.double()
    if scale == 4:
        return r.double().double()
    if scale == 8:
        return r.double().double().double()
    raise ValueError(f"unsupported scale {scale}")


@functools.partial(jax.jit, static_argnames=("fs",))
def _batch_inverse_planes(planes, fs: FieldSpec):
    batch_shape = planes.shape[1:]
    d = planes.shape[0]
    flat = planes.reshape(d, -1)
    b = flat.shape[1]
    if b == 1:
        out = _pow_const_planes(flat, fs.fermat_exponent, fs)
        return out.reshape(planes.shape)

    zero = bn.is_zero(flat)
    one_col = _one_planes(fs, flat[:, :1])
    a = bn.select(zero, jnp.broadcast_to(one_col, flat.shape), flat)

    # pad to a power of two with multiplicative identities
    bp = 1 << (b - 1).bit_length()
    if bp != b:
        a = jnp.concatenate(
            [a, jnp.broadcast_to(one_col, (d, bp - b))], axis=1
        )

    pairs = []
    cur = a
    while cur.shape[1] > 1:
        left, right = cur[:, 0::2], cur[:, 1::2]
        pairs.append((left, right))
        cur = _mul_planes(left, right, fs)

    # The (D, 1) root Fermat chain gates the whole batch. The unrolled
    # public-exponent window power (_pow_const_planes_unrolled) would cut
    # its serial op count ~1.7x, but it is SHELVED (r5, measured): the
    # ~330 unrolled field ops per inversion OOM-kill the TPU remote-compile
    # helper on the full ECDSA sign graph (HTTP 500 SIGKILL, twice) and
    # cost 0.75-2.5 s/op of XLA:CPU compile in the test suite — while the
    # measured sign rate (1.96M/s) was captured with this rolled loop, so
    # the unroll's win was never demonstrated end-to-end. Keep rolled.
    inv = _pow_const_planes(cur, fs.fermat_exponent, fs)
    for left, right in reversed(pairs):
        inv_l = _mul_planes(inv, right, fs)
        inv_r = _mul_planes(inv, left, fs)
        inv = jnp.stack([inv_l, inv_r], axis=2).reshape(d, -1)

    inv = inv[:, :b]
    out = bn.select(zero, jnp.zeros_like(flat), inv)
    return out.reshape(planes.shape)

def gfp_swap_if(mask, a, b):
    """Constant-time masked swap (swap.h:15-45). Generic over the element
    type (XLA-path GFp or kernel-side VGFp) via .select."""
    return b.select(mask, a), a.select(mask, b)
