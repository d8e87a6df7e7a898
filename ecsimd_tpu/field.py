"""L3: GF(p) prime-field value type in Montgomery form.

The analogue of the reference's ``GFp<WBN, P>`` (``gfp.h:17-115``): a pytree
wrapping Montgomery-domain digit planes with operator sugar, Fermat inversion,
and p = 3 (mod 4) square roots. Field ops dispatch to the L2 plane kernels, so
a GFp behaves identically inside jit, vmap, shard_map, and Pallas kernel bodies.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ecsimd_tpu.ops import bignum as bn
from ecsimd_tpu.ops import mont
from ecsimd_tpu.specs import FieldSpec, int_to_digits


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GFp:
    """A batch of field elements, stored as Montgomery-domain digit planes."""

    planes: jax.Array  # (D, *batch) int32, digits in [0, 2^16), value in [0, p)
    fs: FieldSpec = dataclasses.field(metadata=dict(static=True))

    # -- constructors --------------------------------------------------------

    @classmethod
    def from_classical(cls, planes, fs: FieldSpec) -> "GFp":
        """classical planes -> Montgomery domain (gfp via mgry.h:47-50)."""
        return cls(mont.mont_from_classical(planes, fs), fs)

    @classmethod
    def from_mont(cls, planes, fs: FieldSpec) -> "GFp":
        return cls(planes, fs)

    @classmethod
    def constant(cls, value: int, fs: FieldSpec, like) -> "GFp":
        """Compile-time constant, pre-converted to Montgomery domain on host."""
        m = (value << fs.nbits) % fs.p
        c = mont._const_planes(int_to_digits(m, fs.ndigits), like)
        return cls(jnp.broadcast_to(c, like.shape), fs)

    @classmethod
    def one(cls, fs: FieldSpec, like) -> "GFp":
        """mont(1) = R mod p (gfp.h:30-32)."""
        return cls(mont.mont_one(fs, like), fs)

    @classmethod
    def zero(cls, fs: FieldSpec, like) -> "GFp":
        return cls(jnp.zeros_like(like), fs)

    # -- accessors -----------------------------------------------------------

    def to_classical(self):
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
        return GFp(mont.mont_mul(self.planes, o.planes, self.fs), self.fs)

    def sqr(self) -> "GFp":
        return GFp(mont.mont_sqr(self.planes, self.fs), self.fs)

    def double(self) -> "GFp":
        return GFp(mont.mod_shift_left_one(self.planes, self.fs), self.fs)

    def shift_left(self, count: int) -> "GFp":
        """x * 2^count by repeated modular doubling (gfp_shift_left, gfp.h:112-115)."""
        return GFp(mont.mod_shift_left(self.planes, count, self.fs), self.fs)

    def opposite(self) -> "GFp":
        """-x mod p (gfp.h:60-64)."""
        return GFp(mont.mod_opposite(self.planes, self.fs), self.fs)

    def pow_const(self, e: int) -> "GFp":
        return GFp(mont.mont_pow_const(self.planes, e, self.fs), self.fs)

    def inverse(self) -> "GFp":
        """Fermat inversion x^(p-2) (gfp.h:42-44). inverse(0) = 0."""
        return self.pow_const(self.fs.fermat_exponent)

    def sqrt(self) -> tuple["GFp", jax.Array]:
        """Per-lane square root x^((p+1)/4), p = 3 mod 4 (gfp.h:46-54,84-87).

        Returns (root, ok_mask): ok is 0 on non-residue lanes (the reference
        collapses any-lane failure to nullopt; batched per-lane masks are the
        TPU-native shape of that optional).
        """
        r = self.pow_const(self.fs.sqrt_exponent)
        ok = bn.cmp_eq(r.sqr().planes, self.planes)
        return r, ok

    # -- predicates / selection ------------------------------------------------

    def __eq__(self, o):  # lane mask, not bool (eve-style comparison)
        return bn.cmp_eq(self.planes, o.planes)

    def is_zero(self):
        return bn.is_zero(self.planes)

    def select(self, mask, other: "GFp") -> "GFp":
        """mask ? self : other, per lane (ifelse.h:15-49)."""
        return GFp(bn.select(mask, self.planes, other.planes), self.fs)


def gfp_swap_if(mask, a: GFp, b: GFp) -> tuple[GFp, GFp]:
    """Constant-time masked swap (swap.h:15-45)."""
    pa, pb = bn.swap_if(mask, a.planes, b.planes)
    return GFp(pa, a.fs), GFp(pb, b.fs)
