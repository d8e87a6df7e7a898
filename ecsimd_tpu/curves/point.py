"""L4: batched curve points.

Affine points hold classical-domain planes (reference ``curve_point.h:13-43``);
Jacobian points hold Montgomery-domain GFp coordinates (reference
``jacobian_curve_point.h:11-68``). Both are pytrees usable under jit/shard_map.
"""

from __future__ import annotations

import dataclasses

import jax

from ecsimd_tpu.field import GFp
from ecsimd_tpu.ops import bignum as bn
from ecsimd_tpu.specs import CurveSpec


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AffinePoint:
    """Batched affine point, classical-domain planes (curve_point.h:13-43)."""

    x: jax.Array  # (D, *batch) int32, classical
    y: jax.Array
    curve: CurveSpec = dataclasses.field(metadata=dict(static=True))

    def __eq__(self, o):
        return bn.cmp_eq(self.x, o.x) & bn.cmp_eq(self.y, o.y)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class JacobianPoint:
    """Batched Jacobian point, Montgomery-domain GFp coords (jacobian_curve_point.h)."""

    x: GFp
    y: GFp
    z: GFp
    curve: CurveSpec = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def from_affine(cls, pt: AffinePoint) -> "JacobianPoint":
        """z = 1 (= R in Montgomery form); jacobian_curve_point.h:25-31."""
        fs = pt.curve.field
        x = GFp.from_classical(pt.x, fs)
        y = GFp.from_classical(pt.y, fs)
        return cls(x, y, GFp.one(fs, x.planes), pt.curve)

    def to_affine(self, batch_inv: bool = True) -> AffinePoint:
        """x/z^2, y/z^3 via field inversion; jacobian_curve_point.h:33-42.

        ``batch_inv=True`` (default) shares one Fermat inversion across the
        whole batch via the Montgomery trick (GFp.batch_inverse, ~3 mults
        per lane) instead of a per-lane Fermat power — the reference pays
        the per-element power (gfp.h:42-44). Pass False under a
        batch-sharded plain jit where the cross-lane tree would force
        collectives (shard_map callers keep True: per-shard trees).
        Lanes at infinity (z == 0) map to (0, 0) either way."""
        zi = self.z.batch_inverse() if batch_inv else self.z.inverse()
        zi2 = zi.sqr()
        ax = self.x * zi2
        ay = self.y * zi2 * zi
        return AffinePoint(ax.to_classical(), ay.to_classical(), self.curve)

    def opposite(self) -> "JacobianPoint":
        """(x, -y, z); jacobian_curve_point.h:48-54."""
        return JacobianPoint(self.x, self.y.opposite(), self.z, self.curve)

    def select(self, mask, other: "JacobianPoint") -> "JacobianPoint":
        """Per-lane mask ? self : other (ifelse.h:38-49)."""
        return JacobianPoint(
            self.x.select(mask, other.x),
            self.y.select(mask, other.y),
            self.z.select(mask, other.z),
            self.curve,
        )
