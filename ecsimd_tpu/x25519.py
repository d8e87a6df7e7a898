"""RFC 7748 X25519 — batched x-only Montgomery ladder over 2^255 - 19.

The framework's Wei25519 curve covers Curve25519 points with known y
(short-Weierstrass map, specs.py); a CONFORMING X25519 must also accept
u-coordinates on the quadratic twist (RFC 7748 §5 processes any 255-bit u),
which have no Weierstrass lift. The Montgomery x-only ladder needs no y and
is twist-agnostic, so this module implements it directly on GFp planes over
the Crandall field (ops/crandall.py fast reduction):

  per bit (254..0): conditional-swap on the clamped scalar bit, then the
  standard 5M + 4S + 1*a24 ladder step (RFC 7748 §5 pseudocode); one
  batch-shared inversion (GFp.batch_inverse) for the final x2/z2.

Constant-time discipline as everywhere: per-lane masked swaps, uniform
control flow, scalars never branch. Batched byte-level API matching the
RFC I/O conventions (little-endian, masked top bit, clamped scalars).

No reference counterpart (the reference has no Montgomery-form code at
all); differentially tested against the `cryptography` package's X25519
and the RFC 7748 §5.2 test vectors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ecsimd_tpu import convert
from ecsimd_tpu.field import GFp, gfp_swap_if
from ecsimd_tpu.ops import bignum as bn
from ecsimd_tpu.specs import DIGIT_BITS, W25519_FIELD

A24 = 121665  # (486662 - 2) / 4


def clamp(k_bytes: bytes) -> int:
    """RFC 7748 §5 decodeScalar25519."""
    k = bytearray(k_bytes)
    k[0] &= 248
    k[31] &= 127
    k[31] |= 64
    return int.from_bytes(bytes(k), "little")


def decode_u(u_bytes: bytes) -> int:
    """RFC 7748 §5 decodeUCoordinate: mask the unused top bit. The value is
    NOT reduced mod p here (the RFC feeds it to the ladder as-is; the
    field ops reduce implicitly)."""
    u = bytearray(u_bytes)
    u[31] &= 127
    return int.from_bytes(bytes(u), "little")


def x25519_planes(k_planes, u_planes, use_kernel: bool = False,
                  tile: int = 2048, interpret: bool = False):
    """Batched X25519 on digit planes: k (D, B) CLAMPED scalars, u (D, B)
    u-coordinates (masked, < 2^255). Returns (D, B) output u planes.

    The ladder runs 255 fixed iterations (bits 254..0) with the deferred
    conditional-swap formulation of RFC 7748 §5; all lanes advance in
    lockstep with per-lane masks. ``use_kernel=True`` routes through the
    fused Pallas Montgomery-ladder kernel (kernels/mladder.py — the TPU
    fast path, VMEM-resident state; auto-pads the batch to a tile
    multiple); False is the XLA path (CPU-compilable)."""
    if use_kernel:
        from ecsimd_tpu import parallel

        kp, b_true = parallel.pad_batch(k_planes, tile)
        up, _ = parallel.pad_batch(u_planes, tile)
        out = _x25519_kernel_jit(kp, up, tile=tile, interpret=interpret)
        return out[:, :b_true]
    return _x25519_xla_jit(k_planes, u_planes)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _x25519_kernel_jit(k_planes, u_planes, tile: int, interpret: bool):
    from ecsimd_tpu.kernels import mladder

    fs = W25519_FIELD
    u_planes = bn.sub_if_above(u_planes, jnp.broadcast_to(
        jnp.asarray(
            convert.ints_to_planes([fs.p], fs.ndigits)), u_planes.shape))
    x2, z2 = mladder.mladder_planes(
        k_planes, u_planes, fs, A24, 255, tile=tile, interpret=interpret)
    return (GFp.from_mont(x2, fs)
            * GFp.from_mont(z2, fs).batch_inverse()).to_classical()


@functools.partial(jax.jit)
def _x25519_xla_jit(k_planes, u_planes):
    fs = W25519_FIELD
    from jax import lax

    # u may be in [2^255 - 19, 2^255): reduce once so GFp's invariant holds
    u_planes = bn.sub_if_above(u_planes, jnp.broadcast_to(
        jnp.asarray(
            convert.ints_to_planes([fs.p], fs.ndigits)), u_planes.shape))
    x1 = GFp.from_classical(u_planes, fs)
    one = GFp.one(fs, x1.planes)
    zero = GFp.zero(fs, x1.planes)
    a24 = GFp.constant(A24, fs, x1.planes)

    def bit_at(i):
        digit = lax.div(i, DIGIT_BITS)
        off = lax.rem(i, DIGIT_BITS)
        plane = lax.dynamic_index_in_dim(k_planes, digit, axis=0, keepdims=False)
        return lax.shift_right_logical(plane, off) & 1

    def body(t, state):
        x2, z2, x3, z3, swap = state
        i = 254 - t
        kt = bit_at(i)
        sw = swap ^ kt
        x2, x3 = gfp_swap_if(sw, x2, x3)
        z2, z3 = gfp_swap_if(sw, z2, z3)

        a = x2 + z2
        aa = a.sqr()
        b = x2 - z2
        bb = b.sqr()
        e = aa - bb
        c = x3 + z3
        d = x3 - z3
        da = d * a
        cb = c * b
        x3n = (da + cb).sqr()
        z3n = x1 * (da - cb).sqr()
        x2n = aa * bb
        z2n = e * (aa + a24 * e)
        return x2n, z2n, x3n, z3n, kt

    x2, z2, x3, z3, swap = lax.fori_loop(
        0, 255, body,
        (one, zero, x1, one, jnp.zeros(x1.planes.shape[1:], jnp.int32)),
    )
    x2, x3 = gfp_swap_if(swap, x2, x3)
    z2, z3 = gfp_swap_if(swap, z2, z3)
    # one batch-shared inversion; z2 == 0 (low-order u) yields output 0,
    # matching RFC behavior (all-zero shared secret, caller checks)
    return (x2 * z2.batch_inverse()).to_classical()


def derive_public_batch(ks: list[bytes], use_kernel: bool = False,
                        tile: int = 2048) -> list[bytes]:
    """Batched X25519 public-key derivation X25519(k, 9) through the
    FIXED-BASE comb on Wei25519 (the Weierstrass lift of the base point:
    WEI25519.gx - A/3 = 9 exactly), ~5-8x the variable-point ladder —
    base-point multiplication never needs the twist-safety that forces the
    x-only ladder for exchanges. Clamped scalars sit near 2^254 (above the
    subgroup order n ~ 2^252); the comb chain is defined over the full
    256-bit scalar range, computing (k mod n)*G like the RFC ladder.

    use_kernel=True runs the Mosaic comb (TPU); False the XLA twin path
    via curves/group (CPU-testable at this scale would be slow — tests use
    the ladder XLA path for differentials and scripts for the kernel).
    """
    from ecsimd_tpu.kernels import comb
    from ecsimd_tpu.specs import WEI25519

    d = W25519_FIELD.ndigits
    p = W25519_FIELD.p
    kp = jnp.asarray(convert.ints_to_planes([clamp(k) for k in ks], d))
    res = comb.scalar_mult_base(kp, WEI25519, tile=min(tile, max(len(ks), 8)),
                                use_kernel=use_kernel,
                                interpret=not use_kernel)
    aff = res.to_affine()
    a3 = 486662 * pow(3, -1, p) % p
    import numpy as np

    xs = convert.planes_to_ints(np.asarray(aff.x))
    return [((x - a3) % p).to_bytes(32, "little") for x in xs]


def x25519_batch(ks: list[bytes], us: list[bytes]) -> list[bytes]:
    """Batched RFC 7748 X25519(k, u) on raw 32-byte strings."""
    d = W25519_FIELD.ndigits
    kp = jnp.asarray(convert.ints_to_planes([clamp(k) for k in ks], d))
    up = jnp.asarray(convert.ints_to_planes([decode_u(u) for u in us], d))
    import numpy as np

    out = convert.planes_to_ints(np.asarray(x25519_planes(kp, up)))
    return [int(v).to_bytes(32, "little") for v in out]


def x25519(k: bytes, u: bytes) -> bytes:
    return x25519_batch([k], [u])[0]
