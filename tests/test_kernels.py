"""Pallas kernel tests.

The digit-list field ops (kernels/digits.py) are exercised through tiny
pallas_call harnesses in interpret mode — bit-exact vs Python ints. The full
254-step ladder kernel is too large for interpret mode (fully unrolled
digit-list trace), so its end-to-end check runs on real TPU hardware:
bench.py asserts lane 0 against the oracle on every bench run, and
test_ladder_kernel_tpu below runs when a TPU is reachable.
"""

import functools
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ecsimd_tpu import api, convert
from ecsimd_tpu.kernels import digits
from ecsimd_tpu.oracle import coz
from ecsimd_tpu.specs import P256, P256_FIELD, P384_FIELD, SECP256K1_FIELD, W25519_FIELD

S, L = 2, 4  # tiny tile for interpret mode
BATCH = S * L


def _run_binop(op, a_ints, b_ints, fs):
    d = fs.ndigits

    def kernel(a_ref, b_ref, o_ref):
        a = [a_ref[k] for k in range(d)]
        b = [b_ref[k] for k in range(d)]
        out = op(a, b)
        for k in range(d):
            o_ref[k] = out[k]

    a = jnp.asarray(convert.ints_to_planes(a_ints, d)).reshape(d, S, L)
    b = jnp.asarray(convert.ints_to_planes(b_ints, d)).reshape(d, S, L)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((d, S, L), jnp.int32),
        interpret=True,
    )(a, b)
    return convert.planes_to_ints(np.asarray(out).reshape(d, BATCH))


def _rand_ints(rng, fs, n):
    vals = [0, 1, fs.p - 1, fs.p - 2]
    vals += [rng.randrange(fs.p) for _ in range(n - len(vals))]
    return vals[:n]


@pytest.mark.parametrize(
    "fs", [P256_FIELD, P384_FIELD, SECP256K1_FIELD, W25519_FIELD], ids=lambda f: f.name
)
def test_kernel_field_mul_sqr(fs, rng):
    a = _rand_ints(rng, fs, BATCH)
    b = list(reversed(_rand_ints(rng, fs, BATCH)))
    scale = 1 if fs.plain else fs.R_inv
    got = _run_binop(lambda x, y: digits.field_mul(x, y, fs), a, b, fs)
    assert got == [x * y * scale % fs.p for x, y in zip(a, b)]
    got = _run_binop(lambda x, y: digits.field_sqr(x, fs), a, b, fs)
    assert got == [x * x * scale % fs.p for x in a]


@pytest.mark.parametrize("fs", [P256_FIELD, SECP256K1_FIELD], ids=lambda f: f.name)
def test_kernel_mod_ops(fs, rng):
    a = _rand_ints(rng, fs, BATCH)
    b = list(reversed(_rand_ints(rng, fs, BATCH)))
    got = _run_binop(lambda x, y: digits.mod_add(x, y, fs), a, b, fs)
    assert got == [(x + y) % fs.p for x, y in zip(a, b)]
    got = _run_binop(lambda x, y: digits.mod_sub(x, y, fs), a, b, fs)
    assert got == [(x - y) % fs.p for x, y in zip(a, b)]
    got = _run_binop(lambda x, y: digits.mod_double(x, fs), a, b, fs)
    assert got == [2 * x % fs.p for x in a]
    got = _run_binop(lambda x, y: digits.mod_opposite(x, fs), a, b, fs)
    assert got == [(-x) % fs.p for x in a]


def _tpu_available():
    try:
        return any(d.platform != "cpu" for d in jax.devices())
    except RuntimeError:
        return False


@pytest.mark.skipif(not _tpu_available(), reason="needs TPU hardware")
def test_ladder_kernel_tpu(rng):
    from ecsimd_tpu.curves.point import JacobianPoint
    from ecsimd_tpu.kernels import ladder

    ks = [5, 2, 1, 6] + [rng.randrange(1, P256.order) for _ in range(124)]
    g = api.generator_batch(P256, len(ks))
    jg = JacobianPoint.from_affine(g)
    res = ladder.scalar_mult(api.scalars_from_ints(ks, P256), jg, tile=128)
    aff = res.to_affine()
    got = list(zip(convert.planes_to_ints(aff.x), convert.planes_to_ints(aff.y)))
    want = [coz.scalar_mult_affine(k, P256.gx, P256.gy, P256) for k in ks]
    assert got == want


# --- end-to-end kernel coverage on CPU via the 64-bit toy Solinas curve ------
# (256-bit interpret mode is intractable; 4 digits make it a few seconds)


def _toy_points(ks):
    import jax.numpy as jnp

    from ecsimd_tpu.curves.point import AffinePoint, JacobianPoint
    from tests.toy import TOY64

    d = TOY64.field.ndigits
    xs = jnp.asarray(convert.broadcast_int(TOY64.gx, d, len(ks)))
    ys = jnp.asarray(convert.broadcast_int(TOY64.gy, d, len(ks)))
    scalars = jnp.asarray(convert.ints_to_planes(ks, d))
    return scalars, JacobianPoint.from_affine(AffinePoint(xs, ys, TOY64))


def test_ladder_kernel_toy_interpret(rng):
    from ecsimd_tpu.kernels import ladder
    from tests.toy import TOY64

    ks = [2, 5, 6, rng.randrange(1, 1 << 63)]
    scalars, jg = _toy_points(ks)
    res = ladder.scalar_mult(scalars, jg, tile=4, interpret=True)
    aff = res.to_affine()
    got = list(zip(convert.planes_to_ints(aff.x), convert.planes_to_ints(aff.y)))
    want = [coz.scalar_mult_affine(k, TOY64.gx, TOY64.gy, TOY64) for k in ks]
    assert got == want


# NOTE: no interpret-mode toy test for the window kernel: pallas interpret
# degenerates (>400s for the 8-entry table build alone, though the same ops
# run in <1s eagerly and compile fine on TPU). Instead the kernel body is
# shared with an XLA-compiled twin (window.window_xla_planes wraps the same
# _window_core) tested end-to-end below on CPU; the Pallas plumbing around it
# is covered by the ladder/comb interpret tests and test_window_kernel_tpu.


def _affine_from_solinas_planes(ax, ay, z, curve):
    """Jacobian result planes -> affine (x, y) ints, host-side.

    Valid for Solinas fields only (internal domain == classical). Keeps the
    twin tests off the eager XLA to_affine path, which dispatches thousands
    of tiny un-jitted ops on CPU (minutes per point)."""
    assert curve.field.reduction == "solinas"
    p = curve.field.p
    out = []
    for X, Y, Z in zip(
        convert.planes_to_ints(np.asarray(ax)),
        convert.planes_to_ints(np.asarray(ay)),
        convert.planes_to_ints(np.asarray(z)),
    ):
        zi = pow(Z, p - 2, p)
        out.append((X * zi * zi % p, Y * zi * zi * zi % p))
    return out


def _check_window_xla(curve, ks):
    import jax.numpy as jnp

    from ecsimd_tpu.curves.point import AffinePoint, JacobianPoint
    from ecsimd_tpu.kernels import window

    fs = curve.field
    d = fs.ndigits
    xs = jnp.asarray(convert.broadcast_int(curve.gx, d, len(ks)))
    ys = jnp.asarray(convert.broadcast_int(curve.gy, d, len(ks)))
    jg = JacobianPoint.from_affine(AffinePoint(xs, ys, curve))
    scalars = jnp.asarray(convert.ints_to_planes(ks, d))
    ax, ay, z = window.window_xla_planes(
        scalars, jg.x.planes, jg.y.planes, curve
    )
    got = _affine_from_solinas_planes(ax, ay, z, curve)
    assert got == [coz.scalar_mult_affine(k, curve.gx, curve.gy, curve) for k in ks]


def test_ladder_core_xla_toy(rng):
    """The ladder kernel's exact compute path (fused ZDAU, masked swaps,
    parity fixup) XLA-compiled on CPU via the shared _ladder_core."""
    import jax.numpy as jnp

    from ecsimd_tpu.curves.point import AffinePoint, JacobianPoint
    from ecsimd_tpu.kernels import ladder
    from tests.toy import TOY64

    fs = TOY64.field
    d = fs.ndigits
    ks = [1, 2, 5, 6, 255, 256, 12345, rng.randrange(1, 1 << 63)]
    xs = jnp.asarray(convert.broadcast_int(TOY64.gx, d, len(ks)))
    ys = jnp.asarray(convert.broadcast_int(TOY64.gy, d, len(ks)))
    jg = JacobianPoint.from_affine(AffinePoint(xs, ys, TOY64))
    scalars = jnp.asarray(convert.ints_to_planes(ks, d))
    ax, ay, z = ladder.ladder_xla_planes(scalars, jg.x.planes, jg.y.planes, TOY64)
    got = _affine_from_solinas_planes(ax, ay, z, TOY64)
    assert got == [coz.scalar_mult_affine(k, TOY64.gx, TOY64.gy, TOY64) for k in ks]


def test_window_core_xla_toy(rng):
    """Full window compute path (table build, masked gather, fused group law,
    parity fixup) XLA-compiled on CPU — toy curve, both parities."""
    from tests.toy import TOY64

    ks = [1, 2, 5, 6, 255, 256, 12345, rng.randrange(1, 1 << 63)]
    _check_window_xla(TOY64, ks)


@pytest.mark.skipif(
    not __import__("os").environ.get("ECSIMD_SLOW_TESTS"),
    reason="P-256 window twin ~4 min eager on CPU (set ECSIMD_SLOW_TESTS=1)",
)
def test_window_core_xla_p256(rng):
    """Same, on real P-256 — the flagship kernel's full-width compute path
    without TPU hardware (~4 min of eager dispatch; verified passing), gated
    out of the default suite for time."""
    ks = [1, 2, 5, 6] + [rng.randrange(1, P256.order) for _ in range(3)]
    _check_window_xla(P256, ks)


def test_ladder_kernel_toy_mont_interpret(rng):
    """The ladder kernel end-to-end on a Montgomery-reduction field (CIOS
    digit-list mul + unfused group-law fallbacks inside the kernel) — the
    code path generic primes like secp256k1 take; the Solinas toy cannot
    reach it."""
    from ecsimd_tpu.kernels import ladder
    from tests.toy import TOYM

    ks = [2, 5, 6, rng.randrange(1, 1 << 63)]
    d = TOYM.field.ndigits
    import jax.numpy as jnp

    from ecsimd_tpu.curves.point import AffinePoint, JacobianPoint

    xs = jnp.asarray(convert.broadcast_int(TOYM.gx, d, len(ks)))
    ys = jnp.asarray(convert.broadcast_int(TOYM.gy, d, len(ks)))
    jg = JacobianPoint.from_affine(AffinePoint(xs, ys, TOYM))
    scalars = jnp.asarray(convert.ints_to_planes(ks, d))
    res = ladder.scalar_mult(scalars, jg, tile=4, interpret=True)
    # host-side affine: planes are Montgomery-domain (value * R mod p)
    fs = TOYM.field
    p = fs.p
    R_inv = pow(fs.R, p - 2, p)
    got = []
    for X, Y, Z in zip(convert.planes_to_ints(np.asarray(res.x.planes)),
                       convert.planes_to_ints(np.asarray(res.y.planes)),
                       convert.planes_to_ints(np.asarray(res.z.planes))):
        X, Y, Z = X * R_inv % p, Y * R_inv % p, Z * R_inv % p
        zi = pow(Z, p - 2, p)
        got.append((X * zi * zi % p, Y * zi * zi * zi % p))
    want = [coz.scalar_mult_affine(k, TOYM.gx, TOYM.gy, TOYM) for k in ks]
    assert got == want


def test_window_core_xla_toy_mont(rng):
    """Window compute path on the Montgomery-reduction toy curve (CIOS digit
    mul + unfused double/add scaling fallbacks) — the generic-prime window
    path end-to-end on CPU."""
    import jax.numpy as jnp

    from ecsimd_tpu.curves.point import AffinePoint, JacobianPoint
    from ecsimd_tpu.kernels import window
    from tests.toy import TOYM

    fs = TOYM.field
    d = fs.ndigits
    ks = [1, 2, 5, 6, 255, 12345, rng.randrange(1, 1 << 63)]
    xs = jnp.asarray(convert.broadcast_int(TOYM.gx, d, len(ks)))
    ys = jnp.asarray(convert.broadcast_int(TOYM.gy, d, len(ks)))
    jg = JacobianPoint.from_affine(AffinePoint(xs, ys, TOYM))
    scalars = jnp.asarray(convert.ints_to_planes(ks, d))
    ax, ay, z = window.window_xla_planes(scalars, jg.x.planes, jg.y.planes, TOYM)
    p = fs.p
    R_inv = pow(fs.R, p - 2, p)
    got = []
    for X, Y, Z in zip(convert.planes_to_ints(np.asarray(ax)),
                       convert.planes_to_ints(np.asarray(ay)),
                       convert.planes_to_ints(np.asarray(z))):
        X, Y, Z = X * R_inv % p, Y * R_inv % p, Z * R_inv % p
        zi = pow(Z, p - 2, p)
        got.append((X * zi * zi % p, Y * zi * zi * zi % p))
    assert got == [coz.scalar_mult_affine(k, TOYM.gx, TOYM.gy, TOYM) for k in ks]


def test_ladder_kernel_toy_crandall_interpret(rng):
    """The ladder kernel end-to-end on a Crandall-reduction field (M61 fold
    digit-list mul + fused plain-domain group law inside the kernel) — the
    code path P-521 / Wei25519 take after r4's reduction flip."""
    from ecsimd_tpu.curves.point import AffinePoint, JacobianPoint
    from ecsimd_tpu.kernels import ladder
    from tests.toy import TOYC

    ks = [2, 5, 6, rng.randrange(1, 1 << 60)]
    d = TOYC.field.ndigits
    xs = jnp.asarray(convert.broadcast_int(TOYC.gx, d, len(ks)))
    ys = jnp.asarray(convert.broadcast_int(TOYC.gy, d, len(ks)))
    jg = JacobianPoint.from_affine(AffinePoint(xs, ys, TOYC))
    scalars = jnp.asarray(convert.ints_to_planes(ks, d))
    res = ladder.scalar_mult(scalars, jg, tile=4, interpret=True)
    p = TOYC.p  # plain domain: no R factor to strip
    got = []
    for X, Y, Z in zip(convert.planes_to_ints(np.asarray(res.x.planes)),
                       convert.planes_to_ints(np.asarray(res.y.planes)),
                       convert.planes_to_ints(np.asarray(res.z.planes))):
        zi = pow(Z, p - 2, p)
        got.append((X * zi * zi % p, Y * zi * zi * zi % p))
    assert got == [coz.scalar_mult_affine(k, TOYC.gx, TOYC.gy, TOYC) for k in ks]


def test_window_core_xla_toy_crandall(rng):
    """Window compute path (fused Crandall reductions throughout) on the M61
    toy — P-521's exact code shape end-to-end on CPU."""
    from ecsimd_tpu.curves.point import AffinePoint, JacobianPoint
    from ecsimd_tpu.kernels import window
    from tests.toy import TOYC

    d = TOYC.field.ndigits
    ks = [1, 2, 5, 6, 255, 12345, rng.randrange(1, 1 << 60)]
    xs = jnp.asarray(convert.broadcast_int(TOYC.gx, d, len(ks)))
    ys = jnp.asarray(convert.broadcast_int(TOYC.gy, d, len(ks)))
    jg = JacobianPoint.from_affine(AffinePoint(xs, ys, TOYC))
    scalars = jnp.asarray(convert.ints_to_planes(ks, d))
    ax, ay, z = window.window_xla_planes(scalars, jg.x.planes, jg.y.planes, TOYC)
    p = TOYC.p
    got = []
    for X, Y, Z in zip(convert.planes_to_ints(np.asarray(ax)),
                       convert.planes_to_ints(np.asarray(ay)),
                       convert.planes_to_ints(np.asarray(z))):
        zi = pow(Z, p - 2, p)
        got.append((X * zi * zi % p, Y * zi * zi * zi % p))
    assert got == [coz.scalar_mult_affine(k, TOYC.gx, TOYC.gy, TOYC) for k in ks]
