"""Signed fixed-window scalar multiplication (beyond-reference fast path)."""

import jax
import pytest

from ecsimd_tpu import api, convert
from ecsimd_tpu.oracle import coz, window as owindow
from ecsimd_tpu.specs import P256, P384


def test_recode_closed_form(rng):
    for curve in (P256, P384):
        for k in [1, 2, 3, 16, 17] + [rng.randrange(1, curve.order) for _ in range(8)]:
            owindow.recode(k, curve.field.nbits)  # self-asserting


def test_window_oracle_vs_coz(rng):
    for curve in (P256, P384):
        for k in [1, 2, 5, 6, 15, 16, 17] + [rng.randrange(1, curve.order) for _ in range(6)]:
            got = owindow.scalar_mult_affine(k, curve.gx, curve.gy, curve)
            assert got == coz.scalar_mult_affine(k, curve.gx, curve.gy, curve), (curve.name, k)


def _tpu_available():
    try:
        return any(d.platform != "cpu" for d in jax.devices())
    except RuntimeError:
        return False


@pytest.mark.skipif(not _tpu_available(), reason="needs TPU hardware")
def test_window_kernel_tpu(rng):
    from ecsimd_tpu.curves.point import JacobianPoint
    from ecsimd_tpu.kernels import window

    ks = [5, 2, 1, 6, 3, 17] + [rng.randrange(1, P256.order) for _ in range(122)]
    g = api.generator_batch(P256, len(ks))
    jg = JacobianPoint.from_affine(g)
    res = window.scalar_mult(api.scalars_from_ints(ks, P256), jg, tile=128)
    aff = res.to_affine()
    got = list(zip(convert.planes_to_ints(aff.x), convert.planes_to_ints(aff.y)))
    assert got == [coz.scalar_mult_affine(k, P256.gx, P256.gy, P256) for k in ks]


def test_shared_fast_scalar_broadcast():
    """scalar_mult_shared_fast broadcasts k into the exact planes the window
    kernel consumes (the end-to-end window path is covered by the twin tests
    and bench verification; this pins the shared-scalar plumbing)."""
    import jax.numpy as jnp
    import numpy as np

    k = 0x1234567890ABCDEF
    batch = 6
    want = convert.ints_to_planes([k] * batch, P256.field.ndigits)
    got = convert.broadcast_int(k, P256.field.ndigits, batch)
    assert np.array_equal(np.asarray(got), want)


@pytest.mark.skipif(not _tpu_available(), reason="needs TPU hardware")
def test_scalar_mult_shared_fast_tpu(rng):
    """Shared-scalar fast path (scalar_mult_1s parity, curve_group.h:221-251):
    one k, distinct points, through the window Pallas kernel."""
    k = rng.randrange(1, P256.order)
    pts = [coz.scalar_mult_affine(i + 2, P256.gx, P256.gy, P256) for i in range(128)]
    p = api.points_from_ints([x for x, _ in pts], [y for _, y in pts], P256)
    res = api.scalar_mult_shared_fast(k, p, tile=128)
    got = list(zip(convert.planes_to_ints(res.x), convert.planes_to_ints(res.y)))
    want = [coz.scalar_mult_affine(k * (i + 2) % P256.order, P256.gx, P256.gy, P256)
            for i in range(128)]
    assert got == want


def _vg(vals, fs):
    """Python ints -> VGFp with (1,)-shaped digit planes (eager)."""
    import jax.numpy as jnp

    from ecsimd_tpu.kernels.digits import VGFp

    pl = convert.ints_to_planes(vals, fs.ndigits)
    return VGFp([jnp.asarray(pl[k]) for k in range(fs.ndigits)], fs)


def test_add_complete_any_degenerate_cases(rng):
    """The strict-CT window's complete add resolves every case the plain
    general add corrupts: P + P (doubling), P + (-P) (infinity, z == 0),
    inf + Q (Q), and agrees with the oracle on a generic add — per lane, on
    both reduction strategies (Solinas toy + Montgomery toy)."""
    import numpy as np

    from ecsimd_tpu.kernels.coz import add_complete_any
    from ecsimd_tpu.oracle import window as ow
    from tests.toy import TOY64, TOYM

    for curve in (TOY64, TOYM):
        fs = curve.field
        p = fs.p
        to_i = (lambda v: v) if fs.plain else (
            lambda v: (v << fs.nbits) % p)
        from_i = (lambda v: v) if fs.plain else (
            lambda v: v * pow(1 << fs.nbits, -1, p) % p)
        ka, kb = 5, 7
        A = coz.jacobian_to_affine(
            ow.scalar_mult(ka, (curve.gx, curve.gy, 1), curve), curve)
        B = coz.jacobian_to_affine(
            ow.scalar_mult(kb, (curve.gx, curve.gy, 1), curve), curve)
        # lanes: [A+B generic, A+A same, A+(-A) opposite, inf+B]
        x1 = _vg([to_i(A[0])] * 3 + [to_i(1)], fs)
        y1 = _vg([to_i(A[1])] * 3 + [to_i(1)], fs)
        z1 = _vg([to_i(1)] * 3 + [0], fs)
        x2 = _vg([to_i(B[0]), to_i(A[0]), to_i(A[0]), to_i(B[0])], fs)
        y2 = _vg([to_i(B[1]), to_i(A[1]), to_i((p - A[1]) % p), to_i(B[1])], fs)
        z2 = _vg([to_i(1)] * 4, fs)
        x3, y3, z3 = add_complete_any(x1, y1, z1, x2, y2, z2, curve)
        import jax.numpy as jnp

        gx = [from_i(v) for v in convert.planes_to_ints(np.asarray(jnp.stack(x3.digs)))]
        gy = [from_i(v) for v in convert.planes_to_ints(np.asarray(jnp.stack(y3.digs)))]
        gz = [from_i(v) for v in convert.planes_to_ints(np.asarray(jnp.stack(z3.digs)))]

        def aff(i):
            zi = pow(gz[i], p - 2, p)
            return (gx[i] * zi * zi % p, gy[i] * zi * zi * zi % p)

        want_ab = coz.jacobian_to_affine(
            ow.scalar_mult(ka + kb, (curve.gx, curve.gy, 1), curve), curve)
        want_2a = coz.jacobian_to_affine(
            ow.scalar_mult(2 * ka, (curve.gx, curve.gy, 1), curve), curve)
        assert aff(0) == want_ab, curve.name          # generic add intact
        assert aff(1) == want_2a, curve.name          # P + P -> 2P
        assert gz[2] == 0, curve.name                 # P + (-P) -> infinity
        assert aff(3) == B, curve.name                # inf + Q -> Q


def test_window_strict_matches_plain_toy(rng):
    """strict=True agrees with the fast path (and the oracle) on
    non-degenerate scalars — toy curve, eager XLA twin, both parities."""
    import jax.numpy as jnp

    from ecsimd_tpu.curves.point import AffinePoint, JacobianPoint
    from ecsimd_tpu.kernels import window
    from tests.toy import TOY64

    fs = TOY64.field
    d = fs.ndigits
    ks = [1, 2, 5, 6, 255, 256, 12345, rng.randrange(1, 1 << 63)]
    xs = jnp.asarray(convert.broadcast_int(TOY64.gx, d, len(ks)))
    ys = jnp.asarray(convert.broadcast_int(TOY64.gy, d, len(ks)))
    jg = JacobianPoint.from_affine(AffinePoint(xs, ys, TOY64))
    scalars = jnp.asarray(convert.ints_to_planes(ks, d))
    import numpy as np

    p = fs.p
    outs = []
    for strict in (False, True):
        ax, ay, z = window.window_xla_planes(
            scalars, jg.x.planes, jg.y.planes, TOY64, strict=strict)
        got = []
        for X, Y, Z in zip(convert.planes_to_ints(np.asarray(ax)),
                           convert.planes_to_ints(np.asarray(ay)),
                           convert.planes_to_ints(np.asarray(z))):
            zi = pow(Z, p - 2, p)
            got.append((X * zi * zi % p, Y * zi * zi * zi % p))
        outs.append(got)
    want = [coz.scalar_mult_affine(k, TOY64.gx, TOY64.gy, TOY64) for k in ks]
    assert outs[0] == want and outs[1] == want


@pytest.mark.skipif(
    not __import__("os").environ.get("ECSIMD_SLOW_TESTS"),
    reason="P-256 strict window twin ~4 min eager on CPU (set ECSIMD_SLOW_TESTS=1)",
)
def test_window_strict_adversarial_p256(rng):
    """Adversarial scalars that BREAK the fast window path, through the
    strict-CT variant: k = n - 2 (a known degenerate-add scalar for the
    w=4 signed recoding on P-256 — bench.py excludes it from fast-path
    verification) and k = n - 1 (the accumulator passes through the point
    at infinity; outside even the ladder's domain). strict=True is total on
    [1, n)."""
    import jax.numpy as jnp
    import numpy as np

    from ecsimd_tpu.curves.point import AffinePoint, JacobianPoint
    from ecsimd_tpu.kernels import window
    from ecsimd_tpu.oracle import window as ow

    n = P256.order
    p = P256.field.p
    d = P256.field.ndigits
    ks = [n - 2, n - 1, rng.randrange(1, n)]
    # ground truth WITHOUT the coz-ladder oracle (its domain excludes n-1):
    # (n-1)G = -G; (n-2)G = -2G
    g2 = coz.jacobian_to_affine(ow._jac_dbl((P256.gx, P256.gy, 1), P256), P256)
    want = [(g2[0], (p - g2[1]) % p), (P256.gx, (p - P256.gy) % p),
            coz.scalar_mult_affine(ks[2], P256.gx, P256.gy, P256)]
    xs = jnp.asarray(convert.broadcast_int(P256.gx, d, len(ks)))
    ys = jnp.asarray(convert.broadcast_int(P256.gy, d, len(ks)))
    jg = JacobianPoint.from_affine(AffinePoint(xs, ys, P256))
    scalars = jnp.asarray(convert.ints_to_planes(ks, d))
    ax, ay, z = window.window_xla_planes(
        scalars, jg.x.planes, jg.y.planes, P256, strict=True)
    got = []
    for X, Y, Z in zip(convert.planes_to_ints(np.asarray(ax)),
                       convert.planes_to_ints(np.asarray(ay)),
                       convert.planes_to_ints(np.asarray(z))):
        zi = pow(Z, p - 2, p)
        got.append((X * zi * zi % p, Y * zi * zi * zi % p))
    assert got == want
