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
