"""Montgomery x-only ladder kernel (kernels/mladder.py): differential vs a
host int ladder on the 4-digit Crandall toy field (interpret mode covers the
kernel dialect), XLA-twin equivalence, and the X25519 composition."""

import jax.numpy as jnp
import numpy as np

from ecsimd_tpu import convert, x25519
from ecsimd_tpu.kernels import mladder
from ecsimd_tpu.specs import W25519_FIELD

from tests.toy import CRAN64


def host_xladder(k: int, u: int, p: int, a24: int, nbits: int):
    """RFC 7748 §5 ladder in plain ints (the oracle; works for ANY u —
    curve, twist, low-order)."""
    x2, z2, x3, z3 = 1, 0, u % p, 1
    swap = 0
    for t in range(nbits - 1, -1, -1):
        kt = (k >> t) & 1
        if swap ^ kt:
            x2, x3 = x3, x2
            z2, z3 = z3, z2
        swap = kt
        a, b = (x2 + z2) % p, (x2 - z2) % p
        aa, bb = a * a % p, b * b % p
        e = (aa - bb) % p
        c, d = (x3 + z3) % p, (x3 - z3) % p
        da, cb = d * a % p, c * b % p
        x3, z3 = (da + cb) ** 2 % p, u * (da - cb) ** 2 % p
        x2, z2 = aa * bb % p, e * (aa + a24 * e) % p
    if swap:
        x2, x3 = x3, x2
        z2, z3 = z3, z2
    return x2 % p, z2 % p


def _aff(x, z, p):
    return 0 if z % p == 0 else x * pow(z, -1, p) % p


def test_kernel_interpret_toy(rng):
    """Pallas kernel (interpret) vs the host ladder on CRAN64, arbitrary
    a24 — no curve membership needed (the ladder is plain algebra)."""
    fs = CRAN64
    p = fs.p
    a24, nbits = 5, 61
    lanes = 8
    ks = [rng.randrange(0, 1 << nbits) for _ in range(lanes)]
    us = [rng.randrange(0, p) for _ in range(lanes)]
    kp = jnp.asarray(convert.ints_to_planes(ks, fs.ndigits))
    up = jnp.asarray(convert.ints_to_planes(us, fs.ndigits))
    x2, z2 = mladder.mladder_planes(kp, up, fs, a24, nbits, tile=lanes,
                                    interpret=True)
    gx = convert.planes_to_ints(np.asarray(x2))
    gz = convert.planes_to_ints(np.asarray(z2))
    for k, u, X, Z in zip(ks, us, gx, gz):
        wx, wz = host_xladder(k, u, p, a24, nbits)
        assert _aff(X, Z, p) == _aff(wx, wz, p), (k, u)


def test_xla_twin_toy(rng):
    fs = CRAN64
    p = fs.p
    a24, nbits = 5, 61
    ks = [rng.randrange(0, 1 << nbits) for _ in range(4)]
    us = [rng.randrange(0, p) for _ in range(4)]
    kp = jnp.asarray(convert.ints_to_planes(ks, fs.ndigits))
    up = jnp.asarray(convert.ints_to_planes(us, fs.ndigits))
    x2, z2 = mladder.mladder_xla_planes(kp, up, fs, a24, nbits)
    gx = convert.planes_to_ints(np.asarray(x2))
    gz = convert.planes_to_ints(np.asarray(z2))
    for k, u, X, Z in zip(ks, us, gx, gz):
        wx, wz = host_xladder(k, u, p, a24, nbits)
        assert _aff(X, Z, p) == _aff(wx, wz, p)


def test_x25519_twin_note():
    """The d = 16 W25519 kernel-dialect twin is NOT jitted here: VGFp digit
    lists emit ~16x the HLO of the plane dialect and XLA:CPU needs >15 min
    for the 255-step loop (same class as the wei25519 co-Z jit pathology,
    CLAUDE.md). W25519 CPU coverage lives in tests/test_x25519.py (plane-
    dialect XLA path, ~100 s compile shared across the file); the Mosaic
    kernel itself is hardware-verified by scripts/bench_x25519.py."""
