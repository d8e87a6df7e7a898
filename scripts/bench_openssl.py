"""Competitor baseline: host OpenSSL P-256 scalar multiplication.

The reference benches itself against Botan / Crypto++ / OpenSSL base-point
multiplication (/root/reference/benchs/p256_ref.cpp:20-100, registered at
:98-100). This is the same yardstick for the TPU framework: single-core host
OpenSSL, measured two ways —

- fixed-base (matches p256_ref.cpp's ExponentiateBase workloads and our comb
  kernel): ``cryptography`` derive_private_key -> public_key, which is
  EC_POINT_mul against the precomputed generator table;
- variable-base (matches our window/ladder kernels): ``openssl speed
  ecdhp256`` if the CLI is available (ECDH = scalar x peer-point).

Plus a second independent competitor in the spirit of the reference's
three-way comparison: libgcrypt's gcry_mpi_ec_mul through ctypes (Botan and
Crypto++ are not in this image; libgcrypt.so is), oracle-verified.

Prints one JSON line. Recorded numbers live in BASELINE.md.
"""

import json
import re
import subprocess
import time


def fixed_base(iters: int = 2000) -> float:
    from cryptography.hazmat.primitives.asymmetric import ec

    k0 = 0x1234567890ABCDEF1234567890ABCDEF1234567890ABCDEF1234567890ABCDEF
    for i in range(10):
        ec.derive_private_key(k0 + i, ec.SECP256R1()).public_key()
    t0 = time.perf_counter()
    for i in range(iters):
        ec.derive_private_key(k0 + i, ec.SECP256R1()).public_key()
    return iters / (time.perf_counter() - t0)


def variable_base() -> float | None:
    try:
        out = subprocess.run(
            ["openssl", "speed", "ecdhp256"], capture_output=True, text=True, timeout=120
        ).stdout
    except (FileNotFoundError, subprocess.TimeoutExpired):
        return None
    m = re.search(r"ecdh \(nistp256\)\s+[\d.]+s\s+([\d.]+)", out)
    return float(m.group(1)) if m else None

def gcrypt(iters: int = 2000) -> dict | None:
    """libgcrypt P-256 scalar multiplication via ctypes (the second
    independent competitor, standing in for the reference's Botan/Crypto++
    rows, p256_ref.cpp:98-99 — neither library nor its headers exist in this
    image, but libgcrypt.so.20 does). Verified against the repo's Python-int
    oracle before timing; returns None if the library is missing."""
    import ctypes
    import ctypes.util

    path = ctypes.util.find_library("gcrypt") or "libgcrypt.so.20"
    try:
        g = ctypes.CDLL(path)
    except OSError:
        return None
    g.gcry_check_version.restype = ctypes.c_char_p
    g.gcry_check_version(None)
    for fn, res in [("gcry_mpi_ec_new", ctypes.c_uint), ("gcry_mpi_point_new", ctypes.c_void_p),
                    ("gcry_mpi_new", ctypes.c_void_p), ("gcry_mpi_ec_get_point", ctypes.c_void_p),
                    ("gcry_mpi_scan", ctypes.c_uint), ("gcry_mpi_ec_get_affine", ctypes.c_int),
                    ("gcry_mpi_print", ctypes.c_uint)]:
        getattr(g, fn).restype = res

    ctx = ctypes.c_void_p()
    if g.gcry_mpi_ec_new(ctypes.byref(ctx), None, b"NIST P-256"):
        return None
    gen = ctypes.c_void_p(g.gcry_mpi_ec_get_point(b"g", ctx, 1))
    if not gen:
        return None

    GCRYMPI_FMT_HEX = 4

    def mpi_from_int(v: int):
        m = ctypes.c_void_p()
        rc = g.gcry_mpi_scan(ctypes.byref(m), GCRYMPI_FMT_HEX, b"%064X" % v, 0, None)
        assert rc == 0
        return m

    def mpi_to_int(m) -> int:
        buf = ctypes.create_string_buffer(200)
        n = ctypes.c_size_t()
        rc = g.gcry_mpi_print(GCRYMPI_FMT_HEX, buf, len(buf), ctypes.byref(n), m)
        assert rc == 0
        return int(buf.value, 16)

    q = ctypes.c_void_p(g.gcry_mpi_point_new(0))
    rx, ry = ctypes.c_void_p(g.gcry_mpi_new(0)), ctypes.c_void_p(g.gcry_mpi_new(0))

    def mult(k: int) -> tuple[int, int]:
        km = mpi_from_int(k)
        g.gcry_mpi_ec_mul(q, km, gen, ctx)
        assert g.gcry_mpi_ec_get_affine(rx, ry, q, ctx) == 0
        g.gcry_mpi_release(km)
        return mpi_to_int(rx), mpi_to_int(ry)

    # correctness gate vs the repo's Python-int oracle
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ecsimd_tpu.oracle import coz
    from ecsimd_tpu.specs import P256

    for k in (1, 2, 0x1234567890ABCDEF, P256.order - 2):
        assert mult(k) == coz.scalar_mult_affine(k, P256.gx, P256.gy, P256), hex(k)

    k0 = 0x1234567890ABCDEF1234567890ABCDEF1234567890ABCDEF1234567890ABCDEF
    t0 = time.perf_counter()
    for i in range(iters):
        mult(k0 + i)
    return {"gcrypt_p256_mults_per_sec": round(iters / (time.perf_counter() - t0), 1)}


def main():
    print(
        json.dumps(
            {
                "openssl_p256_fixed_base_mults_per_sec": round(fixed_base(), 1),
                "openssl_p256_variable_base_mults_per_sec": variable_base(),
                **(gcrypt() or {}),
                "hardware": "host CPU, single core",
            }
        )
    )


if __name__ == "__main__":
    main()
