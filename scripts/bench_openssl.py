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

def main():
    print(
        json.dumps(
            {
                "openssl_p256_fixed_base_mults_per_sec": round(fixed_base(), 1),
                "openssl_p256_variable_base_mults_per_sec": variable_base(),
                "hardware": "host CPU, single core",
            }
        )
    )


if __name__ == "__main__":
    main()
