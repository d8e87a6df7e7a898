"""Hardware KATs for the r3 kernel variants on the real TPU chip.

Covers what the CPU suite can only reach in interpret/eager mode:
  1. secp256k1 fixed-base comb kernel (Montgomery/CIOS in-kernel reduction,
     a = 0 general doubling in the host tables)
  2. strict-CT P-256 window kernel (complete accumulation adds), including
     the adversarial scalars k = n-2 (fast-path degenerate) and k = n-1
     (passes through infinity; outside even the ladder's domain)

Each block verifies every lane against the Python-int oracle and prints a
PASS line. Run from /root/repo with the tunnel up.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp

    from ecsimd_tpu import api, convert
    from ecsimd_tpu.kernels import comb
    from ecsimd_tpu.oracle import coz, window as ow
    from ecsimd_tpu.specs import P256, SECP256K1

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0xEC53)

    # --- 1. secp256k1 comb kernel ------------------------------------------
    curve = SECP256K1
    ks = [1, 2, 5, curve.order - 2] + [
        int.from_bytes(rng.bytes(32), "little") % curve.order or 1 for _ in range(124)
    ]
    scalars = jnp.asarray(convert.ints_to_planes(ks, curve.field.ndigits))
    t0 = time.perf_counter()
    res = comb.scalar_mult_base(scalars, curve, tile=128)
    aff = res.to_affine()
    gx = convert.planes_to_ints(np.asarray(aff.x))
    gy = convert.planes_to_ints(np.asarray(aff.y))
    want = [coz.scalar_mult_affine(k, curve.gx, curve.gy, curve) for k in ks]
    bad = sum(1 for i in range(len(ks)) if (gx[i], gy[i]) != want[i])
    print(
        f"secp256k1 comb kernel: {len(ks)} lanes, bad={bad} "
        f"({time.perf_counter()-t0:.1f}s incl. compile)",
        flush=True,
    )
    assert bad == 0

    # --- 2. strict-CT P-256 window kernel (adversarial scalars) -------------
    n = P256.order
    p = P256.field.p
    ks = [n - 2, n - 1, 1, 2] + [
        int.from_bytes(rng.bytes(32), "little") % n or 1 for _ in range(124)
    ]
    g2 = coz.jacobian_to_affine(ow._jac_dbl((P256.gx, P256.gy, 1), P256), P256)
    want = [(g2[0], (p - g2[1]) % p), (P256.gx, (p - P256.gy) % p)] + [
        coz.scalar_mult_affine(k, P256.gx, P256.gy, P256) for k in ks[2:]
    ]
    pts = api.generator_batch(P256, len(ks))
    t0 = time.perf_counter()
    res = api.scalar_mult_fast(
        jnp.asarray(convert.ints_to_planes(ks, P256.field.ndigits)), pts,
        tile=128, strict=True,
    )
    gx = convert.planes_to_ints(np.asarray(res.x))
    gy = convert.planes_to_ints(np.asarray(res.y))
    bad = sum(1 for i in range(len(ks)) if (gx[i], gy[i]) != want[i])
    print(
        f"strict P-256 window kernel (incl. k=n-1, n-2): {len(ks)} lanes, bad={bad} "
        f"({time.perf_counter()-t0:.1f}s incl. compile)",
        flush=True,
    )
    assert bad == 0
    print("ALL HARDWARE KATS PASS")


if __name__ == "__main__":
    main()
