"""Same-run TPU A/B: X25519 through the Montgomery x-only ladder kernel
(kernels/mladder.py, ~9 field ops/bit) vs the co-Z Weierstrass ladder
kernel on Wei25519 (~16 ops/bit) — the two variable-point paths for
Curve25519-class work. Verifies 128 lanes against the host int ladder
(and the `cryptography` X25519 for the RFC I/O path) before timing with
bench.py's digest-sync methodology.

Env: XB_BATCH (16384), XB_ITERS (10), XB_TILE (2048).
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

    import jax.numpy as jnp

    from ecsimd_tpu import convert, x25519
    from ecsimd_tpu.kernels import ladder, mladder
    from ecsimd_tpu.specs import W25519_FIELD, WEI25519

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_mladder import _aff, host_xladder

    fs = W25519_FIELD
    d = fs.ndigits
    p = fs.p
    batch = int(os.environ.get("XB_BATCH", "16384"))
    iters = int(os.environ.get("XB_ITERS", "10"))
    tile = int(os.environ.get("XB_TILE", "2048"))
    nver = min(128, batch)
    print(f"devices: {jax.devices()}", flush=True)

    rng = np.random.default_rng(0x2551)
    ks = [x25519.clamp(rng.bytes(32)) for _ in range(batch)]
    us = [x25519.decode_u(rng.bytes(32)) % p for _ in range(batch)]
    kp = jnp.asarray(convert.ints_to_planes(ks, d))
    up = jnp.asarray(convert.ints_to_planes(us, d))

    # --- verify the kernel on chip vs the host int ladder ---------------
    t0 = time.perf_counter()
    out = x25519.x25519_planes(kp, up, use_kernel=True, tile=tile)
    got = convert.planes_to_ints(np.asarray(out)[:, :nver])
    bad = 0
    for k, u, g in zip(ks[:nver], us[:nver], got):
        wx, wz = host_xladder(k, u, p, x25519.A24, 255)
        bad += g != _aff(wx, wz, p)
    print(f"x25519 kernel: {nver} lanes, bad={bad} "
          f"({time.perf_counter()-t0:.0f}s incl. compile)", flush=True)
    assert bad == 0
    # RFC I/O path once through cryptography
    from cryptography.hazmat.primitives.asymmetric.x25519 import (
        X25519PrivateKey, X25519PublicKey)

    kb, ub = rng.bytes(32), (9).to_bytes(32, "little")
    assert x25519.x25519(kb, ub) == X25519PrivateKey.from_private_bytes(
        kb).exchange(X25519PublicKey.from_public_bytes(ub))
    print("RFC byte path: cryptography-exact", flush=True)

    # --- timed A/B -------------------------------------------------------
    def twin_m(k, u):
        x2, z2 = mladder.mladder_planes(k, u, fs, x25519.A24, 255, tile=tile)
        return x2[:, :128] ^ z2[:, :128], x2

    def twin_w(k, xm, ym):
        ax, ay, z = ladder.ladder_mont_planes(k, xm, ym, WEI25519, tile=tile)
        return ax[:, :128] ^ ay[:, :128] ^ z[:, :128], ax

    rates = {}
    tm = jax.jit(twin_m)
    dg, x2 = tm(kp, up)
    np.asarray(dg)
    t0 = time.perf_counter()
    u = up
    for _ in range(iters):
        dg, u = tm(kp, u)
    np.asarray(dg)
    rates["mladder"] = batch * iters / (time.perf_counter() - t0)
    print(f"mladder kernel: {rates['mladder']:.0f} x25519/s", flush=True)

    # co-Z comparison point: Wei25519 ladder on generator-mapped points
    from ecsimd_tpu import api
    from ecsimd_tpu.curves.point import JacobianPoint

    g = api.generator_batch(WEI25519, batch)
    jg = JacobianPoint.from_affine(g)
    tw = jax.jit(twin_w)
    dg, ax = tw(kp, jg.x.planes, jg.y.planes)
    np.asarray(dg)
    t0 = time.perf_counter()
    k = kp
    for _ in range(iters):
        dg, k = tw(k, jg.x.planes, jg.y.planes)  # chain scalars (bench.py style)
    np.asarray(dg)
    rates["coz_ladder"] = batch * iters / (time.perf_counter() - t0)
    print(f"co-Z wei25519 ladder: {rates['coz_ladder']:.0f} mults/s", flush=True)
    print(f"\nx-only speedup: {rates['mladder']/rates['coz_ladder']:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
