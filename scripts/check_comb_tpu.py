"""TPU validation + timing for the fixed-base comb kernel.

Validates ALL lanes against the Python-int oracle, then times chained
iterations (honest through the axon tunnel). Run from /root/repo.
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

    from ecsimd_tpu import convert
    from ecsimd_tpu.field import GFp
    from ecsimd_tpu.curves.point import JacobianPoint
    from ecsimd_tpu.kernels import comb
    from ecsimd_tpu.oracle import coz
    from ecsimd_tpu.specs import P256

    batch = int(os.environ.get("BENCH_BATCH", "16384"))
    iters = int(os.environ.get("BENCH_ITERS", "24"))
    tile = int(os.environ.get("BENCH_TILE", "2048"))
    nver = int(os.environ.get("BENCH_VERIFY_LANES", "512"))
    d = P256.field.ndigits
    fs = P256.field

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0xEC52)
    ks = [int.from_bytes(rng.bytes(32), "little") % P256.order or 1 for _ in range(batch)]
    ks[:4] = [1, 2, 5, P256.order - 2]
    scalars = jnp.asarray(convert.ints_to_planes(ks, d))

    tables, negbase = comb.base_tables(P256, P256.gx, P256.gy)
    tables_f32 = jnp.asarray(tables.astype(np.float32))
    fn = jax.jit(
        lambda s: comb.comb_mont_planes(s, tables_f32, P256, tuple(negbase), tile=tile)
    )

    t0 = time.perf_counter()
    ax, ay, z = fn(scalars)
    np.asarray(ax)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

    res = JacobianPoint(
        GFp.from_mont(ax, fs), GFp.from_mont(ay, fs), GFp.from_mont(z, fs), P256
    ).to_affine()
    gx = convert.planes_to_ints(np.asarray(res.x)[:, :nver])
    gy = convert.planes_to_ints(np.asarray(res.y)[:, :nver])
    bad = 0
    for i in range(nver):
        ex, ey = coz.scalar_mult_affine(ks[i], P256.gx, P256.gy, P256)
        if (gx[i], gy[i]) != (ex, ey):
            bad += 1
            if bad <= 3:
                print(f"lane {i}: k={hex(ks[i])[:18]} got {hex(gx[i])[:18]} want {hex(ex)[:18]}")
    print(f"verified {nver} lanes, bad={bad}", flush=True)
    if bad:
        sys.exit(1)

    t0 = time.perf_counter()
    s = scalars
    for _ in range(iters):
        ax, ay, z = fn(s)
        s = ax
    np.asarray(ax)
    dt = time.perf_counter() - t0
    print(f"comb: {batch * iters / dt:,.1f} mults/s/chip  (batch={batch} iters={iters} tile={tile})")


if __name__ == "__main__":
    main()
