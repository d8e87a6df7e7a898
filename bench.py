"""Headline benchmark: batched constant-time P-256 scalar multiplications/sec.

Reproduces the reference's headline metric (`benchs/curve_group.cpp:54`,
scalar_mult_p256_x4: 4 scalar-mults per iteration on AVX2) at TPU batch scale.
Prints ONE JSON line. Baseline: the BASELINE.md north-star of >= 10M mults/sec
on a v5e-8, i.e. 1.25M/sec on the single chip this runs on.

Env knobs: BENCH_BATCH (default 16384), BENCH_ITERS (default 8).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    # persistent compile cache (config API: env vars lose to the axon plugin)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp

    from ecsimd_tpu import convert
    from ecsimd_tpu.api import _scalar_mult_planes
    from ecsimd_tpu.specs import P256

    from ecsimd_tpu.curves.point import AffinePoint, JacobianPoint
    from ecsimd_tpu.kernels import ladder, window

    batch = int(os.environ.get("BENCH_BATCH", "16384"))
    iters = int(os.environ.get("BENCH_ITERS", "24"))
    tile = int(os.environ.get("BENCH_TILE", "2048"))
    algo = os.environ.get("BENCH_ALGO", "window")  # window (fast) | ladder
    kernel_planes = window.window_mont_planes if algo == "window" else ladder.ladder_mont_planes
    d = P256.field.ndigits

    rng = np.random.default_rng(0xEC51)
    ks = [int.from_bytes(rng.bytes(32), "little") % P256.order or 1 for _ in range(batch)]
    scalars = jnp.asarray(convert.ints_to_planes(ks, d))
    xs = jnp.asarray(convert.broadcast_int(P256.gx, d, batch))
    ys = jnp.asarray(convert.broadcast_int(P256.gy, d, batch))

    pt = JacobianPoint.from_affine(AffinePoint(xs, ys, P256))
    xm, ym = pt.x.planes, pt.y.planes

    fn = jax.jit(lambda s: kernel_planes(s, xm, ym, P256, tile=tile))
    # warmup/compile
    ax, ay, z = fn(scalars)
    np.asarray(ax)

    # correctness spot-check on lane 0 against the Python-int oracle
    from ecsimd_tpu.field import GFp
    from ecsimd_tpu.oracle import coz

    res = JacobianPoint(
        GFp.from_mont(ax, P256.field),
        GFp.from_mont(ay, P256.field),
        GFp.from_mont(z, P256.field),
        P256,
    ).to_affine()
    want = coz.scalar_mult_affine(ks[0], P256.gx, P256.gy, P256)
    got = convert.planes_to_ints(np.asarray(res.x[:, :1]))[0]
    assert got == want[0], f"bench result mismatch: {hex(got)} != {hex(want[0])}"

    # timed loop: chain each iteration's scalars on the previous result and
    # sync with a host copy — defeats any result caching / async dispatch in
    # remote-execution paths.
    t0 = time.perf_counter()
    s = scalars
    for _ in range(iters):
        ax, ay, z = fn(s)
        s = ax
    np.asarray(ax)
    dt = time.perf_counter() - t0

    mults_per_sec = batch * iters / dt
    baseline_per_chip = 10e6 / 8  # north star: 10M/s on v5e-8
    print(
        json.dumps(
            {
                "metric": "p256_scalar_mults_per_sec",
                "value": round(mults_per_sec, 1),
                "unit": "mults/s/chip",
                "vs_baseline": round(mults_per_sec / baseline_per_chip, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
