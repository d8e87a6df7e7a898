"""Multi-chip scaling benchmark: per-chip throughput at 1..N devices.

The BASELINE.md north star asks for >= 90% 1 -> N-host scaling efficiency.
The workload is lane-local (zero collectives in the hot loop), so efficiency
is limited only by dispatch overhead and result collection. This script
measures it on whatever devices are visible (one tunneled chip in the dev
environment; a pod slice in production after
``parallel.initialize_distributed()``).

Usage: python -m ecsimd_tpu.bench.scaling [--batch-per-chip N] [--iters N]
       [--algo comb|ladder] [--tile N]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def run(batch_per_chip: int = 16384, iters: int = 8, tile: int = 2048,
        algo: str = "comb"):
    import jax
    import jax.numpy as jnp

    from ecsimd_tpu import api, convert, parallel
    from ecsimd_tpu.curves.point import JacobianPoint
    from ecsimd_tpu.specs import P256

    devices = jax.devices()
    results = []
    n = 1
    while n <= len(devices):
        mesh = parallel.make_mesh(devices[:n])
        b = batch_per_chip * n
        d = P256.field.ndigits
        rng = np.random.default_rng(0xEC51)
        ks = [int.from_bytes(rng.bytes(32), "little") % P256.order or 1 for _ in range(b)]
        scalars = parallel.shard_planes(jnp.asarray(convert.ints_to_planes(ks, d)), mesh)
        if algo == "comb":
            def step(s):
                return parallel.scalar_mult_base_sharded(s, P256, mesh, tile=tile)
        else:
            g = api.generator_batch(P256, b)
            jg = JacobianPoint.from_affine(g)

            def step(s):
                return parallel.scalar_mult_sharded(s, jg, mesh, use_kernel=True, tile=tile)

        res = step(scalars)
        np.asarray(res.x.planes)  # sync (also compiles + caches the closure)
        t0 = time.perf_counter()
        s = scalars
        for _ in range(iters):
            res = step(s)
            s = res.x.planes
        np.asarray(res.x.planes)
        dt = time.perf_counter() - t0
        rate = b * iters / dt
        results.append({"devices": n, "algo": algo, "mults_per_sec": round(rate, 1),
                        "per_chip": round(rate / n, 1)})
        n *= 2

    base = results[0]["per_chip"]
    for r in results:
        r["efficiency"] = round(r["per_chip"] / base, 4)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-per-chip", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--algo", choices=["comb", "ladder"], default="comb")
    args = ap.parse_args()
    run(args.batch_per_chip, args.iters, args.tile, args.algo)
