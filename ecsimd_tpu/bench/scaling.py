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
    import os

    import jax
    import jax.numpy as jnp

    from ecsimd_tpu import api, convert, parallel
    from ecsimd_tpu.curves.point import JacobianPoint
    from ecsimd_tpu.specs import P256

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

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
        # digest-sync timing (bench.py methodology): chain on the
        # device-resident x planes, copy only a 128-lane digest of all three
        # outputs — full-output returns measure the dev tunnel's per-call
        # output shipping, not the chips
        if algo == "comb":
            def step(s):
                return parallel.scalar_mult_base_sharded(s, P256, mesh, tile=tile)
        else:
            g = api.generator_batch(P256, b)
            jg = JacobianPoint.from_affine(g)

            def step(s):
                return parallel.scalar_mult_sharded(s, jg, mesh, use_kernel=True, tile=tile)

        @jax.jit
        def step_timed(s):
            r = step(s)
            ax, ay, z = r.x.planes, r.y.planes, r.z.planes
            return ax[:, :128] ^ ay[:, :128] ^ z[:, :128], ax

        dg, ax = step_timed(scalars)
        np.asarray(dg)  # sync (also compiles + caches the closure)
        t0 = time.perf_counter()
        s = scalars
        for _ in range(iters):
            dg, ax = step_timed(s)
            s = ax
        np.asarray(dg)
        dt = time.perf_counter() - t0
        rate = b * iters / dt
        results.append({"devices": n, "algo": algo, "mults_per_sec": round(rate, 1),
                        "per_chip": round(rate / n, 1)})
        n *= 2

    base = results[0]["per_chip"]
    for r in results:
        r["efficiency"] = round(r["per_chip"] / base, 4)

    # per-call dispatch overhead (the efficiency denominator when real pods
    # are out of reach): sharded-vs-unsharded per-call wall time on the SAME
    # single chip and batch — the delta is the shard_map/jit wrapper +
    # result-collection cost each extra shard_map call pays. The workload has
    # zero collectives, so projected N-chip efficiency is
    # t_kernel / (t_kernel + overhead) with t_kernel per-chip-constant.
    if algo == "comb":
        from ecsimd_tpu.kernels import comb as _comb

        b = batch_per_chip
        d = P256.field.ndigits
        rng = np.random.default_rng(0xEC51)
        ks = [int.from_bytes(rng.bytes(32), "little") % P256.order or 1 for _ in range(b)]
        sc = jnp.asarray(convert.ints_to_planes(ks, d))
        tables_f32, negbase = _comb._device_tables(P256, P256.gx, P256.gy)

        @jax.jit
        def fn(s):
            ax, ay, z = _comb.comb_mont_planes(
                s, tables_f32, P256, tuple(negbase), tile=tile)
            return ax[:, :128] ^ ay[:, :128] ^ z[:, :128], ax

        dg, ax = fn(sc)
        np.asarray(dg)
        t0 = time.perf_counter()
        s = sc
        for _ in range(iters):
            dg, ax = fn(s)
            s = ax
        np.asarray(dg)
        t_unsharded = (time.perf_counter() - t0) / iters
        t_sharded = b / results[0]["mults_per_sec"] * 1.0  # per call, 1 chip
        overhead = t_sharded - t_unsharded
        eff = t_unsharded / t_sharded if t_sharded > 0 else float("nan")
        results.append({
            "dispatch_overhead_us_per_call": round(overhead * 1e6, 1),
            "unsharded_us_per_call": round(t_unsharded * 1e6, 1),
            "sharded_us_per_call": round(t_sharded * 1e6, 1),
            "projected_efficiency_vs_unsharded": round(eff, 4),
        })

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
