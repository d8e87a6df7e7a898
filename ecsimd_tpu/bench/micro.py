"""Micro-benchmarks reproducing the reference's metric set (benchs/ops.cpp,
benchs/ops_cbn.cpp, benchs/curve_group.cpp) on TPU batches.

Reference metrics (BASELINE.md): add_256, mul_128, mul_256, mul_limb_256,
sqr_128, sqr_256, mgry_sqr_256, mgry_reduce_512, scalar_mult_p256. Each is
timed over a large batch with chained inputs + host-copy sync (honest timing
through remote-execution tunnels) and reported as ops/sec (batch elements per
second), the TPU-native analogue of the reference's per-iteration times on a
4-lane batch.

Usage: python -m ecsimd_tpu.bench.micro [--batch N] [--iters N] [--json]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _bench_one(name, fn, args, iters, chain=None):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    a = args
    for _ in range(iters):
        out = fn(*a)
        if chain is not None:
            a = chain(out, a)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    return dt


def run(batch: int = 65536, iters: int = 20, as_json: bool = False):
    import jax
    import jax.numpy as jnp

    from ecsimd_tpu import convert
    from ecsimd_tpu.ops import bignum as bn
    from ecsimd_tpu.ops import mont, solinas
    from ecsimd_tpu.specs import P256_FIELD, SECP256K1_FIELD

    rng = np.random.default_rng(3)

    def planes(nbits):
        d = nbits // 16
        return jnp.asarray(
            rng.integers(0, 1 << 16, size=(d, batch), dtype=np.int64).astype(np.int32)
        )

    a128, b128 = planes(128), planes(128)
    a256, b256 = planes(256), planes(256)
    t512 = planes(512)
    fsm = SECP256K1_FIELD  # the reference's Montgomery test prime
    fss = P256_FIELD

    results = {}

    def rec(name, dt):
        results[name] = batch / dt

    chain2 = lambda out, a: (out[0] if isinstance(out, tuple) else out[:a[0].shape[0]], a[1])

    rec("add_256", _bench_one("add_256", jax.jit(bn.add), (a256, b256), iters, chain2))
    rec("mul_128", _bench_one("mul_128", jax.jit(bn.mul), (a128, b128), iters,
                              lambda o, a: (o[:8], a[1])))
    rec("mul_256", _bench_one("mul_256", jax.jit(bn.mul), (a256, b256), iters,
                              lambda o, a: (o[:16], a[1])))
    rec("mul_limb_256", _bench_one("mul_limb_256", jax.jit(lambda x: bn.limb_mul(x, 198769)),
                                   (a256,), iters, lambda o, a: (o[:16],)))
    rec("sqr_128", _bench_one("sqr_128", jax.jit(bn.square), (a128,), iters,
                              lambda o, a: (o[:8],)))
    rec("sqr_256", _bench_one("sqr_256", jax.jit(bn.square), (a256,), iters,
                              lambda o, a: (o[:16],)))
    rec("mgry_mul_256", _bench_one("mgry_mul_256",
                                   jax.jit(lambda x, y: mont.mont_mul(x, y, fsm)),
                                   (a256, b256), iters, chain2))
    rec("mgry_sqr_256", _bench_one("mgry_sqr_256",
                                   jax.jit(lambda x: mont.mont_sqr(x, fsm)), (a256,), iters,
                                   lambda o, a: (o,)))
    rec("mgry_reduce_512", _bench_one("mgry_reduce_512",
                                      jax.jit(lambda t: mont.mont_reduce(t, fsm)), (t512,),
                                      iters, None))
    rec("solinas_mul_p256", _bench_one("solinas_mul_p256",
                                       jax.jit(lambda x, y: solinas.fast_mul(x, y, fss)),
                                       (a256, b256), iters, chain2))

    if as_json:
        print(json.dumps({k: round(v, 1) for k, v in results.items()}))
    else:
        print(f"batch={batch} iters={iters} device={jax.devices()[0]}")
        for k, v in results.items():
            print(f"  {k:18s}: {v/1e6:10.1f} M ops/s")
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    run(args.batch, args.iters, args.json)
