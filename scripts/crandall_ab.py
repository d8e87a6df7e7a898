"""Compute-bound A/B: Crandall fold vs generic CIOS on the same prime, TPU.

The micro-bench rows are tunnel-dispatch/transfer-bound at one op per call
(CLAUDE.md tunnel gotchas), so they cannot resolve 2x compute differences.
Here each dispatch chains ITERS dependent field multiplies and returns only
a digest row, so the wall time is on-device compute (the bench.py timing
discipline). Both dialects are timed:

  planes: ops/crandall.fast_mul vs ops/mont.mont_mul on (D, B) arrays —
          the XLA-path cost (to_affine chains, XLA twins).
  list:   kernels/digits.field_mul on per-digit rows, XLA-compiled — the
          same graph the Pallas kernels trace (Mosaic sees this shape).

Usage: python scripts/crandall_ab.py [batch] [iters]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    import jax
    import jax.numpy as jnp
    from jax import lax

    from ecsimd_tpu.ops import crandall, mont
    from ecsimd_tpu.specs import FieldSpec, P521_FIELD, W25519_FIELD

    rng = np.random.default_rng(11)

    def planes(fs, clr):
        d = fs.ndigits
        a = rng.integers(0, 1 << 16, size=(d, batch), dtype=np.int64)
        a[-1] &= (1 << (16 - clr)) - 1
        return jnp.asarray(a.astype(np.int32))

    def chain_planes(mul, fs):
        def f(a, b):
            def body(_, ab):
                a, b = ab
                return mul(a, b, fs), a

            a, b = lax.fori_loop(0, iters, body, (a, b))
            return a[0], a  # digest row + chain carrier

        return jax.jit(f)

    def chain_list(fs):
        from ecsimd_tpu.kernels import digits as dg

        d = fs.ndigits

        def f(a, b):
            def body(_, ab):
                a, b = ab
                al = [a[k] for k in range(d)]
                bl = [b[k] for k in range(d)]
                return jnp.stack(dg.field_mul(al, bl, fs)), a

            a, b = lax.fori_loop(0, iters, body, (a, b))
            return a[0], a

        return jax.jit(f)

    def time_one(name, fn, a, b, reps=3):
        out = fn(a, b)
        jax.block_until_ready(out)
        np.asarray(out[0])
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            dig, a = fn(a, b)
            np.asarray(dig)
            best = min(best, time.perf_counter() - t0)
        rate = batch * iters / best
        print(f"  {name:28s}: {rate/1e6:8.2f} M muls/s  ({best*1e3:.1f} ms/dispatch)")
        return rate

    # control: Solinas P-256 vs CIOS under the same harness — if the
    # multiply-free fold ALSO "loses" here, the XLA-compiled list dialect is
    # simply a bad proxy for the Mosaic kernels (where solinas measurably
    # wins — the r2/r3 kernel history).
    from ecsimd_tpu.specs import P256_FIELD

    for fs, clr in ((P256_FIELD, 0), (P521_FIELD, 7), (W25519_FIELD, 1)):
        fsm = FieldSpec(f"{fs.name}_cios", fs.p, fs.nbits, "montgomery")
        a, b = planes(fs, clr), planes(fs, clr)
        from ecsimd_tpu.field import _mul_planes

        print(f"{fs.name} (d={fs.ndigits}, batch={batch}, iters={iters}):")
        r_cr = time_one("fold planes", chain_planes(_mul_planes, fs), a, b)
        r_ci = time_one("cios planes", chain_planes(mont.mont_mul, fsm), a, b)
        print(f"  planes speedup: {r_cr / r_ci:.2f}x")
        r_crl = time_one("fold list", chain_list(fs), a, b)
        r_cil = time_one("cios list", chain_list(fsm), a, b)
        print(f"  list speedup:   {r_crl / r_cil:.2f}x")


if __name__ == "__main__":
    main()
