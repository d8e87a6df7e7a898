"""A/B the comb kernel variants on real TPU: serial (unroll 1/2/4) vs tree.

Each variant is verified on 4 lanes against the Python-int oracle before its
timed loop (chained iterations + host-copy sync; see CLAUDE.md on honest
tunnel timing). Compiles cache in .jax_cache, so re-runs are cheap.

Usage: python scripts/comb_chain_ab.py [variant ...] where variant is
`tree`, `pipe`, `bf16`, `s8`, `serial:<unroll>`, or `chains:<n>` (n independent accumulator
chains, combined at the last grid step); default: tree serial:1.

Timing uses the digest-sync methodology (see bench.py): the tunnel ships
large outputs eagerly, so the timed twin returns a 128-lane digest plus the
chained x planes.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(variants):
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp

    from ecsimd_tpu import convert
    from ecsimd_tpu.curves.point import JacobianPoint
    from ecsimd_tpu.field import GFp
    from ecsimd_tpu.kernels import comb
    from ecsimd_tpu.oracle import coz
    from ecsimd_tpu.specs import P256

    batch = int(os.environ.get("BENCH_BATCH", "16384"))
    iters = int(os.environ.get("BENCH_ITERS", "24"))
    tile = int(os.environ.get("BENCH_TILE", "2048"))
    fs = P256.field
    d = fs.ndigits
    rng = np.random.default_rng(0xEC51)
    ks = [int.from_bytes(rng.bytes(32), "little") % P256.order or 1 for _ in range(batch)]
    scalars = jnp.asarray(convert.ints_to_planes(ks, d))
    tables, negbase = comb.base_tables(P256, P256.gx, P256.gy)
    tables_f32 = jnp.asarray(tables.astype(np.float32))

    for v in variants:
        chain, unroll, chains, tbl = "serial", 1, 1, tables_f32
        if v in ("tree", "pipe"):
            chain = v
        elif v == "bf16":
            tbl, _ = comb._device_tables8(P256, P256.gx, P256.gy, jnp.bfloat16)
        elif v == "s8":
            tbl, _ = comb._device_tables8(P256, P256.gx, P256.gy)  # int8 default
        elif v.startswith("chains:"):
            chains = int(v.split(":")[1])
        else:
            unroll = int(v.split(":")[1])
        fn = jax.jit(lambda s, tbl=tbl: comb.comb_mont_planes(
            s, tbl, P256, tuple(negbase), tile=tile, chain=chain,
            unroll=unroll, chains=chains))

        def timed(s, fn=fn):
            ax, ay, z = fn(s)
            return ax[:, :128] ^ ay[:, :128] ^ z[:, :128], ax

        tfn = jax.jit(timed)
        t0 = time.perf_counter()
        ax, ay, z = fn(scalars)
        np.asarray(ax)
        tc = time.perf_counter() - t0
        res = JacobianPoint(GFp.from_mont(ax, fs), GFp.from_mont(ay, fs),
                            GFp.from_mont(z, fs), P256).to_affine()
        gx = convert.planes_to_ints(np.asarray(res.x)[:, :4])
        for i in range(4):
            want = coz.scalar_mult_affine(ks[i], P256.gx, P256.gy, P256)[0]
            assert gx[i] == want, f"{v} lane {i} mismatch"
        dg, ax = tfn(scalars)
        np.asarray(dg)
        t0 = time.perf_counter()
        s = scalars
        for _ in range(iters):
            dg, ax = tfn(s)
            s = ax
        np.asarray(dg)
        dt = time.perf_counter() - t0
        print(f"{v}: {batch * iters / dt / 1e6:.2f}M mults/s "
              f"({dt / iters * 1e6:.0f} us/call, first-call {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["tree", "serial:1"])
