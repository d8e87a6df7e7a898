"""Micro-benchmarks reproducing the reference's metric set (benchs/ops.cpp,
benchs/ops_cbn.cpp, benchs/curve_group.cpp) on TPU batches.

Reference metrics (BASELINE.md): add_256, mul_128, mul_256, mul_limb_256,
sqr_128, sqr_256, mgry_sqr_256, mgry_reduce_512, scalar_mult_p256. Each is
timed over a large batch with chained inputs + host-copy sync (honest timing
through remote-execution tunnels) and reported as ops/sec (batch elements per
second), the TPU-native analogue of the reference's per-iteration times on a
4-lane batch.

Dispatch amortization (r5, VERDICT r4 weak #5): a single op per device call
measures the tunnel's ~2.1 ms dispatch round trip, not chip arithmetic. Each
timed call therefore applies the op ``--inner`` times (default 16) chained
on its own output inside ONE jit — the data dependency forces every
application to execute, and the per-op rate approaches the device rate
(cross-checked against scripts/profile_kernels.py's xplane device times).
``--inner 1`` reproduces the old per-call rows.

Every metric's warmup result is asserted against the Python-int oracle on a
handful of lanes, so the bench cannot silently time wrong results. The
mgry_reduce_512 input honours the reduction contract t < R*p (oracle/field.py)
by clearing the top two bits of the 512-bit operand.

The --curve flag adds the reference's SIMD-vs-scalar axis (benchs/ops_cbn.cpp
:70-78) recast for TPU: the same P-256 scalar multiplication through the
portable XLA ladder vs the fused Pallas ladder kernel vs the fused window
kernel, all at the same batch size.

Usage: python -m ecsimd_tpu.bench.micro [--batch N] [--iters N] [--json]
       [--curve] [--curve-batch N]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _bench_one(fn, args, iters, chain=None):
    """Returns (seconds/iter, warmup output). The warmup output is what the
    caller's correctness assert sees — the timed loop chains iterations on
    their own outputs, so only the first call matches the original inputs."""
    import jax

    first = fn(*args)
    jax.block_until_ready(first)
    np.asarray(jax.tree_util.tree_leaves(first)[0])
    t0 = time.perf_counter()
    a, out = args, first
    for _ in range(iters):
        out = fn(*a)
        if chain is not None:
            a = chain(out, a)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    return dt, first


def run(batch: int = 65536, iters: int = 20, as_json: bool = False,
        curve: bool = False, curve_batch: int = 4096, curve_iters: int = 3,
        inner: int = 16):
    import jax
    import jax.numpy as jnp

    from ecsimd_tpu import convert
    from ecsimd_tpu.ops import bignum as bn
    from ecsimd_tpu.ops import crandall, mont, solinas
    from ecsimd_tpu.oracle import field as ofield
    from ecsimd_tpu.specs import FieldSpec, P256_FIELD, P521_FIELD, SECP256K1_FIELD, W25519_FIELD

    rng = np.random.default_rng(3)

    def planes(nbits, clear_top_bits: int = 0):
        d = nbits // 16
        a = rng.integers(0, 1 << 16, size=(d, batch), dtype=np.int64)
        if clear_top_bits:
            a[-1] &= (1 << (16 - clear_top_bits)) - 1
        return jnp.asarray(a.astype(np.int32))

    def ints(planes_arr, nlanes=4):
        return convert.planes_to_ints(np.asarray(planes_arr)[:, :nlanes])

    a128, b128 = planes(128), planes(128)
    a256, b256 = planes(256), planes(256)
    # mont_reduce contract: t < R*p (oracle/field.py:28). R*p > 2^510 for both
    # 256-bit primes here, so clearing the top 2 bits (t < 2^510) satisfies it.
    t512 = planes(512, clear_top_bits=2)
    fsm = SECP256K1_FIELD  # the reference's Montgomery test prime
    fss = P256_FIELD
    assert fsm.R * fsm.p > (1 << 510) and fss.R * fss.p > (1 << 510)

    results = {}

    def rec(name, fn, args, chk, chain=None, it=iters, bat=batch):
        # correctness first: ONE application vs the Python-int oracle
        out = fn(*args)
        got = out[0] if isinstance(out, tuple) else out
        want = chk()
        have = ints(got)
        assert have == want, f"{name}: wrong result {have[:1]} != {want[:1]}"
        # timing: `inner` chained applications per device call (dispatch
        # amortization — see module docstring); the chain rule is the same
        # one _bench_one uses across calls
        if chain is not None and inner > 1:
            def fn_inner(*a, _fn=fn, _chain=chain):
                o = _fn(*a)
                for _ in range(inner - 1):
                    a = _chain(o, a)
                    o = _fn(*a)
                return o

            import jax as _jax

            dt, _ = _bench_one(_jax.jit(fn_inner), args, it, chain)
            results[name] = bat * inner / dt
        else:
            dt, _ = _bench_one(fn, args, it, chain)
            results[name] = bat / dt

    M = (1 << 256) - 1
    a128i, b128i = ints(a128), ints(b128)
    a256i, b256i = ints(a256), ints(b256)
    t512i = ints(t512)

    chain2 = lambda out, a: (out[0] if isinstance(out, tuple) else out[: a[0].shape[0]], a[1])

    rec("add_256", jax.jit(bn.add), (a256, b256),
        lambda: [(x + y) & M for x, y in zip(a256i, b256i)], chain2)
    rec("mul_128", jax.jit(bn.mul), (a128, b128),
        lambda: [x * y for x, y in zip(a128i, b128i)], lambda o, a: (o[:8], a[1]))
    rec("mul_256", jax.jit(bn.mul), (a256, b256),
        lambda: [x * y for x, y in zip(a256i, b256i)], lambda o, a: (o[:16], a[1]))
    rec("mul_limb_256", jax.jit(lambda x: bn.limb_mul(x, 198769)), (a256,),
        lambda: [x * 198769 for x in a256i], lambda o, a: (o[:16],))
    rec("sqr_128", jax.jit(bn.square), (a128,),
        lambda: [x * x for x in a128i], lambda o, a: (o[:8],))
    rec("sqr_256", jax.jit(bn.square), (a256,),
        lambda: [x * x for x in a256i], lambda o, a: (o[:16],))
    rec("mgry_mul_256", jax.jit(lambda x, y: mont.mont_mul(x, y, fsm)), (a256, b256),
        lambda: [ofield.mont_mul(x, y, fsm) for x, y in zip(a256i, b256i)], chain2)
    rec("mgry_sqr_256", jax.jit(lambda x: mont.mont_sqr(x, fsm)), (a256,),
        lambda: [ofield.mont_sqr(x, fsm) for x in a256i], lambda o, a: (o,))
    # chain: t' = out + out*2^256 < p*(1 + 2^256) < R*p — stays in contract
    rec("mgry_reduce_512", jax.jit(lambda t: mont.mont_reduce(t, fsm)), (t512,),
        lambda: [ofield.mont_reduce(t, fsm) for t in t512i],
        lambda o, a: (jnp.concatenate([o, o]),))
    rec("solinas_mul_p256", jax.jit(lambda x, y: solinas.fast_mul(x, y, fss)), (a256, b256),
        lambda: [x * y % fss.p for x, y in zip(a256i, b256i)], chain2)

    # Crandall fold vs generic CIOS on the same 2^k - c primes — the measured
    # cost of one field multiply in each strategy (r4: P-521 / Wei25519
    # default flipped from CIOS to the fold, ops/crandall.py). Inputs < p-ish
    # (top bits cleared) keep the CIOS twin inside its t < R*p contract.
    for fsc, clr, tag in ((P521_FIELD, 7, "p521"), (W25519_FIELD, 1, "w25519")):
        ac, bc = planes(fsc.nbits, clear_top_bits=clr), planes(fsc.nbits, clear_top_bits=clr)
        aci, bci = ints(ac), ints(bc)
        fsm_twin = FieldSpec(f"{tag}_cios", fsc.p, fsc.nbits, "montgomery")
        rec(f"crandall_mul_{tag}",
            jax.jit(lambda x, y, f=fsc: crandall.fast_mul(x, y, f)), (ac, bc),
            lambda aci=aci, bci=bci, p=fsc.p: [x * y % p for x, y in zip(aci, bci)],
            chain2)
        rec(f"cios_mul_{tag}",
            jax.jit(lambda x, y, f=fsm_twin: mont.mont_mul(x, y, f)), (ac, bc),
            lambda aci=aci, bci=bci, f=fsm_twin: [ofield.mont_mul(x, y, f) for x, y in zip(aci, bci)],
            chain2)

    if curve:
        results.update(_curve_axis(curve_batch, curve_iters, ints))

    if as_json:
        print(json.dumps({k: round(v, 1) for k, v in results.items()}))
    else:
        print(f"batch={batch} iters={iters} device={jax.devices()[0]}")
        for k, v in results.items():
            print(f"  {k:24s}: {v/1e6:10.3f} M ops/s")
    return results


def _curve_axis(batch: int, iters: int, ints):
    """XLA-path vs kernel-path P-256 scalar mult at equal batch — the TPU
    recast of the reference's SIMD-vs-scalar axis (benchs/ops_cbn.cpp:70-78:
    the same op through the vector and scalar formulations)."""
    import jax
    import jax.numpy as jnp

    from ecsimd_tpu import convert
    from ecsimd_tpu.curves.point import AffinePoint, JacobianPoint
    from ecsimd_tpu.field import GFp
    from ecsimd_tpu.kernels import ladder, window
    from ecsimd_tpu.oracle import coz
    from ecsimd_tpu.specs import P256

    d = P256.field.ndigits
    rng = np.random.default_rng(7)
    ks = [int.from_bytes(rng.bytes(32), "little") % P256.order or 1 for _ in range(batch)]
    scalars = jnp.asarray(convert.ints_to_planes(ks, d))
    xs = jnp.asarray(convert.broadcast_int(P256.gx, d, batch))
    ys = jnp.asarray(convert.broadcast_int(P256.gy, d, batch))
    pt = JacobianPoint.from_affine(AffinePoint(xs, ys, P256))
    xm, ym = pt.x.planes, pt.y.planes
    want_x = [coz.scalar_mult_affine(k, P256.gx, P256.gy, P256)[0] for k in ks[:2]]

    out = {}
    tile = min(2048, batch)

    def run_one(name, fn):
        # chain each iteration's scalars on its own output (honest timing
        # through the tunnel); correctness is asserted on the warmup output
        dt, res = _bench_one(fn, (scalars,), iters, chain=lambda o, a: (o[0],))
        ax, ay, z = res
        aff = JacobianPoint(GFp.from_mont(ax, P256.field), GFp.from_mont(ay, P256.field),
                            GFp.from_mont(z, P256.field), P256).to_affine()
        got = ints(aff.x, 2)
        assert got == want_x, f"{name}: wrong scalar-mult result"
        out[name] = batch / dt

    run_one("scalar_mult_p256_xla",
            jax.jit(lambda s: _scalar_mult_planes_raw(s, xm, ym, P256)))
    run_one("scalar_mult_p256_ladder_kernel",
            jax.jit(lambda s: ladder.ladder_mont_planes(s, xm, ym, P256, tile=tile)))
    run_one("scalar_mult_p256_window_kernel",
            jax.jit(lambda s: window.window_mont_planes(s, xm, ym, P256, tile=tile)))
    return out


def _scalar_mult_planes_raw(scalars, xm, ym, curve):
    """XLA-path ladder on internal-domain planes, kernel-I/O-compatible."""
    from ecsimd_tpu.curves import group
    from ecsimd_tpu.curves.point import JacobianPoint
    from ecsimd_tpu.field import GFp

    fs = curve.field
    pt = JacobianPoint(GFp.from_mont(xm, fs), GFp.from_mont(ym, fs),
                       GFp.one(fs, xm), curve)
    r = group.scalar_mult(scalars, pt)
    return r.x.planes, r.y.planes, r.z.planes


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--curve", action="store_true",
                    help="add the XLA-vs-kernel scalar-mult comparison axis")
    ap.add_argument("--curve-batch", type=int, default=4096)
    ap.add_argument("--curve-iters", type=int, default=3)
    ap.add_argument("--inner", type=int, default=16,
                    help="chained op applications per device call (1 = old per-call rows)")
    args = ap.parse_args()
    run(args.batch, args.iters, args.json, args.curve, args.curve_batch,
        args.curve_iters, args.inner)
