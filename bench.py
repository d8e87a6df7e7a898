"""Headline benchmark: batched P-256 scalar multiplications/sec on one chip.

Reproduces the reference's headline metric (`benchs/curve_group.cpp:54`,
scalar_mult_p256_x4 — base-point multiplication, `benchs/curve_group.cpp:30-34`)
at TPU batch scale, across the three scalar-mult paths:

- ``comb``:   fixed-base comb, shared host-built tables, zero doublings — the
              TPU-native fast path for the reference's own headline workload
              (and its OpenSSL/Botan/Crypto++ baselines, benchs/p256_ref.cpp).
- ``window``: per-lane-base signed fixed-window (w=4) Pallas megakernel.
- ``ladder``: co-Z masked-swap ladder (curve_group.h:189-218 parity) —
              constant-time-total, reference-equal scalar domain.

Correctness every run: ALL THREE algorithms are compiled and their first
VERIFY_LANES (512) lanes — distinct random scalars AND distinct points
((i+1)*G for window/ladder; the comb's base is shared by design) — are
asserted bit-exact against the Python-int oracle. The verification lanes live
inside the timed batch, so no extra kernel variant is compiled.

Timing defaults to the headline comb only (BENCH_ALGO=all times all three;
the full sweep takes ~20 min at 24 iters since window/ladder are ~3-5x
slower per mult).

Prints ONE JSON line; headline = the fixed-base comb (the reference's headline
workload), per-algorithm numbers under "algos". Baseline: BASELINE.md's
north-star of >= 10M mults/sec on a v5e-8, i.e. 1.25M/sec/chip.

Env knobs: BENCH_BATCH (16384), BENCH_ITERS (24), BENCH_TILE (2048),
BENCH_ALGO (comb | window | ladder | all), BENCH_VERIFY (all | comb | ... |
none), BENCH_VERIFY_LANES (512), BENCH_CHAIN (serial | tree),
BENCH_UNROLL (positions per comb grid step).
"""

import json
import os
import time

import numpy as np


def _verify_points(n, curve):
    """Affine (i+1)*G for i < n via oracle jac adds + one batched inversion."""
    from ecsimd_tpu.oracle import window as ow

    p = curve.field.p
    jacs = [(curve.gx, curve.gy, 1)]
    if n > 1:
        jacs.append(ow._jac_dbl(jacs[0], curve))  # G + G degenerates _jac_add
    for _ in range(n - 2):
        # iG + G is non-degenerate for 2 <= i < order - 1
        jacs.append(ow._jac_add(jacs[-1], jacs[0], curve))
    # Montgomery's trick: one modular inversion for the whole chain
    pref = [1]
    for _, _, z in jacs:
        pref.append(pref[-1] * z % p)
    inv = pow(pref[-1], p - 2, p)
    zinvs = [0] * n
    for i in range(n - 1, -1, -1):
        zinvs[i] = inv * pref[i] % p
        inv = inv * jacs[i][2] % p
    out = []
    for (x, y, _), zi in zip(jacs, zinvs):
        zi2 = zi * zi % p
        out.append((x * zi2 % p, y * zi2 % p * zi % p))
    return out


def _oracle_mult(k):
    from ecsimd_tpu.oracle import coz
    from ecsimd_tpu.specs import P256

    return coz.scalar_mult_affine(k, P256.gx, P256.gy, P256)


def _window_degenerate(k, pt):
    from ecsimd_tpu.oracle import window as ow
    from ecsimd_tpu.specs import P256

    try:
        ow.scalar_mult(k, (pt[0], pt[1], 1), P256)
        return False
    except ZeroDivisionError:
        return True


def _require_backend(timeout_s: float = 240.0):
    """Fail fast if the TPU tunnel is dead: jax.devices() otherwise blocks
    forever dialing the relay, and the driver's bench step hangs with it."""
    import sys
    import threading

    import jax

    ok = []
    t = threading.Thread(target=lambda: ok.append(jax.devices()), daemon=True)
    t.start()
    t.join(timeout_s)
    if not ok:
        print(
            f"bench: TPU backend not reachable within {timeout_s:.0f}s "
            "(axon tunnel relay down?) — aborting instead of hanging",
            file=sys.stderr,
        )
        sys.exit(2)
    return ok[0]


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
    from ecsimd_tpu.curves.point import AffinePoint, JacobianPoint
    from ecsimd_tpu.field import GFp
    from ecsimd_tpu.kernels import comb, ladder, window
    from ecsimd_tpu.specs import P256

    ALL = ["comb", "window", "ladder"]
    batch = int(os.environ.get("BENCH_BATCH", "16384"))
    iters = int(os.environ.get("BENCH_ITERS", "24"))
    tile = int(os.environ.get("BENCH_TILE", "2048"))
    algo = os.environ.get("BENCH_ALGO", "comb")
    verify = os.environ.get("BENCH_VERIFY", "all")
    nver = min(int(os.environ.get("BENCH_VERIFY_LANES", "512")), batch)
    timed = ALL if algo == "all" else [algo]
    verified = ALL if verify == "all" else [] if verify == "none" else [verify]
    algos = list(dict.fromkeys(verified + timed))  # run order, deduped
    d = P256.field.ndigits
    fs = P256.field
    order = P256.order

    rng = np.random.default_rng(0xEC51)
    ks = [int.from_bytes(rng.bytes(32), "little") % order or 1 for _ in range(batch)]
    ks[:4] = [1, 2, 5, order - 2]  # edge scalars inside the verified lanes

    # lanes < nver carry distinct points (i+1)*G; the rest broadcast G
    pts = _verify_points(nver, P256)

    # expected values: k_i * (i+1) * G == oracle(k_i * (i+1) mod order).
    # Python-int oracle work dominates bench wall time at nver=512 — fan it
    # out over the host cores. Fork BEFORE the first device touch below: the
    # workers are pure-Python-int, and forking after the TPU backend/tunnel
    # threads exist risks children poking shared connection state at exit.
    import multiprocessing as mp

    want_varbase, want_fixbase, window_skip = [], [], set()
    if verified:
        with mp.Pool(min(4, mp.cpu_count())) as pool:
            want_varbase = pool.starmap(
                _oracle_mult, [(k * (i + 1) % order,) for i, k in enumerate(ks[:nver])]
            )
            want_fixbase = pool.starmap(_oracle_mult, [(k,) for k in ks[:nver]])
            # the window method has a documented measure-zero degenerate scalar
            # class (kernels/window.py; e.g. k = order - 2); the window oracle
            # defines that domain — lanes where it degenerates are excluded from
            # window verification only (ladder/comb still verify them).
            degen = pool.starmap(
                _window_degenerate, [(k, pts[i]) for i, k in enumerate(ks[:nver])]
            )
        window_skip = {i for i, dg in enumerate(degen) if dg}

    # backend probe AFTER the oracle pool: the fork must precede TPU/tunnel
    # thread creation, and a dead tunnel must abort rather than hang
    _require_backend()

    scalars = jnp.asarray(convert.ints_to_planes(ks, d))
    xs_np = np.asarray(convert.ints_to_planes([x for x, _ in pts], d))
    ys_np = np.asarray(convert.ints_to_planes([y for _, y in pts], d))
    xs = np.repeat(np.asarray(convert.ints_to_planes([P256.gx], d)), batch, axis=1)
    ys = np.repeat(np.asarray(convert.ints_to_planes([P256.gy], d)), batch, axis=1)
    xs[:, :nver], ys[:, :nver] = xs_np, ys_np
    pt = JacobianPoint.from_affine(AffinePoint(jnp.asarray(xs), jnp.asarray(ys), P256))
    xm, ym = pt.x.planes, pt.y.planes

    tables, negbase = comb.base_tables(P256, P256.gx, P256.gy)
    tables_f32 = jnp.asarray(tables.astype(np.float32))
    chain = os.environ.get("BENCH_CHAIN", "serial")  # serial | tree
    unroll = int(os.environ.get("BENCH_UNROLL", "1"))
    fns = {
        "comb": jax.jit(
            lambda s: comb.comb_mont_planes(
                s, tables_f32, P256, tuple(negbase), tile=tile,
                chain=chain, unroll=unroll,
            )
        ),
        "window": jax.jit(lambda s: window.window_mont_planes(s, xm, ym, P256, tile=tile)),
        "ladder": jax.jit(lambda s: ladder.ladder_mont_planes(s, xm, ym, P256, tile=tile)),
    }

    rates = {}
    for name in algos:
        fn = fns[name]
        ax, ay, z = fn(scalars)  # warmup/compile
        np.asarray(ax)

        if name in verified:
            # verify ALL nver lanes bit-exact against the Python-int oracle
            res = JacobianPoint(
                GFp.from_mont(ax, fs), GFp.from_mont(ay, fs), GFp.from_mont(z, fs), P256
            ).to_affine()
            gx = convert.planes_to_ints(np.asarray(res.x)[:, :nver])
            gy = convert.planes_to_ints(np.asarray(res.y)[:, :nver])
            want = want_fixbase if name == "comb" else want_varbase
            for i in range(nver):
                if name == "window" and i in window_skip:
                    continue  # documented degenerate scalar for this method
                assert (gx[i], gy[i]) == want[i], (
                    f"{name} lane {i}: k={hex(ks[i])} got x={hex(gx[i])} want x={hex(want[i][0])}"
                )

        if name not in timed:
            continue
        # timed loop: chain each iteration's scalars on the previous result and
        # sync with a host copy — defeats any result caching / async dispatch
        # in remote-execution paths.
        t0 = time.perf_counter()
        s = scalars
        for _ in range(iters):
            ax, ay, z = fn(s)
            s = ax
        np.asarray(ax)
        rates[name] = batch * iters / (time.perf_counter() - t0)

    headline = rates.get("comb") or max(rates.values())
    baseline_per_chip = 10e6 / 8  # north star: 10M/s on v5e-8

    # roofline (BASELINE.md row 2): analytic vreg-op counts vs the measured
    # VPU ceiling — perf claims reproducible from this one JSON line.
    from ecsimd_tpu.bench import roofline as rl

    try:
        ceiling = rl.measure_vpu_ceiling()
        roof = {
            name: rl.roofline(
                rate, "comb_tree" if name == "comb" and chain == "tree" else name,
                P256, ceiling=ceiling)["fraction_of_ceiling"]
            for name, rate in rates.items()
        }
        roof["ceiling_vreg_ops_per_sec"] = round(ceiling)
    except Exception as e:  # never let the metric line die on the diagnostic
        roof = {"error": str(e)[:120]}

    print(
        json.dumps(
            {
                "metric": "p256_scalar_mults_per_sec",
                "value": round(headline, 1),
                "unit": "mults/s/chip",
                "vs_baseline": round(headline / baseline_per_chip, 4),
                "algos": {k: round(v, 1) for k, v in rates.items()},
                "verified_algos": verified,
                "verified_lanes": nver,
                "roofline_fraction": roof,
            }
        )
    )


if __name__ == "__main__":
    main()
