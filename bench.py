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

Timing methodology (measured r3, scripts/profile_kernels.py): iterations
chain on their own device-resident output and the final sync copies a
128-lane digest that depends on all three outputs of the last call. The
digest (not the full (3, D, B) result) crosses the tunnel because the axon
dev relay ships large execute outputs to the host eagerly per call — a
dev-environment transport cost, not a property of the chip or of production
PJRT; with it removed the end-to-end rates match the profiler's on-device
kernel times (window/ladder AT their analytic formulation ceilings, comb at
~78% of the VPU ceiling). Verification still round-trips full outputs.

Env knobs: BENCH_BATCH (524288; measured knee of the dispatch-
amortization curve — 131072/262144/524288/1048576 gave 6.94/7.13/7.24/
7.28M, the device-side ceiling being 7.49M), BENCH_ITERS (24), BENCH_TILE (2048),
BENCH_ALGO (comb | window | ladder | all), BENCH_VERIFY (all | comb | ... |
none), BENCH_VERIFY_LANES (512), BENCH_CHAIN (serial | tree),
BENCH_UNROLL (positions per comb grid step), BENCH_BUDGET_S (wall-clock
budget in seconds; when set, the backend probe waits up to half of it and
verify-only algorithms / the roofline measurement are dropped when the
remaining budget cannot fit their estimated cold compiles — the headline
algorithm always runs).
"""

import json
import os
import sys
import time

import numpy as np

_T0 = time.monotonic()
_BUDGET = float(os.environ.get("BENCH_BUDGET_S", "0")) or None


def _remaining():
    """Seconds left in the BENCH_BUDGET_S window (None = unbounded)."""
    return None if _BUDGET is None else _BUDGET - (time.monotonic() - _T0)


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
    forever dialing the relay, and the driver's bench step hangs with it.

    Under BENCH_BUDGET_S the probe waits up to half the remaining budget
    (a flaky relay that comes back in minutes should not abort the round —
    exactly what ate the r02 capture) instead of the flat 240s window."""
    import threading

    import jax

    if _BUDGET is not None:
        timeout_s = max(60.0, (_remaining() or 0) / 2)

    ok = []
    t = threading.Thread(target=lambda: ok.append(jax.devices()), daemon=True)
    t.start()
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline and not ok:
        t.join(min(30.0, max(0.1, deadline - time.monotonic())))
        if not ok:
            print(
                f"bench: still waiting for TPU backend "
                f"({deadline - time.monotonic():.0f}s left in probe window)",
                file=sys.stderr,
            )
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
    batch = int(os.environ.get("BENCH_BATCH", "524288"))
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

    chain = os.environ.get("BENCH_CHAIN", "serial")  # serial | tree | pipe
    unroll = int(os.environ.get("BENCH_UNROLL", "1"))
    # serial chain gathers from int8 half-digit tables (native s8 MXU path,
    # measured +11% over f32); pipe/tree only support f32 digit-value tables
    if chain == "serial":
        tables_dev, negbase = comb._device_tables8(P256, P256.gx, P256.gy)
    else:
        tables_dev, negbase = comb._device_tables(P256, P256.gx, P256.gy)
    raw = {
        "comb": lambda s: comb.comb_mont_planes(
            s, tables_dev, P256, tuple(negbase), tile=tile,
            chain=chain, unroll=unroll,
        ),
        "window": lambda s: window.window_mont_planes(s, xm, ym, P256, tile=tile),
        "ladder": lambda s: ladder.ladder_mont_planes(s, xm, ym, P256, tile=tile),
    }
    fns = {name: jax.jit(f) for name, f in raw.items()}

    # Timed twins return (digest, ax): a 128-lane XOR of all three Jacobian
    # outputs (so the kernel's full result feeds the sync) plus the x planes
    # the next iteration chains on. Returning the full (3, D, B) outputs
    # instead measures the dev tunnel, not the chip: the axon relay ships
    # large execute outputs to the host eagerly (~GB/s HTTP), a per-call
    # per-byte cost production PJRT (local DMA) does not have — measured
    # r3 (scripts/profile_kernels.py): window/ladder run AT their analytic
    # formulation ceilings on-device, and full-output returns were the
    # entire end-to-end shortfall. Verification (above) still round-trips
    # full outputs through fns[name].
    def _timed_twin(f):
        def g(s):
            ax, ay, z = f(s)
            return ax[:, :128] ^ ay[:, :128] ^ z[:, :128], ax
        return jax.jit(g)

    fns_timed = {name: _timed_twin(f) for name, f in raw.items()}

    # budget degradation: verify-only algorithms are dropped (headline first,
    # comb leads the run order) when the remaining budget can't fit their
    # estimated compiles — window/ladder Mosaic compiles are 8-15 min cold
    est_compile = {"comb": 150.0, "window": 900.0, "ladder": 600.0}
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    cache_warm = os.path.isdir(cache_dir) and len(os.listdir(cache_dir)) >= 8

    rates = {}
    degraded = []
    for name in algos:
        rem = _remaining()
        if rem is not None and name not in timed:
            est = 60.0 if cache_warm else est_compile[name]
            if rem < est + 120.0:
                print(
                    f"bench: budget {rem:.0f}s left < {est:.0f}s estimated "
                    f"{'warm' if cache_warm else 'cold'} compile — skipping "
                    f"verify-only algo {name}",
                    file=sys.stderr,
                )
                degraded.append(name)
                continue
        if name in verified:
            # full-output call (the timed path returns only a digest) —
            # verify ALL nver lanes bit-exact against the Python-int oracle
            ax, ay, z = fns[name](scalars)
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
        # timed loop: chain each iteration's scalars on the previous result
        # (a true data dependency across calls) and sync with a host copy of
        # the last digest (which depends on all three outputs of the last
        # call) — defeats any result caching / async dispatch in
        # remote-execution paths without paying the tunnel's per-call
        # full-output shipping (see _timed_twin).
        tf = fns_timed[name]
        dg, ax = tf(scalars)  # warmup the timed twin (kernel cache shared)
        np.asarray(dg)
        t0 = time.perf_counter()
        s = scalars
        for _ in range(iters):
            dg, ax = tf(s)
            s = ax
        np.asarray(dg)
        rates[name] = batch * iters / (time.perf_counter() - t0)

    headline = rates.get("comb") or max(rates.values())
    baseline_per_chip = 10e6 / 8  # north star: 10M/s on v5e-8

    # roofline (BASELINE.md row 2): analytic vreg-op counts vs the measured
    # VPU ceiling — perf claims reproducible from this one JSON line.
    from ecsimd_tpu.bench import roofline as rl

    try:
        rem = _remaining()
        if rem is not None and rem < 60.0:
            raise RuntimeError(f"budget: {rem:.0f}s left, skipping ceiling measurement")
        # max of two: the calibration loop shares the tunnel with whatever
        # else the host is doing, and a slow sample only ever UNDERSTATES
        # the ceiling (overstating every fraction)
        ceiling = max(rl.measure_vpu_ceiling(), rl.measure_vpu_ceiling())
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
                "verified_algos": [v for v in verified if v not in degraded],
                **({"budget_degraded": degraded} if degraded else {}),
                "verified_lanes": nver,
                "roofline_fraction": roof,
            }
        )
    )


if __name__ == "__main__":
    main()
