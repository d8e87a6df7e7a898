"""Device-time vs wall-time attribution for the scalar-mult kernels.

Captures an XLA profiler trace (works through the axon tunnel: the xplane
carries real /device:TPU:0 "XLA Ops" events) around a chained timed loop per
algorithm and reports, per call:

  wall    — host-observed time (what bench.py's rate is built on),
  device  — the megakernel's on-device execution time from the trace,
  gap     — wall - device: host/tunnel dispatch + result round trip.

This attributes the window/ladder gap between measured end-to-end rate and
the analytic formulation ceiling (bench/roofline.py): measured r3, the
kernels run AT their op-count ceiling on-device, and the residual is the
tunnel's per-call round trip — i.e. batch-size-amortizable dispatch, not
Mosaic codegen loss.

Usage: python scripts/profile_kernels.py [comb window ladder] [--batch N]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def device_ms(logdir: str, match: str) -> tuple[float, int]:
    """Sum 'XLA Ops' durations whose name contains ``match`` (ms, count)."""
    files = sorted(glob.glob(os.path.join(logdir, "plugins/profile/*/*.trace.json.gz")))
    data = json.load(gzip.open(files[-1]))
    tidnames = {
        (e["pid"], e["tid"]): e["args"]["name"]
        for e in data["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    total, n = 0.0, 0
    for e in data["traceEvents"]:
        if e.get("ph") != "X":
            continue
        if tidnames.get((e.get("pid"), e.get("tid"))) != "XLA Ops":
            continue
        if match in e["name"]:
            total += e["dur"]
            n += 1
    return total / 1000.0, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("algos", nargs="*", default=["comb", "window", "ladder"])
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--tile", type=int, default=2048)
    args = ap.parse_args()
    algos = args.algos or ["comb", "window", "ladder"]

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp

    from ecsimd_tpu import convert
    from ecsimd_tpu.bench import roofline as rl
    from ecsimd_tpu.curves.point import AffinePoint, JacobianPoint
    from ecsimd_tpu.kernels import comb, ladder, window
    from ecsimd_tpu.specs import P256

    batch, iters, tile = args.batch, args.iters, args.tile
    d = P256.field.ndigits
    rng = np.random.default_rng(0xEC51)
    ks = [int.from_bytes(rng.bytes(32), "little") % P256.order or 1 for _ in range(batch)]
    scalars = jnp.asarray(convert.ints_to_planes(ks, d))
    xs = np.repeat(np.asarray(convert.ints_to_planes([P256.gx], d)), batch, axis=1)
    ys = np.repeat(np.asarray(convert.ints_to_planes([P256.gy], d)), batch, axis=1)
    pt = JacobianPoint.from_affine(AffinePoint(jnp.asarray(xs), jnp.asarray(ys), P256))
    xm, ym = pt.x.planes, pt.y.planes
    tables_f32, negbase = comb._device_tables8(P256, P256.gx, P256.gy)  # int8 default

    fns = {
        "comb": (jax.jit(lambda s: comb.comb_mont_planes(
            s, tables_f32, P256, tuple(negbase), tile=tile)), "comb_mont_planes"),
        "window": (jax.jit(lambda s: window.window_mont_planes(
            s, xm, ym, P256, tile=tile)), "window_mont_planes"),
        "ladder": (jax.jit(lambda s: ladder.ladder_mont_planes(
            s, xm, ym, P256, tile=tile)), "ladder_mont_planes"),
    }

    try:
        ceiling = rl.measure_vpu_ceiling()
    except Exception:
        ceiling = None

    rows = []
    for name in algos:
        fn, opname = fns[name]
        ax, ay, z = fn(scalars)
        np.asarray(ax)
        logdir = f"/tmp/ecsimd_profile_{name}"
        jax.profiler.start_trace(logdir)
        t0 = time.perf_counter()
        s = scalars
        for _ in range(iters):
            ax, ay, z = fn(s)
            s = ax
        np.asarray(ax)
        wall = (time.perf_counter() - t0) / iters * 1000.0
        jax.profiler.stop_trace()
        dev_total, n = device_ms(logdir, opname)  # sum over n traced launches
        dev_per_call = dev_total / max(n, 1)
        row = {
            "algo": name,
            "batch": batch,
            "wall_ms_per_call": round(wall, 3),
            "device_ms_per_call": round(dev_per_call, 3),
            "gap_ms_per_call": round(wall - dev_per_call, 3),
            "device_mults_per_sec": round(batch / dev_per_call * 1000.0, 1),
            "wall_mults_per_sec": round(batch / wall * 1000.0, 1),
            "kernel_launches_traced": n,
        }
        if ceiling:
            roof = rl.roofline(batch / dev_per_call * 1000.0, name, P256, ceiling=ceiling)
            row["device_fraction_of_ceiling"] = roof["fraction_of_ceiling"]
        rows.append(row)
        print(json.dumps(row))
    print(json.dumps({"all": rows}))


if __name__ == "__main__":
    main()
