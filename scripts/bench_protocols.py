"""Protocol-layer TPU throughput: batched ECDSA sign / verify, ECDH.

The reference's competitor baselines (benchs/p256_ref.cpp:98-100) are
sign/verify-shaped workloads (OpenSSL/Botan/Crypto++ do full EC ops in
protocol context); this measures the framework's own protocol layer on the
chip with bench.py's digest-sync methodology — iterations chain on their own
device output and the sync copies a 128-lane digest, so the tunnel's
eager-full-output shipping cost is excluded (see bench.py:28-36).

Workloads (P-256 unless PROTO_CURVE says otherwise):
  sign         ecdsa._sign_impl: comb k*G + batch-inverse epilogue
               (r, s, ok); iterations chain z <- r.
  verify       ecdsa._verify_impl strict (two strict-window mults +
               complete add) — the adversarial-input default.
  verify_fast  allow_fast_paths=True (comb u1*G + plain window u2*Q) —
               trusted-input batch validation.
  ecdh         ecdh.shared_secret_planes (strict window) chained d <- sx.

Each workload is verified against the Python-int oracle on PROTO_VERIFY
lanes (default 256) before timing. Prints ONE JSON line; companion
single-core host numbers come from `openssl speed ecdsap256 ecdhp256`
(--openssl flag) for the BASELINE.md table.

Env knobs: PROTO_BATCH (131072), PROTO_ITERS (8), PROTO_TILE (2048),
PROTO_OPS (comma list; default all four), PROTO_VERIFY (lanes; 0 skips).
"""

import json
import os
import re
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def openssl_speed() -> dict:
    """Single-core OpenSSL sign/verify/ECDH ops/s (the host competitor)."""
    out = {}
    try:
        txt = subprocess.run(
            ["openssl", "speed", "ecdsap256", "ecdhp256"],
            capture_output=True, text=True, timeout=300,
        ).stdout
    except (FileNotFoundError, subprocess.TimeoutExpired):
        return out
    m = re.search(r"ecdsa \(nistp256\)\s+[\d.]+s\s+[\d.]+s\s+([\d.]+)\s+([\d.]+)", txt)
    if m:
        out["openssl_sign_per_s"] = float(m.group(1))
        out["openssl_verify_per_s"] = float(m.group(2))
    m = re.search(r"ecdh \(nistp256\)\s+[\d.]+s\s+([\d.]+)", txt)
    if m:
        out["openssl_ecdh_per_s"] = float(m.group(1))
    return out


def main():
    if "--openssl" in sys.argv:
        print(json.dumps(openssl_speed()))
        return

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp

    from ecsimd_tpu import convert, ecdh, ecdsa
    from ecsimd_tpu.oracle import coz
    from ecsimd_tpu.oracle import ecdsa as oecdsa
    from ecsimd_tpu.specs import CURVES

    curve = CURVES[os.environ.get("PROTO_CURVE", "nist-p256")]
    n = curve.order
    d = curve.field.ndigits
    batch = int(os.environ.get("PROTO_BATCH", "131072"))
    iters = int(os.environ.get("PROTO_ITERS", "8"))
    tile = int(os.environ.get("PROTO_TILE", "2048"))
    nver = min(int(os.environ.get("PROTO_VERIFY", "256")), batch)
    ops = os.environ.get("PROTO_OPS", "sign,verify,verify_fast,ecdh").split(",")

    rng = np.random.default_rng(0xD1CE)
    zs = [int.from_bytes(rng.bytes(32), "little") for _ in range(batch)]
    ds = [int.from_bytes(rng.bytes(32), "little") % (n - 1) + 1 for _ in range(batch)]
    ks = [int.from_bytes(rng.bytes(32), "little") % (n - 1) + 1 for _ in range(batch)]

    # oracle expectations for the verified lanes (host ints, fork-free: the
    # lane count is small enough that pool spin-up isn't worth the fork-
    # after-backend hazard bench.py documents — this runs BEFORE jax init)
    want_sig = [oecdsa.sign(zs[i], ds[i], ks[i], curve) for i in range(nver)]
    want_pub = [oecdsa.keypair(ds[i], curve) for i in range(nver)]

    z_pl = jnp.asarray(convert.ints_to_planes(zs, d))
    d_pl = jnp.asarray(convert.ints_to_planes(ds, d))
    k_pl = jnp.asarray(convert.ints_to_planes(ks, d))

    rates, extras = {}, {}

    def timed(step, args):
        dg, *state = step(*args)  # warmup (compiles; shares kernel cache)
        np.asarray(dg)
        t0 = time.perf_counter()
        for _ in range(iters):
            dg, *state = step(*state)
        np.asarray(dg)
        return batch * iters / (time.perf_counter() - t0)

    # --- sign -----------------------------------------------------------
    r_pl = s_pl = None
    if {"sign", "verify", "verify_fast"} & set(ops):
        t0 = time.perf_counter()
        r_pl, s_pl, ok = ecdsa.sign_planes(z_pl, d_pl, k_pl, curve, tile=tile)
        ok_h = np.asarray(ok)
        print(f"sign compile+first call {time.perf_counter() - t0:.1f}s "
              f"ok={int(ok_h.sum())}/{batch}", file=sys.stderr)
        rh = convert.planes_to_ints(np.asarray(r_pl)[:, :nver])
        sh = convert.planes_to_ints(np.asarray(s_pl)[:, :nver])
        for i in range(nver):
            assert want_sig[i] is not None and ok_h[i], f"lane {i} needs retry"
            assert (rh[i], sh[i]) == want_sig[i], f"sign lane {i} mismatch"
        print(f"sign: {nver} lanes oracle-exact", file=sys.stderr)

    if "sign" in ops:
        import functools

        import jax as _jax

        @functools.partial(_jax.jit, static_argnames=())
        def sign_step(z, dd, kk):
            r, s, ok = ecdsa._sign_impl(z, dd, kk, curve, tile=tile)
            dg = r[:, :128] ^ s[:, :128] ^ (ok[:128] & 1)[None]
            return dg, r, dd, kk  # chain z <- r (true data dependency)

        rates["sign"] = timed(sign_step, (z_pl, d_pl, k_pl))

    # --- verify ---------------------------------------------------------
    if {"verify", "verify_fast"} & set(ops):
        import functools

        import jax as _jax

        qx_pl = jnp.asarray(convert.ints_to_planes(
            [want_pub[i % nver][0] for i in range(batch)], d))
        qy_pl = jnp.asarray(convert.ints_to_planes(
            [want_pub[i % nver][1] for i in range(batch)], d))
        # lanes repeat the nver verified keys/sigs cyclically so every lane
        # is a REAL (pubkey, signature) pair doing representative work
        zc = jnp.asarray(convert.ints_to_planes(
            [zs[i % nver] for i in range(batch)], d))
        rc = jnp.asarray(convert.ints_to_planes(
            [want_sig[i % nver][0] for i in range(batch)], d))
        sc = jnp.asarray(convert.ints_to_planes(
            [want_sig[i % nver][1] for i in range(batch)], d))

        def make_verify(fast: bool):
            @_jax.jit
            def step(z, r, s, qx, qy):
                ok = ecdsa._verify_impl(z, r, s, qx, qy, curve, tile=tile,
                                        allow_fast_paths=fast)
                znext = jnp.concatenate([z[0:1] ^ (ok & 1)[None], z[1:]], 0)
                return ok[:128][None], znext, r, s, qx, qy
            return step

        for name, fast in (("verify", False), ("verify_fast", True)):
            if name not in ops:
                continue
            step = make_verify(fast)
            t0 = time.perf_counter()
            dg, *state = step(zc, rc, sc, qx_pl, qy_pl)
            first_ok = np.asarray(dg)[0]
            print(f"{name} compile+first {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr)
            assert first_ok.all(), f"{name}: valid signatures rejected"
            # tampered copies must be rejected (first nver lanes checked)
            bad = step(zc, sc, rc, qx_pl, qy_pl)[0]  # r/s swapped
            assert not np.asarray(bad)[0].any(), f"{name}: tampered accepted"
            t0 = time.perf_counter()
            for _ in range(iters):
                dg, *state = step(*state)
            np.asarray(dg)
            rates[name] = batch * iters / (time.perf_counter() - t0)

    # --- recover ---------------------------------------------------------
    if "recover" in ops:
        import jax as _jax

        # true recovery ids for the verified lanes (oracle); arbitrary ids
        # beyond (identical work, results unchecked)
        v_true = [oecdsa.sign_recoverable(zs[i], ds[i], ks[i], curve)[2]
                  for i in range(nver)]
        vs = np.zeros(batch, np.int32)
        vs[:nver] = v_true
        v_pl = jnp.asarray(vs)
        zc = jnp.asarray(convert.ints_to_planes(zs, d))

        qx, qy, okr = ecdsa.recover_planes(zc, r_pl, s_pl, v_pl, curve, tile=tile)
        okh = np.asarray(okr)
        gx = convert.planes_to_ints(np.asarray(qx)[:, :nver])
        gy = convert.planes_to_ints(np.asarray(qy)[:, :nver])
        for i in range(nver):
            assert okh[i] and (gx[i], gy[i]) == want_pub[i], f"recover lane {i}"
        print(f"recover: {nver} lanes oracle-exact", file=sys.stderr)

        @_jax.jit
        def rec_step(z, r, s, v):
            qx, qy, ok = ecdsa._recover_impl(z, r, s, v, curve, tile=tile)
            dg = qx[:, :128] ^ qy[:, :128] ^ (ok[:128] & 1)[None]
            return dg, z, qx, s, v  # chain r <- qx (valid < p planes)

        rates["recover"] = timed(rec_step, (zc, r_pl, s_pl, v_pl))

    # --- ecdh -----------------------------------------------------------
    if "ecdh" in ops:
        import functools

        import jax as _jax

        # peer keys: reuse the derived pubkeys cyclically
        qx_pl = jnp.asarray(convert.ints_to_planes(
            [want_pub[i % nver][0] for i in range(batch)], d))
        qy_pl = jnp.asarray(convert.ints_to_planes(
            [want_pub[i % nver][1] for i in range(batch)], d))

        sx, ok = ecdh.shared_secret_planes(d_pl, qx_pl, qy_pl, curve, tile=tile)
        ok_h = np.asarray(ok)
        sxh = convert.planes_to_ints(np.asarray(sx)[:, :nver])
        for i in range(nver):
            wx, _ = coz.scalar_mult_affine(ds[i], *want_pub[i], curve)
            assert ok_h[i] and sxh[i] == wx, f"ecdh lane {i} mismatch"
        print(f"ecdh: {nver} lanes oracle-exact", file=sys.stderr)

        @_jax.jit
        def ecdh_step(dd, qx, qy):
            sx, ok = ecdh.shared_secret_planes(dd, qx, qy, curve, tile=tile)
            dg = sx[:, :128] ^ (ok[:128] & 1)[None]
            return dg, sx, qx, qy  # chain d <- sx

        rates["ecdh"] = timed(ecdh_step, (d_pl, qx_pl, qy_pl))

    print(json.dumps({
        "metric": f"{curve.name}_protocol_ops_per_sec",
        "batch": batch,
        "iters": iters,
        "verified_lanes": nver,
        "rates": {k: round(v, 1) for k, v in rates.items()},
        **extras,
    }))


if __name__ == "__main__":
    main()
