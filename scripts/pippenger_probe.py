"""Measured Pippenger-vs-dense MSM probe (VERDICT r4 item 8).

The MSM docstring claims bucket methods are scatter-bound on TPU and the
dense per-lane strict window wins (api.py multi_scalar_mult); this script
replaces the assertion with a measurement of the REAL TPU-native bucket
primitive against the dense window step, on-chip, same run.

A TPU Pippenger window has no scatter: sort lanes by bucket index
(lax.sort, vectorized over all 3*D coordinate planes) then segmented-sum
equal-key runs with log2(B) masked complete-add passes (Hillis-Steele);
bucket totals land at segment boundaries. Per window that costs
  sort(1 + 3D planes) + log2(B) complete adds (batch-wide)
versus the dense method's per-window cost of
  w doublings + 1 complete add (batch-wide).
Pippenger also pays a per-window bucket-combine (two 2^w-step serial chains
at tiny batch) the probe reports analytically. Crossover math: with
nbits/w windows either way, Pippenger wins iff
  sort + log2(B)*add < w*dbl + 1*add  (per window, batch-wide)
— i.e. the log2(B) complete adds alone must undercut w doublings. Complete
adds cost ~2.5x a doubling, so for B >= 2^10 the inequality needs
w >~ 2.5*log2(B) >= 45, where the 2^w bucket combine is absurd. The probe
measures the two sides to pin the constants.

Validates the segmented-sum against host ints first (it IS a correct
bucket accumulation), then times both sides. Prints one JSON line.

Env: PIP_BATCH (16384), PIP_ITERS (6), PIP_W (8).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp

    from ecsimd_tpu import api, convert
    from ecsimd_tpu.curves import group
    from ecsimd_tpu.curves.point import AffinePoint, JacobianPoint
    from ecsimd_tpu.field import GFp
    from ecsimd_tpu.oracle import coz
    from ecsimd_tpu.specs import P256 as curve

    fs = curve.field
    d = fs.ndigits
    batch = int(os.environ.get("PIP_BATCH", "16384"))
    iters = int(os.environ.get("PIP_ITERS", "6"))
    w = int(os.environ.get("PIP_W", "8"))
    print(f"devices: {jax.devices()}", flush=True)

    rng = np.random.default_rng(0x9199)

    def jac(x, y, z):
        return JacobianPoint(GFp.from_mont(x, fs), GFp.from_mont(y, fs),
                             GFp.from_mont(z, fs), curve)

    def seg_scan(keys, x, y, z):
        """Segmented inclusive prefix-sum of Jacobian points over sorted
        keys: log2(B) masked complete-add passes."""
        b = keys.shape[0]
        s = 1
        while s < b:
            pk = jnp.concatenate([jnp.full((s,), -1, jnp.int32), keys[:-s]])
            m = (keys == pk).astype(jnp.int32)
            px = jnp.concatenate([jnp.zeros((d, s), jnp.int32), x[:, :-s]], axis=1)
            py = jnp.concatenate([jnp.zeros((d, s), jnp.int32), y[:, :-s]], axis=1)
            pz = jnp.concatenate([jnp.zeros((d, s), jnp.int32), z[:, :-s]], axis=1)
            summed = group.jac_add_complete(jac(x, y, z), jac(px, py, pz))
            from ecsimd_tpu.ops import bignum as bn

            x = bn.select(m, summed.x.planes, x)
            y = bn.select(m, summed.y.planes, y)
            z = bn.select(m, summed.z.planes, z)
            s *= 2
        return x, y, z

    def pip_window(keys, x, y, z):
        """One Pippenger window: sort by bucket key + segmented sum."""
        ops = [keys] + [x[i] for i in range(d)] + [y[i] for i in range(d)] \
            + [z[i] for i in range(d)]
        out = jax.lax.sort(ops, dimension=0, num_keys=1)
        ks = out[0]
        xs = jnp.stack(out[1 : 1 + d])
        ys = jnp.stack(out[1 + d : 1 + 2 * d])
        zs = jnp.stack(out[1 + 2 * d :])
        return seg_scan(ks, xs, ys, zs)

    def dense_window(x, y, z, tx, ty, tz):
        """One dense strict-window step: w doublings + 1 complete add."""
        p_ = jac(x, y, z)
        for _ in range(w):
            xx, yy, zz = group.jac_dbl(p_.x, p_.y, p_.z, curve)
            p_ = JacobianPoint(xx, yy, zz, curve)
        r = group.jac_add_complete(p_, jac(tx, ty, tz))
        return r.x.planes, r.y.planes, r.z.planes

    # --- correctness: segmented sum IS a bucket accumulation --------------
    nb = 16
    keys_s = np.sort(rng.integers(0, 4, nb).astype(np.int32))
    pts = [coz.scalar_mult_affine(int(k) + 2, curve.gx, curve.gy, curve)
           for k in rng.integers(1, 1000, nb)]
    xs = jnp.asarray(convert.ints_to_planes([a for a, _ in pts], d))
    ys = jnp.asarray(convert.ints_to_planes([b for _, b in pts], d))
    pj = JacobianPoint.from_affine(AffinePoint(xs, ys, curve))
    sx, sy, sz = seg_scan(jnp.asarray(keys_s), pj.x.planes, pj.y.planes,
                          pj.z.planes)
    res = jac(sx, sy, sz).to_affine()
    gx = convert.planes_to_ints(np.asarray(res.x))
    # host expectation: prefix sums within equal-key segments
    import itertools

    i = 0
    ok = True
    for key, grp in itertools.groupby(range(nb), key=lambda j: keys_s[j]):
        acc = None
        for j in grp:
            q = (pts[j][0], pts[j][1], 1)
            acc = q if acc is None else _host_add(acc, q, curve.p)
            wx = _host_affx(acc, curve.p)
            ok &= (gx[j] == wx)
    assert ok, "segmented bucket accumulation mismatch"
    print("segmented-sum bucket accumulation: host-exact", flush=True)

    # --- timing -----------------------------------------------------------
    ks = rng.integers(0, 1 << w, batch).astype(np.int32)
    pts_x = jnp.asarray(np.tile(np.asarray(convert.ints_to_planes([curve.gx], d)), (1, batch)))
    pts_y = jnp.asarray(np.tile(np.asarray(convert.ints_to_planes([curve.gy], d)), (1, batch)))
    pj = JacobianPoint.from_affine(AffinePoint(pts_x, pts_y, curve))
    x0, y0, z0 = pj.x.planes, pj.y.planes, pj.z.planes

    @jax.jit
    def pip_step(keys, x, y, z):
        sx, sy, sz = pip_window(keys, x, y, z)
        dg = sx[:, :128] ^ sy[:, :128] ^ sz[:, :128]
        return dg, (keys ^ (sx[0] & 1)).astype(jnp.int32), sx, sy, sz

    @jax.jit
    def dense_step(x, y, z, tx, ty, tz):
        sx, sy, sz = dense_window(x, y, z, tx, ty, tz)
        dg = sx[:, :128] ^ sy[:, :128] ^ sz[:, :128]
        return dg, sx, sy, sz

    times = {}
    kj = jnp.asarray(ks)
    dg, kj2, *st = pip_step(kj, x0, y0, z0)
    np.asarray(dg)
    t0 = time.perf_counter()
    state = (kj, x0, y0, z0)
    for _ in range(iters):
        dg, k2, sx, sy, sz = pip_step(*state)
        state = (k2, sx, sy, sz)
    np.asarray(dg)
    times["pippenger_window_s"] = (time.perf_counter() - t0) / iters

    dg, *st = dense_step(x0, y0, z0, x0, y0, z0)
    np.asarray(dg)
    t0 = time.perf_counter()
    state = (x0, y0, z0)
    for _ in range(iters):
        dg, sx, sy, sz = dense_step(*state, x0, y0, z0)
        state = (sx, sy, sz)
    np.asarray(dg)
    times["dense_window_s"] = (time.perf_counter() - t0) / iters

    nbits = curve.field.nbits
    dense_total = times["dense_window_s"] * (nbits // 4)  # production w=4
    pip_total = times["pippenger_window_s"] * (nbits // w)
    print(json.dumps({
        "metric": "pippenger_vs_dense_window",
        "batch": batch, "w": w,
        "pippenger_window_s": round(times["pippenger_window_s"], 4),
        "dense_window_s": round(times["dense_window_s"], 4),
        "implied_dense_msm_s": round(dense_total, 3),
        "implied_pippenger_msm_s_EXCL_bucket_combine": round(pip_total, 3),
        "pippenger_wins": bool(pip_total < dense_total),
    }))


def _host_add(p1, p2, p):
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    if z1 == 0:
        return p2
    if z2 == 0:
        return p1
    z1z1, z2z2 = z1 * z1 % p, z2 * z2 % p
    u1, u2 = x1 * z2z2 % p, x2 * z1z1 % p
    s1, s2 = y1 * z2z2 % p * z2 % p, y2 * z1z1 % p * z1 % p
    h, r = (u2 - u1) % p, (s2 - s1) % p
    if h == 0 and r == 0:
        xx, yy = x1 * x1 % p, y1 * y1 % p
        yyyy, zz = yy * yy % p, z1 * z1 % p
        s = 2 * ((x1 + yy) * (x1 + yy) - xx - yyyy) % p
        m = (3 * xx - 3 * zz * zz) % p
        x3 = (m * m - 2 * s) % p
        return (x3, (m * (s - x3) - 8 * yyyy) % p,
                ((y1 + z1) * (y1 + z1) - yy - zz) % p)
    if h == 0:
        return (1, 1, 0)
    hh = h * h % p
    hhh = h * hh % p
    v = u1 * hh % p
    x3 = (r * r - hhh - 2 * v) % p
    return (x3, (r * (v - x3) - s1 * hhh) % p, z1 * z2 % p * h % p)


def _host_affx(pt, p):
    x, _, z = pt
    zi = pow(z, p - 2, p)
    return x * zi * zi % p


if __name__ == "__main__":
    main()
