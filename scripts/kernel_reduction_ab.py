"""Mosaic-kernel A/B: ladder kernel on a Crandall field vs a CIOS twin.

The decisive perf check for the r4 reduction flip: the XLA-compiled list
dialect is a bad proxy (scripts/crandall_ab.py control: even Solinas P-256
reads ~0.9x there while its Mosaic kernels measure 85-101% of formulation
ceilings), so this times the REAL Pallas ladder kernel on TPU for the same
curve under both reduction strategies. Digest-sync timing per bench.py.

Usage: python scripts/kernel_reduction_ab.py [curve] [batch] [reps]
       curve in {wei25519, p521}
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import dataclasses

import numpy as np


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "wei25519"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import jax
    import jax.numpy as jnp

    from ecsimd_tpu import convert
    from ecsimd_tpu.curves.point import AffinePoint, JacobianPoint
    from ecsimd_tpu.kernels import ladder
    from ecsimd_tpu.oracle import coz
    from ecsimd_tpu.specs import CurveSpec, FieldSpec, P521, WEI25519

    curve = {"wei25519": WEI25519, "p521": P521}[which]
    twin_field = FieldSpec(curve.field.name + "_cios", curve.field.p,
                           curve.field.nbits, "montgomery")
    twin = dataclasses.replace(curve, name=curve.name + "-cios", field=twin_field)

    d = curve.field.ndigits
    rng = np.random.default_rng(5)
    ks = [int.from_bytes(rng.bytes(d * 2), "little") % curve.order or 1 for _ in range(batch)]
    scalars = jnp.asarray(convert.ints_to_planes(ks, d))
    tile = min(2048, batch)

    for cv in (curve, twin):
        xs = jnp.asarray(convert.broadcast_int(cv.gx, d, batch))
        ys = jnp.asarray(convert.broadcast_int(cv.gy, d, batch))
        jg = JacobianPoint.from_affine(AffinePoint(xs, ys, cv))
        xm, ym = jg.x.planes, jg.y.planes

        def fn(s, xm=xm, ym=ym, cv=cv):
            ax, ay, z = ladder.ladder_mont_planes(s, xm, ym, cv, tile=tile)
            dig = (ax[0] ^ ay[0] ^ z[0])[:128]
            return dig, ax  # digest + chain carrier (scalars stay fixed)

        f = jax.jit(fn)
        t0 = time.perf_counter()
        dig, _ = f(scalars)
        np.asarray(dig)
        print(f"{cv.name}: compile+first {time.perf_counter()-t0:.1f}s")
        # verify lane 0/1 against the oracle (classical domain conversion)
        ax, ay, z = ladder.ladder_mont_planes(scalars[:, :128], xm[:, :128], ym[:, :128], cv, tile=128)
        p = cv.field.p
        rinv = 1 if cv.field.plain else pow(1 << cv.field.nbits, -1, p)
        for lane in range(2):
            X = convert.planes_to_ints(np.asarray(ax))[lane] * rinv % p
            Y = convert.planes_to_ints(np.asarray(ay))[lane] * rinv % p
            Z = convert.planes_to_ints(np.asarray(z))[lane] * rinv % p
            zi = pow(Z, p - 2, p)
            want = coz.scalar_mult_affine(ks[lane], cv.gx, cv.gy, cv)
            assert (X * zi * zi % p, Y * zi * zi * zi % p) == want, f"{cv.name} lane {lane}"
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            dig, _ = f(scalars)
            np.asarray(dig)
            best = min(best, time.perf_counter() - t0)
        print(f"  {cv.name:18s}: {batch/best/1e3:8.1f} k mults/s  ({best*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
