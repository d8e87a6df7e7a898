"""Same-run TPU A/B: secp256k1 variable-base window kernel vs the GLV
endomorphism-split kernel (kernels/glv.py). VERDICT r4 item 9's measured
target: GLV >= 1.3x.

Both sides verified against the Python-int oracle on VER lanes first, then
timed with bench.py's digest-sync chaining (iterations chain scalars on the
previous x output; only a 128-lane digest crosses the tunnel).

Env: AB_BATCH (16384), AB_ITERS (10), AB_TILE (2048), AB_VER (128),
AB_STRICT (1: strict GLV vs plain window — the production pairing;
0: plain GLV).
"""

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
    from ecsimd_tpu.curves.point import JacobianPoint
    from ecsimd_tpu.field import GFp
    from ecsimd_tpu.kernels import glv as kglv
    from ecsimd_tpu.kernels import window
    from ecsimd_tpu.oracle import coz
    from ecsimd_tpu.specs import SECP256K1 as curve

    batch = int(os.environ.get("AB_BATCH", "16384"))
    iters = int(os.environ.get("AB_ITERS", "10"))
    tile = int(os.environ.get("AB_TILE", "2048"))
    nver = min(int(os.environ.get("AB_VER", "128")), batch)
    strict = os.environ.get("AB_STRICT", "1") == "1"
    d = curve.field.ndigits
    n = curve.order
    fs = curve.field

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0x61B)
    ks = [int.from_bytes(rng.bytes(32), "little") % n or 1 for _ in range(batch)]
    scalars = jnp.asarray(convert.ints_to_planes(ks, d))
    g = api.generator_batch(curve, batch)
    jg = JacobianPoint.from_affine(g)
    xm, ym = jg.x.planes, jg.y.planes

    def vwin(s):
        return window.window_mont_planes(s, xm, ym, curve, tile=tile)

    def vglv(s):
        packed = kglv.pack_scalars(s, curve)
        return kglv.glv_mont_planes(packed, xm, ym, curve, tile=tile, strict=strict)

    # verification
    want = [coz.scalar_mult_affine(k, curve.gx, curve.gy, curve) for k in ks[:nver]]
    for name, f in (("window", vwin), ("glv", vglv)):
        t0 = time.perf_counter()
        ax, ay, z = jax.jit(f)(scalars)
        res = JacobianPoint(GFp.from_mont(ax, fs), GFp.from_mont(ay, fs),
                            GFp.from_mont(z, fs), curve).to_affine()
        gx = convert.planes_to_ints(np.asarray(res.x)[:, :nver])
        gy = convert.planes_to_ints(np.asarray(res.y)[:, :nver])
        bad = [i for i in range(nver) if (gx[i], gy[i]) != want[i]]
        print(f"{name}: verify bad={len(bad)} ({time.perf_counter()-t0:.0f}s "
              "incl. compile)", flush=True)
        assert not bad, bad[:5]

    def timed_twin(f):
        def g_(s):
            ax, ay, z = f(s)
            return ax[:, :128] ^ ay[:, :128] ^ z[:, :128], ax
        return jax.jit(g_)

    rates = {}
    for name, f in (("window", vwin), ("glv", vglv)):
        tf = timed_twin(f)
        dg, ax = tf(scalars)
        np.asarray(dg)
        t0 = time.perf_counter()
        s = scalars
        for _ in range(iters):
            dg, ax = tf(s)
            s = ax
        np.asarray(dg)
        rates[name] = batch * iters / (time.perf_counter() - t0)
        print(f"{name}: {rates[name]:.0f} mults/s", flush=True)

    print(f"\nGLV speedup: {rates['glv'] / rates['window']:.3f}x "
          f"(strict={strict}, batch={batch})", flush=True)


if __name__ == "__main__":
    main()
