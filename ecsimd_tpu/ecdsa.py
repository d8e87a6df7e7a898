"""Batched ECDSA over TPU: verification and signing at batch scale.

The natural production consumer of the scalar-multiplication paths — the
reference (aguinet/ecsimd) stops at ``scalar_mult`` (curve_group.h:189-218);
this module composes those paths into the FIPS 186-5 / SEC 1 v2 §4.1
operations, batched per lane like everything else in the framework:

- ``verify``: w = s^-1 mod n; u1 = e*w, u2 = r*w; R = u1*G + u2*Q;
  accept iff R != inf and R.x == r (mod n).
- ``sign``:   R = k*G; r = R.x mod n; s = k^-1 (e + r*d) mod n.
- ``recover``: Q = r^-1 (s*R - z*G) from (r, s, recovery id) — SEC 1
  §4.1.6 public-key recovery (the secp256k1-ecosystem staple), batched.

Inversions are batch-shared (GFp.batch_inverse, r5); RFC 6979
deterministic nonces via ``rfc6979_nonce``/``sign_hashes``; GLV
endomorphism routing on capable curves (see _verify_impl); sharded
pod-scale twins ``sign_planes_sharded``/``verify_planes_sharded``.

Design notes (TPU-first):

- **Order-field arithmetic mod n** reuses the generic-prime Montgomery CIOS
  machinery (ops/mont.py) with a FieldSpec built from curve.order — the same
  code path secp256k1's base field takes. Inversions are shared-exponent
  Fermat powers (mont_pow_const), a few hundred field mults: noise next to
  the two scalar multiplications.

- **Verification defaults to the strict window path for BOTH scalar mults**
  (kernels/window.py strict=True: complete accumulation adds, total scalar
  domain). The comb/window fast paths have measure-zero degenerate scalar
  classes whose membership is computable from public values; in a
  verification setting u1 and u2 are attacker-influenced (u1 = z*s^-1,
  u2 = r*s^-1), so a forger could in principle steer a lane onto a
  degenerate scalar whose (deterministic) corrupted output it predicts.
  strict=True closes that line entirely; ``allow_fast_paths=True`` opts into
  comb-for-u1*G + plain window for trusted-input batch validation (~2.3x
  faster, measured).

- **The final add is exception-free** (curves/group.jac_add_complete):
  P1 == +-P2 and infinity operands are adversarially reachable
  (u1*G == +-u2*Q iff the attacker solves the corresponding relation —
  cheap for them since no secrets are involved: e.g. Q = G, s = r makes
  u1*G == (z/r)*G and u2*Q == G... any collision must produce the correct
  group-law answer, not formula garbage).

- **No inversion in the x-coordinate check**: instead of converting R to
  affine (a ~340-mult Fermat inversion per lane), verify
  X_R == r_hat * Z_R^2 (mod p) for r_hat in {r, r+n (when r+n < p)} — the
  standard projective comparison; both candidates are needed because
  x_aff mod n folds [0, p) onto [0, n) with one wrap for curves with
  n < p (P-256's n is ~p - 2^224).

- **Signing uses the fixed-base comb** (8.4M k*G mults/s/chip): nonces are
  uniform random, so the comb's measure-zero degenerate classes have
  negligible probability (~2^-200) and no adversarial reachability. Control
  flow is fully uniform (masked selects end-to-end) — the same constant-time
  discipline as the reference ladder; k and d never branch.

Scalar-size caveat: digit planes are classical values in [0, 2^nbits); hash
ints z may be any 256-bit value and are reduced mod n with one conditional
subtract (n > 2^255 for the supported curves).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ecsimd_tpu import convert
from ecsimd_tpu.curves import group
from ecsimd_tpu.curves.point import AffinePoint, JacobianPoint
from ecsimd_tpu.field import GFp
from ecsimd_tpu.ops import bignum as bn
from ecsimd_tpu.ops import mont
from ecsimd_tpu.specs import P256, CurveSpec, FieldSpec


@functools.cache
def order_field(curve: CurveSpec) -> FieldSpec:
    """GF(n) for the curve's (prime) group order, Montgomery reduction —
    the scalar field of ECDSA. Built once per curve, like specs' base
    fields; n is never a Solinas-sparse prime for the supported curves.

    Requires an EXACT order (CurveSpec.order_exact): with a placeholder
    order every signature silently fails to round-trip — the r3 footgun
    that cost a round (CLAUDE.md r4 status)."""
    assert curve.order_exact, (
        f"{curve.name}: order is a placeholder (order_exact=False); "
        "ECDSA/ECDH/MSM need the exact group order"
    )
    return FieldSpec(
        name=f"{curve.name}-order", p=curve.order,
        nbits=curve.field.nbits, reduction="montgomery",
    )


def _mod_n(planes, fs_n: FieldSpec):
    """Reduce full-width classical planes mod n with one conditional
    subtract (valid because inputs are < 2^nbits < 2n for supported curves)."""
    assert curve_order_big_enough(fs_n)
    return bn.sub_if_above(planes, mont.p_planes(fs_n, planes))


def curve_order_big_enough(fs_n: FieldSpec) -> bool:
    return fs_n.p.bit_length() >= fs_n.nbits  # 2^nbits < 2n


def _on_curve(qx: GFp, qy: GFp, curve: CurveSpec):
    """Per-lane on-curve mask: y^2 == x^3 + a x + b in GF(p)."""
    a, b = group._curve_consts(curve, qx)
    lhs = qy.sqr()
    rhs = (qx.sqr() + a) * qx + b
    return lhs == rhs


def verify_planes(
    z, r, s, qx, qy, curve: CurveSpec,
    tile: int | None = None, interpret: bool = False,
    allow_fast_paths: bool = False, glv: bool | None = None,
):
    """Batched ECDSA verification on classical digit planes.

    z, r, s: (D, B) classical planes (z any 256-bit hash int; r, s the
    signature); qx, qy: (D, B) classical affine planes. Returns a
    (B,) int32 validity mask. See module docstring for the path-selection
    security rationale. interpret=True (CPU testing) dispatches eagerly —
    XLA:CPU cannot compile the traced interpret-kernel graph shape in
    reasonable time (same pathology comb.scalar_mult_base documents).
    ``glv``: route the scalar mults through the GLV endomorphism kernel
    (None = auto on capable curves, i.e. secp256k1; ~1.2x).
    """
    fn = _verify_impl if interpret else _verify_jit
    return fn(z, r, s, qx, qy, curve, tile=tile, interpret=interpret,
              allow_fast_paths=allow_fast_paths, glv=glv)


def _verify_impl(
    z, r, s, qx, qy, curve: CurveSpec,
    tile: int | None = None, interpret: bool = False,
    allow_fast_paths: bool = False, glv: bool | None = None,
):
    from ecsimd_tpu.glv import glv_capable
    from ecsimd_tpu.kernels import comb, window

    # GLV routing (r5): on j-invariant-0 curves (secp256k1) the strict
    # double-scalar endomorphism kernel does the same total-domain
    # multiplication in ~1.3x fewer field ops (kernels/glv.py); verify is
    # two scalar mults, so it inherits the whole gain. None = auto.
    use_glv = glv_capable(curve) if glv is None else glv
    if use_glv:
        assert glv_capable(curve), f"{curve.name} has no GLV endomorphism"

    fs = curve.field
    fs_n = order_field(curve)
    t = window.DEFAULT_TILE if tile is None else tile

    n_pl = mont.p_planes(fs_n, r)
    ok = (
        (1 - bn.is_zero(r)) & (1 - bn.is_zero(s))
        & bn.cmp_lt(r, n_pl) & bn.cmp_lt(s, n_pl)
    )
    qxf = GFp.from_classical(qx, fs)
    qyf = GFp.from_classical(qy, fs)
    ok = ok & _on_curve(qxf, qyf, curve)

    # scalar recovery mod n: w = s^-1, u1 = e w, u2 = r w (all a few hundred
    # CIOS mults — negligible next to the scalar mults below)
    e = _mod_n(z, fs_n)
    sm = mont.mont_from_classical(s, fs_n)
    # s == 0 lanes (already marked invalid) would make the Fermat power 0
    # and u2 = 0, which the scalar-mult domain excludes; steer them to 1
    sm = bn.select(bn.is_zero(sm), mont.mont_one(fs_n, sm), sm)
    wm = GFp.from_mont(sm, fs_n).batch_inverse().planes
    em = mont.mont_from_classical(e, fs_n)
    rm = mont.mont_from_classical(r, fs_n)
    u1 = mont.mont_to_classical(mont.mont_mul(em, wm, fs_n), fs_n)
    u2 = mont.mont_to_classical(mont.mont_mul(rm, wm, fs_n), fs_n)
    one = jnp.zeros_like(u1).at[0].set(1)
    # u2 == 0 only on lanes already marked invalid (r or s out of range);
    # steer them to 1 so the scalar-mult domain holds, result discarded
    u2 = bn.select(bn.is_zero(u2), one, u2)
    u1_zero = bn.is_zero(u1)  # e == 0 mod n: R = u2*Q alone (valid input!)
    u1s = bn.select(u1_zero, one, u1)

    strict = not allow_fast_paths
    if use_glv:
        from ecsimd_tpu.kernels import glv as kglv

        def varbase(scal, jac, st):
            return kglv.scalar_mult(scal, jac, tile=t, interpret=interpret,
                                    strict=st)
    else:

        def varbase(scal, jac, st):
            return window.scalar_mult(scal, jac, tile=t, interpret=interpret,
                                      strict=st)

    if strict:
        gb = AffinePoint(
            jnp.broadcast_to(
                jnp.asarray(convert.ints_to_planes([curve.gx], fs.ndigits)), z.shape
            ),
            jnp.broadcast_to(
                jnp.asarray(convert.ints_to_planes([curve.gy], fs.ndigits)), z.shape
            ),
            curve,
        )
        s1 = varbase(u1s, JacobianPoint.from_affine(gb), True)
    else:
        s1 = comb.scalar_mult_base(u1s, curve, tile=t, interpret=interpret)
    q_jac = JacobianPoint.from_affine(AffinePoint(qx, qy, curve))
    s2 = varbase(u2, q_jac, strict)

    # u1 == 0 lanes: replace S1 with infinity so R = S2 (complete add)
    z1 = s1.z.select(1 - u1_zero, s1.z.const_like(0))
    rpt = group.jac_add_complete(JacobianPoint(s1.x, s1.y, z1, curve), s2)

    ok = ok & (1 - rpt.z.is_zero())
    # projective x check: X == r_hat * Z^2 for r_hat in {r, r + n < p}
    zz = rpt.z.sqr()
    c1 = GFp.from_classical(r, fs) * zz
    m1 = rpt.x == c1
    rn, carry = bn.add(r, n_pl)
    p_pl = mont.p_planes(fs, r)
    rn_ok = (1 - carry) & bn.cmp_lt(rn, p_pl)
    c2 = GFp.from_classical(bn.select(rn_ok, rn, r), fs) * zz
    m2 = rn_ok & (rpt.x == c2)
    return ok & (m1 | m2)


_verify_jit = functools.partial(
    jax.jit,
    static_argnames=("curve", "tile", "interpret", "allow_fast_paths", "glv"),
)(_verify_impl)


def verify_planes_sharded(
    z, r, s, qx, qy, curve: CurveSpec, mesh, axis_name: str = "batch",
    tile: int | None = None, interpret: bool = False,
    allow_fast_paths: bool = False,
):
    """Batched ECDSA verification sharded over a device mesh: the whole
    verify pipeline (range checks, on-curve, u1/u2 recovery, the two strict
    window mults, complete add, projective x check) runs per shard under
    shard_map — verification is lane-local, so zero collectives
    (parallel/__init__.py's property). The batch auto-pads to
    n_devices * tile with lane-0 copies (padding verdicts are sliced off).

    interpret=True (CPU meshes) is toy-scale-test-only: the per-shard XLA
    window twin compiles pathologically at d = 16 on XLA:CPU.
    """
    from ecsimd_tpu import parallel
    from ecsimd_tpu.kernels import window

    t = window.DEFAULT_TILE if tile is None else tile
    multiple = mesh.devices.size * (1 if interpret else t)
    padded = [parallel.pad_batch(a, multiple) for a in (z, r, s, qx, qy)]
    b_true = padded[0][1]
    fn = _verify_sharded_fn(mesh, curve, axis_name, t, interpret, allow_fast_paths)
    ok = fn(*(a for a, _ in padded))
    return ok[:b_true]


@functools.cache
def _verify_sharded_fn(mesh, curve: CurveSpec, axis_name: str, tile: int,
                       interpret: bool, allow_fast_paths: bool):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    spec = P(None, axis_name)
    per_shard = functools.partial(
        _verify_impl, curve=curve, tile=None if interpret else tile,
        interpret=interpret, allow_fast_paths=allow_fast_paths,
    )
    f = shard_map(
        per_shard, mesh=mesh,
        in_specs=(spec,) * 5, out_specs=P(axis_name), check_vma=False,
    )
    return jax.jit(f)


def recover_planes(
    z, r, s, v, curve: CurveSpec,
    tile: int | None = None, interpret: bool = False, glv: bool | None = None,
):
    """Batched ECDSA public-key recovery (SEC 1 v2 §4.1.6, cofactor-1):
    Q = r^-1 * (s*R - z*G) with R decompressed from (r, recovery id v).

    z, r, s: (D, B) classical planes; v: (B,) int32 recovery ids in [0, 3]
    (bit 0 = parity of R.y, bit 1 = R.x overflowed mod n — the convention
    oracle/ecdsa.sign_recoverable emits). Returns (qx, qy, ok): recovered
    affine public keys (zeroed on failed lanes) + validity mask. Both
    scalar mults are strict/total-domain (inputs are attacker-supplied by
    construction — recovery exists to process foreign signatures); GLV
    routing as in verify. One batch inversion (mod n) for r^-1, one sqrt
    chain for the decompression, one complete add — all batched.
    """
    fn = _recover_impl if interpret else _recover_jit
    return fn(z, r, s, v, curve, tile=tile, interpret=interpret, glv=glv)


def _recover_impl(
    z, r, s, v, curve: CurveSpec,
    tile: int | None = None, interpret: bool = False, glv: bool | None = None,
):
    from ecsimd_tpu.glv import glv_capable
    from ecsimd_tpu.kernels import window

    use_glv = glv_capable(curve) if glv is None else glv
    fs = curve.field
    fs_n = order_field(curve)
    t = window.DEFAULT_TILE if tile is None else tile

    n_pl = mont.p_planes(fs_n, r)
    p_pl = mont.p_planes(fs, r)
    ok = (
        (1 - bn.is_zero(r)) & (1 - bn.is_zero(s))
        & bn.cmp_lt(r, n_pl) & bn.cmp_lt(s, n_pl) & (v >= 0) & (v <= 3)
    )
    # candidate R.x = r (+ n when v bit 1); must stay < p
    xn, carry = bn.add(r, n_pl)
    hi = jax.lax.shift_right_logical(v, 1) & 1
    x_cand = bn.select(hi, xn, r)
    ok = ok & (1 - (hi & (carry | (1 - bn.cmp_lt(xn, p_pl)))))
    x_cand = bn.select(ok, x_cand, jnp.zeros_like(r).at[0].set(1))

    dec, sqrt_ok = group.affine_from_x(x_cand, curve)
    ok = ok & sqrt_ok
    ydec = GFp.from_classical(dec.y, fs)
    parity = dec.y[0] & 1
    want = v & 1
    ry = ydec.select(parity == want, ydec.opposite()).to_classical()
    # steer invalid lanes to G so the kernel bases are genuine curve points
    gx_pl = jnp.broadcast_to(
        jnp.asarray(convert.ints_to_planes([curve.gx], fs.ndigits)), r.shape)
    gy_pl = jnp.broadcast_to(
        jnp.asarray(convert.ints_to_planes([curve.gy], fs.ndigits)), r.shape)
    rx_s = bn.select(ok, x_cand, gx_pl)
    ry_s = bn.select(ok, ry, gy_pl)

    # r^-1 mod n (batch-shared); u1 = -z*r^-1, u2 = s*r^-1
    rm = mont.mont_from_classical(r, fs_n)
    rm = bn.select(bn.is_zero(rm), mont.mont_one(fs_n, rm), rm)
    rinv = GFp.from_mont(rm, fs_n).batch_inverse().planes
    e = _mod_n(z, fs_n)
    em = mont.mont_from_classical(e, fs_n)
    sm = mont.mont_from_classical(s, fs_n)
    u1p = mont.mont_to_classical(mont.mont_mul(em, rinv, fs_n), fs_n)
    u1 = bn.select(bn.is_zero(u1p), u1p, bn.sub(n_pl, u1p)[0])  # -z r^-1
    u2 = mont.mont_to_classical(mont.mont_mul(sm, rinv, fs_n), fs_n)
    one = jnp.zeros_like(u1).at[0].set(1)
    u2 = bn.select(bn.is_zero(u2), one, u2)  # only on already-invalid lanes
    u1_zero = bn.is_zero(u1)
    u1s = bn.select(u1_zero, one, u1)

    if use_glv:
        from ecsimd_tpu.kernels import glv as kglv

        def varbase(scal, jac):
            return kglv.scalar_mult(scal, jac, tile=t, interpret=interpret,
                                    strict=True)
    else:

        def varbase(scal, jac):
            return window.scalar_mult(scal, jac, tile=t, interpret=interpret,
                                      strict=True)

    gb = JacobianPoint.from_affine(AffinePoint(gx_pl, gy_pl, curve))
    s1 = varbase(u1s, gb)
    s2 = varbase(u2, JacobianPoint.from_affine(AffinePoint(rx_s, ry_s, curve)))
    z1 = s1.z.select(1 - u1_zero, s1.z.const_like(0))
    q = group.jac_add_complete(JacobianPoint(s1.x, s1.y, z1, curve), s2)
    ok = ok & (1 - q.z.is_zero())
    aff = q.to_affine()
    qx = bn.select(ok, aff.x, jnp.zeros_like(aff.x))
    qy = bn.select(ok, aff.y, jnp.zeros_like(aff.y))
    return qx, qy, ok


_recover_jit = functools.partial(
    jax.jit, static_argnames=("curve", "tile", "interpret", "glv")
)(_recover_impl)


def sign_planes_sharded(
    z, d, k, curve: CurveSpec, mesh, axis_name: str = "batch",
    tile: int | None = None, interpret: bool = False, strict: bool = False,
):
    """Batched ECDSA signing sharded over a device mesh (the pod-scale twin
    of verify_planes_sharded): the comb k*G + batch-inverse epilogue runs
    per shard under shard_map — signing is lane-local (the batch inversions
    become per-shard trees), zero collectives. Auto-pads to
    n_devices * tile with lane-0 copies; padding signatures are sliced off.
    """
    from jax.sharding import PartitionSpec as P

    from ecsimd_tpu import parallel
    from ecsimd_tpu.kernels import comb

    t = comb.DEFAULT_TILE if tile is None else tile
    multiple = mesh.devices.size * (1 if interpret else t)
    padded = [parallel.pad_batch(a, multiple) for a in (z, d, k)]
    b_true = padded[0][1]
    fn = _sign_sharded_fn(mesh, curve, axis_name, t, interpret, strict)
    r, s, ok = fn(*(a for a, _ in padded))
    return r[:, :b_true], s[:, :b_true], ok[:b_true]


@functools.cache
def _sign_sharded_fn(mesh, curve: CurveSpec, axis_name: str, tile: int,
                     interpret: bool, strict: bool):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    spec = P(None, axis_name)
    per_shard = functools.partial(
        _sign_impl, curve=curve, tile=None if interpret else tile,
        interpret=interpret, strict=strict,
    )
    f = shard_map(
        per_shard, mesh=mesh,
        in_specs=(spec,) * 3, out_specs=(spec, spec, P(axis_name)),
        check_vma=False,
    )
    return jax.jit(f)


def sign_planes(
    z, d, k, curve: CurveSpec, tile: int | None = None, interpret: bool = False,
    strict: bool = False,
):
    """Batched ECDSA signing on classical digit planes; interpret=True
    dispatches eagerly (see verify_planes)."""
    fn = _sign_impl if interpret else _sign_jit
    return fn(z, d, k, curve, tile=tile, interpret=interpret, strict=strict)


def _sign_impl(
    z, d, k, curve: CurveSpec, tile: int | None = None, interpret: bool = False,
    strict: bool = False,
):
    """Batched ECDSA signing on classical digit planes.

    z: (D, B) hash planes; d: (D, B) private keys in [1, n-1]; k: (D, B)
    uniform-random nonces in [1, n-1] (caller-supplied — see ``sign_ints``
    for the os.urandom wrapper). Returns (r, s, ok) planes/mask; ok == 0
    lanes (r or s == 0, probability ~2^-bits, or out-of-range inputs) must
    be retried with a fresh nonce. Uniform control flow; k and d never
    branch. ``strict=True`` runs the complete-add comb chain: removes the
    measure-zero comb degenerate class (~2^-240 per signature for P-256
    with uniform nonces — relevant only for toy-scale fields or
    defense-in-depth) at ~2x the k*G cost."""
    from ecsimd_tpu.kernels import comb

    fs = curve.field
    fs_n = order_field(curve)
    t = comb.DEFAULT_TILE if tile is None else tile

    n_pl = mont.p_planes(fs_n, k)
    ok = (
        (1 - bn.is_zero(k)) & (1 - bn.is_zero(d))
        & bn.cmp_lt(k, n_pl) & bn.cmp_lt(d, n_pl)
    )
    # k == 0 lanes (already invalid) steered to 1 so the comb domain holds;
    # k >= n lanes stay as-is (any k < 2^nbits is representable — the range
    # check above already flags them)
    ks = bn.select(bn.is_zero(k), jnp.zeros_like(k).at[0].set(1), k)

    rp = comb.scalar_mult_base(ks, curve, tile=t, interpret=interpret, strict=strict)
    # affine x via ONE batch-shared inversion in GF(p) (Montgomery trick,
    # GFp.batch_inverse — was a per-lane ~384-mult Fermat power, ~half the
    # total sign cost); x mod n by cond-sub
    zinv = rp.z.batch_inverse()
    x_aff = (rp.x * zinv.sqr()).to_classical()
    r = _mod_n(x_aff, fs_n)
    ok = ok & (1 - bn.is_zero(r))

    e = _mod_n(z, fs_n)
    km = mont.mont_from_classical(ks, fs_n)
    # k^-1 mod n: batch-shared inversion in GF(n) too (k == 0 lanes were
    # steered to 1 above; batch_inverse(0) = 0 would match mont_pow_const)
    kinv = GFp.from_mont(km, fs_n).batch_inverse().planes
    em = mont.mont_from_classical(e, fs_n)
    rm = mont.mont_from_classical(r, fs_n)
    dm = mont.mont_from_classical(d, fs_n)
    sm = mont.mont_mul(kinv, mont.mod_add(em, mont.mont_mul(rm, dm, fs_n), fs_n), fs_n)
    s = mont.mont_to_classical(sm, fs_n)
    ok = ok & (1 - bn.is_zero(s))
    return r, s, ok


_sign_jit = functools.partial(
    jax.jit, static_argnames=("curve", "tile", "interpret", "strict")
)(_sign_impl)


# --- RFC 6979 deterministic nonces (host-side) --------------------------------


def _bits2int(b: bytes, qlen: int) -> int:
    """RFC 6979 §2.3.2: leftmost qlen bits of the bit string."""
    x = int.from_bytes(b, "big")
    blen = len(b) * 8
    return x >> (blen - qlen) if blen > qlen else x


def rfc6979_nonce(h1: bytes, x: int, curve: CurveSpec = P256, hashfunc=None,
                  extra: bytes = b"") -> int:
    """RFC 6979 §3.2 deterministic nonce k for private key x and message
    hash h1 = H(m) (raw digest bytes). Host-side HMAC-DRBG — nonces are
    per-signature secrets derived before anything touches the device; the
    device-side signing path stays uniform regardless of how k was made.

    ``hashfunc`` is the HMAC hash (default SHA-256 — the function used for
    HMAC need not match the one that produced h1, §3.1); ``extra`` is the
    optional k' additional data (§3.6). Bit-exact against the RFC's A.2.5
    P-256/SHA-256 vectors (tests/test_rfc6979.py).
    """
    import hashlib
    import hmac as hmac_mod

    hashfunc = hashfunc or hashlib.sha256
    q = curve.order
    qlen = q.bit_length()
    rolen = (qlen + 7) // 8
    hlen = hashfunc().digest_size

    def int2octets(v: int) -> bytes:
        return v.to_bytes(rolen, "big")

    def bits2octets(b: bytes) -> bytes:
        z1 = _bits2int(b, qlen)
        z2 = z1 - q if z1 >= q else z1
        return int2octets(z2)

    def hm(key: bytes, msg: bytes) -> bytes:
        return hmac_mod.new(key, msg, hashfunc).digest()

    v = b"\x01" * hlen
    k = b"\x00" * hlen
    seed = int2octets(x) + bits2octets(h1) + extra
    k = hm(k, v + b"\x00" + seed)
    v = hm(k, v)
    k = hm(k, v + b"\x01" + seed)
    v = hm(k, v)
    while True:
        t = b""
        while len(t) < rolen:
            v = hm(k, v)
            t += v
        kk = _bits2int(t[:rolen], qlen)
        if 1 <= kk <= q - 1:
            return kk
        k = hm(k, v + b"\x00")
        v = hm(k, v)


def sign_hashes(h1s, ds, curve: CurveSpec = P256, deterministic: bool = True,
                hashfunc=None, **kw):
    """Batched signing from raw message digests (bytes). deterministic=True
    derives each lane's nonce per RFC 6979 (host HMAC-DRBG), making
    signatures reproducible and test-vector-exact; False uses the OS CSPRNG.
    Returns (rs, ss) int lists."""
    q = curve.order
    qlen = q.bit_length()
    zs = [_bits2int(h, qlen) for h in h1s]
    if deterministic:
        ks = [rfc6979_nonce(h, d, curve, hashfunc=hashfunc)
              for h, d in zip(h1s, ds)]
    else:
        ks = None
    return sign_ints(zs, ds, curve, ks=ks, **kw)


# --- host-friendly integer interfaces ----------------------------------------


def verify_ints(zs, rs, ss, qxs, qys, curve: CurveSpec = P256, **kw) -> list[bool]:
    """Int-list convenience wrapper over verify_planes."""
    d = curve.field.ndigits
    pl = [jnp.asarray(convert.ints_to_planes(v, d)) for v in (zs, rs, ss, qxs, qys)]
    import numpy as np

    return [bool(v) for v in np.asarray(verify_planes(*pl, curve, **kw))]


def recover_ints(zs, rs, ss, vs, curve: CurveSpec = P256, **kw):
    """Int-list public-key recovery: returns a list of (qx, qy) | None."""
    import numpy as np

    d = curve.field.ndigits
    pl = [jnp.asarray(convert.ints_to_planes(x, d)) for x in (zs, rs, ss)]
    qx, qy, ok = recover_planes(
        *pl, jnp.asarray(np.asarray(vs, np.int32)), curve, **kw)
    gx = convert.planes_to_ints(np.asarray(qx))
    gy = convert.planes_to_ints(np.asarray(qy))
    return [(x, y) if bool(o) else None
            for x, y, o in zip(gx, gy, np.asarray(ok))]


def sign_ints(zs, ds, curve: CurveSpec = P256, ks=None, **kw):
    """Int-list signing: generates uniform nonces via the OS CSPRNG unless
    ks is supplied (tests / RFC 6979 callers). Returns (rs, ss) int lists;
    raises on the ~2^-bits chance a lane needs a retry (caller re-calls)."""
    import secrets

    import numpy as np

    n = curve.order
    if ks is None:
        ks = [1 + secrets.randbelow(n - 1) for _ in zs]
    d = curve.field.ndigits
    pl = [jnp.asarray(convert.ints_to_planes(v, d)) for v in (zs, ds, ks)]
    r, s, ok = sign_planes(*pl, curve, **kw)
    if not np.asarray(ok).all():
        raise ValueError("nonce produced r == 0 or s == 0; retry with fresh ks")
    return convert.planes_to_ints(np.asarray(r)), convert.planes_to_ints(np.asarray(s))
