"""Fixed-base comb scalar multiplication (shared tables, zero doublings).

The reference's headline bench and its competitor baselines all multiply the
*base point* (benchs/curve_group.cpp:30-34, benchs/p256_ref.cpp:20-100); the
comb kernel is the TPU-native fast path for that fixed-base case. Tests:
recoding identity vs Python ints, table consistency, XLA path vs oracle on
P-256, and the Pallas kernel end-to-end in interpret mode on the toy curve
(tractable because the tables are host-built — no in-kernel table loops).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecsimd_tpu import convert
from ecsimd_tpu.kernels import comb
from ecsimd_tpu.oracle import coz
from ecsimd_tpu.specs import P256
from tests.toy import TOY64


def test_recoding_identity(rng):
    """k (odd) == sum_i (2*e_i - 255) * 2^(8i) + 2^nbits, e_i the 9-bit
    window >> 1; even k recodes as k+1 (parity fixup subtracts B)."""
    for curve in (P256, TOY64):
        nbits = curve.field.nbits
        npos = nbits // comb.W
        for k in [1, 2, 3, 255, 256, 257] + [rng.randrange(1, curve.order) for _ in range(8)]:
            ko = k if k & 1 else k + 1
            es = [((ko >> (comb.W * i)) & (2 * comb.NENT - 1)) >> 1 for i in range(npos)]
            total = sum((2 * e - (comb.NENT - 1)) << (comb.W * i) for i, e in enumerate(es))
            assert total + (1 << nbits) == ko, (curve.name, k)
            # the traced index extractor must agree with the Python closed form
            d = curve.field.ndigits
            planes = jnp.asarray(convert.ints_to_planes([k], d))
            got = [int(v) for v in np.asarray(comb.entry_indices(planes, curve))[:, 0]]
            assert got == es, (curve.name, k)


def _naive_mult(k, curve):
    """Double-and-add second opinion on the oracle jac formulas — total on
    every k (the co-Z ladder oracle degenerates on special forms like 2^nbits)."""
    from ecsimd_tpu.oracle import window as ow

    base, acc = (curve.gx, curve.gy, 1), None
    while k:
        if k & 1:
            acc = base if acc is None else ow._jac_add(acc, base, curve)
        base = ow._jac_dbl(base, curve)
        k >>= 1
    return coz.jacobian_to_affine(acc, curve)


def test_base_tables(rng):
    """Entry e of position i >= 1 holds affine (2e - 255) * 2^(8i) * G;
    position 0 folds in the top digit: (2^nbits + 2e - 255) * G
    (classical-domain check vs a naive double-and-add oracle)."""
    curve = TOY64
    fs = curve.field
    tables, negbase = comb.base_tables(curve, curve.gx, curve.gy)
    npos = fs.nbits // comb.W
    assert tables.shape == (npos, comb.NENT, 2 * fs.ndigits)
    for i, e in [(0, 0), (0, comb.NENT - 1), (1, 17), (npos - 1, rng.randrange(comb.NENT))]:
        dgt = 2 * e - (comb.NENT - 1)
        row = tables[i, e]
        d = fs.ndigits
        gx = sum(int(v) << (16 * j) for j, v in enumerate(row[:d]))
        gy = sum(int(v) << (16 * j) for j, v in enumerate(row[d:]))
        if i == 0:
            ex, ey = _naive_mult((1 << fs.nbits) + dgt, curve)
        else:
            ex, ey = _naive_mult(abs(dgt) << (comb.W * i), curve)
            if dgt < 0:
                ey = (fs.p - ey) % fs.p
        assert (gx, gy) == (ex, ey), (i, e, dgt)
    assert negbase == (curve.gx, (fs.p - curve.gy) % fs.p)


def _check(curve, ks, base=None, **kw):
    d = curve.field.ndigits
    scalars = jnp.asarray(convert.ints_to_planes(ks, d))
    pt = comb.scalar_mult_base(scalars, curve, base=base, **kw)
    # affine conversion host-side with Python ints (internal -> classical via
    # Montgomery arithmetic on ints for generic-prime fields; identity for
    # Solinas); keeps the test off slow eager/XLA:CPU inversion chains
    fs = curve.field
    p = fs.p
    rinv = pow(1 << fs.nbits, -1, p) if not fs.plain else 1
    got = []
    for X, Y, Z in zip(convert.planes_to_ints(np.asarray(pt.x.planes)),
                       convert.planes_to_ints(np.asarray(pt.y.planes)),
                       convert.planes_to_ints(np.asarray(pt.z.planes))):
        X, Y, Z = X * rinv % p, Y * rinv % p, Z * rinv % p
        zi = pow(Z, p - 2, p)
        got.append((X * zi * zi % p, Y * zi * zi * zi % p))
    bx, by = base if base is not None else (curve.gx, curve.gy)
    want = [coz.scalar_mult_affine(k, bx, by, curve) for k in ks]
    assert got == want


def test_comb_xla_toy(rng):
    ks = [1, 2, 3, 4, 255, 256, rng.randrange(1, TOY64.order), rng.randrange(1, TOY64.order)]
    _check(TOY64, ks, use_kernel=False)


def test_comb_xla_p256(rng):
    """Real P-256 through the XLA comb path (fori_loop keeps the compile
    tractable on CPU; ~80 s cold, cached thereafter)."""
    ks = [1, 2, P256.order - 2, 5] + [rng.randrange(1, P256.order) for _ in range(4)]
    _check(P256, ks, use_kernel=False)


def test_comb_kernel_toy_interpret(rng):
    """End-to-end Pallas comb kernel in interpret mode, per-lane-distinct
    scalars, both parities (the even-k fixup path is lane-divergent).

    unroll=2 covers both the select-seeded (u == 0) and plain-chain (u > 0)
    add paths while keeping the jitted interpret program inside what XLA:CPU
    executes in reasonable time (larger unrolls hit its deep-fused-chain
    cliff; the TPU default is unroll=4, same trace repeated)."""
    ks = [1, 2, 5, 6, 255, 256, 12345, rng.randrange(1, TOY64.order)]
    ks = ks * 16  # tile = 128 lanes
    _check(TOY64, ks, tile=128, use_kernel=True, interpret=True, unroll=2)


def test_comb_tree_toy(rng):
    """Pairwise-tree comb chain (batched aff-aff level + jac_add levels +
    fixup) through the eager host twin (_tree_core — the same code the
    Pallas tree kernel traces; XLA:CPU cannot compile this program shape,
    and pallas interpret mode jits it, so the CPU check runs eagerly)."""
    ks = [1, 2, 5, 6, 255, 256, 12345, rng.randrange(1, TOY64.order)]
    ks = ks * 16
    _check(TOY64, ks, use_kernel=False, chain="tree")


def test_comb_tree_p256(rng):
    """Tree chain on real P-256 through the eager host twin."""
    ks = [1, 2, P256.order - 2, 5] + [rng.randrange(1, P256.order) for _ in range(4)]
    _check(P256, ks, use_kernel=False, chain="tree")


def test_comb_xla_mont_toys(rng):
    """Comb on Montgomery-reduction fields (tables in the Montgomery domain,
    reduction-dispatched group law), incl. the general-a toy — the shapes
    secp256k1 takes. No reference counterpart (the reference has no comb);
    closes the curve-generality matrix."""
    from tests.toy import TOYA5, TOYM

    for curve in (TOYM, TOYA5):
        ks = [1, 2, 5, 6, 255, 256, rng.randrange(1, curve.order)]
        _check(curve, ks, use_kernel=False)


def test_comb_xla_secp256k1(rng):
    """Fixed-base comb on secp256k1 (a = 0, Montgomery/CIOS reduction)
    through the XLA path, bit-exact vs the Python-int oracle."""
    from ecsimd_tpu.specs import SECP256K1

    ks = [1, 2, SECP256K1.order - 2] + [rng.randrange(1, SECP256K1.order) for _ in range(3)]
    _check(SECP256K1, ks, use_kernel=False)


def test_comb_kernel_mont_toy_interpret(rng):
    """Pallas comb kernel end-to-end on the Montgomery toy field in
    interpret mode: in-kernel CIOS mul + dispatched mixed add + Montgomery
    fixup constants (VGFp.const_like converts to the internal domain)."""
    from tests.toy import TOYM

    ks = [1, 2, 5, 6, 255, 256, 12345, rng.randrange(1, TOYM.order)]
    ks = ks * 16  # tile = 128 lanes
    _check(TOYM, ks, tile=128, use_kernel=True, interpret=True, unroll=2)


def test_comb_tree_mont_toy(rng):
    """Tree comb chain on the Montgomery toy field through the eager host
    twin (aff_add_generic first level + jac_add_generic levels)."""
    from tests.toy import TOYM

    ks = [1, 2, 5, 6, 255, 256, 12345, rng.randrange(1, TOYM.order)]
    ks = ks * 16
    _check(TOYM, ks, use_kernel=False, chain="tree")


def test_aff_add_fused_vs_oracle(rng):
    """aff_add_fused (z1 = z2 = 1 add, the tree's first level) bit-exact vs
    the oracle's general Jacobian add, eagerly on plane digits."""
    import jax.numpy as jnp

    from ecsimd_tpu.kernels.coz import aff_add_fused
    from ecsimd_tpu.kernels.digits import VGFp
    from ecsimd_tpu.oracle import window as ow

    for curve in (TOY64, P256):
        fs = curve.field
        d = fs.ndigits
        pts1, pts2 = [], []
        for _ in range(4):
            k1, k2 = rng.randrange(2, curve.order), rng.randrange(2, curve.order)
            pts1.append(coz.scalar_mult_affine(k1, curve.gx, curve.gy, curve))
            pts2.append(coz.scalar_mult_affine(k2, curve.gx, curve.gy, curve))
        a = [jnp.asarray(convert.ints_to_planes([p[i] for p in pts1], d)) for i in range(2)]
        b = [jnp.asarray(convert.ints_to_planes([p[i] for p in pts2], d)) for i in range(2)]
        x3, y3, z3 = aff_add_fused(
            VGFp([a[0][k] for k in range(d)], fs), VGFp([a[1][k] for k in range(d)], fs),
            VGFp([b[0][k] for k in range(d)], fs), VGFp([b[1][k] for k in range(d)], fs),
        )
        got = [convert.planes_to_ints(np.asarray(jnp.stack(v.digs))) for v in (x3, y3, z3)]
        for i in range(4):
            wx, wy, wz = ow._jac_add((*pts1[i], 1), (*pts2[i], 1), curve)
            assert (got[0][i], got[1][i], got[2][i]) == (wx, wy, wz), i


def test_comb_xla_general_a_solinas(rng):
    """a != -3 on the Solinas toy field: the host table build (generic-a
    oracle doubling) and the comb chain must be correct for any curve a —
    r2's table builder hard-coded dbl-2001-b (a = -3) and would have
    silently built wrong tables here (ADVICE r2, medium)."""
    from tests.toy import TOYA5S

    ks = [1, 2, 5, 6, 255, 256, rng.randrange(1, TOYA5S.order)]
    _check(TOYA5S, ks, use_kernel=False)


@pytest.mark.skipif(
    not __import__("os").environ.get("ECSIMD_SLOW_TESTS"),
    reason="chains=2 interpret pathologically slow on XLA:CPU eager "
    "(>10 min vs ~30 s for unroll=2 — same op count; the permuted-block "
    "epilogue trips the eager dispatcher); TPU-verified instead: "
    "scripts/comb_chain_ab.py chains:2 asserts 4 oracle lanes every run",
)
def test_comb_kernel_chains_interpret(rng):
    """Multi-chain serial comb (2 independent accumulators combined by a
    general add at the last grid step) in interpret mode — covers the
    position permutation, per-chain select-seeding, and the combine+fixup
    epilogue."""
    ks = [1, 2, 5, 6, 255, 256, 12345, rng.randrange(1, TOY64.order)]
    ks = ks * 16  # tile = 128 lanes
    _check(TOY64, ks, tile=128, use_kernel=True, interpret=True, chains=2)

def test_comb_kernel_ent8_default_interpret(rng):
    """ent_bits=8 (the scalar_mult_base default): tables split into 8-bit
    half-digit rows held in int8 (biased by -128), gathered on the s8 MXU
    path, recombined lo | hi << 8 in-kernel. Bit-exact vs oracle."""
    ks = [1, 2, 5, 6, 255, 256, 12345, rng.randrange(1, TOY64.order)]
    ks = ks * 16  # tile = 128 lanes
    _check(TOY64, ks, tile=128, use_kernel=True, interpret=True, unroll=2,
           ent_bits=8)


def test_comb_kernel_bf16_tables_interpret(rng):
    """bf16 half-digit tables (the measured-slower alternative dtype kept
    for the A/B script): in-kernel f32 cast + f32 gather. Bit-exact."""
    ks = [1, 2, 5, 6, 255, 256, 12345, rng.randrange(1, TOY64.order)]
    ks = ks * 16  # tile = 128 lanes
    tbl, negbase = comb._device_tables8(TOY64, TOY64.gx, TOY64.gy, jnp.bfloat16)
    d = TOY64.field.ndigits
    scalars = jnp.asarray(convert.ints_to_planes(ks, d))
    ax, ay, z = comb.comb_mont_planes(
        scalars, tbl, TOY64, tuple(negbase), tile=128, interpret=True, unroll=2)
    p = TOY64.field.p
    got = []
    for X, Y, Z in zip(convert.planes_to_ints(np.asarray(ax)),
                       convert.planes_to_ints(np.asarray(ay)),
                       convert.planes_to_ints(np.asarray(z))):
        zi = pow(Z, p - 2, p)
        got.append((X * zi * zi % p, Y * zi * zi * zi % p))
    want = [coz.scalar_mult_affine(k, TOY64.gx, TOY64.gy, TOY64) for k in ks]
    assert got == want


def test_comb_kernel_pipe_interpret(rng):
    """Software-pipelined serial comb (gather j+1 overlaps add of entry j,
    entry double-buffered in VMEM scratch) in interpret mode: covers the
    seed-at-j==0 branch, the clamped last gather, and the fixup epilogue."""
    ks = [1, 2, 5, 6, 255, 256, 12345, rng.randrange(1, TOY64.order)]
    ks = ks * 16  # tile = 128 lanes
    _check(TOY64, ks, tile=128, use_kernel=True, interpret=True, chain="pipe")


def test_comb_kernel_s8_tables_interpret(rng):
    """int8 half-digit tables (biased by -128 on the host, re-biased after
    the s8 x s8 -> s32 gather matmul) — the MXU's native int8 path.
    Bit-exact vs oracle."""
    ks = [1, 2, 5, 6, 255, 256, 12345, rng.randrange(1, TOY64.order)]
    ks = ks * 16  # tile = 128 lanes
    tbl, negbase = comb._device_tables8(TOY64, TOY64.gx, TOY64.gy, jnp.int8)
    d = TOY64.field.ndigits
    scalars = jnp.asarray(convert.ints_to_planes(ks, d))
    ax, ay, z = comb.comb_mont_planes(
        scalars, tbl, TOY64, tuple(negbase), tile=128, interpret=True, unroll=2)
    got = []
    p = TOY64.field.p
    for X, Y, Z in zip(convert.planes_to_ints(np.asarray(ax)),
                       convert.planes_to_ints(np.asarray(ay)),
                       convert.planes_to_ints(np.asarray(z))):
        zi = pow(Z, p - 2, p)
        got.append((X * zi * zi % p, Y * zi * zi * zi % p))
    want = [coz.scalar_mult_affine(k, TOY64.gx, TOY64.gy, TOY64) for k in ks]
    assert got == want
