"""Fixed-base comb scalar multiplication: shared tables, zero doublings.

The reference's headline benchmark multiplies the *base point* G
(``benchs/curve_group.cpp:30-34``), and its competitor baselines are OpenSSL /
Botan / Crypto++ base-point multiplication (``benchs/p256_ref.cpp:98-100``) —
the fixed-base case where every lane shares the base. On TPU that shared
structure is worth far more than 4 SIMD lanes: the window tables are built
ONCE on the host (Python-int oracle) for the shared base and broadcast to
every lane, turning the whole scalar multiplication into ``nbits/8`` mixed
additions with NO doublings (vs ~1 double per bit + 1 add per window for the
per-lane-base window kernel — ~7x fewer field ops).

Pipeline (all one jit):
  1. recode: width-8 signed-odd window digits d_i, odd in [-255, 255], via the
     closed form e_i = ((k >> 8i) | paired 9-bit window) >> 1 (oracle/window.py
     derivation; table entry index e <-> digit d = 2e - 255, so the |1 forcing
     and +-sign are absorbed into the table layout — no in-kernel negation).
  2. gather: per-lane one-hot(e) x shared table as an f32 matmul on the MXU —
     exact because one-hot rows select a single <= 16-bit value (f32 has a
     24-bit mantissa) — giving each lane its 2*ndigits entry planes.
  3. add chain: a Pallas kernel with grid (batch_blocks, npos) streams the
     pre-gathered entries through VMEM and performs one fused-reduction mixed
     add (kernels/coz.add_z2_1_fused) per position, accumulator pinned in VMEM
     scratch across the position axis; the parity fixup (subtract B for even
     scalars, curve_group.h:214-217) runs masked on the last position.

Scalar domain: k in [1, order-1), as the ladder; degenerate scalars are the
(measure-zero) k whose partial sums collide with a table entry's x line or hit
infinity mid-chain (doc as kernels/window.py). Per-lane scalars, shared base.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ecsimd_tpu.field import GFp
from ecsimd_tpu.kernels.coz import add_z2_1_fused
from ecsimd_tpu.kernels.digits import VGFp
from ecsimd_tpu.specs import DIGIT_BITS, CurveSpec, int_to_digits

DEFAULT_TILE = 2048
LANES = 128
W = 8  # window width in bits; 2^(W-1) signed-odd magnitudes per position
NENT = 1 << W  # table entries per position: d = 2e - (2^W - 1), e in [0, 2^W)


def _npos(nbits: int) -> int:
    assert nbits % W == 0
    return nbits // W


def _batch_inv(zs: list[int], p: int) -> list[int]:
    """Montgomery's trick: n inversions for one pow + 3n mults."""
    pref = [1]
    for z in zs:
        pref.append(pref[-1] * z % p)
    inv = pow(pref[-1], p - 2, p)
    out = [0] * len(zs)
    for i in range(len(zs) - 1, -1, -1):
        out[i] = inv * pref[i] % p
        inv = inv * zs[i] % p
    return out


def _to_internal(v: int, fs) -> int:
    return v % fs.p if fs.reduction == "solinas" else (v << fs.nbits) % fs.p


@functools.cache
def base_tables(curve: CurveSpec, bx: int, by: int):
    """Host-precomputed comb tables for base B = (bx, by).

    Returns (tables, top, negbase):
      tables: (npos, 256, 2*d) int32 — internal-domain digit rows, entry e of
              position i holding affine (x, y) of (2e - 255) * 2^(8i) * B;
      top:    classical affine (x, y) of 2^nbits * B (the recoding's constant
              top digit — the accumulator's initial value);
      negbase: classical affine (x, y) of -B (parity fixup operand).
    """
    from ecsimd_tpu.oracle import window as ow

    fs = curve.field
    p, d = fs.p, fs.ndigits
    npos = _npos(fs.nbits)

    base = (bx, by, 1)
    jacs = []  # (npos, 128) Jacobian odd multiples, magnitude order 1,3,..,255
    for i in range(npos):
        two = ow._jac_dbl(base, curve)
        row = [base]
        for _ in range(NENT // 2 - 1):
            row.append(ow._jac_add(row[-1], two, curve))
        jacs.append(row)
        base = two
        for _ in range(W - 1):  # base *= 2^W total per position
            base = ow._jac_dbl(base, curve)
    top_jac = base  # 2^(8*npos) * B = 2^nbits * B

    flat = [pt for row in jacs for pt in row] + [top_jac]
    zinv = _batch_inv([z for _, _, z in flat], p)
    aff = []
    for (x, y, _), zi in zip(flat, zinv):
        zi2 = zi * zi % p
        aff.append((x * zi2 % p, y * zi2 % p * zi % p))

    tables = np.zeros((npos, NENT, 2 * d), np.int32)
    for i in range(npos):
        for m in range(NENT // 2):  # magnitude 2m+1
            ax, ay = aff[i * (NENT // 2) + m]
            for e, yy in (((NENT - 1 + (2 * m + 1)) // 2, ay),  # +d entry
                          ((NENT - 1 - (2 * m + 1)) // 2, (p - ay) % p)):  # -d
                tables[i, e, :d] = int_to_digits(_to_internal(ax, fs), d)
                tables[i, e, d:] = int_to_digits(_to_internal(yy, fs), d)
    return tables, aff[-1], (bx, (p - by) % p)


def entry_indices(scalars, curve: CurveSpec):
    """(D, B) scalar planes -> (npos, B) table entry indices e_i = w9_i >> 1,
    where w9_i is the 9-bit window k[8i .. 8i+8] (signed-odd recoding with the
    sign/odd-forcing folded into the table layout)."""
    fs = curve.field
    d = fs.ndigits
    idx = []
    for i in range(_npos(fs.nbits)):
        j, off = divmod(W * i, DIGIT_BITS)
        w = lax.shift_right_logical(scalars[j], off)
        if off + W + 1 > DIGIT_BITS:
            nxt = scalars[j + 1] if j + 1 < d else jnp.zeros_like(scalars[j])
            w = w | (nxt << (DIGIT_BITS - off))
        idx.append(lax.shift_right_logical(w & (2 * NENT - 1), 1))
    return jnp.stack(idx)


def gather_entries(tables_f32, idx):
    """One-hot x table matmul gather: (npos, B) indices -> (npos, B, 2d) int32
    internal-domain entry digits. Exact in f32 (one term per output, values
    < 2^16 < 2^24); HIGHEST precision forbids bf16 truncation on the MXU."""
    iot = jnp.arange(NENT, dtype=jnp.int32)
    outs = []
    for i in range(tables_f32.shape[0]):
        oh = (idx[i][:, None] == iot[None, :]).astype(jnp.float32)
        outs.append(
            lax.dot(oh, tables_f32[i], precision=lax.Precision.HIGHEST).astype(jnp.int32)
        )
    return jnp.stack(outs)


def _comb_kernel(
    par_ref, idx_ref, tbl_ref, ax_ref, ay_ref, z_ref, accx_ref, accy_ref, accz_ref,
    *, curve: CurveSpec, npos: int, top, negbase
):
    fs = curve.field
    d = fs.ndigits
    j = pl.program_id(1)

    # In-kernel one-hot x table gather on the MXU: the (NENT, tile) one-hot
    # lives only in VMEM (the host-side XLA formulation materializes ~0.5 GB
    # of one-hot + pre-gathered entry HBM traffic per 16k batch — measured
    # ~35% of kernel runtime). Exact: one product per output, table values
    # < 2^16 < f32's 24-bit mantissa, HIGHEST precision on the MXU.
    s, lanes = idx_ref.shape[2], idx_ref.shape[3]
    idx = idx_ref[0, 0].reshape(1, s * lanes)
    oh = (lax.broadcasted_iota(jnp.int32, (NENT, s * lanes), 0) == idx).astype(jnp.float32)
    ent = lax.dot_general(
        tbl_ref[0], oh, (((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
    ).astype(jnp.int32).reshape(2 * d, s, lanes)
    ex = VGFp([ent[k] for k in range(d)], fs)
    ey = VGFp([ent[d + k] for k in range(d)], fs)

    @pl.when(j == 0)
    def _init():
        # acc = top + T_0[e_0]: the recoding's constant top digit contributes
        # 2^nbits * B, added here against the position-0 entry (z2 = 1).
        tx = ex.const_like(top[0])
        ty = ex.const_like(top[1])
        x3, y3, z3 = add_z2_1_fused(tx, ty, tx.const_like(1), ex, ey)
        for k in range(d):
            accx_ref[k] = x3.digs[k]
            accy_ref[k] = y3.digs[k]
            accz_ref[k] = z3.digs[k]

    @pl.when(j > 0)
    def _step():
        x1 = VGFp([accx_ref[k] for k in range(d)], fs)
        y1 = VGFp([accy_ref[k] for k in range(d)], fs)
        z1 = VGFp([accz_ref[k] for k in range(d)], fs)
        x3, y3, z3 = add_z2_1_fused(x1, y1, z1, ex, ey)
        for k in range(d):
            accx_ref[k] = x3.digs[k]
            accy_ref[k] = y3.digs[k]
            accz_ref[k] = z3.digs[k]

    @pl.when(j == npos - 1)
    def _finish():
        x1 = VGFp([accx_ref[k] for k in range(d)], fs)
        y1 = VGFp([accy_ref[k] for k in range(d)], fs)
        z1 = VGFp([accz_ref[k] for k in range(d)], fs)
        # parity fixup: even k computed (k+1)B; subtract B (curve_group.h:214-217)
        sx, sy, sz = add_z2_1_fused(
            x1, y1, z1, x1.const_like(negbase[0]), x1.const_like(negbase[1])
        )
        meven = 1 - par_ref[0]
        x1 = sx.select(meven, x1)
        y1 = sy.select(meven, y1)
        z1 = sz.select(meven, z1)
        for k in range(d):
            ax_ref[0, k] = x1.digs[k]
            ay_ref[0, k] = y1.digs[k]
            z_ref[0, k] = z1.digs[k]


@functools.partial(
    jax.jit, static_argnames=("curve", "top", "negbase", "tile", "interpret")
)
def comb_mont_planes(
    scalars, tables_f32, curve: CurveSpec, top, negbase,
    tile: int = DEFAULT_TILE, interpret: bool = False,
):
    """Fixed-base comb scalar mult on digit planes.

    scalars: (D, B) classical digit planes; tables_f32: (npos, 256, 2D) f32
    internal-domain tables from base_tables; top/negbase: classical affine int
    pairs (static). Returns Jacobian (ax, ay, z) internal-domain planes.
    """
    fs = curve.field
    assert fs.reduction == "solinas", "comb kernel requires a Solinas field"
    d = fs.ndigits
    npos = _npos(fs.nbits)
    b = scalars.shape[1]
    assert scalars.shape == (d, b)
    assert b % tile == 0, f"batch {b} not a multiple of tile {tile}"
    lanes = min(LANES, tile)
    s = tile // lanes
    assert s * lanes == tile, f"tile {tile} not a multiple of {lanes}"
    nblk = b // tile

    # (npos, B) entry indices + (B,) parity bits; the gather itself runs
    # inside the kernel (one-hot x table on the MXU, VMEM-resident)
    idx = entry_indices(scalars, curve)
    idx_blocks = idx.reshape(npos, nblk, s, lanes).transpose(1, 0, 2, 3)
    par_blocks = (scalars[0] & 1).reshape(nblk, s, lanes)
    # tables as (npos, 2d, NENT) f32 so the per-position block is one row-major
    # (2d, NENT) matmul operand
    tbl_t = tables_f32.transpose(0, 2, 1)

    spec_par = pl.BlockSpec((1, s, lanes), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    spec_idx = pl.BlockSpec((1, 1, s, lanes), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
    spec_tbl = pl.BlockSpec((1, 2 * d, NENT), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((1, d, s, lanes), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((nblk, d, s, lanes), jnp.int32)
    scratch = [pltpu.VMEM((d, s, lanes), jnp.int32) for _ in range(3)]

    ax, ay, z = pl.pallas_call(
        functools.partial(_comb_kernel, curve=curve, npos=npos, top=top, negbase=negbase),
        grid=(nblk, npos),
        in_specs=[spec_par, spec_idx, spec_tbl],
        out_specs=(spec_out, spec_out, spec_out),
        out_shape=(out_shape, out_shape, out_shape),
        scratch_shapes=scratch,
        interpret=interpret,
    )(par_blocks, idx_blocks, tbl_t)

    def from_blocks(a):
        return a.transpose(1, 0, 2, 3).reshape(d, b)

    return from_blocks(ax), from_blocks(ay), from_blocks(z)


@functools.partial(jax.jit, static_argnames=("curve", "top", "negbase"))
def comb_xla_planes(scalars, tables_f32, curve: CurveSpec, top, negbase):
    """XLA-path twin of comb_mont_planes (CPU-testable; the comparison axis
    of benchs/ops_cbn.cpp recast: same algorithm, portable formulation)."""
    from ecsimd_tpu.curves import group

    fs = curve.field
    d = fs.ndigits
    npos = _npos(fs.nbits)
    ent = gather_entries(tables_f32, entry_indices(scalars, curve))  # (npos,B,2d)
    ent = ent.transpose(0, 2, 1)  # (npos, 2d, B) digit planes per position

    like = scalars
    accx = GFp.constant(top[0], fs, like)
    accy = GFp.constant(top[1], fs, like)
    accz = GFp.one(fs, like)

    def body(i, acc):
        ax, ay, az = acc
        e = lax.dynamic_index_in_dim(ent, i, axis=0, keepdims=False)
        x3, y3, z3 = group.add_z2_1(
            GFp.from_mont(ax, fs), GFp.from_mont(ay, fs), GFp.from_mont(az, fs),
            GFp.from_mont(e[:d], fs), GFp.from_mont(e[d:], fs),
        )
        return x3.planes, y3.planes, z3.planes

    planes = lax.fori_loop(0, npos, body, (accx.planes, accy.planes, accz.planes))
    accx, accy, accz = (GFp.from_mont(p_, fs) for p_ in planes)

    sx, sy, sz = group.add_z2_1(
        accx, accy, accz,
        GFp.constant(negbase[0], fs, like), GFp.constant(negbase[1], fs, like),
    )
    meven = 1 - (scalars[0] & 1)
    accx = sx.select(meven, accx)
    accy = sy.select(meven, accy)
    accz = sz.select(meven, accz)
    return accx.planes, accy.planes, accz.planes


def scalar_mult_base(
    scalars, curve: CurveSpec, base: tuple[int, int] | None = None,
    tile: int = DEFAULT_TILE, use_kernel: bool = True, interpret: bool = False,
):
    """k_i * B for a shared base point B (default: the curve generator).

    scalars: (D, B) classical digit planes. Returns a JacobianPoint batch.
    The jit (and table build) specializes per (curve, base).
    """
    from ecsimd_tpu import parallel
    from ecsimd_tpu.curves.point import JacobianPoint

    fs = curve.field
    bx, by = base if base is not None else (curve.gx, curve.gy)
    tables, top, negbase = base_tables(curve, int(bx), int(by))
    tables_f32 = jnp.asarray(tables.astype(np.float32))

    if use_kernel:
        sc, b_true = parallel.pad_batch(scalars, tile)
        ax, ay, z = comb_mont_planes(
            sc, tables_f32, curve, tuple(top), tuple(negbase), tile=tile, interpret=interpret
        )
        ax, ay, z = ax[:, :b_true], ay[:, :b_true], z[:, :b_true]
    else:
        ax, ay, z = comb_xla_planes(scalars, tables_f32, curve, tuple(top), tuple(negbase))
    return JacobianPoint(GFp.from_mont(ax, fs), GFp.from_mont(ay, fs), GFp.from_mont(z, fs), curve)
