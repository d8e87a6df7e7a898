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
     and +-sign are absorbed into the table layout — no in-kernel negation;
     the recoding's constant top digit is folded into the position-0 table).
  2. gather (inside the kernel): per-lane one-hot(e) x shared table as an f32
     matmul on the MXU — exact because one-hot rows select a single <= 16-bit
     value (f32 has a 24-bit mantissa, HIGHEST precision) — the one-hot lives
     only in VMEM (an XLA-side gather costs ~0.5 GB of HBM traffic per 16k
     batch, measured ~35% of runtime).
  3. sum: one fused-reduction mixed add (kernels/coz.add_z2_1_fused) per
     position — chain="serial" walks positions along a grid axis with the
     accumulator in VMEM scratch (unroll positions per step); chain="tree"
     sums all positions with a batched balanced pairwise tree in a single
     grid step (see _comb_kernel_tree). The parity fixup (subtract B for
     even scalars, curve_group.h:214-217) runs masked at the end.

Scalar domain: k in [1, order-1), as the ladder; degenerate scalars are the
(measure-zero) k whose partial sums (prefix sums for serial, subset sums for
tree) collide with a table entry's x line or hit infinity mid-chain (doc as
kernels/window.py). Per-lane scalars, shared base.
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
from ecsimd_tpu.kernels.coz import add_any, add_complete_any, add_z2_1_any, aff_add_any
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
    return v % fs.p if fs.plain else (v << fs.nbits) % fs.p


@functools.cache
def _device_tables(curve: CurveSpec, bx: int, by: int):
    """base_tables as a device f32 array, uploaded once per (curve, base).

    ensure_compile_time_eval: the first call may happen inside a jit trace
    (e.g. a timing wrapper jitted around scalar_mult_base_sharded) — without
    it the cache would capture a tracer and poison every later caller."""
    tables, negbase = base_tables(curve, bx, by)
    with jax.ensure_compile_time_eval():
        dev = jnp.asarray(tables.astype(np.float32))
    return dev, negbase


@functools.cache
def _device_tables8(curve: CurveSpec, bx: int, by: int, dtype=jnp.int8):
    """base_tables split into 8-bit half-digits (npos, NENT, 4D): row byte
    2k = digit k & 0xFF, 2k+1 = digit k >> 8. Both narrow dtypes hold
    integers < 256 exactly, so the one-hot gather matmul stays exact while
    halving the table VMEM traffic vs f32 (ent_bits=8 in comb_mont_planes);
    int8 additionally targets the MXU's native s8xs8->s32 path."""
    tables, negbase = base_tables(curve, bx, by)
    t8 = np.empty(tables.shape[:2] + (2 * tables.shape[2],), np.int32)
    t8[..., 0::2] = tables & 0xFF
    t8[..., 1::2] = (tables >> 8) & 0xFF
    if dtype == jnp.int8:
        t8 = t8 - 128  # bias into s8 range [-128, 127]; kernel adds it back
    with jax.ensure_compile_time_eval():
        dev = jnp.asarray(t8).astype(dtype)
    return dev, negbase


@functools.cache
def base_tables(curve: CurveSpec, bx: int, by: int):
    """Host-precomputed comb tables for base B = (bx, by).

    Returns (tables, negbase):
      tables: (npos, 256, 2*d) int32 — internal-domain digit rows, entry e of
              position i >= 1 holding affine (x, y) of (2e - 255) * 2^(8i) * B;
              position 0 additionally folds in the recoding's constant top
              digit: entry e holds affine of (2^nbits + (2e - 255)) * B, so
              the accumulator seeds directly from the position-0 gather
              (z = 1) and the kernel chain is one add per position with no
              special init step;
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

    # position 0: signed entries with top folded in, (2^nbits +- (2m+1)) * B
    # (never infinity/degenerate: |2^nbits mod order| >> 255 for any real
    # curve — the top digit and a window digit cannot cancel)
    pos0 = []
    for m in range(NENT // 2):
        x, y, z = jacs[0][m]
        pos0.append(ow._jac_add(top_jac, (x, y, z), curve))
        pos0.append(ow._jac_add(top_jac, (x, (p - y) % p, z), curve))

    flat = [pt for row in jacs[1:] for pt in row] + pos0
    zinv = _batch_inv([z for _, _, z in flat], p)
    aff = []
    for (x, y, _), zi in zip(flat, zinv):
        zi2 = zi * zi % p
        aff.append((x * zi2 % p, y * zi2 % p * zi % p))

    tables = np.zeros((npos, NENT, 2 * d), np.int32)

    def put(i, e, ax, ay):
        tables[i, e, :d] = int_to_digits(_to_internal(ax, fs), d)
        tables[i, e, d:] = int_to_digits(_to_internal(ay, fs), d)

    for i in range(1, npos):
        for m in range(NENT // 2):  # magnitude 2m+1
            ax, ay = aff[(i - 1) * (NENT // 2) + m]
            put(i, (NENT - 1 + (2 * m + 1)) // 2, ax, ay)  # +d entry
            put(i, (NENT - 1 - (2 * m + 1)) // 2, ax, (p - ay) % p)  # -d
    off = (npos - 1) * (NENT // 2)
    for m in range(NENT // 2):
        px, py = aff[off + 2 * m]  # top + (2m+1) B
        nx, ny = aff[off + 2 * m + 1]  # top - (2m+1) B
        put(0, (NENT - 1 + (2 * m + 1)) // 2, px, py)
        put(0, (NENT - 1 - (2 * m + 1)) // 2, nx, ny)
    tables.setflags(write=False)  # cached + shared by every caller
    return tables, (bx, (p - by) % p)


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
    *, curve: CurveSpec, npos: int, negbase, unroll: int, chains: int = 1,
    strict: bool = False,
):
    """Grid (nblk, npos // (unroll * chains)): each step gathers
    ``unroll * chains`` positions and advances ``chains`` INDEPENDENT
    accumulator chains by ``unroll`` fused mixed adds each; at the last step
    the chains are combined with general Jacobian adds and the parity fixup
    runs. Positions are host-permuted so step j's block holds, for each
    chain c, position c * (npos // chains) + j*unroll .. +unroll-1.

    The body is UNIFORM across steps: the recoding's constant top digit is
    folded into the position-0 table (base_tables), so seeding each
    accumulator is a per-lane select against its first gathered entry at
    j == 0 instead of a separate init formula. The one wasted add at j == 0
    operates on whatever the scratch holds (bounded int32 values, wraparound
    semantics) and its result is discarded by the select.

    Why chains: the single-chain step is latency-bound — ~8-9 us/step
    against ~6.5 us of add work (measured r2), and dependent unrolling
    (unroll > 1) LOSES (r3 A/B: 3.79M/3.02M/2.93M for 1/2/4). Independent
    chains amortize the same per-step fixed cost WITHOUT lengthening the
    dependency path — the c adds in a step have no data dependence and can
    overlap. Scalar-domain caveat: chain-combine adds partial sums, so the
    degenerate class extends to cross-chain collisions (same measure-zero
    family as the tree chain; bench verifies 512 lanes per run)."""
    fs = curve.field
    d = fs.ndigits
    j = pl.program_id(1)
    s, lanes = idx_ref.shape[2], idx_ref.shape[3]
    nsteps = npos // (unroll * chains)

    def gather(u):
        # In-kernel one-hot x table gather on the MXU: the (NENT, tile)
        # one-hot lives only in VMEM (the host-side XLA formulation
        # materializes ~0.5 GB of one-hot + entry HBM traffic per 16k batch,
        # ~35% of runtime). Exact: one product per output — f32 tables hold
        # 16-bit digits (< 2^24 mantissa), bf16 tables hold 8-bit half-digit
        # rows (< 2^8, exact in bf16) recombined below.
        rows = tbl_ref.shape[1]
        idx = idx_ref[0, u].reshape(1, s * lanes)
        iot = lax.broadcasted_iota(jnp.int32, (NENT, s * lanes), 0) == idx
        if tbl_ref.dtype == jnp.int8:
            # native s8 x s8 -> s32 MXU path; table rows are biased by -128
            # on the host to fit s8, the one-hot re-adds it after the matmul
            ent = lax.dot_general(
                tbl_ref[u], iot.astype(jnp.int8), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(rows, s, lanes) + 128
        else:
            # bf16 tables halve the table block's HBM->VMEM DMA per grid
            # step; the matmul itself runs f32 (Mosaic rejects bf16 operands
            # here both with an f32 acc — "Bad lhs type" — and a bf16 acc —
            # "acc must be 32-bit"), so cast in-kernel: exact, entries < 2^8.
            tb = tbl_ref[u].astype(jnp.float32)
            ent = lax.dot_general(
                tb, iot.astype(jnp.float32), (((1,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
            ).astype(jnp.int32).reshape(rows, s, lanes)
        if rows == 4 * d:  # 8-bit half-digit tables: lo | hi << 8
            ent = jnp.stack([ent[2 * k] | (ent[2 * k + 1] << 8) for k in range(2 * d)])
        return (
            VGFp([ent[k] for k in range(d)], fs),
            VGFp([ent[d + k] for k in range(d)], fs),
        )

    first = j == 0
    accs = []
    for c in range(chains):
        x1 = VGFp([accx_ref[c * d + k] for k in range(d)], fs)
        y1 = VGFp([accy_ref[c * d + k] for k in range(d)], fs)
        z1 = VGFp([accz_ref[c * d + k] for k in range(d)], fs)
        for u in range(unroll):
            ex, ey = gather(c * unroll + u)
            if strict:
                # complete accumulation add: totalizes the chain over the
                # prefix-sum degenerate classes (acc == +-entry, acc == inf
                # from an earlier collision) at ~1 extra doubling + selects
                # per position — scalar domain [1, order) like the strict
                # window path (kernels/window.py strict=True)
                x3, y3, z3 = add_complete_any(
                    x1, y1, z1, ex, ey, ex.const_like(1), curve)
            else:
                x3, y3, z3 = add_z2_1_any(x1, y1, z1, ex, ey, curve)
            if u == 0:
                x1 = ex.select(first, x3)
                y1 = ey.select(first, y3)
                z1 = z3.const_like(1).select(first, z3)
            else:
                x1, y1, z1 = x3, y3, z3
        accs.append((x1, y1, z1))
        for k in range(d):
            accx_ref[c * d + k] = x1.digs[k]
            accy_ref[c * d + k] = y1.digs[k]
            accz_ref[c * d + k] = z1.digs[k]

    @pl.when(j == nsteps - 1)
    def _finish():
        # combine the independent chains (general adds; z's differ) ...
        x1, y1, z1 = accs[0]
        for c in range(1, chains):
            x1, y1, z1 = add_any(x1, y1, z1, *accs[c], curve)
        # ... then the parity fixup: even k computed (k+1)B; subtract B
        # (curve_group.h:214-217)
        nbx = x1.const_like(negbase[0])
        nby = x1.const_like(negbase[1])
        if strict:
            # completes k = order - 1 (even): the chain lands on (k+1)B =
            # infinity and the fixup resolves inf + (-B) = -B — one scalar
            # MORE than the plain ladder's domain, as strict window
            sx, sy, sz = add_complete_any(x1, y1, z1, nbx, nby, nbx.const_like(1), curve)
        else:
            sx, sy, sz = add_z2_1_any(x1, y1, z1, nbx, nby, curve)
        meven = 1 - par_ref[0]
        xo = sx.select(meven, x1)
        yo = sy.select(meven, y1)
        zo = sz.select(meven, z1)
        for k in range(d):
            ax_ref[0, k] = xo.digs[k]
            ay_ref[0, k] = yo.digs[k]
            z_ref[0, k] = zo.digs[k]


def _comb_kernel_pipe(
    par_ref, idx0_ref, tbl0_ref, idxn_ref, tbln_ref, ax_ref, ay_ref, z_ref,
    accx_ref, accy_ref, accz_ref, entx_ref, enty_ref,
    *, curve: CurveSpec, npos: int, negbase
):
    """Software-pipelined serial comb: step j ADDS the entry gathered at
    step j-1 (VMEM entry scratch) while GATHERING entry j+1 — the MXU
    one-hot matmul and the VPU add chain are data-independent within a
    step, so the matmul can overlap the add instead of serializing with it
    (the plain serial kernel interleaves gather -> add per position; its
    measured ~78% of the VPU ceiling is consistent with the skinny
    (2D, NENT) x (NENT, tile) gather matmul costing ~2-4 us/position
    serialized against ~6.4 us of add work).

    Schedule: j == 0 seeds the accumulator from entry 0 (top folded,
    pl.when branch) and the uniform body's add consumes uninitialized
    scratch (discarded); steps 1..npos-1 add entries 1..npos-1; the next
    gather's row index is clamped at npos-1 (one wasted gather at the last
    step keeps the body uniform)."""
    fs = curve.field
    d = fs.ndigits
    j = pl.program_id(1)
    s, lanes = idxn_ref.shape[2], idxn_ref.shape[3]

    def gather(idx_ref_, tbl_ref_):
        idx = idx_ref_[0, 0].reshape(1, s * lanes)
        oh = (lax.broadcasted_iota(jnp.int32, (NENT, s * lanes), 0) == idx).astype(jnp.float32)
        ent = lax.dot_general(
            tbl_ref_[0], oh, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
        ).astype(jnp.int32).reshape(2 * d, s, lanes)
        return (
            VGFp([ent[k] for k in range(d)], fs),
            VGFp([ent[d + k] for k in range(d)], fs),
        )

    # 1) previous entry out of scratch (registers) — the add's operand
    exp = VGFp([entx_ref[k] for k in range(d)], fs)
    eyp = VGFp([enty_ref[k] for k in range(d)], fs)
    # 2) next entry: gather + store (independent of the add below)
    exn, eyn = gather(idxn_ref, tbln_ref)
    for k in range(d):
        entx_ref[k] = exn.digs[k]
        enty_ref[k] = eyn.digs[k]
    # 3) accumulate the previous entry (garbage at j == 0, discarded)
    x1 = VGFp([accx_ref[k] for k in range(d)], fs)
    y1 = VGFp([accy_ref[k] for k in range(d)], fs)
    z1 = VGFp([accz_ref[k] for k in range(d)], fs)
    x3, y3, z3 = add_z2_1_any(x1, y1, z1, exp, eyp, curve)
    for k in range(d):
        accx_ref[k] = x3.digs[k]
        accy_ref[k] = y3.digs[k]
        accz_ref[k] = z3.digs[k]

    @pl.when(j == 0)
    def _seed():
        ex0, ey0 = gather(idx0_ref, tbl0_ref)
        one = ex0.const_like(1)
        for k in range(d):
            accx_ref[k] = ex0.digs[k]
            accy_ref[k] = ey0.digs[k]
            accz_ref[k] = one.digs[k]

    @pl.when(j == npos - 1)
    def _finish():
        # parity fixup: even k computed (k+1)B; subtract B (curve_group.h:214-217)
        sx, sy, sz = add_z2_1_any(
            x3, y3, z3, x3.const_like(negbase[0]), x3.const_like(negbase[1]), curve
        )
        meven = 1 - par_ref[0]
        xo = sx.select(meven, x3)
        yo = sy.select(meven, y3)
        zo = sz.select(meven, z3)
        for k in range(d):
            ax_ref[0, k] = xo.digs[k]
            ay_ref[0, k] = yo.digs[k]
            z_ref[0, k] = zo.digs[k]


def _comb_kernel_tree(
    par_ref, idx_ref, tbl_ref, ax_ref, ay_ref, z_ref, *, curve: CurveSpec, npos: int, negbase
):
    """Pairwise-tree comb: one grid step per batch block; the npos gathered
    entries are summed by a balanced binary tree BATCHED over a leading
    point axis — level 1 is one affine+affine add on (npos/2, S, L) digit
    arrays, then log2(npos)-1 general Jacobian adds on halving axes.

    Vs the serial chain: ~same total vreg-ops (aff-aff adds are cheaper than
    the mixed adds they replace, general adds dearer), but every level is a
    single wide op stream — the serial formulation is latency-bound (its
    measured per-step cost is ~2.4x the issue-limited time; the batched
    levels amortize op latencies across the point axis) and pays per-step
    grid overhead 32x. Trace is ~6 formula instantiations, so Mosaic
    compiles this in minutes where a 4x-unrolled serial body takes >25.

    Scalar-domain caveat (documented, measure-zero for random k): the tree
    adds PARTIAL SUBSET SUMS of the comb terms, so the degenerate class is
    scalars where some subset pair collides (equal or opposite x), a
    superset of the serial chain's prefix-sum class; the bench verifies 512
    lanes against the oracle every run."""
    fs = curve.field
    d = fs.ndigits
    s, lanes = idx_ref.shape[2], idx_ref.shape[3]

    ents = []
    for p_ in range(npos):
        idx = idx_ref[0, p_].reshape(1, s * lanes)
        oh = (lax.broadcasted_iota(jnp.int32, (NENT, s * lanes), 0) == idx).astype(jnp.float32)
        ents.append(
            lax.dot_general(
                tbl_ref[p_], oh, (((1,), (0,)), ((), ())),
                precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
            ).astype(jnp.int32).reshape(2 * d, s, lanes)
        )
    exd = [jnp.stack([ents[p_][k] for p_ in range(npos)]) for k in range(d)]
    eyd = [jnp.stack([ents[p_][d + k] for p_ in range(npos)]) for k in range(d)]

    xo, yo, zo = _tree_core(exd, eyd, par_ref[0], curve, negbase)
    for k in range(d):
        ax_ref[0, k] = xo.digs[k]
        ay_ref[0, k] = yo.digs[k]
        z_ref[0, k] = zo.digs[k]


def _tree_core(exd, eyd, par, curve: CurveSpec, negbase):
    """Balanced pairwise-tree sum of gathered comb entries + parity fixup.

    exd/eyd: per-digit arrays with a leading point axis (npos, *batch) —
    affine entries. Shared by the Pallas kernel (VMEM-gathered entries) and
    the eager CPU twin (comb_tree_host_planes). Returns squeezed VGFp."""
    fs = curve.field
    npos = exd[0].shape[0]
    assert npos % 2 == 0
    half = npos // 2
    x, y, z = aff_add_any(
        VGFp([v[:half] for v in exd], fs), VGFp([v[:half] for v in eyd], fs),
        VGFp([v[half:] for v in exd], fs), VGFp([v[half:] for v in eyd], fs),
        curve,
    )
    while x.digs[0].shape[0] > 1:
        n = x.digs[0].shape[0]
        h = n // 2
        x3, y3, z3 = add_any(
            VGFp([v[:h] for v in x.digs], fs), VGFp([v[:h] for v in y.digs], fs),
            VGFp([v[:h] for v in z.digs], fs), VGFp([v[h:2 * h] for v in x.digs], fs),
            VGFp([v[h:2 * h] for v in y.digs], fs), VGFp([v[h:2 * h] for v in z.digs], fs),
            curve,
        )
        if n % 2:
            x3 = VGFp([jnp.concatenate([a, b[2 * h:]]) for a, b in zip(x3.digs, x.digs)], fs)
            y3 = VGFp([jnp.concatenate([a, b[2 * h:]]) for a, b in zip(y3.digs, y.digs)], fs)
            z3 = VGFp([jnp.concatenate([a, b[2 * h:]]) for a, b in zip(z3.digs, z.digs)], fs)
        x, y, z = x3, y3, z3

    x1 = VGFp([v[0] for v in x.digs], fs)
    y1 = VGFp([v[0] for v in y.digs], fs)
    z1 = VGFp([v[0] for v in z.digs], fs)

    # parity fixup: even k computed (k+1)B; subtract B (curve_group.h:214-217)
    sx, sy, sz = add_z2_1_any(
        x1, y1, z1, x1.const_like(negbase[0]), x1.const_like(negbase[1]), curve
    )
    meven = 1 - par
    return sx.select(meven, x1), sy.select(meven, y1), sz.select(meven, z1)


def comb_tree_host_planes(scalars, tables_f32, curve: CurveSpec, negbase):
    """Eager (unjitted) twin of the tree kernel on (D, B) planes: the SAME
    _tree_core on gather_entries output, dispatched op-by-op — XLA:CPU
    cannot compile this program shape in reasonable time (stacked gathers
    feeding deep fused chains), while eager dispatch runs it in seconds.
    Correctness coverage for the tree chain without TPU hardware."""
    fs = curve.field
    d = fs.ndigits
    ent = gather_entries(tables_f32, entry_indices(scalars, curve))  # (npos,B,2d)
    exd = [ent[:, :, k] for k in range(d)]  # (npos, B) digit arrays
    eyd = [ent[:, :, d + k] for k in range(d)]
    xo, yo, zo = _tree_core(exd, eyd, scalars[0] & 1, curve, negbase)
    return jnp.stack(xo.digs), jnp.stack(yo.digs), jnp.stack(zo.digs)


@functools.partial(
    jax.jit,
    static_argnames=(
        "curve", "negbase", "tile", "interpret", "unroll", "chain", "chains", "strict",
    ),
)
def comb_mont_planes(
    scalars, tables_f32, curve: CurveSpec, negbase,
    tile: int = DEFAULT_TILE, interpret: bool = False, unroll: int = 1,
    chain: str = "serial", chains: int = 1, strict: bool = False,
):
    """Fixed-base comb scalar mult on digit planes.

    scalars: (D, B) classical digit planes; tables_f32: (npos, 256, 2D) f32
    internal-domain tables from base_tables (top folded into position 0) —
    or the (npos, 256, 4D) half-digit split from _device_tables8 (int8
    default: biased by -128, gathered on the MXU's native s8xs8->s32 path,
    measured +11% over the f32 gather; bf16 also accepted, measured slower);
    negbase: classical affine int pair (static). Returns Jacobian (ax, ay, z)
    internal-domain planes. chain="serial" accumulates positions one mixed
    add at a time (grid axis, unroll positions per step, ``chains``
    independent accumulators combined at the end — see _comb_kernel);
    chain="tree" sums them by a batched pairwise tree in one grid step per
    block (see _comb_kernel_tree for the latency/domain trade).
    """
    fs = curve.field
    d = fs.ndigits
    npos = _npos(fs.nbits)
    b = scalars.shape[1]
    assert scalars.shape == (d, b)
    assert b % tile == 0, f"batch {b} not a multiple of tile {tile}"
    assert npos % (unroll * chains) == 0, (
        f"npos {npos} not a multiple of unroll*chains {unroll * chains}")
    assert not (strict and (chain != "serial" or chains != 1)), (
        "strict comb: serial single-chain only (tree/pipe/multi-chain keep "
        "the documented measure-zero degenerate class)")
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

    out_shape = jax.ShapeDtypeStruct((nblk, d, s, lanes), jnp.int32)
    if chain == "tree":
        assert tbl_t.shape[1] == 2 * d, "tree chain takes f32 tables only (no ent_bits=8)"
        spec_par = pl.BlockSpec((1, s, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        spec_idx = pl.BlockSpec(
            (1, npos, s, lanes), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        )
        spec_tbl = pl.BlockSpec(
            (npos, 2 * d, NENT), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )
        spec_out = pl.BlockSpec((1, d, s, lanes), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        ax, ay, z = pl.pallas_call(
            functools.partial(_comb_kernel_tree, curve=curve, npos=npos, negbase=negbase),
            grid=(nblk,),
            in_specs=[spec_par, spec_idx, spec_tbl],
            out_specs=(spec_out, spec_out, spec_out),
            out_shape=(out_shape, out_shape, out_shape),
            interpret=interpret,
        )(par_blocks, idx_blocks, tbl_t)
        def from_blocks(a):
            return a.transpose(1, 0, 2, 3).reshape(d, b)
        return from_blocks(ax), from_blocks(ay), from_blocks(z)

    if chain == "pipe":
        assert tbl_t.shape[1] == 2 * d, "pipe chain takes f32 tables only (no ent_bits=8)"
        spec_par = pl.BlockSpec((1, s, lanes), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
        spec_idx0 = pl.BlockSpec(
            (1, 1, s, lanes), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM
        )
        spec_tbl0 = pl.BlockSpec(
            (1, tbl_t.shape[1], NENT), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM
        )
        nxt = lambda j: jnp.minimum(j + 1, npos - 1)  # noqa: E731
        spec_idxn = pl.BlockSpec(
            (1, 1, s, lanes), lambda i, j: (i, nxt(j), 0, 0), memory_space=pltpu.VMEM
        )
        spec_tbln = pl.BlockSpec(
            (1, tbl_t.shape[1], NENT), lambda i, j: (nxt(j), 0, 0), memory_space=pltpu.VMEM
        )
        spec_out = pl.BlockSpec((1, d, s, lanes), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((d, s, lanes), jnp.int32) for _ in range(5)]
        ax, ay, z = pl.pallas_call(
            functools.partial(_comb_kernel_pipe, curve=curve, npos=npos, negbase=negbase),
            grid=(nblk, npos),
            in_specs=[spec_par, spec_idx0, spec_tbl0, spec_idxn, spec_tbln],
            out_specs=(spec_out, spec_out, spec_out),
            out_shape=(out_shape, out_shape, out_shape),
            scratch_shapes=scratch,
            interpret=interpret,
        )(par_blocks, idx_blocks, tbl_t, idx_blocks, tbl_t)

        def from_blocks(a):
            return a.transpose(1, 0, 2, 3).reshape(d, b)

        return from_blocks(ax), from_blocks(ay), from_blocks(z)

    if chains > 1:
        # interleave positions so step j's block row (c*unroll + u) holds
        # chain c's position c*(npos//chains) + j*unroll + u
        per_chain = npos // chains
        perm = [
            c * per_chain + j_ * unroll + u
            for j_ in range(per_chain // unroll)
            for c in range(chains)
            for u in range(unroll)
        ]
        idx_blocks = idx_blocks[:, jnp.asarray(perm)]
        tbl_t = tbl_t[jnp.asarray(perm)]

    g = unroll * chains
    spec_par = pl.BlockSpec((1, s, lanes), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    spec_idx = pl.BlockSpec(
        (1, g, s, lanes), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    spec_tbl = pl.BlockSpec(
        (g, tbl_t.shape[1], NENT), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
    )
    spec_out = pl.BlockSpec((1, d, s, lanes), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((chains * d, s, lanes), jnp.int32) for _ in range(3)]
    ax, ay, z = pl.pallas_call(
        functools.partial(
            _comb_kernel, curve=curve, npos=npos, negbase=negbase, unroll=unroll,
            chains=chains, strict=strict,
        ),
        grid=(nblk, npos // g),
        in_specs=[spec_par, spec_idx, spec_tbl],
        out_specs=(spec_out, spec_out, spec_out),
        out_shape=(out_shape, out_shape, out_shape),
        scratch_shapes=scratch,
        interpret=interpret,
    )(par_blocks, idx_blocks, tbl_t)

    def from_blocks(a):
        return a.transpose(1, 0, 2, 3).reshape(d, b)

    return from_blocks(ax), from_blocks(ay), from_blocks(z)


@functools.partial(jax.jit, static_argnames=("curve", "negbase", "strict"))
def comb_xla_planes(scalars, tables_f32, curve: CurveSpec, negbase, strict: bool = False):
    """XLA-path twin of comb_mont_planes (CPU-testable; the comparison axis
    of benchs/ops_cbn.cpp recast: same algorithm, portable formulation).
    ``strict=True`` accumulates with the complete add (group.jac_add_complete)
    — the twin of the kernel's strict chain, same [1, order) domain."""
    from ecsimd_tpu.curves import group
    from ecsimd_tpu.curves.point import JacobianPoint

    fs = curve.field
    d = fs.ndigits
    npos = _npos(fs.nbits)
    ent = gather_entries(tables_f32, entry_indices(scalars, curve))  # (npos,B,2d)
    ent = ent.transpose(0, 2, 1)  # (npos, 2d, B) digit planes per position

    like = scalars
    # acc seeds from the position-0 entry (top digit folded into the table)
    accx = GFp.from_mont(ent[0, :d], fs)
    accy = GFp.from_mont(ent[0, d:], fs)
    accz = GFp.one(fs, like)

    def body(i, acc):
        ax, ay, az = acc
        e = lax.dynamic_index_in_dim(ent, i, axis=0, keepdims=False)
        a1 = (GFp.from_mont(ax, fs), GFp.from_mont(ay, fs), GFp.from_mont(az, fs))
        ex, ey = GFp.from_mont(e[:d], fs), GFp.from_mont(e[d:], fs)
        if strict:
            res = group.jac_add_complete(
                JacobianPoint(*a1, curve),
                JacobianPoint(ex, ey, GFp.one(fs, like), curve),
            )
            x3, y3, z3 = res.x, res.y, res.z
        else:
            x3, y3, z3 = group.add_z2_1(*a1, ex, ey)
        return x3.planes, y3.planes, z3.planes

    planes = lax.fori_loop(1, npos, body, (accx.planes, accy.planes, accz.planes))
    accx, accy, accz = (GFp.from_mont(p_, fs) for p_ in planes)

    nbx = GFp.constant(negbase[0], fs, like)
    nby = GFp.constant(negbase[1], fs, like)
    if strict:
        res = group.jac_add_complete(
            JacobianPoint(accx, accy, accz, curve),
            JacobianPoint(nbx, nby, GFp.one(fs, like), curve),
        )
        sx, sy, sz = res.x, res.y, res.z
    else:
        sx, sy, sz = group.add_z2_1(accx, accy, accz, nbx, nby)
    meven = 1 - (scalars[0] & 1)
    accx = sx.select(meven, accx)
    accy = sy.select(meven, accy)
    accz = sz.select(meven, accz)
    return accx.planes, accy.planes, accz.planes


def scalar_mult_base(
    scalars, curve: CurveSpec, base: tuple[int, int] | None = None,
    tile: int = DEFAULT_TILE, use_kernel: bool = True, interpret: bool = False,
    unroll: int = 1, chain: str = "serial", chains: int = 1, ent_bits: int = 8,
    strict: bool = False,
):
    """k_i * B for a shared base point B (default: the curve generator).

    scalars: (D, B) classical digit planes. Returns a JacobianPoint batch.
    The jit (and table build) specializes per (curve, base). ent_bits=8
    (default) gathers from int8 half-digit tables on the MXU's native
    s8xs8->s32 path — measured +11% over the f32 gather (ent_bits=16);
    only the serial-chain kernel supports it (pipe/tree and the XLA twin
    take f32 digit-value tables). ``strict=True`` (serial chain / XLA twin
    only) uses complete accumulation adds: total scalar domain [1, order)
    even for adversarially chosen scalars, at ~1 extra doubling per
    position (~2x the plain chain's field ops — still ~4x the window path).
    """
    from ecsimd_tpu import parallel
    from ecsimd_tpu.curves.point import JacobianPoint

    fs = curve.field
    bx, by = base if base is not None else (curve.gx, curve.gy)
    if not use_kernel or chain in ("pipe", "tree"):
        ent_bits = 16  # XLA twin / pipe / tree gather digit-value f32 tables
    dev_tables = _device_tables8 if ent_bits == 8 else _device_tables
    tables_f32, negbase = dev_tables(curve, int(bx), int(by))

    if use_kernel:
        sc, b_true = parallel.pad_batch(scalars, tile)
        # interpret mode runs unjitted: eager dispatch sidesteps XLA:CPU's
        # pathological compile/execute on this program shape (stacks and
        # concats over deep fused chains); the TPU path stays jitted.
        fn = comb_mont_planes.__wrapped__ if interpret else comb_mont_planes
        ax, ay, z = fn(
            sc, tables_f32, curve, tuple(negbase), tile=tile, interpret=interpret,
            unroll=unroll, chain=chain, chains=chains, strict=strict,
        )
        ax, ay, z = ax[:, :b_true], ay[:, :b_true], z[:, :b_true]
    else:
        assert not (strict and chain == "tree"), "strict comb: serial/XLA only"
        twin = comb_tree_host_planes if chain == "tree" else functools.partial(
            comb_xla_planes, strict=strict)
        ax, ay, z = twin(scalars, tables_f32, curve, tuple(negbase))
    return JacobianPoint(GFp.from_mont(ax, fs), GFp.from_mont(ay, fs), GFp.from_mont(z, fs), curve)
