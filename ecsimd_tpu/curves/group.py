"""L5: co-Z Jacobian group law + batched constant-time scalar multiplication.

Co-Z arithmetic after Goundar-Joye-Miyaji eprint 2010/309 (the reference cites
the same paper, ``curve_group.h:61-62``), over GFp digit planes. The ladder is
the reference's masked-swap signed ladder (``curve_group.h:189-218``) recast
for XLA: the 254-step loop is a ``lax.fori_loop`` whose body is branch-free —
per-lane key-bit masks drive ``where``-selects, which is simultaneously the
constant-time discipline and the only control flow TPUs support. Because both
ladder registers share one Z by construction, the state carries a single Z
plane (the reference encodes this as swap_if_same_z, ``swap.h:47-56``).

These functions are pure jnp on plane arrays, so the identical code path runs
under jit (XLA path) and inside the fused Pallas ladder kernel (kernels/).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ecsimd_tpu.field import GFp, gfp_swap_if
from ecsimd_tpu.curves.point import AffinePoint, JacobianPoint
from ecsimd_tpu.ops import bignum as bn
from ecsimd_tpu.specs import DIGIT_BITS, CurveSpec


def _curve_consts(curve: CurveSpec, like):
    """Internal-domain curve constants a, b baked in at trace time (the
    analogue of curve_group.h:31-32's constexpr Am/Bm). ``like`` is any field
    element of the right batch type (GFp or kernel-side VGFp)."""
    return like.const_like(curve.a), like.const_like(curve.b)


# --- co-Z primitive steps ------------------------------------------------------
# Each returns coordinate GFp's; the two output points share one Z.


def dblu(x1: GFp, y1: GFp, curve: CurveSpec):
    """Initial co-Z doubling, Z==1 assumed (curve_group.h:64-87).

    Returns (x2p, y2p, xu, yu, z): 2P and re-represented P with common z.
    """
    am, _ = _curve_consts(curve, x1)
    b = x1.sqr()
    e = y1.sqr()
    l = e.sqr()
    s = ((x1 + e).sqr() - b - l).double()
    m = b.double() + b + am
    x2p = m.sqr() - s.double()
    l8 = l.shift_left(3)
    y2p = m * (s - x2p) - l8
    z = y1.double()
    return x2p, y2p, s, l8, z


def zaddu(x1: GFp, y1: GFp, x2: GFp, y2: GFp, z: GFp):
    """Co-Z addition with update (curve_group.h:91-116).

    (P, Q) with common z -> (P+Q, P') with common z3. Returns
    (x3, y3, xu, yu, z3).
    """
    c = (x1 - x2).sqr()
    w1 = x1 * c
    w2 = x2 * c
    d = (y1 - y2).sqr()
    a1 = y1 * (w1 - w2)
    x3 = d - w1 - w2
    y3 = (y1 - y2) * (w1 - x3) - a1
    z3 = z * (x1 - x2)
    return x3, y3, w1, a1, z3


def zdau(x1: GFp, y1: GFp, x2: GFp, y2: GFp, z: GFp):
    """Co-Z double-add with update (curve_group.h:120-153).

    (P, Q) with common z -> (2P+Q, Q') with common z3. Returns
    (x3, y3, xq, yq, z3). ~9 mul + 7 sqr — the ladder's per-bit cost.
    """
    cp = (x1 - x2).sqr()
    w1p = x1 * cp
    w2p = x2 * cp
    dp = (y1 - y2).sqr()
    a1p = y1 * (w1p - w2p)
    x3pc = dp - w1p - w2p
    c = (x3pc - w1p).sqr()
    a1p2 = a1p.double()
    y3p = ((y1 - y2) + (w1p - x3pc)).sqr() - dp - c - a1p2
    w1 = x3pc.mul_scaled(c, 4)  # 4*x3pc*c fused (was shift_left(2) then mul)
    w2 = w1p.mul_scaled(c, 4)
    t_minus = y3p - a1p2
    d = t_minus.sqr()
    a1 = y3p * (w1 - w2)
    x3 = d - w1 - w2
    y3 = t_minus * (w1 - x3) - a1
    z3 = z * ((x1 - x2 + x3pc - w1p).sqr() - cp - c)
    t_plus = y3p + a1p2
    dc = t_plus.sqr()
    xq = dc - w1 - w2
    yq = t_plus * (w1 - xq) - a1
    return x3, y3, xq, yq, z3


def add_z2_1(x1: GFp, y1: GFp, z1: GFp, x2: GFp, y2: GFp):
    """Mixed add with Z2 == 1 (curve_group.h:155-179). Returns (x3, y3, z3)."""
    z1z1 = z1.sqr()
    u2 = x2 * z1z1
    s2 = y2 * z1 * z1z1
    h = u2 - x1
    hh = h.sqr()
    j = h.mul_scaled(hh, 4)  # h * (4*hh), i = 4*hh fused
    r = (s2 - y1).double()
    v = x1.mul_scaled(hh, 4)
    x3 = r.sqr() - j - v.double()
    y3 = r * (v - x3) - y1.mul_scaled(j, 2)
    z3 = (z1 + h).sqr() - z1z1 - hh
    return x3, y3, z3


def tplu(x1: GFp, y1: GFp, curve: CurveSpec):
    """Co-Z tripling: (3P, P') with common z (curve_group.h:183-186)."""
    x2p, y2p, xu, yu, z = dblu(x1, y1, curve)
    return zaddu(xu, yu, x2p, y2p, z)


def jac_dbl(x1: GFp, y1: GFp, z1: GFp, curve: CurveSpec):
    """General-a Jacobian doubling (dbl-2007-bl shape; XLA-dialect twin of
    oracle/window._jac_dbl). No reference counterpart — the reference's co-Z
    ladder never doubles a free-standing Jacobian point; needed here by the
    complete add. Doubling of infinity stays at infinity (z3 carries a
    factor of z1 through (y1+z1)^2 - yy - zz = 2*y1*z1)."""
    a, _ = _curve_consts(curve, x1)
    xx = x1.sqr()
    yy = y1.sqr()
    yyyy = yy.sqr()
    zz = z1.sqr()
    s = ((x1 + yy).sqr() - xx - yyyy).double()
    m = xx + xx.double() + a * zz.sqr()
    x3 = m.sqr() - s.double()
    y3 = m * (s - x3) - yyyy.shift_left(3)
    z3 = (y1 + z1).sqr() - yy - zz
    return x3, y3, z3


def jac_add_complete(p1: JacobianPoint, p2: JacobianPoint) -> JacobianPoint:
    """Exception-free general Jacobian add, XLA dialect (GFp twin of
    kernels/coz.add_complete_any — same masked completion):

      h == 0, r == 0  (P1 == P2)   -> doubling of P1,
      h == 0, r != 0  (P1 == -P2)  -> infinity (Z == 0),
      Z1 == 0         (P1 == inf)  -> P2,
      Z2 == 0         (P2 == inf)  -> P1,

    uniform control flow throughout (per-lane selects). Used by the ECDSA
    verification epilogue (u1*G + u2*Q), where P1 == +-P2 and either operand
    at infinity are adversarially reachable."""
    curve = p1.curve
    x1, y1, z1 = p1.x, p1.y, p1.z
    x2, y2, z2 = p2.x, p2.y, p2.z
    # add-2007-bl on GFp (mirrors kernels/coz.jac_add, unfused XLA arithmetic)
    z1z1 = z1.sqr()
    z2z2 = z2.sqr()
    u1 = x1 * z2z2
    u2 = x2 * z1z1
    s1 = y1 * z2z2 * z2
    s2 = y2 * z1z1 * z1
    h = u2 - u1
    r = s2 - s1
    hh = h.sqr()
    hhh = h * hh
    v = u1 * hh
    x3 = r.sqr() - hhh - v.double()
    y3 = r * (v - x3) - s1 * hhh
    z3 = z1 * z2 * h
    hz = h.is_zero()
    rz = r.is_zero()
    inf1 = z1.is_zero()
    inf2 = z2.is_zero()
    m_same = hz & rz & (1 - inf1) & (1 - inf2)
    m_opp = hz & (1 - rz) & (1 - inf1) & (1 - inf2)
    xd, yd, zd = jac_dbl(x1, y1, z1, curve)
    x3 = xd.select(m_same, x3)
    y3 = yd.select(m_same, y3)
    z3 = zd.select(m_same, z3.select(1 - m_opp, z3.const_like(0)))
    x3 = x2.select(inf1, x1.select(inf2, x3))
    y3 = y2.select(inf1, y1.select(inf2, y3))
    z3 = z2.select(inf1, z1.select(inf2, z3))
    return JacobianPoint(x3, y3, z3, curve)


# --- point-level wrappers (for tests / API parity) -------------------------------


def point_dblu(pt: JacobianPoint):
    x2p, y2p, xu, yu, z = dblu(pt.x, pt.y, pt.curve)
    return (
        JacobianPoint(x2p, y2p, z, pt.curve),
        JacobianPoint(xu, yu, z, pt.curve),
    )


def point_zaddu(p: JacobianPoint, q: JacobianPoint):
    x3, y3, xu, yu, z3 = zaddu(p.x, p.y, q.x, q.y, p.z)
    return (
        JacobianPoint(x3, y3, z3, p.curve),
        JacobianPoint(xu, yu, z3, p.curve),
    )


def point_zdau(p: JacobianPoint, q: JacobianPoint):
    x3, y3, xq, yq, z3 = zdau(p.x, p.y, q.x, q.y, p.z)
    return (
        JacobianPoint(x3, y3, z3, p.curve),
        JacobianPoint(xq, yq, z3, p.curve),
    )


def point_tplu(pt: JacobianPoint):
    x3, y3, xu, yu, z = tplu(pt.x, pt.y, pt.curve)
    return (
        JacobianPoint(x3, y3, z, pt.curve),
        JacobianPoint(xu, yu, z, pt.curve),
    )


def point_add_z2_1(a: JacobianPoint, b: JacobianPoint):
    x3, y3, z3 = add_z2_1(a.x, a.y, a.z, b.x, b.y)
    return JacobianPoint(x3, y3, z3, a.curve)


# --- point decompression (curve_point_ops.h:12-22, curve_group.h:43-58) ----------


def compute_y(x: GFp, curve: CurveSpec):
    """Solve y^2 = x^3 - 3x + b. Returns (y, ok_mask) per lane."""
    am, bm = _curve_consts(curve, x)
    rhs = x.sqr() * x + am * x + bm
    return rhs.sqrt()


def affine_from_x(x_planes, curve: CurveSpec):
    """Decompress a batch of x coordinates (wide_curve_point::from_x)."""
    x = GFp.from_classical(x_planes, curve.field)
    y, ok = compute_y(x, curve)
    return AffinePoint(x_planes, y.to_classical(), curve), ok


# --- the ladder -------------------------------------------------------------------


def _bit_at(scalars, i):
    """Per-lane mask = bit i (traced index) of each lane's scalar."""
    digit = lax.div(i, DIGIT_BITS)
    off = lax.rem(i, DIGIT_BITS)
    plane = lax.dynamic_index_in_dim(scalars, digit, axis=0, keepdims=False)
    return lax.shift_right_logical(plane, off) & 1


def scalar_mult(scalars, pt: JacobianPoint, host_loop: bool = False) -> JacobianPoint:
    """Batched constant-time scalar multiplication: k_i * P_i per lane.

    scalars: (D, *batch) classical digit planes; pt: Jacobian batch with z = 1
    (from_affine). The reference's scalar_mult (curve_group.h:189-218):
    force-odd co-Z signed ladder — seed with TRPLU, consume bits 1..nbits-1
    LSB->MSB with masked co-Z swaps around each ZDAU, then subtract P via
    ADD_Z2_1 on even lanes. One fori_loop, uniform control flow, single shared
    Z in the carried state.

    Domain (same exclusions as the reference ladder): k in [1, order-1);
    k = order-1 is even, so the parity fixup computes order*P = infinity and
    the lane degenerates (z = 0) — the Python oracle raises on the same input.

    ``host_loop=True`` replaces the fori_loop with a Python loop around ONE
    jitted ladder step (same compiled step reused for every bit). Use it —
    eagerly, never under an outer jit — where compiling the whole while
    graph is pathological: XLA:CPU's pass pipeline repeatedly clones the
    loop body and its algebraic simplifier hits its circular-rewrite cap on
    the d = 33 P-521 body, exploding past 30 GB of compile RSS; one step
    compiles in seconds. TPU/jit callers keep the default fori_loop.
    """
    curve = pt.curve
    nbits = curve.field.nbits
    fs = curve.field

    opp_y = pt.y.opposite()
    bx, by, ax, ay, z = tplu(pt.x, pt.y, curve)  # base = 3P, acc = P

    m1 = _bit_at(scalars, 1)
    ax, bx = gfp_swap_if(m1, ax, bx)
    ay, by = gfp_swap_if(m1, ay, by)

    def body(i, state):
        ax, ay, bx, by, z = state
        m = _bit_at(scalars, i)
        ax, bx = gfp_swap_if(m, ax, bx)
        ay, by = gfp_swap_if(m, ay, by)
        bx, by, ax, ay, z = zdau(bx, by, ax, ay, z)
        ax, bx = gfp_swap_if(m, ax, bx)
        ay, by = gfp_swap_if(m, ay, by)
        return ax, ay, bx, by, z

    if host_loop:
        import jax

        step = jax.jit(body)
        state = (ax, ay, bx, by, z)
        for i in range(2, nbits):
            state = step(jnp.int32(i), state)
        ax, ay, bx, by, z = state
    else:
        ax, ay, bx, by, z = lax.fori_loop(2, nbits, body, (ax, ay, bx, by, z))

    # parity fixup: even scalars got (k+1)P in acc; subtract P (curve_group.h:214-217)
    sx, sy, sz = add_z2_1(ax, ay, z, pt.x, opp_y)
    meven = 1 - _bit_at(scalars, 0)
    acc = JacobianPoint(ax, ay, z, curve)
    sub = JacobianPoint(sx, sy, sz, curve)
    return sub.select(meven, acc)


def scalar_mult_shared(kbits, pt: JacobianPoint) -> JacobianPoint:
    """One shared scalar times a batch of points.

    The analogue of scalar_mult_1s (curve_group.h:221-251). ``kbits`` is an
    (nbits,) int32 LSB-first bit vector — a *traced* argument, so one compiled
    ladder serves every scalar (the reference's host-scalar bit indexing
    becomes a 1-element load broadcast to the batch, instead of per-lane bit
    extraction from (D, batch) planes)."""
    curve = pt.curve
    nbits = curve.field.nbits

    opp_y = pt.y.opposite()
    bx, by, ax, ay, z = tplu(pt.x, pt.y, curve)

    def bit(i):
        return jnp.broadcast_to(kbits[i], ax.planes.shape[1:])

    m1 = bit(1)
    ax, bx = gfp_swap_if(m1, ax, bx)
    ay, by = gfp_swap_if(m1, ay, by)

    def body(i, state):
        ax, ay, bx, by, z = state
        m = jnp.broadcast_to(kbits[i], ax.planes.shape[1:])
        ax, bx = gfp_swap_if(m, ax, bx)
        ay, by = gfp_swap_if(m, ay, by)
        bx, by, ax, ay, z = zdau(bx, by, ax, ay, z)
        ax, bx = gfp_swap_if(m, ax, bx)
        ay, by = gfp_swap_if(m, ay, by)
        return ax, ay, bx, by, z

    ax, ay, bx, by, z = lax.fori_loop(2, nbits, body, (ax, ay, bx, by, z))

    # parity fixup for even scalars, masked on bit 0 (curve_group.h:248-250)
    sx, sy, sz = add_z2_1(ax, ay, z, pt.x, opp_y)
    meven = 1 - bit(0)
    acc = JacobianPoint(ax, ay, z, curve)
    sub = JacobianPoint(sx, sy, sz, curve)
    return sub.select(meven, acc)


# --- batch reduction (multi-scalar multiplication epilogue) -----------------------


def batch_sum(pt: JacobianPoint) -> JacobianPoint:
    """Sum a point batch over its batch axis into ONE point (returned as a
    1-lane batch) — the reduction half of multi-scalar multiplication.

    Balanced pairwise tree: each level adds the two halves of the batch with
    the exception-free complete add (jac_add_complete), odd tails carried to
    the next level — log2(B) levels, ~B total adds, uniform control flow.
    Any lane (and the result) may be the point at infinity (Z == 0): with
    per-lane scalar multiples as inputs, equal/opposite partial sums are
    adversarially reachable, so the plain formulas would be wrong here.
    No reference counterpart (its 4 lanes never communicate); the TPU cost
    is one halving add-chain — ~2x one lane's field ops, amortized over the
    whole batch (<0.1% of the scalar-mult work at B >= 2^11)."""
    curve = pt.curve
    fs = curve.field
    x, y, z = pt.x.planes, pt.y.planes, pt.z.planes
    assert x.ndim == 2, "batch_sum expects flat (D, B) planes"

    def jac(xp, yp, zp):
        return JacobianPoint(
            GFp.from_mont(xp, fs), GFp.from_mont(yp, fs), GFp.from_mont(zp, fs), curve
        )

    import jax.numpy as jnp

    while x.shape[1] > 1:
        n = x.shape[1]
        h = n // 2
        res = jac_add_complete(
            jac(x[:, :h], y[:, :h], z[:, :h]),
            jac(x[:, h:2 * h], y[:, h:2 * h], z[:, h:2 * h]),
        )
        x, y, z = res.x.planes, res.y.planes, res.z.planes
        if n % 2:
            x = jnp.concatenate([x, pt.x.planes[:, n - 1:n]], axis=1)
            y = jnp.concatenate([y, pt.y.planes[:, n - 1:n]], axis=1)
            z = jnp.concatenate([z, pt.z.planes[:, n - 1:n]], axis=1)
        pt = jac(x, y, z)
    return jac(x, y, z)
