"""Kernel-side fused point formulas over VGFp digit lists.

Each output coordinate of every formula here is produced by ONE fused Solinas
reduction of its full polynomial (kernels/digits.reduce_combo): raw product
grids and already-reduced values enter a single signed column combination, so
the per-term reductions and trailing mod_sub chains of the plain formulas
never happen. Bit-identical to the curves/group.py versions (same algebra
mod p); Montgomery-reduction fields fall back to those at the call sites.

Formulas: co-Z ZDAU (curve_group.h:120-153), mixed add ADD_Z2_1
(curve_group.h:155-179), plain Jacobian double dbl-2001-b for a = -3 and
general Jacobian add (window/comb fast paths; no reference counterpart).
"""

from __future__ import annotations

from ecsimd_tpu.kernels import digits as dg
from ecsimd_tpu.kernels.digits import VGFp
from ecsimd_tpu.specs import CurveSpec


def _C(fs, *terms):
    return VGFp(dg.reduce_combo(list(terms), fs), fs)


def _gs(v):
    return dg._grid_sqr(v.digs, len(v.digs))


def _gm(a, b):
    return dg._grid(a.digs, b.digs, len(a.digs))


def zdau_fused(x1, y1, x2, y2, z):
    """ZDAU (curve_group.h:120-153): (P, Q) -> (2P+Q, Q') with common z3."""
    fs = x1.fs
    dx = x1 - x2
    cp = dx.sqr()
    w1p = x1 * cp
    w2p = x2 * cp
    dy = y1 - y2
    g_dy = _gs(dy)  # raw grid of dp = dy^2, shared by two combos
    a1p = y1 * (w1p - w2p)
    x3pc = _C(fs, (g_dy, 1), (w1p.digs, -1), (w2p.digs, -1))
    c = (x3pc - w1p).sqr()
    a1p2 = a1p.double()
    y3p = _C(fs, (_gs(dy + (w1p - x3pc)), 1), (g_dy, -1), (c.digs, -1), (a1p2.digs, -1))
    w1 = x3pc.mul_scaled(c, 4)
    w2 = w1p.mul_scaled(c, 4)
    t_minus = y3p - a1p2
    a1 = y3p * (w1 - w2)
    x3 = _C(fs, (_gs(t_minus), 1), (w1.digs, -1), (w2.digs, -1))
    y3 = _C(fs, (_gm(t_minus, w1 - x3), 1), (a1.digs, -1))
    z3 = z * _C(fs, (_gs(dx + (x3pc - w1p)), 1), (cp.digs, -1), (c.digs, -1))
    t_plus = y3p + a1p2
    xq = _C(fs, (_gs(t_plus), 1), (w1.digs, -1), (w2.digs, -1))
    yq = _C(fs, (_gm(t_plus, w1 - xq), 1), (a1.digs, -1))
    return x3, y3, xq, yq, z3


def add_z2_1_fused(x1, y1, z1, x2, y2):
    """Mixed add with Z2 == 1 (curve_group.h:155-179). Returns (x3, y3, z3)."""
    fs = x1.fs
    z1z1 = z1.sqr()
    u2 = x2 * z1z1
    s2 = y2 * z1 * z1z1
    h = u2 - x1
    hh = h.sqr()
    j = h.mul_scaled(hh, 4)
    r = (s2 - y1).double()
    v = x1.mul_scaled(hh, 4)
    x3 = _C(fs, (_gs(r), 1), (j.digs, -1), (v.digs, -2))
    y3 = _C(fs, (_gm(r, v - x3), 1), (_gm(y1, j), -2))
    z3 = _C(fs, (_gs(z1 + h), 1), (z1z1.digs, -1), (hh.digs, -1))
    return x3, y3, z3


def aff_add_fused(x1, y1, x2, y2):
    """Affine + affine -> Jacobian (z1 = z2 = 1 mixed add, 4M+2S):
    H = x2-x1, r = y2-y1, X3 = r^2 - H^3 - 2 x1 H^2,
    Y3 = r (x1 H^2 - X3) - y1 H^3, Z3 = H. Each output one fused reduction.
    Degenerate when x1 == x2 (H = 0). No reference counterpart (the comb
    tree's first level; the reference has no fixed-base path)."""
    fs = x1.fs
    h = x2 - x1
    r = y2 - y1
    hh = h.sqr()
    hhh = h * hh
    v = x1 * hh
    x3 = _C(fs, (_gs(r), 1), (hhh.digs, -1), (v.digs, -2))
    y3 = _C(fs, (_gm(r, v - x3), 1), (_gm(y1, hhh), -1))
    return x3, y3, h


def aff_add_generic(x1, y1, x2, y2):
    """aff_add_fused's algebra with per-op reductions (Montgomery fields)."""
    h = x2 - x1
    r = y2 - y1
    hh = h.sqr()
    hhh = h * hh
    v = x1 * hh
    x3 = r.sqr() - hhh - v.double()
    y3 = r * (v - x3) - y1 * hhh
    return x3, y3, h


def aff_add_any(x1, y1, x2, y2, curve: CurveSpec):
    """aff_add with reduction-strategy dispatch (fused for plain-domain
    solinas/crandall fields)."""
    if curve.field.plain:
        return aff_add_fused(x1, y1, x2, y2)
    return aff_add_generic(x1, y1, x2, y2)


def jac_dbl(x1, y1, z1, curve: CurveSpec):
    """dbl-2001-b for a = -3 (3M+5S), the 3x/4x/8x factors fused into the
    Solinas reduction; each output is one fused reduction."""
    fs = x1.fs
    delta = z1.sqr()
    gamma = y1.sqr()
    beta4 = x1.mul_scaled(gamma, 4)
    alpha = (x1 - delta).mul_scaled(x1 + delta, 3)
    x3 = _C(fs, (_gs(alpha), 1), (beta4.digs, -2))
    z3 = _C(fs, (_gs(y1 + z1), 1), (gamma.digs, -1), (delta.digs, -1))
    y3 = _C(fs, (_gm(alpha, beta4 - x3), 1), (_gs(gamma), -8))
    return x3, y3, z3


def jac_dbl_generic(x1, y1, z1, curve: CurveSpec):
    """dbl-2001-b with per-op reductions — same algebra as jac_dbl for
    Montgomery-reduction fields, whose t < R*p contract forbids the fused
    multi-term Solinas combos."""
    assert curve.a == curve.field.p - 3, f"{curve.name}: dbl-2001-b requires a = -3"
    delta = z1.sqr()
    gamma = y1.sqr()
    beta4 = (x1 * gamma).double().double()
    t = (x1 - delta) * (x1 + delta)
    alpha = t.double() + t
    x3 = alpha.sqr() - beta4.double()
    z3 = (y1 + z1).sqr() - gamma - delta
    y3 = alpha * (beta4 - x3) - gamma.sqr().double().double().double()
    return x3, y3, z3


def jac_add_generic(x1, y1, z1, x2, y2, z2, with_hr: bool = False):
    """General Jacobian add with per-op reductions (Montgomery fields)."""
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
    if with_hr:
        return x3, y3, z3, h, r
    return x3, y3, z3


def jac_dbl_general_a(x1, y1, z1, curve: CurveSpec):
    """Jacobian doubling for ANY a (dbl-2007-bl shape, per-op reductions):
    M = 3*X^2 + a*ZZ^2. One mul + one sqr dearer than the a = -3 form; used
    for curves outside the reference's wst_curve_am3 concept (e.g.
    secp256k1's a = 0, where the a term drops entirely)."""
    fs = x1.fs
    xx = x1.sqr()
    yy = y1.sqr()
    yyyy = yy.sqr()
    zz = z1.sqr()
    s = ((x1 + yy).sqr() - xx - yyyy).double()
    m = xx.double() + xx
    if curve.a % fs.p != 0:
        m = m + zz.sqr() * x1.const_like(curve.a)
    t = m.sqr() - s.double()
    y3 = m * (s - t) - yyyy.double().double().double()
    z3 = (y1 + z1).sqr() - yy - zz
    return t, y3, z3


def dbl_any(x1, y1, z1, curve: CurveSpec):
    """jac_dbl with reduction/curve-shape dispatch: fused dbl-2001-b for
    plain-domain (solinas/crandall) a = -3, per-op dbl-2001-b for Montgomery
    a = -3, general-a
    doubling otherwise."""
    am3 = curve.a == curve.field.p - 3
    if not am3:
        return jac_dbl_general_a(x1, y1, z1, curve)
    if curve.field.plain:
        return jac_dbl(x1, y1, z1, curve)
    return jac_dbl_generic(x1, y1, z1, curve)


def add_any(x1, y1, z1, x2, y2, z2, curve: CurveSpec):
    """jac_add with reduction-strategy dispatch (fused for plain-domain
    solinas/crandall fields)."""
    if curve.field.plain:
        return jac_add(x1, y1, z1, x2, y2, z2)
    return jac_add_generic(x1, y1, z1, x2, y2, z2)


def add_z2_1_any(x1, y1, z1, x2, y2, curve: CurveSpec):
    """add_z2_1 with reduction-strategy dispatch (fused for plain-domain; the
    generic path is curves/group.add_z2_1, which duck-types over VGFp)."""
    if curve.field.plain:
        return add_z2_1_fused(x1, y1, z1, x2, y2)
    from ecsimd_tpu.curves import group

    return group.add_z2_1(x1, y1, z1, x2, y2)


def jac_add(x1, y1, z1, x2, y2, z2, with_hr: bool = False):
    """General Jacobian add (11M+5S), x3/y3 as single fused reductions;
    degenerate when the x lines collide. ``with_hr`` additionally returns
    (h, r) for callers that resolve the degeneracy (add_complete_any)."""
    fs = x1.fs
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
    x3 = _C(fs, (_gs(r), 1), (hhh.digs, -1), (v.digs, -2))
    y3 = _C(fs, (_gm(r, v - x3), 1), (_gm(s1, hhh), -1))
    z3 = z1 * z2 * h
    if with_hr:
        return x3, y3, z3, h, r
    return x3, y3, z3


def add_complete_any(x1, y1, z1, x2, y2, z2, curve: CurveSpec):
    """Exception-free general Jacobian add (strict-CT window accumulation):
    masked completion of the h == 0 cases the plain formulas corrupt —

      h == 0, r == 0  (P1 == P2)   -> doubling of P1,
      h == 0, r != 0  (P1 == -P2)  -> infinity (encoded Z == 0),
      Z1 == 0         (P1 == inf)  -> P2,

    all with uniform control flow (per-lane selects); P2 must be finite. The
    reference's ladder never needs this (co-Z invariants exclude the cases,
    curve_group.h:189-218); this closes the window path's measure-zero
    adversarial-scalar class at ~+1 doubling per accumulation add. Doubling
    of infinity stays at infinity through dbl_any (z3 has a factor z1), so a
    flagged lane survives the remaining chain."""
    if curve.field.plain:
        x3, y3, z3, h, r = jac_add(x1, y1, z1, x2, y2, z2, with_hr=True)
    else:
        x3, y3, z3, h, r = jac_add_generic(x1, y1, z1, x2, y2, z2, with_hr=True)
    hz = dg.is_zero(h.digs)
    rz = dg.is_zero(r.digs)
    inf1 = dg.is_zero(z1.digs)
    m_same = hz & rz & ~inf1
    m_opp = hz & ~rz & ~inf1
    xd, yd, zd = dbl_any(x1, y1, z1, curve)
    x3 = xd.select(m_same, x3)
    y3 = yd.select(m_same, y3)
    z3 = zd.select(m_same, z3.select(~m_opp, z3.const_like(0)))
    one = x1.const_like(1)
    x3 = x2.select(inf1, x3)
    y3 = y2.select(inf1, y3)
    z3 = one.select(inf1, z3)
    return x3, y3, z3
