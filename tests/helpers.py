"""Shared test helpers."""

import numpy as np

from ecsimd_tpu import api, convert
from ecsimd_tpu.curves import group
from ecsimd_tpu.curves.point import JacobianPoint


def ladder_xy_host(ks, curve):
    """k_i * G through the XLA co-Z ladder with a jitted SINGLE step and a
    host-side affine conversion — the api.scalar_mult equivalent for curves
    whose full-width while-graph jit is pathological on XLA:CPU (P-521,
    Wei25519: the pass pipeline's loop-body cloning explodes compile RSS and
    the resulting cached executables segfault jaxlib on reread — CLAUDE.md).
    Returns [(x, y)] ints. Plain-domain (solinas/crandall) fields only."""
    assert curve.field.plain
    g = api.generator_batch(curve, len(ks))
    jg = JacobianPoint.from_affine(g)
    res = group.scalar_mult(api.scalars_from_ints(ks, curve), jg, host_loop=True)
    p = curve.p
    out = []
    for X, Y, Z in zip(convert.planes_to_ints(np.asarray(res.x.to_classical())),
                       convert.planes_to_ints(np.asarray(res.y.to_classical())),
                       convert.planes_to_ints(np.asarray(res.z.to_classical()))):
        zi = pow(Z, p - 2, p)
        out.append((X * zi * zi % p, Y * zi * zi * zi % p))
    return out
