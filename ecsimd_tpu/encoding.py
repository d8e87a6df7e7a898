"""SEC1 point encoding — batched octet-string conversion (wire format).

The reference serializes bignums only (``serialization.h:12-48``,
``bn_from_bytes_BE``/``bn_to_bytes_BE``, big-endian bytes over little-endian
limbs); points travel as raw coordinate pairs in its tests. A usable EC
library needs the standard wire format on top: SEC1 v2 §2.3.3/2.3.4
elliptic-curve-point ↔ octet-string conversion — uncompressed ``04 || X ||
Y`` and compressed ``02/03 || X`` (prefix carries the parity of Y).

Shape: encoding is host-side (bytes are host objects); decoding parses on
host and does the expensive parts batched on device — one `affine_from_x`
decompression over every lane (curve_point_ops.h:12-22's from_x, batched)
plus one SP 800-56A validation pass for lanes that arrived with an explicit
Y. Invalid encodings (bad prefix/length, x >= p, x not on the curve, the
single-byte infinity encoding 0x00) yield ok = 0 with zeroed coordinates —
per-lane masks being the TPU-native form of the reference's any-lane-failure
nullopt (gfp.h:46-54).
"""

from __future__ import annotations

import numpy as np

from ecsimd_tpu import convert
from ecsimd_tpu.curves import group
from ecsimd_tpu.curves.point import AffinePoint
from ecsimd_tpu.field import GFp
from ecsimd_tpu.ops import bignum as bn
from ecsimd_tpu.specs import CurveSpec


def coordinate_bytes(curve: CurveSpec) -> int:
    """SEC1 field-element octet length ceil(log2 p / 8) (66 for P-521)."""
    return (curve.field.p.bit_length() + 7) // 8


def points_to_bytes(points: AffinePoint, compressed: bool = True) -> list[bytes]:
    """Batch of affine points -> SEC1 octet strings (one per lane)."""
    curve = points.curve
    length = coordinate_bytes(curve)
    xs = convert.planes_to_ints(np.asarray(points.x))
    ys = convert.planes_to_ints(np.asarray(points.y))
    if compressed:
        return [bytes([0x02 | (y & 1)]) + x.to_bytes(length, "big") for x, y in zip(xs, ys)]
    return [b"\x04" + x.to_bytes(length, "big") + y.to_bytes(length, "big") for x, y in zip(xs, ys)]


def points_from_bytes(blobs, curve: CurveSpec) -> tuple[AffinePoint, np.ndarray]:
    """SEC1 octet strings -> (AffinePoint batch, (B,) ok mask).

    Accepts mixed compressed/uncompressed entries in one batch. Compressed
    lanes decompress through the batched field square root — any odd prime
    (GFp.sqrt dispatches p = 3 mod 4 / p = 5 mod 8 / Tonelli-Shanks; the
    reference's gfp.h:84 static_assert allows only the first). Uncompressed
    lanes are validated with the SP 800-56A partial public-key checks."""
    from ecsimd_tpu.ecdh import validate_public

    length = coordinate_bytes(curve)
    p = curve.field.p
    d = curve.field.ndigits

    xs, ys, want_odd, is_comp, host_ok = [], [], [], [], []
    for b in blobs:
        x = y = 0
        odd = comp = False
        ok = False
        if len(b) == 1 + length and b[0] in (0x02, 0x03):
            x = int.from_bytes(b[1:], "big")
            odd, comp, ok = b[0] == 0x03, True, x < p
        elif len(b) == 1 + 2 * length and b[0] == 0x04:
            x = int.from_bytes(b[1 : 1 + length], "big")
            y = int.from_bytes(b[1 + length :], "big")
            ok = x < p and y < p
        xs.append(x if x < p else 0)
        ys.append(y if y < p else 0)
        want_odd.append(odd)
        is_comp.append(comp)
        host_ok.append(ok)

    import jax.numpy as jnp

    x_pl = jnp.asarray(convert.ints_to_planes(xs, d))
    y_pl = jnp.asarray(convert.ints_to_planes(ys, d))

    if any(is_comp):
        # one batched decompression for every lane (compressed lanes use it;
        # all-uncompressed batches skip the sqrt chain entirely — also what
        # keeps p = 1 mod 4 curves decodable in uncompressed form)
        dec, sqrt_ok = group.affine_from_x(x_pl, curve)
        # parity select: SEC1 prefix 03 means Y odd. Parity comes from the
        # CLASSICAL planes (dec.y) — the internal domain may be Montgomery,
        # whose residue parity is unrelated to the value's.
        ydec = GFp.from_classical(dec.y, curve.field)
        parity = dec.y[0] & 1
        want = jnp.asarray(np.asarray(want_odd, np.int32))
        y_sel = ydec.select(parity == want, ydec.opposite()).to_classical()
    else:
        y_sel = y_pl
        sqrt_ok = jnp.zeros((x_pl.shape[1],), jnp.int32)

    # uncompressed lanes: explicit-Y validation (on-curve, canonical)
    val = validate_public(x_pl, y_pl, curve)

    comp_m = jnp.asarray(np.asarray(is_comp, np.int32))
    y_out = bn.select(comp_m, y_sel, y_pl)
    ok_dev = jnp.where(comp_m.astype(bool), sqrt_ok.astype(bool), val.astype(bool))
    ok = np.asarray(ok_dev) & np.asarray(host_ok, bool)
    # zero coords on failed lanes so no garbage leaves the decoder
    okm = jnp.asarray(ok.astype(np.int32))
    x_out = bn.select(okm, x_pl, jnp.zeros_like(x_pl))
    y_out = bn.select(okm, y_out, jnp.zeros_like(y_out))
    return AffinePoint(x_out, y_out, curve), ok
