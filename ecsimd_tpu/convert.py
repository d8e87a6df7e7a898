"""Host-side conversion between Python ints / big-endian bytes and digit planes.

The analogue of the reference's serialization layer (``serialization.h:12-48``:
big-endian bytes <-> little-endian limbs) plus the test helpers that broadcast
values into wide lanes (``tests/tests.h:10-14``). Pure NumPy; runs on host.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from ecsimd_tpu.specs import DIGIT_BITS, DIGIT_MASK


def _load_native():
    """Native packing library (native/ecpack.cpp) — the C++ fast path for the
    reference's serialization layer; NumPy fallback when not built."""
    path = os.path.join(os.path.dirname(__file__), "..", "native", "libecpack.so")
    try:
        lib = ctypes.CDLL(os.path.abspath(path))
    except OSError:
        return None
    i8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.ec_bytes_be_to_planes.argtypes = [i8p, i32p, ctypes.c_int64, ctypes.c_int32]
    lib.ec_planes_to_bytes_be.argtypes = [i32p, i8p, ctypes.c_int64, ctypes.c_int32]
    lib.ec_u64le_to_planes.argtypes = [u64p, i32p, ctypes.c_int64, ctypes.c_int32]
    return lib


_NATIVE = _load_native()


def ints_to_planes(values, ndigits: int) -> np.ndarray:
    """Python ints -> (D, B) int32 digit planes (little-endian digits)."""
    values = list(values)
    out = np.zeros((ndigits, len(values)), dtype=np.int32)
    for j, v in enumerate(values):
        v = int(v)
        assert 0 <= v < (1 << (ndigits * DIGIT_BITS)), "value out of range"
        for k in range(ndigits):
            out[k, j] = (v >> (k * DIGIT_BITS)) & DIGIT_MASK
    return out


def planes_to_ints(planes) -> list[int]:
    """(D, B) digit planes -> list of B Python ints."""
    planes = np.asarray(planes)
    d = planes.shape[0]
    flat = planes.reshape(d, -1)
    out = []
    for j in range(flat.shape[1]):
        v = 0
        for k in range(d):
            v |= (int(flat[k, j]) & DIGIT_MASK) << (k * DIGIT_BITS)
        out.append(v)
    return out


def broadcast_int(value: int, ndigits: int, batch: int) -> np.ndarray:
    """One value replicated across the batch (wide_bignum_set1, tests/tests.h:10-14)."""
    return np.repeat(ints_to_planes([value], ndigits), batch, axis=1)


def bytes_be_to_planes(data: bytes, ndigits: int) -> np.ndarray:
    """Big-endian byte strings -> digit planes (bn_from_bytes_BE, serialization.h:12-29).

    ``data`` is the concatenation of B fixed-width big-endian values, each
    ``ndigits * 2`` bytes. Uses the native C++ packer when built.
    """
    width = ndigits * DIGIT_BITS // 8
    assert len(data) % width == 0
    n = len(data) // width
    if _NATIVE is not None and n:
        src = np.frombuffer(data, dtype=np.uint8)
        out = np.empty((ndigits, n), dtype=np.int32)
        _NATIVE.ec_bytes_be_to_planes(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n,
            ndigits,
        )
        return out
    b = np.frombuffer(data, dtype=np.uint8).reshape(-1, width)
    # big-endian bytes -> little-endian 16-bit digits
    hi = b[:, 0::2].astype(np.int32)
    lo = b[:, 1::2].astype(np.int32)
    digits_be = (hi << 8) | lo  # (B, D) most-significant digit first
    return np.ascontiguousarray(digits_be[:, ::-1].T).astype(np.int32)


def u64le_to_planes(limbs) -> np.ndarray:
    """(B, nlimbs) uint64 little-endian limb arrays -> (4*nlimbs, B) planes.

    The GMP-export shape (mpz_export with -1 order / 8-byte words) and the
    layout the reference's intmem fast path consumes (intmem.h:146-177 loads
    64-bit limbs); each u64 limb splits into four base-2^16 digits. Uses the
    native C++ packer (native/ecpack.cpp ec_u64le_to_planes) when built.
    """
    arr = np.ascontiguousarray(limbs, dtype=np.uint64)
    assert arr.ndim == 2, "expected (batch, nlimbs)"
    n, nlimbs = arr.shape
    ndigits = 4 * nlimbs
    if _NATIVE is not None and n:
        out = np.empty((ndigits, n), dtype=np.int32)
        _NATIVE.ec_u64le_to_planes(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n,
            ndigits,
        )
        return out
    # (B, nlimbs) u64 -> (B, 4*nlimbs) u16 little-endian digits -> (D, B)
    digs = arr[:, :, None] >> (np.arange(4, dtype=np.uint64) * np.uint64(16))
    return (digs & np.uint64(0xFFFF)).reshape(n, ndigits).T.astype(np.int32)


def planes_to_bytes_be(planes) -> bytes:
    """Digit planes -> concatenated big-endian bytes (bn_to_bytes_BE, serialization.h:31-48)."""
    arr = np.asarray(planes)
    d, b = arr.shape[0], int(np.prod(arr.shape[1:], initial=1))
    if _NATIVE is not None and b and arr.dtype == np.int32:
        src = np.ascontiguousarray(arr.reshape(d, b))
        out = np.empty(b * d * 2, dtype=np.uint8)
        _NATIVE.ec_planes_to_bytes_be(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            b,
            d,
        )
        return out.tobytes()
    planes = arr.astype(np.int64) & DIGIT_MASK
    digits_be = planes.reshape(d, b)[::-1].T  # (B, D) msd first
    out = np.empty((b, d * 2), dtype=np.uint8)
    out[:, 0::2] = (digits_be >> 8).astype(np.uint8)
    out[:, 1::2] = (digits_be & 0xFF).astype(np.uint8)
    return out.tobytes()
