"""Serialization tests (serialization.h:12-48 parity) incl. the native packer."""

import numpy as np
import pytest

from ecsimd_tpu import convert


def test_bytes_be_roundtrip(rng):
    vals = [0, 1, (1 << 256) - 1] + [rng.randrange(1 << 256) for _ in range(29)]
    data = b"".join(v.to_bytes(32, "big") for v in vals)
    planes = convert.bytes_be_to_planes(data, 16)
    assert convert.planes_to_ints(planes) == vals
    assert convert.planes_to_bytes_be(planes) == data


def test_native_matches_numpy(rng):
    if convert._NATIVE is None:
        pytest.skip("native packer not built (make -C native)")
    vals = [rng.randrange(1 << 384) for _ in range(17)]
    data = b"".join(v.to_bytes(48, "big") for v in vals)
    native = convert.bytes_be_to_planes(data, 24)
    saved, convert._NATIVE = convert._NATIVE, None
    try:
        fallback = convert.bytes_be_to_planes(data, 24)
        assert (native == fallback).all()
        assert convert.planes_to_bytes_be(fallback) == data
    finally:
        convert._NATIVE = saved
    assert convert.planes_to_bytes_be(native) == data


def test_u64le_to_planes_roundtrip(rng):
    """GMP-export-shaped (B, nlimbs) u64 limbs -> planes, native vs NumPy
    fallback vs Python ints (intmem.h:146-177 load shape)."""
    vals = [0, 1, (1 << 256) - 1] + [rng.randrange(1 << 256) for _ in range(13)]
    limbs = np.array(
        [[(v >> (64 * l)) & ((1 << 64) - 1) for l in range(4)] for v in vals],
        dtype=np.uint64,
    )
    planes = convert.u64le_to_planes(limbs)
    assert planes.shape == (16, len(vals)) and planes.dtype == np.int32
    assert convert.planes_to_ints(planes) == vals
    saved, convert._NATIVE = convert._NATIVE, None
    try:
        assert (convert.u64le_to_planes(limbs) == planes).all()
    finally:
        convert._NATIVE = saved
