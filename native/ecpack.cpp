// Native host-side batch packing: big-endian byte strings <-> int32 digit
// planes (structure-of-arrays, base-2^16 digits, little-endian digit order).
//
// This is the TPU framework's equivalent of the reference's serialization /
// intmem layer (/root/reference/include/ecsimd/serialization.h:12-48,
// intmem.h:146-177): the reference converts big-endian test vectors into
// little-endian limb registers with constexpr byte swaps; here the same
// transform must run at data-pipeline rates over millions of batch elements
// on the host before device transfer, so it is C++ (OpenMP over the batch)
// rather than Python.
//
// Layout contract (matches ecsimd_tpu/convert.py):
//   bytes:  n values, each 2*ndigits bytes, most-significant byte first
//   planes: int32 planes[ndigits][n]; planes[k][j] = digit k (weight 2^16k)
//           of value j, 0 <= digit < 2^16

#include <cstdint>
#include <cstring>

extern "C" {

void ec_bytes_be_to_planes(const uint8_t* in, int32_t* out, int64_t n,
                           int32_t ndigits) {
  const int64_t width = 2 * (int64_t)ndigits;
#pragma omp parallel for schedule(static)
  for (int64_t j = 0; j < n; ++j) {
    const uint8_t* v = in + j * width;
    for (int32_t k = 0; k < ndigits; ++k) {
      // digit k = bytes [width-2k-2, width-2k-1], big-endian within the pair
      const uint8_t hi = v[width - 2 * k - 2];
      const uint8_t lo = v[width - 2 * k - 1];
      out[(int64_t)k * n + j] = (int32_t)(((uint32_t)hi << 8) | lo);
    }
  }
}

void ec_planes_to_bytes_be(const int32_t* in, uint8_t* out, int64_t n,
                           int32_t ndigits) {
  const int64_t width = 2 * (int64_t)ndigits;
#pragma omp parallel for schedule(static)
  for (int64_t j = 0; j < n; ++j) {
    uint8_t* v = out + j * width;
    for (int32_t k = 0; k < ndigits; ++k) {
      const uint32_t d = (uint32_t)in[(int64_t)k * n + j] & 0xFFFFu;
      v[width - 2 * k - 2] = (uint8_t)(d >> 8);
      v[width - 2 * k - 1] = (uint8_t)(d & 0xFF);
    }
  }
}

// 64-bit little-endian limb arrays (e.g. from GMP export) -> planes.
void ec_u64le_to_planes(const uint64_t* in, int32_t* out, int64_t n,
                        int32_t ndigits) {
  const int32_t nlimbs = ndigits / 4;
#pragma omp parallel for schedule(static)
  for (int64_t j = 0; j < n; ++j) {
    const uint64_t* v = in + j * nlimbs;
    for (int32_t l = 0; l < nlimbs; ++l) {
      const uint64_t w = v[l];
      for (int32_t h = 0; h < 4; ++h) {
        out[(int64_t)(4 * l + h) * n + j] = (int32_t)((w >> (16 * h)) & 0xFFFFu);
      }
    }
  }
}

}  // extern "C"
