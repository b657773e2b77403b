// treee-tpu native ingest codec.
//
// The reference decodes LAS point records with a rayon-parallel per-chunk loop
// (treee/src/laz.rs:130-213: i32 * scale + offset in f64, swizzle (x,y,z) ->
// (x, z, -y), recenter, cast f32).  This is the C++ equivalent: one call decodes
// the whole record buffer with std::thread workers over contiguous ranges.
// Python binds via ctypes (treee_tpu/io/native_build.py); numpy remains the
// fallback path.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libtreee_native.so las_decode.cpp -lpthread

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

inline int32_t read_i32le(const uint8_t* p) {
  int32_t v;
  std::memcpy(&v, p, 4);  // little-endian hosts only (matches laz.rs:270 assert)
  return v;
}

void decode_range(const uint8_t* rec, int64_t begin, int64_t end,
                  int32_t point_length, const double* scale,
                  const double* offset, const double* center, float* out) {
  const double sx = scale[0], sy = scale[1], sz = scale[2];
  const double ox = offset[0], oy = offset[1], oz = offset[2];
  const double cx = center[0], cy = center[1], cz = center[2];
  for (int64_t i = begin; i < end; ++i) {
    const uint8_t* p = rec + i * point_length;
    const double x = read_i32le(p + 0) * sx + ox;
    const double y = read_i32le(p + 4) * sy + oy;
    const double z = read_i32le(p + 8) * sz + oz;
    // swizzle to y-up: (x, z, -y), recentered
    out[i * 3 + 0] = static_cast<float>(x - cx);
    out[i * 3 + 1] = static_cast<float>(z - cy);
    out[i * 3 + 2] = static_cast<float>(-y - cz);
  }
}

}  // namespace

extern "C" {

// Decode ``n`` LAS point records into centered y-up f32 triples.
//   rec:          raw point-record bytes, n * point_length
//   scale/offset: LAS header scale factors and offsets (x, y, z)
//   center:       world center in swizzled space (x_up, y_up, z_up)
//   out:          f32[n * 3]
//   n_threads:    0 = hardware concurrency
void treee_las_decode(const uint8_t* rec, int64_t n, int32_t point_length,
                      const double* scale, const double* offset,
                      const double* center, float* out, int32_t n_threads) {
  if (n <= 0) return;
  // every record read touches bytes [0, 12); a corrupt header with
  // 0 < point_length < 12 would read past the final record otherwise
  if (point_length < 12) return;
  unsigned hw = std::thread::hardware_concurrency();
  int64_t workers = n_threads > 0 ? n_threads : (hw > 0 ? hw : 4);
  workers = std::min<int64_t>(workers, std::max<int64_t>(1, n / 65536));
  if (workers <= 1) {
    decode_range(rec, 0, n, point_length, scale, offset, center, out);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(workers);
  const int64_t step = (n + workers - 1) / workers;
  for (int64_t w = 0; w < workers; ++w) {
    const int64_t begin = w * step;
    const int64_t end = std::min(n, begin + step);
    if (begin >= end) break;
    pool.emplace_back(decode_range, rec, begin, end, point_length, scale,
                      offset, center, out);
  }
  for (auto& t : pool) t.join();
}

// ABI version probe so Python can detect stale builds.
int32_t treee_native_abi_version() { return 1; }

}  // extern "C"
