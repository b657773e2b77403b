// LASzip (.laz) point codec: chunked POINT10 compression/decompression.
//
// Native counterpart of the reference's use of the Rust `laz` crate for
// multi-threaded chunk decode (treee/src/laz.rs:130-180).  Implements the
// public LASzip v2 algorithm for the LAS point-format-0 core item (POINT10):
// FastAC arithmetic coding (laszip_core.h), per-field predictive models
// (changed-values mask, median-of-5 x/y delta prediction with return-map
// contexts, per-return-level height prediction), and the chunked stream
// framing with the compressed chunk table.  Both directions are implemented;
// correctness is established by roundtrip (no .laz ground-truth data exists in
// this environment) and the framing matches the published LASzip layout.
//
// Chunks are independent by construction, so decompression fans out across
// std::thread workers exactly like the reference's rayon chunk pool.

#include <atomic>
#include <cstring>
#include <thread>
#include <vector>

#include "laszip_core.h"

namespace laszip {

// LASzip return-number/count context tables (public constants of the format).
static const u8 kNumberReturnMap[8][8] = {
    {15, 14, 13, 12, 11, 10, 9, 8},  {14, 0, 1, 3, 6, 10, 10, 9},
    {13, 1, 2, 4, 7, 11, 11, 10},    {12, 3, 4, 5, 8, 12, 12, 11},
    {11, 6, 7, 8, 9, 13, 13, 12},    {10, 10, 11, 12, 13, 14, 14, 13},
    {9, 10, 11, 12, 13, 14, 15, 14}, {8, 9, 10, 11, 12, 13, 14, 15}};

static const u8 kNumberReturnLevel[8][8] = {
    {0, 1, 2, 3, 4, 5, 6, 7}, {1, 0, 1, 2, 3, 4, 5, 6},
    {2, 1, 0, 1, 2, 3, 4, 5}, {3, 2, 1, 0, 1, 2, 3, 4},
    {4, 3, 2, 1, 0, 1, 2, 3}, {5, 4, 3, 2, 1, 0, 1, 2},
    {6, 5, 4, 3, 2, 1, 0, 1}, {7, 6, 5, 4, 3, 2, 1, 0}};

#pragma pack(push, 1)
struct Point10 {
  i32 x, y, z;
  u16 intensity;
  u8 flags;  // return#(0-2) | #returns(3-5) | scan_dir(6) | edge(7)
  u8 classification;
  i8 scan_angle_rank;
  u8 user_data;
  u16 point_source_id;
};
#pragma pack(pop)
static_assert(sizeof(Point10) == 20, "LAS point format 0 is 20 bytes");

// Per-chunk codec state for POINT10 v2.
struct Point10Codec {
  bool compressing;
  Point10 last;
  u16 last_intensity[16];
  StreamingMedian5 med_x[16], med_y[16];
  i32 last_height[8];

  SymbolModel m_changed_values;
  SymbolModel m_scan_angle_rank[2];
  std::vector<SymbolModel> m_bit_byte;         // [256], lazily initialized
  std::vector<SymbolModel> m_classification;   // [256]
  std::vector<SymbolModel> m_user_data;        // [256]
  std::vector<u8> init_bb, init_cls, init_ud;  // lazy-init flags
  IntegerCompressor ic_intensity, ic_point_source, ic_dx, ic_dy, ic_z;

  void init(const Point10& first, bool for_compress) {
    compressing = for_compress;
    last = first;
    for (int i = 0; i < 16; ++i) {
      last_intensity[i] = 0;
      med_x[i].init();
      med_y[i].init();
    }
    for (int i = 0; i < 8; ++i) last_height[i] = 0;

    m_changed_values.init(64, for_compress);
    m_scan_angle_rank[0].init(256, for_compress);
    m_scan_angle_rank[1].init(256, for_compress);
    m_bit_byte.assign(256, SymbolModel());
    m_classification.assign(256, SymbolModel());
    m_user_data.assign(256, SymbolModel());
    init_bb.assign(256, 0);
    init_cls.assign(256, 0);
    init_ud.assign(256, 0);
    ic_intensity.init(16, 4, for_compress);
    ic_point_source.init(16, 1, for_compress);
    ic_dx.init(32, 2, for_compress);
    ic_dy.init(32, 22, for_compress);
    ic_z.init(32, 20, for_compress);
  }

  SymbolModel& lazy(std::vector<SymbolModel>& ms, std::vector<u8>& flags, u8 i) {
    if (!flags[i]) {
      ms[i].init(256, compressing);
      flags[i] = 1;
    }
    return ms[i];
  }

  void read(Decoder& dec, Point10* out) {
    const u32 changed = dec.decode_symbol(m_changed_values);
    if (changed & 32) last.flags = static_cast<u8>(
        dec.decode_symbol(lazy(m_bit_byte, init_bb, last.flags)));

    const u32 r = last.flags & 7;
    const u32 n = (last.flags >> 3) & 7;
    const u32 m = kNumberReturnMap[n][r];
    const u32 l = kNumberReturnLevel[n][r];

    if (changed & 16) {
      const u16 it = static_cast<u16>(ic_intensity.decompress(
          dec, last_intensity[m], m < 3 ? m : 3));
      last.intensity = it;
      last_intensity[m] = it;
    } else {
      last.intensity = last_intensity[m];
    }
    if (changed & 8)
      last.classification = static_cast<u8>(dec.decode_symbol(
          lazy(m_classification, init_cls, last.classification)));
    if (changed & 4) {
      const u32 sdf = (last.flags >> 6) & 1;
      const u32 val = dec.decode_symbol(m_scan_angle_rank[sdf]);
      last.scan_angle_rank = static_cast<i8>(
          static_cast<u8>(val + static_cast<u8>(last.scan_angle_rank)));
    }
    if (changed & 2)
      last.user_data = static_cast<u8>(
          dec.decode_symbol(lazy(m_user_data, init_ud, last.user_data)));
    if (changed & 1)
      last.point_source_id = static_cast<u16>(
          ic_point_source.decompress(dec, last.point_source_id));

    // x: median-of-5 predicted delta, context = single-return?
    i32 median = med_x[m].get();
    i32 diff = ic_dx.decompress(dec, median, n == 1);
    last.x += diff;
    med_x[m].add(diff);
    // y: context chains on the bit-width of the x corrector
    const u32 kx = ic_dx.k;
    median = med_y[m].get();
    diff = ic_dy.decompress(
        dec, median, (n == 1 ? 1 : 0) + (kx < 20 ? (kx & ~1u) : 20));
    last.y += diff;
    med_y[m].add(diff);
    // z: per-return-level height prediction
    const u32 kz = (kx + ic_dy.k) / 2;
    last.z = ic_z.decompress(
        dec, last_height[l], (n == 1 ? 1 : 0) + (kz < 18 ? (kz & ~1u) : 18));
    last_height[l] = last.z;

    *out = last;
  }

  void write(Encoder& enc, const Point10& cur) {
    const u32 r = cur.flags & 7;
    const u32 n = (cur.flags >> 3) & 7;
    const u32 m = kNumberReturnMap[n][r];
    const u32 l = kNumberReturnLevel[n][r];

    const u32 changed =
        ((last.flags != cur.flags) ? 32u : 0u) |
        ((last_intensity[m] != cur.intensity) ? 16u : 0u) |
        ((last.classification != cur.classification) ? 8u : 0u) |
        ((last.scan_angle_rank != cur.scan_angle_rank) ? 4u : 0u) |
        ((last.user_data != cur.user_data) ? 2u : 0u) |
        ((last.point_source_id != cur.point_source_id) ? 1u : 0u);
    enc.encode_symbol(m_changed_values, changed);

    if (changed & 32) {
      enc.encode_symbol(lazy(m_bit_byte, init_bb, last.flags), cur.flags);
      last.flags = cur.flags;
    }
    if (changed & 16) {
      ic_intensity.compress(enc, last_intensity[m], cur.intensity,
                            m < 3 ? m : 3);
      last_intensity[m] = cur.intensity;
    }
    last.intensity = last_intensity[m];
    if (changed & 8) {
      enc.encode_symbol(lazy(m_classification, init_cls, last.classification),
                        cur.classification);
      last.classification = cur.classification;
    }
    if (changed & 4) {
      const u32 sdf = (cur.flags >> 6) & 1;
      const u8 val = static_cast<u8>(static_cast<u8>(cur.scan_angle_rank) -
                                     static_cast<u8>(last.scan_angle_rank));
      enc.encode_symbol(m_scan_angle_rank[sdf], val);
      last.scan_angle_rank = cur.scan_angle_rank;
    }
    if (changed & 2) {
      enc.encode_symbol(lazy(m_user_data, init_ud, last.user_data),
                        cur.user_data);
      last.user_data = cur.user_data;
    }
    if (changed & 1) {
      ic_point_source.compress(enc, last.point_source_id, cur.point_source_id);
      last.point_source_id = cur.point_source_id;
    }

    i32 median = med_x[m].get();
    i32 diff = cur.x - last.x;
    ic_dx.compress(enc, median, diff, n == 1);
    med_x[m].add(diff);
    last.x = cur.x;

    const u32 kx = ic_dx.k;
    median = med_y[m].get();
    diff = cur.y - last.y;
    ic_dy.compress(enc, median, diff,
                   (n == 1 ? 1 : 0) + (kx < 20 ? (kx & ~1u) : 20));
    med_y[m].add(diff);
    last.y = cur.y;

    const u32 kz = (kx + ic_dy.k) / 2;
    ic_z.compress(enc, last_height[l], cur.z,
                  (n == 1 ? 1 : 0) + (kz < 18 ? (kz & ~1u) : 18));
    last_height[l] = cur.z;
    last.z = cur.z;
  }
};

// Generic BYTE v2 item codec: one adaptive 256-symbol model per byte column,
// predicting each byte as last + folded difference.  LASzip's standard item
// for extra bytes — we use it for the payload beyond the 20-byte POINT10 core
// (GPS time, RGB, ...), so point formats 1-3 frame as POINT10 + BYTE(n).
struct ByteCodec {
  u32 n = 0;
  std::vector<SymbolModel> models;
  std::vector<u8> last;

  void init(const u8* first, u32 n_bytes, bool for_compress) {
    n = n_bytes;
    models.resize(n);
    last.assign(first, first + n);
    for (auto& m : models) m.init(256, for_compress);
  }

  void read(Decoder& dec, u8* out) {
    for (u32 i = 0; i < n; ++i) {
      const u32 corr = dec.decode_symbol(models[i]);
      last[i] = static_cast<u8>(corr + last[i]);
      out[i] = last[i];
    }
  }

  void write(Encoder& enc, const u8* cur) {
    for (u32 i = 0; i < n; ++i) {
      const u8 diff = static_cast<u8>(cur[i] - last[i]);
      enc.encode_symbol(models[i], diff);
      last[i] = cur[i];
    }
  }
};

// ---------------------------------------------------------------------------
// Chunked stream framing
// ---------------------------------------------------------------------------

static void read_u32(const u8* p, u32* v) { std::memcpy(v, p, 4); }
static void read_i64(const u8* p, i64* v) { std::memcpy(v, p, 8); }

struct ChunkRange {
  u64 offset;    // byte offset of the chunk in the file
  u32 n_points;  // points in this chunk
  u64 out_index; // first output point index
};

// Decompress one chunk (raw first point + arithmetic stream).
// Records are point_length bytes: a 20-byte POINT10 core + extra BYTE item.
static int decompress_chunk(const u8* data, u64 len, u32 n_points,
                            u32 point_length, u8* out) {
  if (n_points == 0) return 0;
  if (len < point_length) return 1;
  const u32 n_extra = point_length - sizeof(Point10);
  Point10 first;
  std::memcpy(&first, data, sizeof(Point10));
  std::memcpy(out, data, point_length);
  if (n_points == 1) return 0;

  Point10Codec codec;
  codec.init(first, /*for_compress=*/false);
  ByteCodec extra;
  if (n_extra) extra.init(data + sizeof(Point10), n_extra, false);
  Decoder dec;
  dec.init(data + point_length, len - point_length);
  for (u32 i = 1; i < n_points; ++i) {
    u8* rec = out + static_cast<u64>(i) * point_length;
    Point10 p;
    codec.read(dec, &p);
    std::memcpy(rec, &p, sizeof(Point10));
    if (n_extra) extra.read(dec, rec + sizeof(Point10));
  }
  return 0;
}

static void compress_chunk(const u8* records, u32 n_points, u32 point_length,
                           std::vector<u8>* out) {
  const u32 n_extra = point_length - sizeof(Point10);
  Point10 first;
  std::memcpy(&first, records, sizeof(Point10));
  out->insert(out->end(), records, records + point_length);
  if (n_points == 1) return;

  Point10Codec codec;
  codec.init(first, /*for_compress=*/true);
  ByteCodec extra;
  if (n_extra) extra.init(records + sizeof(Point10), n_extra, true);
  Encoder enc;
  enc.init();
  for (u32 i = 1; i < n_points; ++i) {
    const u8* rec = records + static_cast<u64>(i) * point_length;
    Point10 p;
    std::memcpy(&p, rec, sizeof(Point10));
    codec.write(enc, p);
    if (n_extra) extra.write(enc, rec + sizeof(Point10));
  }
  enc.done();
  out->insert(out->end(), enc.out.begin(), enc.out.end());
}

}  // namespace laszip

extern "C" {

// Decompress a chunked POINT10 LAZ stream.
//   file/file_len:     the whole .laz file bytes
//   point_data_offset: header's offset_to_point_data
//   n_points:          points to decode
//   chunk_size:        points per chunk from the LASzip VLR
//   out:               n_points * 20 bytes
// Returns 0 ok, 1 corrupt, 2 unsupported.
int treee_laz_decompress(const laszip::u8* file, laszip::u64 file_len,
                         laszip::u64 point_data_offset, laszip::u32 n_points,
                         laszip::u32 point_length, laszip::u8 point_format,
                         laszip::u32 chunk_size, laszip::u8* out,
                         laszip::i32 n_threads) {
  using namespace laszip;
  if (point_format > 3 || point_length < sizeof(Point10)) return 2;
  if (point_data_offset + 8 > file_len) return 1;

  i64 table_offset;
  read_i64(file + point_data_offset, &table_offset);
  if (table_offset < 0 ||
      static_cast<u64>(table_offset) + 8 > file_len)
    return 1;

  // chunk table: u32 version, u32 n_chunks, then IC(32,2)-coded byte sizes
  u32 version, n_chunks;
  read_u32(file + table_offset, &version);
  read_u32(file + table_offset + 4, &n_chunks);
  if (version != 0) return 2;

  std::vector<u64> sizes(n_chunks);
  {
    Decoder dec;
    dec.init(file + table_offset + 8, file_len - (table_offset + 8));
    IntegerCompressor ic;
    ic.init(32, 2, /*for_compress=*/false);
    i32 prev = 0;
    for (u32 i = 0; i < n_chunks; ++i) {
      const i32 v = ic.decompress(dec, prev, 1);
      sizes[i] = static_cast<u32>(v);
      prev = v;
    }
  }

  // chunk ranges
  std::vector<ChunkRange> ranges;
  u64 off = point_data_offset + 8;
  u64 remaining = n_points, out_idx = 0;
  for (u32 i = 0; i < n_chunks && remaining; ++i) {
    const u32 npts =
        static_cast<u32>(remaining < chunk_size ? remaining : chunk_size);
    ranges.push_back({off, npts, out_idx});
    off += sizes[i];
    out_idx += npts;
    remaining -= npts;
    if (off > file_len) return 1;
  }
  if (remaining) return 1;

  // parallel decode
  unsigned hw = std::thread::hardware_concurrency();
  u64 workers = n_threads > 0 ? static_cast<u64>(n_threads)
                              : (hw > 0 ? hw : 4);
  if (workers > ranges.size()) workers = ranges.size();
  std::atomic<size_t> next{0};
  std::atomic<int> status{0};
  auto worker = [&]() {
    for (;;) {
      const size_t i = next.fetch_add(1);
      if (i >= ranges.size()) return;
      const ChunkRange& r = ranges[i];
      const u64 avail = (i + 1 < ranges.size())
                            ? ranges[i + 1].offset - r.offset
                            : file_len - r.offset;
      const int rc = decompress_chunk(file + r.offset, avail, r.n_points,
                                      point_length,
                                      out + r.out_index * point_length);
      if (rc) status.store(rc);
    }
  };
  if (workers <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (u64 w = 0; w < workers; ++w) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
  }
  return status.load();
}

// Compress POINT10 records into a chunked LAZ stream (chunk-table framing).
//   base_offset: file offset where this stream will start (for the absolute
//                chunk-table pointer, like real .laz files)
// Returns 0 ok, 2 unsupported, 3 buffer too small.
int treee_laz_compress(const laszip::u8* records, laszip::u32 n_points,
                       laszip::u32 point_length, laszip::u8 point_format,
                       laszip::u32 chunk_size, laszip::u64 base_offset,
                       laszip::u8* out_buf, laszip::u64 out_cap,
                       laszip::u64* out_len) {
  using namespace laszip;
  if (point_format > 3 || point_length < sizeof(Point10)) return 2;
  if (chunk_size == 0) chunk_size = 50000;

  std::vector<std::vector<u8>> chunks;
  for (u64 i = 0; i < n_points; i += chunk_size) {
    const u32 npts = static_cast<u32>(
        (n_points - i) < chunk_size ? (n_points - i) : chunk_size);
    chunks.emplace_back();
    compress_chunk(records + i * point_length, npts, point_length,
                   &chunks.back());
  }

  // assemble: [i64 table_offset][chunks...][table]
  u64 total = 8;
  for (auto& c : chunks) total += c.size();
  const u64 table_offset = base_offset + total;

  Encoder table_enc;
  table_enc.init();
  {
    IntegerCompressor ic;
    ic.init(32, 2, /*for_compress=*/true);
    i32 prev = 0;
    for (auto& c : chunks) {
      ic.compress(table_enc, prev, static_cast<i32>(c.size()), 1);
      prev = static_cast<i32>(c.size());
    }
    table_enc.done();
  }
  total += 8 + table_enc.out.size();
  if (total > out_cap) {
    *out_len = total;
    return 3;
  }

  u8* p = out_buf;
  const i64 to = static_cast<i64>(table_offset);
  std::memcpy(p, &to, 8);
  p += 8;
  for (auto& c : chunks) {
    std::memcpy(p, c.data(), c.size());
    p += c.size();
  }
  const u32 version = 0, n_chunks = static_cast<u32>(chunks.size());
  std::memcpy(p, &version, 4);
  p += 4;
  std::memcpy(p, &n_chunks, 4);
  p += 4;
  std::memcpy(p, table_enc.out.data(), table_enc.out.size());
  p += table_enc.out.size();
  *out_len = static_cast<u64>(p - out_buf);
  return 0;
}

}  // extern "C"
