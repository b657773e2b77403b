// LASzip (.laz) point codec: chunked compression/decompression of the
// LAS point formats 0-5.
//
// Native counterpart of the reference's use of the Rust `laz` crate for
// multi-threaded chunk decode (treee/src/laz.rs:130-180).  Implements the
// public LASzip v2 algorithm: FastAC arithmetic coding (laszip_core.h) and the
// standard v2 item codecs —
//   POINT10   (type 6): changed-values mask, median-of-5 x/y delta prediction
//             with return-map contexts, per-return-level height prediction
//   GPSTIME11 (type 7): 4-sequence f64 time tracking with quantized
//             delta-multiplier models and 64-bit escape
//   RGB12     (type 8): per-byte used-mask + channel-correlated difference
//             models
//   WAVEPACKET13 (type 9, v1): offset-case model (same/contiguous/32-bit
//             delta/64-bit escape) + delta-coded size/location/direction
//             (shared core in laszip_core.h, formats 4/5)
//   BYTE      (type 0): one adaptive 256-symbol folded-difference model per
//             column (arbitrary extra payload)
// plus the chunked stream framing with the compressed chunk table.  Both
// directions are implemented; correctness is established by roundtrip (no
// .laz ground-truth data exists in this environment) and the framing/item
// layout matches the published LASzip format, so standard files for formats
// 0-5 are accepted via their LASzip-VLR item list.
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

// ---------------------------------------------------------------------------
// GPSTIME11 v2: four tracked time sequences (multi-flightline interleave);
// per-sequence quantized delta-multiplier models with a 64-bit escape.
// ---------------------------------------------------------------------------

// GPS multi-model constants shared with the layered codec: laszip_core.h

struct GpsTime11Codec {
  u64 last_gpstime[4];
  i32 last_gpstime_diff[4];
  i32 multi_extreme_counter[4];
  u32 last, next;

  SymbolModel m_gpstime_multi, m_gpstime_0diff;
  IntegerCompressor ic_gpstime;

  void init(const u8* first8, bool for_compress) {
    last = next = 0;
    std::memcpy(&last_gpstime[0], first8, 8);
    last_gpstime[1] = last_gpstime[2] = last_gpstime[3] = 0;
    for (int i = 0; i < 4; ++i) {
      last_gpstime_diff[i] = 0;
      multi_extreme_counter[i] = 0;
    }
    m_gpstime_multi.init(kGpsMultiTotal, for_compress);
    m_gpstime_0diff.init(6, for_compress);
    ic_gpstime.init(32, 9, for_compress);
  }

  void bump_extreme(i32 gpstime_diff) {
    if (++multi_extreme_counter[last] > 3) {
      last_gpstime_diff[last] = gpstime_diff;
      multi_extreme_counter[last] = 0;
    }
  }

  void read(Decoder& dec, u8* out) {
    for (;;) {
      if (last_gpstime_diff[last] == 0) {
        // this sequence has no established 32-bit delta yet
        const u32 multi = dec.decode_symbol(m_gpstime_0diff);
        if (multi == 1) {  // difference fits in 32 bits
          last_gpstime_diff[last] = ic_gpstime.decompress(dec, 0, 0);
          last_gpstime[last] = static_cast<u64>(
              static_cast<i64>(last_gpstime[last]) + last_gpstime_diff[last]);
          multi_extreme_counter[last] = 0;
        } else if (multi == 2) {  // full 64-bit escape -> new sequence
          next = (next + 1) & 3;
          const u64 hi = static_cast<u32>(ic_gpstime.decompress(
              dec, static_cast<i32>(last_gpstime[last] >> 32), 8));
          last = next;
          last_gpstime[last] = (hi << 32) | dec.read_bits(32);
          last_gpstime_diff[last] = 0;
          multi_extreme_counter[last] = 0;
        } else if (multi > 2) {  // switch to another tracked sequence
          last = (last + multi - 2) & 3;
          continue;
        }
        // multi == 0: value unchanged
        break;
      }
      const u32 multi = dec.decode_symbol(m_gpstime_multi);
      if (multi == 1) {
        last_gpstime[last] = static_cast<u64>(
            static_cast<i64>(last_gpstime[last]) +
            ic_gpstime.decompress(dec, last_gpstime_diff[last], 1));
        multi_extreme_counter[last] = 0;
      } else if (multi < kGpsMultiUnchanged) {
        i32 gpstime_diff;
        if (multi == 0) {
          gpstime_diff = ic_gpstime.decompress(dec, 0, 7);
          bump_extreme(gpstime_diff);
        } else if (multi < static_cast<u32>(kGpsMulti)) {
          gpstime_diff = ic_gpstime.decompress(
              dec,
              static_cast<i32>(multi) * last_gpstime_diff[last],
              multi < 10 ? 2 : 3);
        } else if (multi == static_cast<u32>(kGpsMulti)) {
          gpstime_diff =
              ic_gpstime.decompress(dec, kGpsMulti * last_gpstime_diff[last], 4);
          bump_extreme(gpstime_diff);
        } else {
          const i32 neg = kGpsMulti - static_cast<i32>(multi);
          if (neg > kGpsMultiMinus) {
            gpstime_diff =
                ic_gpstime.decompress(dec, neg * last_gpstime_diff[last], 5);
          } else {
            gpstime_diff = ic_gpstime.decompress(
                dec, kGpsMultiMinus * last_gpstime_diff[last], 6);
            bump_extreme(gpstime_diff);
          }
        }
        last_gpstime[last] = static_cast<u64>(
            static_cast<i64>(last_gpstime[last]) + gpstime_diff);
      } else if (multi == kGpsMultiCodeFull) {
        next = (next + 1) & 3;
        const u64 hi = static_cast<u32>(ic_gpstime.decompress(
            dec, static_cast<i32>(last_gpstime[last] >> 32), 8));
        last = next;
        last_gpstime[last] = (hi << 32) | dec.read_bits(32);
        last_gpstime_diff[last] = 0;
        multi_extreme_counter[last] = 0;
      } else if (multi > kGpsMultiCodeFull) {
        last = (last + multi - kGpsMultiCodeFull) & 3;
        continue;
      }
      // multi == kGpsMultiUnchanged: value unchanged
      break;
    }
    std::memcpy(out, &last_gpstime[last], 8);
  }

  void write(Encoder& enc, const u8* cur8) {
    i64 cur;
    std::memcpy(&cur, cur8, 8);
    for (;;) {
      const i64 lastv = static_cast<i64>(last_gpstime[last]);
      if (last_gpstime_diff[last] == 0) {
        if (cur == lastv) {
          enc.encode_symbol(m_gpstime_0diff, 0);
          return;
        }
        const i64 diff64 = cur - lastv;
        const i32 diff = static_cast<i32>(diff64);
        if (diff64 == static_cast<i64>(diff)) {
          enc.encode_symbol(m_gpstime_0diff, 1);
          ic_gpstime.compress(enc, 0, diff, 0);
          last_gpstime_diff[last] = diff;
          multi_extreme_counter[last] = 0;
          last_gpstime[last] = static_cast<u64>(cur);
          return;
        }
        // huge: does it continue another tracked sequence?
        bool switched = false;
        for (u32 i = 1; i < 4; ++i) {
          const i64 od = cur - static_cast<i64>(last_gpstime[(last + i) & 3]);
          if (od == static_cast<i64>(static_cast<i32>(od))) {
            enc.encode_symbol(m_gpstime_0diff, i + 2);
            last = (last + i) & 3;
            switched = true;
            break;
          }
        }
        if (switched) continue;
        enc.encode_symbol(m_gpstime_0diff, 2);
        ic_gpstime.compress(enc, static_cast<i32>(last_gpstime[last] >> 32),
                            static_cast<i32>(static_cast<u64>(cur) >> 32), 8);
        enc.write_bits(32, static_cast<u32>(static_cast<u64>(cur)));
        next = (next + 1) & 3;
        last = next;
        last_gpstime_diff[last] = 0;
        multi_extreme_counter[last] = 0;
        last_gpstime[last] = static_cast<u64>(cur);
        return;
      }
      if (cur == lastv) {
        enc.encode_symbol(m_gpstime_multi, kGpsMultiUnchanged);
        return;
      }
      const i64 diff64 = cur - lastv;
      const i32 diff = static_cast<i32>(diff64);
      if (diff64 == static_cast<i64>(diff)) {
        // quantized multiplier of the established delta
        const float mf =
            static_cast<float>(diff) / static_cast<float>(last_gpstime_diff[last]);
        const i32 multi = mf >= 0.0f ? static_cast<i32>(mf + 0.5f)
                                     : static_cast<i32>(mf - 0.5f);
        if (multi == 1) {
          enc.encode_symbol(m_gpstime_multi, 1);
          ic_gpstime.compress(enc, last_gpstime_diff[last], diff, 1);
          multi_extreme_counter[last] = 0;
        } else if (multi > 0) {
          if (multi < kGpsMulti) {
            enc.encode_symbol(m_gpstime_multi, static_cast<u32>(multi));
            ic_gpstime.compress(enc, multi * last_gpstime_diff[last], diff,
                                multi < 10 ? 2 : 3);
          } else {
            enc.encode_symbol(m_gpstime_multi, static_cast<u32>(kGpsMulti));
            ic_gpstime.compress(enc, kGpsMulti * last_gpstime_diff[last], diff, 4);
            bump_extreme(diff);
          }
        } else if (multi < 0) {
          if (multi > kGpsMultiMinus) {
            enc.encode_symbol(m_gpstime_multi,
                              static_cast<u32>(kGpsMulti - multi));
            ic_gpstime.compress(enc, multi * last_gpstime_diff[last], diff, 5);
          } else {
            enc.encode_symbol(m_gpstime_multi,
                              static_cast<u32>(kGpsMulti - kGpsMultiMinus));
            ic_gpstime.compress(enc, kGpsMultiMinus * last_gpstime_diff[last],
                                diff, 6);
            bump_extreme(diff);
          }
        } else {  // multi == 0
          enc.encode_symbol(m_gpstime_multi, 0);
          ic_gpstime.compress(enc, 0, diff, 7);
          bump_extreme(diff);
        }
        last_gpstime[last] = static_cast<u64>(cur);
        return;
      }
      // doesn't fit in 32 bits: other sequences, else 64-bit escape
      bool switched = false;
      for (u32 i = 1; i < 4; ++i) {
        const i64 od = cur - static_cast<i64>(last_gpstime[(last + i) & 3]);
        if (od == static_cast<i64>(static_cast<i32>(od))) {
          enc.encode_symbol(m_gpstime_multi, kGpsMultiCodeFull + i);
          last = (last + i) & 3;
          switched = true;
          break;
        }
      }
      if (switched) continue;
      enc.encode_symbol(m_gpstime_multi, kGpsMultiCodeFull);
      ic_gpstime.compress(enc, static_cast<i32>(last_gpstime[last] >> 32),
                          static_cast<i32>(static_cast<u64>(cur) >> 32), 8);
      enc.write_bits(32, static_cast<u32>(static_cast<u64>(cur)));
      next = (next + 1) & 3;
      last = next;
      last_gpstime_diff[last] = 0;
      multi_extreme_counter[last] = 0;
      last_gpstime[last] = static_cast<u64>(cur);
      return;
    }
  }
};

// ---------------------------------------------------------------------------
// RGB12 v2: 7-bit used-mask (which channel bytes changed + "g/b differ from
// r"), then per-byte folded differences predicted from the red channel's
// change (channel correlation).
// ---------------------------------------------------------------------------

struct Rgb12Codec {
  // RGB12 v2 == the shared RGB diff-coder core with flat (single-context)
  // state; the body lives in laszip_core.h (rgb_read/rgb_write) so the
  // layered RGB14 codec and this one cannot drift apart
  RgbModels m;

  void init(const u8* first6, bool for_compress) { m.init(first6, for_compress); }
  void read(Decoder& dec, u8* out) { rgb_read(dec, m, out); }
  void write(Encoder& enc, const u8* cur6) { rgb_write(enc, m, cur6); }
};

// Generic BYTE v2 item codec: one adaptive 256-symbol model per byte column,
// predicting each byte as last + folded difference.  LASzip's standard item
// for arbitrary extra payload beyond the typed items.
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
// Item-list-driven record codec (the LASzip VLR's item sequence)
// ---------------------------------------------------------------------------

// LASzip item types (published constants).
enum ItemType : u16 {
  ITEM_BYTE = 0,
  ITEM_POINT10 = 6,
  ITEM_GPSTIME11 = 7,
  ITEM_RGB12 = 8,
  ITEM_WAVEPACKET13 = 9,
};

struct ItemSpec {
  u16 type;
  u16 size;
};

// Standard item layout for the legacy entry points: POINT10 core, GPS time
// for formats 1/3/4/5, RGB for formats 2/3/5, wave packets for 4/5, BYTE for
// any remaining payload.
static bool infer_items(u8 fmt, u32 point_length, std::vector<ItemSpec>* out) {
  if (fmt > 5 || point_length < sizeof(Point10)) return false;
  out->clear();
  out->push_back({ITEM_POINT10, 20});
  u32 used = 20;
  if (fmt == 1 || fmt == 3 || fmt == 4 || fmt == 5) {
    out->push_back({ITEM_GPSTIME11, 8});
    used += 8;
  }
  if (fmt == 2 || fmt == 3 || fmt == 5) {
    out->push_back({ITEM_RGB12, 6});
    used += 6;
  }
  if (fmt == 4 || fmt == 5) {
    out->push_back({ITEM_WAVEPACKET13, 29});
    used += 29;
  }
  if (point_length < used) return false;
  if (point_length > used)
    out->push_back({ITEM_BYTE, static_cast<u16>(point_length - used)});
  return true;
}

// Single source of truth for the per-item size constraints: used by the
// stream-level up-front validation (unsupported items must report rc=2
// regardless of the framing state — a corrupt chunk table would otherwise
// mask them as rc=1) AND by ItemState::init below.
static bool item_supported(const ItemSpec& it) {
  switch (it.type) {
    case ITEM_POINT10: return it.size == 20;
    case ITEM_GPSTIME11: return it.size == 8;
    case ITEM_RGB12: return it.size == 6;
    case ITEM_WAVEPACKET13: return it.size == 29;
    case ITEM_BYTE: return it.size > 0;
    default: return false;
  }
}

struct ItemState {
  u16 type = 0;
  u32 offset = 0, size = 0;
  Point10Codec p10;
  GpsTime11Codec gps;
  Rgb12Codec rgb;
  WavepacketModels wp;  // WAVEPACKET13 v1 == the shared core, flat state
  ByteCodec bytes;

  int init(const u8* first, bool for_compress) {
    if (!item_supported({type, static_cast<u16>(size)})) return 2;
    switch (type) {
      case ITEM_POINT10: {
        Point10 p;
        std::memcpy(&p, first, sizeof(Point10));
        p10.init(p, for_compress);
        return 0;
      }
      case ITEM_GPSTIME11:
        gps.init(first, for_compress);
        return 0;
      case ITEM_RGB12:
        rgb.init(first, for_compress);
        return 0;
      case ITEM_WAVEPACKET13:
        wp.init(first, for_compress);
        return 0;
      case ITEM_BYTE:
        bytes.init(first, size, for_compress);
        return 0;
      default:
        return 2;
    }
  }

  void read(Decoder& dec, u8* dst) {
    switch (type) {
      case ITEM_POINT10: {
        Point10 p;
        p10.read(dec, &p);
        std::memcpy(dst, &p, sizeof(Point10));
        break;
      }
      case ITEM_GPSTIME11:
        gps.read(dec, dst);
        break;
      case ITEM_RGB12:
        rgb.read(dec, dst);
        break;
      case ITEM_WAVEPACKET13:
        wavepacket_read(dec, wp, dst);
        break;
      case ITEM_BYTE:
        bytes.read(dec, dst);
        break;
    }
  }

  void write(Encoder& enc, const u8* src) {
    switch (type) {
      case ITEM_POINT10: {
        Point10 p;
        std::memcpy(&p, src, sizeof(Point10));
        p10.write(enc, p);
        break;
      }
      case ITEM_GPSTIME11:
        gps.write(enc, src);
        break;
      case ITEM_RGB12:
        rgb.write(enc, src);
        break;
      case ITEM_WAVEPACKET13:
        wavepacket_write(enc, wp, src);
        break;
      case ITEM_BYTE:
        bytes.write(enc, src);
        break;
    }
  }
};

static int init_item_states(const std::vector<ItemSpec>& items,
                            const u8* first_record, u32 point_length,
                            bool for_compress, std::vector<ItemState>* st) {
  st->clear();
  st->resize(items.size());
  u32 off = 0;
  for (size_t j = 0; j < items.size(); ++j) {
    ItemState& s = (*st)[j];
    s.type = items[j].type;
    s.size = items[j].size;
    s.offset = off;
    if (off + s.size > point_length) return 2;
    const int rc = s.init(first_record + off, for_compress);
    if (rc) return rc;
    off += s.size;
  }
  return off == point_length ? 0 : 2;
}

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

// Decompress one chunk (raw first record + arithmetic stream).
static int decompress_chunk(const u8* data, u64 len, u32 n_points,
                            const std::vector<ItemSpec>& items,
                            u32 point_length, u8* out) {
  // (sequential path has no in-chunk count to cross-check)
  if (n_points == 0) return 0;
  if (len < point_length) return 1;
  std::memcpy(out, data, point_length);
  if (n_points == 1) return 0;

  std::vector<ItemState> st;
  const int rc = init_item_states(items, data, point_length, false, &st);
  if (rc) return rc;

  Decoder dec;
  dec.init(data + point_length, len - point_length);
  for (u32 i = 1; i < n_points; ++i) {
    u8* rec = out + static_cast<u64>(i) * point_length;
    for (auto& s : st) s.read(dec, rec + s.offset);
  }
  // loud-divergence guard: a decode that overran the chunk's byte range
  // means our models consumed a different symbol sequence than the writer
  // emitted — report it instead of returning silently wrong points
  if (dec.past_end) return 4;
  return 0;
}

static int compress_chunk(const u8* records, u32 n_points,
                          const std::vector<ItemSpec>& items, u32 point_length,
                          std::vector<u8>* out) {
  out->insert(out->end(), records, records + point_length);
  if (n_points == 1) return 0;

  std::vector<ItemState> st;
  const int rc = init_item_states(items, records, point_length, true, &st);
  if (rc) return rc;

  Encoder enc;
  enc.init();
  for (u32 i = 1; i < n_points; ++i) {
    const u8* rec = records + static_cast<u64>(i) * point_length;
    for (auto& s : st) s.write(enc, rec + s.offset);
  }
  enc.done();
  out->insert(out->end(), enc.out.begin(), enc.out.end());
  return 0;
}

static int decompress_stream(const u8* file, u64 file_len,
                             u64 point_data_offset, u32 n_points,
                             u32 point_length,
                             const std::vector<ItemSpec>& items, u32 chunk_size,
                             u8* out, i32 n_threads, u64 first_point = 0) {
  for (const auto& it : items)
    if (!item_supported(it)) return 2;
  // framing (chunk table, bounds, offset==-1, variable chunks, worker
  // pool) is shared with the layered codec: laszip_core.h
  return chunked_decompress_stream(
      file, file_len, point_data_offset, n_points, point_length, chunk_size,
      out, n_threads, first_point,
      [&](const u8* data, u64 avail, u32 npts, bool /*truncated*/,
          u8* rec_out) {
        return decompress_chunk(data, avail, npts, items, point_length,
                                rec_out);
      });
}

static int compress_stream(const u8* records, u32 n_points, u32 point_length,
                           const std::vector<ItemSpec>& items, u32 chunk_size,
                           u64 base_offset, u8* out_buf, u64 out_cap,
                           u64* out_len) {
  return chunked_compress_stream(
      records, n_points, point_length, chunk_size, base_offset, out_buf,
      out_cap, out_len,
      [&](const u8* rec, u32 npts, std::vector<u8>* chunk) {
        return compress_chunk(rec, npts, items, point_length, chunk);
      });
}

static std::vector<ItemSpec> items_from_arrays(const u16* types,
                                               const u16* sizes, u32 n) {
  std::vector<ItemSpec> v(n);
  for (u32 i = 0; i < n; ++i) v[i] = {types[i], sizes[i]};
  return v;
}

}  // namespace laszip

extern "C" {

// Decompress a chunked LAZ stream with an explicit LASzip item list (from the
// file's LASzip VLR).
//   file/file_len:     the whole .laz file bytes
//   point_data_offset: header's offset_to_point_data
//   n_points:          points to decode
//   item_types/item_sizes/n_items: the VLR's item sequence (v2 items)
//   chunk_size:        points per chunk from the LASzip VLR
//   out:               n_points * point_length bytes
// Returns 0 ok, 1 corrupt, 2 unsupported.
// ``first_point``: decode [first_point, first_point + n_points) — must be
// chunk-aligned (chunks are independent streams); 0 = whole file.
int treee_laz_decompress_items(const laszip::u8* file, laszip::u64 file_len,
                               laszip::u64 point_data_offset,
                               laszip::u32 n_points, laszip::u32 point_length,
                               const laszip::u16* item_types,
                               const laszip::u16* item_sizes,
                               laszip::u32 n_items, laszip::u32 chunk_size,
                               laszip::u8* out, laszip::i32 n_threads,
                               laszip::u64 first_point) {
  using namespace laszip;
  if (n_items == 0) return 2;
  const auto items = items_from_arrays(item_types, item_sizes, n_items);
  return decompress_stream(file, file_len, point_data_offset, n_points,
                           point_length, items, chunk_size, out, n_threads,
                           first_point);
}

// Per-chunk point counts from the LAZ chunk table.  Streaming ingest slabs
// must land on chunk boundaries (chunks are independent streams); for
// variable-size-chunk files Python cannot infer them from the VLR, so this
// exposes the table's counts (advisor r4: such files degraded to ONE slab,
// silently disabling the mid-decode preview for exactly the large files it
// targets).  For fixed-size framing every entry is chunk_size (callers
// clamp the last chunk by the header point count).
//   bound_points: cap on table entries read (pass the header point count)
//   counts_out/counts_cap: output buffer; *n_chunks_out = entries written
// Returns 0 ok, 1 corrupt, 2 unsupported.
int treee_laz_chunk_counts(const laszip::u8* file, laszip::u64 file_len,
                           laszip::u64 point_data_offset,
                           laszip::u32 chunk_size, laszip::u64 bound_points,
                           laszip::u32* counts_out, laszip::u64 counts_cap,
                           laszip::u64* n_chunks_out) {
  using namespace laszip;
  ChunkTable table;
  const int rc = read_chunk_table(file, file_len, point_data_offset,
                                  chunk_size, bound_points, &table);
  if (rc) return rc;
  const u64 n = table.sizes.size();
  *n_chunks_out = n;
  for (u64 i = 0; i < n && i < counts_cap; ++i)
    counts_out[i] = table.variable ? table.counts[i] : chunk_size;
  return 0;
}

// Compress point records into a chunked LAZ stream with an explicit item list.
int treee_laz_compress_items(const laszip::u8* records, laszip::u32 n_points,
                             laszip::u32 point_length,
                             const laszip::u16* item_types,
                             const laszip::u16* item_sizes,
                             laszip::u32 n_items, laszip::u32 chunk_size,
                             laszip::u64 base_offset, laszip::u8* out_buf,
                             laszip::u64 out_cap, laszip::u64* out_len) {
  using namespace laszip;
  if (n_items == 0) return 2;
  const auto items = items_from_arrays(item_types, item_sizes, n_items);
  return compress_stream(records, n_points, point_length, items, chunk_size,
                         base_offset, out_buf, out_cap, out_len);
}

// Legacy entry points: item layout inferred from the LAS point format
// (POINT10 [+ GPSTIME11][+ RGB12][+ BYTE remainder]).
int treee_laz_decompress(const laszip::u8* file, laszip::u64 file_len,
                         laszip::u64 point_data_offset, laszip::u32 n_points,
                         laszip::u32 point_length, laszip::u8 point_format,
                         laszip::u32 chunk_size, laszip::u8* out,
                         laszip::i32 n_threads) {
  using namespace laszip;
  std::vector<ItemSpec> items;
  if (!infer_items(point_format, point_length, &items)) return 2;
  return decompress_stream(file, file_len, point_data_offset, n_points,
                           point_length, items, chunk_size, out, n_threads);
}

// TEST HOOK: run the real Point10Codec on (first, cur) and return the
// changed_values SYMBOL the encoder actually emitted, extracted by decoding
// the stream's first symbol with an identically initialized 64-symbol model.
// Lets Python pin the documented bit assignments (flags 32 / intensity 16 /
// classification 8 / scan angle 4 / user data 2 / point source 1) and the
// last_intensity[m]-vs-last.intensity comparison against hand-derived
// expectations instead of roundtrip symmetry.
laszip::u32 treee_laz_test_point10_changed_symbol(const laszip::u8* first20,
                                                 const laszip::u8* cur20) {
  using namespace laszip;
  Point10 first, cur;
  std::memcpy(&first, first20, 20);
  std::memcpy(&cur, cur20, 20);
  Point10Codec codec;
  codec.init(first, /*for_compress=*/true);
  Encoder enc;
  enc.init();
  codec.write(enc, cur);
  enc.done();
  Decoder dec;
  dec.init(enc.out.data(), enc.out.size());
  SymbolModel m;
  m.init(64, /*for_compress=*/false);
  return dec.decode_symbol(m);
}

int treee_laz_compress(const laszip::u8* records, laszip::u32 n_points,
                       laszip::u32 point_length, laszip::u8 point_format,
                       laszip::u32 chunk_size, laszip::u64 base_offset,
                       laszip::u8* out_buf, laszip::u64 out_cap,
                       laszip::u64* out_len) {
  using namespace laszip;
  std::vector<ItemSpec> items;
  if (!infer_items(point_format, point_length, &items)) return 2;
  return compress_stream(records, n_points, point_length, items, chunk_size,
                         base_offset, out_buf, out_cap, out_len);
}

}  // extern "C"
