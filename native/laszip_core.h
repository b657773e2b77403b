// Arithmetic-coding core for the LASzip (.laz) codec.
//
// Implements the public LASzip algorithm family from its specification:
// Amir Said's FastAC range coder (adaptive binary + multi-symbol models with
// decoder tables) and the LASzip "integer compressor" (k-bit corrector models
// over predicted 32-bit deltas).  Fresh C++ implementation; both encoder and
// decoder are provided so the codec is validated by roundtrip (no .laz sample
// data exists in this environment).
//
// Counterpart of the reference's use of the Rust `laz` crate
// (treee/src/laz.rs:1-8,147-159) — here the codec itself is part of the
// framework's native runtime.

#pragma once

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace laszip {

using u8 = uint8_t;
using u16 = uint16_t;
using u32 = uint32_t;
using u64 = uint64_t;
using i8 = int8_t;
using i16 = int16_t;
using i32 = int32_t;
using i64 = int64_t;

constexpr u32 AC_MaxLength = 0xFFFFFFFFu;
constexpr u32 AC_MinLength = 0x01000000u;
constexpr u32 BM_LengthShift = 13;
constexpr u32 BM_MaxCount = 1u << BM_LengthShift;
constexpr u32 DM_LengthShift = 15;
constexpr u32 DM_MaxCount = 1u << DM_LengthShift;

// ---------------------------------------------------------------------------
// Adaptive models
// ---------------------------------------------------------------------------

struct BitModel {
  u32 bit0_count, bit_count, bit0_prob, update_cycle, bits_until_update;

  void init() {
    bit0_count = 1;
    bit_count = 2;
    bit0_prob = 1u << (BM_LengthShift - 1);
    update_cycle = bits_until_update = 4;
  }

  void update() {
    if ((bit_count += update_cycle) > BM_MaxCount) {
      bit_count = (bit_count + 1) >> 1;
      bit0_count = (bit0_count + 1) >> 1;
      if (bit0_count == bit_count) ++bit_count;
    }
    const u32 scale = 0x80000000u / bit_count;
    bit0_prob = (bit0_count * scale) >> (31 - BM_LengthShift);
    update_cycle = (5 * update_cycle) >> 2;
    if (update_cycle > 64) update_cycle = 64;
    bits_until_update = update_cycle;
  }
};

struct SymbolModel {
  u32 symbols = 0, last_symbol = 0, table_shift = 0, table_size = 0;
  u32 total_count = 0, update_cycle = 0, symbols_until_update = 0;
  bool compress = false;
  std::vector<u32> distribution, symbol_count, decoder_table;

  void init(u32 n_symbols, bool for_compress) {
    symbols = n_symbols;
    last_symbol = n_symbols - 1;
    compress = for_compress;
    if (!for_compress && symbols > 16) {
      u32 table_bits = 3;
      while (symbols > (1u << (table_bits + 2))) ++table_bits;
      table_size = 1u << table_bits;
      table_shift = DM_LengthShift - table_bits;
      decoder_table.assign(table_size + 2, 0);
    } else {
      table_size = table_shift = 0;
      decoder_table.clear();
    }
    distribution.assign(symbols, 0);
    symbol_count.assign(symbols, 1);
    total_count = 0;
    update_cycle = symbols;
    update();
    symbols_until_update = update_cycle = (symbols + 6) >> 1;
  }

  void update() {
    if ((total_count += update_cycle) > DM_MaxCount) {
      total_count = 0;
      for (u32 n = 0; n < symbols; ++n)
        total_count += (symbol_count[n] = (symbol_count[n] + 1) >> 1);
    }
    u32 sum = 0, s = 0;
    const u32 scale = 0x80000000u / total_count;
    if (compress || table_size == 0) {
      for (u32 k = 0; k < symbols; ++k) {
        distribution[k] = (scale * sum) >> (31 - DM_LengthShift);
        sum += symbol_count[k];
      }
    } else {
      for (u32 k = 0; k < symbols; ++k) {
        distribution[k] = (scale * sum) >> (31 - DM_LengthShift);
        sum += symbol_count[k];
        const u32 w = distribution[k] >> table_shift;
        while (s < w) decoder_table[++s] = k - 1;
      }
      decoder_table[0] = 0;
      while (s <= table_size) decoder_table[++s] = symbols - 1;
    }
    update_cycle = (5 * update_cycle) >> 2;
    const u32 max_cycle = (symbols + 6) << 3;
    if (update_cycle > max_cycle) update_cycle = max_cycle;
    symbols_until_update = update_cycle;
  }
};

// ---------------------------------------------------------------------------
// Encoder
// ---------------------------------------------------------------------------

struct Encoder {
  std::vector<u8> out;
  u32 base = 0, length = AC_MaxLength;

  void init() {
    out.clear();
    base = 0;
    length = AC_MaxLength;
  }

  void propagate_carry() {
    size_t p = out.size();
    while (p) {
      --p;
      if (++out[p] != 0) return;  // stop once a byte doesn't wrap
    }
  }

  void renorm() {
    do {
      out.push_back(static_cast<u8>(base >> 24));
      base <<= 8;
    } while ((length <<= 8) < AC_MinLength);
  }

  void encode_bit(BitModel& m, u32 bit) {
    const u32 x = m.bit0_prob * (length >> BM_LengthShift);
    if (!bit) {
      length = x;
      ++m.bit0_count;
    } else {
      const u32 init_base = base;
      base += x;
      length -= x;
      if (init_base > base) propagate_carry();
    }
    if (length < AC_MinLength) renorm();
    if (--m.bits_until_update == 0) m.update();
  }

  void encode_symbol(SymbolModel& m, u32 sym) {
    u32 x;
    const u32 init_base = base;
    if (sym == m.last_symbol) {
      x = m.distribution[sym] * (length >> DM_LengthShift);
      base += x;
      length -= x;
    } else {
      x = m.distribution[sym] * (length >>= DM_LengthShift);
      base += x;
      length = (m.distribution[sym + 1] - m.distribution[sym]) * length;
    }
    if (init_base > base) propagate_carry();
    if (length < AC_MinLength) renorm();
    ++m.symbol_count[sym];
    if (--m.symbols_until_update == 0) m.update();
  }

  void write_bits(u32 bits, u32 sym) {
    if (bits > 19) {
      write_short(sym & 0xFFFFu);
      sym >>= 16;
      bits -= 16;
    }
    const u32 init_base = base;
    base += sym * (length >>= bits);
    if (init_base > base) propagate_carry();
    if (length < AC_MinLength) renorm();
  }

  void write_short(u32 sym) {
    const u32 init_base = base;
    base += sym * (length >>= 16);
    if (init_base > base) propagate_carry();
    if (length < AC_MinLength) renorm();
  }

  void done() {
    const u32 init_base = base;
    if (length > 2 * AC_MinLength) {
      base += AC_MinLength;
      length = AC_MinLength >> 1;
    } else {
      base += AC_MinLength >> 1;
      length = AC_MinLength >> 9;
    }
    if (init_base > base) propagate_carry();
    renorm();
    // guarantee the decoder's 4-byte prime + renorm reads stay in bounds
    out.push_back(0);
    out.push_back(0);
  }
};

// ---------------------------------------------------------------------------
// Decoder
// ---------------------------------------------------------------------------

struct Decoder {
  const u8* in = nullptr;
  size_t pos = 0, len = 0;
  u32 value = 0, length = 0;
  // Divergence guard: a DECODE-time read more than the 4-byte lookahead
  // past the stream end means the symbol sequence consumed more renorm
  // bytes than the writer produced — on a well-formed file that indicates
  // our adaptive models diverged from the writer's (e.g. the derived
  // POINT14 context tables), not just truncation.  The value register is
  // always 4 bytes ahead of the logically-consumed stream, so a matching
  // decode may read up to 4 virtual zero-padding bytes (measured: our own
  // roundtrip streams read 1-4); init() is exempt so zero-size (unused)
  // layers stay clean.
  bool past_end = false;

  u8 in_byte() {
    if (pos < len) return in[pos++];
    if (++pos > len + 4) past_end = true;
    return 0;
  }

  void init(const u8* data, size_t n) {
    in = data;
    len = n;
    pos = 0;
    u32 v = 0;
    for (int i = 0; i < 4; ++i) v = (v << 8) | (pos < len ? in[pos++] : 0);
    value = v;
    length = AC_MaxLength;
    past_end = false;
  }

  void renorm() {
    do {
      value = (value << 8) | in_byte();
    } while ((length <<= 8) < AC_MinLength);
  }

  u32 decode_bit(BitModel& m) {
    const u32 x = m.bit0_prob * (length >> BM_LengthShift);
    const u32 sym = (value >= x);
    if (!sym) {
      length = x;
      ++m.bit0_count;
    } else {
      value -= x;
      length -= x;
    }
    if (length < AC_MinLength) renorm();
    if (--m.bits_until_update == 0) m.update();
    return sym;
  }

  u32 decode_symbol(SymbolModel& m) {
    u32 n, sym, x, y = length;
    if (m.table_size) {
      length >>= DM_LengthShift;
      const u32 dv = value / length;
      // A valid stream keeps value < length, so dv < 2^DM_LengthShift and
      // t <= table_size - 1; corrupt input can break that invariant and
      // index past decoder_table (heap overread). Clamping never changes a
      // valid decode.
      const u32 t = std::min(dv >> m.table_shift, m.table_size - 1);
      sym = m.decoder_table[t];
      n = m.decoder_table[t + 1] + 1;
      while (n > sym + 1) {
        const u32 k = (sym + n) >> 1;
        if (m.distribution[k] > dv) n = k; else sym = k;
      }
      x = m.distribution[sym] * length;
      if (sym != m.last_symbol) y = m.distribution[sym + 1] * length;
    } else {
      x = sym = 0;
      length >>= DM_LengthShift;
      u32 k = (n = m.symbols) >> 1;
      do {
        const u32 z = length * m.distribution[k];
        if (z > value) {
          n = k;
          y = z;
        } else {
          sym = k;
          x = z;
        }
      } while ((k = (sym + n) >> 1) != sym);
    }
    value -= x;
    length = y - x;
    if (length < AC_MinLength) renorm();
    ++m.symbol_count[sym];
    if (--m.symbols_until_update == 0) m.update();
    return sym;
  }

  u32 read_bits(u32 bits) {
    if (bits > 19) {
      const u32 lo = read_short();
      const u32 hi = read_bits(bits - 16) << 16;
      return hi | lo;
    }
    const u32 sym = value / (length >>= bits);
    value -= length * sym;
    if (length < AC_MinLength) renorm();
    return sym;
  }

  u32 read_short() {
    const u32 sym = value / (length >>= 16);
    value -= length * sym;
    if (length < AC_MinLength) renorm();
    return sym;
  }
};

// ---------------------------------------------------------------------------
// Integer compressor: k-bit corrector over a predicted i32
// ---------------------------------------------------------------------------

struct IntegerCompressor {
  u32 bits = 32, contexts = 1, bits_high = 8;
  u32 corr_bits = 32, corr_range = 0;
  i32 corr_min = INT32_MIN, corr_max = INT32_MAX;
  u32 k = 0;  // bits of the last corrector (context chaining in point10)
  std::vector<SymbolModel> m_bits;      // [contexts], corr_bits+1 symbols
  BitModel m_corr0;
  std::vector<SymbolModel> m_corr;      // [corr_bits+1], index by k

  void init(u32 bits_, u32 contexts_, bool for_compress, u32 bits_high_ = 8) {
    bits = bits_;
    contexts = contexts_;
    bits_high = bits_high_;
    if (bits > 0 && bits < 32) {
      corr_bits = bits;
      corr_range = 1u << bits;
      corr_min = -static_cast<i32>(corr_range / 2);
      corr_max = corr_min + static_cast<i32>(corr_range) - 1;
    } else {
      corr_bits = 32;
      corr_range = 0;
      corr_min = INT32_MIN;
      corr_max = INT32_MAX;
    }
    m_bits.resize(contexts);
    for (auto& m : m_bits) m.init(corr_bits + 1, for_compress);
    m_corr0.init();
    m_corr.resize(corr_bits + 1);
    for (u32 i = 1; i <= corr_bits; ++i)
      m_corr[i].init(i <= bits_high ? (1u << i) : (1u << bits_high),
                     for_compress);
  }

  // ---- decompression ----
  i32 read_corrector(Decoder& dec, SymbolModel& mb) {
    i32 c;
    k = dec.decode_symbol(mb);
    if (k) {
      if (k < 32) {
        u32 cu;
        if (k <= bits_high) {
          cu = dec.decode_symbol(m_corr[k]);
        } else {
          const u32 k1 = k - bits_high;
          cu = dec.decode_symbol(m_corr[k]);
          const u32 c1 = dec.read_bits(k1);
          cu = (cu << k1) | c1;
        }
        if (cu >= (1u << (k - 1))) {
          c = static_cast<i32>(cu) + 1;
        } else {
          c = static_cast<i32>(cu) - static_cast<i32>((1u << k) - 1);
        }
      } else {
        c = corr_min;
      }
    } else {
      c = static_cast<i32>(dec.decode_bit(m_corr0));
    }
    return c;
  }

  i32 decompress(Decoder& dec, i32 pred, u32 context = 0) {
    i32 real = pred + read_corrector(dec, m_bits[context]);
    if (corr_range) {
      if (real < 0) real += static_cast<i32>(corr_range);
      else if (static_cast<u32>(real) >= corr_range)
        real -= static_cast<i32>(corr_range);
    }
    return real;
  }

  // ---- compression ----
  void write_corrector(Encoder& enc, i32 c, SymbolModel& mb) {
    if (c == 0) {
      k = 0;
      enc.encode_symbol(mb, 0);
      enc.encode_bit(m_corr0, 0);
      return;
    }
    if (c == 1) {
      k = 0;
      enc.encode_symbol(mb, 0);
      enc.encode_bit(m_corr0, 1);
      return;
    }
    // k from the decode mapping: c in [2^(k-1)+1, 2^k] (so k = bit_width(c-1))
    // or c in [-(2^k - 1), -2^(k-1)] (so k = bit_width(|c|))
    u32 kk;
    if (c > 1) {
      u32 v = static_cast<u32>(c - 1);
      kk = 0;
      while (v) { v >>= 1; ++kk; }
    } else {  // c <= -1
      const u64 v64 = static_cast<u64>(-static_cast<i64>(c));
      u64 v = v64;
      kk = 0;
      while (v) { v >>= 1; ++kk; }
    }
    k = kk;
    if (kk >= 32) {
      // corr_min sentinel
      enc.encode_symbol(mb, 32);
      return;
    }
    enc.encode_symbol(mb, kk);
    u32 cu;
    if (c > 0) cu = static_cast<u32>(c - 1);                     // c in (2^(k-1), 2^k] -> cu in [2^(k-1), 2^k)
    else cu = static_cast<u32>(c + static_cast<i32>((1u << kk) - 1));  // negative branch
    if (kk <= bits_high) {
      enc.encode_symbol(m_corr[kk], cu);
    } else {
      const u32 k1 = kk - bits_high;
      enc.encode_symbol(m_corr[kk], cu >> k1);
      enc.write_bits(k1, cu & ((1u << k1) - 1));
    }
  }

  void compress(Encoder& enc, i32 pred, i32 real, u32 context = 0) {
    i32 corr = real - pred;
    if (corr_range) {
      if (corr < corr_min) corr += static_cast<i32>(corr_range);
      else if (corr > corr_max) corr -= static_cast<i32>(corr_range);
    }
    write_corrector(enc, corr, m_bits[context]);
  }
};

// ---------------------------------------------------------------------------
// Streaming median-of-5 predictor (point10 x/y deltas)
// ---------------------------------------------------------------------------

struct StreamingMedian5 {
  i32 values[5];
  bool high;

  void init() {
    values[0] = values[1] = values[2] = values[3] = values[4] = 0;
    high = true;
  }

  void add(i32 v) {
    if (high) {
      if (v < values[2]) {
        values[4] = values[3];
        values[3] = values[2];
        if (v < values[0]) {
          values[2] = values[1];
          values[1] = values[0];
          values[0] = v;
        } else if (v < values[1]) {
          values[2] = values[1];
          values[1] = v;
        } else {
          values[2] = v;
        }
      } else {
        if (v < values[3]) {
          values[4] = values[3];
          values[3] = v;
        } else {
          values[4] = v;
        }
        high = false;
      }
    } else {
      if (values[2] < v) {
        values[0] = values[1];
        values[1] = values[2];
        if (values[4] < v) {
          values[2] = values[3];
          values[3] = values[4];
          values[4] = v;
        } else if (values[3] < v) {
          values[2] = values[3];
          values[3] = v;
        } else {
          values[2] = v;
        }
      } else {
        if (values[1] < v) {
          values[0] = values[1];
          values[1] = v;
        } else {
          values[0] = v;
        }
        high = true;
      }
    }
  }

  i32 get() const { return values[2]; }
};

// ---------------------------------------------------------------------------
// Shared GPS-time model constants (GPSTIME11 v2 == the per-context body of
// the POINT14 v3 GPS layer; LASzip spec constants).
// ---------------------------------------------------------------------------

constexpr i32 kGpsMulti = 500;
constexpr i32 kGpsMultiMinus = -10;
constexpr u32 kGpsMultiUnchanged = kGpsMulti - kGpsMultiMinus + 1;  // 511
constexpr u32 kGpsMultiCodeFull = kGpsMulti - kGpsMultiMinus + 2;   // 512
constexpr u32 kGpsMultiTotal = kGpsMulti - kGpsMultiMinus + 6;      // 516

// ---------------------------------------------------------------------------
// Shared RGB diff-coder core: the RGB12 v2 item coding, which is ALSO the
// per-scanner-channel-context body of RGB14 v3.  Callers own where the state
// lives (flat item state in the sequential codec, per-context structs in the
// layered codec) and hand it here by reference, so a fix lands in both
// framings at once.
// ---------------------------------------------------------------------------

struct RgbModels {
  u16 last[3];
  SymbolModel m_byte_used;
  SymbolModel m_diff[6];  // r-lo, r-hi, g-lo, g-hi, b-lo, b-hi

  void init(const u8* seed6, bool for_compress) {
    std::memcpy(last, seed6, 6);
    m_byte_used.init(128, for_compress);
    for (auto& m : m_diff) m.init(256, for_compress);
  }
};

inline u8 rgb_clamp8(i32 v) {
  return v < 0 ? 0 : (v > 255 ? 255 : static_cast<u8>(v));
}

inline void rgb_read(Decoder& dec, RgbModels& c, u8* out) {
  u16 item[3];
  const u32 sym = dec.decode_symbol(c.m_byte_used);
  if (sym & 1)
    item[0] = static_cast<u16>(
        (dec.decode_symbol(c.m_diff[0]) + (c.last[0] & 0xFF)) & 0xFF);
  else
    item[0] = c.last[0] & 0xFF;
  if (sym & 2)
    item[0] |= static_cast<u16>(
        ((dec.decode_symbol(c.m_diff[1]) + (c.last[0] >> 8)) & 0xFF) << 8);
  else
    item[0] |= c.last[0] & 0xFF00;
  if (sym & 64) {
    i32 diff = (item[0] & 0xFF) - (c.last[0] & 0xFF);
    if (sym & 4)
      item[1] = static_cast<u16>(
          (dec.decode_symbol(c.m_diff[2]) +
           rgb_clamp8(diff + (c.last[1] & 0xFF))) & 0xFF);
    else
      item[1] = c.last[1] & 0xFF;
    if (sym & 16) {
      const i32 d2 = (diff + ((item[1] & 0xFF) - (c.last[1] & 0xFF))) / 2;
      item[2] = static_cast<u16>(
          (dec.decode_symbol(c.m_diff[4]) +
           rgb_clamp8(d2 + (c.last[2] & 0xFF))) & 0xFF);
    } else {
      item[2] = c.last[2] & 0xFF;
    }
    diff = (item[0] >> 8) - (c.last[0] >> 8);
    if (sym & 8)
      item[1] |= static_cast<u16>(
          ((dec.decode_symbol(c.m_diff[3]) +
            rgb_clamp8(diff + (c.last[1] >> 8))) & 0xFF) << 8);
    else
      item[1] |= c.last[1] & 0xFF00;
    if (sym & 32) {
      const i32 d2 = (diff + ((item[1] >> 8) - (c.last[1] >> 8))) / 2;
      item[2] |= static_cast<u16>(
          ((dec.decode_symbol(c.m_diff[5]) +
            rgb_clamp8(d2 + (c.last[2] >> 8))) & 0xFF) << 8);
    } else {
      item[2] |= c.last[2] & 0xFF00;
    }
  } else {
    item[1] = item[0];
    item[2] = item[0];
  }
  std::memcpy(out, item, 6);
  std::memcpy(c.last, item, 6);
}

inline void rgb_write(Encoder& enc, RgbModels& c, const u8* cur6) {
  u16 item[3];
  std::memcpy(item, cur6, 6);
  u32 sym = 0;
  if ((c.last[0] & 0x00FF) != (item[0] & 0x00FF)) sym |= 1;
  if ((c.last[0] & 0xFF00) != (item[0] & 0xFF00)) sym |= 2;
  if ((c.last[1] & 0x00FF) != (item[1] & 0x00FF)) sym |= 4;
  if ((c.last[1] & 0xFF00) != (item[1] & 0xFF00)) sym |= 8;
  if ((c.last[2] & 0x00FF) != (item[2] & 0x00FF)) sym |= 16;
  if ((c.last[2] & 0xFF00) != (item[2] & 0xFF00)) sym |= 32;
  const bool differ = ((item[0] & 0x00FF) != (item[1] & 0x00FF)) ||
                      ((item[0] & 0x00FF) != (item[2] & 0x00FF)) ||
                      ((item[0] & 0xFF00) != (item[1] & 0xFF00)) ||
                      ((item[0] & 0xFF00) != (item[2] & 0xFF00));
  if (differ) sym |= 64;
  enc.encode_symbol(c.m_byte_used, sym);
  i32 diff;
  if (sym & 1) {
    diff = (item[0] & 0xFF) - (c.last[0] & 0xFF);
    enc.encode_symbol(c.m_diff[0], static_cast<u8>(diff));
  }
  if (sym & 2) {
    diff = (item[0] >> 8) - (c.last[0] >> 8);
    enc.encode_symbol(c.m_diff[1], static_cast<u8>(diff));
  }
  if (sym & 64) {
    if (sym & 4) {
      diff = (item[0] & 0xFF) - (c.last[0] & 0xFF);
      enc.encode_symbol(
          c.m_diff[2],
          static_cast<u8>((item[1] & 0xFF) -
                          rgb_clamp8(diff + (c.last[1] & 0xFF))));
    }
    if (sym & 16) {
      diff = (((item[0] & 0xFF) - (c.last[0] & 0xFF)) +
              ((item[1] & 0xFF) - (c.last[1] & 0xFF))) / 2;
      enc.encode_symbol(
          c.m_diff[4],
          static_cast<u8>((item[2] & 0xFF) -
                          rgb_clamp8(diff + (c.last[2] & 0xFF))));
    }
    if (sym & 8) {
      diff = (item[0] >> 8) - (c.last[0] >> 8);
      enc.encode_symbol(
          c.m_diff[3],
          static_cast<u8>((item[1] >> 8) -
                          rgb_clamp8(diff + (c.last[1] >> 8))));
    }
    if (sym & 32) {
      diff = (((item[0] >> 8) - (c.last[0] >> 8)) +
              ((item[1] >> 8) - (c.last[1] >> 8))) / 2;
      enc.encode_symbol(
          c.m_diff[5],
          static_cast<u8>((item[2] >> 8) -
                          rgb_clamp8(diff + (c.last[2] >> 8))));
    }
  }
  std::memcpy(c.last, item, 6);
}

// ---------------------------------------------------------------------------
// Shared wave-packet diff-coder core: the WAVEPACKET13 v1 item coding, which
// is ALSO the per-scanner-channel-context body of WAVEPACKET14 v3 (the same
// sharing pattern as RgbModels above).  Covers the 29-byte LAS wave-packet
// block of point formats 4/5 (sequential) and 9/10 (layered) — the reference
// ingests these through the Rust `laz` crate (treee/src/laz.rs:147-159).
//
// Derived from the published LASzip algorithm; like the rest of this codec it
// is validated by roundtrip + unit tests (no ground-truth .laz in this
// environment).  Layout notes kept honest: the raw 64-bit offset escape is
// written low-32-then-high-32 (LASzip's writeInt64 order), and the offset
// case model is context-switched on the PREVIOUS point's case symbol.
// ---------------------------------------------------------------------------

#pragma pack(push, 1)
struct WavepacketData {  // LAS wave-packet block, 29 bytes on disk
  u8 index;              // wave packet descriptor index
  u64 offset;            // byte offset to waveform data
  u32 packet_size;       // waveform packet size in bytes
  i32 return_point;      // f32 bits: return point waveform location
  i32 x, y, z;           // f32 bits: parametric dx/dy/dt
};
#pragma pack(pop)
static_assert(sizeof(WavepacketData) == 29, "LAS wave packet is 29 bytes");

struct WavepacketModels {
  WavepacketData last;
  u32 sym_last_offset_diff;  // previous offset-case symbol (0..3)
  i32 last_diff_32;          // last 32-bit offset delta (case-2 predictor)
  SymbolModel m_packet_index;
  SymbolModel m_offset_diff[4];  // offset case, context = previous case
  IntegerCompressor ic_offset_diff, ic_packet_size, ic_return_point, ic_xyz;

  void init(const u8* seed29, bool for_compress) {
    std::memcpy(&last, seed29, sizeof(WavepacketData));
    sym_last_offset_diff = 0;
    last_diff_32 = 0;
    m_packet_index.init(256, for_compress);
    for (auto& m : m_offset_diff) m.init(4, for_compress);
    ic_offset_diff.init(32, 1, for_compress);
    ic_packet_size.init(32, 1, for_compress);
    ic_return_point.init(32, 1, for_compress);
    ic_xyz.init(32, 3, for_compress);
  }
};

inline void wavepacket_read(Decoder& dec, WavepacketModels& c, u8* out) {
  WavepacketData cur;
  cur.index = static_cast<u8>(dec.decode_symbol(c.m_packet_index));
  const u32 sym = dec.decode_symbol(c.m_offset_diff[c.sym_last_offset_diff]);
  c.sym_last_offset_diff = sym;
  switch (sym) {
    case 0:  // same offset (re-referenced waveform)
      cur.offset = c.last.offset;
      break;
    case 1:  // contiguous: previous offset + previous size
      cur.offset = c.last.offset + c.last.packet_size;
      break;
    case 2:  // 32-bit delta, predicted by the last delta
      c.last_diff_32 = c.ic_offset_diff.decompress(dec, c.last_diff_32, 0);
      cur.offset = static_cast<u64>(static_cast<i64>(c.last.offset) +
                                    c.last_diff_32);
      break;
    default: {  // raw 64-bit escape, low 32 first
      const u64 lo = dec.read_bits(32);
      const u64 hi = dec.read_bits(32);
      cur.offset = (hi << 32) | lo;
      break;
    }
  }
  cur.packet_size = static_cast<u32>(c.ic_packet_size.decompress(
      dec, static_cast<i32>(c.last.packet_size), 0));
  cur.return_point = c.ic_return_point.decompress(dec, c.last.return_point, 0);
  cur.x = c.ic_xyz.decompress(dec, c.last.x, 0);
  cur.y = c.ic_xyz.decompress(dec, c.last.y, 1);
  cur.z = c.ic_xyz.decompress(dec, c.last.z, 2);
  std::memcpy(out, &cur, sizeof(WavepacketData));
  c.last = cur;
}

inline void wavepacket_write(Encoder& enc, WavepacketModels& c,
                             const u8* cur29) {
  WavepacketData cur;
  std::memcpy(&cur, cur29, sizeof(WavepacketData));
  enc.encode_symbol(c.m_packet_index, cur.index);
  const i64 diff64 =
      static_cast<i64>(cur.offset) - static_cast<i64>(c.last.offset);
  u32 sym;
  if (cur.offset == c.last.offset) sym = 0;
  else if (cur.offset == c.last.offset + c.last.packet_size) sym = 1;
  else if (diff64 == static_cast<i64>(static_cast<i32>(diff64))) sym = 2;
  else sym = 3;
  enc.encode_symbol(c.m_offset_diff[c.sym_last_offset_diff], sym);
  c.sym_last_offset_diff = sym;
  if (sym == 2) {
    const i32 d = static_cast<i32>(diff64);
    c.ic_offset_diff.compress(enc, c.last_diff_32, d, 0);
    c.last_diff_32 = d;
  } else if (sym == 3) {
    enc.write_bits(32, static_cast<u32>(cur.offset));
    enc.write_bits(32, static_cast<u32>(cur.offset >> 32));
  }
  c.ic_packet_size.compress(enc, static_cast<i32>(c.last.packet_size),
                            static_cast<i32>(cur.packet_size), 0);
  c.ic_return_point.compress(enc, c.last.return_point, cur.return_point, 0);
  c.ic_xyz.compress(enc, c.last.x, cur.x, 0);
  c.ic_xyz.compress(enc, c.last.y, cur.y, 1);
  c.ic_xyz.compress(enc, c.last.z, cur.z, 2);
  c.last = cur;
}

// ---------------------------------------------------------------------------
// Shared chunked-stream framing, both directions.  The sequential (v2) and
// layered (v3) codecs differ only in how one chunk is (de)coded; the chunk
// table, its corruption bounds, stream-written offset==-1 handling,
// variable-size-chunk interleave, and the worker pool are identical and live
// here so a fix cannot land in one framing generation and miss the other.
// ---------------------------------------------------------------------------

struct ChunkTable {
  bool variable = false;
  std::vector<u64> sizes;   // compressed byte size per chunk
  std::vector<u32> counts;  // points per chunk (variable framing only)
};

// Decode the chunk table trailing the point data: u32 version, u32
// n_chunks, then IC(32,2)-coded entries — byte sizes (context 1), preceded
// per chunk by a point count (context 0) when the VLR declares
// variable-size chunks (chunk_size == 0xFFFFFFFF).
//
// ``bound_points`` caps how many table entries are read (the allocation /
// DoS bound: a corrupt count would otherwise drive a multi-GB zero-filled
// vector + a ~4G-iteration table decode).  Clamp rather than reject in
// BOTH framings: every chunk holds >= 1 point, so the first bound_points
// entries always cover a decode of that many points — which also makes a
// small prefix decode (max_points / streaming) legal on a variable-chunk
// file with more chunks than requested points (advisor r4).
inline int read_chunk_table(const u8* file, u64 file_len,
                            u64 point_data_offset, u32 chunk_size,
                            u64 bound_points, ChunkTable* out) {
  if (point_data_offset + 8 > file_len) return 1;

  i64 table_offset;
  std::memcpy(&table_offset, file + point_data_offset, 8);
  if (table_offset == -1) {
    // stream-written files (non-seekable writers) store -1 here and append
    // the real chunk-table offset as the file's final 8 bytes
    if (file_len < 8) return 1;
    std::memcpy(&table_offset, file + file_len - 8, 8);
  }
  if (table_offset < 0 || static_cast<u64>(table_offset) + 8 > file_len)
    return 1;

  u32 version, n_chunks;
  std::memcpy(&version, file + table_offset, 4);
  std::memcpy(&n_chunks, file + table_offset + 4, 4);
  if (version != 0) return 2;

  const bool variable = chunk_size == 0xFFFFFFFFu;
  if (!variable && chunk_size == 0) return 1;
  {
    const u64 data_bytes = file_len - point_data_offset;
    u64 cap;
    if (variable) {
      // each chunk holds >= 1 point and occupies >= 1 data byte
      cap = bound_points < data_bytes ? bound_points : data_bytes;
    } else {
      cap = (bound_points + chunk_size - 1) / chunk_size;
    }
    if (n_chunks > cap) n_chunks = static_cast<u32>(cap);
  }

  out->variable = variable;
  out->sizes.assign(n_chunks, 0);
  out->counts.clear();
  if (variable) out->counts.assign(n_chunks, 0);
  Decoder dec;
  dec.init(file + table_offset + 8, file_len - (table_offset + 8));
  IntegerCompressor ic;
  ic.init(32, 2, /*for_compress=*/false);
  i32 prev = 0, prev_count = 0;
  for (u32 i = 0; i < n_chunks; ++i) {
    if (variable) {
      prev_count = ic.decompress(dec, prev_count, 0);
      out->counts[i] = static_cast<u32>(prev_count);
    }
    prev = ic.decompress(dec, prev, 1);
    out->sizes[i] = static_cast<u32>(prev);
  }
  return 0;
}

// decode_chunk(data, avail, n_points, truncated, out_records) -> int rc
// (truncated: this chunk is decoded PARTIALLY — fewer points than it
// holds per the chunk table — so count cross-checks must relax)
template <class DecodeChunk>
// ``first_point``: decode starts at this absolute point index (chunks are
// independent streams, so earlier chunks are skipped without decoding —
// the ingest-preview streaming path).  Must be chunk-aligned (returns 2
// otherwise); ``n_points`` counts points decoded FROM first_point.
inline int chunked_decompress_stream(const u8* file, u64 file_len,
                                     u64 point_data_offset, u64 n_points,
                                     u32 point_length, u32 chunk_size,
                                     u8* out, i32 n_threads, u64 first_point,
                                     DecodeChunk&& decode_chunk) {
  ChunkTable table;
  {
    const int rc = read_chunk_table(file, file_len, point_data_offset,
                                    chunk_size, first_point + n_points,
                                    &table);
    if (rc) return rc;
  }
  const bool variable = table.variable;
  const std::vector<u64>& sizes = table.sizes;
  const std::vector<u32>& counts = table.counts;
  const u32 n_chunks = static_cast<u32>(sizes.size());

  struct ChunkRange {
    u64 offset;
    u32 n_points;
    u64 out_index;
    bool truncated;  // decoding fewer points than the chunk holds
  };
  std::vector<ChunkRange> ranges;
  u64 off = point_data_offset + 8;
  u64 skip = first_point, remaining = n_points, out_idx = 0;
  for (u32 i = 0; i < n_chunks && remaining; ++i) {
    const u64 cnt = variable ? counts[i] : chunk_size;
    if (skip) {
      // skip whole chunks before first_point without decoding them
      if (skip < cnt) return 2;  // first_point not chunk-aligned
      skip -= cnt;
      off += sizes[i];
      if (off > file_len) return 1;
      continue;
    }
    u64 want = cnt;
    if (want > remaining) want = remaining;
    const u32 npts = static_cast<u32>(want);
    // NOTE: for FIXED-size chunks the table stores no counts, so the
    // file's final chunk (cnt = chunk_size but fewer points remain) is
    // indistinguishable from a requested truncation — both carry
    // truncated=true and the in-chunk count check relaxes to >=.
    ranges.push_back({off, npts, out_idx, want < cnt});
    off += sizes[i];
    out_idx += npts;
    remaining -= npts;
    if (off > file_len) return 1;
  }
  if (skip || remaining) return 1;

  unsigned hw = std::thread::hardware_concurrency();
  u64 workers =
      n_threads > 0 ? static_cast<u64>(n_threads) : (hw > 0 ? hw : 4);
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
      const int rc = decode_chunk(file + r.offset, avail, r.n_points,
                                  r.truncated,
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

// compress_one(records_at_i, n_points_in_chunk, &chunk_bytes) -> int rc
template <class CompressChunk>
inline int chunked_compress_stream(const u8* records, u64 n_points,
                                   u32 point_length, u32 chunk_size,
                                   u64 base_offset, u8* out_buf, u64 out_cap,
                                   u64* out_len,
                                   CompressChunk&& compress_one) {
  if (chunk_size == 0 || chunk_size == 0xFFFFFFFFu) chunk_size = 50000;

  std::vector<std::vector<u8>> chunks;
  for (u64 i = 0; i < n_points; i += chunk_size) {
    const u32 npts = static_cast<u32>(
        (n_points - i) < chunk_size ? (n_points - i) : chunk_size);
    chunks.emplace_back();
    const int rc =
        compress_one(records + i * point_length, npts, &chunks.back());
    if (rc) return rc;
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

}  // namespace laszip

