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

#include <cstdint>
#include <cstring>
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

  u8 in_byte() { return pos < len ? in[pos++] : 0; }

  void init(const u8* data, size_t n) {
    in = data;
    len = n;
    pos = 0;
    value = (u32(in_byte()) << 24) | (u32(in_byte()) << 16) |
            (u32(in_byte()) << 8) | u32(in_byte());
    length = AC_MaxLength;
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
      const u32 t = dv >> m.table_shift;
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

}  // namespace laszip
