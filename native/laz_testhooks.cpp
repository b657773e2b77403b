// Test hooks exposing LASzip codec internals for table-driven unit tests.
//
// The codec has no ground-truth .laz sample in this environment, so the
// roundtrip tests can't catch a bug that encoder and decoder share.  These
// hooks let Python tests pin the at-risk details (CLAUDE.md) against
// HAND-DERIVED expectations of the published algorithm:
//   - StreamingMedian5's alternating high/low insertion bias,
//   - the IntegerCompressor's corrector k-width mapping and context chaining,
//   - POINT10's changed_values bit assignments,
//   - the chunk-table corrector context (IC(32,2), sizes in context 1).

#include <cstring>
#include <vector>

#include "laszip_core.h"

extern "C" {

// Feed ``n`` values into a fresh StreamingMedian5; write get() after each add.
void treee_laz_test_median5(const laszip::i32* values, laszip::u32 n,
                            laszip::i32* medians_out) {
  laszip::StreamingMedian5 m;
  m.init();
  for (laszip::u32 i = 0; i < n; ++i) {
    m.add(values[i]);
    medians_out[i] = m.get();
  }
}

// Encode a wave-packet transition (last -> cur) with a fresh WavepacketModels
// and return the offset-case SYMBOL actually emitted (0 same / 1 contiguous /
// 2 32-bit delta / 3 raw 64-bit escape), extracted by decoding the stream:
// first the 256-symbol packet-index model, then the 4-symbol case model, both
// identically initialized.  Pins the documented case mapping against
// hand-derived expectations instead of roundtrip symmetry.
laszip::u32 treee_laz_test_wavepacket_offset_sym(const laszip::u8* last29,
                                                 const laszip::u8* cur29) {
  using namespace laszip;
  WavepacketModels codec;
  codec.init(last29, /*for_compress=*/true);
  Encoder enc;
  enc.init();
  wavepacket_write(enc, codec, cur29);
  enc.done();
  Decoder dec;
  dec.init(enc.out.data(), enc.out.size());
  SymbolModel m_index, m_case;
  m_index.init(256, /*for_compress=*/false);
  m_case.init(4, /*for_compress=*/false);
  dec.decode_symbol(m_index);
  return dec.decode_symbol(m_case);
}

// Compress (pred, real) pairs through an IntegerCompressor, then decompress;
// record the decoded values and the encoder's k (corrector bit width) per
// step.  Returns 0 on success.
int treee_laz_test_ic_roundtrip(laszip::u32 bits, laszip::u32 contexts,
                                const laszip::i32* preds,
                                const laszip::i32* reals,
                                const laszip::u32* ctxs, laszip::u32 n,
                                laszip::i32* decoded_out,
                                laszip::u32* k_out) {
  using namespace laszip;
  Encoder enc;
  enc.init();
  IntegerCompressor ic_w;
  ic_w.init(bits, contexts, /*for_compress=*/true);
  for (u32 i = 0; i < n; ++i) {
    ic_w.compress(enc, preds[i], reals[i], ctxs[i]);
    k_out[i] = ic_w.k;
  }
  enc.done();

  Decoder dec;
  dec.init(enc.out.data(), enc.out.size());
  IntegerCompressor ic_r;
  ic_r.init(bits, contexts, /*for_compress=*/false);
  for (u32 i = 0; i < n; ++i) {
    decoded_out[i] = ic_r.decompress(dec, preds[i], ctxs[i]);
    if (ic_r.k != k_out[i]) return 2;  // decoder must see the same k chain
  }
  return 0;
}

// Encode ``n`` chunk byte-sizes exactly like the chunk-table writer
// (IC(32,2), previous size as prediction, context 1), then decode them back.
int treee_laz_test_chunk_table(const laszip::u32* sizes, laszip::u32 n,
                               laszip::u32* decoded_out,
                               laszip::u8* stream_out,
                               laszip::u32 stream_cap,
                               laszip::u32* stream_len) {
  using namespace laszip;
  Encoder enc;
  enc.init();
  {
    IntegerCompressor ic;
    ic.init(32, 2, /*for_compress=*/true);
    i32 prev = 0;
    for (u32 i = 0; i < n; ++i) {
      ic.compress(enc, prev, static_cast<i32>(sizes[i]), 1);
      prev = static_cast<i32>(sizes[i]);
    }
    enc.done();
  }
  if (enc.out.size() > stream_cap) return 3;
  std::memcpy(stream_out, enc.out.data(), enc.out.size());
  *stream_len = static_cast<u32>(enc.out.size());

  Decoder dec;
  dec.init(enc.out.data(), enc.out.size());
  IntegerCompressor ic;
  ic.init(32, 2, /*for_compress=*/false);
  i32 prev = 0;
  for (u32 i = 0; i < n; ++i) {
    const i32 v = ic.decompress(dec, prev, 1);
    decoded_out[i] = static_cast<u32>(v);
    prev = v;
  }
  return 0;
}

// Rewrite a FIXED-chunk compressed stream (compress_stream layout:
// [i64 abs_table_offset][chunks][table]) into VARIABLE-chunk framing: the
// chunk table gains a per-chunk point count (IC context 0) before each byte
// size (context 1), as upstream LASzip writes when the VLR chunk size is
// 0xFFFFFFFF.  Lets tests exercise the variable-table decode path without a
// ground-truth variable-chunk .laz.
int treee_laz_rewrite_table_variable(const laszip::u8* stream,
                                     laszip::u64 stream_len,
                                     laszip::u64 base_offset,
                                     laszip::u32 n_points,
                                     laszip::u32 chunk_size,
                                     laszip::u8* out_buf,
                                     laszip::u64 out_cap,
                                     laszip::u64* out_len) {
  using namespace laszip;
  if (stream_len < 16 || chunk_size == 0) return 1;
  i64 abs_off;
  std::memcpy(&abs_off, stream, 8);
  if (abs_off < 0) return 1;
  const u64 rel = static_cast<u64>(abs_off) - base_offset;
  if (rel < 8 || rel + 8 > stream_len) return 1;

  u32 version, n_chunks;
  std::memcpy(&version, stream + rel, 4);
  std::memcpy(&n_chunks, stream + rel + 4, 4);
  if (version != 0) return 1;

  std::vector<u32> sizes(n_chunks);
  {
    Decoder dec;
    dec.init(stream + rel + 8, stream_len - (rel + 8));
    IntegerCompressor ic;
    ic.init(32, 2, /*for_compress=*/false);
    i32 prev = 0;
    for (u32 i = 0; i < n_chunks; ++i) {
      prev = ic.decompress(dec, prev, 1);
      sizes[i] = static_cast<u32>(prev);
    }
  }

  Encoder enc;
  enc.init();
  {
    IntegerCompressor ic;
    ic.init(32, 2, /*for_compress=*/true);
    i32 prev_count = 0, prev_size = 0;
    u64 left = n_points;
    for (u32 i = 0; i < n_chunks; ++i) {
      const u32 cnt = static_cast<u32>(
          left < chunk_size ? left : chunk_size);
      ic.compress(enc, prev_count, static_cast<i32>(cnt), 0);
      prev_count = static_cast<i32>(cnt);
      ic.compress(enc, prev_size, static_cast<i32>(sizes[i]), 1);
      prev_size = static_cast<i32>(sizes[i]);
      left -= cnt;
    }
    enc.done();
  }

  const u64 total = rel + 8 + enc.out.size();
  *out_len = total;
  if (total > out_cap) return 3;
  std::memcpy(out_buf, stream, rel);  // offset field + chunk data verbatim
  const i64 new_abs = static_cast<i64>(base_offset + rel);
  std::memcpy(out_buf, &new_abs, 8);  // table lands at the same offset
  std::memcpy(out_buf + rel, &version, 4);
  std::memcpy(out_buf + rel + 4, &n_chunks, 4);
  std::memcpy(out_buf + rel + 8, enc.out.data(), enc.out.size());
  return 0;
}

}  // extern "C"

