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

}  // extern "C"
