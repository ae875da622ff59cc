// Native entropy codec for basic_video_codec_tpu.
//
// Exp-Golomb bit packing/parsing and RLE block expansion are the only
// inherently-sequential, variable-length parts of the codec (reference
// encoder/entropy_encoder.py semantics); everything else runs on the TPU.
// These run on host as tight C loops, exposed via a plain C ABI for ctypes.
//
// Bitstream format (bit-compatible with the reference):
//   signed map: v <= 0 -> -2v, v > 0 -> 2v-1; codeword for mapped m is
//   (n-1) zero bits + n-bit binary of (m+1), MSB first.
//   RLE symbols per block scan: +n = n zeros, -n = n literals follow,
//   0 = rest-of-block zeros; EOB marker terminates each block.

#include <cstdint>
#include <cstring>

namespace {

inline void put_bits(uint8_t* buf, int64_t& pos, uint64_t value, int nbits) {
  for (int i = nbits - 1; i >= 0; --i) {
    buf[pos >> 3] |= uint8_t(((value >> i) & 1ull) << (7 - (pos & 7)));
    ++pos;
  }
}

inline int bit_at(const uint8_t* buf, int64_t pos) {
  return (buf[pos >> 3] >> (7 - (pos & 7))) & 1;
}

// Decode one exp-Golomb symbol at `pos`; returns false on end-of-stream
// (trailing byte padding).  Advances pos past the codeword.
inline bool get_symbol(const uint8_t* buf, int64_t n_bits, int64_t& pos, int64_t& out) {
  int64_t m = 0;
  while (pos + m < n_bits && !bit_at(buf, pos + m)) ++m;
  if (pos + m >= n_bits) return false;  // padding tail
  uint64_t value = 1;
  for (int64_t i = 1; i <= m; ++i) value = (value << 1) | uint64_t(bit_at(buf, pos + m + i));
  value -= 1;
  out = (value % 2 == 0) ? -int64_t(value / 2) : int64_t((value + 1) / 2);
  pos += 2 * m + 1;
  return true;
}

}  // namespace

extern "C" {

// Encode n signed symbols; out must be zeroed, cap_bytes its capacity.
// Returns the bit length, or -1 if out of capacity.
int64_t bvc_encode_symbols(const int64_t* syms, int64_t n, uint8_t* out,
                           int64_t cap_bytes) {
  int64_t pos = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t v = syms[i];
    uint64_t mapped = v <= 0 ? uint64_t(-2 * v) : uint64_t(2 * v - 1);
    uint64_t x = mapped + 1;
    int nbits = 64 - __builtin_clzll(x);
    int total = 2 * nbits - 1;  // (nbits-1) leading zeros + nbits value bits
    if ((pos + total + 7) / 8 > cap_bytes) return -1;
    put_bits(out, pos, x, total);
  }
  return pos;
}

// Decode consecutive symbols until the stream (n_bits) is exhausted or cap
// symbols are produced.  Returns the symbol count.
int64_t bvc_decode_symbols(const uint8_t* buf, int64_t n_bits, int64_t* out,
                           int64_t cap) {
  int64_t pos = 0, count = 0, v;
  while (count < cap && get_symbol(buf, n_bits, pos, v)) out[count++] = v;
  return count;
}

// Decode a frame's DCT payload straight into zigzag scans:
// exp-Golomb symbols -> RLE expansion, blocks delimited by `eob`.
// out must be a zeroed int32 buffer of n_blocks * scan_len.
// Returns the number of completed blocks.
int64_t bvc_decode_dct_blocks(const uint8_t* buf, int64_t n_bits,
                              int32_t* out, int64_t n_blocks,
                              int64_t scan_len, int64_t eob) {
  int64_t pos = 0, blk = 0, idx = 0, v;
  while (blk < n_blocks && get_symbol(buf, n_bits, pos, v)) {
    if (v == eob) {
      ++blk;
      idx = 0;
    } else if (idx >= scan_len) {
      // malformed run past the block end; ignore until EOB
    } else if (v == 0) {
      idx = scan_len;  // rest of block is zeros
    } else if (v > 0) {
      idx += v;  // run of zeros
    } else {
      int64_t cnt = -v;
      for (int64_t k = 0; k < cnt && get_symbol(buf, n_bits, pos, v); ++k) {
        if (idx < scan_len) out[blk * scan_len + idx++] = int32_t(v);
      }
    }
  }
  return blk;
}

int64_t bvc_version() { return 1; }

}  // extern "C"
