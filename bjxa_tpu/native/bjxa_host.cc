// bjxa-tpu native host runtime.
//
// The TPU owns bulk/corpus work; this library owns the *streaming* hot path
// on the host CPU: block-at-a-time decode/encode where a device round trip
// per 32-sample block would be pure launch latency.  It is a fresh C++
// implementation of the XA block semantics (spec: reference bjxa.5.rst;
// decode recurrence anchored at reference src/libbjxa.c:533-578) operating
// on whole buffers rather than per-block callbacks.
//
// Exposed as a flat C ABI for ctypes.  All functions return 0 on success or
// a negative errno-style code:
//   -EPROTO (-71)  invalid profile factor / bad bit depth
//   -EINVAL (-22)  bad argument combination

#include <algorithm>
#include <array>
#include <cerrno>
#include <cstdint>
#include <cstring>

namespace {

constexpr int kBlockSamples = 32;
constexpr int kNumFactors = 5;

// Fixed-point (x256) two-tap prediction gains, indexed by profile factor.
constexpr std::array<std::array<int32_t, 2>, kNumFactors> kGain = {{
    {0, 0}, {240, 0}, {460, -208}, {392, -220}, {488, -240},
}};

inline int32_t clamp16(int32_t v) {
  return std::min<int32_t>(std::max<int32_t>(v, INT16_MIN), INT16_MAX);
}

// C-style truncating division by 256.
inline int32_t gain_div256(int32_t g) { return (g + ((g >> 31) & 255)) >> 8; }

inline int block_size_for(int bits) { return bits * 4 + 1; }

// Unpack one block payload into "top-bits" int16-domain values.
void unpack(const uint8_t* src, int bits, int32_t out[kBlockSamples]) {
  switch (bits) {
    case 4:
      for (int i = 0; i < 16; i++) {
        out[2 * i] = static_cast<int16_t>((src[i] & 0xf0u) << 8);
        out[2 * i + 1] = static_cast<int16_t>((src[i] & 0x0fu) << 12);
      }
      break;
    case 6:
      for (int i = 0; i < 8; i++) {
        const uint32_t w = (static_cast<uint32_t>(src[3 * i]) << 16) |
                           (static_cast<uint32_t>(src[3 * i + 1]) << 8) |
                           src[3 * i + 2];
        out[4 * i] = static_cast<int16_t>((w & 0x00fc0000u) >> 8);
        out[4 * i + 1] = static_cast<int16_t>((w & 0x0003f000u) >> 2);
        out[4 * i + 2] = static_cast<int16_t>((w & 0x00000fc0u) << 4);
        out[4 * i + 3] = static_cast<int16_t>((w & 0x0000003fu) << 10);
      }
      break;
    default:  // 8
      for (int i = 0; i < kBlockSamples; i++)
        out[i] = static_cast<int16_t>(src[i] << 8);
  }
}

// Pack "top-bits" int16-domain values into a block payload.
void pack(const int32_t in[kBlockSamples], int bits, uint8_t* dst) {
  switch (bits) {
    case 4:
      for (int i = 0; i < 16; i++) {
        const uint16_t a = static_cast<uint16_t>(in[2 * i]);
        const uint16_t b = static_cast<uint16_t>(in[2 * i + 1]);
        dst[i] = static_cast<uint8_t>(((a >> 8) & 0xf0) | (b >> 12));
      }
      break;
    case 6:
      for (int i = 0; i < 8; i++) {
        uint32_t w = 0;
        for (int j = 0; j < 4; j++)
          w |= static_cast<uint32_t>(
                   (static_cast<uint16_t>(in[4 * i + j]) >> 10))
               << (18 - 6 * j);
        dst[3 * i] = static_cast<uint8_t>(w >> 16);
        dst[3 * i + 1] = static_cast<uint8_t>(w >> 8);
        dst[3 * i + 2] = static_cast<uint8_t>(w);
      }
      break;
    default:  // 8
      for (int i = 0; i < kBlockSamples; i++)
        dst[i] = static_cast<uint8_t>(static_cast<uint16_t>(in[i]) >> 8);
  }
}

// Run the prediction filter over one unpacked block for one channel.
// Returns false on an invalid profile factor.
bool filter_block(const int32_t ranged_src[kBlockSamples], uint8_t profile,
                  int32_t* p0, int32_t* p1, int16_t* out, int stride) {
  const int factor = profile >> 4;
  const int shift = profile & 0x0f;
  if (factor >= kNumFactors) return false;
  const int32_t k0 = kGain[factor][0];
  const int32_t k1 = kGain[factor][1];
  int32_t a = *p0, b = *p1;
  for (int n = 0; n < kBlockSamples; n++) {
    const int32_t ranged = ranged_src[n] >> shift;
    const int32_t s = clamp16(ranged + gain_div256(a * k0 + b * k1));
    b = a;
    a = s;
    out[n * stride] = static_cast<int16_t>(s);
  }
  *p0 = a;
  *p1 = b;
  return true;
}

}  // namespace

extern "C" {

// Decode `nblocks` effective blocks.
//   blocks: [nblocks][channels][block_size] raw XA bytes
//   state:  [channels][2] predictor taps, updated in place
//   pcm:    [nblocks*32][channels] interleaved output
// On an invalid profile, decoding stops and -EPROTO is returned;
// *blocks_done reports how many whole effective blocks were produced.
int bjxa_host_decode_blocks(const uint8_t* blocks, uint32_t nblocks,
                            uint32_t channels, uint32_t bits, int32_t* state,
                            int16_t* pcm, uint32_t* blocks_done) {
  if (blocks == nullptr || state == nullptr || pcm == nullptr) return -EINVAL;
  if ((bits != 4 && bits != 6 && bits != 8) || channels < 1 || channels > 2)
    return -EINVAL;
  const int bsz = block_size_for(static_cast<int>(bits));
  int32_t ranged[kBlockSamples];
  uint32_t done = 0;
  for (uint32_t i = 0; i < nblocks; i++) {
    for (uint32_t c = 0; c < channels; c++) {
      const uint8_t* src = blocks + (i * channels + c) * bsz;
      unpack(src + 1, static_cast<int>(bits), ranged);
      if (!filter_block(ranged, src[0], &state[2 * c], &state[2 * c + 1],
                        pcm + (i * kBlockSamples * channels) + c,
                        static_cast<int>(channels))) {
        if (blocks_done != nullptr) *blocks_done = done;
        return -EPROTO;
      }
    }
    done++;
  }
  if (blocks_done != nullptr) *blocks_done = done;
  return 0;
}

// Reference-compatible truncation encode: profile 0, keep top bits.
//   pcm: [nblocks*32][channels] interleaved (caller zero-pads the tail)
//   out: [nblocks][channels][block_size]
int bjxa_host_encode_truncate(const int16_t* pcm, uint32_t nblocks,
                              uint32_t channels, uint32_t bits, uint8_t* out) {
  if (pcm == nullptr || out == nullptr) return -EINVAL;
  if ((bits != 4 && bits != 6 && bits != 8) || channels < 1 || channels > 2)
    return -EINVAL;
  const int bsz = block_size_for(static_cast<int>(bits));
  int32_t vals[kBlockSamples];
  for (uint32_t i = 0; i < nblocks; i++) {
    for (uint32_t c = 0; c < channels; c++) {
      for (int n = 0; n < kBlockSamples; n++)
        vals[n] = pcm[(i * kBlockSamples + n) * channels + c];
      uint8_t* dst = out + (i * channels + c) * bsz;
      dst[0] = 0;
      pack(vals, static_cast<int>(bits), dst + 1);
    }
  }
  return 0;
}

// Exhaustive per-block profile search encode (greedy across blocks), the
// host twin of the device kernel in bjxa_tpu/ops/encode.py.
//   pcm:   [nblocks*32][channels] interleaved target samples
//   state: [channels][2] predictor taps, updated in place
//   out:   [nblocks][channels][block_size]
int bjxa_host_encode_search(const int16_t* pcm, uint32_t nblocks,
                            uint32_t channels, uint32_t bits, int32_t* state,
                            uint8_t* out) {
  if (pcm == nullptr || state == nullptr || out == nullptr) return -EINVAL;
  if ((bits != 4 && bits != 6 && bits != 8) || channels < 1 || channels > 2)
    return -EINVAL;
  const int bsz = block_size_for(static_cast<int>(bits));
  const int shq = 16 - static_cast<int>(bits);
  const int32_t qmin = -(1 << (bits - 1));
  const int32_t qmax = (1 << (bits - 1)) - 1;

  int32_t coded[kBlockSamples];
  int32_t best_coded[kBlockSamples];
  for (uint32_t i = 0; i < nblocks; i++) {
    for (uint32_t c = 0; c < channels; c++) {
      float best_err = -1.0f;
      int best_profile = 0;
      int32_t best_p0 = 0, best_p1 = 0;
      for (int factor = 0; factor < kNumFactors; factor++) {
        const int32_t k0 = kGain[factor][0];
        const int32_t k1 = kGain[factor][1];
        for (int range = 0; range < 16; range++) {
          int32_t a = state[2 * c], b = state[2 * c + 1];
          float err = 0.0f;
          for (int n = 0; n < kBlockSamples; n++) {
            const int32_t x = pcm[(i * kBlockSamples + n) * channels + c];
            const int32_t pred = gain_div256(a * k0 + b * k1);
            const int32_t diff = x - pred;
            int32_t q;
            if (range <= shq) {
              const int sh = shq - range;
              q = (diff + ((1 << sh) >> 1)) >> sh;
            } else {
              q = diff << (range - shq);
            }
            q = std::min(std::max(q, qmin), qmax);
            const int32_t d = q << shq;
            const int32_t recon = clamp16((d >> range) + pred);
            const float e = static_cast<float>(x - recon);
            err += e * e;
            b = a;
            a = recon;
            coded[n] = d;
          }
          if (best_err < 0.0f || err < best_err) {
            best_err = err;
            best_profile = (factor << 4) | range;
            best_p0 = a;
            best_p1 = b;
            std::memcpy(best_coded, coded, sizeof(coded));
          }
        }
      }
      uint8_t* dst = out + (i * channels + c) * bsz;
      dst[0] = static_cast<uint8_t>(best_profile);
      pack(best_coded, static_cast<int>(bits), dst + 1);
      state[2 * c] = best_p0;
      state[2 * c + 1] = best_p1;
    }
  }
  return 0;
}

uint32_t bjxa_host_abi_version(void) { return 1; }

}  // extern "C"
