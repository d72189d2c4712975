// Native audio IO for the timbre-trap-tpu host data pipeline.
//
// The reference delegates audio decode/resample to torchaudio
// (timbre_trap/datasets/AudioDataset.py:49-86); here the hot host-side path
// is C++ so loader worker threads decode and resample outside the GIL:
//   * RIFF/WAVE parsing: PCM 8/16/24/32-bit and IEEE float32/64, any
//     channel count (downmixed to mono).
//   * Polyphase rational resampling with a Kaiser-windowed sinc filter
//     (same design family as scipy.signal.resample_poly).
//   * Infinity-norm normalization.
//
// Exposed as a minimal C ABI consumed via ctypes (native/__init__ builds the
// shared object with g++ on first use; Python falls back to scipy when the
// toolchain or the .so is unavailable).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

struct WavData {
  std::vector<float> samples;  // mono
  int sample_rate = 0;
};

uint32_t read_u32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}

uint16_t read_u16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0]) | (static_cast<uint16_t>(p[1]) << 8);
}

// Parse a RIFF/WAVE file into mono float samples. Returns false on error.
bool parse_wav(const uint8_t* data, size_t size, WavData* out) {
  if (size < 12 || std::memcmp(data, "RIFF", 4) != 0 ||
      std::memcmp(data + 8, "WAVE", 4) != 0) {
    return false;
  }
  uint16_t format = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  const uint8_t* pcm = nullptr;
  size_t pcm_size = 0;

  size_t pos = 12;
  while (pos + 8 <= size) {
    const uint8_t* chunk = data + pos;
    uint32_t chunk_size = read_u32(chunk + 4);
    const uint8_t* body = chunk + 8;
    if (pos + 8 + chunk_size > size) {
      chunk_size = static_cast<uint32_t>(size - pos - 8);
    }
    if (std::memcmp(chunk, "fmt ", 4) == 0 && chunk_size >= 16) {
      format = read_u16(body);
      channels = read_u16(body + 2);
      sample_rate = read_u32(body + 4);
      bits = read_u16(body + 14);
      if (format == 0xFFFE && chunk_size >= 40) {  // WAVE_FORMAT_EXTENSIBLE
        format = read_u16(body + 24);
      }
    } else if (std::memcmp(chunk, "data", 4) == 0) {
      pcm = body;
      pcm_size = chunk_size;
    }
    pos += 8 + chunk_size + (chunk_size & 1);  // chunks are word-aligned
  }
  if (!pcm || channels == 0 || sample_rate == 0) return false;

  const size_t bytes_per_sample = bits / 8;
  if (bytes_per_sample == 0) return false;
  const size_t frames = pcm_size / (bytes_per_sample * channels);
  out->samples.assign(frames, 0.0f);
  out->sample_rate = static_cast<int>(sample_rate);

  const double inv_channels = 1.0 / channels;
  for (size_t i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* s = pcm + (i * channels + c) * bytes_per_sample;
      double v = 0.0;
      if (format == 1) {  // integer PCM
        switch (bits) {
          case 8:
            v = (static_cast<int>(s[0]) - 128) / 128.0;
            break;
          case 16:
            v = static_cast<int16_t>(read_u16(s)) / 32768.0;
            break;
          case 24: {
            int32_t raw = static_cast<int32_t>(s[0]) |
                          (static_cast<int32_t>(s[1]) << 8) |
                          (static_cast<int32_t>(s[2]) << 16);
            if (raw & 0x800000) raw |= ~0xFFFFFF;
            v = raw / 8388608.0;
            break;
          }
          case 32:
            v = static_cast<int32_t>(read_u32(s)) / 2147483648.0;
            break;
          default:
            return false;
        }
      } else if (format == 3) {  // IEEE float
        if (bits == 32) {
          float f;
          std::memcpy(&f, s, 4);
          v = f;
        } else if (bits == 64) {
          double d;
          std::memcpy(&d, s, 8);
          v = d;
        } else {
          return false;
        }
      } else {
        return false;  // compressed formats are not supported natively
      }
      acc += v;
    }
    out->samples[i] = static_cast<float>(acc * inv_channels);
  }
  return true;
}

double bessel_i0(double x) {
  // Series expansion of the zeroth-order modified Bessel function.
  double sum = 1.0, term = 1.0;
  const double half_x = x / 2.0;
  for (int k = 1; k < 64; ++k) {
    term *= (half_x / k) * (half_x / k);
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

// Kaiser-windowed sinc low-pass with cutoff 1/max(p,q), half-width
// `half_len` taps per phase (scipy.resample_poly's design family).
std::vector<double> design_filter(int up, int down, int half_len_base,
                                  double beta) {
  const int max_rate = std::max(up, down);
  const double cutoff = 1.0 / max_rate;  // normalized to Nyquist of up-rate
  const int half_len = half_len_base * max_rate;
  const int n_taps = 2 * half_len + 1;
  std::vector<double> taps(n_taps);
  const double denom = bessel_i0(beta);
  for (int i = 0; i < n_taps; ++i) {
    const int m = i - half_len;
    const double x = cutoff * m;
    const double sinc = (m == 0) ? 1.0 : std::sin(M_PI * x) / (M_PI * x);
    const double r = static_cast<double>(i) / (n_taps - 1) * 2.0 - 1.0;
    const double window = bessel_i0(beta * std::sqrt(1.0 - r * r)) / denom;
    taps[i] = cutoff * sinc * window;
  }
  return taps;
}

}  // namespace

// Rational polyphase resampling (zero-stuff by `up`, filter, take every
// `down`-th), matching the alignment convention of resample_poly: output
// sample j corresponds to input position j * down / up. External linkage:
// shared with the MP3 decode path (mp3_decode.cc).
std::vector<float> tt_resample_poly(const std::vector<float>& x, int up,
                                    int down) {
  if (up == down) return x;
  std::vector<double> h = design_filter(up, down, 10, 8.555);
  const int half_len = (static_cast<int>(h.size()) - 1) / 2;
  const int64_t n_in = static_cast<int64_t>(x.size());
  const int64_t n_out = (n_in * up + down - 1) / down;
  std::vector<float> y(n_out, 0.0f);

  for (int64_t j = 0; j < n_out; ++j) {
    // position in the up-sampled stream, centered filter
    const int64_t t = j * down;
    double acc = 0.0;
    // up-sampled index u contributes x[u/up] when u % up == 0
    // taps index: k = t - u + half_len
    const int64_t u_min = std::max<int64_t>(0, t - half_len);
    const int64_t u_max = std::min<int64_t>((n_in - 1) * up, t + half_len);
    int64_t u = u_min + ((up - (u_min % up)) % up);  // first multiple of up
    for (; u <= u_max; u += up) {
      acc += h[t - u + half_len] * x[u / up];
    }
    y[j] = static_cast<float>(acc * up);
  }
  return y;
}

extern "C" {

// Loads a WAV file: decodes, downmixes to mono, resamples to target_sr
// (0 = keep native rate) and optionally peak-normalizes.
// Returns 0 on success; *out receives a malloc'd float buffer the caller
// frees with tt_free. *out_len and *out_sr receive length and sample rate.
int tt_load_wav(const char* path, int target_sr, int normalize, float** out,
                int64_t* out_len, int* out_sr) {
  FILE* fh = std::fopen(path, "rb");
  if (!fh) return 1;
  std::fseek(fh, 0, SEEK_END);
  const long size = std::ftell(fh);
  std::fseek(fh, 0, SEEK_SET);
  std::vector<uint8_t> buf(static_cast<size_t>(size));
  const size_t got = std::fread(buf.data(), 1, buf.size(), fh);
  std::fclose(fh);
  if (got != buf.size()) return 2;

  WavData wav;
  if (!parse_wav(buf.data(), buf.size(), &wav)) return 3;

  std::vector<float> samples = std::move(wav.samples);
  int sr = wav.sample_rate;
  if (target_sr > 0 && target_sr != sr) {
    const int g = static_cast<int>(std::gcd(static_cast<long>(target_sr),
                                            static_cast<long>(sr)));
    samples = tt_resample_poly(samples, target_sr / g, sr / g);
    sr = target_sr;
  }
  if (normalize) {
    float peak = 0.0f;
    for (float v : samples) peak = std::max(peak, std::fabs(v));
    if (peak > 0.0f) {
      const float inv = 1.0f / peak;
      for (float& v : samples) v *= inv;
    }
  }

  float* result = static_cast<float*>(std::malloc(samples.size() * 4));
  if (!result) return 4;
  std::memcpy(result, samples.data(), samples.size() * 4);
  *out = result;
  *out_len = static_cast<int64_t>(samples.size());
  *out_sr = sr;
  return 0;
}

void tt_free(float* ptr) { std::free(ptr); }

}  // extern "C"
