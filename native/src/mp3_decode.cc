// Native MP3 decode for the timbre-trap-tpu host data pipeline.
//
// The reference loads FMA mp3s through torchaudio
// (timbre_trap/datasets/AudioMixtures/FMA.py:16, AudioDataset.py:49-86).
// Here decode goes through the system libmpg123 (dlopen'd at runtime, no
// headers or link-time dependency needed): decode to float32 at the native
// rate/channels, downmix to mono, then reuse the same polyphase resampler
// and infinity-norm normalization as the WAV path (audio_io.cc).
//
// Exposed as tt_load_mp3 with the same C ABI as tt_load_wav; callers fall
// back (or error out) when libmpg123 is absent on the machine.

#include <dlfcn.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <vector>

// Shared with audio_io.cc (defined there).
std::vector<float> tt_resample_poly(const std::vector<float>& x, int up,
                                    int down);

namespace {

// Subset of the stable libmpg123 ABI we need (declared locally because the
// environment ships only the shared object, not the headers).
using mpg123_handle = void;
constexpr int MPG123_OK = 0;
constexpr int MPG123_DONE = -12;
constexpr int MPG123_NEW_FORMAT = -11;
constexpr int MPG123_ENC_FLOAT_32 = 0x200;

struct Mpg123Api {
  int (*init)(void) = nullptr;
  mpg123_handle* (*create)(const char*, int*) = nullptr;  // mpg123_new
  int (*open)(mpg123_handle*, const char*) = nullptr;
  int (*getformat)(mpg123_handle*, long*, int*, int*) = nullptr;
  int (*format_none)(mpg123_handle*) = nullptr;
  int (*format)(mpg123_handle*, long, int, int) = nullptr;
  int (*read)(mpg123_handle*, unsigned char*, size_t, size_t*) = nullptr;
  int (*close)(mpg123_handle*) = nullptr;
  void (*destroy)(mpg123_handle*) = nullptr;  // mpg123_delete
  bool ok = false;
};

const Mpg123Api& mpg123_api() {
  static Mpg123Api api = [] {
    Mpg123Api a;
    void* lib = dlopen("libmpg123.so.0", RTLD_NOW | RTLD_LOCAL);
    if (!lib) lib = dlopen("libmpg123.so", RTLD_NOW | RTLD_LOCAL);
    if (!lib) return a;
    auto sym = [&](const char* name) { return dlsym(lib, name); };
    a.init = reinterpret_cast<int (*)(void)>(sym("mpg123_init"));
    a.create = reinterpret_cast<mpg123_handle* (*)(const char*, int*)>(
        sym("mpg123_new"));
    a.open = reinterpret_cast<int (*)(mpg123_handle*, const char*)>(
        sym("mpg123_open"));
    a.getformat = reinterpret_cast<int (*)(mpg123_handle*, long*, int*, int*)>(
        sym("mpg123_getformat"));
    a.format_none =
        reinterpret_cast<int (*)(mpg123_handle*)>(sym("mpg123_format_none"));
    a.format = reinterpret_cast<int (*)(mpg123_handle*, long, int, int)>(
        sym("mpg123_format"));
    a.read = reinterpret_cast<int (*)(mpg123_handle*, unsigned char*, size_t,
                                      size_t*)>(sym("mpg123_read"));
    a.close = reinterpret_cast<int (*)(mpg123_handle*)>(sym("mpg123_close"));
    a.destroy =
        reinterpret_cast<void (*)(mpg123_handle*)>(sym("mpg123_delete"));
    a.ok = a.init && a.create && a.open && a.getformat && a.format_none &&
           a.format && a.read && a.close && a.destroy;
    if (a.ok && a.init() != MPG123_OK) a.ok = false;
    return a;
  }();
  return api;
}

}  // namespace

extern "C" {

// Whether libmpg123 could be loaded on this machine.
int tt_mp3_available(void) { return mpg123_api().ok ? 1 : 0; }

// Decodes an MP3 file: float32, downmixed to mono, resampled to target_sr
// (0 = keep native rate) and optionally peak-normalized. Same contract as
// tt_load_wav; caller frees *out with tt_free.
int tt_load_mp3(const char* path, int target_sr, int normalize, float** out,
                int64_t* out_len, int* out_sr) {
  const Mpg123Api& api = mpg123_api();
  if (!api.ok) return 10;

  int err = 0;
  mpg123_handle* h = api.create(nullptr, &err);
  if (!h) return 11;

  long rate = 0;
  int channels = 0, encoding = 0;
  std::vector<float> mono;
  int rc_out = 0;

  // Pin float32 output for every MPEG rate BEFORE opening the stream —
  // format changes after open only apply from the next format event, so the
  // already-negotiated (s16) format would leak through the first reads.
  static const long kRates[] = {8000,  11025, 12000, 16000, 22050,
                                24000, 32000, 44100, 48000};
  constexpr int kMonoStereo = 0x3;  // MPG123_MONO | MPG123_STEREO
  bool fmt_ok = api.format_none(h) == MPG123_OK;
  for (long r : kRates) {
    fmt_ok = fmt_ok && api.format(h, r, kMonoStereo, MPG123_ENC_FLOAT_32) ==
                           MPG123_OK;
  }
  if (!fmt_ok) {
    rc_out = 14;
  } else if (api.open(h, path) != MPG123_OK) {
    rc_out = 12;
  } else if (api.getformat(h, &rate, &channels, &encoding) != MPG123_OK ||
             rate <= 0 || channels <= 0 || encoding != MPG123_ENC_FLOAT_32) {
    rc_out = 13;
  } else {
    std::vector<unsigned char> buf(1 << 16);
    std::vector<float> interleaved;
    for (;;) {
      size_t done = 0;
      const int rc = api.read(h, buf.data(), buf.size(), &done);
      if (done > 0) {
        const float* f = reinterpret_cast<const float*>(buf.data());
        interleaved.insert(interleaved.end(), f, f + done / sizeof(float));
      }
      if (rc == MPG123_DONE) break;
      if (rc == MPG123_NEW_FORMAT) {
        long new_rate = 0;
        int new_channels = 0;
        if (api.getformat(h, &new_rate, &new_channels, &encoding) !=
            MPG123_OK) {
          rc_out = 15;
          break;
        }
        // A genuine rate/channel CHANGE after samples were accumulated
        // would concatenate audio decoded at different formats (wrong-rate
        // resampling; corrupted interleaved downmix on a channel change) —
        // fail loudly with a distinct code instead. A format event before
        // any data (the normal first-read handshake) just (re)pins.
        if (!interleaved.empty() &&
            (new_rate != rate || new_channels != channels)) {
          rc_out = 17;
          break;
        }
        rate = new_rate;
        channels = new_channels;
        continue;
      }
      if (rc != MPG123_OK) {
        if (interleaved.empty()) rc_out = 15;
        break;  // tolerate a truncated tail if we already have audio
      }
    }
    if (rc_out == 0 && interleaved.empty()) rc_out = 16;
    if (rc_out == 0) {
      const size_t frames = interleaved.size() / channels;
      mono.assign(frames, 0.0f);
      const float inv_channels = 1.0f / static_cast<float>(channels);
      for (size_t i = 0; i < frames; ++i) {
        float acc = 0.0f;
        for (int c = 0; c < channels; ++c) acc += interleaved[i * channels + c];
        mono[i] = acc * inv_channels;
      }
    }
  }
  api.close(h);
  api.destroy(h);
  if (rc_out != 0) return rc_out;

  int sr = static_cast<int>(rate);
  if (target_sr > 0 && target_sr != sr) {
    const int g = static_cast<int>(
        std::gcd(static_cast<long>(target_sr), static_cast<long>(sr)));
    mono = tt_resample_poly(mono, target_sr / g, sr / g);
    sr = target_sr;
  }
  if (normalize) {
    float peak = 0.0f;
    for (float v : mono) peak = std::max(peak, std::fabs(v));
    if (peak > 0.0f) {
      const float inv = 1.0f / peak;
      for (float& v : mono) v *= inv;
    }
  }

  float* result = static_cast<float*>(std::malloc(mono.size() * 4));
  if (!result && !mono.empty()) return 4;
  std::memcpy(result, mono.data(), mono.size() * 4);
  *out = result;
  *out_len = static_cast<int64_t>(mono.size());
  *out_sr = sr;
  return 0;
}

}  // extern "C"
