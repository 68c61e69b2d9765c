// Native audio IO for the ddim_audio_tpu data pipeline.
//
// The training host feeds the TPU from a single CPU core; WAV decode +
// mixdown + resample in optimized C++ keeps the input pipeline off the
// Python interpreter. Exposed through ctypes (ddim_audio_tpu/data/native_io.py)
// with a pure-Python fallback. This is a ground-up implementation — the
// reference (klae01/ddim-audio) has no native code at all (SURVEY.md §2);
// its (empty) SST submodule's dataset role is covered by data/audio_dataset.py.
//
// Supported: RIFF/WAVE, PCM 8/16/24/32-bit and IEEE float32/float64, any
// channel count (averaged to mono), arbitrary linear resampling.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cstdio>

namespace {

struct Reader {
  const uint8_t* p;
  size_t n;
  size_t off = 0;

  bool read(void* dst, size_t k) {
    if (off + k > n) return false;
    std::memcpy(dst, p + off, k);
    off += k;
    return true;
  }
  bool skip(size_t k) {
    if (off + k > n) return false;
    off += k;
    return true;
  }
};

inline int32_t read_s24(const uint8_t* b) {
  int32_t v = (b[0] | (b[1] << 8) | (b[2] << 16));
  if (v & 0x800000) v |= ~0xFFFFFF;  // sign extend
  return v;
}

}  // namespace

extern "C" {

// Returns 0 on success. Caller frees *out with audio_free().
// error codes: 1 bad header, 2 no fmt chunk, 3 no data chunk,
//              4 unsupported encoding, 5 alloc failure
int decode_wav_mono(const uint8_t* bytes, size_t n, float** out,
                    long long* n_samples, int* sample_rate) {
  Reader r{bytes, n};
  char tag[4];
  uint32_t riff_size;
  if (!r.read(tag, 4) || std::memcmp(tag, "RIFF", 4) != 0) return 1;
  if (!r.read(&riff_size, 4)) return 1;
  if (!r.read(tag, 4) || std::memcmp(tag, "WAVE", 4) != 0) return 1;

  uint16_t fmt_code = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  bool have_fmt = false;
  const uint8_t* data = nullptr;
  uint32_t data_len = 0;

  while (r.off + 8 <= r.n) {
    char cid[4];
    uint32_t csz;
    if (!r.read(cid, 4) || !r.read(&csz, 4)) break;
    if (std::memcmp(cid, "fmt ", 4) == 0) {
      if (csz < 16) return 2;
      uint8_t buf[16];
      if (!r.read(buf, 16)) return 2;
      std::memcpy(&fmt_code, buf + 0, 2);
      std::memcpy(&channels, buf + 2, 2);
      std::memcpy(&rate, buf + 4, 4);
      std::memcpy(&bits, buf + 14, 2);
      if (!r.skip(csz - 16 + (csz & 1))) return 2;
      have_fmt = true;
    } else if (std::memcmp(cid, "data", 4) == 0) {
      if (r.off + csz > r.n) csz = (uint32_t)(r.n - r.off);  // tolerate truncation
      data = bytes + r.off;
      data_len = csz;
      if (!r.skip(csz + (csz & 1))) break;
    } else {
      if (!r.skip(csz + (csz & 1))) break;
    }
  }
  if (!have_fmt || channels == 0) return 2;
  if (data == nullptr) return 3;
  // WAVE_FORMAT_EXTENSIBLE (0xFFFE) carries the real format in the
  // extension; PCM layouts below still apply for the common cases.
  bool is_float = (fmt_code == 3);
  bool is_pcm = (fmt_code == 1 || fmt_code == 0xFFFE);
  if (!is_float && !is_pcm) return 4;

  const int bytes_per = bits / 8;
  if (bytes_per == 0) return 4;
  const long long frames = (long long)data_len / (bytes_per * channels);
  float* buf = (float*)std::malloc(sizeof(float) * (size_t)(frames > 0 ? frames : 1));
  if (!buf) return 5;

  const double inv_ch = 1.0 / channels;
  for (long long i = 0; i < frames; ++i) {
    double acc = 0.0;
    const uint8_t* fp = data + (size_t)i * bytes_per * channels;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* sp = fp + (size_t)c * bytes_per;
      double v = 0.0;
      if (is_float && bits == 32) {
        float f;
        std::memcpy(&f, sp, 4);
        v = f;
      } else if (is_float && bits == 64) {
        double d;
        std::memcpy(&d, sp, 8);
        v = d;
      } else if (bits == 16) {
        int16_t s;
        std::memcpy(&s, sp, 2);
        v = s / 32768.0;
      } else if (bits == 32) {
        int32_t s;
        std::memcpy(&s, sp, 4);
        v = s / 2147483648.0;
      } else if (bits == 24) {
        v = read_s24(sp) / 8388608.0;
      } else if (bits == 8) {
        v = ((int)sp[0] - 128) / 128.0;  // 8-bit WAV is unsigned
      } else {
        std::free(buf);
        return 4;
      }
      acc += v;
    }
    buf[i] = (float)(acc * inv_ch);
  }

  *out = buf;
  *n_samples = frames;
  *sample_rate = (int)rate;
  return 0;
}

// Linear resampling matching numpy.interp over [0, 1) uniform grids
// (the Python fallback in data/codec.py::read_audio).
int resample_linear(const float* in, long long n_in, int sr_in, int sr_out,
                    float** out, long long* n_out) {
  if (n_in <= 0 || sr_in <= 0 || sr_out <= 0) return 1;
  long long m = (long long)((double)n_in * sr_out / sr_in + 0.5);
  if (m <= 0) m = 1;
  float* buf = (float*)std::malloc(sizeof(float) * (size_t)m);
  if (!buf) return 5;
  const double step = (double)n_in / m;
  for (long long i = 0; i < m; ++i) {
    double pos = i * step;
    long long j = (long long)pos;
    if (j >= n_in - 1) {
      buf[i] = in[n_in - 1];
    } else {
      double frac = pos - j;
      buf[i] = (float)(in[j] * (1.0 - frac) + in[j + 1] * frac);
    }
  }
  *out = buf;
  *n_out = m;
  return 0;
}

void audio_free(float* p) { std::free(p); }

}  // extern "C"
