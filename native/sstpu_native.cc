// Native runtime for speech_separation_tpu: the host-side hot paths.
//
// The reference leans on third-party native code (librosa/soundfile decoders,
// TF's C++ input pipeline) for its host work; this library provides the
// framework's own equivalents:
//
//   - RIFF/WAV decode (PCM16/24/32, float32) -> float32 [-1, 1], including a
//     multi-threaded batch decoder that saturates host cores while the TPU
//     computes (replaces librosa.load in the data loaders);
//   - crc32c (Castagnoli, slice-by-8) for TFRecord framing, ~2 orders of
//     magnitude faster than the pure-Python fallback;
//   - peak normalisation and int16 quantisation for the wav writer.
//
// C ABI only — consumed from Python via ctypes (no pybind11 dependency).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// crc32c (Castagnoli), slice-by-8
// ---------------------------------------------------------------------------

static uint32_t g_crc_tables[8][256];
static std::atomic<bool> g_crc_init{false};

static void crc32c_init_tables() {
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int k = 0; k < 8; ++k) c = (c >> 1) ^ (0x82F63B78u & (~(c & 1) + 1));
    g_crc_tables[0][i] = c;
  }
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = g_crc_tables[0][i];
    for (int t = 1; t < 8; ++t) {
      c = g_crc_tables[0][c & 0xFF] ^ (c >> 8);
      g_crc_tables[t][i] = c;
    }
  }
  g_crc_init.store(true, std::memory_order_release);
}

uint32_t sstpu_crc32c(const uint8_t* data, uint64_t n) {
  if (!g_crc_init.load(std::memory_order_acquire)) crc32c_init_tables();
  uint32_t crc = 0xFFFFFFFFu;
  while (n >= 8) {
    uint64_t word;
    std::memcpy(&word, data, 8);
    crc ^= static_cast<uint32_t>(word);
    uint32_t hi = static_cast<uint32_t>(word >> 32);
    crc = g_crc_tables[7][crc & 0xFF] ^ g_crc_tables[6][(crc >> 8) & 0xFF] ^
          g_crc_tables[5][(crc >> 16) & 0xFF] ^ g_crc_tables[4][crc >> 24] ^
          g_crc_tables[3][hi & 0xFF] ^ g_crc_tables[2][(hi >> 8) & 0xFF] ^
          g_crc_tables[1][(hi >> 16) & 0xFF] ^ g_crc_tables[0][hi >> 24];
    data += 8;
    n -= 8;
  }
  while (n--) crc = g_crc_tables[0][(crc ^ *data++) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

// ---------------------------------------------------------------------------
// WAV decode
// ---------------------------------------------------------------------------

// Parsed RIFF container state shared by the float and int16 decoders.
struct WavInfo {
  std::vector<uint8_t> buf;
  uint16_t format = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  const uint8_t* data_ptr = nullptr;
  uint32_t data_len = 0;
};

// Reads the file and locates fmt/data chunks. Returns 0 on success or the
// decoder's negative error code.
static int wav_parse(const char* path, WavInfo* w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size < 44) {
    std::fclose(f);
    return -2;
  }
  w->buf.resize(static_cast<size_t>(size));
  if (std::fread(w->buf.data(), 1, w->buf.size(), f) != w->buf.size()) {
    std::fclose(f);
    return -3;
  }
  std::fclose(f);

  if (std::memcmp(w->buf.data(), "RIFF", 4) ||
      std::memcmp(w->buf.data() + 8, "WAVE", 4))
    return -4;

  size_t pos = 12;
  while (pos + 8 <= w->buf.size()) {
    uint32_t chunk_len;
    std::memcpy(&chunk_len, w->buf.data() + pos + 4, 4);
    const uint8_t* chunk = w->buf.data() + pos + 8;
    // bound declared lengths by the actual payload (truncated/malformed
    // files must not read past the buffer)
    const size_t avail = w->buf.size() - pos - 8;
    if (chunk_len > avail) chunk_len = static_cast<uint32_t>(avail);
    if (!std::memcmp(w->buf.data() + pos, "fmt ", 4)) {
      if (chunk_len < 16) return -5;  // fmt chunk too short to hold fields
      std::memcpy(&w->format, chunk, 2);
      std::memcpy(&w->channels, chunk + 2, 2);
      std::memcpy(&w->rate, chunk + 4, 4);
      std::memcpy(&w->bits, chunk + 14, 2);
    } else if (!std::memcmp(w->buf.data() + pos, "data", 4)) {
      w->data_ptr = chunk;
      w->data_len = chunk_len;
    }
    pos += 8 + static_cast<size_t>(chunk_len) + (chunk_len & 1);  // word-aligned
  }
  if (!w->data_ptr || !w->channels || !w->rate) return -5;
  if (w->data_ptr + w->data_len > w->buf.data() + w->buf.size())
    w->data_len =
        static_cast<uint32_t>(w->buf.data() + w->buf.size() - w->data_ptr);
  return 0;
}

// Decodes a RIFF/WAV file to float32 in [-1, 1], averaging channels to mono.
// Returns 0 on success; fills *out (malloc'd, caller frees via
// sstpu_free), *num_samples, *sample_rate.
int sstpu_wav_read(const char* path, float** out, int64_t* num_samples,
                   int32_t* sample_rate) {
  *out = nullptr;
  *num_samples = 0;
  *sample_rate = 0;
  WavInfo w;
  int rc = wav_parse(path, &w);
  if (rc) return rc;
  const uint16_t format = w.format, channels = w.channels, bits = w.bits;
  const uint32_t rate = w.rate, data_len = w.data_len;
  const uint8_t* data_ptr = w.data_ptr;

  int64_t frames = 0;
  std::vector<float> mono;
  if (format == 1 && bits == 16) {
    frames = data_len / (2 * channels);
    mono.resize(frames);
    const int16_t* s = reinterpret_cast<const int16_t*>(data_ptr);
    for (int64_t i = 0; i < frames; ++i) {
      float acc = 0.f;
      for (int c = 0; c < channels; ++c) acc += s[i * channels + c];
      mono[i] = acc / (32768.0f * channels);
    }
  } else if (format == 1 && bits == 32) {
    frames = data_len / (4 * channels);
    mono.resize(frames);
    const int32_t* s = reinterpret_cast<const int32_t*>(data_ptr);
    for (int64_t i = 0; i < frames; ++i) {
      double acc = 0.0;
      for (int c = 0; c < channels; ++c) acc += s[i * channels + c];
      mono[i] = static_cast<float>(acc / (2147483648.0 * channels));
    }
  } else if (format == 1 && bits == 24) {
    frames = data_len / (3 * channels);
    mono.resize(frames);
    for (int64_t i = 0; i < frames; ++i) {
      double acc = 0.0;
      for (int c = 0; c < channels; ++c) {
        const uint8_t* p = data_ptr + 3 * (i * channels + c);
        int32_t v = (p[0] << 8) | (p[1] << 16) | (p[2] << 24);  // sign-extend
        acc += v >> 8;
      }
      mono[i] = static_cast<float>(acc / (8388608.0 * channels));
    }
  } else if (format == 3 && bits == 32) {
    frames = data_len / (4 * channels);
    mono.resize(frames);
    const float* s = reinterpret_cast<const float*>(data_ptr);
    for (int64_t i = 0; i < frames; ++i) {
      float acc = 0.f;
      for (int c = 0; c < channels; ++c) acc += s[i * channels + c];
      mono[i] = acc / channels;
    }
  } else {
    return -6;
  }

  float* result = static_cast<float*>(std::malloc(sizeof(float) * mono.size()));
  if (!result) return -7;
  std::memcpy(result, mono.data(), sizeof(float) * mono.size());
  *out = result;
  *num_samples = frames;
  *sample_rate = static_cast<int32_t>(rate);
  return 0;
}

void sstpu_free(void* ptr) { std::free(ptr); }

// Decodes mono 16-bit PCM straight to int16 counts — no float round-trip
// (the int16 link-transfer hot path: the sample payload is memcpy'd out of
// the container untouched, so dequantizing i/32768 on device reproduces the
// float decoder bit-exactly by construction). Returns -6 for any other
// layout (multichannel / other formats); callers fall back to the float
// decoder + quantisation.
int sstpu_wav_read_i16(const char* path, int16_t** out, int64_t* num_samples,
                       int32_t* sample_rate) {
  *out = nullptr;
  *num_samples = 0;
  *sample_rate = 0;
  WavInfo w;
  int rc = wav_parse(path, &w);
  if (rc) return rc;
  if (!(w.format == 1 && w.bits == 16 && w.channels == 1)) return -6;
  const int64_t frames = w.data_len / 2;
  int16_t* result =
      static_cast<int16_t*>(std::malloc(sizeof(int16_t) * frames));
  if (!result) return -7;
  std::memcpy(result, w.data_ptr, sizeof(int16_t) * frames);
  *out = result;
  *num_samples = frames;
  *sample_rate = static_cast<int32_t>(w.rate);
  return 0;
}

// Batch decode with a thread pool. paths: array of C strings; outs/lens/rates
// arrays of size n filled per file; statuses records per-file error codes.
void sstpu_wav_read_batch(const char** paths, int32_t n, float** outs,
                          int64_t* lens, int32_t* rates, int32_t* statuses,
                          int32_t num_threads) {
  if (num_threads <= 0) num_threads = std::thread::hardware_concurrency();
  if (num_threads <= 0) num_threads = 4;
  std::atomic<int32_t> next{0};
  auto worker = [&]() {
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= n) return;
      statuses[i] = sstpu_wav_read(paths[i], &outs[i], &lens[i], &rates[i]);
    }
  };
  std::vector<std::thread> threads;
  int32_t spawn = num_threads < n ? num_threads : n;
  threads.reserve(spawn);
  for (int32_t t = 0; t < spawn; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

// Threaded batch variant of sstpu_wav_read_i16 (mirror of
// sstpu_wav_read_batch).
void sstpu_wav_read_batch_i16(const char** paths, int32_t n, int16_t** outs,
                              int64_t* lens, int32_t* rates, int32_t* statuses,
                              int32_t num_threads) {
  if (num_threads <= 0) num_threads = std::thread::hardware_concurrency();
  if (num_threads <= 0) num_threads = 4;
  std::atomic<int32_t> next{0};
  auto worker = [&]() {
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= n) return;
      statuses[i] = sstpu_wav_read_i16(paths[i], &outs[i], &lens[i], &rates[i]);
    }
  };
  std::vector<std::thread> threads;
  int32_t spawn = num_threads < n ? num_threads : n;
  threads.reserve(spawn);
  for (int32_t t = 0; t < spawn; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

// ---------------------------------------------------------------------------
// int16 quantisation for the wav writer
// ---------------------------------------------------------------------------

// Scales float audio to int16 with optional peak normalisation; returns the
// number of clipped samples.
int64_t sstpu_quantize_int16(const float* in, int64_t n, int32_t normalize,
                             int16_t* out) {
  float peak = 0.f;
  if (normalize) {
    for (int64_t i = 0; i < n; ++i) {
      float a = in[i] < 0 ? -in[i] : in[i];
      if (a > peak) peak = a;
    }
  }
  const float scale = (normalize && peak > 0.f) ? 32767.0f / peak : 32767.0f;
  int64_t clipped = 0;
  for (int64_t i = 0; i < n; ++i) {
    float v = in[i] * scale;
    if (v > 32767.0f) {
      v = 32767.0f;
      ++clipped;
    } else if (v < -32768.0f) {
      v = -32768.0f;
      ++clipped;
    }
    out[i] = static_cast<int16_t>(v);
  }
  return clipped;
}

}  // extern "C"
