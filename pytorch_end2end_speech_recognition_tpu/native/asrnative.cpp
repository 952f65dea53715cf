// Native runtime components: WAV decode, parallel batch fill, Levenshtein.
//
// Capability parity: the reference genre's C++ data path (torchaudio/sox
// decoders, DataLoader worker processes) and C++ edit-distance scorers
// (SURVEY.md §2b). The TPU-native framework keeps compute on-device; the
// host-side hot path — decoding many small WAV files and packing padded
// batch buffers — runs here, multithreaded and GIL-free via ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread
//        asrnative.cpp -o libasrnative.so

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <thread>
#include <vector>

extern "C" {

// Decode a WAV file to float32 mono in [-1, 1].
// Returns sample count written (clipped to max_samples), or -1 on error.
// *sr_out receives the file's sample rate.
long asr_read_wav(const char* path, float* out, long max_samples,
                  int* sr_out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return -1;
  char riff[12];
  f.read(riff, 12);
  if (!f || std::memcmp(riff, "RIFF", 4) || std::memcmp(riff + 8, "WAVE", 4))
    return -1;

  uint16_t fmt_tag = 0, n_ch = 0, bits = 0;
  uint32_t sr = 0;
  std::vector<char> data;
  while (f) {
    char hdr[8];
    f.read(hdr, 8);
    if (!f) break;
    uint32_t size;
    std::memcpy(&size, hdr + 4, 4);
    if (!std::memcmp(hdr, "fmt ", 4)) {
      std::vector<char> fmt(size);
      f.read(fmt.data(), size);
      std::memcpy(&fmt_tag, fmt.data(), 2);
      std::memcpy(&n_ch, fmt.data() + 2, 2);
      std::memcpy(&sr, fmt.data() + 4, 4);
      std::memcpy(&bits, fmt.data() + 14, 2);
      if (fmt_tag == 0xFFFE && size >= 26)
        std::memcpy(&fmt_tag, fmt.data() + 24, 2);
      if (size % 2) f.seekg(1, std::ios::cur);
    } else if (!std::memcmp(hdr, "data", 4)) {
      data.resize(size);
      f.read(data.data(), size);
      if (size % 2) f.seekg(1, std::ios::cur);
      break;  // data chunk found; fmt always precedes it in practice
    } else {
      f.seekg(size + (size % 2), std::ios::cur);
    }
  }
  if (data.empty() || n_ch == 0 || sr == 0) return -1;
  *sr_out = static_cast<int>(sr);

  long n_frames;
  auto mono = [&](auto get, double scale) -> long {
    long frames = static_cast<long>(data.size()) /
                  (static_cast<long>(n_ch) * (bits / 8));
    frames = std::min(frames, max_samples);
    for (long i = 0; i < frames; ++i) {
      double acc = 0.0;
      for (int c = 0; c < n_ch; ++c) acc += get(i * n_ch + c);
      out[i] = static_cast<float>(acc / (n_ch * scale));
    }
    return frames;
  };

  if (fmt_tag == 1 && bits == 16) {
    const int16_t* p = reinterpret_cast<const int16_t*>(data.data());
    n_frames = mono([&](long i) { return (double)p[i]; }, 32768.0);
  } else if (fmt_tag == 1 && bits == 32) {
    const int32_t* p = reinterpret_cast<const int32_t*>(data.data());
    n_frames = mono([&](long i) { return (double)p[i]; }, 2147483648.0);
  } else if (fmt_tag == 1 && bits == 8) {
    const uint8_t* p = reinterpret_cast<const uint8_t*>(data.data());
    n_frames = mono([&](long i) { return (double)p[i] - 128.0; }, 128.0);
  } else if (fmt_tag == 1 && bits == 24) {
    const uint8_t* p = reinterpret_cast<const uint8_t*>(data.data());
    n_frames = mono(
        [&](long i) {
          int32_t v = p[3 * i] | (p[3 * i + 1] << 8) | (p[3 * i + 2] << 16);
          if (v & 0x800000) v -= 0x1000000;
          return (double)v;
        },
        8388608.0);
  } else if (fmt_tag == 3 && bits == 32) {
    const float* p = reinterpret_cast<const float*>(data.data());
    n_frames = mono([&](long i) { return (double)p[i]; }, 1.0);
  } else {
    return -1;
  }
  return n_frames;
}

// Decode n WAV files in parallel into a zero-initialized padded batch
// buffer out[n][row_stride]. lens[i] receives each row's sample count
// (0 on decode error or sample-rate mismatch with expect_sr; such rows
// are left for the Python fallback). Returns count of rows done natively.
long asr_load_batch(const char** paths, long n, float* out, long row_stride,
                    int* lens, int expect_sr, int n_threads) {
  std::atomic<long> next(0), ok(0);
  int workers = n_threads > 0
                    ? n_threads
                    : std::max(1u, std::thread::hardware_concurrency() / 2);
  workers = std::min<long>(workers, n);
  auto work = [&]() {
    for (;;) {
      long i = next.fetch_add(1);
      if (i >= n) break;
      int sr = 0;
      long got = asr_read_wav(paths[i], out + i * row_stride, row_stride, &sr);
      if (got < 0 || (expect_sr > 0 && sr != expect_sr)) {
        lens[i] = 0;
        std::memset(out + i * row_stride, 0, sizeof(float) * row_stride);
      } else {
        lens[i] = static_cast<int>(got);
        ok.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> ts;
  for (int w = 0; w < workers; ++w) ts.emplace_back(work);
  for (auto& t : ts) t.join();
  return ok.load();
}

// Levenshtein distance between int token sequences.
long asr_levenshtein(const int* a, long n, const int* b, long m) {
  if (n == 0) return m;
  if (m == 0) return n;
  std::vector<long> prev(m + 1), cur(m + 1);
  for (long j = 0; j <= m; ++j) prev[j] = j;
  for (long i = 1; i <= n; ++i) {
    cur[0] = i;
    for (long j = 1; j <= m; ++j) {
      long sub = prev[j - 1] + (a[i - 1] != b[j - 1]);
      cur[j] = std::min({sub, prev[j] + 1, cur[j - 1] + 1});
    }
    std::swap(prev, cur);
  }
  return prev[m];
}

}  // extern "C"
