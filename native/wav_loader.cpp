// Native WAV segment loader for the training data pipeline.
//
// TPU-native equivalent of the reference's DataLoader worker processes
// (reference model/lightning.py:46-50 + the RandomWAVDataset submodule,
// SURVEY.md §2.2 row 19): the host-side bottleneck is decoding random
// fixed-length crops from many wav files per step.  This library does
// header parsing once (cached), pread()s only the requested byte range, and
// converts PCM16/24/32/float32 -> mono float32, with a std::thread pool
// filling whole batches in parallel.  Exposed through a C ABI consumed via
// ctypes (no pybind11 on the image).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <atomic>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <string>
#include <thread>
#include <unistd.h>
#include <unordered_map>
#include <vector>

namespace {

struct WavInfo {
  uint32_t sample_rate = 0;
  uint16_t channels = 0;
  uint16_t bits = 0;
  uint16_t format = 0;  // 1 = PCM, 3 = IEEE float
  uint64_t data_offset = 0;
  uint64_t n_frames = 0;  // per-channel samples
  bool ok = false;
};

std::mutex g_cache_mu;
std::unordered_map<std::string, WavInfo> g_cache;

bool read_exact(int fd, void* buf, size_t n, uint64_t off) {
  ssize_t r = pread(fd, buf, n, (off_t)off);
  return r == (ssize_t)n;
}

WavInfo parse_header(const char* path) {
  WavInfo info;
  int fd = open(path, O_RDONLY);
  if (fd < 0) return info;

  uint8_t hdr[12];
  if (!read_exact(fd, hdr, 12, 0) || memcmp(hdr, "RIFF", 4) != 0 ||
      memcmp(hdr + 8, "WAVE", 4) != 0) {
    close(fd);
    return info;
  }

  uint64_t off = 12;
  while (true) {
    uint8_t chunk[8];
    if (!read_exact(fd, chunk, 8, off)) break;
    uint32_t size;
    memcpy(&size, chunk + 4, 4);
    if (memcmp(chunk, "fmt ", 4) == 0) {
      uint8_t fmt[16];
      if (!read_exact(fd, fmt, 16, off + 8)) break;
      memcpy(&info.format, fmt + 0, 2);
      memcpy(&info.channels, fmt + 2, 2);
      memcpy(&info.sample_rate, fmt + 4, 4);
      memcpy(&info.bits, fmt + 14, 2);
      if (info.format == 0xFFFE) {
        // WAVE_FORMAT_EXTENSIBLE: the real format code is the first two
        // bytes of the SubFormat GUID at offset 24 of the chunk data;
        // assuming PCM would decode extensible-float files as int garbage
        uint8_t sub[2];
        if (size >= 26 && read_exact(fd, sub, 2, off + 8 + 24)) {
          memcpy(&info.format, sub, 2);
        } else {
          info.format = 0;  // unparseable -> reject (Python fallback decodes)
        }
      }
    } else if (memcmp(chunk, "data", 4) == 0) {
      info.data_offset = off + 8;
      uint32_t bytes_per_frame = info.channels * (info.bits / 8);
      if (bytes_per_frame) info.n_frames = (uint64_t)size / bytes_per_frame;
      // only the widths decode_crop implements: anything else must be
      // rejected here so the caller falls back to the scipy decoder instead
      // of silently reading zeros
      bool depth_ok =
          (info.format == 1 && (info.bits == 8 || info.bits == 16 ||
                                info.bits == 24 || info.bits == 32)) ||
          (info.format == 3 && info.bits == 32);
      info.ok = info.channels > 0 && depth_ok;
      break;
    }
    off += 8 + size + (size & 1);
  }
  close(fd);
  return info;
}

WavInfo get_info(const char* path) {
  std::string key(path);
  {
    std::lock_guard<std::mutex> lk(g_cache_mu);
    auto it = g_cache.find(key);
    if (it != g_cache.end()) return it->second;
  }
  WavInfo info = parse_header(path);
  std::lock_guard<std::mutex> lk(g_cache_mu);
  g_cache[key] = info;
  return info;
}

// Decode `frames` frames starting at frame `start` into mono float32 `out`.
// Pads with zeros past EOF.  Returns 0 on success.
int decode_crop(const WavInfo& info, const char* path, int64_t start,
                int64_t frames, float* out) {
  const int bytes_per_sample = info.bits / 8;
  const int ch = info.channels;
  const int64_t avail =
      start < (int64_t)info.n_frames ? (int64_t)info.n_frames - start : 0;
  const int64_t n = frames < avail ? frames : avail;

  if (n > 0) {
    std::vector<uint8_t> raw((size_t)n * ch * bytes_per_sample);
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;
    bool ok = read_exact(fd, raw.data(), raw.size(),
                         info.data_offset +
                             (uint64_t)start * ch * bytes_per_sample);
    close(fd);
    if (!ok) return -2;

    const float inv_ch = 1.0f / ch;
    for (int64_t i = 0; i < n; i++) {
      float acc = 0.f;
      for (int c = 0; c < ch; c++) {
        const uint8_t* p = raw.data() + ((size_t)i * ch + c) * bytes_per_sample;
        float v = 0.f;
        if (info.format == 3 && info.bits == 32) {
          float f;
          memcpy(&f, p, 4);
          v = f;
        } else if (info.bits == 16) {
          int16_t s;
          memcpy(&s, p, 2);
          v = s * (1.0f / 32768.0f);
        } else if (info.bits == 24) {
          int32_t s = (int32_t)((uint32_t)p[0] << 8 | (uint32_t)p[1] << 16 |
                                (uint32_t)p[2] << 24) >> 8;
          v = s * (1.0f / 8388608.0f);
        } else if (info.bits == 32) {
          int32_t s;
          memcpy(&s, p, 4);
          v = s * (1.0f / 2147483648.0f);
        } else if (info.bits == 8) {
          v = ((int)p[0] - 128) * (1.0f / 128.0f);
        }
        acc += v;
      }
      out[i] = acc * inv_ch;
    }
  }
  for (int64_t i = n; i < frames; i++) out[i] = 0.f;
  return 0;
}

}  // namespace

extern "C" {

// Returns per-channel frame count (0 on failure); fills sample rate.
int64_t cmwg_wav_info(const char* path, int32_t* sample_rate) {
  WavInfo info = get_info(path);
  if (!info.ok) return 0;
  if (sample_rate) *sample_rate = (int32_t)info.sample_rate;
  return (int64_t)info.n_frames;
}

// Decode one crop; returns 0 on success.
int32_t cmwg_read_crop(const char* path, int64_t start, int64_t frames,
                       float* out) {
  WavInfo info = get_info(path);
  if (!info.ok) return -10;
  return decode_crop(info, path, start, frames, out);
}

// Fill a [batch, frames] float32 buffer from `paths` (array of C strings)
// at `starts`, using up to `n_threads` worker threads.  Returns 0 on
// success, else the first nonzero per-item status.
int32_t cmwg_fill_batch(const char** paths, const int64_t* starts,
                        int32_t batch, int64_t frames, float* out,
                        int32_t n_threads) {
  std::atomic<int32_t> status{0};
  std::atomic<int32_t> next{0};
  if (n_threads < 1) n_threads = 1;
  if (n_threads > batch) n_threads = batch;

  auto worker = [&]() {
    while (true) {
      int32_t i = next.fetch_add(1);
      if (i >= batch) return;
      WavInfo info = get_info(paths[i]);
      int32_t rc = info.ok ? decode_crop(info, paths[i], starts[i], frames,
                                         out + (size_t)i * frames)
                           : -10;
      if (rc != 0) {
        int32_t expected = 0;
        status.compare_exchange_strong(expected, rc);
      }
    }
  };

  std::vector<std::thread> threads;
  for (int32_t t = 0; t < n_threads; t++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return status.load();
}

}  // extern "C"
