// Native Analyze 7.5 decoder + threaded batch loader.
//
// The reference's data path decodes volumes in Python through
// MONAI/nibabel on the main process (num_workers=0, dataset.py:31) — a
// host-side bottleneck for a TPU feeding at full rate. This library does the
// byte-level work in C++: type conversion (uint8/int16/int32/float32 →
// float32), optional byte swap, and a pthread pool that decodes a whole
// worklist of volumes in parallel for cache warmup.
//
// Exposed C ABI (consumed from Python via ctypes, tpureg/data/analyze.py):
//   analyze_decode(path, count, offset, datatype, swap, out) -> 0 on success
//   analyze_decode_many(paths, n, counts, offsets, dtypes, swaps, outs,
//                       n_threads) -> number of failures
//
// Build: make -C native  (produces native/libanalyze.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <atomic>
#include <thread>
#include <algorithm>
#include <vector>

namespace {

template <typename T>
bool convert(FILE* f, int64_t count, bool swap, float* out) {
  constexpr int64_t kChunk = 1 << 20;
  std::vector<T> buf(static_cast<size_t>(std::min(count, kChunk)));
  int64_t done = 0;
  while (done < count) {
    int64_t n = std::min(count - done, kChunk);
    if (fread(buf.data(), sizeof(T), n, f) != static_cast<size_t>(n))
      return false;
    if (swap && sizeof(T) > 1) {
      for (int64_t i = 0; i < n; ++i) {
        T v = buf[i];
        unsigned char* p = reinterpret_cast<unsigned char*>(&v);
        for (size_t a = 0, b = sizeof(T) - 1; a < b; ++a, --b)
          std::swap(p[a], p[b]);
        buf[i] = v;
      }
    }
    for (int64_t i = 0; i < n; ++i)
      out[done + i] = static_cast<float>(buf[i]);
    done += n;
  }
  return true;
}

int decode_one(const char* path, int64_t count, int64_t offset, int datatype,
               int swap, float* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  if (offset > 0 && fseek(f, static_cast<long>(offset), SEEK_SET) != 0) {
    fclose(f);
    return 2;
  }
  bool ok = false;
  switch (datatype) {
    case 2:  ok = convert<uint8_t>(f, count, false, out); break;
    case 4:  ok = convert<int16_t>(f, count, swap != 0, out); break;
    case 8:  ok = convert<int32_t>(f, count, swap != 0, out); break;
    case 16: ok = convert<float>(f, count, swap != 0, out); break;
    default: ok = false;
  }
  fclose(f);
  return ok ? 0 : 3;
}

}  // namespace

extern "C" {

int analyze_decode(const char* path, long long count, long long offset,
                   int datatype, int swap, float* out) {
  return decode_one(path, count, offset, datatype, swap, out);
}

int analyze_decode_many(const char** paths, int n, const long long* counts,
                        const long long* offsets, const int* dtypes,
                        const int* swaps, float** outs, int n_threads) {
  if (n_threads <= 0) n_threads = 4;
  std::vector<int> results(n, 0);
  std::vector<std::thread> pool;
  std::atomic<int> next_idx{0};
  auto worker = [&]() {
    for (;;) {
      int i = next_idx.fetch_add(1);
      if (i >= n) return;
      results[i] = decode_one(paths[i], counts[i], offsets[i], dtypes[i],
                              swaps[i], outs[i]);
    }
  };
  int k = std::min(n_threads, n);
  pool.reserve(k);
  for (int i = 0; i < k; ++i) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  int failures = 0;
  for (int r : results) failures += (r != 0);
  return failures;
}

}  // extern "C"
