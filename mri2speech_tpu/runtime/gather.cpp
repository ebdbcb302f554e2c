// Native batched-gather kernel for the mmap-backed pair datasets.
//
// The reference's input pipeline materialises samples one-by-one in Python
// dataloader workers (`dataset_fixedlen.py:235-268`). Here the host-side hot
// path is a single C++ call per batch: rows are copied from the memory-mapped
// store into a contiguous batch buffer with madvise(WILLNEED) prefetch hints,
// optionally on a small thread pool (row-parallel memcpy saturates memory
// bandwidth on multi-core hosts).
//
// Build: `make -C mri2speech_tpu/runtime` -> libm2sgather.so; loaded via
// ctypes by runtime/native.py with a pure-numpy fallback.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#if defined(__unix__) || defined(__APPLE__)
#include <sys/mman.h>
#include <unistd.h>
#endif

extern "C" {

// Copy n_idx rows of row_bytes each: dst[i] = src[indices[i]].
// src points at element [0] of a (N, row) array (e.g. a numpy memmap).
void m2s_gather_rows(const uint8_t* src, const int64_t* indices, int64_t n_idx,
                     int64_t row_bytes, uint8_t* dst, int n_threads) {
  auto copy_range = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      std::memcpy(dst + i * row_bytes, src + indices[i] * row_bytes,
                  static_cast<size_t>(row_bytes));
    }
  };
  if (n_threads <= 1 || n_idx < 2 * n_threads) {
    copy_range(0, n_idx);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (n_idx + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < n_idx ? lo + chunk : n_idx;
    if (lo >= hi) break;
    pool.emplace_back(copy_range, lo, hi);
  }
  for (auto& th : pool) th.join();
}

// Advise the kernel to prefetch the pages of the listed rows (async readahead
// for the NEXT batch while the device computes the current one).
void m2s_prefetch_rows(const uint8_t* src, const int64_t* indices, int64_t n_idx,
                       int64_t row_bytes) {
#if defined(__unix__) || defined(__APPLE__)
  const long page = sysconf(_SC_PAGESIZE);
  for (int64_t i = 0; i < n_idx; ++i) {
    const uint8_t* p = src + indices[i] * row_bytes;
    uintptr_t aligned = reinterpret_cast<uintptr_t>(p) & ~(uintptr_t)(page - 1);
    size_t len = static_cast<size_t>(row_bytes) +
                 (reinterpret_cast<uintptr_t>(p) - aligned);
    madvise(reinterpret_cast<void*>(aligned), len, MADV_WILLNEED);
  }
#else
  (void)src; (void)indices; (void)n_idx; (void)row_bytes;
#endif
}

}  // extern "C"
