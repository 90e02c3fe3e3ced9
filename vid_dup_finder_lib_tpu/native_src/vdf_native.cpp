// Native host runtime for vid_dup_finder_lib_tpu.
//
// The reference's hot CPU loop is a banded XOR+POPCNT sweep
// (vid_dup_finder_lib/src/video_hashing/search_algorithm.rs:131-170,
// video_hash.rs:311-317, 16x u64 words per comparison).  This library
// provides the same sweep as optimized native code:
//   * used as the honest CPU baseline the TPU kernels are benchmarked
//     against (BASELINE.md: baselines must be self-measured), and
//   * as the search fallback when no accelerator is present.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libvdf_native.so vdf_native.cpp -lpthread

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kWords = 16;  // 1000 bits packed in 16 x u64

inline uint32_t hamming16(const uint64_t* a, const uint64_t* b) {
  uint32_t acc = 0;
  for (int w = 0; w < kWords; ++w) {
    acc += static_cast<uint32_t>(__builtin_popcountll(a[w] ^ b[w]));
  }
  return acc;
}

}  // namespace

extern "C" {

// Banded adjacency sweep: emit all pairs (i, j), i < j < bounds[i], with
// hamming(hashes[i], hashes[j]) <= tol.  hashes: n x 16 u64 row-major.
// Pairs are appended as (i, j) into out_pairs (capacity cap pairs) in an
// arbitrary inter-thread order; returns the number of pairs found (which
// may exceed cap; only the first cap are stored).
int64_t vdf_banded_adjacency(const uint64_t* hashes, const int64_t* bounds,
                             int64_t n, uint32_t tol, int64_t* out_pairs,
                             int64_t cap, int n_threads) {
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  std::atomic<int64_t> next_row(0);
  std::atomic<int64_t> n_found(0);

  auto worker = [&]() {
    constexpr int64_t kRowChunk = 256;
    while (true) {
      int64_t r0 = next_row.fetch_add(kRowChunk);
      if (r0 >= n) break;
      int64_t r1 = r0 + kRowChunk < n ? r0 + kRowChunk : n;
      for (int64_t i = r0; i < r1; ++i) {
        const uint64_t* hi = hashes + i * kWords;
        int64_t jmax = bounds[i] < n ? bounds[i] : n;
        for (int64_t j = i + 1; j < jmax; ++j) {
          if (hamming16(hi, hashes + j * kWords) <= tol) {
            int64_t slot = n_found.fetch_add(1);
            if (slot < cap) {
              out_pairs[2 * slot] = i;
              out_pairs[2 * slot + 1] = j;
            }
          }
        }
      }
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return n_found.load();
}

// One-vs-many distances (the search_with_references inner loop,
// search_algorithm.rs:63-77): dists[k] = hamming(target, hashes[k]).
void vdf_distances_one(const uint64_t* target, const uint64_t* hashes,
                       int64_t n, uint32_t* dists) {
  for (int64_t k = 0; k < n; ++k) {
    dists[k] = hamming16(target, hashes + k * kWords);
  }
}

// Throughput probe used for baseline calibration: time a dense row-block
// sweep without storing pairs.  Returns the number of comparisons done.
int64_t vdf_count_leq(const uint64_t* hashes, const int64_t* bounds,
                      int64_t n, uint32_t tol, int n_threads) {
  std::atomic<int64_t> next_row(0);
  std::atomic<int64_t> hits(0);
  if (n_threads <= 0) n_threads = 1;
  auto worker = [&]() {
    int64_t local = 0;
    while (true) {
      int64_t i = next_row.fetch_add(1);
      if (i >= n) break;
      const uint64_t* hi = hashes + i * kWords;
      int64_t jmax = bounds[i] < n ? bounds[i] : n;
      for (int64_t j = i + 1; j < jmax; ++j) {
        local += hamming16(hi, hashes + j * kWords) <= tol ? 1 : 0;
      }
    }
    hits.fetch_add(local);
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return hits.load();
}

}  // extern "C"
