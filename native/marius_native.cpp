// Native host-side runtime for marius_tpu.
//
// The device hot loop is pure XLA; what remains host-bound is the out-of-core
// data path: gathering a buffer state's edge buckets, remapping global node
// ids to buffer-local slots, shuffling, and (for host-resident graphs too
// large for HBM) CSR construction + uniform neighbor sampling. These are the
// TPU-era equivalents of the reference's C++ DataLoader/GraphModelStorage/
// neighbor-sampler internals (src/cpp/src/data/dataloader.cpp:120-183
// setActiveEdges, graph_storage.cpp:512-735 updateInMemorySubGraph_,
// neighbor.cpp:104-137 sample_uniform_cpu) re-implemented standalone with
// std::thread parallelism — no libtorch, no Python in the loop.
//
// Exposed as a plain C ABI consumed via ctypes (marius_tpu/native/__init__.py).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

namespace {

int hw_threads() {
    unsigned n = std::thread::hardware_concurrency();
    return n ? static_cast<int>(n) : 4;
}

// Run fn(t, lo, hi) over [0, n) split across threads.
template <typename F>
void parallel_for(int64_t n, F fn) {
    int nt = std::min<int64_t>(hw_threads(), std::max<int64_t>(1, n / 4096));
    if (nt <= 1) {
        fn(0, 0, n);
        return;
    }
    std::vector<std::thread> ts;
    int64_t chunk = (n + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
        if (lo >= hi) break;
        ts.emplace_back([=] { fn(t, lo, hi); });
    }
    for (auto& th : ts) th.join();
}

}  // namespace

extern "C" {

// Concatenate the edge rows of the requested buckets and remap node ids to
// buffer-local ids: local = slot[g / psize] * psize + g % psize.
// edges: (E, cols) int32 rows grouped bucket-major with `bucket_offsets`
// (num_buckets+1 int64 prefix). bucket_ids: which buckets, in order.
// part_to_slot: (num_partitions,) int32. Writes rows to out; returns count.
int64_t gather_remap_buckets(const int32_t* edges, int cols,
                             const int64_t* bucket_offsets,
                             const int32_t* bucket_ids, int num_sel,
                             const int32_t* part_to_slot, int32_t psize,
                             int32_t* out) {
    // prefix of output offsets per selected bucket
    std::vector<int64_t> out_off(num_sel + 1, 0);
    for (int i = 0; i < num_sel; ++i) {
        int b = bucket_ids[i];
        out_off[i + 1] = out_off[i] + (bucket_offsets[b + 1] - bucket_offsets[b]);
    }
    parallel_for(num_sel, [&](int, int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            int b = bucket_ids[i];
            const int32_t* src = edges + bucket_offsets[b] * cols;
            int32_t* dst = out + out_off[i] * cols;
            int64_t rows = bucket_offsets[b + 1] - bucket_offsets[b];
            for (int64_t r = 0; r < rows; ++r) {
                for (int c = 0; c < cols; ++c) {
                    int32_t v = src[r * cols + c];
                    if (c == 0 || c == cols - 1) {
                        v = part_to_slot[v / psize] * psize + v % psize;
                    }
                    dst[r * cols + c] = v;
                }
            }
        }
    });
    return out_off[num_sel];
}

// Stable counting sort of edge rows into row-major (src_part, dst_part)
// buckets — the partition_edges hot path (torch_partitioner.py:12-46 does
// this with two stable torch sorts; counting sort is O(n) and ~10x faster
// at freebase86m scale). Parallel: per-thread histograms give each thread
// exclusive, order-preserving output cursors per bucket.
// edges: (n, cols) int32; out: (n, cols); bucket_sizes: (P*P,) int64.
void partition_rows(const int32_t* edges, int64_t n, int cols, int32_t psize,
                    int32_t num_partitions, int32_t* out,
                    int64_t* bucket_sizes) {
    const int64_t nb = static_cast<int64_t>(num_partitions) * num_partitions;
    const int nt = std::max(1, std::min<int>(hw_threads(),
                                             static_cast<int>(n / 65536 + 1)));
    std::vector<std::vector<int64_t>> hist(nt, std::vector<int64_t>(nb, 0));
    const int64_t chunk = (n + nt - 1) / nt;

    auto bucket_of = [&](int64_t r) -> int64_t {
        int32_t sp = edges[r * cols] / psize;
        int32_t dp = edges[r * cols + cols - 1] / psize;
        return static_cast<int64_t>(sp) * num_partitions + dp;
    };

    {
        std::vector<std::thread> ts;
        for (int t = 0; t < nt; ++t) {
            ts.emplace_back([&, t] {
                int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
                auto& h = hist[t];
                for (int64_t r = lo; r < hi; ++r) ++h[bucket_of(r)];
            });
        }
        for (auto& th : ts) th.join();
    }
    // bucket starts + per-thread bases (stable: thread t's rows for bucket b
    // land after threads < t, and each thread scans its range in order)
    std::vector<int64_t> start(nb + 1, 0);
    for (int64_t b = 0; b < nb; ++b) {
        int64_t total = 0;
        for (int t = 0; t < nt; ++t) total += hist[t][b];
        bucket_sizes[b] = total;
        start[b + 1] = start[b] + total;
    }
    std::vector<std::vector<int64_t>> base(nt, std::vector<int64_t>(nb));
    for (int64_t b = 0; b < nb; ++b) {
        int64_t cur = start[b];
        for (int t = 0; t < nt; ++t) {
            base[t][b] = cur;
            cur += hist[t][b];
        }
    }
    {
        std::vector<std::thread> ts;
        for (int t = 0; t < nt; ++t) {
            ts.emplace_back([&, t] {
                int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
                auto& cursor = base[t];
                for (int64_t r = lo; r < hi; ++r) {
                    int64_t b = bucket_of(r);
                    std::memcpy(out + cursor[b]++ * cols, edges + r * cols,
                                cols * sizeof(int32_t));
                }
            });
        }
        for (auto& th : ts) th.join();
    }
}

// In-place Fisher-Yates shuffle of (n, cols) int32 rows (single-threaded core
// like the reference's chunked shuffle, storage.h:23; memory-bound anyway).
void shuffle_rows_int32(int32_t* data, int64_t n, int cols, uint64_t seed) {
    std::mt19937_64 rng(seed);
    std::vector<int32_t> tmp(cols);
    for (int64_t i = n - 1; i > 0; --i) {
        int64_t j = static_cast<int64_t>(rng() % static_cast<uint64_t>(i + 1));
        if (i == j) continue;
        std::memcpy(tmp.data(), data + i * cols, cols * sizeof(int32_t));
        std::memcpy(data + i * cols, data + j * cols, cols * sizeof(int32_t));
        std::memcpy(data + j * cols, tmp.data(), cols * sizeof(int32_t));
    }
}

// CSR offsets from a sorted anchor column: offsets[v] = first index with
// anchor >= v (searchsorted; graph.cpp:26-32). anchor must be sorted ascending.
void csr_offsets(const int32_t* sorted_anchor, int64_t num_edges,
                 int32_t num_nodes, int64_t* offsets) {
    parallel_for(static_cast<int64_t>(num_nodes) + 1,
                 [&](int, int64_t lo, int64_t hi) {
        for (int64_t v = lo; v < hi; ++v) {
            offsets[v] = std::lower_bound(sorted_anchor,
                                          sorted_anchor + num_edges,
                                          static_cast<int32_t>(v)) -
                         sorted_anchor;
        }
    });
}

// Uniform neighbor sampling with replacement-free cap (sample_uniform_cpu,
// neighbor.cpp:104-137): for each seed, if degree <= fanout take all
// neighbors, else sample `fanout` without replacement via partial
// Fisher-Yates over an index window. Outputs fixed-shape (num_seeds, fanout)
// neighbor ids with `fill` for padding, plus per-seed counts.
void sample_uniform_neighbors(const int64_t* offsets, const int32_t* cols,
                              const int32_t* seeds, int64_t num_seeds,
                              int fanout, int32_t fill, uint64_t seed,
                              int32_t* out_nbrs, int32_t* out_counts) {
    parallel_for(num_seeds, [&](int, int64_t lo, int64_t hi) {
        std::mt19937_64 rng(seed + 0x9e3779b97f4a7c15ULL * (lo + 1));
        std::vector<int64_t> idx;
        for (int64_t s = lo; s < hi; ++s) {
            int32_t v = seeds[s];
            int64_t beg = offsets[v], end = offsets[v + 1];
            int64_t deg = end - beg;
            int32_t* row = out_nbrs + s * fanout;
            if (deg <= fanout) {
                for (int64_t k = 0; k < deg; ++k) row[k] = cols[beg + k];
                for (int64_t k = deg; k < fanout; ++k) row[k] = fill;
                out_counts[s] = static_cast<int32_t>(deg);
            } else {
                idx.resize(deg);
                for (int64_t k = 0; k < deg; ++k) idx[k] = beg + k;
                for (int k = 0; k < fanout; ++k) {
                    int64_t j = k + static_cast<int64_t>(
                        rng() % static_cast<uint64_t>(deg - k));
                    std::swap(idx[k], idx[j]);
                    row[k] = cols[idx[k]];
                }
                out_counts[s] = fanout;
            }
        }
    });
}

// Map global ids to buffer-local ids in place: local = slot[g/psize]*psize +
// g%psize (getGlobalToLocalMap, buffer.cpp:581-633). Returns number of ids
// whose partition was not resident (slot < 0); those are set to `fill`.
int64_t global_to_local(int32_t* ids, int64_t n, const int32_t* part_to_slot,
                        int32_t psize, int32_t fill) {
    std::atomic<int64_t> misses{0};
    parallel_for(n, [&](int, int64_t lo, int64_t hi) {
        int64_t local_miss = 0;
        for (int64_t i = lo; i < hi; ++i) {
            int32_t slot = part_to_slot[ids[i] / psize];
            if (slot < 0) {
                ids[i] = fill;
                ++local_miss;
            } else {
                ids[i] = slot * psize + ids[i] % psize;
            }
        }
        misses += local_miss;
    });
    return misses.load();
}

}  // extern "C"
