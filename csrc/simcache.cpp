// simcache — native core for cache replacement simulation.
//
// Implements the hot loop of the trace-based cache simulator: the
// round-robin interleaved replay of P memory reference strings through
// a fully associative line-granular cache with LRU / FIFO / RAND
// replacement, attributing misses per (thread, numa_domain).
//
// Semantics follow the reference simulator (spmv-cache-trace,
// src/cache-simulation/{replacement,lru,fifo,rand}.cpp):
//  - line = address / line_size
//  - LRU: on hit move to MRU; on miss insert, evict LRU over capacity.
//    (The reference's LRU does a linear std::find over its recency
//    queue on every hit; here an intrusive doubly-linked list over a
//    hash map gives O(1) per reference.)
//  - FIFO: insertion order, no recency update on hit.
//  - RAND: evict a pseudo-random resident line (xorshift64).
//  - Interleaving: step t issues string p's t-th reference for every
//    p with t < len_p, in thread order.
//
// Exposed as a C ABI for ctypes.  Build: csrc/Makefile -> libsimcache.so.

#include <chrono>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

// Progress callback: (refs_done, refs_total, is_warmup). Invoked from
// the replay loop at most once per progress interval (the analogue of
// the reference's SIGALRM progress printing, replacement.cpp:65-93,
// without async signals — ctypes callbacks re-enter Python safely).
typedef void (*simcache_progress_fn)(uint64_t, uint64_t, int);

namespace {

struct Node {
    uint64_t line;
    int32_t prev;
    int32_t next;
};

// Fully associative cache with an intrusive LRU/FIFO list.
// Node storage is a flat vector; free slots are recycled.
class Cache {
public:
    Cache(uint64_t capacity, uint64_t line_size, int policy, uint64_t seed)
        : capacity_(capacity),
          line_size_(line_size),
          policy_(policy),
          head_(-1),
          tail_(-1),
          rng_(seed ? seed : 1) {
        map_.reserve(2 * capacity);
        nodes_.reserve(capacity + 1);
        order_.reserve(capacity);
    }

    // Returns 1 on miss, 0 on hit.
    inline int allocate(uint64_t address) {
        uint64_t line = address / line_size_;
        auto it = map_.find(line);
        if (it != map_.end()) {
            if (policy_ == 0) {  // LRU: move to MRU (tail)
                move_to_tail(it->second);
            }
            return 0;
        }
        if (policy_ == 2) {  // RAND
            if (order_.size() == capacity_) {
                size_t victim_idx = next_rand() % order_.size();
                uint64_t victim = order_[victim_idx];
                map_.erase(victim);
                uint64_t last = order_.back();
                order_.pop_back();
                if (last != victim) {
                    order_[victim_idx] = last;
                    map_[last] = (int32_t)victim_idx;
                }
            }
            map_[line] = (int32_t)order_.size();
            order_.push_back(line);
            return 1;
        }
        // LRU / FIFO: append to tail; evict head when over capacity.
        int32_t idx = new_node(line);
        append_tail(idx);
        map_[line] = idx;
        if (map_.size() > capacity_) {
            int32_t h = head_;
            uint64_t victim = nodes_[h].line;
            unlink(h);
            free_.push_back(h);
            map_.erase(victim);
        }
        return 1;
    }

private:
    uint64_t capacity_;
    uint64_t line_size_;
    int policy_;  // 0 = LRU, 1 = FIFO, 2 = RAND
    std::unordered_map<uint64_t, int32_t> map_;
    std::vector<Node> nodes_;
    std::vector<int32_t> free_;
    std::vector<uint64_t> order_;  // RAND only
    int32_t head_;
    int32_t tail_;
    uint64_t rng_;

    inline uint64_t next_rand() {
        uint64_t x = rng_;
        x ^= x << 13;
        x ^= x >> 7;
        x ^= x << 17;
        rng_ = x;
        return x;
    }

    inline int32_t new_node(uint64_t line) {
        if (!free_.empty()) {
            int32_t idx = free_.back();
            free_.pop_back();
            nodes_[idx].line = line;
            return idx;
        }
        nodes_.push_back(Node{line, -1, -1});
        return (int32_t)nodes_.size() - 1;
    }

    inline void append_tail(int32_t idx) {
        nodes_[idx].prev = tail_;
        nodes_[idx].next = -1;
        if (tail_ >= 0)
            nodes_[tail_].next = idx;
        tail_ = idx;
        if (head_ < 0)
            head_ = idx;
    }

    inline void unlink(int32_t idx) {
        int32_t p = nodes_[idx].prev;
        int32_t n = nodes_[idx].next;
        if (p >= 0) nodes_[p].next = n; else head_ = n;
        if (n >= 0) nodes_[n].prev = p; else tail_ = p;
    }

    inline void move_to_tail(int32_t idx) {
        if (idx == tail_) return;
        unlink(idx);
        append_tail(idx);
    }
};

void replay_pass(Cache &cache,
                 int num_threads,
                 const uint64_t *addresses,
                 const int32_t *numa_domains,
                 const uint64_t *offsets,  // (P+1,) into the flat arrays
                 int num_numa_domains,
                 int64_t *misses, /* (P * num_numa_domains) or null */
                 simcache_progress_fn progress,
                 uint64_t progress_interval_ms) {
    std::vector<uint64_t> lens(num_threads);
    uint64_t t_max = 0, total = 0;
    for (int p = 0; p < num_threads; ++p) {
        lens[p] = offsets[p + 1] - offsets[p];
        total += lens[p];
        if (lens[p] > t_max) t_max = lens[p];
    }
    using clock = std::chrono::steady_clock;
    auto last = clock::now();
    uint64_t done = 0;
    // check the clock every CHECK outer steps, not every reference
    const uint64_t CHECK = 4096;
    for (uint64_t t = 0; t < t_max; ++t) {
        for (int p = 0; p < num_threads; ++p) {
            if (t < lens[p]) {
                uint64_t k = offsets[p] + t;
                int m = cache.allocate(addresses[k]);
                ++done;
                if (misses) {
                    misses[(uint64_t)p * num_numa_domains
                           + numa_domains[k]] += m;
                }
            }
        }
        if (progress && progress_interval_ms && (t % CHECK) == 0 && t) {
            auto now = clock::now();
            auto ms = std::chrono::duration_cast<std::chrono::milliseconds>(
                          now - last).count();
            if ((uint64_t)ms >= progress_interval_ms) {
                last = now;
                progress(done, total, misses == nullptr);
            }
        }
    }
}

}  // namespace

extern "C" {

// Interleaved replay of P reference strings.
//   policy: 0 LRU, 1 FIFO, 2 RAND
//   addresses / numa_domains: flat concatenation of the P strings
//   offsets: P+1 element offsets into the flat arrays
//   warmup: when nonzero, replay all strings once (uncounted) before
//           the counted pass (cache-trace.cpp:129-141)
//   misses_out: preallocated int64[P * num_numa_domains], zeroed here
// Returns 0 on success.
// With progress reporting: progress may be null; interval in ms.
int simcache_replay_interleaved_progress(
    int policy,
    uint64_t cache_lines,
    uint64_t line_size,
    int num_threads,
    const uint64_t *addresses,
    const int32_t *numa_domains,
    const uint64_t *offsets,
    int num_numa_domains,
    int warmup,
    uint64_t seed,
    int64_t *misses_out,
    simcache_progress_fn progress,
    uint64_t progress_interval_ms) {
    if (policy < 0 || policy > 2 || cache_lines == 0 || line_size == 0 ||
        num_threads < 0 || num_numa_domains <= 0)
        return 1;
    Cache cache(cache_lines, line_size, policy, seed);
    std::memset(misses_out, 0,
                sizeof(int64_t) * (size_t)num_threads * num_numa_domains);
    if (warmup) {
        replay_pass(cache, num_threads, addresses, numa_domains, offsets,
                    num_numa_domains, nullptr, progress,
                    progress_interval_ms);
    }
    replay_pass(cache, num_threads, addresses, numa_domains, offsets,
                num_numa_domains, misses_out, progress,
                progress_interval_ms);
    return 0;
}

int simcache_replay_interleaved(
    int policy,
    uint64_t cache_lines,
    uint64_t line_size,
    int num_threads,
    const uint64_t *addresses,
    const int32_t *numa_domains,
    const uint64_t *offsets,
    int num_numa_domains,
    int warmup,
    uint64_t seed,
    int64_t *misses_out) {
    return simcache_replay_interleaved_progress(
        policy, cache_lines, line_size, num_threads, addresses,
        numa_domains, offsets, num_numa_domains, warmup, seed,
        misses_out, nullptr, 0);
}

// Single-string replay convenience (replacement.cpp:18-32).
int simcache_replay_single(
    int policy,
    uint64_t cache_lines,
    uint64_t line_size,
    const uint64_t *addresses,
    const int32_t *numa_domains,
    uint64_t length,
    int num_numa_domains,
    uint64_t seed,
    int64_t *misses_out) {
    uint64_t offsets[2] = {0, length};
    return simcache_replay_interleaved(
        policy, cache_lines, line_size, 1, addresses, numa_domains,
        offsets, num_numa_domains, 0, seed, misses_out);
}

}  // extern "C"
