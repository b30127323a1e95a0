// Native host runtime: relation generation, validation oracle, arena.
//
// TPU-native counterpart of the reference's C++ host layer:
//   - Relation::fillUniqueValues / fillModuloValues / randomOrder
//     (data/Relation.cpp:63-97): dense keys, Fisher-Yates shuffle.
//   - BuildProbe's chained hash join (tasks/BuildProbe.cpp:47-118): here a
//     single-threaded open-addressing counting join used as the *oracle* for
//     validating device results at sizes where numpy is too slow.
//   - memory/Pool.cpp bump allocator: arena_* functions for host staging
//     buffers of the out-of-core driver.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// Build: `make -C radixjoin_tpu/native` -> libradixjoin_native.so

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PRNG: xoshiro256** — small, fast, seedable (std::mt19937_64 is slower and
// its state setup dominates for large fills).
// ---------------------------------------------------------------------------
struct Rng {
  uint64_t s[4];
};

static inline uint64_t rotl(uint64_t x, int k) {
  return (x << k) | (x >> (64 - k));
}

static void rng_seed(Rng *r, uint64_t seed) {
  // splitmix64 expansion of the seed
  uint64_t z = seed;
  for (int i = 0; i < 4; i++) {
    z += 0x9e3779b97f4a7c15ULL;
    uint64_t t = z;
    t = (t ^ (t >> 30)) * 0xbf58476d1ce4e5b9ULL;
    t = (t ^ (t >> 27)) * 0x94d049bb133111ebULL;
    r->s[i] = t ^ (t >> 31);
  }
}

static inline uint64_t rng_next(Rng *r) {
  const uint64_t result = rotl(r->s[1] * 5, 7) * 9;
  const uint64_t t = r->s[1] << 17;
  r->s[2] ^= r->s[0];
  r->s[3] ^= r->s[1];
  r->s[1] ^= r->s[2];
  r->s[0] ^= r->s[3];
  r->s[2] ^= t;
  r->s[3] = rotl(r->s[3], 45);
  return result;
}

// Unbiased bounded draw (Lemire).
static inline uint64_t rng_below(Rng *r, uint64_t bound) {
  if (bound == 0) return 0;
  __uint128_t m = (__uint128_t)rng_next(r) * bound;
  return (uint64_t)(m >> 64);
}

// ---------------------------------------------------------------------------
// Generators (semantics of data/Relation.cpp:63-97)
// ---------------------------------------------------------------------------

// keys = shuffle([start, start+n)), rids = [0, n)
void fill_unique(uint32_t *keys, uint32_t *rids, uint64_t n,
                 uint32_t start_key, uint64_t seed) {
  for (uint64_t i = 0; i < n; i++) keys[i] = (uint32_t)(start_key + i);
  Rng rng;
  rng_seed(&rng, seed);
  for (uint64_t i = n - 1; i > 0; i--) {  // Fisher-Yates
    uint64_t j = rng_below(&rng, i + 1);
    uint32_t t = keys[i];
    keys[i] = keys[j];
    keys[j] = t;
  }
  for (uint64_t i = 0; i < n; i++) rids[i] = (uint32_t)i;
}

// keys = shuffle(start + (i % inner)), rids = [0, n)
void fill_modulo(uint32_t *keys, uint32_t *rids, uint64_t n,
                 uint32_t start_key, uint64_t inner, uint64_t seed) {
  for (uint64_t i = 0; i < n; i++)
    keys[i] = (uint32_t)(start_key + (i % inner));
  Rng rng;
  rng_seed(&rng, seed);
  for (uint64_t i = n - 1; i > 0; i--) {
    uint64_t j = rng_below(&rng, i + 1);
    uint32_t t = keys[i];
    keys[i] = keys[j];
    keys[j] = t;
  }
  for (uint64_t i = 0; i < n; i++) rids[i] = (uint32_t)i;
}

// Zipf(theta) over [0, domain) by analytic inverse CDF (same approximation
// as data/relation.py::fill_zipf so host and device workloads agree).
void fill_zipf(uint32_t *keys, uint32_t *rids, uint64_t n, uint64_t domain,
               double theta, uint64_t seed) {
  if (theta == 1.0) theta = 1.0001;
  const double one_m = 1.0 - theta;
  const double h_max = (__builtin_pow((double)domain, one_m) - 1.0) / one_m;
  Rng rng;
  rng_seed(&rng, seed);
  for (uint64_t i = 0; i < n; i++) {
    double u = ((rng_next(&rng) >> 11) + 1.0) * (1.0 / 9007199254740993.0);
    double rank = __builtin_pow(1.0 + u * h_max * one_m, 1.0 / one_m);
    uint64_t k = (uint64_t)rank;
    if (k >= domain) k = domain - 1;
    keys[i] = (uint32_t)k;
    rids[i] = (uint32_t)i;
  }
}

// ---------------------------------------------------------------------------
// Validation oracle: exact equi-join match count.
// Open-addressing table of (key -> count) over the build side, then a probe
// accumulating counts — O(n) expected, ~100M tuples/s on one core.
// ---------------------------------------------------------------------------

static inline uint64_t hash_u32(uint32_t x) {
  uint64_t h = x;
  h *= 0x9e3779b97f4a7c15ULL;
  h ^= h >> 32;
  return h;
}

uint64_t join_count_oracle(const uint32_t *r_keys, uint64_t nr,
                           const uint32_t *s_keys, uint64_t ns) {
  uint64_t cap = 16;
  while (cap < 2 * nr) cap <<= 1;
  const uint64_t mask = cap - 1;
  // slot: key (with +1 bias so 0 == empty), count
  std::vector<uint64_t> slot_key(cap, 0);
  std::vector<uint32_t> slot_cnt(cap, 0);
  for (uint64_t i = 0; i < nr; i++) {
    uint64_t k = (uint64_t)r_keys[i] + 1;
    uint64_t h = hash_u32(r_keys[i]) & mask;
    for (;;) {
      if (slot_key[h] == 0) {
        slot_key[h] = k;
        slot_cnt[h] = 1;
        break;
      }
      if (slot_key[h] == k) {
        slot_cnt[h]++;
        break;
      }
      h = (h + 1) & mask;
    }
  }
  uint64_t total = 0;
  for (uint64_t i = 0; i < ns; i++) {
    uint64_t k = (uint64_t)s_keys[i] + 1;
    uint64_t h = hash_u32(s_keys[i]) & mask;
    for (;;) {
      if (slot_key[h] == 0) break;
      if (slot_key[h] == k) {
        total += slot_cnt[h];
        break;
      }
      h = (h + 1) & mask;
    }
  }
  return total;
}

// ---------------------------------------------------------------------------
// Host radix partition — the reference's CPU partitioning phase
// (tasks/NetworkPartitioning.cpp:116-173 / LocalPartitioning.cpp:138-250):
// per-thread histogram, exclusive prefix into disjoint cursors (the
// OffsetMap relativeWriteOffsets idea, histograms/OffsetMap.cpp:75-93,
// with threads playing the role of ranks), then a scatter through 64-byte
// per-partition write-combine buffers flushed with streaming stores —
// the same software-WC design, minus the MPI window behind it.
// Used by the out-of-core driver to spill host-resident relations into
// coarse buckets without a device round-trip.  pid = key >> (32 - bits)
// (top radix bits — matches ops/partition.partition_keys_rotated order).
// ---------------------------------------------------------------------------

static const int kWcLine = 16;  // uint32s per 64-byte cacheline buffer

struct WcBuf {
  uint32_t v[kWcLine];
};

void radix_partition_keys(const uint32_t *keys, uint64_t n, uint32_t bits,
                          uint32_t *out, uint64_t *counts) {
  const uint32_t P = 1u << bits;
  const uint32_t shift = 32 - bits;
  unsigned hw = std::thread::hardware_concurrency();
  const unsigned T = n < (1u << 20) ? 1 : (hw > 4 ? 4 : (hw < 1 ? 1 : hw));
  std::vector<uint64_t> hist(T * P, 0);
  std::vector<uint64_t> bounds(T + 1);
  for (unsigned t = 0; t <= T; t++) bounds[t] = n * t / T;

  auto hist_worker = [&](unsigned t) {
    uint64_t *h = &hist[t * P];
    for (uint64_t i = bounds[t]; i < bounds[t + 1]; i++) h[keys[i] >> shift]++;
  };
  {
    std::vector<std::thread> th;
    for (unsigned t = 1; t < T; t++) th.emplace_back(hist_worker, t);
    hist_worker(0);
    for (auto &x : th) x.join();
  }

  // counts[p] = total; cursor[t][p] = partition base + earlier threads'
  // share (every write lands in a disjoint range — no synchronization,
  // exactly the OffsetMap invariant).
  std::vector<uint64_t> cursor(T * P);
  uint64_t base = 0;
  for (uint32_t p = 0; p < P; p++) {
    counts[p] = 0;
    for (unsigned t = 0; t < T; t++) {
      cursor[t * P + p] = base + counts[p];
      counts[p] += hist[t * P + p];
    }
    base += counts[p];
  }

  auto scatter_worker = [&](unsigned t) {
    uint64_t *cur = &cursor[t * P];
    std::vector<WcBuf> wc(P);
    std::vector<uint8_t> fill(P, 0);
    for (uint64_t i = bounds[t]; i < bounds[t + 1]; i++) {
      const uint32_t k = keys[i];
      const uint32_t p = k >> shift;
      wc[p].v[fill[p]++] = k;
      if (fill[p] == kWcLine) {
        // Flush one cacheline. The cursor start of a partition is not
        // 64B-aligned in general, so use plain stores (memcpy compiles to
        // two 32B vector stores); the WC buffer still batches the random
        // per-partition traffic into full-line writes.
        memcpy(out + cur[p], wc[p].v, sizeof(WcBuf));
        cur[p] += kWcLine;
        fill[p] = 0;
      }
    }
    for (uint32_t p = 0; p < P; p++) {  // tail flush (partial lines)
      if (fill[p]) {
        memcpy(out + cur[p], wc[p].v, fill[p] * sizeof(uint32_t));
        cur[p] += fill[p];
      }
    }
  };
  {
    std::vector<std::thread> th;
    for (unsigned t = 1; t < T; t++) th.emplace_back(scatter_worker, t);
    scatter_worker(0);
    for (auto &x : th) x.join();
  }
}

// ---------------------------------------------------------------------------
// Host LSD radix sort: 4 passes of 8-bit stable counting scatter, built on
// the same per-thread histogram + disjoint-cursor + WC-buffer machinery as
// radix_partition_keys (a radix sort IS the reference's partitioning
// applied recursively — LocalPartitioning's second pass taken to the
// limit, tasks/LocalPartitioning.cpp:138-250).  Used by the out-of-core
// driver so spill buckets arrive on the device fully sorted: the device
// then skips both of its partition sorts (the in-HBM engine's dominant
// cost) and the interconnect sees monotone streams.
// ---------------------------------------------------------------------------

static void radix_pass(const uint32_t *in, uint32_t *out, uint64_t n,
                       uint32_t shift) {
  const uint32_t P = 256;
  unsigned hw = std::thread::hardware_concurrency();
  const unsigned T = n < (1u << 20) ? 1 : (hw > 4 ? 4 : (hw < 1 ? 1 : hw));
  std::vector<uint64_t> hist(T * P, 0);
  std::vector<uint64_t> bounds(T + 1);
  for (unsigned t = 0; t <= T; t++) bounds[t] = n * t / T;

  auto hist_worker = [&](unsigned t) {
    uint64_t *h = &hist[t * P];
    for (uint64_t i = bounds[t]; i < bounds[t + 1]; i++)
      h[(in[i] >> shift) & 0xFF]++;
  };
  {
    std::vector<std::thread> th;
    for (unsigned t = 1; t < T; t++) th.emplace_back(hist_worker, t);
    hist_worker(0);
    for (auto &x : th) x.join();
  }

  std::vector<uint64_t> cursor(T * P);
  uint64_t base = 0;
  for (uint32_t p = 0; p < P; p++) {
    for (unsigned t = 0; t < T; t++) {
      cursor[t * P + p] = base;
      base += hist[t * P + p];
    }
  }

  // Stability: threads own ascending index ranges AND ascending cursor
  // ranges per digit, and each thread scans sequentially — the global
  // order of equal digits is preserved (LSD requirement).
  auto scatter_worker = [&](unsigned t) {
    uint64_t *cur = &cursor[t * P];
    std::vector<WcBuf> wc(P);
    std::vector<uint8_t> fill(P, 0);
    for (uint64_t i = bounds[t]; i < bounds[t + 1]; i++) {
      const uint32_t k = in[i];
      const uint32_t p = (k >> shift) & 0xFF;
      wc[p].v[fill[p]++] = k;
      if (fill[p] == kWcLine) {
        memcpy(out + cur[p], wc[p].v, sizeof(WcBuf));
        cur[p] += kWcLine;
        fill[p] = 0;
      }
    }
    for (uint32_t p = 0; p < P; p++) {
      if (fill[p]) {
        memcpy(out + cur[p], wc[p].v, fill[p] * sizeof(uint32_t));
        cur[p] += fill[p];
      }
    }
  };
  {
    std::vector<std::thread> th;
    for (unsigned t = 1; t < T; t++) th.emplace_back(scatter_worker, t);
    scatter_worker(0);
    for (auto &x : th) x.join();
  }
}

void radix_sort_keys(const uint32_t *keys, uint64_t n, uint32_t *out) {
  std::vector<uint32_t> tmp(n);
  radix_pass(keys, tmp.data(), n, 0);
  radix_pass(tmp.data(), out, n, 8);
  radix_pass(out, tmp.data(), n, 16);
  radix_pass(tmp.data(), out, n, 24);
}

// ---------------------------------------------------------------------------
// Arena (reference memory/Pool.cpp bump allocator): 64B-aligned slab +
// bump pointer + reset, for host staging buffers.
// ---------------------------------------------------------------------------

struct Arena {
  char *base;
  uint64_t size;
  uint64_t used;
};

void *arena_create(uint64_t bytes) {
  Arena *a = (Arena *)malloc(sizeof(Arena));
  if (!a) return nullptr;
  if (posix_memalign((void **)&a->base, 64, bytes) != 0) {
    free(a);
    return nullptr;
  }
  a->size = bytes;
  a->used = 0;
  return a;
}

void *arena_alloc(void *arena, uint64_t bytes) {
  Arena *a = (Arena *)arena;
  uint64_t aligned = (bytes + 63) & ~63ULL;  // 64B rounding (Pool.cpp:40-52)
  if (a->used + aligned > a->size) return nullptr;
  void *p = a->base + a->used;
  a->used += aligned;
  return p;
}

void arena_reset(void *arena) { ((Arena *)arena)->used = 0; }

uint64_t arena_used(void *arena) { return ((Arena *)arena)->used; }

void arena_destroy(void *arena) {
  Arena *a = (Arena *)arena;
  free(a->base);
  free(a);
}

}  // extern "C"
