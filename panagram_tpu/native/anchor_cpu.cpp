// anchor_cpu.cpp — the honest CPU baseline for bench.py.
//
// A best-effort single-host CPU implementation of the anchoring hot loop
// the reference delegates to KMC + cpp/anchor.cpp (reference
// cpp/anchor.cpp:112-195: GetCountersForRead -> byte-pack ->
// __builtin_popcount):
//
//   * open-addressed hash table over the pan-kmer dictionary (splitmix64
//     mix, linear probing, 50% max load) — strictly better cache behaviour
//     than KMC's prefix/suffix binary-search random access, so beating
//     this is beating a FAVOURABLE stand-in for the reference pipeline;
//   * rolling canonical k-mer extraction (min of forward/revcomp under
//     2-bit A<C<G<T), identical semantics to ops/codec.pack_kmers;
//   * std::thread parallelism over contiguous position ranges (the OpenMP
//     analogue of anchor.cpp:217-223), each thread re-warming its window.
//
// Exposed via ctypes (panagram_tpu/native/anchor_cpu.py).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

static inline uint64_t mix64(uint64_t x) {
  x ^= x >> 30;
  x *= 0xBF58476D1CE4E5B9ull;
  x ^= x >> 27;
  x *= 0x94D049BB133111EBull;
  x ^= x >> 31;
  return x;
}

static const uint64_t EMPTY = ~0ull;

struct AnchorDict {
  std::vector<uint64_t> keys;   // open-addressed slots
  std::vector<uint32_t> masks;  // [cap * W]
  uint64_t cap_mask = 0;
  int W = 1;
};

extern "C" {

void* acpu_build(const uint64_t* keys, const uint32_t* masks, int64_t n,
                 int W) {
  auto* d = new AnchorDict();
  uint64_t cap = 16;
  while (cap < (uint64_t)n * 2) cap <<= 1;
  d->keys.assign(cap, EMPTY);
  d->masks.assign(cap * (uint64_t)W, 0);
  d->cap_mask = cap - 1;
  d->W = W;
  for (int64_t i = 0; i < n; i++) {
    uint64_t key = keys[i];
    uint64_t h = mix64(key) & d->cap_mask;
    while (d->keys[h] != EMPTY) h = (h + 1) & d->cap_mask;
    d->keys[h] = key;
    std::memcpy(&d->masks[h * d->W], &masks[i * (uint64_t)W],
                W * sizeof(uint32_t));
  }
  return d;
}

void acpu_free(void* hd) { delete static_cast<AnchorDict*>(hd); }

static void anchor_range(const AnchorDict* d, const uint8_t* codes,
                         int64_t L, int k, int nbytes, int64_t p0,
                         int64_t p1, uint8_t* out_bytes, int32_t* out_popc) {
  const int W = d->W;
  const uint64_t kmask =
      (k == 32) ? ~0ull : ((1ull << (2 * k)) - 1);
  uint64_t fwd = 0, rev = 0;
  int64_t last_bad = p0 - 1;  // most recent non-ACGT base index
  // warm the window over bases [p0, p0 + k - 1)
  for (int64_t i = p0; i < p0 + k - 1 && i < L; i++) {
    uint8_t c = codes[i];
    if (c > 3) { last_bad = i; c = 0; }
    fwd = ((fwd << 2) | c) & kmask;
    rev = (rev >> 2) | ((uint64_t)(3 - c) << (2 * (k - 1)));
  }
  for (int64_t p = p0; p < p1; p++) {
    int64_t i = p + k - 1;  // incoming base
    uint8_t c = codes[i];
    if (c > 3) { last_bad = i; c = 0; }
    fwd = ((fwd << 2) | c) & kmask;
    rev = (rev >> 2) | ((uint64_t)(3 - c) << (2 * (k - 1)));

    uint32_t row[8] = {0};  // W <= 8 genomes*256 supported here
    if (last_bad < p) {
      uint64_t canon = fwd < rev ? fwd : rev;
      uint64_t h = mix64(canon) & d->cap_mask;
      while (true) {
        uint64_t kk = d->keys[h];
        if (kk == canon) {
          std::memcpy(row, &d->masks[h * W], W * sizeof(uint32_t));
          break;
        }
        if (kk == EMPTY) break;
        h = (h + 1) & d->cap_mask;
      }
    }
    int popc = 0;
    for (int w = 0; w < W; w++) popc += __builtin_popcount(row[w]);
    out_popc[p] = popc;
    uint8_t* ob = out_bytes + (uint64_t)p * nbytes;
    for (int b = 0; b < nbytes; b++)
      ob[b] = (uint8_t)(row[b >> 2] >> (8 * (b & 3)));
  }
}

// codes u8 [L] (0-3 valid, >3 invalid); outputs for all P = L - k + 1
// positions: out_bytes u8 [P * nbytes], out_popc i32 [P].
void acpu_anchor(void* hd, const uint8_t* codes, int64_t L, int k,
                 int nbytes, uint8_t* out_bytes, int32_t* out_popc,
                 int threads) {
  const auto* d = static_cast<AnchorDict*>(hd);
  int64_t P = L - k + 1;
  if (P <= 0) return;
  if (threads < 1) threads = 1;
  if (threads == 1) {
    anchor_range(d, codes, L, k, nbytes, 0, P, out_bytes, out_popc);
    return;
  }
  std::vector<std::thread> pool;
  int64_t per = (P + threads - 1) / threads;
  for (int t = 0; t < threads; t++) {
    int64_t p0 = (int64_t)t * per;
    int64_t p1 = p0 + per < P ? p0 + per : P;
    if (p0 >= p1) break;
    pool.emplace_back(anchor_range, d, codes, L, k, nbytes, p0, p1,
                      out_bytes, out_popc);
  }
  for (auto& th : pool) th.join();
}

// RLE expand — host-side decode of the device's run-length-compacted
// anchor output (ops/anchor.anchor_chunk_rle2 protocol v3 data rows:
// [delta u8 | mask bytes], row width max(1 + nbytes, 4); delta is the
// position gap to the previous row, cumsum reconstructs absolute
// positions; runs > 255 arrive as same-mask continuation rows).
// Per-position popcounts are recomputed here from the mask bytes (once
// per ROW) rather than shipped over the narrow d2h link.
// Protocol-v4 twin of acpu_rle_expand: 3-byte data rows
// [delta u8 | palette idx u16 LE] plus a palette of mask rows (row width
// palw >= nbytes) — expansion reads each run's mask bytes straight from
// the palette, no host-side v3-row reconstruction.
void acpu_rle_expand_pal(const uint8_t* rows, const uint8_t* pal, int palw,
                         int64_t count, int nbytes, int64_t total,
                         uint8_t* out_bytes, int32_t* out_popc) {
  // u32-store fast path requires a 4-byte-aligned output base (row offsets
  // are multiples of nbytes == 4 then); unaligned callers take memcpy
  const bool fast4 =
      nbytes == 4 && (reinterpret_cast<uintptr_t>(out_bytes) & 3) == 0;
  int64_t pos = 0;
  for (int64_t i = 0; i < count; i++) {
    const uint8_t* r = rows + i * 3;
    pos += r[0];
    int64_t end = total;
    if (i + 1 < count) end = pos + rows[(i + 1) * 3];  // next row's delta
    if (end > total) end = total;
    const uint8_t* mb =
        pal + (size_t)((unsigned)r[1] | ((unsigned)r[2] << 8)) * palw;
    int32_t popc = 0;
    for (int b = 0; b < nbytes; b++)
      popc += __builtin_popcount((unsigned)mb[b]);
    int64_t p = pos;
    if (fast4) {  // the <=32-genome fast path: one u32 store/position
      uint32_t v;
      std::memcpy(&v, mb, 4);
      uint32_t* ob = reinterpret_cast<uint32_t*>(out_bytes) + p;
      for (int64_t n = end - p; n > 0; n--) *ob++ = v;
    } else {
      for (int64_t q = p; q < end; q++)
        std::memcpy(out_bytes + q * nbytes, mb, nbytes);
    }
    for (int64_t q = p; q < end; q++) out_popc[q] = popc;
  }
}

void acpu_rle_expand(const uint8_t* rows, int64_t count, int nbytes,
                     int64_t total, uint8_t* out_bytes, int32_t* out_popc) {
  const int rowbytes = (1 + nbytes) < 4 ? 4 : (1 + nbytes);
  const bool fast4 =
      nbytes == 4 && (reinterpret_cast<uintptr_t>(out_bytes) & 3) == 0;
  int64_t pos = 0;
  for (int64_t i = 0; i < count; i++) {
    const uint8_t* r = rows + i * rowbytes;
    pos += r[0];
    int64_t end = total;
    if (i + 1 < count) end = pos + r[rowbytes];  // next row's delta
    if (end > total) end = total;
    int32_t popc = 0;
    for (int b = 0; b < nbytes; b++)
      popc += __builtin_popcount((unsigned)r[1 + b]);
    int64_t p = pos;
    if (fast4) {  // the <=32-genome fast path: one u32 store/position
      uint32_t v;
      std::memcpy(&v, r + 1, 4);
      uint32_t* ob = reinterpret_cast<uint32_t*>(out_bytes) + p;
      for (int64_t n = end - p; n > 0; n--) *ob++ = v;
    } else {
      for (int64_t q = p; q < end; q++)
        std::memcpy(out_bytes + q * nbytes, r + 1, nbytes);
    }
    for (int64_t q = p; q < end; q++) out_popc[q] = popc;
  }
}

}  // extern "C"
