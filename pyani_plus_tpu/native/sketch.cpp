// Native host-side sketching kernels for pyani-plus-tpu.
//
// Replaces the hot host loops of FracMinHash sketching (canonical k-mer
// MurmurHash3 x64-128 + scaled filter) -- the ingestion-side analogue of
// the Rust core inside sourmash/branchwater that the reference shells out
// to (SURVEY.md section 2.2). Device-side scoring stays in JAX/Pallas.
//
// MurmurHash3 is public domain (Austin Appleby); implementation below
// follows the published algorithm.
//
// Build: g++ -O3 -march=native -shared -fPIC sketch.cpp -o libsketch.so

#include <cstdint>
#include <cstring>

static inline uint64_t rotl64(uint64_t x, int8_t r) {
  return (x << r) | (x >> (64 - r));
}

static inline uint64_t fmix64(uint64_t k) {
  k ^= k >> 33;
  k *= 0xff51afd7ed558ccdULL;
  k ^= k >> 33;
  k *= 0xc4ceb9fe1a85ec53ULL;
  k ^= k >> 33;
  return k;
}

// MurmurHash3 x64-128, first 64 bits, little-endian host assumed.
static uint64_t murmur3_x64_128_low(const uint8_t *data, int len,
                                    uint32_t seed) {
  const int nblocks = len / 16;
  uint64_t h1 = seed, h2 = seed;
  const uint64_t c1 = 0x87c37b91114253d5ULL;
  const uint64_t c2 = 0x4cf5ad432745937fULL;

  const uint64_t *blocks = (const uint64_t *)(data);
  for (int i = 0; i < nblocks; i++) {
    uint64_t k1, k2;
    std::memcpy(&k1, data + i * 16, 8);
    std::memcpy(&k2, data + i * 16 + 8, 8);
    k1 *= c1; k1 = rotl64(k1, 31); k1 *= c2; h1 ^= k1;
    h1 = rotl64(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729;
    k2 *= c2; k2 = rotl64(k2, 33); k2 *= c1; h2 ^= k2;
    h2 = rotl64(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5;
  }
  (void)blocks;

  const uint8_t *tail = data + nblocks * 16;
  uint64_t k1 = 0, k2 = 0;
  switch (len & 15) {
    case 15: k2 ^= ((uint64_t)tail[14]) << 48; [[fallthrough]];
    case 14: k2 ^= ((uint64_t)tail[13]) << 40; [[fallthrough]];
    case 13: k2 ^= ((uint64_t)tail[12]) << 32; [[fallthrough]];
    case 12: k2 ^= ((uint64_t)tail[11]) << 24; [[fallthrough]];
    case 11: k2 ^= ((uint64_t)tail[10]) << 16; [[fallthrough]];
    case 10: k2 ^= ((uint64_t)tail[9]) << 8; [[fallthrough]];
    case 9:
      k2 ^= ((uint64_t)tail[8]) << 0;
      k2 *= c2; k2 = rotl64(k2, 33); k2 *= c1; h2 ^= k2;
      [[fallthrough]];
    case 8: k1 ^= ((uint64_t)tail[7]) << 56; [[fallthrough]];
    case 7: k1 ^= ((uint64_t)tail[6]) << 48; [[fallthrough]];
    case 6: k1 ^= ((uint64_t)tail[5]) << 40; [[fallthrough]];
    case 5: k1 ^= ((uint64_t)tail[4]) << 32; [[fallthrough]];
    case 4: k1 ^= ((uint64_t)tail[3]) << 24; [[fallthrough]];
    case 3: k1 ^= ((uint64_t)tail[2]) << 16; [[fallthrough]];
    case 2: k1 ^= ((uint64_t)tail[1]) << 8; [[fallthrough]];
    case 1:
      k1 ^= ((uint64_t)tail[0]) << 0;
      k1 *= c1; k1 = rotl64(k1, 31); k1 *= c2; h1 ^= k1;
  }

  h1 ^= (uint64_t)len;
  h2 ^= (uint64_t)len;
  h1 += h2;
  h2 += h1;
  h1 = fmix64(h1);
  h2 = fmix64(h2);
  h1 += h2;
  return h1;
}

extern "C" {

// Canonical-kmer FracMinHash over a code array (0..3 = ACGT, >=4 masked).
// Writes retained (<= max_hash) hashes of the lexicographically smaller of
// each valid k-mer and its reverse complement. Returns the number written
// (never more than out_cap; excess is silently dropped -- caller sizes
// out generously and checks).
int64_t sketch_codes(const uint8_t *codes, int64_t n, int k,
                     uint64_t max_hash, uint32_t seed, uint64_t *out,
                     int64_t out_cap) {
  if (n < k) return 0;
  static const char BASE[4] = {'A', 'C', 'G', 'T'};
  static const char CBASE[4] = {'T', 'G', 'C', 'A'};

  // Rolling 2-bit packed values for the lexicographic comparison.
  const uint64_t mask = (k < 32) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
  uint64_t fwd = 0, rc = 0;
  int valid_run = 0;  // number of consecutive valid codes ending at i
  int64_t count = 0;

  // Byte buffers for hashing: forward bytes and rc bytes of the window.
  // fwd_buf holds BASE[codes[i-k+1 .. i]]; rc bytes are derived on demand.
  char fwd_buf[64];
  char rc_buf[64];

  for (int64_t i = 0; i < n; i++) {
    uint8_t c = codes[i];
    if (c >= 4) {
      valid_run = 0;
      continue;
    }
    valid_run++;
    fwd = ((fwd << 2) | c) & mask;
    rc = (rc >> 2) | (((uint64_t)(3 - c)) << (2 * (k - 1)));
    if (valid_run < k) continue;

    const uint8_t *win = codes + i - k + 1;
    uint64_t h;
    if (fwd <= rc) {
      for (int j = 0; j < k; j++) fwd_buf[j] = BASE[win[j]];
      h = murmur3_x64_128_low((const uint8_t *)fwd_buf, k, seed);
    } else {
      for (int j = 0; j < k; j++) rc_buf[j] = CBASE[win[k - 1 - j]];
      h = murmur3_x64_128_low((const uint8_t *)rc_buf, k, seed);
    }
    if (h <= max_hash && count < out_cap) out[count++] = h;
  }
  return count;
}

// Plain canonical-kmer murmur64 of every valid window (no filter), for
// parity testing against the numpy/JAX paths.
int64_t hash_codes(const uint8_t *codes, int64_t n, int k, uint32_t seed,
                   uint64_t *out, int64_t out_cap) {
  return sketch_codes(codes, n, k, ~0ULL, seed, out, out_cap);
}

}  // extern "C"
