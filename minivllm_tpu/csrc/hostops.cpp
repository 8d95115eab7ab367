// Native host-side helpers for the TPU serving engine.
//
// The engine's per-step host work (block hashing for prefix caching, batch
// array packing) runs in the scheduler hot loop while the TPU executes the
// previous step; keeping it fast keeps the device fed. The reference uses
// the Python xxhash package for block hashing
// (/root/reference/minivllm/engine/block_manager.py:128-152); here the
// hash is implemented natively (XXH64 algorithm, implemented from the
// public spec) and exposed via a tiny C ABI consumed through ctypes.
//
// Build: g++ -O3 -shared -fPIC -o libminivllm_host.so hostops.cpp

#include <cstdint>
#include <cstddef>
#include <cstring>

namespace {

constexpr uint64_t P1 = 0x9E3779B185EBCA87ULL;
constexpr uint64_t P2 = 0xC2B2AE3D27D4EB4FULL;
constexpr uint64_t P3 = 0x165667B19E3779F9ULL;
constexpr uint64_t P4 = 0x85EBCA77C2B2AE63ULL;
constexpr uint64_t P5 = 0x27D4EB2F165667C5ULL;

inline uint64_t rotl(uint64_t x, int r) { return (x << r) | (x >> (64 - r)); }

inline uint64_t read64(const uint8_t* p) {
  uint64_t v;
  std::memcpy(&v, p, 8);
  return v;
}

inline uint32_t read32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

inline uint64_t round1(uint64_t acc, uint64_t input) {
  acc += input * P2;
  acc = rotl(acc, 31);
  return acc * P1;
}

inline uint64_t merge(uint64_t acc, uint64_t val) {
  acc ^= round1(0, val);
  return acc * P1 + P4;
}

uint64_t xxh64(const uint8_t* p, size_t len, uint64_t seed) {
  const uint8_t* end = p + len;
  uint64_t h;
  if (len >= 32) {
    uint64_t v1 = seed + P1 + P2;
    uint64_t v2 = seed + P2;
    uint64_t v3 = seed;
    uint64_t v4 = seed - P1;
    const uint8_t* limit = end - 32;
    do {
      v1 = round1(v1, read64(p)); p += 8;
      v2 = round1(v2, read64(p)); p += 8;
      v3 = round1(v3, read64(p)); p += 8;
      v4 = round1(v4, read64(p)); p += 8;
    } while (p <= limit);
    h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18);
    h = merge(h, v1);
    h = merge(h, v2);
    h = merge(h, v3);
    h = merge(h, v4);
  } else {
    h = seed + P5;
  }
  h += static_cast<uint64_t>(len);
  while (p + 8 <= end) {
    h ^= round1(0, read64(p));
    h = rotl(h, 27) * P1 + P4;
    p += 8;
  }
  if (p + 4 <= end) {
    h ^= static_cast<uint64_t>(read32(p)) * P1;
    h = rotl(h, 23) * P2 + P3;
    p += 4;
  }
  while (p < end) {
    h ^= static_cast<uint64_t>(*p) * P5;
    h = rotl(h, 11) * P1;
    ++p;
  }
  h ^= h >> 33;
  h *= P2;
  h ^= h >> 29;
  h *= P3;
  h ^= h >> 32;
  return h;
}

}  // namespace

extern "C" {

// Hash an arbitrary byte buffer with a seed (chained prefix hashing passes
// the parent block's hash as the seed).
uint64_t mv_hash64(const void* data, size_t len, uint64_t seed) {
  return xxh64(static_cast<const uint8_t*>(data), len, seed);
}

// Hash `n` int32 token ids with a seed. Avoids a Python-side bytes() copy.
uint64_t mv_hash_tokens(const int32_t* tokens, size_t n, uint64_t seed) {
  return xxh64(reinterpret_cast<const uint8_t*>(tokens), n * sizeof(int32_t),
               seed);
}

// Batch variant: hash `num_blocks` consecutive groups of `block_size` token
// ids, chaining each block's hash into the next (out[i] is the prefix hash
// of blocks [0..i]). Returns the number of blocks hashed.
size_t mv_hash_token_blocks(const int32_t* tokens, size_t num_tokens,
                            size_t block_size, uint64_t seed,
                            uint64_t* out) {
  size_t num_blocks = num_tokens / block_size;
  uint64_t h = seed;
  for (size_t i = 0; i < num_blocks; ++i) {
    h = xxh64(reinterpret_cast<const uint8_t*>(tokens + i * block_size),
              block_size * sizeof(int32_t), h);
    out[i] = h;
  }
  return num_blocks;
}

}  // extern "C"
