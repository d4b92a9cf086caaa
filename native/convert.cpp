// Host-side bulk conversion library for tpu-bls12-381.
//
// The TPU-native analog of the reference's host conversion hot path
// (core/types.rs TypeConverter): wire-format field elements (little-endian
// 64-bit limbs, 4 for Fr / 6 for Fq) are repacked into the library's
// limbs-first 16-bit-limb uint32 arrays, and Montgomery encode/decode is
// done with 64-bit CIOS arithmetic so multi-million-element SRS uploads
// take milliseconds instead of Python-loop minutes.
//
// Own implementation (standard CIOS Montgomery multiplication with
// unsigned __int128 products); constants are the public BLS12-381 curve
// parameters.  Exposed as a plain C ABI consumed via ctypes.
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>

namespace {

// --- BLS12-381 Montgomery constants (64-bit limbs, little-endian) ---------
static const uint64_t FQ_P[6] = {0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL,
                                 0x6730d2a0f6b0f624ULL, 0x64774b84f38512bfULL,
                                 0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL};
static const uint64_t FQ_R2[6] = {0xf4df1f341c341746ULL, 0x0a76e6a609d104f1ULL,
                                  0x8de5476c4c95b6d5ULL, 0x67eb88a9939d83c0ULL,
                                  0x9a793e85b519952dULL, 0x11988fe592cae3aaULL};
static const uint64_t FQ_INV = 0x89f3fffcfffcfffdULL;

static const uint64_t FR_P[4] = {0xffffffff00000001ULL, 0x53bda402fffe5bfeULL,
                                 0x3339d80809a1d805ULL, 0x73eda753299d7d48ULL};
static const uint64_t FR_R2[4] = {0xc999e990f3f29c6dULL, 0x2b6cedcb87925c23ULL,
                                  0x05d314967254398fULL, 0x0748d9d99f59ff11ULL};
static const uint64_t FR_INV = 0xfffffffeffffffffULL;

using u128 = unsigned __int128;

// CIOS Montgomery product acc = a*b*R^{-1} mod p for K 64-bit limbs.
template <int K>
static inline void mont_mul(const uint64_t* a, const uint64_t* b,
                            const uint64_t* p, uint64_t inv, uint64_t* out) {
  uint64_t t[K + 2] = {0};
  for (int i = 0; i < K; ++i) {
    // t += a[i] * b
    uint64_t carry = 0;
    for (int j = 0; j < K; ++j) {
      u128 cur = (u128)a[i] * b[j] + t[j] + carry;
      t[j] = (uint64_t)cur;
      carry = (uint64_t)(cur >> 64);
    }
    u128 cur = (u128)t[K] + carry;
    t[K] = (uint64_t)cur;
    t[K + 1] = (uint64_t)(cur >> 64);
    // reduce one limb: m = t[0]*inv mod 2^64; t = (t + m*p) / 2^64
    uint64_t m = t[0] * inv;
    u128 acc = (u128)m * p[0] + t[0];
    carry = (uint64_t)(acc >> 64);
    for (int j = 1; j < K; ++j) {
      acc = (u128)m * p[j] + t[j] + carry;
      t[j - 1] = (uint64_t)acc;
      carry = (uint64_t)(acc >> 64);
    }
    acc = (u128)t[K] + carry;
    t[K - 1] = (uint64_t)acc;
    t[K] = t[K + 1] + (uint64_t)(acc >> 64);
    t[K + 1] = 0;
  }
  // conditional subtract p (t may be in [0, 2p))
  uint64_t d[K];
  uint64_t borrow = 0;
  for (int j = 0; j < K; ++j) {
    u128 cur = (u128)t[j] - p[j] - borrow;
    d[j] = (uint64_t)cur;
    borrow = (uint64_t)(cur >> 64) & 1;
  }
  bool take_d = t[K] != 0 || !borrow;
  for (int j = 0; j < K; ++j) out[j] = take_d ? d[j] : t[j];
}

template <int K>
static void mont_scale_batch(const uint64_t* in, uint64_t* out, size_t n,
                             const uint64_t* factor, const uint64_t* p,
                             uint64_t inv) {
  for (size_t i = 0; i < n; ++i)
    mont_mul<K>(in + i * K, factor, p, inv, out + i * K);
}

}  // namespace

extern "C" {

// ---- wire (element-major u64 LE words) <-> limbs-first 16-bit limbs ------
// in:  n elements of k64 64-bit words each (n * k64 * 8 bytes)
// out: (4*k64, n) uint32 array, limb-major (out[l*n + i])
void wire_to_limbs16(const uint64_t* in, uint32_t* out, size_t n, int k64) {
  const int k16 = 4 * k64;
  for (size_t i = 0; i < n; ++i) {
    const uint64_t* e = in + i * k64;
    for (int w = 0; w < k64; ++w) {
      uint64_t v = e[w];
      out[(size_t)(4 * w + 0) * n + i] = (uint32_t)(v & 0xFFFF);
      out[(size_t)(4 * w + 1) * n + i] = (uint32_t)((v >> 16) & 0xFFFF);
      out[(size_t)(4 * w + 2) * n + i] = (uint32_t)((v >> 32) & 0xFFFF);
      out[(size_t)(4 * w + 3) * n + i] = (uint32_t)((v >> 48) & 0xFFFF);
    }
    (void)k16;
  }
}

void limbs16_to_wire(const uint32_t* in, uint64_t* out, size_t n, int k64) {
  for (size_t i = 0; i < n; ++i) {
    uint64_t* e = out + i * k64;
    for (int w = 0; w < k64; ++w) {
      e[w] = (uint64_t)(in[(size_t)(4 * w + 0) * n + i] & 0xFFFF) |
             ((uint64_t)(in[(size_t)(4 * w + 1) * n + i] & 0xFFFF) << 16) |
             ((uint64_t)(in[(size_t)(4 * w + 2) * n + i] & 0xFFFF) << 32) |
             ((uint64_t)(in[(size_t)(4 * w + 3) * n + i] & 0xFFFF) << 48);
    }
  }
}

// ---- batch Montgomery encode/decode on wire-format words ------------------
// field: 0 = Fq (6 words), 1 = Fr (4 words).  in/out: n * k64 words.
void mont_encode_batch(const uint64_t* in, uint64_t* out, size_t n, int field) {
  if (field == 0)
    mont_scale_batch<6>(in, out, n, FQ_R2, FQ_P, FQ_INV);
  else
    mont_scale_batch<4>(in, out, n, FR_R2, FR_P, FR_INV);
}

void mont_decode_batch(const uint64_t* in, uint64_t* out, size_t n, int field) {
  static const uint64_t ONE6[6] = {1, 0, 0, 0, 0, 0};
  static const uint64_t ONE4[4] = {1, 0, 0, 0};
  if (field == 0)
    mont_scale_batch<6>(in, out, n, ONE6, FQ_P, FQ_INV);
  else
    mont_scale_batch<4>(in, out, n, ONE4, FR_P, FR_INV);
}

int native_abi_version(void) { return 1; }

}  // extern "C"
