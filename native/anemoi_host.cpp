// Native host-side library for the anemoi-tpu framework.
//
// Two roles (the TPU-native equivalents of the reference's native Rust
// runtime pieces, SURVEY.md section 2.4):
//
//  1. Data loader: sponge byte->field-element packing (chunking, padding,
//     13-bit limb decomposition) -- the host hot path feeding the device.
//     Chunk sizes (31 / 47 bytes) are chosen so chunk values are always
//     below the modulus: packing is pure bit slicing, no reduction
//     (reference: src/<field>/anemoi_*/hasher.rs:18-58).
//
//  2. CPU oracle: a 64-bit-limb Montgomery implementation of the full
//     Anemoi permutation (CIOS multiplication with __uint128 accumulation),
//     parameterized entirely by runtime field/instance data passed from
//     Python -- the moral equivalent of the arkworks Fp256/Fp384 backend
//     plus the reference's generic trait layer (src/traits.rs:113-378).
//     Used for high-throughput host-side verification of device batches.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstring>
#include <cstddef>

extern "C" {

// ---------------------------------------------------------------------------
// byte -> limb packing (data loader)
// ---------------------------------------------------------------------------

// Number of field elements a `len`-byte message absorbs to (ceil(len/chunk);
// 0 for an empty message, matching the reference).
size_t anemoi_num_elements(size_t len, int chunk) {
  return (len + (size_t)chunk - 1) / (size_t)chunk;
}

// Pack a byte message into 13-bit limb vectors, one row of `n_limbs` int32
// per absorbed element, appending the 1-byte pad to a short final chunk.
// out must hold anemoi_num_elements(len, chunk) * n_limbs int32.
void anemoi_pack_bytes(const uint8_t* data, size_t len, int chunk,
                       int n_limbs, int32_t* out) {
  size_t n_elem = anemoi_num_elements(len, chunk);
  uint8_t buf[64];
  for (size_t e = 0; e < n_elem; ++e) {
    size_t off = e * (size_t)chunk;
    size_t take = len - off < (size_t)chunk ? len - off : (size_t)chunk;
    std::memset(buf, 0, sizeof(buf));
    std::memcpy(buf, data + off, take);
    if (take < (size_t)chunk) buf[take] = 1;  // padding byte
    // little-endian bit stream -> base-2^13 digits
    int32_t* row = out + e * (size_t)n_limbs;
    size_t bit = 0;
    for (int l = 0; l < n_limbs; ++l) {
      uint32_t v = 0;
      for (int b = 0; b < 13; ++b, ++bit) {
        size_t byte_idx = bit >> 3;
        if (byte_idx < sizeof(buf)) {
          v |= (uint32_t)((buf[byte_idx] >> (bit & 7)) & 1u) << b;
        }
      }
      row[l] = (int32_t)v;
    }
  }
}

// Repack between the device's base-2^13 int32 limbs and canonical 64-bit
// limbs (both little-endian).
void anemoi_limbs13_to_64(const int32_t* in13, int n13, uint64_t* out64,
                          int n64) {
  for (int i = 0; i < n64; ++i) out64[i] = 0;
  for (int i = 0; i < n13; ++i) {
    uint64_t v = (uint64_t)(uint32_t)in13[i];
    int bit = 13 * i;
    int w = bit >> 6, s = bit & 63;
    if (w < n64) out64[w] |= v << s;
    if (s > 51 && w + 1 < n64) out64[w + 1] |= v >> (64 - s);
  }
}

void anemoi_limbs64_to_13(const uint64_t* in64, int n64, int32_t* out13,
                          int n13) {
  for (int i = 0; i < n13; ++i) {
    int bit = 13 * i;
    int w = bit >> 6, s = bit & 63;
    uint64_t v = w < n64 ? in64[w] >> s : 0;
    if (s > 51 && w + 1 < n64) v |= in64[w + 1] << (64 - s);
    out13[i] = (int32_t)(v & 0x1fffu);
  }
}

// ---------------------------------------------------------------------------
// 64-bit Montgomery field arithmetic (CPU oracle)
// ---------------------------------------------------------------------------

constexpr int MAX_LIMBS = 6;   // up to 384-bit fields
constexpr int MAX_WIDTH = 4;   // state width of the shipped instantiations

struct FieldCtx {
  int32_t n64;                 // 64-bit limb count (4 or 6)
  uint64_t p[MAX_LIMBS];       // modulus
  uint64_t n0inv;              // -p^-1 mod 2^64
  uint64_t r2[MAX_LIMBS];      // R^2 mod p
  uint64_t one_mont[MAX_LIMBS];// R mod p
};

struct InstanceCtx {
  int32_t width;               // 2 or 4
  int32_t columns;             // 1 or 2
  int32_t rounds;
  int32_t inv_alpha_bits;      // exponent bit length
  const uint8_t* inv_alpha;    // exponent bits, MSB first
  const uint64_t* C;           // (rounds*columns) x n64, Montgomery
  const uint64_t* D;
  const uint64_t* beta_mont;   // n64
  const uint64_t* delta_mont;  // n64
};

typedef unsigned __int128 u128;

static inline void fp_add(const FieldCtx* f, const uint64_t* a,
                          const uint64_t* b, uint64_t* z) {
  int n = f->n64;
  u128 c = 0;
  for (int i = 0; i < n; ++i) {
    c += (u128)a[i] + b[i];
    z[i] = (uint64_t)c;
    c >>= 64;
  }
  // conditional subtract p
  uint64_t t[MAX_LIMBS];
  u128 br = 0;
  for (int i = 0; i < n; ++i) {
    u128 d = (u128)z[i] - f->p[i] - br;
    t[i] = (uint64_t)d;
    br = (d >> 64) & 1;  // two's complement borrow
  }
  if (c || !br) std::memcpy(z, t, n * 8);
}

static inline void fp_sub(const FieldCtx* f, const uint64_t* a,
                          const uint64_t* b, uint64_t* z) {
  int n = f->n64;
  u128 br = 0;
  for (int i = 0; i < n; ++i) {
    u128 d = (u128)a[i] - b[i] - br;
    z[i] = (uint64_t)d;
    br = (d >> 64) & 1;
  }
  if (br) {
    u128 c = 0;
    for (int i = 0; i < n; ++i) {
      c += (u128)z[i] + f->p[i];
      z[i] = (uint64_t)c;
      c >>= 64;
    }
  }
}

// CIOS Montgomery multiplication on 64-bit limbs.
static inline void fp_mul(const FieldCtx* f, const uint64_t* a,
                          const uint64_t* b, uint64_t* z) {
  int n = f->n64;
  uint64_t t[MAX_LIMBS + 2] = {0};
  for (int i = 0; i < n; ++i) {
    u128 c = 0;
    for (int j = 0; j < n; ++j) {
      c += (u128)t[j] + (u128)a[i] * b[j];
      t[j] = (uint64_t)c;
      c >>= 64;
    }
    c += t[n];
    t[n] = (uint64_t)c;
    t[n + 1] = (uint64_t)(c >> 64);

    uint64_t m = t[0] * f->n0inv;
    c = (u128)t[0] + (u128)m * f->p[0];
    c >>= 64;
    for (int j = 1; j < n; ++j) {
      c += (u128)t[j] + (u128)m * f->p[j];
      t[j - 1] = (uint64_t)c;
      c >>= 64;
    }
    c += t[n];
    t[n - 1] = (uint64_t)c;
    t[n] = t[n + 1] + (uint64_t)(c >> 64);
    t[n + 1] = 0;
  }
  // t < 2p: conditional subtract
  uint64_t s[MAX_LIMBS];
  u128 br = 0;
  for (int i = 0; i < n; ++i) {
    u128 d = (u128)t[i] - f->p[i] - br;
    s[i] = (uint64_t)d;
    br = (d >> 64) & 1;
  }
  if (t[n] || !br) std::memcpy(z, s, n * 8);
  else std::memcpy(z, t, n * 8);
}

static inline void fp_sqr(const FieldCtx* f, const uint64_t* a, uint64_t* z) {
  fp_mul(f, a, a, z);
}

static void fp_exp_bits(const FieldCtx* f, const uint64_t* x,
                        const uint8_t* bits, int nbits, uint64_t* z) {
  uint64_t acc[MAX_LIMBS];
  std::memcpy(acc, f->one_mont, f->n64 * 8);
  for (int i = 0; i < nbits; ++i) {
    fp_sqr(f, acc, acc);
    if (bits[i]) fp_mul(f, acc, x, acc);
  }
  std::memcpy(z, acc, f->n64 * 8);
}

// ---------------------------------------------------------------------------
// Anemoi permutation (spec: reference src/traits.rs:113-378)
// ---------------------------------------------------------------------------

static void permute_one(const FieldCtx* f, const InstanceCtx* ins,
                        uint64_t* st /* width x n64 */) {
  int n = f->n64, cols = ins->columns, w = ins->width;
  uint64_t tmp[MAX_LIMBS], tmp2[MAX_LIMBS];
#define EL(i) (st + (i) * n)
  for (int r = 0; r <= ins->rounds; ++r) {
    if (r < ins->rounds) {
      // ark layer
      for (int i = 0; i < cols; ++i) {
        fp_add(f, EL(i), ins->C + (r * cols + i) * n, EL(i));
        fp_add(f, EL(cols + i), ins->D + (r * cols + i) * n, EL(cols + i));
      }
    }
    // mds layer (+ final application after the last round)
    if (cols == 1) {
      fp_add(f, EL(1), EL(0), EL(1));
      fp_add(f, EL(0), EL(1), EL(0));
    } else {  // cols == 2
      fp_mul(f, ins->beta_mont, EL(1), tmp);
      fp_add(f, EL(0), tmp, EL(0));
      fp_mul(f, ins->beta_mont, EL(0), tmp);
      fp_add(f, EL(1), tmp, EL(1));
      fp_mul(f, ins->beta_mont, EL(2), tmp);
      fp_add(f, EL(3), tmp, EL(3));
      fp_mul(f, ins->beta_mont, EL(3), tmp);
      fp_add(f, EL(2), tmp, EL(2));
      for (int i = 0; i < n; ++i) {  // swap y0, y1
        uint64_t s = EL(2)[i]; EL(2)[i] = EL(3)[i]; EL(3)[i] = s;
      }
      fp_add(f, EL(2), EL(0), EL(2));
      fp_add(f, EL(3), EL(1), EL(3));
      fp_add(f, EL(0), EL(2), EL(0));
      fp_add(f, EL(1), EL(3), EL(1));
    }
    if (r == ins->rounds) break;
    // sbox layer (open Flystel)
    for (int i = 0; i < cols; ++i) {
      uint64_t* x = EL(i);
      uint64_t* y = EL(cols + i);
      fp_sqr(f, y, tmp);
      fp_mul(f, ins->beta_mont, tmp, tmp);
      fp_sub(f, x, tmp, x);
      fp_exp_bits(f, x, ins->inv_alpha, ins->inv_alpha_bits, tmp2);
      fp_sub(f, y, tmp2, y);
      fp_sqr(f, y, tmp);
      fp_mul(f, ins->beta_mont, tmp, tmp);
      fp_add(f, x, tmp, x);
      fp_add(f, x, ins->delta_mont, x);
    }
  }
#undef EL
}

// Batched permutation over `count` states laid out (count, width, n64),
// Montgomery form in/out.
void anemoi_permute_batch(const FieldCtx* f, const InstanceCtx* ins,
                          uint64_t* states, size_t count) {
  int stride = ins->width * f->n64;
  for (size_t s = 0; s < count; ++s) permute_one(f, ins, states + s * stride);
}

// Batched Jive-k feed-forward compression (reference 4_3/hasher.rs:161-178):
// out[i] = sum_j in[i+c*j] + P(in)[i+c*j], c = width/k.
void anemoi_jive_batch(const FieldCtx* f, const InstanceCtx* ins,
                       const uint64_t* states_in, uint64_t* out, size_t count,
                       int k) {
  int n = f->n64, w = ins->width, c = w / k;
  uint64_t st[MAX_WIDTH * MAX_LIMBS];
  for (size_t s = 0; s < count; ++s) {
    const uint64_t* in = states_in + s * (size_t)(w * n);
    std::memcpy(st, in, (size_t)w * n * 8);
    permute_one(f, ins, st);
    for (int i = 0; i < c; ++i) {
      uint64_t* o = out + s * (size_t)(c * n) + (size_t)i * n;
      std::memcpy(o, in + (size_t)i * n, n * 8);
      fp_add(f, o, st + (size_t)i * n, o);
      for (int j = 1; j < k; ++j) {
        fp_add(f, o, in + (size_t)(i + c * j) * n, o);
        fp_add(f, o, st + (size_t)(i + c * j) * n, o);
      }
    }
  }
}

// Montgomery domain conversion helpers for the Python side.
void anemoi_to_mont(const FieldCtx* f, uint64_t* vals, size_t count) {
  for (size_t i = 0; i < count; ++i)
    fp_mul(f, vals + i * f->n64, f->r2, vals + i * f->n64);
}

void anemoi_from_mont(const FieldCtx* f, uint64_t* vals, size_t count) {
  uint64_t one[MAX_LIMBS] = {1, 0, 0, 0, 0, 0};
  for (size_t i = 0; i < count; ++i)
    fp_mul(f, vals + i * f->n64, one, vals + i * f->n64);
}

}  // extern "C"
