// Native host library for dvt-circuits-tpu.
//
// The TPU owns the batched prover kernels; this library is the native
// runtime for the *host-side* hot paths — the scalar Poseidon2 permutation
// that drives the Fiat–Shamir challenger and Merkle opening verification
// (the verifier must stay cheap and device-free), plus batched BabyBear
// helpers.  Mirrors the role native code plays in the reference's host
// (SP1's CPU prover runtime, SURVEY.md §2.2) without any Python-level
// crypto logic living here: round constants are injected from the single
// Python source of truth at init.
//
// Build: make native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>

namespace {

constexpr uint32_t P = 2013265921u;  // BabyBear: 15·2^27 + 1
constexpr int WIDTH = 16;
constexpr int ROUNDS_F = 8;
constexpr int ROUNDS_P = 13;

uint32_t g_ext_c[ROUNDS_F][WIDTH];
uint32_t g_int_c[ROUNDS_P];
uint32_t g_diag[WIDTH];
bool g_ready = false;

inline uint32_t add_p(uint32_t a, uint32_t b) {
  uint32_t s = a + b;  // both < p < 2^31: no overflow
  return s >= P ? s - P : s;
}

inline uint32_t mul_p(uint32_t a, uint32_t b) {
  return static_cast<uint32_t>((static_cast<uint64_t>(a) * b) % P);
}

inline uint32_t sbox7(uint32_t x) {
  uint32_t x2 = mul_p(x, x);
  uint32_t x3 = mul_p(x2, x);
  uint32_t x4 = mul_p(x2, x2);
  return mul_p(x4, x3);
}

inline void m4(uint32_t* x) {
  // Poseidon2 M4 block via the add/double chain (matches the Python spec)
  uint64_t t0 = x[0] + x[1];
  uint64_t t1 = x[2] + x[3];
  uint64_t t2 = 2ull * x[1] + t1;
  uint64_t t3 = 2ull * x[3] + t0;
  uint64_t t4 = 4ull * t1 + t3;
  uint64_t t5 = 4ull * t0 + t2;
  uint64_t t6 = t3 + t5;
  uint64_t t7 = t2 + t4;
  x[0] = static_cast<uint32_t>(t6 % P);
  x[1] = static_cast<uint32_t>(t5 % P);
  x[2] = static_cast<uint32_t>(t7 % P);
  x[3] = static_cast<uint32_t>(t4 % P);
}

inline void external_linear(uint32_t* s) {
  for (int g = 0; g < 4; ++g) m4(s + 4 * g);
  uint32_t sums[4];
  for (int j = 0; j < 4; ++j) {
    uint64_t acc = 0;
    for (int g = 0; g < 4; ++g) acc += s[4 * g + j];
    sums[j] = static_cast<uint32_t>(acc % P);
  }
  for (int i = 0; i < WIDTH; ++i) s[i] = add_p(s[i], sums[i & 3]);
}

inline void internal_linear(uint32_t* s) {
  uint64_t total = 0;
  for (int i = 0; i < WIDTH; ++i) total += s[i];
  uint32_t tot = static_cast<uint32_t>(total % P);
  for (int i = 0; i < WIDTH; ++i) s[i] = add_p(mul_p(g_diag[i], s[i]), tot);
}

inline void permute_one(uint32_t* s) {
  external_linear(s);
  for (int r = 0; r < ROUNDS_F / 2; ++r) {
    for (int i = 0; i < WIDTH; ++i) s[i] = sbox7(add_p(s[i], g_ext_c[r][i]));
    external_linear(s);
  }
  for (int r = 0; r < ROUNDS_P; ++r) {
    s[0] = sbox7(add_p(s[0], g_int_c[r]));
    internal_linear(s);
  }
  for (int r = ROUNDS_F / 2; r < ROUNDS_F; ++r) {
    for (int i = 0; i < WIDTH; ++i) s[i] = sbox7(add_p(s[i], g_ext_c[r][i]));
    external_linear(s);
  }
}

}  // namespace

extern "C" {

// Inject the Poseidon2 constants (single source of truth lives in Python).
void p2_init(const uint32_t* ext_c, const uint32_t* int_c, const uint32_t* diag) {
  std::memcpy(g_ext_c, ext_c, sizeof(g_ext_c));
  std::memcpy(g_int_c, int_c, sizeof(g_int_c));
  std::memcpy(g_diag, diag, sizeof(g_diag));
  g_ready = true;
}

int p2_ready() { return g_ready ? 1 : 0; }

// In-place permutation of n contiguous width-16 states.
void p2_permute_batch(uint32_t* states, int64_t n) {
  for (int64_t i = 0; i < n; ++i) permute_one(states + i * WIDTH);
}

// Sponge-hash rows of a (n, w) matrix into (n, 8) digests (rate 8,
// overwrite mode) — the host mirror of pcs/merkle.hash_rows.
void p2_hash_rows(const uint32_t* matrix, int64_t n, int64_t w, uint32_t* out) {
  for (int64_t r = 0; r < n; ++r) {
    uint32_t state[WIDTH] = {0};
    const uint32_t* row = matrix + r * w;
    for (int64_t off = 0; off < w; off += 8) {
      for (int64_t j = 0; j < 8; ++j)
        state[j] = (off + j < w) ? row[off + j] : 0u;
      permute_one(state);
    }
    std::memcpy(out + r * 8, state, 8 * sizeof(uint32_t));
  }
}

// Compress digest pairs: (n, 16) → (n, 8).
void p2_compress(const uint32_t* pairs, int64_t n, uint32_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    uint32_t state[WIDTH];
    std::memcpy(state, pairs + i * WIDTH, sizeof(state));
    permute_one(state);
    std::memcpy(out + i * 8, state, 8 * sizeof(uint32_t));
  }
}

}  // extern "C"
