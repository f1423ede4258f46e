// Native BLS12-381 host backend for dvt-circuits-tpu.
//
// The witness programs (dkg/ verification layer) verify BLS signatures and
// evaluate committed polynomials over G1/G2; the pure-Python host mirror
// (hostcrypto/bls12_381.py) is the semantic source of truth but a pairing
// costs ~170 ms there.  This file re-implements the hot group/pairing
// operations in C++ (6×uint64 Montgomery Fp, __uint128 accumulation) and is
// dispatched from Python with the pure path as fallback and as the oracle
// in property tests.  It mirrors the reference's use of native crypto crates
// on the host side (crates/dkg/Cargo.toml:22-25, SURVEY.md §2.2).
//
// All big constants (p, R², -p⁻¹ mod 2⁶⁴, Frobenius coefficients, the final-
// exponentiation hard exponent) are injected from the Python source of truth
// at init — no copied magic numbers.
//
// Conventions:
//   * Fp:  48-byte big-endian on the wire; 6×uint64 little-endian Montgomery
//     internally (R = 2^384).
//   * Fp2 = Fp[i]/(i²+1) as (a, b) = a + b·i; Fp6 = Fp2[v]/(v³ − ξ),
//     ξ = 1 + i; Fp12 = Fp6[w]/(w² − v).  (Same tower as the Python host.)
//   * G1 affine: 96 bytes (x‖y BE) + explicit infinity flag.
//     G2 affine: 192 bytes (x.a‖x.b‖y.a‖y.b) + flag.
//   * Scalars: 32-byte big-endian (callers reduce mod r as needed).

#include <cstdint>
#include <cstring>

namespace {

using u64 = uint64_t;
using u128 = unsigned __int128;

constexpr int NL = 6;  // 6 × 64 = 384 bits

struct Fp {
  u64 l[6];
};

Fp FP_P;       // modulus
Fp FP_R2;      // R² mod p
u64 FP_INV;    // -p⁻¹ mod 2⁶⁴
Fp FP_ONE_M;   // R mod p (1 in Montgomery form)
bool g_bls_ready = false;

inline bool fp_is_zero(const Fp& a) {
  u64 acc = 0;
  for (int i = 0; i < NL; ++i) acc |= a.l[i];
  return acc == 0;
}

inline bool fp_eq(const Fp& a, const Fp& b) {
  u64 acc = 0;
  for (int i = 0; i < NL; ++i) acc |= a.l[i] ^ b.l[i];
  return acc == 0;
}

inline int fp_cmp(const Fp& a, const Fp& b) {
  for (int i = NL - 1; i >= 0; --i) {
    if (a.l[i] < b.l[i]) return -1;
    if (a.l[i] > b.l[i]) return 1;
  }
  return 0;
}

inline u64 adc(u64 a, u64 b, u64& carry) {
  u128 t = (u128)a + b + carry;
  carry = (u64)(t >> 64);
  return (u64)t;
}

inline u64 sbb(u64 a, u64 b, u64& borrow) {
  u128 t = (u128)a - b - borrow;
  borrow = (u64)((t >> 64) & 1);
  return (u64)t;
}

inline void fp_sub_p_if_ge(Fp& a) {
  if (fp_cmp(a, FP_P) >= 0) {
    u64 borrow = 0;
    for (int i = 0; i < NL; ++i) a.l[i] = sbb(a.l[i], FP_P.l[i], borrow);
  }
}

inline Fp fp_add(const Fp& a, const Fp& b) {
  Fp r;
  u64 carry = 0;
  for (int i = 0; i < NL; ++i) r.l[i] = adc(a.l[i], b.l[i], carry);
  // p < 2^383 so a+b < 2^384: carry can be dropped only after cond-sub...
  // both inputs < p < 2^381, sum < 2^382 — no carry out.
  fp_sub_p_if_ge(r);
  return r;
}

inline Fp fp_sub(const Fp& a, const Fp& b) {
  Fp r;
  u64 borrow = 0;
  for (int i = 0; i < NL; ++i) r.l[i] = sbb(a.l[i], b.l[i], borrow);
  if (borrow) {
    u64 carry = 0;
    for (int i = 0; i < NL; ++i) r.l[i] = adc(r.l[i], FP_P.l[i], carry);
  }
  return r;
}

inline Fp fp_neg(const Fp& a) {
  if (fp_is_zero(a)) return a;
  Fp r;
  u64 borrow = 0;
  for (int i = 0; i < NL; ++i) r.l[i] = sbb(FP_P.l[i], a.l[i], borrow);
  return r;
}

inline Fp fp_dbl(const Fp& a) { return fp_add(a, a); }

// CIOS Montgomery multiplication
inline Fp fp_mul(const Fp& a, const Fp& b) {
  u64 t[NL + 2] = {0};
  for (int i = 0; i < NL; ++i) {
    u64 carry = 0;
    for (int j = 0; j < NL; ++j) {
      u128 prod = (u128)a.l[j] * b.l[i] + t[j] + carry;
      t[j] = (u64)prod;
      carry = (u64)(prod >> 64);
    }
    u128 s = (u128)t[NL] + carry;
    t[NL] = (u64)s;
    t[NL + 1] = (u64)(s >> 64);

    u64 m = t[0] * FP_INV;
    u128 prod = (u128)m * FP_P.l[0] + t[0];
    carry = (u64)(prod >> 64);
    for (int j = 1; j < NL; ++j) {
      prod = (u128)m * FP_P.l[j] + t[j] + carry;
      t[j - 1] = (u64)prod;
      carry = (u64)(prod >> 64);
    }
    s = (u128)t[NL] + carry;
    t[NL - 1] = (u64)s;
    t[NL] = t[NL + 1] + (u64)(s >> 64);
    t[NL + 1] = 0;
  }
  Fp r;
  std::memcpy(r.l, t, sizeof(r.l));
  // t[NL] is 0 or 1; subtract p if the 385-bit value >= p
  if (t[NL]) {
    u64 borrow = 0;
    for (int i = 0; i < NL; ++i) r.l[i] = sbb(r.l[i], FP_P.l[i], borrow);
  } else {
    fp_sub_p_if_ge(r);
  }
  return r;
}

inline Fp fp_sqr(const Fp& a) { return fp_mul(a, a); }

Fp fp_pow_bytes(const Fp& a, const uint8_t* exp_be, int exp_len) {
  Fp result = FP_ONE_M;
  for (int i = 0; i < exp_len; ++i) {
    uint8_t byte = exp_be[i];
    for (int bit = 7; bit >= 0; --bit) {
      result = fp_sqr(result);
      if ((byte >> bit) & 1) result = fp_mul(result, a);
    }
  }
  return result;
}

uint8_t P_MINUS_2_BE[48];  // injected: (p − 2) big-endian, for Fermat inverse

inline Fp fp_inv(const Fp& a) { return fp_pow_bytes(a, P_MINUS_2_BE, 48); }

void fp_from_be(const uint8_t* in, Fp& out_mont) {
  Fp raw;
  for (int i = 0; i < NL; ++i) {
    u64 v = 0;
    for (int j = 0; j < 8; ++j) v = (v << 8) | in[(NL - 1 - i) * 8 + j];
    raw.l[i] = v;
  }
  out_mont = fp_mul(raw, FP_R2);  // to Montgomery
}

void fp_to_be(const Fp& a_mont, uint8_t* out) {
  Fp one = {{1, 0, 0, 0, 0, 0}};
  Fp std = fp_mul(a_mont, one);  // from Montgomery
  for (int i = 0; i < NL; ++i) {
    u64 v = std.l[NL - 1 - i];
    for (int j = 0; j < 8; ++j) out[i * 8 + j] = (uint8_t)(v >> (56 - 8 * j));
  }
}

// ---------------------------------------------------------------------------
// Fp2 = Fp[i]/(i² + 1)
// ---------------------------------------------------------------------------

struct Fp2 {
  Fp a, b;
};

inline Fp2 fp2_add(const Fp2& x, const Fp2& y) { return {fp_add(x.a, y.a), fp_add(x.b, y.b)}; }
inline Fp2 fp2_sub(const Fp2& x, const Fp2& y) { return {fp_sub(x.a, y.a), fp_sub(x.b, y.b)}; }
inline Fp2 fp2_neg(const Fp2& x) { return {fp_neg(x.a), fp_neg(x.b)}; }
inline Fp2 fp2_dbl(const Fp2& x) { return {fp_dbl(x.a), fp_dbl(x.b)}; }
inline bool fp2_is_zero(const Fp2& x) { return fp_is_zero(x.a) && fp_is_zero(x.b); }
inline bool fp2_eq(const Fp2& x, const Fp2& y) { return fp_eq(x.a, y.a) && fp_eq(x.b, y.b); }

inline Fp2 fp2_mul(const Fp2& x, const Fp2& y) {
  Fp t0 = fp_mul(x.a, y.a);
  Fp t1 = fp_mul(x.b, y.b);
  Fp t2 = fp_mul(fp_add(x.a, x.b), fp_add(y.a, y.b));
  return {fp_sub(t0, t1), fp_sub(fp_sub(t2, t0), t1)};
}

inline Fp2 fp2_sqr(const Fp2& x) {
  Fp t0 = fp_add(x.a, x.b);
  Fp t1 = fp_sub(x.a, x.b);
  Fp t2 = fp_dbl(fp_mul(x.a, x.b));
  return {fp_mul(t0, t1), t2};
}

inline Fp2 fp2_conj(const Fp2& x) { return {x.a, fp_neg(x.b)}; }

inline Fp2 fp2_inv(const Fp2& x) {
  Fp norm = fp_add(fp_sqr(x.a), fp_sqr(x.b));
  Fp n_inv = fp_inv(norm);
  return {fp_mul(x.a, n_inv), fp_neg(fp_mul(x.b, n_inv))};
}

// multiply by ξ = 1 + i
inline Fp2 fp2_mul_xi(const Fp2& x) { return {fp_sub(x.a, x.b), fp_add(x.a, x.b)}; }

// ---------------------------------------------------------------------------
// Fp6 = Fp2[v]/(v³ − ξ)
// ---------------------------------------------------------------------------

struct Fp6 {
  Fp2 c0, c1, c2;
};

inline Fp6 fp6_add(const Fp6& x, const Fp6& y) {
  return {fp2_add(x.c0, y.c0), fp2_add(x.c1, y.c1), fp2_add(x.c2, y.c2)};
}
inline Fp6 fp6_sub(const Fp6& x, const Fp6& y) {
  return {fp2_sub(x.c0, y.c0), fp2_sub(x.c1, y.c1), fp2_sub(x.c2, y.c2)};
}
inline Fp6 fp6_neg(const Fp6& x) { return {fp2_neg(x.c0), fp2_neg(x.c1), fp2_neg(x.c2)}; }
inline bool fp6_is_zero(const Fp6& x) {
  return fp2_is_zero(x.c0) && fp2_is_zero(x.c1) && fp2_is_zero(x.c2);
}
inline bool fp6_eq(const Fp6& x, const Fp6& y) {
  return fp2_eq(x.c0, y.c0) && fp2_eq(x.c1, y.c1) && fp2_eq(x.c2, y.c2);
}

inline Fp6 fp6_mul(const Fp6& x, const Fp6& y) {
  Fp2 t0 = fp2_mul(x.c0, y.c0);
  Fp2 t1 = fp2_mul(x.c1, y.c1);
  Fp2 t2 = fp2_mul(x.c2, y.c2);
  Fp2 c0 = fp2_add(
      t0, fp2_mul_xi(fp2_sub(
              fp2_mul(fp2_add(x.c1, x.c2), fp2_add(y.c1, y.c2)), fp2_add(t1, t2))));
  Fp2 c1 = fp2_add(
      fp2_sub(fp2_mul(fp2_add(x.c0, x.c1), fp2_add(y.c0, y.c1)), fp2_add(t0, t1)),
      fp2_mul_xi(t2));
  Fp2 c2 = fp2_add(
      fp2_sub(fp2_mul(fp2_add(x.c0, x.c2), fp2_add(y.c0, y.c2)), fp2_add(t0, t2)), t1);
  return {c0, c1, c2};
}

inline Fp6 fp6_sqr(const Fp6& x) { return fp6_mul(x, x); }

// multiply by v (the Fp6 generator): (c0, c1, c2) → (ξ·c2, c0, c1)
inline Fp6 fp6_mul_by_v(const Fp6& x) { return {fp2_mul_xi(x.c2), x.c0, x.c1}; }

inline Fp6 fp6_inv(const Fp6& x) {
  Fp2 t0 = fp2_sub(fp2_sqr(x.c0), fp2_mul_xi(fp2_mul(x.c1, x.c2)));
  Fp2 t1 = fp2_sub(fp2_mul_xi(fp2_sqr(x.c2)), fp2_mul(x.c0, x.c1));
  Fp2 t2 = fp2_sub(fp2_sqr(x.c1), fp2_mul(x.c0, x.c2));
  Fp2 denom = fp2_add(
      fp2_mul(x.c0, t0),
      fp2_mul_xi(fp2_add(fp2_mul(x.c2, t1), fp2_mul(x.c1, t2))));
  Fp2 d_inv = fp2_inv(denom);
  return {fp2_mul(t0, d_inv), fp2_mul(t1, d_inv), fp2_mul(t2, d_inv)};
}

// ---------------------------------------------------------------------------
// Fp12 = Fp6[w]/(w² − v)
// ---------------------------------------------------------------------------

struct Fp12 {
  Fp6 c0, c1;
};

Fp2 FP2_ZERO_C;  // set at init
Fp2 FP2_ONE_C;
Fp12 FP12_ONE_C;

inline Fp12 fp12_mul(const Fp12& x, const Fp12& y) {
  Fp6 t0 = fp6_mul(x.c0, y.c0);
  Fp6 t1 = fp6_mul(x.c1, y.c1);
  Fp6 c0 = fp6_add(t0, fp6_mul_by_v(t1));
  Fp6 c1 = fp6_sub(
      fp6_sub(fp6_mul(fp6_add(x.c0, x.c1), fp6_add(y.c0, y.c1)), t0), t1);
  return {c0, c1};
}

inline Fp12 fp12_sqr(const Fp12& x) { return fp12_mul(x, x); }
inline Fp12 fp12_conj(const Fp12& x) { return {x.c0, fp6_neg(x.c1)}; }
inline Fp12 fp12_add(const Fp12& x, const Fp12& y) {
  return {fp6_add(x.c0, y.c0), fp6_add(x.c1, y.c1)};
}
inline Fp12 fp12_sub(const Fp12& x, const Fp12& y) {
  return {fp6_sub(x.c0, y.c0), fp6_sub(x.c1, y.c1)};
}
inline bool fp12_is_zero(const Fp12& x) { return fp6_is_zero(x.c0) && fp6_is_zero(x.c1); }
inline bool fp12_eq(const Fp12& x, const Fp12& y) {
  return fp6_eq(x.c0, y.c0) && fp6_eq(x.c1, y.c1);
}

inline Fp12 fp12_inv(const Fp12& x) {
  Fp6 t = fp6_inv(fp6_sub(fp6_sqr(x.c0), fp6_mul_by_v(fp6_sqr(x.c1))));
  return {fp6_mul(x.c0, t), fp6_neg(fp6_mul(x.c1, t))};
}

// Frobenius coefficients γ1..γ5 = ξ^(k(p−1)/6), injected from Python
Fp2 G1F, G2F, G3F, G4F, G5F;

inline Fp12 fp12_frobenius(const Fp12& x) {
  return {
      {fp2_conj(x.c0.c0), fp2_mul(fp2_conj(x.c0.c1), G2F),
       fp2_mul(fp2_conj(x.c0.c2), G4F)},
      {fp2_mul(fp2_conj(x.c1.c0), G1F), fp2_mul(fp2_conj(x.c1.c1), G3F),
       fp2_mul(fp2_conj(x.c1.c2), G5F)},
  };
}

Fp12 fp12_pow_bytes(const Fp12& a, const uint8_t* exp_be, int exp_len) {
  Fp12 result = FP12_ONE_C;
  bool started = false;
  for (int i = 0; i < exp_len; ++i) {
    for (int bit = 7; bit >= 0; --bit) {
      if (started) result = fp12_sqr(result);
      if ((exp_be[i] >> bit) & 1) {
        result = fp12_mul(result, a);
        started = true;
      }
    }
  }
  return result;
}

// ---------------------------------------------------------------------------
// G1 (Jacobian over Fp) and G2 (Jacobian over Fp2), curve y² = x³ + 4(·ξ)
// ---------------------------------------------------------------------------

template <typename F>
struct Jac {
  F X, Y, Z;
};

Fp fp_zero_v() { Fp z; std::memset(z.l, 0, sizeof(z.l)); return z; }
Fp2 fp2_zero_v() { return {fp_zero_v(), fp_zero_v()}; }
Fp2 fp2_one_v() { return {FP_ONE_M, fp_zero_v()}; }

struct FpOps {
  using F = Fp;
  static F add(const F& a, const F& b) { return fp_add(a, b); }
  static F sub(const F& a, const F& b) { return fp_sub(a, b); }
  static F mul(const F& a, const F& b) { return fp_mul(a, b); }
  static F dbl(const F& a) { return fp_dbl(a); }
  static bool isz(const F& a) { return fp_is_zero(a); }
  static F zero() { return fp_zero_v(); }
  static F one() { return FP_ONE_M; }
};

struct Fp2Ops {
  using F = Fp2;
  static F add(const F& a, const F& b) { return fp2_add(a, b); }
  static F sub(const F& a, const F& b) { return fp2_sub(a, b); }
  static F mul(const F& a, const F& b) { return fp2_mul(a, b); }
  static F dbl(const F& a) { return fp2_dbl(a); }
  static bool isz(const F& a) { return fp2_is_zero(a); }
  static F zero() { return fp2_zero_v(); }
  static F one() { return fp2_one_v(); }
};

template <typename Ops>
struct Group {
  using F = typename Ops::F;
  using P = Jac<F>;

  static P inf() { return {Ops::zero(), Ops::one(), Ops::zero()}; }
  static bool is_inf(const P& p) { return Ops::isz(p.Z); }

  // standard Jacobian doubling (a = 0 curve)
  static P dbl(const P& p) {
    if (is_inf(p)) return p;
    F A = Ops::mul(p.X, p.X);
    F B = Ops::mul(p.Y, p.Y);
    F C = Ops::mul(B, B);
    F t = Ops::add(p.X, B);
    F D = Ops::dbl(Ops::sub(Ops::sub(Ops::mul(t, t), A), C));
    F E = Ops::add(Ops::dbl(A), A);
    F Fv = Ops::mul(E, E);
    F X3 = Ops::sub(Fv, Ops::dbl(D));
    F C8 = Ops::dbl(Ops::dbl(Ops::dbl(C)));
    F Y3 = Ops::sub(Ops::mul(E, Ops::sub(D, X3)), C8);
    F Z3 = Ops::dbl(Ops::mul(p.Y, p.Z));
    return {X3, Y3, Z3};
  }

  // add-2007-bl with exceptional cases handled explicitly
  static P add(const P& p, const P& q) {
    if (is_inf(p)) return q;
    if (is_inf(q)) return p;
    F Z1Z1 = Ops::mul(p.Z, p.Z);
    F Z2Z2 = Ops::mul(q.Z, q.Z);
    F U1 = Ops::mul(p.X, Z2Z2);
    F U2 = Ops::mul(q.X, Z1Z1);
    F S1 = Ops::mul(Ops::mul(p.Y, q.Z), Z2Z2);
    F S2 = Ops::mul(Ops::mul(q.Y, p.Z), Z1Z1);
    F H = Ops::sub(U2, U1);
    F r0 = Ops::sub(S2, S1);
    if (Ops::isz(H)) {
      if (Ops::isz(r0)) return dbl(p);
      return inf();  // P == −Q
    }
    F r = Ops::dbl(r0);
    F HH = Ops::dbl(H);
    F I = Ops::mul(HH, HH);
    F J = Ops::mul(H, I);
    F V = Ops::mul(U1, I);
    F X3 = Ops::sub(Ops::sub(Ops::mul(r, r), J), Ops::dbl(V));
    F Y3 = Ops::sub(Ops::mul(r, Ops::sub(V, X3)), Ops::dbl(Ops::mul(S1, J)));
    F Z3 = Ops::dbl(Ops::mul(Ops::mul(p.Z, q.Z), H));
    return {X3, Y3, Z3};
  }

  static P scalar_mul(const P& p, const uint8_t* k_be, int k_len) {
    P acc = inf();
    bool started = false;
    for (int i = 0; i < k_len; ++i) {
      for (int bit = 7; bit >= 0; --bit) {
        if (started) acc = dbl(acc);
        if ((k_be[i] >> bit) & 1) {
          acc = add(acc, p);
          started = true;
        }
      }
    }
    return acc;
  }
};

using G1 = Group<FpOps>;
using G2 = Group<Fp2Ops>;

// Jacobian → affine; returns false for infinity
bool g1_to_affine(const Jac<Fp>& p, Fp& x, Fp& y) {
  if (fp_is_zero(p.Z)) return false;
  Fp zi = fp_inv(p.Z);
  Fp zi2 = fp_sqr(zi);
  x = fp_mul(p.X, zi2);
  y = fp_mul(p.Y, fp_mul(zi2, zi));
  return true;
}

bool g2_to_affine(const Jac<Fp2>& p, Fp2& x, Fp2& y) {
  if (fp2_is_zero(p.Z)) return false;
  Fp2 zi = fp2_inv(p.Z);
  Fp2 zi2 = fp2_sqr(zi);
  x = fp2_mul(p.X, zi2);
  y = fp2_mul(p.Y, fp2_mul(zi2, zi));
  return true;
}

// ---------------------------------------------------------------------------
// Pairing: Miller loop over untwisted E(Fp12) affine points (mirrors the
// validated pure-Python host implementation), then final exponentiation.
// ---------------------------------------------------------------------------

Fp2 XI_INV;  // injected: (1+i)⁻¹

struct EFp12 {
  Fp12 x, y;
  bool inf;
};

// embed an Fp2 at Fp6 coefficient position (c_idx) of Fp12 part (w_idx)
Fp12 fp12_embed(const Fp2& v, int w_idx, int c_idx) {
  Fp12 r = {{fp2_zero_v(), fp2_zero_v(), fp2_zero_v()},
            {fp2_zero_v(), fp2_zero_v(), fp2_zero_v()}};
  Fp2* slot;
  Fp6& part = (w_idx == 0) ? r.c0 : r.c1;
  slot = (c_idx == 0) ? &part.c0 : (c_idx == 1) ? &part.c1 : &part.c2;
  *slot = v;
  return r;
}

// untwist: (x, y) ∈ E'(Fp2) → (x·ξ⁻¹·v², y·ξ⁻¹·vw) ∈ E(Fp12)
EFp12 untwist(const Fp2& qx, const Fp2& qy) {
  EFp12 r;
  r.x = fp12_embed(fp2_mul(qx, XI_INV), 0, 2);
  r.y = fp12_embed(fp2_mul(qy, XI_INV), 1, 1);
  r.inf = false;
  return r;
}

Fp12 fp12_scalar_small(const Fp12& a, int k) {
  Fp12 r = a;
  if (k == 2) r = fp12_add(a, a);
  if (k == 3) r = fp12_add(fp12_add(a, a), a);
  return r;
}

// affine addition on E(Fp12); nullptr-like via .inf
EFp12 efp12_add(const EFp12& p1, const EFp12& p2) {
  if (p1.inf) return p2;
  if (p2.inf) return p1;
  Fp12 lam;
  if (fp12_eq(p1.x, p2.x)) {
    if (fp12_is_zero(fp12_add(p1.y, p2.y))) {
      EFp12 inf;
      inf.inf = true;
      return inf;
    }
    lam = fp12_mul(fp12_scalar_small(fp12_mul(p1.x, p1.x), 3),
                   fp12_inv(fp12_scalar_small(p1.y, 2)));
  } else {
    lam = fp12_mul(fp12_sub(p2.y, p1.y), fp12_inv(fp12_sub(p2.x, p1.x)));
  }
  Fp12 x3 = fp12_sub(fp12_sub(fp12_mul(lam, lam), p1.x), p2.x);
  Fp12 y3 = fp12_sub(fp12_mul(lam, fp12_sub(p1.x, x3)), p1.y);
  return {x3, y3, false};
}

// line through t, q (tangent if t == q) evaluated at P = (px, py) ∈ G1
Fp12 line_eval(const EFp12& t, const EFp12& q, const Fp& px, const Fp& py) {
  Fp12 px12 = fp12_embed({px, fp_zero_v()}, 0, 0);
  Fp12 py12 = fp12_embed({py, fp_zero_v()}, 0, 0);
  if (fp12_eq(t.x, q.x) && fp12_eq(t.y, q.y)) {
    Fp12 num = fp12_scalar_small(fp12_mul(t.x, t.x), 3);
    Fp12 den = fp12_scalar_small(t.y, 2);
    Fp12 lam = fp12_mul(num, fp12_inv(den));
    return fp12_sub(fp12_sub(py12, t.y), fp12_mul(lam, fp12_sub(px12, t.x)));
  }
  if (fp12_eq(t.x, q.x)) {
    return fp12_sub(px12, t.x);  // vertical line
  }
  Fp12 lam = fp12_mul(fp12_sub(q.y, t.y), fp12_inv(fp12_sub(q.x, t.x)));
  return fp12_sub(fp12_sub(py12, t.y), fp12_mul(lam, fp12_sub(px12, t.x)));
}

// |x| = 0xD201000000010000 (BLS parameter magnitude; x < 0 → conjugate)
const uint8_t X_ABS_BE[8] = {0xD2, 0x01, 0x00, 0x00, 0x00, 0x01, 0x00, 0x00};

Fp12 miller_loop(const Fp& px, const Fp& py, bool p_inf, const Fp2& qx,
                 const Fp2& qy, bool q_inf) {
  if (p_inf || q_inf) return FP12_ONE_C;
  EFp12 Q = untwist(qx, qy);
  EFp12 T = Q;
  Fp12 f = FP12_ONE_C;
  // iterate bits of |x| below the MSB
  bool seen_msb = false;
  for (int i = 0; i < 8; ++i) {
    for (int bit = 7; bit >= 0; --bit) {
      int b = (X_ABS_BE[i] >> bit) & 1;
      if (!seen_msb) {
        if (b) seen_msb = true;
        continue;
      }
      f = fp12_mul(fp12_sqr(f), line_eval(T, T, px, py));
      T = efp12_add(T, T);
      if (b) {
        f = fp12_mul(f, line_eval(T, Q, px, py));
        T = efp12_add(T, Q);
      }
    }
  }
  return fp12_conj(f);  // x < 0
}

uint8_t HARD_EXP_BE[192];  // injected: (p⁴ − p² + 1)/r, big-endian
int HARD_EXP_LEN = 0;

Fp12 final_exponentiation(const Fp12& f) {
  Fp12 f1 = fp12_mul(fp12_conj(f), fp12_inv(f));
  Fp12 f2 = fp12_mul(fp12_frobenius(fp12_frobenius(f1)), f1);
  return fp12_pow_bytes(f2, HARD_EXP_BE, HARD_EXP_LEN);
}

// -- wire helpers -----------------------------------------------------------

void g1_from_wire(const uint8_t* in, Fp& x, Fp& y) {
  fp_from_be(in, x);
  fp_from_be(in + 48, y);
}

void g2_from_wire(const uint8_t* in, Fp2& x, Fp2& y) {
  fp_from_be(in, x.a);
  fp_from_be(in + 48, x.b);
  fp_from_be(in + 96, y.a);
  fp_from_be(in + 144, y.b);
}

}  // namespace

extern "C" {

// Inject all field constants from the Python source of truth.
// Layout (big-endian 48B each unless noted): p, R² mod p, p−2,
// γ1..γ5 (Fp2: a then b, 96B each), ξ⁻¹ (96B), inv (uint64),
// hard_exp (hard_len bytes).
void bls_init(const uint8_t* p_be, const uint8_t* r2_be, const uint8_t* p_minus2_be,
              const uint8_t* gammas_be, const uint8_t* xi_inv_be, u64 inv,
              const uint8_t* hard_exp_be, int hard_len) {
  // bootstrap: p (raw, not Montgomery)
  for (int i = 0; i < NL; ++i) {
    u64 v = 0;
    for (int j = 0; j < 8; ++j) v = (v << 8) | p_be[(NL - 1 - i) * 8 + j];
    FP_P.l[i] = v;
  }
  FP_INV = inv;
  // R2 raw load (it IS the Montgomery form of R, i.e. raw limbs of R² mod p)
  for (int i = 0; i < NL; ++i) {
    u64 v = 0;
    for (int j = 0; j < 8; ++j) v = (v << 8) | r2_be[(NL - 1 - i) * 8 + j];
    FP_R2.l[i] = v;
  }
  std::memcpy(P_MINUS_2_BE, p_minus2_be, 48);
  // 1 in Montgomery form: mont_mul(R2, 1_raw) = R mod p
  Fp one_raw = {{1, 0, 0, 0, 0, 0}};
  FP_ONE_M = fp_mul(one_raw, FP_R2);

  const uint8_t* g = gammas_be;
  Fp2* gs[5] = {&G1F, &G2F, &G3F, &G4F, &G5F};
  for (int k = 0; k < 5; ++k) {
    fp_from_be(g + k * 96, gs[k]->a);
    fp_from_be(g + k * 96 + 48, gs[k]->b);
  }
  fp_from_be(xi_inv_be, XI_INV.a);
  fp_from_be(xi_inv_be + 48, XI_INV.b);

  FP2_ZERO_C = fp2_zero_v();
  FP2_ONE_C = fp2_one_v();
  FP12_ONE_C = {{FP2_ONE_C, FP2_ZERO_C, FP2_ZERO_C},
                {FP2_ZERO_C, FP2_ZERO_C, FP2_ZERO_C}};

  HARD_EXP_LEN = hard_len > 192 ? 192 : hard_len;
  std::memcpy(HARD_EXP_BE, hard_exp_be, HARD_EXP_LEN);
  g_bls_ready = true;
}

int bls_ready() { return g_bls_ready ? 1 : 0; }

// out 96B; returns 0 if the result is infinity (out untouched), else 1
int bls_g1_mul(const uint8_t* pt, int pt_inf, const uint8_t* k_be, int k_len,
               uint8_t* out) {
  if (pt_inf) return 0;
  Fp x, y;
  g1_from_wire(pt, x, y);
  Jac<Fp> p = {x, y, FP_ONE_M};
  Jac<Fp> r = G1::scalar_mul(p, k_be, k_len);
  Fp rx, ry;
  if (!g1_to_affine(r, rx, ry)) return 0;
  fp_to_be(rx, out);
  fp_to_be(ry, out + 48);
  return 1;
}

int bls_g2_mul(const uint8_t* pt, int pt_inf, const uint8_t* k_be, int k_len,
               uint8_t* out) {
  if (pt_inf) return 0;
  Fp2 x, y;
  g2_from_wire(pt, x, y);
  Jac<Fp2> p = {x, y, fp2_one_v()};
  Jac<Fp2> r = G2::scalar_mul(p, k_be, k_len);
  Fp2 rx, ry;
  if (!g2_to_affine(r, rx, ry)) return 0;
  fp_to_be(rx.a, out);
  fp_to_be(rx.b, out + 48);
  fp_to_be(ry.a, out + 96);
  fp_to_be(ry.b, out + 144);
  return 1;
}

// batched G1 accumulation: out = Σᵢ kᵢ·Pᵢ (points 96B each, scalars 32B BE)
int bls_g1_msm(const uint8_t* pts, const uint8_t* infs, const uint8_t* ks,
               int n, uint8_t* out) {
  Jac<Fp> acc = G1::inf();
  for (int i = 0; i < n; ++i) {
    if (infs[i]) continue;
    Fp x, y;
    g1_from_wire(pts + 96 * i, x, y);
    Jac<Fp> p = {x, y, FP_ONE_M};
    acc = G1::add(acc, G1::scalar_mul(p, ks + 32 * i, 32));
  }
  Fp rx, ry;
  if (!g1_to_affine(acc, rx, ry)) return 0;
  fp_to_be(rx, out);
  fp_to_be(ry, out + 48);
  return 1;
}

// -- debug/bisect exports: fp12 blobs are 12×48B BE in tower order
//    c0.c0.a, c0.c0.b, c0.c1.a, …, c1.c2.b --------------------------------

static void fp12_from_wire(const uint8_t* in, Fp12& out) {
  Fp* slots[12] = {&out.c0.c0.a, &out.c0.c0.b, &out.c0.c1.a, &out.c0.c1.b,
                   &out.c0.c2.a, &out.c0.c2.b, &out.c1.c0.a, &out.c1.c0.b,
                   &out.c1.c1.a, &out.c1.c1.b, &out.c1.c2.a, &out.c1.c2.b};
  for (int i = 0; i < 12; ++i) fp_from_be(in + 48 * i, *slots[i]);
}

static void fp12_to_wire(const Fp12& x, uint8_t* out) {
  const Fp* slots[12] = {&x.c0.c0.a, &x.c0.c0.b, &x.c0.c1.a, &x.c0.c1.b,
                         &x.c0.c2.a, &x.c0.c2.b, &x.c1.c0.a, &x.c1.c0.b,
                         &x.c1.c1.a, &x.c1.c1.b, &x.c1.c2.a, &x.c1.c2.b};
  for (int i = 0; i < 12; ++i) fp_to_be(*slots[i], out + 48 * i);
}

void bls_dbg_fp12_mul(const uint8_t* a, const uint8_t* b, uint8_t* out) {
  Fp12 x, y;
  fp12_from_wire(a, x);
  fp12_from_wire(b, y);
  fp12_to_wire(fp12_mul(x, y), out);
}
void bls_dbg_fp12_inv(const uint8_t* a, uint8_t* out) {
  Fp12 x;
  fp12_from_wire(a, x);
  fp12_to_wire(fp12_inv(x), out);
}
void bls_dbg_fp12_frob(const uint8_t* a, uint8_t* out) {
  Fp12 x;
  fp12_from_wire(a, x);
  fp12_to_wire(fp12_frobenius(x), out);
}
void bls_dbg_miller(const uint8_t* p, const uint8_t* q, uint8_t* out) {
  Fp px, py;
  Fp2 qx, qy;
  g1_from_wire(p, px, py);
  g2_from_wire(q, qx, qy);
  fp12_to_wire(miller_loop(px, py, false, qx, qy, false), out);
}
void bls_dbg_final_exp(const uint8_t* a, uint8_t* out) {
  Fp12 x;
  fp12_from_wire(a, x);
  fp12_to_wire(final_exponentiation(x), out);
}
void bls_dbg_miller_steps(const uint8_t* p, const uint8_t* q, int max_steps,
                          uint8_t* out) {
  Fp px, py;
  Fp2 qx, qy;
  g1_from_wire(p, px, py);
  g2_from_wire(q, qx, qy);
  EFp12 Q = untwist(qx, qy);
  EFp12 T = Q;
  Fp12 f = FP12_ONE_C;
  bool seen_msb = false;
  int steps = 0;
  for (int i = 0; i < 8 && steps < max_steps; ++i) {
    for (int bit = 7; bit >= 0 && steps < max_steps; --bit) {
      int b = (X_ABS_BE[i] >> bit) & 1;
      if (!seen_msb) {
        if (b) seen_msb = true;
        continue;
      }
      f = fp12_mul(fp12_sqr(f), line_eval(T, T, px, py));
      T = efp12_add(T, T);
      if (b) {
        f = fp12_mul(f, line_eval(T, Q, px, py));
        T = efp12_add(T, Q);
      }
      ++steps;
    }
  }
  fp12_to_wire(f, out);
}
void bls_dbg_miller_T(const uint8_t* p, const uint8_t* q, int max_steps,
                      uint8_t* out_tx, uint8_t* out_ty) {
  Fp px, py;
  Fp2 qx, qy;
  g1_from_wire(p, px, py);
  g2_from_wire(q, qx, qy);
  EFp12 Q = untwist(qx, qy);
  EFp12 T = Q;
  Fp12 f = FP12_ONE_C;
  bool seen_msb = false;
  int steps = 0;
  for (int i = 0; i < 8 && steps < max_steps; ++i) {
    for (int bit = 7; bit >= 0 && steps < max_steps; --bit) {
      int b = (X_ABS_BE[i] >> bit) & 1;
      if (!seen_msb) {
        if (b) seen_msb = true;
        continue;
      }
      f = fp12_mul(fp12_sqr(f), line_eval(T, T, px, py));
      T = efp12_add(T, T);
      if (b) {
        f = fp12_mul(f, line_eval(T, Q, px, py));
        T = efp12_add(T, Q);
      }
      ++steps;
    }
  }
  fp12_to_wire(T.x, out_tx);
  fp12_to_wire(T.y, out_ty);
}
void bls_dbg_efp12_add(const uint8_t* ax, const uint8_t* ay, const uint8_t* bx,
                       const uint8_t* by, uint8_t* out_x, uint8_t* out_y) {
  EFp12 a, b;
  fp12_from_wire(ax, a.x);
  fp12_from_wire(ay, a.y);
  a.inf = false;
  fp12_from_wire(bx, b.x);
  fp12_from_wire(by, b.y);
  b.inf = false;
  EFp12 r = efp12_add(a, b);
  fp12_to_wire(r.x, out_x);
  fp12_to_wire(r.y, out_y);
}
void bls_dbg_fp12_sub_mul_inv(const uint8_t* a, const uint8_t* b,
                              const uint8_t* c, const uint8_t* d,
                              uint8_t* out) {
  // (a − b) · (c − d)⁻¹ — the λ of an affine addition
  Fp12 A, B, C, D;
  fp12_from_wire(a, A);
  fp12_from_wire(b, B);
  fp12_from_wire(c, C);
  fp12_from_wire(d, D);
  fp12_to_wire(fp12_mul(fp12_sub(A, B), fp12_inv(fp12_sub(C, D))), out);
}
void bls_dbg_untwist(const uint8_t* q, uint8_t* out_x, uint8_t* out_y) {
  Fp2 qx, qy;
  g2_from_wire(q, qx, qy);
  EFp12 u = untwist(qx, qy);
  fp12_to_wire(u.x, out_x);
  fp12_to_wire(u.y, out_y);
}
void bls_dbg_line_tangent(const uint8_t* q, const uint8_t* p, uint8_t* out) {
  Fp2 qx, qy;
  Fp px, py;
  g2_from_wire(q, qx, qy);
  g1_from_wire(p, px, py);
  EFp12 T = untwist(qx, qy);
  fp12_to_wire(line_eval(T, T, px, py), out);
}

// e(P1, Q1) == e(P2, Q2), single final exponentiation
int bls_pairings_equal(const uint8_t* p1, int p1_inf, const uint8_t* q1,
                       int q1_inf, const uint8_t* p2, int p2_inf,
                       const uint8_t* q2, int q2_inf) {
  Fp p1x = fp_zero_v(), p1y = fp_zero_v(), p2x = fp_zero_v(), p2y = fp_zero_v();
  Fp2 q1x = fp2_zero_v(), q1y = fp2_zero_v(), q2x = fp2_zero_v(),
      q2y = fp2_zero_v();
  if (!p1_inf) g1_from_wire(p1, p1x, p1y);
  if (!q1_inf) g2_from_wire(q1, q1x, q1y);
  if (!p2_inf) g1_from_wire(p2, p2x, p2y);
  if (!q2_inf) g2_from_wire(q2, q2x, q2y);
  Fp12 f1 = miller_loop(p1x, p1y, p1_inf, q1x, q1y, q1_inf);
  Fp12 f2 = miller_loop(p2x, fp_neg(p2y), p2_inf, q2x, q2y, q2_inf);
  Fp12 f = fp12_mul(f1, f2);
  Fp12 r = final_exponentiation(f);
  return fp12_eq(r, FP12_ONE_C) ? 1 : 0;
}

}  // extern "C"
