// Native Pasta-curve MSM: 4x64-bit Montgomery field + Pippenger buckets.
//
// Host-side heavy lifting for Pedersen/Hyrax commitments and fold-chain
// verification (the reference leans on the pasta_curves/nova Rust MSMs; the
// TPU path in reef_tpu.ec.msm covers device offload).  Complete a=0 addition
// formulas (Renes-Costello-Batina Alg.7) keep everything branch-free.
//
// ABI (ctypes): scalars and coordinates are 32-byte little-endian; points
// are affine (x, y, infinity_flag).  curve_id 0 = Pallas (base field P),
// 1 = Vesta (base field Q).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <mutex>
#include <cstring>
#include <thread>
#include <chrono>
#include <cstdio>
#include <vector>
#include <cstdlib>

#if defined(__AVX512IFMA__)
#include <immintrin.h>
#define REEF_IFMA 1
#endif

typedef unsigned __int128 u128;
typedef uint64_t u64;

namespace {

struct FieldCtx {
  u64 p[4];       // modulus, little-endian limbs
  u64 r2[4];      // 2^512 mod p
  u64 n0inv;      // -p^-1 mod 2^64
  u64 one_m[4];   // R mod p (Montgomery one)
  u64 b3_m[4];    // 15 in Montgomery form
};

// pallas base field P, vesta base field Q
const u64 P_LIMBS[4] = {0x992d30ed00000001ULL, 0x224698fc094cf91bULL,
                        0x0000000000000000ULL, 0x4000000000000000ULL};
const u64 Q_LIMBS[4] = {0x8c46eb2100000001ULL, 0x224698fc0994a8ddULL,
                        0x0000000000000000ULL, 0x4000000000000000ULL};

struct Fe {
  u64 v[4];
};

inline bool geq(const u64 a[4], const u64 b[4]) {
  for (int i = 3; i >= 0; i--) {
    if (a[i] > b[i]) return true;
    if (a[i] < b[i]) return false;
  }
  return true;
}

inline void sub_nocheck(u64 out[4], const u64 a[4], const u64 b[4]) {
  u128 borrow = 0;
  for (int i = 0; i < 4; i++) {
    u128 t = (u128)a[i] - b[i] - borrow;
    out[i] = (u64)t;
    borrow = (t >> 64) ? 1 : 0;
  }
}

struct Field {
  FieldCtx c;

  void add(Fe& o, const Fe& a, const Fe& b) const {
    u128 carry = 0;
    u64 t[4];
    for (int i = 0; i < 4; i++) {
      u128 s = (u128)a.v[i] + b.v[i] + carry;
      t[i] = (u64)s;
      carry = s >> 64;
    }
    if (carry || geq(t, c.p)) {
      sub_nocheck(o.v, t, c.p);
    } else {
      memcpy(o.v, t, 32);
    }
  }

  void sub(Fe& o, const Fe& a, const Fe& b) const {
    u64 t[4];
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
      u128 d = (u128)a.v[i] - b.v[i] - borrow;
      t[i] = (u64)d;
      borrow = (d >> 64) ? 1 : 0;
    }
    if (borrow) {
      u128 carry = 0;
      for (int i = 0; i < 4; i++) {
        u128 s = (u128)t[i] + c.p[i] + carry;
        o.v[i] = (u64)s;
        carry = s >> 64;
      }
    } else {
      memcpy(o.v, t, 32);
    }
  }

  // CIOS Montgomery multiplication
  void mul(Fe& o, const Fe& a, const Fe& b) const {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
      u128 carry = 0;
      for (int j = 0; j < 4; j++) {
        u128 s = (u128)t[j] + (u128)a.v[i] * b.v[j] + carry;
        t[j] = (u64)s;
        carry = s >> 64;
      }
      u128 s = (u128)t[4] + carry;
      t[4] = (u64)s;
      t[5] = (u64)(s >> 64);

      u64 m = t[0] * c.n0inv;
      carry = 0;
      u128 s0 = (u128)t[0] + (u128)m * c.p[0];
      carry = s0 >> 64;
      for (int j = 1; j < 4; j++) {
        u128 s2 = (u128)t[j] + (u128)m * c.p[j] + carry;
        t[j - 1] = (u64)s2;
        carry = s2 >> 64;
      }
      u128 s3 = (u128)t[4] + carry;
      t[3] = (u64)s3;
      t[4] = t[5] + (u64)(s3 >> 64);
      t[5] = 0;
    }
    if (t[4] || geq(t, c.p)) {
      sub_nocheck(o.v, t, c.p);
    } else {
      memcpy(o.v, t, 32);
    }
  }

  void to_mont(Fe& o, const Fe& a) const {
    Fe r2;
    memcpy(r2.v, c.r2, 32);
    mul(o, a, r2);
  }

  void from_mont(Fe& o, const Fe& a) const {
    Fe one = {{1, 0, 0, 0}};
    mul(o, a, one);
  }

  void neg(Fe& o, const Fe& a) const {
    bool zero = !(a.v[0] | a.v[1] | a.v[2] | a.v[3]);
    if (zero) {
      memset(o.v, 0, 32);
    } else {
      sub_nocheck(o.v, c.p, a.v);
    }
  }

  // Fermat inversion (input/output Montgomery); 0 -> 0
  void inv(Fe& o, const Fe& a) const {
    u64 e[4];
    memcpy(e, c.p, 32);
    e[0] -= 2;  // p is odd and > 2: no borrow
    Fe acc;
    memcpy(acc.v, c.one_m, 32);
    for (int bit = 254; bit >= 0; bit--) {
      mul(acc, acc, acc);
      if ((e[bit >> 6] >> (bit & 63)) & 1) mul(acc, acc, a);
    }
    o = acc;
  }

  // Montgomery-trick batch inversion, in place; all inputs nonzero
  void inv_batch(Fe* xs, int64_t n) const {
    if (n == 0) return;
    std::vector<Fe> prefix(n);
    prefix[0] = xs[0];
    for (int64_t i = 1; i < n; i++) mul(prefix[i], prefix[i - 1], xs[i]);
    Fe it;
    inv(it, prefix[n - 1]);
    for (int64_t i = n - 1; i >= 1; i--) {
      Fe xi;
      mul(xi, it, prefix[i - 1]);
      mul(it, it, xs[i]);
      xs[i] = xi;
    }
    xs[0] = it;
  }
};

struct Pt {
  Fe X, Y, Z;
};  // projective, Montgomery coords

struct Curve {
  Field f;
  Pt ident;

  void init(const u64 p_limbs[4]) {
    memcpy(f.c.p, p_limbs, 32);
    // n0inv = -p^{-1} mod 2^64 via Newton iteration
    u64 inv = 1;
    for (int i = 0; i < 6; i++) inv *= 2 - p_limbs[0] * inv;
    f.c.n0inv = (u64)(0 - inv);
    // r2 = 2^512 mod p: start with r = 2^256 - p*k... compute by doubling
    // one_m = 2^256 mod p: 2^256 - 4p (since p ~ 2^254, 4p > 2^256 > 3p)
    // compute via repeated subtraction from 2^256 representation
    // simpler: r = 1 (standard), then double 256 times mod p
    Fe r = {{1, 0, 0, 0}};
    for (int i = 0; i < 256; i++) f.add(r, r, r);
    memcpy(f.c.one_m, r.v, 32);
    // r2 = one_m doubled another 256 times
    Fe r2 = r;
    for (int i = 0; i < 256; i++) f.add(r2, r2, r2);
    memcpy(f.c.r2, r2.v, 32);
    // b3 = 15 in Montgomery
    Fe b3 = {{15, 0, 0, 0}};
    f.to_mont(b3, b3);
    memcpy(f.c.b3_m, b3.v, 32);
    memset(&ident, 0, sizeof(ident));
    memcpy(ident.Y.v, f.c.one_m, 32);
  }

  // complete addition, a=0 (RCB16 Alg.7)
  void padd(Pt& o, const Pt& P, const Pt& Q) const {
    Fe b3;
    memcpy(b3.v, f.c.b3_m, 32);
    Fe t0, t1, t2, t3, t4, x3, y3, z3, tmp;
    f.mul(t0, P.X, Q.X);
    f.mul(t1, P.Y, Q.Y);
    f.mul(t2, P.Z, Q.Z);
    f.add(t3, P.X, P.Y);
    f.add(tmp, Q.X, Q.Y);
    f.mul(t3, t3, tmp);
    f.add(t4, t0, t1);
    f.sub(t3, t3, t4);
    f.add(t4, P.Y, P.Z);
    f.add(x3, Q.Y, Q.Z);
    f.mul(t4, t4, x3);
    f.add(x3, t1, t2);
    f.sub(t4, t4, x3);
    f.add(x3, P.X, P.Z);
    f.add(y3, Q.X, Q.Z);
    f.mul(x3, x3, y3);
    f.add(y3, t0, t2);
    f.sub(y3, x3, y3);
    f.add(x3, t0, t0);
    f.add(t0, x3, t0);
    f.mul(t2, b3, t2);
    f.add(z3, t1, t2);
    f.sub(t1, t1, t2);
    f.mul(y3, b3, y3);
    f.mul(x3, t4, y3);
    f.mul(tmp, t3, t1);
    f.sub(x3, tmp, x3);
    f.mul(y3, y3, t0);
    f.mul(t1, t1, z3);
    f.add(y3, t1, y3);
    f.mul(t0, t0, t3);
    f.mul(z3, z3, t4);
    f.add(z3, z3, t0);
    o.X = x3;
    o.Y = y3;
    o.Z = z3;
  }
};

Curve* get_curve(int curve_id) {
  // C++11 magic-static: init runs exactly once, thread-safe (the verifier
  // calls into this library from concurrent threads; a non-atomic flag
  // could hand a caller a partially initialized curve context).
  static Curve* curves = [] {
    static Curve cs[2];
    cs[0].init(P_LIMBS);
    cs[1].init(Q_LIMBS);
    return cs;
  }();
  return &curves[curve_id == 0 ? 0 : 1];
}

// ---------------------------------------------------------------------------
// Batch-affine bucket accumulation.  Points within a window's buckets are
// summed with AFFINE additions whose per-pair inversion is amortized by
// Montgomery's trick (one Fermat inversion per reduction round per window):
// ~6 field muls per add vs ~12 for the complete projective formula.  Signed
// digits halve the bucket count, paying one extra y-negation per point.
// ---------------------------------------------------------------------------

struct Aff {
  Fe x, y;
  bool inf;
};

struct PairRec {
  Fe x1, y1, x2;
  int64_t slot;
};

// ---------------------------------------------------------------------------
// 5x52-limb field engine (AVX-512 IFMA).  The batch-affine bucket phase is
// mul-bound with fully independent element streams — exactly the shape
// vpmadd52 was built for: 8 Montgomery muls per instruction stream at
// ~5x the 4x64 CIOS throughput (measured 32 -> 170 M mul/s on this host).
// Values are CANONICAL (< p) at rest: the bucket logic compares
// coordinates for the doubling / P+(-P) cases, so lazy residues would
// break correctness.  Montgomery radix here is R52 = 2^260.
// ---------------------------------------------------------------------------

struct Fe52 {
  u64 v[5];
};

struct F52 {
  u64 p[5];
  u64 n0inv;       // -p^{-1} mod 2^52
  Fe52 one_m;      // R52 mod p
  Fe52 r2;         // R52^2 mod p
};

const u64 MASK52 = (1ULL << 52) - 1;

inline void repack52(Fe52& o, const u64 in[4]) {
  o.v[0] = in[0] & MASK52;
  o.v[1] = ((in[0] >> 52) | (in[1] << 12)) & MASK52;
  o.v[2] = ((in[1] >> 40) | (in[2] << 24)) & MASK52;
  o.v[3] = ((in[2] >> 28) | (in[3] << 36)) & MASK52;
  o.v[4] = in[3] >> 16;
}

inline void repack64(u64 out[4], const Fe52& a) {
  out[0] = a.v[0] | (a.v[1] << 52);
  out[1] = (a.v[1] >> 12) | (a.v[2] << 40);
  out[2] = (a.v[2] >> 24) | (a.v[3] << 28);
  out[3] = (a.v[3] >> 36) | (a.v[4] << 16);
}

inline bool geq52(const u64 a[5], const u64 b[5]) {
  for (int i = 4; i >= 0; i--) {
    if (a[i] > b[i]) return true;
    if (a[i] < b[i]) return false;
  }
  return true;
}

struct Field52 {
  F52 c;

  void add(Fe52& o, const Fe52& a, const Fe52& b) const {
    u64 t[5], carry = 0;
    for (int i = 0; i < 5; i++) {
      u64 s = a.v[i] + b.v[i] + carry;
      t[i] = s & MASK52;
      carry = s >> 52;
    }
    // carry can't happen: p < 2^255, sums < 2^256 < 2^260
    if (geq52(t, c.p)) {
      u64 borrow = 0;
      for (int i = 0; i < 5; i++) {
        u64 d = t[i] - c.p[i] - borrow;
        borrow = (d >> 63) & 1;  // t[i] < p[i]+borrow iff bit 63 set after
        o.v[i] = d & MASK52;     // 52-bit wrap
      }
    } else {
      memcpy(o.v, t, 40);
    }
  }

  void sub(Fe52& o, const Fe52& a, const Fe52& b) const {
    u64 t[5], borrow = 0;
    for (int i = 0; i < 5; i++) {
      u64 d = a.v[i] - b.v[i] - borrow;
      borrow = (d >> 63) & 1;
      t[i] = d & MASK52;
    }
    if (borrow) {
      u64 carry = 0;
      for (int i = 0; i < 5; i++) {
        u64 s = t[i] + c.p[i] + carry;
        o.v[i] = s & MASK52;
        carry = s >> 52;
      }
    } else {
      memcpy(o.v, t, 40);
    }
  }

  void neg(Fe52& o, const Fe52& a) const {
    bool zero = !(a.v[0] | a.v[1] | a.v[2] | a.v[3] | a.v[4]);
    if (zero) {
      memset(o.v, 0, 40);
    } else {
      u64 borrow = 0;
      for (int i = 0; i < 5; i++) {
        u64 d = c.p[i] - a.v[i] - borrow;
        borrow = (d >> 63) & 1;
        o.v[i] = d & MASK52;
      }
    }
  }

  // scalar Montgomery mul, radix 2^52 (Fermat inversions, conversions)
  void mul(Fe52& o, const Fe52& a, const Fe52& b) const {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 5; i++) {
      u128 carry = 0;
      for (int j = 0; j < 5; j++) {
        u128 s = (u128)t[j] + (u128)a.v[i] * b.v[j] + carry;
        t[j] = (u64)s & MASK52;
        carry = s >> 52;
      }
      u128 s = (u128)t[5] + carry;
      t[5] = (u64)s;  // < 2^60, fits

      u64 m = (t[0] * c.n0inv) & MASK52;
      carry = 0;
      u128 s0 = (u128)t[0] + (u128)m * c.p[0];
      carry = s0 >> 52;
      for (int j = 1; j < 5; j++) {
        u128 s2 = (u128)t[j] + (u128)m * c.p[j] + carry;
        t[j - 1] = (u64)s2 & MASK52;
        carry = s2 >> 52;
      }
      u128 s3 = (u128)t[5] + carry;
      t[4] = (u64)s3 & MASK52;
      t[5] = (u64)(s3 >> 52);
    }
    if (t[5] || geq52(t, c.p)) {
      u64 borrow = 0;
      for (int i = 0; i < 5; i++) {
        u64 d = t[i] - c.p[i] - borrow;
        borrow = (d >> 63) & 1;
        o.v[i] = d & MASK52;
      }
    } else {
      memcpy(o.v, t, 40);
    }
  }

  void inv(Fe52& o, const Fe52& a) const {
    // Fermat: a^(p-2); exponent from the packed 4x64 modulus
    u64 p4[4];
    repack64(p4, *(const Fe52*)&c.p);
    u64 e[4];
    memcpy(e, p4, 32);
    e[0] -= 2;
    Fe52 acc = c.one_m;
    for (int bit = 254; bit >= 0; bit--) {
      mul(acc, acc, acc);
      if ((e[bit >> 6] >> (bit & 63)) & 1) mul(acc, acc, a);
    }
    o = acc;
  }

  void init(const Field& f64) {
    repack52(*(Fe52*)&c.p, f64.c.p);
    u64 inv = 1;  // -p^{-1} mod 2^52 via Newton on 2^64 then mask
    for (int i = 0; i < 6; i++) inv *= 2 - c.p[0] * inv;
    c.n0inv = (u64)(0 - inv) & MASK52;
    // one_m = 2^260 mod p, r2 = 2^520 mod p: by repeated doubling
    Fe52 r;
    memset(r.v, 0, 40);
    r.v[0] = 1;
    for (int i = 0; i < 260; i++) add(r, r, r);
    c.one_m = r;
    for (int i = 0; i < 260; i++) add(r, r, r);
    c.r2 = r;
  }

  // Montgomery-64 affine coordinate -> Montgomery-52
  void from_mont64(Fe52& o, const Field& f64, const Fe& a64) const {
    Fe canon;
    f64.from_mont(canon, a64);
    Fe52 t;
    repack52(t, canon.v);
    mul(o, t, c.r2);
  }

  // Montgomery-52 -> Montgomery-64
  void to_mont64(Fe& o, const Field& f64, const Fe52& a) const {
    Fe52 one = {{1, 0, 0, 0, 0}};
    Fe52 canon;
    mul(canon, a, one);
    Fe c64;
    repack64(c64.v, canon);
    f64.to_mont(o, c64);
  }
};

struct Aff52 {
  Fe52 x, y;
  bool inf;
};

Field52* field52_for(const Field* f64) {
  // Thread-safe lazy map (two pasta base fields): the slot scan +
  // one-time init run under a mutex; keys are released-published so the
  // fast path after init never observes a partially built Field52.
  static Field52 inst[2];
  static std::atomic<const Field*> keys[2] = {nullptr, nullptr};
  static std::mutex mu;
  for (int i = 0; i < 2; i++)
    if (keys[i].load(std::memory_order_acquire) == f64) return &inst[i];
  std::lock_guard<std::mutex> lk(mu);
  for (int i = 0; i < 2; i++) {
    if (keys[i].load(std::memory_order_relaxed) == f64) return &inst[i];
    if (keys[i].load(std::memory_order_relaxed) == nullptr) {
      inst[i].init(*f64);
      keys[i].store(f64, std::memory_order_release);
      return &inst[i];
    }
  }
  return nullptr;  // unreachable: two pasta base fields
}

#ifdef REEF_IFMA

bool cpu_has_ifma() {
  static int cached = -1;
  if (cached < 0)
    cached = __builtin_cpu_supports("avx512ifma") ? 1 : 0;
  return cached == 1;
}

// ---- 8-wide vector kernels (limb-sliced zmm per limb) ---------------------

struct V52 {
  __m512i l[5];
};

// limb-sliced element storage: limb k of element i lives at l[k][i], so
// 8-wide loads/stores are straight unaligned vector moves (an
// array-of-struct layout would transpose 40 words per vector op and eat
// the whole IFMA win)
struct SoA52 {
  std::vector<u64> l[5];

  void clear() {
    for (int k = 0; k < 5; k++) l[k].clear();
  }
  size_t size() const { return l[0].size(); }
  void resize(size_t n) {
    for (int k = 0; k < 5; k++) l[k].resize(n);
  }
  void push(const Fe52& x) {
    for (int k = 0; k < 5; k++) l[k].push_back(x.v[k]);
  }
  Fe52 get(int64_t i) const {
    Fe52 o;
    for (int k = 0; k < 5; k++) o.v[k] = l[k][i];
    return o;
  }
  V52 load(int64_t base) const {
    V52 o;
    for (int k = 0; k < 5; k++)
      o.l[k] = _mm512_loadu_si512((const void*)&l[k][base]);
    return o;
  }
  void store(int64_t base, const V52& a) {
    for (int k = 0; k < 5; k++)
      _mm512_storeu_si512((void*)&l[k][base], a.l[k]);
  }
};

// conditional subtract p where v >= p (canonicalizing select)
inline void v52_csub_p(V52& v, const Field52& f) {
  __m512i mask = _mm512_set1_epi64(MASK52);
  __m512i d[5];
  __mmask8 borrow = 0;
  for (int k = 0; k < 5; k++) {
    __m512i pk = _mm512_set1_epi64(f.c.p[k]);
    __m512i bw = _mm512_maskz_set1_epi64(borrow, 1);
    __m512i rhs = _mm512_add_epi64(pk, bw);
    __m512i t = _mm512_sub_epi64(v.l[k], rhs);
    borrow = _mm512_cmplt_epu64_mask(v.l[k], rhs);
    d[k] = _mm512_and_si512(t, mask);
  }
  __mmask8 keep_sub = ~borrow;  // no final borrow -> v >= p -> take v-p
  for (int k = 0; k < 5; k++)
    v.l[k] = _mm512_mask_blend_epi64(keep_sub, v.l[k], d[k]);
}

inline V52 v52_add(const V52& a, const V52& b, const Field52& f) {
  __m512i mask = _mm512_set1_epi64(MASK52);
  V52 o;
  __m512i carry = _mm512_setzero_si512();
  for (int k = 0; k < 5; k++) {
    __m512i s = _mm512_add_epi64(_mm512_add_epi64(a.l[k], b.l[k]), carry);
    o.l[k] = _mm512_and_si512(s, mask);
    carry = _mm512_srli_epi64(s, 52);
  }
  v52_csub_p(o, f);
  return o;
}

inline V52 v52_sub(const V52& a, const V52& b, const Field52& f) {
  __m512i mask = _mm512_set1_epi64(MASK52);
  V52 t;
  __mmask8 borrow = 0;
  for (int k = 0; k < 5; k++) {
    __m512i bw = _mm512_maskz_set1_epi64(borrow, 1);
    __m512i rhs = _mm512_add_epi64(b.l[k], bw);
    __m512i d = _mm512_sub_epi64(a.l[k], rhs);
    borrow = _mm512_cmplt_epu64_mask(a.l[k], rhs);
    t.l[k] = _mm512_and_si512(d, mask);
  }
  // add p back where borrowed
  __m512i carry = _mm512_setzero_si512();
  V52 o;
  for (int k = 0; k < 5; k++) {
    __m512i pk = _mm512_maskz_set1_epi64(borrow, f.c.p[k]);
    __m512i s = _mm512_add_epi64(_mm512_add_epi64(t.l[k], pk), carry);
    o.l[k] = _mm512_and_si512(s, mask);
    carry = _mm512_srli_epi64(s, 52);
  }
  return o;
}

// 8 independent Montgomery muls; canonical in -> canonical out
inline V52 v52_mul(const V52& a, const V52& b, const Field52& f) {
  __m512i zero = _mm512_setzero_si512();
  __m512i mask = _mm512_set1_epi64(MASK52);
  __m512i n0 = _mm512_set1_epi64(f.c.n0inv);
  __m512i p[5];
  for (int k = 0; k < 5; k++) p[k] = _mm512_set1_epi64(f.c.p[k]);
  __m512i t[6];
  for (int k = 0; k < 6; k++) t[k] = zero;
  for (int i = 0; i < 5; i++) {
    __m512i ai = a.l[i];
    t[0] = _mm512_madd52lo_epu64(t[0], ai, b.l[0]);
    t[1] = _mm512_madd52lo_epu64(t[1], ai, b.l[1]);
    t[2] = _mm512_madd52lo_epu64(t[2], ai, b.l[2]);
    t[3] = _mm512_madd52lo_epu64(t[3], ai, b.l[3]);
    t[4] = _mm512_madd52lo_epu64(t[4], ai, b.l[4]);
    t[1] = _mm512_madd52hi_epu64(t[1], ai, b.l[0]);
    t[2] = _mm512_madd52hi_epu64(t[2], ai, b.l[1]);
    t[3] = _mm512_madd52hi_epu64(t[3], ai, b.l[2]);
    t[4] = _mm512_madd52hi_epu64(t[4], ai, b.l[3]);
    t[5] = _mm512_madd52hi_epu64(t[5], ai, b.l[4]);
    __m512i m = _mm512_and_si512(
        _mm512_madd52lo_epu64(zero, t[0], n0), mask);
    t[0] = _mm512_madd52lo_epu64(t[0], m, p[0]);
    t[1] = _mm512_madd52lo_epu64(t[1], m, p[1]);
    t[2] = _mm512_madd52lo_epu64(t[2], m, p[2]);
    t[3] = _mm512_madd52lo_epu64(t[3], m, p[3]);
    t[4] = _mm512_madd52lo_epu64(t[4], m, p[4]);
    t[1] = _mm512_madd52hi_epu64(t[1], m, p[0]);
    t[2] = _mm512_madd52hi_epu64(t[2], m, p[1]);
    t[3] = _mm512_madd52hi_epu64(t[3], m, p[2]);
    t[4] = _mm512_madd52hi_epu64(t[4], m, p[3]);
    t[5] = _mm512_madd52hi_epu64(t[5], m, p[4]);
    __m512i c0 = _mm512_srli_epi64(t[0], 52);
    t[0] = _mm512_add_epi64(t[1], c0);
    t[1] = t[2];
    t[2] = t[3];
    t[3] = t[4];
    t[4] = t[5];
    t[5] = zero;
  }
  V52 o;
  __m512i carry = zero;
  for (int k = 0; k < 5; k++) {
    __m512i v = _mm512_add_epi64(t[k], carry);
    o.l[k] = _mm512_and_si512(v, mask);
    carry = _mm512_srli_epi64(v, 52);
  }
  // Montgomery bound: canonical inputs -> result < 2p; one csub
  v52_csub_p(o, f);
  return o;
}

// Batch state for one affine reduction round: records appended scalar
// into limb-sliced arrays, processed 8 at a time (tail padded with
// benign values).  `dbl` lists records whose numerator still needs the
// 3*x^2 doubling computation (done 8-wide before inversion).
struct Batch52 {
  SoA52 num, den, x1, y1, x2, inv;
  std::vector<int64_t> slot;
  std::vector<int64_t> dbl;
  void clear() {
    num.clear();
    den.clear();
    x1.clear();
    y1.clear();
    x2.clear();
    slot.clear();
    dbl.clear();
  }
  void pad_to_8(const Field52& f) {
    while (slot.size() % 8) {
      num.push(f.c.one_m);
      den.push(f.c.one_m);
      x1.push(f.c.one_m);
      y1.push(f.c.one_m);
      x2.push(f.c.one_m);
      slot.push_back(-1);
    }
  }
};

// fill in the doubling numerators (num = 3*x1^2) 8-wide; records are
// scattered, so gather/scatter through a stack transpose — doublings are
// rare for distinct-point buckets, and 8-wide still beats 1 scalar mul52
// per record when a workload repeats points
void batch_dbl_num52(const Field52& f, Batch52& b) {
  int64_t nd = (int64_t)b.dbl.size();
  for (int64_t base = 0; base < nd; base += 8) {
    int64_t m = std::min<int64_t>(8, nd - base);
    alignas(64) u64 lane[5][8];
    for (int j = 0; j < 8; j++) {
      int64_t r = b.dbl[base + (j < m ? j : 0)];
      for (int k = 0; k < 5; k++) lane[k][j] = b.x1.l[k][r];
    }
    V52 x;
    for (int k = 0; k < 5; k++) x.l[k] = _mm512_load_si512(lane[k]);
    V52 x2s = v52_mul(x, x, f);
    V52 n3 = v52_add(v52_add(x2s, x2s, f), x2s, f);
    alignas(64) u64 out[5][8];
    for (int k = 0; k < 5; k++) _mm512_store_si512(out[k], n3.l[k]);
    for (int j = 0; j < m; j++) {
      int64_t r = b.dbl[base + j];
      for (int k = 0; k < 5; k++) b.num.l[k][r] = out[k][j];
    }
  }
}

// 8-chain batch inversion of b.den into b.inv (one scalar Fermat total)
void batch_inv52(const Field52& f, Batch52& b, SoA52& pfx) {
  int64_t n = (int64_t)b.den.size();  // multiple of 8
  b.inv.resize(n);
  if (n == 0) return;
  int64_t blocks = n / 8;
  // prefix products per chain: pfx block j = prod of den blocks 0..j
  pfx.resize(n);
  V52 run = b.den.load(0);
  pfx.store(0, run);
  for (int64_t j = 1; j < blocks; j++) {
    run = v52_mul(run, b.den.load(8 * j), f);
    pfx.store(8 * j, run);
  }
  // combine the 8 chain totals, one Fermat, redistribute
  Fe52 tot[8];
  for (int i = 0; i < 8; i++) tot[i] = pfx.get(8 * (blocks - 1) + i);
  Fe52 agg_pfx[8];
  agg_pfx[0] = tot[0];
  for (int i = 1; i < 8; i++) f.mul(agg_pfx[i], agg_pfx[i - 1], tot[i]);
  Fe52 inv_all;
  f.inv(inv_all, agg_pfx[7]);
  Fe52 chain_inv[8];
  for (int i = 7; i >= 1; i--) {
    f.mul(chain_inv[i], inv_all, agg_pfx[i - 1]);
    f.mul(inv_all, inv_all, tot[i]);
  }
  chain_inv[0] = inv_all;
  // walk back per chain: inv[8j+i] = chain_run_i * pfx[8(j-1)+i]
  alignas(64) u64 lane[5][8];
  for (int k = 0; k < 5; k++)
    for (int j = 0; j < 8; j++) lane[k][j] = chain_inv[j].v[k];
  V52 crun;
  for (int k = 0; k < 5; k++) crun.l[k] = _mm512_load_si512(lane[k]);
  for (int64_t j = blocks - 1; j >= 1; j--) {
    V52 res = v52_mul(crun, pfx.load(8 * (j - 1)), f);
    b.inv.store(8 * j, res);
    crun = v52_mul(crun, b.den.load(8 * j), f);
  }
  b.inv.store(0, crun);
}

// complete all deferred additions 8 at a time
void batch_complete52(const Field52& f, Batch52& b, Aff52* items) {
  int64_t n = (int64_t)b.slot.size();
  for (int64_t base = 0; base < n; base += 8) {
    V52 num = b.num.load(base);
    V52 inv = b.inv.load(base);
    V52 x1 = b.x1.load(base);
    V52 y1 = b.y1.load(base);
    V52 x2 = b.x2.load(base);
    V52 lam = v52_mul(num, inv, f);
    V52 x3 = v52_sub(v52_sub(v52_mul(lam, lam, f), x1, f), x2, f);
    V52 y3 = v52_sub(v52_mul(lam, v52_sub(x1, x3, f), f), y1, f);
    alignas(64) u64 lx[5][8], ly[5][8];
    for (int k = 0; k < 5; k++) {
      _mm512_store_si512(lx[k], x3.l[k]);
      _mm512_store_si512(ly[k], y3.l[k]);
    }
    for (int j = 0; j < 8; j++) {
      int64_t s = b.slot[base + j];
      if (s < 0) continue;
      for (int k = 0; k < 5; k++) {
        items[s].x.v[k] = lx[k][j];
        items[s].y.v[k] = ly[k][j];
      }
      items[s].inf = false;
    }
  }
}

// one 52-domain reduction round (mirrors affine_round)
int64_t affine_round52(const Field52& f, Aff52* items,
                       std::vector<std::pair<int64_t, int64_t>>& seg,
                       Batch52& b, SoA52& pfx) {
  b.clear();
  int64_t maxc = 0;
  for (auto& sc : seg) {
    int64_t s = sc.first, m = sc.second;
    int64_t w = 0;
    for (int64_t k = 0; k + 1 < m; k += 2) {
      Aff52 A = items[s + k];
      Aff52 B = items[s + k + 1];
      Aff52& O = items[s + w];
      if (A.inf) {
        O = B;
      } else if (B.inf) {
        O = A;
      } else if (memcmp(A.x.v, B.x.v, 40) == 0) {
        if (memcmp(A.y.v, B.y.v, 40) == 0) {
          Fe52 den;
          f.add(den, A.y, A.y);          // doubling: num = 3*x^2 deferred
          b.dbl.push_back((int64_t)b.slot.size());
          b.num.push(A.x);               // placeholder
          b.den.push(den);
          b.x1.push(A.x);
          b.y1.push(A.y);
          b.x2.push(A.x);
          b.slot.push_back(s + w);
          O.inf = true;  // placeholder until completion
        } else {
          O.inf = true;  // P + (-P)
        }
      } else {
        Fe52 num, den;
        f.sub(num, B.y, A.y);
        f.sub(den, B.x, A.x);
        b.num.push(num);
        b.den.push(den);
        b.x1.push(A.x);
        b.y1.push(A.y);
        b.x2.push(B.x);
        b.slot.push_back(s + w);
        O.inf = true;  // placeholder until completion
      }
      w++;
    }
    if (m & 1) {
      items[s + w] = items[s + m - 1];
      w++;
    }
    sc.second = w;
    if (w > maxc) maxc = w;
  }
  if (!b.slot.empty()) {
    b.pad_to_8(f);
    batch_dbl_num52(f, b);
    batch_inv52(f, b, pfx);
    batch_complete52(f, b, items);
  }
  return maxc;
}

#else  // !REEF_IFMA

bool cpu_has_ifma() { return false; }

#endif  // REEF_IFMA

// one round of pairwise in-bucket reduction over a flat, bucket-grouped
// array; seg[b] = (start, count).  Direct cases (identity operands,
// P + (-P)) resolve immediately; real additions defer completion until the
// shared batch inversion.  Returns max remaining count.
int64_t affine_round(const Field& f, Aff* items,
                     std::vector<std::pair<int64_t, int64_t>>& seg,
                     std::vector<Fe>& dens, std::vector<PairRec>& recs) {
  dens.clear();
  recs.clear();
  int64_t maxc = 0;
  for (auto& sc : seg) {
    int64_t s = sc.first, m = sc.second;
    int64_t w = 0;  // write cursor (relative)
    for (int64_t k = 0; k + 1 < m; k += 2) {
      Aff A = items[s + k];
      Aff B = items[s + k + 1];
      Aff& O = items[s + w];
      if (A.inf) {
        O = B;
      } else if (B.inf) {
        O = A;
      } else if (memcmp(A.x.v, B.x.v, 32) == 0) {
        if (memcmp(A.y.v, B.y.v, 32) == 0) {
          // doubling: lambda = 3x^2 / 2y  (y != 0: the curve order is odd,
          // so there are no 2-torsion points)
          Fe x2, num, den;
          f.mul(x2, A.x, A.x);
          f.add(num, x2, x2);
          f.add(num, num, x2);
          f.add(den, A.y, A.y);
          dens.push_back(den);
          recs.push_back({A.x, A.y, A.x, s + w});
          O.inf = false;  // completed after inversion
          // num rides in recs via y1? no -- keep num in O.x temporarily
          O.x = num;
        } else {
          O.inf = true;  // P + (-P)
        }
      } else {
        Fe num, den;
        f.sub(num, B.y, A.y);
        f.sub(den, B.x, A.x);
        dens.push_back(den);
        recs.push_back({A.x, A.y, B.x, s + w});
        O.inf = false;
        O.x = num;  // numerator parked in the output slot
      }
      w++;
    }
    if (m & 1) {
      items[s + w] = items[s + m - 1];
      w++;
    }
    sc.second = w;
    if (w > maxc) maxc = w;
  }
  if (!dens.empty()) {
    f.inv_batch(dens.data(), (int64_t)dens.size());
    for (size_t i = 0; i < recs.size(); i++) {
      const PairRec& r = recs[i];
      Aff& O = items[r.slot];
      Fe lam, x3, y3, t;
      f.mul(lam, O.x, dens[i]);  // num / den
      f.mul(x3, lam, lam);
      f.sub(x3, x3, r.x1);
      f.sub(x3, x3, r.x2);
      f.sub(t, r.x1, x3);
      f.mul(y3, lam, t);
      f.sub(y3, y3, r.y1);
      O.x = x3;
      O.y = y3;
      O.inf = false;
    }
  }
  return maxc;
}

// scalar field of a curve = base field of the OTHER pasta curve
Field* scalar_field(int curve_id) {
  return &get_curve(curve_id ^ 1)->f;
}

// MSM over loaded Montgomery-affine points; scalars n * 32 bytes LE
// (standard form, already reduced mod the group order).
static double prof_now() {
  return std::chrono::duration<double>(
      std::chrono::steady_clock::now().time_since_epoch()).count();
}

// Straus joint double-and-add with 4-bit windows: for small n the
// Pippenger machinery (per-window vectors, counting sorts, bucket
// combines across ~24 windows) costs ~15ms regardless of n; this path is
// ~130us for n=1 (the cv.mul bridge) and wins up to n ~ 128.
void msm_small(Curve& cv, int64_t n, const uint8_t* scalars,
               const Aff* pts, Pt& result_out) {
  const Field& f = cv.f;
  // top set bit across all scalars (skip leading zero windows)
  int bits = 0;
  for (int64_t i = 0; i < n; i++) {
    const uint8_t* s = scalars + i * 32;
    for (int by = 31; by >= bits / 8; by--) {
      if (s[by]) {
        int b = by * 8 + 7;
        while (b > 0 && !((s[by] >> (b & 7)) & 1)) b--;
        if (b + 1 > bits) bits = b + 1;
        break;
      }
    }
  }
  if (bits == 0) {
    result_out = cv.ident;
    return;
  }
  int windows = (bits + 3) / 4;
  // per-point table d*P for d in 1..15 (projective; points may be inf)
  std::vector<Pt> tab((size_t)n * 15);
  for (int64_t i = 0; i < n; i++) {
    Pt* t = tab.data() + (size_t)i * 15;
    if (pts[i].inf) {
      for (int d = 0; d < 15; d++) t[d] = cv.ident;
      continue;
    }
    t[0].X = pts[i].x;
    t[0].Y = pts[i].y;
    memcpy(t[0].Z.v, f.c.one_m, 32);
    for (int d = 1; d < 15; d++) cv.padd(t[d], t[d - 1], t[0]);
  }
  Pt acc = cv.ident;
  for (int w = windows - 1; w >= 0; w--) {
    if (w != windows - 1)
      for (int d = 0; d < 4; d++) cv.padd(acc, acc, acc);
    int bit0 = w * 4;
    for (int64_t i = 0; i < n; i++) {
      const uint8_t* s = scalars + i * 32;
      uint32_t dig = (s[bit0 >> 3] >> (bit0 & 7)) & 0xf;
      if (dig) cv.padd(acc, acc, tab[(size_t)i * 15 + dig - 1]);
    }
  }
  result_out = acc;
}

void msm_core(Curve& cv, int64_t n, const uint8_t* scalars,
              const Aff* pts, Pt& result_out,
              int force_threads = 0, const Aff52* pre52 = nullptr) {
  {
    int64_t small = 128;
    const char* senv = getenv("REEF_MSM_SMALL");
    if (senv) small = atoll(senv);
    if (n <= small) {
      msm_small(cv, n, scalars, pts, result_out);
      return;
    }
  }
  const bool prof = getenv("REEF_MSM_PROFILE") != nullptr;
  double t0 = prof ? prof_now() : 0, t1 = 0, t2 = 0, t3 = 0;
  const Field& f = cv.f;
  int c;
  const char* cenv = getenv("REEF_MSM_C");
  if (cenv) { c = atoi(cenv); }
  else {
    int logn = 0;
    while ((1LL << (logn + 1)) <= n) logn++;
    c = logn - 3;  // signed digits halve the bucket count vs unsigned
#ifdef REEF_IFMA
    // the 5x52 bucket phase is ~5x cheaper per add while the projective
    // running-sum combine (2*B padds/window) is not vectorized, so the
    // optimum shifts to fewer buckets: measured best is logn-4 capped at
    // 11 across 2^12..2^17 (9-12% over logn-3 at 2^15+)
    if (cpu_has_ifma()) {
      c = logn - 4;
      if (c > 11) c = 11;
    }
#endif
    if (c < 4) c = 4;
    if (c > 16) c = 16;
    // small MSMs with full-size scalars (the post-materialize IPA round
    // MSMs): logn-derived c explodes the window count (64 windows of c=4
    // at n=256) and the per-window fixed costs dominate — measured ~25%
    // faster at c=8 for n<=512
    if (n <= 512 && c < 8) c = 8;
  }
  // cap the window count by the actual scalar magnitude: doc commitments
  // feed alphabet-code scalars (< 2^6), for which the fixed 256-bit
  // recode + per-window bucket combines were ~95% wasted work
  int bits = 0;
  for (int64_t i = 0; i < n; i++) {
    const uint8_t* s = scalars + i * 32;
    for (int by = 31; by >= bits / 8; by--) {
      if (s[by]) {
        int b = by * 8 + 7;
        while (b > 0 && !((s[by] >> (b & 7)) & 1)) b--;
        if (b + 1 > bits) bits = b + 1;
        break;
      }
    }
  }
  if (bits + 1 < c) c = bits + 1 > 2 ? bits + 1 : 2;
  int windows = (bits + 1 + c - 1) / c;  // +1: signed-digit top carry
  if (windows < 1) windows = 1;
  int64_t B = 1LL << (c - 1);      // signed buckets 1..B

  // signed digit recoding with carry (digits in [-2^(c-1), 2^(c-1)]);
  // scalars are < 2^255 (reduced mod the group order by the caller) so the
  // final carry is always absorbed by the top window
  std::vector<int32_t> digits((size_t)windows * n);
  const uint32_t mask = (uint32_t)((1u << c) - 1);
  for (int64_t i = 0; i < n; i++) {
    const uint8_t* s = scalars + i * 32;
    uint64_t sw[4];
    memcpy(sw, s, 32);  // LE words; per-window extraction is a 2-word shift
    uint32_t carry = 0;
    for (int w = 0; w < windows; w++) {
      int bit0 = w * c;
      int wi = bit0 >> 6, off = bit0 & 63;
      uint64_t lo = sw[wi] >> off;
      if (off && wi < 3) lo |= sw[wi + 1] << (64 - off);
      uint32_t raw = (uint32_t)lo & mask;
      raw += carry;
      if (raw > (uint32_t)B) {
        digits[(size_t)w * n + i] = (int32_t)raw - (1 << c);
        carry = 1;
      } else {
        digits[(size_t)w * n + i] = (int32_t)raw;
        carry = 0;
      }
    }
  }

  if (prof) t1 = prof_now();
  // AVX-512 IFMA path: the bucket phase runs in the 5x52 Montgomery
  // domain with 8-wide batch-affine rounds (~5x the scalar mul rate);
  // points convert once per MSM, only bucket survivors convert back
#ifdef REEF_IFMA
  const bool use52 = cpu_has_ifma() && n >= 64;
  const Field52* f52 = use52 ? field52_for(&f) : nullptr;
  std::vector<Aff52> pts52_store;
  const Aff52* pts52 = pre52;
  if (use52 && pts52 == nullptr) {
    pts52_store.resize(n);
    for (int64_t i = 0; i < n; i++) {
      pts52_store[i].inf = pts[i].inf;
      if (!pts[i].inf) {
        f52->from_mont64(pts52_store[i].x, f, pts[i].x);
        f52->from_mont64(pts52_store[i].y, f, pts[i].y);
      }
    }
    pts52 = pts52_store.data();
  }
#else
  const bool use52 = false;
  (void)pre52;
#endif

  if (prof) t2 = prof_now();
  // window accumulations are independent: parallelize across threads and
  // combine with the serial doubling chain afterwards (the reference gets
  // the same effect from rayon inside the nova fork's MSMs)
  std::vector<Pt> accs(windows);
  auto do_window = [&](int w) {
    const int32_t* dw = digits.data() + (size_t)w * n;
    // counting sort by |digit| into one flat, bucket-grouped array
    std::vector<int64_t> cnt(B + 1, 0);
    for (int64_t i = 0; i < n; i++) {
      int32_t d = dw[i];
      if (d && !pts[i].inf) cnt[d < 0 ? -d : d]++;
    }
    std::vector<std::pair<int64_t, int64_t>> seg(B);
    int64_t total = 0;
    for (int64_t b = 1; b <= B; b++) {
      seg[b - 1] = {total, 0};
      total += cnt[b];
    }
#ifdef REEF_IFMA
    if (use52) {
      std::vector<Aff52> items(total);
      for (int64_t i = 0; i < n; i++) {
        int32_t d = dw[i];
        if (!d || pts[i].inf) continue;
        int64_t b = d < 0 ? -d : d;
        Aff52 a = pts52[i];
        if (d < 0) f52->neg(a.y, a.y);
        auto& sc = seg[b - 1];
        items[sc.first + sc.second] = a;
        sc.second++;
      }
      Batch52 batch;
      SoA52 pfx;
      while (affine_round52(*f52, items.data(), seg, batch, pfx) > 1) {
      }
      Pt running = cv.ident, acc = cv.ident;
      for (int64_t b = B; b >= 1; b--) {
        const auto& sc = seg[b - 1];
        if (sc.second == 1 && !items[sc.first].inf) {
          Pt lifted;
          f52->to_mont64(lifted.X, f, items[sc.first].x);
          f52->to_mont64(lifted.Y, f, items[sc.first].y);
          memcpy(lifted.Z.v, f.c.one_m, 32);
          cv.padd(running, running, lifted);
        }
        cv.padd(acc, acc, running);
      }
      accs[w] = acc;
      return;
    }
#endif
    std::vector<Aff> items(total);
    for (int64_t i = 0; i < n; i++) {
      int32_t d = dw[i];
      if (!d || pts[i].inf) continue;
      int64_t b = d < 0 ? -d : d;
      Aff a = pts[i];
      if (d < 0) f.neg(a.y, a.y);
      auto& sc = seg[b - 1];
      items[sc.first + sc.second] = a;
      sc.second++;
    }
    // pairwise reduction rounds, one batch inversion each
    std::vector<Fe> dens;
    std::vector<PairRec> recs;
    while (affine_round(f, items.data(), seg, dens, recs) > 1) {
    }
    // running-sum bucket combine in projective: acc = sum_b b * bucket_b
    Pt running = cv.ident, acc = cv.ident;
    for (int64_t b = B; b >= 1; b--) {
      const auto& sc = seg[b - 1];
      if (sc.second == 1 && !items[sc.first].inf) {
        Pt lifted;
        lifted.X = items[sc.first].x;
        lifted.Y = items[sc.first].y;
        memcpy(lifted.Z.v, f.c.one_m, 32);
        cv.padd(running, running, lifted);
      }
      cv.padd(acc, acc, running);
    }
    accs[w] = acc;
  };

  int n_threads;
  if (force_threads > 0) {
    n_threads = force_threads;
  } else {
    n_threads = (int)std::thread::hardware_concurrency();
    const char* tenv = getenv("REEF_MSM_THREADS");
    if (tenv) n_threads = atoi(tenv);
    if (n_threads < 1) n_threads = 1;
  }
  if (n_threads > windows) n_threads = windows;
  if (n_threads > 1 && n >= 256) {
    std::vector<std::thread> threads;
    std::atomic<int> next(0);
    for (int t = 0; t < n_threads; t++) {
      threads.emplace_back([&]() {
        int w;
        while ((w = next.fetch_add(1)) < windows) do_window(w);
      });
    }
    for (auto& th : threads) th.join();
  } else {
    for (int w = 0; w < windows; w++) do_window(w);
  }

  if (prof) t3 = prof_now();
  Pt result = cv.ident;
  for (int w = windows - 1; w >= 0; w--) {
    for (int d = 0; d < c; d++) cv.padd(result, result, result);
    cv.padd(result, result, accs[w]);
  }
  result_out = result;
  if (prof)
    fprintf(stderr,
            "[msm n=%lld c=%d win=%d] recode %.1fms conv52 %.1fms "
            "buckets %.1fms final %.1fms\n",
            (long long)n, c, windows, (t1 - t0) * 1e3, (t2 - t1) * 1e3,
            (t3 - t2) * 1e3, (prof_now() - t3) * 1e3);
}

void load_affine(const Field& f, const uint8_t* pp, Aff& a) {
  if (pp[64]) {
    a.inf = true;
    return;
  }
  Fe x, y;
  memcpy(x.v, pp, 32);
  memcpy(y.v, pp + 32, 32);
  f.to_mont(a.x, x);
  f.to_mont(a.y, y);
  a.inf = false;
}

// Batch projective->Montgomery-affine conversion (one Fermat inversion).
void proj_to_affine_batch(const Field& f, const std::vector<Pt>& in,
                          std::vector<Aff>& out) {
  int64_t n = (int64_t)in.size();
  out.resize(n);
  std::vector<Fe> zs;
  std::vector<int64_t> live;
  zs.reserve(n);
  live.reserve(n);
  for (int64_t i = 0; i < n; i++) {
    Fe zc;
    f.from_mont(zc, in[i].Z);
    if (!(zc.v[0] | zc.v[1] | zc.v[2] | zc.v[3])) {
      out[i].inf = true;
    } else {
      out[i].inf = false;
      zs.push_back(in[i].Z);
      live.push_back(i);
    }
  }
  f.inv_batch(zs.data(), (int64_t)zs.size());
  for (size_t k = 0; k < live.size(); k++) {
    int64_t i = live[k];
    f.mul(out[i].x, in[i].X, zs[k]);
    f.mul(out[i].y, in[i].Y, zs[k]);
  }
}

void store_proj(const Field& f, const Pt& result, uint8_t* out) {
  Fe X, Y, Z;
  f.from_mont(X, result.X);
  f.from_mont(Y, result.Y);
  f.from_mont(Z, result.Z);
  memcpy(out, X.v, 32);
  memcpy(out + 32, Y.v, 32);
  memcpy(out + 64, Z.v, 32);
}

// ---------------------------------------------------------------------------
// Deterministic generator derivation (try-and-increment hash-to-curve).
// Mirrors reef_tpu.ec.pasta.Curve.hash_to_curve exactly: for counter
// ctr = 0,1,...  x = SHA256(prefix || idx_be8 || ctr_be4) mod p,
// rhs = x^3 + 5; if rhs is a QR take y = min(sqrt, p - sqrt).  The python
// loop costs ~1.2 ms/point (Tonelli-Shanks in bigint pow); deriving a 2^15
// basis fresh was ~40 s/process on a cache miss.  Output layout is the
// packed 65 B/point little-endian used everywhere else in this file.
// ---------------------------------------------------------------------------

// Minimal SHA-256 (FIPS 180-4), single-shot.
struct Sha256 {
  static inline u64 rotr(uint32_t x, int n) {
    return (x >> n) | (x << (32 - n));
  }
  static void digest(const uint8_t* msg, size_t len, uint8_t out[32]) {
    static const uint32_t K[64] = {
        0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b,
        0x59f111f1, 0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01,
        0x243185be, 0x550c7dc3, 0x72be5d74, 0x80deb1fe, 0x9bdc06a7,
        0xc19bf174, 0xe49b69c1, 0xefbe4786, 0x0fc19dc6, 0x240ca1cc,
        0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da, 0x983e5152,
        0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
        0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc,
        0x53380d13, 0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85,
        0xa2bfe8a1, 0xa81a664b, 0xc24b8b70, 0xc76c51a3, 0xd192e819,
        0xd6990624, 0xf40e3585, 0x106aa070, 0x19a4c116, 0x1e376c08,
        0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a, 0x5b9cca4f,
        0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
        0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2};
    uint32_t h[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
                     0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19};
    size_t total = len;
    size_t padded = ((len + 8) / 64 + 1) * 64;
    std::vector<uint8_t> buf(padded, 0);
    memcpy(buf.data(), msg, len);
    buf[len] = 0x80;
    u64 bits = (u64)total * 8;
    for (int i = 0; i < 8; i++)
      buf[padded - 1 - i] = (uint8_t)(bits >> (8 * i));
    for (size_t off = 0; off < padded; off += 64) {
      uint32_t w[64];
      for (int i = 0; i < 16; i++)
        w[i] = ((uint32_t)buf[off + 4 * i] << 24) |
               ((uint32_t)buf[off + 4 * i + 1] << 16) |
               ((uint32_t)buf[off + 4 * i + 2] << 8) |
               (uint32_t)buf[off + 4 * i + 3];
      for (int i = 16; i < 64; i++) {
        uint32_t s0 = rotr(w[i - 15], 7) ^ rotr(w[i - 15], 18) ^
                      (w[i - 15] >> 3);
        uint32_t s1 = rotr(w[i - 2], 17) ^ rotr(w[i - 2], 19) ^
                      (w[i - 2] >> 10);
        w[i] = w[i - 16] + s0 + w[i - 7] + s1;
      }
      uint32_t a = h[0], b = h[1], cc = h[2], d = h[3], e = h[4], f = h[5],
               g = h[6], hh = h[7];
      for (int i = 0; i < 64; i++) {
        uint32_t S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25);
        uint32_t ch = (e & f) ^ (~e & g);
        uint32_t t1 = hh + S1 + ch + K[i] + w[i];
        uint32_t S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22);
        uint32_t maj = (a & b) ^ (a & cc) ^ (b & cc);
        uint32_t t2 = S0 + maj;
        hh = g; g = f; f = e; e = d + t1;
        d = cc; cc = b; b = a; a = t1 + t2;
      }
      h[0] += a; h[1] += b; h[2] += cc; h[3] += d;
      h[4] += e; h[5] += f; h[6] += g; h[7] += hh;
    }
    for (int i = 0; i < 8; i++) {
      out[4 * i] = (uint8_t)(h[i] >> 24);
      out[4 * i + 1] = (uint8_t)(h[i] >> 16);
      out[4 * i + 2] = (uint8_t)(h[i] >> 8);
      out[4 * i + 3] = (uint8_t)h[i];
    }
  }
};

// Generic Montgomery-domain exponentiation by a 4-limb little-endian
// exponent (256 square-and-multiply steps; ~25 us — derivation only).
void fe_pow(const Field& f, Fe& o, const Fe& a, const u64 e[4]) {
  Fe acc;
  memcpy(acc.v, f.c.one_m, 32);
  for (int bit = 255; bit >= 0; bit--) {
    f.mul(acc, acc, acc);
    if ((e[bit >> 6] >> (bit & 63)) & 1) f.mul(acc, acc, a);
  }
  o = acc;
}

// Tonelli-Shanks context for one pasta base field (2-adicity 32 for both).
struct SqrtCtx {
  u64 q[4];      // (p-1) >> 32  (odd part)
  u64 half[4];   // (p-1) / 2    (Legendre exponent)
  u64 qp1h[4];   // (q+1) / 2
  Fe c_init;     // z^q in Montgomery form, z = least non-residue
  bool ready = false;
};

void shr_limbs(u64 o[4], const u64 a[4], int k) {
  // 0 < k < 64
  for (int i = 0; i < 4; i++) {
    o[i] = a[i] >> k;
    if (i < 3) o[i] |= a[i + 1] << (64 - k);
  }
}

void init_sqrt_ctx(const Field& f, SqrtCtx& c) {
  u64 pm1[4];
  memcpy(pm1, f.c.p, 32);
  pm1[0] -= 1;  // p odd: no borrow
  // q = (p-1) >> 32 (2-adicity is exactly 32 for both pasta primes)
  shr_limbs(c.q, pm1, 32);
  shr_limbs(c.half, pm1, 1);
  u64 qp1[4];
  u128 carry = 1;
  for (int i = 0; i < 4; i++) {
    u128 s = (u128)c.q[i] + carry;
    qp1[i] = (u64)s;
    carry = s >> 64;
  }
  shr_limbs(c.qp1h, qp1, 1);
  // least quadratic non-residue z: Legendre(z) == -1
  Fe neg_one, one_m;
  memcpy(one_m.v, f.c.one_m, 32);
  f.neg(neg_one, one_m);
  for (u64 z = 2;; z++) {
    Fe zm = {{z, 0, 0, 0}};
    f.to_mont(zm, zm);
    Fe leg;
    fe_pow(f, leg, zm, c.half);
    if (memcmp(leg.v, neg_one.v, 32) == 0) {
      fe_pow(f, c.c_init, zm, c.q);
      break;
    }
  }
  c.ready = true;
}

SqrtCtx* get_sqrt_ctx(const Field& f, int curve_id) {
  // std::call_once: decompress/verify paths reach here from concurrent
  // threads; the old non-atomic `ready` flag could publish a
  // partially-initialized context.
  static SqrtCtx ctx[2];
  static std::once_flag flags[2];
  SqrtCtx& c = ctx[curve_id & 1];
  std::call_once(flags[curve_id & 1], [&] { init_sqrt_ctx(f, c); });
  return &c;
}

// sqrt of a (Montgomery, canonical); returns false if a is a non-residue.
bool fe_sqrt(const Field& f, const SqrtCtx& sc, Fe& out, const Fe& a) {
  bool zero = !(a.v[0] | a.v[1] | a.v[2] | a.v[3]);
  if (zero) {
    memset(out.v, 0, 32);
    return true;
  }
  Fe one_m;
  memcpy(one_m.v, f.c.one_m, 32);
  Fe leg;
  fe_pow(f, leg, a, sc.half);
  if (memcmp(leg.v, one_m.v, 32) != 0) return false;
  Fe t, r, c;
  fe_pow(f, t, a, sc.q);
  fe_pow(f, r, a, sc.qp1h);
  c = sc.c_init;
  int m = 32;
  while (memcmp(t.v, one_m.v, 32) != 0) {
    Fe t2 = t;
    int i = 0;
    while (memcmp(t2.v, one_m.v, 32) != 0) {
      f.mul(t2, t2, t2);
      i++;
    }
    Fe b = c;
    for (int j = 0; j < m - i - 1; j++) f.mul(b, b, b);
    m = i;
    f.mul(c, b, b);
    f.mul(t, t, c);
    f.mul(r, r, b);
  }
  out = r;
  return true;
}

// Derive one generator: try-and-increment over SHA256(prefix||idx||ctr).
void derive_one(const Field& f, const SqrtCtx& sc, const uint8_t* prefix,
                int64_t prefix_len, u64 idx, uint8_t* out65) {
  std::vector<uint8_t> msg(prefix_len + 12);
  memcpy(msg.data(), prefix, prefix_len);
  for (int i = 0; i < 8; i++)
    msg[prefix_len + i] = (uint8_t)(idx >> (8 * (7 - i)));
  for (uint32_t ctr = 0;; ctr++) {
    for (int i = 0; i < 4; i++)
      msg[prefix_len + 8 + i] = (uint8_t)(ctr >> (8 * (3 - i)));
    uint8_t h[32];
    Sha256::digest(msg.data(), msg.size(), h);
    // big-endian digest -> limbs, reduce mod p (digest < 2^256 < 4p)
    Fe x;
    for (int i = 0; i < 4; i++) {
      u64 w = 0;
      for (int j = 0; j < 8; j++) w = (w << 8) | h[(3 - i) * 8 + j];
      x.v[i] = w;
    }
    while (geq(x.v, f.c.p)) sub_nocheck(x.v, x.v, f.c.p);
    Fe xm, rhs, five = {{5, 0, 0, 0}};
    f.to_mont(xm, x);
    f.to_mont(five, five);
    f.mul(rhs, xm, xm);
    f.mul(rhs, rhs, xm);
    f.add(rhs, rhs, five);
    Fe ym;
    if (!fe_sqrt(f, sc, ym, rhs)) continue;
    Fe y, yneg;
    f.from_mont(y, ym);
    f.neg(yneg, y);
    if (geq(y.v, yneg.v) && memcmp(y.v, yneg.v, 32) != 0) y = yneg;
    memcpy(out65, x.v, 32);
    memcpy(out65 + 32, y.v, 32);
    out65[64] = 0;
    return;
  }
}

}  // namespace

extern "C" {

// Batch modular square roots in the curve's BASE field: in/out are n
// 32-byte LE canonical values; out[i] = a canonical sqrt of in[i], with
// ok[i] = 1, or ok[i] = 0 for non-residues (the verifier's point
// decompression hot spot: a python Tonelli per L/R point was ~0.1s of
// every proof verification).
void pasta_sqrt_batch(int curve_id, int64_t n, const uint8_t* in,
                      uint8_t* out, uint8_t* ok) {
  Curve& cv = *get_curve(curve_id);
  const Field& f = cv.f;
  const SqrtCtx& sc = *get_sqrt_ctx(f, curve_id);
  for (int64_t i = 0; i < n; i++) {
    Fe a, am, ym, y;
    memcpy(a.v, in + 32 * i, 32);
    if ((a.v[0] | a.v[1] | a.v[2] | a.v[3]) == 0) {  // sqrt(0) = 0
      memset(out + 32 * i, 0, 32);
      ok[i] = 1;
      continue;
    }
    f.to_mont(am, a);
    if (!fe_sqrt(f, sc, ym, am)) {
      ok[i] = 0;
      memset(out + 32 * i, 0, 32);
      continue;
    }
    f.from_mont(y, ym);
    memcpy(out + 32 * i, y.v, 32);
    ok[i] = 1;
  }
}

// Derive `count` generators for indices [start, start+count) under the
// python derivation prefix (cv.name || "/" || label || "/"); out is
// count * 65 bytes packed LE.  Threaded: points are independent.
void pasta_derive_gens(int curve_id, const uint8_t* prefix,
                       int64_t prefix_len, int64_t start, int64_t count,
                       uint8_t* out) {
  Curve& cv = *get_curve(curve_id);
  const Field& f = cv.f;
  const SqrtCtx& sc = *get_sqrt_ctx(f, curve_id);
  int n_threads = (int)std::thread::hardware_concurrency();
  const char* tenv = getenv("REEF_MSM_THREADS");
  if (tenv) n_threads = atoi(tenv);
  if (n_threads < 1) n_threads = 1;
  if (n_threads > count) n_threads = (int)count;
  auto work = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; i++)
      derive_one(f, sc, prefix, prefix_len, (u64)(start + i),
                 out + 65 * i);
  };
  if (n_threads <= 1 || count < 64) {
    work(0, count);
  } else {
    std::vector<std::thread> threads;
    int64_t chunk = (count + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; t++) {
      int64_t lo = t * chunk, hi = std::min<int64_t>(count, lo + chunk);
      if (lo < hi) threads.emplace_back(work, lo, hi);
    }
    for (auto& th : threads) th.join();
  }
}

// scalars: n * 32 bytes LE; points: n * 65 bytes (32 x, 32 y, 1 inf flag);
// out is 96 bytes projective (X,Y,Z canonical non-Montgomery); python
// converts to affine.
void pasta_msm_idx(int curve_id, int64_t n, const uint8_t* scalars,
                   const uint8_t* points, const int64_t* idx,
                   uint8_t* out) {
  Curve& cv = *get_curve(curve_id);
  const Field& f = cv.f;
  // load points as Montgomery AFFINE (bucket accumulation is affine; only
  // the per-window bucket combine lifts to projective)
  std::vector<Aff> pts(n);
  for (int64_t i = 0; i < n; i++)
    load_affine(f, points + (idx ? idx[i] : i) * 65, pts[i]);
  Pt result;
  msm_core(cv, n, scalars, pts.data(), result);
  store_proj(f, result, out);
}

void pasta_msm(int curve_id, int64_t n, const uint8_t* scalars,
               const uint8_t* points, uint8_t* out) {
  pasta_msm_idx(curve_id, n, scalars, points, nullptr, out);
}

// --- cached basis handles ---------------------------------------------------
// A fixed generator set is loaded (LE bytes -> Montgomery affine) and
// 5x52-converted ONCE; any number of (optionally indexed or prefixed) MSMs
// then run against it.  The per-call load+convert was ~45ms of a 170ms MSM
// at n=2^16 on the per-fold commit path.
struct BasisCtx {
  int curve_id;
  int64_t n;
  std::vector<Aff> pts;
  std::vector<Aff52> pts52;  // empty on non-IFMA hosts
};

void* msm_basis_init(int curve_id, int64_t n, const uint8_t* packed) {
  BasisCtx* b = new BasisCtx();
  b->curve_id = curve_id;
  b->n = n;
  const Field& f = get_curve(curve_id)->f;
  b->pts.resize(n);
  for (int64_t i = 0; i < n; i++) load_affine(f, packed + 65 * i, b->pts[i]);
  if (cpu_has_ifma()) {
    const Field52* f52 = field52_for(&f);
    b->pts52.resize(n);
    for (int64_t i = 0; i < n; i++) {
      b->pts52[i].inf = b->pts[i].inf;
      if (!b->pts[i].inf) {
        f52->from_mont64(b->pts52[i].x, f, b->pts[i].x);
        f52->from_mont64(b->pts52[i].y, f, b->pts[i].y);
      }
    }
  }
  return b;
}

void msm_basis_free(void* h) { delete (BasisCtx*)h; }

// n scalars against the first n basis points, or against idx[i] gathers.
void pasta_msm_basis(void* h, int64_t n, const uint8_t* scalars,
                     const int64_t* idx, uint8_t* out) {
  BasisCtx* b = (BasisCtx*)h;
  Curve& cv = *get_curve(b->curve_id);
  const bool has52 = !b->pts52.empty();
  Pt result;
  if (idx == nullptr) {
    msm_core(cv, n, scalars, b->pts.data(), result, 0,
             has52 ? b->pts52.data() : nullptr);
  } else {
    std::vector<Aff> pts(n);
    std::vector<Aff52> p52(has52 ? n : 0);
    for (int64_t i = 0; i < n; i++) {
      int64_t j = idx[i];
      pts[i] = b->pts[j];
      if (has52) p52[i] = b->pts52[j];
    }
    msm_core(cv, n, scalars, pts.data(), result, 0,
             has52 ? p52.data() : nullptr);
  }
  store_proj(cv.f, result, out);
}

// Bulk point validation (the generator-cache integrity check): returns the
// first index whose (x, y) is out of range or off-curve (y^2 != x^3 + 5),
// or -1 when all pass.  Identity-flagged entries are accepted.
int64_t pasta_on_curve(int curve_id, int64_t n, const uint8_t* points) {
  Curve& cv = *get_curve(curve_id);
  const Field& f = cv.f;
  Fe five = {{5, 0, 0, 0}};
  f.to_mont(five, five);
  for (int64_t i = 0; i < n; i++) {
    const uint8_t* pp = points + 65 * i;
    if (pp[64]) continue;
    Fe x, y;
    memcpy(x.v, pp, 32);
    memcpy(y.v, pp + 32, 32);
    if (geq(x.v, f.c.p) || geq(y.v, f.c.p)) return i;
    f.to_mont(x, x);
    f.to_mont(y, y);
    Fe y2, x2, x3, rhs;
    f.mul(y2, y, y);
    f.mul(x2, x, x);
    f.mul(x3, x2, x);
    f.add(rhs, x3, five);
    f.sub(rhs, y2, rhs);
    if (rhs.v[0] | rhs.v[1] | rhs.v[2] | rhs.v[3]) return i;
  }
  return -1;
}

// Row-batched Pedersen commits (the Hyrax matrix commit): out[r] is the
// AFFINE point  sum_j scalars[r*n_cols+j] * basis[j]  +  blinds[r] * H.
// One call loads the shared basis once and threads across rows (the
// per-row python MSM calls each re-packed scalars, re-converted the basis
// to Montgomery and spawned threads).  The blind term uses a fixed-base
// window table of H so full-width blinds do not widen the row MSM's
// magnitude-capped windows.
void pasta_msm_rows(int curve_id, int64_t n_rows, int64_t n_cols,
                    const uint8_t* scalars, const uint8_t* basis_packed,
                    const uint8_t* blinds, const uint8_t* h_packed,
                    uint8_t* out) {
  Curve& cv = *get_curve(curve_id);
  const Field& f = cv.f;
  std::vector<Aff> basis(n_cols);
  for (int64_t j = 0; j < n_cols; j++)
    load_affine(f, basis_packed + 65 * j, basis[j]);
  Aff h_aff;
  load_affine(f, h_packed, h_aff);

  // fixed-base table for H: T[w][d] = d * 2^(8w) * H, d in 0..255
  const int HB = 8, HW = 32;
  std::vector<Pt> htab((size_t)HW * 256);
  {
    Pt base;
    if (h_aff.inf) {
      base = cv.ident;
    } else {
      base.X = h_aff.x;
      base.Y = h_aff.y;
      memcpy(base.Z.v, f.c.one_m, 32);
    }
    for (int w = 0; w < HW; w++) {
      htab[(size_t)w * 256] = cv.ident;
      for (int d = 1; d < 256; d++)
        cv.padd(htab[(size_t)w * 256 + d], htab[(size_t)w * 256 + d - 1],
                base);
      for (int k = 0; k < HB; k++) cv.padd(base, base, base);
    }
  }

  std::vector<Pt> results(n_rows);
  auto worker = [&](int64_t lo_r, int64_t hi_r) {
    for (int64_t r = lo_r; r < hi_r; r++) {
      Pt acc;
      msm_core(cv, n_cols, scalars + r * n_cols * 32, basis.data(), acc,
               /*force_threads=*/1);
      const uint8_t* bl = blinds + r * 32;
      for (int w = 0; w < HW; w++) {
        uint8_t d = bl[w];
        if (d) cv.padd(acc, acc, htab[(size_t)w * 256 + d]);
      }
      results[r] = acc;
    }
  };
  int n_threads = (int)std::thread::hardware_concurrency();
  const char* tenv = getenv("REEF_MSM_THREADS");
  if (tenv) n_threads = atoi(tenv);
  if (n_threads < 1) n_threads = 1;
  if ((int64_t)n_threads > n_rows) n_threads = (int)n_rows;
  if (n_threads > 1) {
    std::vector<std::thread> threads;
    std::atomic<int64_t> next(0);
    int64_t chunk = 8;
    for (int t = 0; t < n_threads; t++) {
      threads.emplace_back([&]() {
        int64_t lo_r;
        while ((lo_r = next.fetch_add(chunk)) < n_rows)
          worker(lo_r, std::min(n_rows, lo_r + chunk));
      });
    }
    for (auto& th : threads) th.join();
  } else {
    worker(0, n_rows);
  }

  std::vector<Aff> aff;
  proj_to_affine_batch(f, results, aff);
  for (int64_t r = 0; r < n_rows; r++) {
    uint8_t* op = out + r * 65;
    if (aff[r].inf) {
      memset(op, 0, 65);
      op[64] = 1;
      continue;
    }
    Fe xa, ya;
    f.from_mont(xa, aff[r].x);
    f.from_mont(ya, aff[r].y);
    memcpy(op, xa.v, 32);
    memcpy(op + 32, ya.v, 32);
    op[64] = 0;
  }
}

// Batched basis fold for the IPA: out[i] = xi*lo[i] + x*hi[i], affine out.
// Scalars xi, x: 32B LE; points lo/hi/out: 65B affine (x, y, inf).
// Batch inversion (Montgomery's trick) for the affine conversion.
void pasta_fold_points(int curve_id, int64_t n, const uint8_t* xi_b,
                       const uint8_t* x_b, const uint8_t* lo,
                       const uint8_t* hi, uint8_t* out) {
  Curve& cv = *get_curve(curve_id);
  const Field& f = cv.f;

  auto load_pt = [&](const uint8_t* pp, Pt& P) {
    if (pp[64]) {
      P = cv.ident;
      return;
    }
    Fe x, y;
    memcpy(x.v, pp, 32);
    memcpy(y.v, pp + 32, 32);
    f.to_mont(P.X, x);
    f.to_mont(P.Y, y);
    memcpy(P.Z.v, f.c.one_m, 32);
  };

  // scalar mul via double-and-add over 255 bits (projective, complete adds)
  auto smul = [&](const uint8_t* s, const Pt& P, Pt& O) {
    O = cv.ident;
    Pt base = P;
    for (int bit = 0; bit < 255; bit++) {
      if ((s[bit >> 3] >> (bit & 7)) & 1) cv.padd(O, O, base);
      cv.padd(base, base, base);
    }
  };

  std::vector<Pt> res(n);
  for (int64_t i = 0; i < n; i++) {
    Pt L, H, A, B;
    load_pt(lo + i * 65, L);
    load_pt(hi + i * 65, H);
    smul(xi_b, L, A);
    smul(x_b, H, B);
    cv.padd(res[i], A, B);
  }

  // batch affine conversion: invert all Z together
  std::vector<Fe> zs(n), prefix(n + 1);
  memcpy(prefix[0].v, f.c.one_m, 32);
  std::vector<bool> inf(n);
  for (int64_t i = 0; i < n; i++) {
    bool z_is_zero = true;
    Fe z_can;
    f.from_mont(z_can, res[i].Z);
    for (int k = 0; k < 4; k++)
      if (z_can.v[k]) z_is_zero = false;
    inf[i] = z_is_zero;
    zs[i] = res[i].Z;
    if (z_is_zero) memcpy(zs[i].v, f.c.one_m, 32);
    f.mul(prefix[i + 1], prefix[i], zs[i]);
  }
  // inverse of the total product via Fermat
  Fe inv_total, base = prefix[n];
  memcpy(inv_total.v, f.c.one_m, 32);
  // exponent p-2, square-and-multiply MSB->LSB
  u64 e[4];
  memcpy(e, f.c.p, 32);
  // subtract 2
  if (e[0] >= 2) {
    e[0] -= 2;
  } else {
    e[0] = (u64)(e[0] - 2);
    int k = 1;
    while (e[k] == 0) e[k++] -= 1;
    e[k] -= 1;
  }
  for (int bit = 254; bit >= 0; bit--) {
    f.mul(inv_total, inv_total, inv_total);
    if ((e[bit >> 6] >> (bit & 63)) & 1) f.mul(inv_total, inv_total, base);
  }
  // walk back
  for (int64_t i = n - 1; i >= 0; i--) {
    Fe zi;
    f.mul(zi, inv_total, prefix[i]);         // 1/z_i
    f.mul(inv_total, inv_total, zs[i]);      // strip z_i
    uint8_t* op = out + i * 65;
    if (inf[i]) {
      memset(op, 0, 65);
      op[64] = 1;
      continue;
    }
    Fe xa, ya;
    f.mul(xa, res[i].X, zi);
    f.mul(ya, res[i].Y, zi);
    f.from_mont(xa, xa);
    f.from_mont(ya, ya);
    memcpy(op, xa.v, 32);
    memcpy(op + 32, ya.v, 32);
    op[64] = 0;
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Native IPA prover rounds (backend/ipa.py's hot loop).  The context keeps
// w, R, coeff in the curve's SCALAR field (Montgomery form) plus the basis
// as Montgomery-affine points; each round computes the two cross dots and
// the two expanded-scalar MSMs over the original basis in one pass, and the
// fold updates run natively.  The Fiat-Shamir transcript (and the blinded
// G_s/H terms) stay on the Python side.
// ---------------------------------------------------------------------------

namespace {

struct IpaCtx {
  int curve_id;
  int64_t n;        // current folded length
  int64_t n_orig;
  std::vector<Fe> w, R, coeff;  // scalar field, Montgomery
  std::vector<Aff> basis;       // base field, Montgomery affine
  std::vector<Aff52> basis52;   // 5x52 mirror (IFMA hosts only)
};

// keep the 5x52 mirror in sync with ctx->basis (converting the basis once
// per (re)build instead of inside every msm_core call saved ~2x16ms per
// cross at n=2^16)
void ipa_refresh52(IpaCtx* ctx) {
  if (!cpu_has_ifma()) {
    ctx->basis52.clear();
    return;
  }
  const Field& bf = get_curve(ctx->curve_id)->f;
  const Field52* f52 = field52_for(&bf);
  int64_t n = (int64_t)ctx->basis.size();
  ctx->basis52.resize(n);
  for (int64_t i = 0; i < n; i++) {
    ctx->basis52[i].inf = ctx->basis[i].inf;
    if (!ctx->basis[i].inf) {
      f52->from_mont64(ctx->basis52[i].x, bf, ctx->basis[i].x);
      f52->from_mont64(ctx->basis52[i].y, bf, ctx->basis[i].y);
    }
  }
}

void load_scalar_mont(const Field& sf, const uint8_t* b, Fe& o) {
  Fe t;
  memcpy(t.v, b, 32);
  sf.to_mont(o, t);
}

// Collapse the expanded-coefficient view into an actual folded basis of the
// current size n.  After any sequence of halving folds, coeff[j] depends
// only on t = j / n (each fold factor compares a bit of j ABOVE log2(n)),
// so G'_i = sum_t c_t * basis[t*n + i] with the SAME g = n_orig/n scalars
// for every output i.  Lockstep NAF double-and-add across outputs turns the
// per-round O(n_orig) indexed MSMs into O(n) rounds afterwards: total IPA
// work drops from n*log(n) to ~3n Pippenger-equivalent points.
void ipa_materialize(IpaCtx* ctx) {
  const bool prof = getenv("REEF_MSM_PROFILE") != nullptr;
  double tm0 = prof ? prof_now() : 0;
  Curve& cv = *get_curve(ctx->curve_id);
  const Field& bf = cv.f;
  const Field& sf = *scalar_field(ctx->curve_id);
  int64_t n = ctx->n, no = ctx->n_orig;
  int64_t g = no / n;
  if (g <= 1) return;

  // NAF digits of the g shared coefficients (canonical form)
  std::vector<int8_t> naf((size_t)g * 256, 0);
  int hi = 0;
  for (int64_t t = 0; t < g; t++) {
    Fe c;
    sf.from_mont(c, ctx->coeff[t * n]);
    u64 k[5] = {c.v[0], c.v[1], c.v[2], c.v[3], 0};
    int8_t* d = naf.data() + (size_t)t * 256;
    for (int b = 0; b < 256; b++) {
      if (!(k[0] | k[1] | k[2] | k[3] | k[4])) break;
      if (k[0] & 1) {
        int8_t dig = 2 - (int8_t)(k[0] & 3);  // 1 if k%4==1, -1 if k%4==3
        d[b] = dig;
        if (dig == 1) {
          // k -= 1
          int i = 0;
          while (k[i] == 0) k[i++] = ~0ULL;
          k[i] -= 1;
        } else {
          // k += 1
          int i = 0;
          while (k[i] == ~0ULL) k[i++] = 0;
          k[i] += 1;
        }
        if (b > hi) hi = b;
      }
      // k >>= 1
      for (int i = 0; i < 4; i++) k[i] = (k[i] >> 1) | (k[i + 1] << 63);
      k[4] >>= 1;
    }
  }

  // lockstep batch-AFFINE double-and-add: all outputs in a chunk share the
  // same digit schedule, so each double/add step is one amortized batch
  // inversion (~6 muls/op vs ~12 for projective complete adds)
  std::vector<Aff> nb(n);
  auto worker = [&](int64_t lo_i, int64_t hi_i) {
    int64_t m = hi_i - lo_i;
    Aff* acc = nb.data() + lo_i;
    for (int64_t i = 0; i < m; i++) acc[i].inf = true;
    std::vector<Fe> dens;
    std::vector<PairRec> recs;
    dens.reserve(m);
    recs.reserve(m);

    auto flush = [&]() {
      if (dens.empty()) return;
      bf.inv_batch(dens.data(), (int64_t)dens.size());
      for (size_t k = 0; k < recs.size(); k++) {
        const PairRec& r = recs[k];
        Aff& O = acc[r.slot];
        Fe lam, x3, y3, t;
        bf.mul(lam, O.x, dens[k]);   // parked numerator / den
        bf.mul(x3, lam, lam);
        bf.sub(x3, x3, r.x1);
        bf.sub(x3, x3, r.x2);
        bf.sub(t, r.x1, x3);
        bf.mul(y3, lam, t);
        bf.sub(y3, y3, r.y1);
        O.x = x3;
        O.y = y3;
        O.inf = false;
      }
      dens.clear();
      recs.clear();
    };

    for (int b = hi; b >= 0; b--) {
      // batch double (odd group order: y != 0 always)
      for (int64_t i = 0; i < m; i++) {
        if (acc[i].inf) continue;
        Fe x2s, num, den;
        bf.mul(x2s, acc[i].x, acc[i].x);
        bf.add(num, x2s, x2s);
        bf.add(num, num, x2s);
        bf.add(den, acc[i].y, acc[i].y);
        dens.push_back(den);
        recs.push_back({acc[i].x, acc[i].y, acc[i].x, i});
        acc[i].x = num;              // numerator parked in the slot
      }
      flush();
      for (int64_t t = 0; t < g; t++) {
        int8_t dg = naf[(size_t)t * 256 + b];
        if (!dg) continue;
        const Aff* row = ctx->basis.data() + t * n + lo_i;
        for (int64_t i = 0; i < m; i++) {
          const Aff& P = row[i];
          if (P.inf) continue;
          Fe py = P.y;
          if (dg < 0) bf.neg(py, py);
          Aff& O = acc[i];
          if (O.inf) {
            O.x = P.x;
            O.y = py;
            O.inf = false;
            continue;
          }
          Fe num, den;
          if (memcmp(O.x.v, P.x.v, 32) == 0) {
            if (memcmp(O.y.v, py.v, 32) == 0) {
              Fe x2s;
              bf.mul(x2s, O.x, O.x);      // doubling: 3x^2 / 2y
              bf.add(num, x2s, x2s);
              bf.add(num, num, x2s);
              bf.add(den, O.y, O.y);
            } else {
              O.inf = true;              // P + (-P)
              continue;
            }
          } else {
            bf.sub(num, py, O.y);
            bf.sub(den, P.x, O.x);
          }
          dens.push_back(den);
          recs.push_back({O.x, O.y, P.x, i});
          O.x = num;
        }
        flush();
      }
    }
  };

#ifdef REEF_IFMA
  // 52-domain lockstep: same schedule, records flushed through the
  // 8-wide Batch52 machinery (measured ~1.3x on the bucket phase)
  auto worker52 = [&](int64_t lo_i, int64_t hi_i) {
    const Field52& f5 = *field52_for(&bf);
    int64_t m = hi_i - lo_i;
    std::vector<Aff52> acc(m);
    for (auto& a : acc) a.inf = true;
    std::vector<std::vector<Aff52>> rows(g, std::vector<Aff52>(m));
    for (int64_t t = 0; t < g; t++)
      for (int64_t i = 0; i < m; i++) {
        const Aff& src = ctx->basis[t * n + lo_i + i];
        rows[t][i].inf = src.inf;
        if (!src.inf) {
          f5.from_mont64(rows[t][i].x, bf, src.x);
          f5.from_mont64(rows[t][i].y, bf, src.y);
        }
      }
    Batch52 b;
    SoA52 pfx;
    auto flush = [&]() {
      if (b.slot.empty()) return;
      b.pad_to_8(f5);
      batch_dbl_num52(f5, b);
      batch_inv52(f5, b, pfx);
      batch_complete52(f5, b, acc.data());
      b.clear();
    };
    auto push_dbl = [&](int64_t i) {
      Fe52 den;
      f5.add(den, acc[i].y, acc[i].y);
      b.dbl.push_back((int64_t)b.slot.size());
      b.num.push(acc[i].x);
      b.den.push(den);
      b.x1.push(acc[i].x);
      b.y1.push(acc[i].y);
      b.x2.push(acc[i].x);
      b.slot.push_back(i);
      acc[i].inf = true;  // placeholder until completion
    };
    for (int bit = hi; bit >= 0; bit--) {
      for (int64_t i = 0; i < m; i++) {
        if (!acc[i].inf) push_dbl(i);
      }
      flush();
      for (int64_t t = 0; t < g; t++) {
        int8_t dg = naf[(size_t)t * 256 + bit];
        if (!dg) continue;
        for (int64_t i = 0; i < m; i++) {
          const Aff52& P0 = rows[t][i];
          if (P0.inf) continue;
          Fe52 py = P0.y;
          if (dg < 0) f5.neg(py, py);
          Aff52& O = acc[i];
          if (O.inf) {
            O.x = P0.x;
            O.y = py;
            O.inf = false;
            continue;
          }
          if (memcmp(O.x.v, P0.x.v, 40) == 0) {
            if (memcmp(O.y.v, py.v, 40) == 0) {
              push_dbl(i);
            } else {
              O.inf = true;  // P + (-P)
            }
            continue;
          }
          Fe52 num, den;
          f5.sub(num, py, O.y);
          f5.sub(den, P0.x, O.x);
          b.num.push(num);
          b.den.push(den);
          b.x1.push(O.x);
          b.y1.push(O.y);
          b.x2.push(P0.x);
          b.slot.push_back(i);
          O.inf = true;  // placeholder until completion
        }
        flush();
      }
    }
    for (int64_t i = 0; i < m; i++) {
      Aff& o = nb[lo_i + i];
      o.inf = acc[i].inf;
      if (!acc[i].inf) {
        f5.to_mont64(o.x, bf, acc[i].x);
        f5.to_mont64(o.y, bf, acc[i].y);
      }
    }
  };
  const bool mat52 = cpu_has_ifma();
  if (mat52) field52_for(&bf);   // prime the static ctx before threading
#else
  const bool mat52 = false;
#endif

  int n_threads = (int)std::thread::hardware_concurrency();
  const char* tenv = getenv("REEF_MSM_THREADS");
  if (tenv) n_threads = atoi(tenv);
  if (n_threads < 1) n_threads = 1;
  if (n_threads > 1 && n >= 64) {
    std::vector<std::thread> threads;
    int64_t chunk = (n + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; t++) {
      int64_t lo_i = t * chunk, hi_i = std::min(n, lo_i + chunk);
      if (lo_i >= hi_i) break;
#ifdef REEF_IFMA
      if (mat52) {
        threads.emplace_back(worker52, lo_i, hi_i);
        continue;
      }
#endif
      threads.emplace_back(worker, lo_i, hi_i);
    }
    for (auto& th : threads) th.join();
  } else {
#ifdef REEF_IFMA
    if (mat52)
      worker52(0, n);
    else
      worker(0, n);
#else
    worker(0, n);
#endif
  }

  ctx->basis.swap(nb);
  ctx->basis52.clear();  // rebuilt below from the folded basis
  ctx->n_orig = n;
  for (int64_t j = 0; j < n; j++) memcpy(ctx->coeff[j].v, sf.c.one_m, 32);
  ctx->coeff.resize(n);
  ipa_refresh52(ctx);
  if (prof)
    fprintf(stderr, "[ipa_mat n=%lld no=%lld] %.1fms\n", (long long)n,
            (long long)no, (prof_now() - tm0) * 1e3);
}

}  // namespace

extern "C" {

void* ipa_init(int curve_id, int64_t n, const uint8_t* w_bytes,
               const uint8_t* R_bytes, const uint8_t* packed_points) {
  IpaCtx* ctx = new IpaCtx();
  ctx->curve_id = curve_id;
  ctx->n = n;
  ctx->n_orig = n;
  const Field& sf = *scalar_field(curve_id);
  const Field& bf = get_curve(curve_id)->f;
  ctx->w.resize(n);
  ctx->R.resize(n);
  ctx->coeff.resize(n);
  for (int64_t i = 0; i < n; i++) {
    load_scalar_mont(sf, w_bytes + 32 * i, ctx->w[i]);
    load_scalar_mont(sf, R_bytes + 32 * i, ctx->R[i]);
    memcpy(ctx->coeff[i].v, sf.c.one_m, 32);
  }
  ctx->basis.resize(n);
  for (int64_t i = 0; i < n; i++)
    load_affine(bf, packed_points + 65 * i, ctx->basis[i]);
  ipa_refresh52(ctx);
  return ctx;
}

// One round: outputs cL, cR (32B standard) and the two MSM partial points
// <w_lo, G'_hi>, <w_hi, G'_lo> (96B projective canonical each).
void ipa_cross(void* h, uint8_t* cL_out, uint8_t* cR_out, uint8_t* L_out,
               uint8_t* R_out) {
  IpaCtx* ctx = (IpaCtx*)h;
  // Lazily collapse the coefficient view into a real folded basis once the
  // ratio n_orig/n reaches the threshold: later rounds then cost O(n_k)
  // instead of O(n_orig) each.  REEF_IPA_MAT_G tunes (0 disables); the
  // emitted L/R points are bit-identical either way.
  {
    int64_t G = 8;
    const char* genv = getenv("REEF_IPA_MAT_G");
    if (genv) G = atoll(genv);
    // below ~4k expanded points the lockstep NAF's fixed cost (~20ms)
    // exceeds everything the collapse saves in the remaining rounds
    if (G > 1 && ctx->n >= 2 && ctx->n_orig >= 4096 &&
        ctx->n_orig / ctx->n >= G)
      ipa_materialize(ctx);
  }
  Curve& cv = *get_curve(ctx->curve_id);
  const Field& sf = *scalar_field(ctx->curve_id);
  int64_t n = ctx->n, half = n / 2, no = ctx->n_orig;

  Fe cL, cR, t;
  memset(cL.v, 0, 32);
  memset(cR.v, 0, 32);
  for (int64_t i = 0; i < half; i++) {
    sf.mul(t, ctx->w[i], ctx->R[half + i]);
    sf.add(cL, cL, t);
    sf.mul(t, ctx->w[half + i], ctx->R[i]);
    sf.add(cR, cR, t);
  }
  Fe cLs, cRs;
  sf.from_mont(cLs, cL);
  sf.from_mont(cRs, cR);
  memcpy(cL_out, cLs.v, 32);
  memcpy(cR_out, cRs.v, 32);

  // expanded scalars over the ORIGINAL basis: position j contributes to L
  // when (j mod n) >= half with scalar w_lo[(j mod n) - half] * coeff[j],
  // else to R with scalar w_hi[j mod n] * coeff[j].
  std::vector<uint8_t> sL, sR;
  std::vector<Aff> pL, pR;
  std::vector<Aff52> pL52, pR52;
  const bool has52 = !ctx->basis52.empty();
  sL.reserve(32 * (no / 2));
  sR.reserve(32 * (no / 2));
  pL.reserve(no / 2);
  pR.reserve(no / 2);
  if (has52) {
    pL52.reserve(no / 2);
    pR52.reserve(no / 2);
  }
  Fe sm, ss;
  for (int64_t j = 0; j < no; j++) {
    int64_t pos = j % n;
    bool to_L = pos >= half;
    sf.mul(sm, to_L ? ctx->w[pos - half] : ctx->w[half + pos],
           ctx->coeff[j]);
    bool zero = !(sm.v[0] | sm.v[1] | sm.v[2] | sm.v[3]);
    if (zero || ctx->basis[j].inf) continue;
    sf.from_mont(ss, sm);
    auto& sv = to_L ? sL : sR;
    auto& pv = to_L ? pL : pR;
    size_t off = sv.size();
    sv.resize(off + 32);
    memcpy(sv.data() + off, ss.v, 32);
    pv.push_back(ctx->basis[j]);
    if (has52) (to_L ? pL52 : pR52).push_back(ctx->basis52[j]);
  }
  Pt L, Rp;
  const bool prof = getenv("REEF_MSM_PROFILE") != nullptr;
  double tc = prof ? prof_now() : 0;
  msm_core(cv, (int64_t)pL.size(), sL.data(), pL.data(), L, 0,
           pL52.empty() ? nullptr : pL52.data());
  msm_core(cv, (int64_t)pR.size(), sR.data(), pR.data(), Rp, 0,
           pR52.empty() ? nullptr : pR52.data());
  store_proj(cv.f, L, L_out);
  store_proj(cv.f, Rp, R_out);
  if (prof)
    fprintf(stderr, "[ipa_cross n=%lld no=%lld] msm %.1fms\n",
            (long long)n, (long long)no, (prof_now() - tc) * 1e3);
}

// Fold with challenge x (32B standard):
//   w   <- x*w_lo + x^-1*w_hi;  R <- x^-1*R_lo + x*R_hi;
//   coeff[j] *= (x^-1 if (j mod n) < half else x);  n <- n/2.
void ipa_fold(void* h, const uint8_t* x_bytes) {
  IpaCtx* ctx = (IpaCtx*)h;
  const Field& sf = *scalar_field(ctx->curve_id);
  int64_t n = ctx->n, half = n / 2, no = ctx->n_orig;
  Fe x, xi, a, b;
  load_scalar_mont(sf, x_bytes, x);
  sf.inv(xi, x);
  for (int64_t i = 0; i < half; i++) {
    sf.mul(a, x, ctx->w[i]);
    sf.mul(b, xi, ctx->w[half + i]);
    sf.add(ctx->w[i], a, b);
    sf.mul(a, xi, ctx->R[i]);
    sf.mul(b, x, ctx->R[half + i]);
    sf.add(ctx->R[i], a, b);
  }
  for (int64_t j = 0; j < no; j++) {
    int64_t pos = j % n;
    sf.mul(ctx->coeff[j], ctx->coeff[j], pos < half ? xi : x);
  }
  ctx->n = half;
}

// Final folded scalar w[0] (32B standard).
void ipa_final(void* h, uint8_t* w0_out) {
  IpaCtx* ctx = (IpaCtx*)h;
  const Field& sf = *scalar_field(ctx->curve_id);
  Fe o;
  sf.from_mont(o, ctx->w[0]);
  memcpy(w0_out, o.v, 32);
}

void ipa_free(void* h) { delete (IpaCtx*)h; }

}
