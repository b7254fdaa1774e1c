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

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <cstdlib>

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
  static Curve pallas, vesta;
  static bool init_done = false;
  if (!init_done) {
    pallas.init(P_LIMBS);
    vesta.init(Q_LIMBS);
    init_done = true;
  }
  return curve_id == 0 ? &pallas : &vesta;
}

}  // namespace

extern "C" {

// scalars: n * 32 bytes LE; points: n * 65 bytes (32 x, 32 y, 1 inf flag);
// out: 65 bytes affine-compatible? -> out is 96 bytes projective
// (X,Y,Z canonical non-Montgomery); python converts to affine.
void pasta_msm_idx(int curve_id, int64_t n, const uint8_t* scalars,
                   const uint8_t* points, const int64_t* idx, uint8_t* out) {
  Curve& cv = *get_curve(curve_id);
  const Field& f = cv.f;

  // convert points to Montgomery projective
  std::vector<Pt> pts(n);
  for (int64_t i = 0; i < n; i++) {
    const uint8_t* pp = points + (idx ? idx[i] : i) * 65;
    if (pp[64]) {
      pts[i] = cv.ident;
      continue;
    }
    Fe x, y;
    memcpy(x.v, pp, 32);
    memcpy(y.v, pp + 32, 32);
    f.to_mont(pts[i].X, x);
    f.to_mont(pts[i].Y, y);
    memcpy(pts[i].Z.v, f.c.one_m, 32);
  }

  int c;
  const char* cenv = getenv("REEF_MSM_C");
  if (cenv) { c = atoi(cenv); }
  else {
    int logn = 0;
    while ((1LL << (logn + 1)) <= n) logn++;
    c = logn - 4;  // empirical optimum for these add costs
    if (c < 4) c = 4;
    if (c > 16) c = 16;
  }
  int windows = (255 + c - 1) / c;
  int n_buckets = (1 << c) - 1;

  // window accumulations are independent: parallelize across threads and
  // combine with the serial doubling chain afterwards (the reference gets
  // the same effect from rayon inside the nova fork's MSMs)
  std::vector<Pt> accs(windows);
  auto do_window = [&](int w) {
    std::vector<Pt> buckets(n_buckets, cv.ident);
    int bit0 = w * c;
    for (int64_t i = 0; i < n; i++) {
      const uint8_t* s = scalars + i * 32;
      uint32_t digit = 0;
      for (int k = 0; k < c; k++) {
        int bit = bit0 + k;
        if (bit < 256 && (s[bit >> 3] >> (bit & 7)) & 1) digit |= 1u << k;
      }
      if (digit) cv.padd(buckets[digit - 1], buckets[digit - 1], pts[i]);
    }
    Pt running = cv.ident, acc = cv.ident;
    for (int b = n_buckets - 1; b >= 0; b--) {
      cv.padd(running, running, buckets[b]);
      cv.padd(acc, acc, running);
    }
    accs[w] = acc;
  };

  int n_threads = (int)std::thread::hardware_concurrency();
  const char* tenv = getenv("REEF_MSM_THREADS");
  if (tenv) n_threads = atoi(tenv);
  if (n_threads < 1) n_threads = 1;
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

  Pt result = cv.ident;
  for (int w = windows - 1; w >= 0; w--) {
    for (int d = 0; d < c; d++) cv.padd(result, result, result);
    cv.padd(result, result, accs[w]);
  }

  Fe X, Y, Z;
  f.from_mont(X, result.X);
  f.from_mont(Y, result.Y);
  f.from_mont(Z, result.Z);
  memcpy(out, X.v, 32);
  memcpy(out + 32, Y.v, 32);
  memcpy(out + 64, Z.v, 32);
}

void pasta_msm(int curve_id, int64_t n, const uint8_t* scalars,
               const uint8_t* points, uint8_t* out) {
  pasta_msm_idx(curve_id, n, scalars, points, nullptr, out);
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
}
