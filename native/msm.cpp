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
  static Curve pallas, vesta;
  static bool init_done = false;
  if (!init_done) {
    pallas.init(P_LIMBS);
    vesta.init(Q_LIMBS);
    init_done = true;
  }
  return curve_id == 0 ? &pallas : &vesta;
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
void msm_core(Curve& cv, int64_t n, const uint8_t* scalars,
              const std::vector<Aff>& pts, Pt& result_out,
              int force_threads = 0) {
  const Field& f = cv.f;
  int c;
  const char* cenv = getenv("REEF_MSM_C");
  if (cenv) { c = atoi(cenv); }
  else {
    int logn = 0;
    while ((1LL << (logn + 1)) <= n) logn++;
    c = logn - 3;  // signed digits halve the bucket count vs unsigned
    if (c < 4) c = 4;
    if (c > 16) c = 16;
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
  for (int64_t i = 0; i < n; i++) {
    const uint8_t* s = scalars + i * 32;
    uint32_t carry = 0;
    for (int w = 0; w < windows; w++) {
      int bit0 = w * c;
      uint32_t raw = 0;
      for (int k = 0; k < c; k++) {
        int bit = bit0 + k;
        if (bit < 256 && (s[bit >> 3] >> (bit & 7)) & 1) raw |= 1u << k;
      }
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

  Pt result = cv.ident;
  for (int w = windows - 1; w >= 0; w--) {
    for (int d = 0; d < c; d++) cv.padd(result, result, result);
    cv.padd(result, result, accs[w]);
  }
  result_out = result;
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

}  // namespace

extern "C" {

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
  msm_core(cv, n, scalars, pts, result);
  store_proj(f, result, out);
}

void pasta_msm(int curve_id, int64_t n, const uint8_t* scalars,
               const uint8_t* points, uint8_t* out) {
  pasta_msm_idx(curve_id, n, scalars, points, nullptr, out);
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
      msm_core(cv, n_cols, scalars + r * n_cols * 32, basis, acc,
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
};

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
      threads.emplace_back(worker, lo_i, hi_i);
    }
    for (auto& th : threads) th.join();
  } else {
    worker(0, n);
  }

  ctx->basis.swap(nb);
  ctx->n_orig = n;
  for (int64_t j = 0; j < n; j++) memcpy(ctx->coeff[j].v, sf.c.one_m, 32);
  ctx->coeff.resize(n);
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
    if (G > 1 && ctx->n >= 2 && ctx->n_orig / ctx->n >= G)
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
  sL.reserve(32 * (no / 2));
  sR.reserve(32 * (no / 2));
  pL.reserve(no / 2);
  pR.reserve(no / 2);
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
  }
  Pt L, Rp;
  msm_core(cv, (int64_t)pL.size(), sL.data(), pL, L);
  msm_core(cv, (int64_t)pR.size(), sR.data(), pR, Rp);
  store_proj(cv.f, L, L_out);
  store_proj(cv.f, Rp, R_out);
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
