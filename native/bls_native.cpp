// Native host-side BLS12-381 arithmetic for goethkzg_tpu.
//
// The TPU build keeps the bulk math on-device (Pallas/XLA kernels); this
// translation unit is the host-side native tier for the latency-critical
// per-call scalar work the reference delegates to gnark-crypto's assembly
// (SURVEY.md §2.4):
//
//  * batched compressed G1 decompress (sqrt + on-curve + fast endomorphism
//    subgroup check) — the wire hot path (reference: serialization.go:102-115);
//  * batched G1 compress for proof/commitment serialization;
//  * G1/G2 affine add + scalar-mul for the per-batch fold tail
//    (reference: internal/kzg/kzg_verify.go:74-86);
//  * the 2-pair PairingCheck (Miller loops + final exponentiation)
//    (reference: internal/kzg/kzg_verify.go:88,190, kzg_multi/kzg_verify.go:94).
//
// Validated bit-exactly against the pure-Python golden model
// (goethkzg_tpu/golden/) in tests/test_native_bls.py.
//
// Representation: Fp elements are 6x64-bit little-endian limbs in Montgomery
// form with R = 2^384 internally; the C ABI passes normal-form (non-Montgomery)
// little-endian u64 words.  Points cross the ABI as affine (x, y) word pairs
// with a separate infinity flag.

#include <cstdint>
#include <cstring>

#if defined(__SIZEOF_INT128__)
typedef unsigned __int128 u128;
#else
#error "requires __int128"
#endif

namespace {

typedef uint64_t u64;

// ----------------------------------------------------------------- Fp (381b)
struct Fp { u64 v[6]; };

static const Fp P = {{0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL,
                      0x6730d2a0f6b0f624ULL, 0x64774b84f38512bfULL,
                      0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL}};
// -p^{-1} mod 2^64
static const u64 PINV = 0x89f3fffcfffcfffdULL;
// R^2 mod p (R = 2^384)
static const Fp R2 = {{0xf4df1f341c341746ULL, 0x0a76e6a609d104f1ULL,
                       0x8de5476c4c95b6d5ULL, 0x67eb88a9939d83c0ULL,
                       0x9a793e85b519952dULL, 0x11988fe592cae3aaULL}};
// R mod p (Montgomery one)
static const Fp ONE = {{0x760900000002fffdULL, 0xebf4000bc40c0002ULL,
                        0x5f48985753c758baULL, 0x77ce585370525745ULL,
                        0x5c071a97a256ec6dULL, 0x15f65ec3fa80e493ULL}};

inline bool fp_is_zero(const Fp& a) {
    u64 r = 0;
    for (int i = 0; i < 6; ++i) r |= a.v[i];
    return r == 0;
}

inline bool fp_eq(const Fp& a, const Fp& b) {
    u64 r = 0;
    for (int i = 0; i < 6; ++i) r |= a.v[i] ^ b.v[i];
    return r == 0;
}

// a >= b (lexicographic from most-significant limb)
inline bool fp_geq(const Fp& a, const Fp& b) {
    for (int i = 5; i >= 0; --i) {
        if (a.v[i] > b.v[i]) return true;
        if (a.v[i] < b.v[i]) return false;
    }
    return true;
}

inline void fp_sub_raw(Fp& r, const Fp& a, const Fp& b, u64& borrow) {
    borrow = 0;
    for (int i = 0; i < 6; ++i) {
        u128 d = (u128)a.v[i] - b.v[i] - borrow;
        r.v[i] = (u64)d;
        borrow = (u64)(d >> 64) & 1;  // two's-complement high part is all-ones on borrow
    }
}

inline void fp_add(Fp& r, const Fp& a, const Fp& b) {
    u64 carry = 0;
    for (int i = 0; i < 6; ++i) {
        u128 s = (u128)a.v[i] + b.v[i] + carry;
        r.v[i] = (u64)s;
        carry = (u64)(s >> 64);
    }
    // carry can never be set: a, b < p < 2^381 and the sum < 2^382 < 2^384,
    // but the conditional subtract needs the compare anyway
    if (carry || fp_geq(r, P)) {
        u64 bw;
        Fp t;
        fp_sub_raw(t, r, P, bw);
        r = t;
    }
}

inline void fp_sub(Fp& r, const Fp& a, const Fp& b) {
    u64 borrow;
    fp_sub_raw(r, a, b, borrow);
    if (borrow) {
        u64 carry = 0;
        for (int i = 0; i < 6; ++i) {
            u128 s = (u128)r.v[i] + P.v[i] + carry;
            r.v[i] = (u64)s;
            carry = (u64)(s >> 64);
        }
    }
}

inline void fp_neg(Fp& r, const Fp& a) {
    if (fp_is_zero(a)) { r = a; return; }
    u64 bw;
    fp_sub_raw(r, P, a, bw);
}

// CIOS Montgomery multiplication: r = a * b * R^{-1} mod p.
inline void fp_mul(Fp& r, const Fp& a, const Fp& b) {
    u64 t[8] = {0, 0, 0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 6; ++i) {
        u64 carry = 0;
        u64 ai = a.v[i];
        for (int j = 0; j < 6; ++j) {
            u128 s = (u128)ai * b.v[j] + t[j] + carry;
            t[j] = (u64)s;
            carry = (u64)(s >> 64);
        }
        u128 s = (u128)t[6] + carry;
        t[6] = (u64)s;
        t[7] = (u64)(s >> 64);

        u64 m = t[0] * PINV;
        u128 c = (u128)m * P.v[0] + t[0];
        carry = (u64)(c >> 64);
        for (int j = 1; j < 6; ++j) {
            u128 s2 = (u128)m * P.v[j] + t[j] + carry;
            t[j - 1] = (u64)s2;
            carry = (u64)(s2 >> 64);
        }
        u128 s3 = (u128)t[6] + carry;
        t[5] = (u64)s3;
        t[6] = t[7] + (u64)(s3 >> 64);
        t[7] = 0;
    }
    Fp out;
    memcpy(out.v, t, sizeof(out.v));
    if (t[6] || fp_geq(out, P)) {
        u64 bw;
        Fp tt;
        fp_sub_raw(tt, out, P, bw);
        out = tt;
    }
    r = out;
}

inline void fp_sqr(Fp& r, const Fp& a) { fp_mul(r, a, a); }

inline void fp_to_mont(Fp& r, const Fp& a) { fp_mul(r, a, R2); }

inline void fp_from_mont(Fp& r, const Fp& a) {
    Fp one_raw = {{1, 0, 0, 0, 0, 0}};
    fp_mul(r, a, one_raw);
}

// r = base^e (Montgomery in/out); e is a big-endian bit stream of `bits` bits
// taken from `e` (6 limbs LE).
inline void fp_pow(Fp& r, const Fp& base, const u64* e, int limbs) {
    Fp acc = ONE;
    bool started = false;
    for (int i = limbs - 1; i >= 0; --i) {
        for (int b = 63; b >= 0; --b) {
            if (started) fp_sqr(acc, acc);
            if ((e[i] >> b) & 1) {
                if (started) fp_mul(acc, acc, base);
                else { acc = base; started = true; }
            }
        }
    }
    r = started ? acc : ONE;
}

inline void fp_inv(Fp& r, const Fp& a) {
    // Fermat: a^(p-2)
    u64 e[6];
    u64 borrow = 0;
    for (int i = 0; i < 6; ++i) {
        u64 sub = (i == 0) ? 2 : 0;
        u128 d = (u128)P.v[i] - sub - borrow;
        e[i] = (u64)d;
        borrow = (u64)(d >> 64) & 1;
    }
    fp_pow(r, a, e, 6);
}

// sqrt for p == 3 mod 4: a^((p+1)/4); returns false if a is not a QR.
inline bool fp_sqrt(Fp& r, const Fp& a) {
    // (p+1)/4
    static u64 e[6];
    static bool init = false;
    if (!init) {
        u64 carry = 1;
        u64 t[6];
        for (int i = 0; i < 6; ++i) {
            u128 s = (u128)P.v[i] + carry;
            t[i] = (u64)s;
            carry = (u64)(s >> 64);
        }
        // shift right by 2
        for (int i = 0; i < 6; ++i) {
            u64 hi = (i < 5) ? t[i + 1] : 0;
            e[i] = (t[i] >> 2) | (hi << 62);
        }
        init = true;
    }
    Fp s;
    fp_pow(s, a, e, 6);
    Fp s2;
    fp_sqr(s2, s);
    if (!fp_eq(s2, a)) return false;
    r = s;
    return true;
}

// lexicographically largest: y > (p-1)/2  (on normal-form values)
inline bool fp_lex_largest_normal(const Fp& y_normal) {
    // (p-1)/2
    static Fp half;
    static bool init = false;
    if (!init) {
        u64 t[6];
        u64 borrow = 0;
        for (int i = 0; i < 6; ++i) {
            u64 sub = (i == 0) ? 1 : 0;
            u128 d = (u128)P.v[i] - sub - borrow;
            t[i] = (u64)d;
            borrow = (u64)(d >> 64) & 1;
        }
        for (int i = 0; i < 6; ++i) {
            u64 hi = (i < 5) ? t[i + 1] : 0;
            half.v[i] = (t[i] >> 1) | (hi << 63);
        }
        init = true;
    }
    // y > half  <=>  !(half >= y)
    return !fp_geq(half, y_normal);
}

// ----------------------------------------------------------------- Fp2
// a0 + a1 u, u^2 = -1
struct Fp2 { Fp c0, c1; };

inline bool fp2_is_zero(const Fp2& a) { return fp_is_zero(a.c0) && fp_is_zero(a.c1); }
inline bool fp2_eq(const Fp2& a, const Fp2& b) { return fp_eq(a.c0, b.c0) && fp_eq(a.c1, b.c1); }

inline void fp2_add(Fp2& r, const Fp2& a, const Fp2& b) {
    fp_add(r.c0, a.c0, b.c0);
    fp_add(r.c1, a.c1, b.c1);
}

inline void fp2_sub(Fp2& r, const Fp2& a, const Fp2& b) {
    fp_sub(r.c0, a.c0, b.c0);
    fp_sub(r.c1, a.c1, b.c1);
}

inline void fp2_neg(Fp2& r, const Fp2& a) {
    fp_neg(r.c0, a.c0);
    fp_neg(r.c1, a.c1);
}

inline void fp2_mul(Fp2& r, const Fp2& a, const Fp2& b) {
    // Karatsuba: (a0 b0 - a1 b1) + ((a0+a1)(b0+b1) - a0 b0 - a1 b1) u
    Fp t0, t1, t2, t3, s0, s1;
    fp_mul(t0, a.c0, b.c0);
    fp_mul(t1, a.c1, b.c1);
    fp_add(s0, a.c0, a.c1);
    fp_add(s1, b.c0, b.c1);
    fp_mul(t2, s0, s1);
    fp_sub(t3, t2, t0);
    fp_sub(t3, t3, t1);
    fp_sub(r.c0, t0, t1);
    r.c1 = t3;
}

inline void fp2_sqr(Fp2& r, const Fp2& a) {
    // (a0+a1)(a0-a1) + 2 a0 a1 u
    Fp s, d, m;
    fp_add(s, a.c0, a.c1);
    fp_sub(d, a.c0, a.c1);
    fp_mul(m, a.c0, a.c1);
    fp_mul(r.c0, s, d);
    fp_add(r.c1, m, m);
}

inline void fp2_inv(Fp2& r, const Fp2& a) {
    // 1/(a0 + a1 u) = (a0 - a1 u)/(a0^2 + a1^2)
    Fp t0, t1, d, di;
    fp_sqr(t0, a.c0);
    fp_sqr(t1, a.c1);
    fp_add(d, t0, t1);
    fp_inv(di, d);
    fp_mul(r.c0, a.c0, di);
    Fp n1;
    fp_neg(n1, a.c1);
    fp_mul(r.c1, n1, di);
}

inline void fp2_mul_by_fp(Fp2& r, const Fp2& a, const Fp& s) {
    fp_mul(r.c0, a.c0, s);
    fp_mul(r.c1, a.c1, s);
}

// multiply by the sextic-twist shift xi = 1 + u
inline void fp2_mul_by_xi(Fp2& r, const Fp2& a) {
    Fp t0, t1;
    fp_sub(t0, a.c0, a.c1);
    fp_add(t1, a.c0, a.c1);
    r.c0 = t0;
    r.c1 = t1;
}

// ----------------------------------------------------------------- Fp6
// c0 + c1 v + c2 v^2, v^3 = xi = 1 + u
struct Fp6 { Fp2 c0, c1, c2; };

inline bool fp6_is_zero(const Fp6& a) {
    return fp2_is_zero(a.c0) && fp2_is_zero(a.c1) && fp2_is_zero(a.c2);
}

inline void fp6_add(Fp6& r, const Fp6& a, const Fp6& b) {
    fp2_add(r.c0, a.c0, b.c0);
    fp2_add(r.c1, a.c1, b.c1);
    fp2_add(r.c2, a.c2, b.c2);
}

inline void fp6_sub(Fp6& r, const Fp6& a, const Fp6& b) {
    fp2_sub(r.c0, a.c0, b.c0);
    fp2_sub(r.c1, a.c1, b.c1);
    fp2_sub(r.c2, a.c2, b.c2);
}

inline void fp6_neg(Fp6& r, const Fp6& a) {
    fp2_neg(r.c0, a.c0);
    fp2_neg(r.c1, a.c1);
    fp2_neg(r.c2, a.c2);
}

inline void fp6_mul(Fp6& r, const Fp6& a, const Fp6& b) {
    // Toom/Karatsuba (standard): 6 Fp2 muls
    Fp2 v0, v1, v2, t0, t1, t2, s;
    fp2_mul(v0, a.c0, b.c0);
    fp2_mul(v1, a.c1, b.c1);
    fp2_mul(v2, a.c2, b.c2);
    // r0 = v0 + xi*((a1+a2)(b1+b2) - v1 - v2)
    fp2_add(t0, a.c1, a.c2);
    fp2_add(t1, b.c1, b.c2);
    fp2_mul(t2, t0, t1);
    fp2_sub(t2, t2, v1);
    fp2_sub(t2, t2, v2);
    fp2_mul_by_xi(s, t2);
    fp2_add(r.c0, v0, s);
    // r1 = (a0+a1)(b0+b1) - v0 - v1 + xi*v2
    Fp2 r1;
    fp2_add(t0, a.c0, a.c1);
    fp2_add(t1, b.c0, b.c1);
    fp2_mul(t2, t0, t1);
    fp2_sub(t2, t2, v0);
    fp2_sub(t2, t2, v1);
    fp2_mul_by_xi(s, v2);
    fp2_add(r1, t2, s);
    // r2 = (a0+a2)(b0+b2) - v0 - v2 + v1
    Fp2 r2;
    fp2_add(t0, a.c0, a.c2);
    fp2_add(t1, b.c0, b.c2);
    fp2_mul(t2, t0, t1);
    fp2_sub(t2, t2, v0);
    fp2_sub(t2, t2, v2);
    fp2_add(r2, t2, v1);
    r.c1 = r1;
    r.c2 = r2;
}

inline void fp6_mul_by_v(Fp6& r, const Fp6& a) {
    // (c0 + c1 v + c2 v^2) * v = xi*c2 + c0 v + c1 v^2
    Fp2 t;
    fp2_mul_by_xi(t, a.c2);
    Fp2 old0 = a.c0, old1 = a.c1;
    r.c0 = t;
    r.c1 = old0;
    r.c2 = old1;
}

inline void fp6_inv(Fp6& r, const Fp6& a) {
    // standard: via the norm to Fp2
    Fp2 A, B, C, t0, t1, t2, F, Fi;
    // A = c0^2 - xi c1 c2 ; B = xi c2^2 - c0 c1 ; C = c1^2 - c0 c2
    fp2_sqr(t0, a.c0);
    fp2_mul(t1, a.c1, a.c2);
    fp2_mul_by_xi(t2, t1);
    fp2_sub(A, t0, t2);
    fp2_sqr(t0, a.c2);
    fp2_mul_by_xi(t1, t0);
    fp2_mul(t2, a.c0, a.c1);
    fp2_sub(B, t1, t2);
    fp2_sqr(t0, a.c1);
    fp2_mul(t1, a.c0, a.c2);
    fp2_sub(C, t0, t1);
    // F = c0 A + xi(c2 B + c1 C)
    Fp2 s0, s1;
    fp2_mul(s0, a.c2, B);
    fp2_mul(s1, a.c1, C);
    fp2_add(s0, s0, s1);
    fp2_mul_by_xi(s0, s0);
    fp2_mul(s1, a.c0, A);
    fp2_add(F, s0, s1);
    fp2_inv(Fi, F);
    fp2_mul(r.c0, A, Fi);
    fp2_mul(r.c1, B, Fi);
    fp2_mul(r.c2, C, Fi);
}

// ----------------------------------------------------------------- Fp12
// a + b w, w^2 = v
struct Fp12 { Fp6 a, b; };

inline void fp12_mul(Fp12& r, const Fp12& x, const Fp12& y) {
    // (a + bw)(c + dw) = (ac + v bd) + (ad + bc) w, Karatsuba
    Fp6 ac, bd, t0, t1, t2, vbd;
    fp6_mul(ac, x.a, y.a);
    fp6_mul(bd, x.b, y.b);
    fp6_add(t0, x.a, x.b);
    fp6_add(t1, y.a, y.b);
    fp6_mul(t2, t0, t1);
    fp6_sub(t2, t2, ac);
    fp6_sub(t2, t2, bd);
    fp6_mul_by_v(vbd, bd);
    fp6_add(r.a, ac, vbd);
    r.b = t2;
}

inline void fp12_sqr(Fp12& r, const Fp12& x) {
    // (a + bw)^2 = (a^2 + v b^2) + 2ab w, via 2 fp6 muls:
    //   ab = a*b ; c0 = (a+b)(a+vb) - ab - v*ab ; c1 = 2ab
    Fp6 ab, vab, s, t, c0;
    fp6_mul(ab, x.a, x.b);
    fp6_mul_by_v(vab, ab);
    fp6_add(s, x.a, x.b);
    fp6_mul_by_v(t, x.b);
    fp6_add(t, x.a, t);
    fp6_mul(c0, s, t);
    fp6_sub(c0, c0, ab);
    fp6_sub(c0, c0, vab);
    r.a = c0;
    fp6_add(r.b, ab, ab);
}

// Granger-Scott squaring for elements of the cyclotomic subgroup (valid
// only after the easy part of the final exponentiation).  With w-degree
// coords h0=a.c0, h1=b.c0, h2=a.c1, h3=b.c1, h4=a.c2, h5=b.c2 and Fp4
// pairs (h0,h3), (h1,h4), (h2,h5), s^2 = xi:
//   fp4_sqr(x0,x1) = (x0^2 + xi x1^2, 2 x0 x1)
//   a' = (3 t00 - 2 h0, 3 t10 - 2 h2, 3 t20 - 2 h4)
//   b' = (3 xi t21 + 2 h1, 3 t01 + 2 h3, 3 t11 + 2 h5)
// (formula validated bit-exactly against the golden model; see
// goethkzg_tpu/golden/field.py fp12_sqr).
inline void fp4_sqr(Fp2& r0, Fp2& r1, const Fp2& x0, const Fp2& x1) {
    Fp2 t0, t1, s, t2;
    fp2_sqr(t0, x0);
    fp2_sqr(t1, x1);
    fp2_add(s, x0, x1);
    fp2_sqr(t2, s);
    fp2_sub(t2, t2, t0);
    fp2_sub(r1, t2, t1);          // 2 x0 x1
    fp2_mul_by_xi(t1, t1);
    fp2_add(r0, t0, t1);          // x0^2 + xi x1^2
}

inline void fp12_cyclo_sqr(Fp12& r, const Fp12& x) {
    Fp2 t00, t01, t10, t11, t20, t21, u;
    fp4_sqr(t00, t01, x.a.c0, x.b.c1);
    fp4_sqr(t10, t11, x.b.c0, x.a.c2);
    fp4_sqr(t20, t21, x.a.c1, x.b.c2);
    Fp12 res;
    // a'_i = 2(t_i0 - h_even_i) + t_i0
    fp2_sub(u, t00, x.a.c0); fp2_add(u, u, u); fp2_add(res.a.c0, u, t00);
    fp2_sub(u, t10, x.a.c1); fp2_add(u, u, u); fp2_add(res.a.c1, u, t10);
    fp2_sub(u, t20, x.a.c2); fp2_add(u, u, u); fp2_add(res.a.c2, u, t20);
    // b'_i = 2(t' + h_odd_i) + t'
    Fp2 xt21;
    fp2_mul_by_xi(xt21, t21);
    fp2_add(u, xt21, x.b.c0); fp2_add(u, u, u); fp2_add(res.b.c0, u, xt21);
    fp2_add(u, t01, x.b.c1); fp2_add(u, u, u); fp2_add(res.b.c1, u, t01);
    fp2_add(u, t11, x.b.c2); fp2_add(u, u, u); fp2_add(res.b.c2, u, t11);
    r = res;
}


inline void fp12_conj(Fp12& r, const Fp12& x) {
    r.a = x.a;
    fp6_neg(r.b, x.b);
}

inline void fp12_inv(Fp12& r, const Fp12& x) {
    // 1/(a + bw) = (a - bw)/(a^2 - v b^2)
    Fp6 a2, b2, vb2, d, di;
    fp6_mul(a2, x.a, x.a);
    fp6_mul(b2, x.b, x.b);
    fp6_mul_by_v(vb2, b2);
    fp6_sub(d, a2, vb2);
    fp6_inv(di, d);
    fp6_mul(r.a, x.a, di);
    Fp6 nb;
    fp6_neg(nb, x.b);
    fp6_mul(r.b, nb, di);
}

inline void fp12_one(Fp12& r) {
    memset(&r, 0, sizeof(r));
    r.a.c0.c0 = ONE;
}

inline bool fp12_is_one(const Fp12& x) {
    Fp12 one;
    fp12_one(one);
    const u64* p1 = (const u64*)&x;
    const u64* p2 = (const u64*)&one;
    for (size_t i = 0; i < sizeof(Fp12) / 8; ++i)
        if (p1[i] != p2[i]) return false;
    return true;
}

// x^e for cyclotomic x, e a positive u64 (square-and-multiply with GS
// squarings; e is a fixed public exponent so the branch pattern is fine).
inline void fp12_cyclo_pow_u64(Fp12& r, const Fp12& base, u64 e) {
    Fp12 acc;
    bool started = false;
    for (int b = 63; b >= 0; --b) {
        if (started) fp12_cyclo_sqr(acc, acc);
        if ((e >> b) & 1) {
            if (started) fp12_mul(acc, acc, base);
            else { acc = base; started = true; }
        }
    }
    if (!started) fp12_one(acc);
    r = acc;
}

// Frobenius: x -> x^p, computed generically via coefficient conjugation and
// multiplication by precomputed constants gamma_{i} = xi^((p-1)*i/6).
// We compute the constants lazily at first use (one-time cost).
struct FrobCtx {
    Fp2 g1[6];   // xi^((p-1)/6 * i), i = 0..5  (for x -> x^p)
    Fp2 g2[6];   // for x -> x^{p^2}
    bool init = false;
};
static FrobCtx FROB;

inline void fp2_conj(Fp2& r, const Fp2& a) {
    r.c0 = a.c0;
    fp_neg(r.c1, a.c1);
}

inline void fp2_pow(Fp2& r, const Fp2& base, const u64* e, int limbs) {
    Fp2 acc;
    acc.c0 = ONE;
    memset(&acc.c1, 0, sizeof(acc.c1));
    bool started = false;
    for (int i = limbs - 1; i >= 0; --i) {
        for (int b = 63; b >= 0; --b) {
            if (started) fp2_sqr(acc, acc);
            if ((e[i] >> b) & 1) {
                if (started) fp2_mul(acc, acc, base);
                else { acc = base; started = true; }
            }
        }
    }
    if (!started) { acc.c0 = ONE; memset(&acc.c1, 0, sizeof(acc.c1)); }
    r = acc;
}

inline void frob_init() {
    if (FROB.init) return;
    // xi = 1 + u in Montgomery form
    Fp2 xi;
    xi.c0 = ONE;
    xi.c1 = ONE;
    // e = (p - 1) / 6
    u64 pm1[6];
    u64 borrow = 0;
    for (int i = 0; i < 6; ++i) {
        u64 sub = (i == 0) ? 1 : 0;
        u128 d = (u128)P.v[i] - sub - borrow;
        pm1[i] = (u64)d;
        borrow = (u64)(d >> 64) & 1;
    }
    // divide by 6: schoolbook long division from the top limb
    u64 e6[6];
    u128 rem = 0;
    for (int i = 5; i >= 0; --i) {
        u128 cur = (rem << 64) | pm1[i];
        e6[i] = (u64)(cur / 6);
        rem = cur % 6;
    }
    Fp2 base;
    fp2_pow(base, xi, e6, 6);   // gamma = xi^((p-1)/6)
    // g1[i] = gamma^i
    FROB.g1[0].c0 = ONE;
    memset(&FROB.g1[0].c1, 0, sizeof(Fp));
    for (int i = 1; i < 6; ++i) fp2_mul(FROB.g1[i], FROB.g1[i - 1], base);
    // g2[i] = g1[i] * conj(g1[i])  (since (x^p)^p conjugates back)
    for (int i = 0; i < 6; ++i) {
        Fp2 c;
        fp2_conj(c, FROB.g1[i]);
        fp2_mul(FROB.g2[i], FROB.g1[i], c);
    }
    FROB.init = true;
}

// x -> x^p
inline void fp12_frobenius(Fp12& r, const Fp12& x) {
    frob_init();
    // coefficients of x as polynomial in w over Fp2: w-degree order
    // x = a.c0 + a.c1 v + a.c2 v^2 + (b.c0 + b.c1 v + b.c2 v^2) w
    // with v = w^2: degrees 0, 2, 4 from a; 1, 3, 5 from b.
    const Fp2* coeff[6] = {&x.a.c0, &x.b.c0, &x.a.c1, &x.b.c1, &x.a.c2, &x.b.c2};
    Fp2* out[6];
    Fp12 res;
    out[0] = &res.a.c0; out[1] = &res.b.c0; out[2] = &res.a.c1;
    out[3] = &res.b.c1; out[4] = &res.a.c2; out[5] = &res.b.c2;
    for (int i = 0; i < 6; ++i) {
        Fp2 c;
        fp2_conj(c, *coeff[i]);
        fp2_mul(*out[i], c, FROB.g1[i]);
    }
    r = res;
}

// x -> x^{p^2}
inline void fp12_frobenius2(Fp12& r, const Fp12& x) {
    frob_init();
    const Fp2* coeff[6] = {&x.a.c0, &x.b.c0, &x.a.c1, &x.b.c1, &x.a.c2, &x.b.c2};
    Fp2* out[6];
    Fp12 res;
    out[0] = &res.a.c0; out[1] = &res.b.c0; out[2] = &res.a.c1;
    out[3] = &res.b.c1; out[4] = &res.a.c2; out[5] = &res.b.c2;
    for (int i = 0; i < 6; ++i)
        fp2_mul(*out[i], *coeff[i], FROB.g2[i]);
    r = res;
}

// ----------------------------------------------------------------- G1
struct G1Aff { Fp x, y; bool inf; };
struct G1Jac { Fp X, Y, Z; };   // infinity <=> Z == 0

inline void g1_set_inf(G1Jac& r) { memset(&r, 0, sizeof(r)); }
inline bool g1_is_inf(const G1Jac& p) { return fp_is_zero(p.Z); }

inline void g1_from_aff(G1Jac& r, const G1Aff& a) {
    if (a.inf) { g1_set_inf(r); return; }
    r.X = a.x;
    r.Y = a.y;
    r.Z = ONE;
}

inline void g1_double(G1Jac& r, const G1Jac& p) {
    if (g1_is_inf(p) || fp_is_zero(p.Y)) { g1_set_inf(r); return; }
    Fp A, B, C, D, E, F, t;
    fp_sqr(A, p.X);
    fp_sqr(B, p.Y);
    fp_sqr(C, B);
    fp_add(t, p.X, B);
    fp_sqr(t, t);
    fp_sub(t, t, A);
    fp_sub(t, t, C);
    fp_add(D, t, t);
    fp_add(E, A, A);
    fp_add(E, E, A);
    fp_sqr(F, E);
    Fp X3, Y3, Z3;
    fp_sub(X3, F, D);
    fp_sub(X3, X3, D);
    Fp C8;
    fp_add(C8, C, C);
    fp_add(C8, C8, C8);
    fp_add(C8, C8, C8);
    fp_sub(t, D, X3);
    fp_mul(Y3, E, t);
    fp_sub(Y3, Y3, C8);
    fp_add(t, p.Y, p.Y);
    fp_mul(Z3, t, p.Z);
    r.X = X3; r.Y = Y3; r.Z = Z3;
}

inline void g1_add(G1Jac& r, const G1Jac& p, const G1Jac& q) {
    if (g1_is_inf(p)) { r = q; return; }
    if (g1_is_inf(q)) { r = p; return; }
    Fp Z1Z1, Z2Z2, U1, U2, S1, S2, t;
    fp_sqr(Z1Z1, p.Z);
    fp_sqr(Z2Z2, q.Z);
    fp_mul(U1, p.X, Z2Z2);
    fp_mul(U2, q.X, Z1Z1);
    fp_mul(t, p.Y, q.Z);
    fp_mul(S1, t, Z2Z2);
    fp_mul(t, q.Y, p.Z);
    fp_mul(S2, t, Z1Z1);
    if (fp_eq(U1, U2)) {
        if (fp_eq(S1, S2)) { g1_double(r, p); return; }
        g1_set_inf(r);
        return;
    }
    Fp H, I, J, rr, V;
    fp_sub(H, U2, U1);
    fp_add(I, H, H);
    fp_sqr(I, I);
    fp_mul(J, H, I);
    fp_sub(rr, S2, S1);
    fp_add(rr, rr, rr);
    fp_mul(V, U1, I);
    Fp X3, Y3, Z3;
    fp_sqr(X3, rr);
    fp_sub(X3, X3, J);
    fp_sub(X3, X3, V);
    fp_sub(X3, X3, V);
    Fp SJ;
    fp_mul(SJ, S1, J);
    fp_sub(t, V, X3);
    fp_mul(Y3, rr, t);
    fp_sub(Y3, Y3, SJ);
    fp_sub(Y3, Y3, SJ);
    fp_mul(t, p.Z, q.Z);
    fp_add(Z3, H, H);
    fp_mul(Z3, t, Z3);
    r.X = X3; r.Y = Y3; r.Z = Z3;
}

inline void g1_neg(G1Jac& r, const G1Jac& p) {
    r.X = p.X;
    fp_neg(r.Y, p.Y);
    r.Z = p.Z;
}

inline void g1_to_aff(G1Aff& r, const G1Jac& p) {
    if (g1_is_inf(p)) { memset(&r, 0, sizeof(r)); r.inf = true; return; }
    Fp zi, zi2, zi3;
    fp_inv(zi, p.Z);
    fp_sqr(zi2, zi);
    fp_mul(zi3, zi2, zi);
    fp_mul(r.x, p.X, zi2);
    fp_mul(r.y, p.Y, zi3);
    r.inf = false;
}

// scalar mul, scalar as LE u64 limbs
inline void g1_scalar_mul(G1Jac& r, const G1Jac& p, const u64* k, int limbs) {
    G1Jac acc;
    g1_set_inf(acc);
    bool started = false;
    for (int i = limbs - 1; i >= 0; --i) {
        for (int b = 63; b >= 0; --b) {
            if (started) g1_double(acc, acc);
            if ((k[i] >> b) & 1) {
                if (started) g1_add(acc, acc, p);
                else { acc = p; started = true; }
            }
        }
    }
    if (!started) g1_set_inf(acc);
    r = acc;
}

// ----------------------------------------------------------------- G2
struct G2Aff { Fp2 x, y; bool inf; };
struct G2Jac { Fp2 X, Y, Z; };

inline void g2_set_inf(G2Jac& r) { memset(&r, 0, sizeof(r)); }
inline bool g2_is_inf(const G2Jac& p) { return fp2_is_zero(p.Z); }

inline void g2_from_aff(G2Jac& r, const G2Aff& a) {
    if (a.inf) { g2_set_inf(r); return; }
    r.X = a.x;
    r.Y = a.y;
    r.Z.c0 = ONE;
    memset(&r.Z.c1, 0, sizeof(Fp));
}

inline void g2_double(G2Jac& r, const G2Jac& p) {
    if (g2_is_inf(p) || fp2_is_zero(p.Y)) { g2_set_inf(r); return; }
    Fp2 A, B, C, D, E, F, t;
    fp2_sqr(A, p.X);
    fp2_sqr(B, p.Y);
    fp2_sqr(C, B);
    fp2_add(t, p.X, B);
    fp2_sqr(t, t);
    fp2_sub(t, t, A);
    fp2_sub(t, t, C);
    fp2_add(D, t, t);
    fp2_add(E, A, A);
    fp2_add(E, E, A);
    fp2_sqr(F, E);
    Fp2 X3, Y3, Z3, C8;
    fp2_sub(X3, F, D);
    fp2_sub(X3, X3, D);
    fp2_add(C8, C, C);
    fp2_add(C8, C8, C8);
    fp2_add(C8, C8, C8);
    fp2_sub(t, D, X3);
    fp2_mul(Y3, E, t);
    fp2_sub(Y3, Y3, C8);
    fp2_add(t, p.Y, p.Y);
    fp2_mul(Z3, t, p.Z);
    r.X = X3; r.Y = Y3; r.Z = Z3;
}

inline void g2_add(G2Jac& r, const G2Jac& p, const G2Jac& q) {
    if (g2_is_inf(p)) { r = q; return; }
    if (g2_is_inf(q)) { r = p; return; }
    Fp2 Z1Z1, Z2Z2, U1, U2, S1, S2, t;
    fp2_sqr(Z1Z1, p.Z);
    fp2_sqr(Z2Z2, q.Z);
    fp2_mul(U1, p.X, Z2Z2);
    fp2_mul(U2, q.X, Z1Z1);
    fp2_mul(t, p.Y, q.Z);
    fp2_mul(S1, t, Z2Z2);
    fp2_mul(t, q.Y, p.Z);
    fp2_mul(S2, t, Z1Z1);
    if (fp2_eq(U1, U2)) {
        if (fp2_eq(S1, S2)) { g2_double(r, p); return; }
        g2_set_inf(r);
        return;
    }
    Fp2 H, I, J, rr, V;
    fp2_sub(H, U2, U1);
    fp2_add(I, H, H);
    fp2_sqr(I, I);
    fp2_mul(J, H, I);
    fp2_sub(rr, S2, S1);
    fp2_add(rr, rr, rr);
    fp2_mul(V, U1, I);
    Fp2 X3, Y3, Z3, SJ;
    fp2_sqr(X3, rr);
    fp2_sub(X3, X3, J);
    fp2_sub(X3, X3, V);
    fp2_sub(X3, X3, V);
    fp2_mul(SJ, S1, J);
    fp2_sub(t, V, X3);
    fp2_mul(Y3, rr, t);
    fp2_sub(Y3, Y3, SJ);
    fp2_sub(Y3, Y3, SJ);
    fp2_mul(t, p.Z, q.Z);
    fp2_add(Z3, H, H);
    fp2_mul(Z3, t, Z3);
    r.X = X3; r.Y = Y3; r.Z = Z3;
}

inline void g2_to_aff(G2Aff& r, const G2Jac& p) {
    if (g2_is_inf(p)) { memset(&r, 0, sizeof(r)); r.inf = true; return; }
    Fp2 zi, zi2, zi3;
    fp2_inv(zi, p.Z);
    fp2_sqr(zi2, zi);
    fp2_mul(zi3, zi2, zi);
    fp2_mul(r.x, p.X, zi2);
    fp2_mul(r.y, p.Y, zi3);
    r.inf = false;
}

inline void g2_scalar_mul(G2Jac& r, const G2Jac& p, const u64* k, int limbs) {
    G2Jac acc;
    g2_set_inf(acc);
    bool started = false;
    for (int i = limbs - 1; i >= 0; --i) {
        for (int b = 63; b >= 0; --b) {
            if (started) g2_double(acc, acc);
            if ((k[i] >> b) & 1) {
                if (started) g2_add(acc, acc, p);
                else { acc = p; started = true; }
            }
        }
    }
    if (!started) g2_set_inf(acc);
    r = acc;
}

// ------------------------------------------------ G1 fast subgroup check
// GLV endomorphism phi(x, y) = (beta x, y) with beta a primitive cube root
// of unity in Fp; on G1 it acts as multiplication by lambda with
// lambda^2 + lambda + 1 == 0 (mod r).  Membership test (Scott,
// https://eprint.iacr.org/2021/1130, as used by gnark/blst):
//     P in G1  <=>  phi(P) == -[z^2] P,  z = BLS parameter.
// beta is self-calibrated at init against [r-z^2... ] the generator:
// the two cube roots correspond to lambda in {-z^2, z^2 - 1}; we pick the
// root for which phi(G) == [-z^2]G holds on the standard generator.

static const u64 BLS_Z = 0xd201000000010000ULL;  // |z|, z itself is negative

struct EndoCtx {
    Fp beta;      // Montgomery
    bool init = false;
};
static EndoCtx ENDO;

static G1Aff G1_GEN;   // set lazily from known constants (normal-form words)

static const u64 G1_GEN_X_W[6] = {
    0xfb3af00adb22c6bbULL, 0x6c55e83ff97a1aefULL, 0xa14e3a3f171bac58ULL,
    0xc3688c4f9774b905ULL, 0x2695638c4fa9ac0fULL, 0x17f1d3a73197d794ULL};
static const u64 G1_GEN_Y_W[6] = {
    0x0caa232946c5e7e1ULL, 0xd03cc744a2888ae4ULL, 0x00db18cb2c04b3edULL,
    0xfcf5e095d5d00af6ULL, 0xa09e30ed741d8ae4ULL, 0x08b3f481e3aaa0f1ULL};

inline void endo_init() {
    if (ENDO.init) return;
    // generator in Montgomery form
    Fp gx, gy;
    memcpy(gx.v, G1_GEN_X_W, sizeof(gx.v));
    memcpy(gy.v, G1_GEN_Y_W, sizeof(gy.v));
    fp_to_mont(G1_GEN.x, gx);
    fp_to_mont(G1_GEN.y, gy);
    G1_GEN.inf = false;
    // beta = 2^((p-1)/3) is a cube root of unity (2 is a non-residue cube?
    // not guaranteed primitive — check and fall back to 3, 5, ...)
    u64 e3[6];
    {
        u64 pm1[6];
        u64 borrow = 0;
        for (int i = 0; i < 6; ++i) {
            u64 sub = (i == 0) ? 1 : 0;
            u128 d = (u128)P.v[i] - sub - borrow;
            pm1[i] = (u64)d;
            borrow = (u64)(d >> 64) & 1;
        }
        u128 rem = 0;
        for (int i = 5; i >= 0; --i) {
            u128 cur = (rem << 64) | pm1[i];
            e3[i] = (u64)(cur / 3);
            rem = cur % 3;
        }
    }
    Fp beta;
    for (u64 base = 2;; ++base) {
        Fp b_raw = {{base, 0, 0, 0, 0, 0}};
        Fp b_mont;
        fp_to_mont(b_mont, b_raw);
        fp_pow(beta, b_mont, e3, 6);
        if (!fp_eq(beta, ONE)) break;   // primitive cube root found
    }
    // calibrate: want phi(G) == [-z^2]G  i.e.  phi(G) + [z]([z]G) == inf
    // (z < 0, so [z^2]P = [|z|]([|z|]P) and -[z^2]P = neg of that).
    for (int attempt = 0; attempt < 2; ++attempt) {
        G1Jac g, zg, z2g, phig, sum;
        g1_from_aff(g, G1_GEN);
        u64 zw[1] = {BLS_Z};
        g1_scalar_mul(zg, g, zw, 1);
        g1_scalar_mul(z2g, zg, zw, 1);
        // phi(G)
        G1Aff pa = G1_GEN;
        fp_mul(pa.x, pa.x, beta);
        g1_from_aff(phig, pa);
        g1_add(sum, phig, z2g);   // phi(G) + [z^2]G should be infinity
        if (g1_is_inf(sum)) { ENDO.beta = beta; ENDO.init = true; return; }
        fp_sqr(beta, beta);       // try the other root
    }
    // neither root worked — leave uninitialized; callers fall back to mul-by-r
    ENDO.init = false;
}

// full scalar-field order r as LE u64 words (for the slow fallback check)
static const u64 R_WORDS[4] = {
    0xffffffff00000001ULL, 0x53bda402fffe5bfeULL,
    0x3339d80809a1d805ULL, 0x73eda753299d7d48ULL};

inline bool g1_in_subgroup(const G1Aff& p) {
    if (p.inf) return true;
    endo_init();
    G1Jac j;
    g1_from_aff(j, p);
    if (ENDO.init) {
        G1Jac zg, z2g, phig, sum;
        u64 zw[1] = {BLS_Z};
        g1_scalar_mul(zg, j, zw, 1);
        g1_scalar_mul(z2g, zg, zw, 1);
        G1Aff pa = p;
        fp_mul(pa.x, pa.x, ENDO.beta);
        g1_from_aff(phig, pa);
        g1_add(sum, phig, z2g);
        return g1_is_inf(sum);
    }
    G1Jac rp;
    g1_scalar_mul(rp, j, R_WORDS, 4);
    return g1_is_inf(rp);
}

// ------------------------------------------------ pairing (optimal ate)
// Inversion-free Jacobian Miller loop with twist-aware sparse lines,
// mirroring the validated device design (goethkzg_tpu/ops/pairing.py):
// G2 points live on the M-twist E': y^2 = x^3 + 4(1+u); untwist
// (x, y) -> (x w^-2, y w^-3).  Every line denominator is an Fp2 scalar,
// which dies under the final exponentiation ((p^2-1) | (p^12-1)/r), so
// lines are *scaled* instead of divided.  With T=(X,Y,Z) Jacobian:
//   doubling: A = 2 Y Z^3 yp xi ; B = 3 X^3 - 2 Y^2 ; C = -3 X^2 Z^2 xp
//   addition: theta = Y - yq Z^3 ; pi = X - xq Z^2 ;
//             A = pi Z yp xi ; B = theta xq - pi Z yq ; C = -theta xp
// placing the line at Fp12 positions l = (A,0,0) + (0,B,C) w.

// f *= (A,0,0) + (0,B,C) w  — sparse 15-fp2-mul product (vs 18 full).
inline void fp12_mul_line(Fp12& f, const Fp2& A, const Fp2& B, const Fp2& C) {
    // ta = f.a * (A,0,0)
    Fp6 ta;
    fp2_mul(ta.c0, f.a.c0, A);
    fp2_mul(ta.c1, f.a.c1, A);
    fp2_mul(ta.c2, f.a.c2, A);
    // tb = f.b * (0,B,C), v^3 = xi
    Fp6 tb;
    Fp2 t1, t2, u;
    fp2_mul(t1, f.b.c1, C);
    fp2_mul(t2, f.b.c2, B);
    fp2_add(u, t1, t2);
    fp2_mul_by_xi(tb.c0, u);
    fp2_mul(t1, f.b.c0, B);
    fp2_mul(t2, f.b.c2, C);
    fp2_mul_by_xi(t2, t2);
    fp2_add(tb.c1, t1, t2);
    fp2_mul(t1, f.b.c0, C);
    fp2_mul(t2, f.b.c1, B);
    fp2_add(tb.c2, t1, t2);
    // cross = (f.a + f.b) * (A,B,C) - ta - tb   (Karatsuba)
    Fp6 s, labc, cross;
    fp6_add(s, f.a, f.b);
    labc.c0 = A; labc.c1 = B; labc.c2 = C;
    fp6_mul(cross, s, labc);
    fp6_sub(cross, cross, ta);
    fp6_sub(cross, cross, tb);
    // f.a = ta + v*tb ; f.b = cross
    Fp6 vtb;
    fp6_mul_by_v(vtb, tb);
    fp6_add(f.a, ta, vtb);
    f.b = cross;
}

// combined tangent-line + Jacobian doubling step (shares X^2, Y^2, Z^2)
inline void miller_dbl_step(Fp12& f, G2Jac& T, const Fp& xp, const Fp& yp) {
    Fp2 XX, YY, YYYY, ZZ, ZZZ, t;
    fp2_sqr(XX, T.X);
    fp2_sqr(YY, T.Y);
    fp2_sqr(YYYY, YY);
    fp2_sqr(ZZ, T.Z);
    fp2_mul(ZZZ, ZZ, T.Z);
    // line: LA = 2 Y Z^3 yp xi ; LB = 3 X^3 - 2 Y^2 ; LC = -3 X^2 Z^2 xp
    Fp2 LA, LB, LC, X3, X2Z2;
    fp2_mul(LA, T.Y, ZZZ);
    fp2_add(LA, LA, LA);
    fp2_mul_by_fp(LA, LA, yp);
    fp2_mul_by_xi(LA, LA);
    fp2_mul(X3, T.X, XX);
    fp2_add(LB, X3, X3);
    fp2_add(LB, LB, X3);
    fp2_add(t, YY, YY);
    fp2_sub(LB, LB, t);
    fp2_mul(X2Z2, XX, ZZ);
    fp2_add(LC, X2Z2, X2Z2);
    fp2_add(LC, LC, X2Z2);
    fp2_mul_by_fp(LC, LC, xp);
    fp2_neg(LC, LC);
    fp12_mul_line(f, LA, LB, LC);
    // T = 2T (dbl-2009-l, a=0): D = 2((X+YY)^2 - XX - YYYY), E = 3 XX
    Fp2 D, E, F;
    fp2_add(t, T.X, YY);
    fp2_sqr(t, t);
    fp2_sub(t, t, XX);
    fp2_sub(t, t, YYYY);
    fp2_add(D, t, t);
    fp2_add(E, XX, XX);
    fp2_add(E, E, XX);
    fp2_sqr(F, E);
    Fp2 nX, nY, nZ, Y8;
    fp2_sub(nX, F, D);
    fp2_sub(nX, nX, D);
    fp2_add(Y8, YYYY, YYYY);
    fp2_add(Y8, Y8, Y8);
    fp2_add(Y8, Y8, Y8);
    fp2_sub(t, D, nX);
    fp2_mul(nY, E, t);
    fp2_sub(nY, nY, Y8);
    fp2_add(t, T.Y, T.Y);
    fp2_mul(nZ, t, T.Z);
    T.X = nX; T.Y = nY; T.Z = nZ;
}

// chord-line + mixed addition step T = T + Q (Q affine; ate loop
// guarantees T != ±Q on valid inputs)
inline void miller_add_step(Fp12& f, G2Jac& T, const G2Aff& q,
                            const Fp& xp, const Fp& yp) {
    Fp2 ZZ, ZZZ, theta, pi, piZ, t;
    fp2_sqr(ZZ, T.Z);
    fp2_mul(ZZZ, ZZ, T.Z);
    fp2_mul(t, q.y, ZZZ);
    fp2_sub(theta, T.Y, t);
    fp2_mul(t, q.x, ZZ);
    fp2_sub(pi, T.X, t);
    fp2_mul(piZ, pi, T.Z);
    Fp2 LA, LB, LC;
    fp2_mul_by_fp(LA, piZ, yp);
    fp2_mul_by_xi(LA, LA);
    fp2_mul(LB, theta, q.x);
    fp2_mul(t, piZ, q.y);
    fp2_sub(LB, LB, t);
    fp2_mul_by_fp(LC, theta, xp);
    fp2_neg(LC, LC);
    fp12_mul_line(f, LA, LB, LC);
    // T = T + Q via the generic Jacobian add (Q lifted with Z = 1);
    // addition steps are rare (hamming(|z|) - 1 = 5 per loop).
    G2Jac qj;
    qj.X = q.x; qj.Y = q.y;
    qj.Z.c0 = ONE;
    memset(&qj.Z.c1, 0, sizeof(Fp));
    g2_add(T, T, qj);
}

// shared-squaring multi-pair Miller loop: ONE f^2 per bit serves every
// pair (the per-pair loops multiply into the same accumulator), matching
// gnark's MillerLoop([]G1, []G2).  Conjugated once at the end (z < 0).
struct MillerPair { G1Aff p; G2Aff q; G2Jac T; };

inline void miller_loop_multi(Fp12& f, MillerPair* cs, int n) {
    fp12_one(f);
    for (int i = 0; i < n; ++i) g2_from_aff(cs[i].T, cs[i].q);
    int top = 63;
    while (!((BLS_Z >> top) & 1)) --top;
    for (int b = top - 1; b >= 0; --b) {
        fp12_sqr(f, f);
        bool bit = (BLS_Z >> b) & 1;
        for (int i = 0; i < n; ++i) {
            miller_dbl_step(f, cs[i].T, cs[i].p.x, cs[i].p.y);
            if (bit)
                miller_add_step(f, cs[i].T, cs[i].q, cs[i].p.x, cs[i].p.y);
        }
    }
    Fp12 c;
    fp12_conj(c, f);
    f = c;
}

// final-exponentiation check: f^((p^12-1)/r) == 1, via the identity-tested
// decomposition 3d = (x+1)^2 (x+p)(x^2+p^2-1) + 3 (mirrors
// golden/pairing.py final_exp_is_one_fast; x = |z|).  All hard-part powers
// run on Granger-Scott cyclotomic squarings (valid after the easy part).
inline bool final_exp_is_one(const Fp12& fin) {
    // easy part: f^((p^6-1)(p^2+1)) = frob2(conj(f) * f^-1) * (conj(f) * f^-1)
    Fp12 fi, fc, f, t;
    fp12_inv(fi, fin);
    fp12_conj(fc, fin);
    fp12_mul(f, fc, fi);
    fp12_frobenius2(t, f);
    fp12_mul(f, t, f);
    // g = f^((x+1)^2)  (x+1 fits in a u64)
    Fp12 g;
    fp12_cyclo_pow_u64(g, f, BLS_Z + 1);
    fp12_cyclo_pow_u64(g, g, BLS_Z + 1);
    // h = conj(g^x) * frob(g)
    Fp12 gx, gxc, gf, h;
    fp12_cyclo_pow_u64(gx, g, BLS_Z);
    fp12_conj(gxc, gx);
    fp12_frobenius(gf, g);
    fp12_mul(h, gxc, gf);
    // k = h^(x^2) * frob2(h) * conj(h)
    Fp12 hx, hxx, hf2, hc, k;
    fp12_cyclo_pow_u64(hx, h, BLS_Z);
    fp12_cyclo_pow_u64(hxx, hx, BLS_Z);
    fp12_frobenius2(hf2, h);
    fp12_conj(hc, h);
    fp12_mul(k, hxx, hf2);
    fp12_mul(k, k, hc);
    // res = k * f^3
    Fp12 f2, f3, res;
    fp12_cyclo_sqr(f2, f);
    fp12_mul(f3, f2, f);
    fp12_mul(res, k, f3);
    return fp12_is_one(res);
}

// ----------------------------------------------------------- ABI helpers
inline void load_fp_mont(Fp& r, const u64* w) {
    Fp raw;
    memcpy(raw.v, w, 6 * 8);
    fp_to_mont(r, raw);
}

inline void store_fp_normal(u64* w, const Fp& a) {
    Fp n;
    fp_from_mont(n, a);
    memcpy(w, n.v, 6 * 8);
}

inline void load_g1(G1Aff& r, const u64* xy, uint8_t inf) {
    if (inf) { memset(&r, 0, sizeof(r)); r.inf = true; return; }
    load_fp_mont(r.x, xy);
    load_fp_mont(r.y, xy + 6);
    r.inf = false;
}

inline void store_g1(u64* xy, uint8_t* inf, const G1Aff& a) {
    if (a.inf) { memset(xy, 0, 12 * 8); *inf = 1; return; }
    store_fp_normal(xy, a.x);
    store_fp_normal(xy + 6, a.y);
    *inf = 0;
}

inline void load_g2(G2Aff& r, const u64* xy, uint8_t inf) {
    // layout: x.c0, x.c1, y.c0, y.c1 (6 words each)
    if (inf) { memset(&r, 0, sizeof(r)); r.inf = true; return; }
    load_fp_mont(r.x.c0, xy);
    load_fp_mont(r.x.c1, xy + 6);
    load_fp_mont(r.y.c0, xy + 12);
    load_fp_mont(r.y.c1, xy + 18);
    r.inf = false;
}

inline void store_g2(u64* xy, uint8_t* inf, const G2Aff& a) {
    if (a.inf) { memset(xy, 0, 24 * 8); *inf = 1; return; }
    store_fp_normal(xy, a.x.c0);
    store_fp_normal(xy + 6, a.x.c1);
    store_fp_normal(xy + 12, a.y.c0);
    store_fp_normal(xy + 18, a.y.c1);
    *inf = 0;
}

constexpr uint8_t FLAG_COMPRESSED = 0x80;
constexpr uint8_t FLAG_INFINITY = 0x40;
constexpr uint8_t FLAG_Y_LARGEST = 0x20;

// parse 48 big-endian bytes (with top-3 flag bits masked) into normal Fp words
inline void be48_to_words(const uint8_t* in, u64* w, uint8_t mask_top) {
    uint8_t buf[48];
    memcpy(buf, in, 48);
    buf[0] &= mask_top;
    for (int i = 0; i < 6; ++i) {
        u64 v = 0;
        for (int b = 0; b < 8; ++b)
            v = (v << 8) | buf[(5 - i) * 8 + b];
        w[i] = v;
    }
}

inline void words_to_be48(const u64* w, uint8_t* out) {
    for (int i = 0; i < 6; ++i) {
        u64 v = w[i];
        for (int b = 0; b < 8; ++b)
            out[(5 - i) * 8 + 7 - b] = (uint8_t)(v >> (8 * b));
    }
}

inline bool words_lt_p(const u64* w) {
    for (int i = 5; i >= 0; --i) {
        if (w[i] < P.v[i]) return true;
        if (w[i] > P.v[i]) return false;
    }
    return false;
}

}  // namespace

extern "C" {

// Batch G1 decompress.  in: count*48 bytes; out_xy: [count][12] u64 normal
// words (x then y); out_inf: [count] bytes.  check_subgroup: 0 = on-curve
// only (trusted-setup semantics), 1 = + subgroup check (wire semantics).
// Returns 0 on success, -1-i for the first invalid point i.
int kzg_g1_decompress_batch(const uint8_t* in, int64_t count,
                            int check_subgroup, u64* out_xy,
                            uint8_t* out_inf) {
    // b = 4 in Montgomery form
    Fp b4;
    {
        Fp raw = {{4, 0, 0, 0, 0, 0}};
        fp_to_mont(b4, raw);
    }
    for (int64_t i = 0; i < count; ++i) {
        const uint8_t* d = in + 48 * i;
        uint8_t flags = d[0];
        u64* oxy = out_xy + 12 * i;
        if (!(flags & FLAG_COMPRESSED)) return (int)(-1 - i);
        if (flags & FLAG_INFINITY) {
            if (flags != (FLAG_COMPRESSED | FLAG_INFINITY)) return (int)(-1 - i);
            bool nz = (d[0] & 0x1F) != 0;
            for (int k = 1; k < 48; ++k) nz |= d[k] != 0;
            if (nz) return (int)(-1 - i);
            memset(oxy, 0, 12 * 8);
            out_inf[i] = 1;
            continue;
        }
        u64 xw[6];
        be48_to_words(d, xw, 0x1F);
        if (!words_lt_p(xw)) return (int)(-1 - i);
        Fp x, x2, x3, y2, y;
        load_fp_mont(x, xw);
        fp_sqr(x2, x);
        fp_mul(x3, x2, x);
        fp_add(y2, x3, b4);
        if (!fp_sqrt(y, y2)) return (int)(-1 - i);
        // sign selection on the normal-form value
        Fp y_norm;
        fp_from_mont(y_norm, y);
        bool largest = fp_lex_largest_normal(y_norm);
        if (largest != ((flags & FLAG_Y_LARGEST) != 0)) fp_neg(y, y);
        G1Aff p = {x, y, false};
        if (check_subgroup && !g1_in_subgroup(p)) return (int)(-1 - i);
        store_fp_normal(oxy, x);
        store_fp_normal(oxy + 6, y);
        out_inf[i] = 0;
    }
    return 0;
}

// Batch G1 compress.  in_xy: [count][12] u64 normal words; in_inf: [count]
// bytes; out: count*48 bytes.
void kzg_g1_compress_batch(const u64* in_xy, const uint8_t* in_inf,
                           int64_t count, uint8_t* out) {
    for (int64_t i = 0; i < count; ++i) {
        uint8_t* o = out + 48 * i;
        if (in_inf[i]) {
            memset(o, 0, 48);
            o[0] = FLAG_COMPRESSED | FLAG_INFINITY;
            continue;
        }
        const u64* xy = in_xy + 12 * i;
        words_to_be48(xy, o);
        o[0] |= FLAG_COMPRESSED;
        Fp y;
        memcpy(y.v, xy + 6, 6 * 8);
        if (fp_lex_largest_normal(y)) o[0] |= FLAG_Y_LARGEST;
    }
}

// Batch standalone subgroup check on affine normal-word points (assumed on
// curve).  Returns 0 if all pass, -1-i for the first failure.
int kzg_g1_subgroup_check_batch(const u64* in_xy, const uint8_t* in_inf,
                                int64_t count) {
    for (int64_t i = 0; i < count; ++i) {
        G1Aff p;
        load_g1(p, in_xy + 12 * i, in_inf[i]);
        if (!g1_in_subgroup(p)) return (int)(-1 - i);
    }
    return 0;
}

// r = a + b (affine in/out, normal words)
void kzg_g1_add(const u64* a_xy, uint8_t a_inf, const u64* b_xy,
                uint8_t b_inf, u64* out_xy, uint8_t* out_inf) {
    G1Aff a, b, o;
    load_g1(a, a_xy, a_inf);
    load_g1(b, b_xy, b_inf);
    G1Jac ja, jb, jr;
    g1_from_aff(ja, a);
    g1_from_aff(jb, b);
    g1_add(jr, ja, jb);
    g1_to_aff(o, jr);
    store_g1(out_xy, out_inf, o);
}

// r = [k] p ; scalar k as 4 LE u64 words (256-bit)
void kzg_g1_scalar_mul(const u64* p_xy, uint8_t p_inf, const u64* k,
                       u64* out_xy, uint8_t* out_inf) {
    G1Aff p, o;
    load_g1(p, p_xy, p_inf);
    G1Jac jp, jr;
    g1_from_aff(jp, p);
    g1_scalar_mul(jr, jp, k, 4);
    g1_to_aff(o, jr);
    store_g1(out_xy, out_inf, o);
}

// Batched linear combination fold: out = sum_i [k_i] P_i (the host-side
// tail of batch verification for small batches; scalars [count][4] LE u64).
void kzg_g1_lincomb(const u64* p_xy, const uint8_t* p_inf, const u64* ks,
                    int64_t count, u64* out_xy, uint8_t* out_inf) {
    G1Jac acc;
    g1_set_inf(acc);
    for (int64_t i = 0; i < count; ++i) {
        G1Aff p;
        load_g1(p, p_xy + 12 * i, p_inf[i]);
        if (p.inf) continue;
        G1Jac jp, jk;
        g1_from_aff(jp, p);
        g1_scalar_mul(jk, jp, ks + 4 * i, 4);
        g1_add(acc, acc, jk);
    }
    G1Aff o;
    g1_to_aff(o, acc);
    store_g1(out_xy, out_inf, o);
}

void kzg_g2_add(const u64* a_xy, uint8_t a_inf, const u64* b_xy,
                uint8_t b_inf, u64* out_xy, uint8_t* out_inf) {
    G2Aff a, b, o;
    load_g2(a, a_xy, a_inf);
    load_g2(b, b_xy, b_inf);
    G2Jac ja, jb, jr;
    g2_from_aff(ja, a);
    g2_from_aff(jb, b);
    g2_add(jr, ja, jb);
    g2_to_aff(o, jr);
    store_g2(out_xy, out_inf, o);
}

void kzg_g2_scalar_mul(const u64* p_xy, uint8_t p_inf, const u64* k,
                       u64* out_xy, uint8_t* out_inf) {
    G2Aff p, o;
    load_g2(p, p_xy, p_inf);
    G2Jac jp, jr;
    g2_from_aff(jp, p);
    g2_scalar_mul(jr, jp, k, 4);
    g2_to_aff(o, jr);
    store_g2(out_xy, out_inf, o);
}

void kzg_g2_neg(const u64* p_xy, uint8_t p_inf, u64* out_xy,
                uint8_t* out_inf) {
    G2Aff p;
    load_g2(p, p_xy, p_inf);
    if (!p.inf) fp2_neg(p.y, p.y);
    store_g2(out_xy, out_inf, p);
}

// PairingCheck: prod_i e(P_i, Q_i) == 1 over `count` pairs (affine normal
// words; infinity pairs contribute the identity).  Returns 1 for success,
// 0 for failure.
int kzg_pairing_check(const u64* g1_xy, const uint8_t* g1_inf,
                      const u64* g2_xy, const uint8_t* g2_inf,
                      int64_t count) {
    // collect the non-infinity pairs, then run ONE shared-squaring loop
    MillerPair stack_cs[4];
    MillerPair* cs = count <= 4 ? stack_cs : new MillerPair[count];
    int n = 0;
    for (int64_t i = 0; i < count; ++i) {
        G1Aff p;
        G2Aff q;
        load_g1(p, g1_xy + 12 * i, g1_inf[i]);
        load_g2(q, g2_xy + 24 * i, g2_inf[i]);
        if (p.inf || q.inf) continue;
        cs[n].p = p;
        cs[n].q = q;
        ++n;
    }
    int ok = 1;
    if (n > 0) {
        Fp12 f;
        miller_loop_multi(f, cs, n);
        ok = final_exp_is_one(f) ? 1 : 0;
    }
    if (cs != stack_cs) delete[] cs;
    return ok;
}

}  // extern "C"
