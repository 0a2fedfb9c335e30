// Native host-side runtime for goethkzg_tpu: wire codecs + Fiat-Shamir.
//
// The TPU-native analog of the reference's native tier (gnark-crypto's
// assembly field kernels feed its byte-level paths; here the device kernels
// do the field math and this library does the byte-level hot paths):
//
//  * blob/cell deserialization: big-endian 32-byte scalars -> little-endian
//    16-bit limb arrays with the canonical (< r) check
//    (reference: serialization.go:134-159, DeserializeBlob is a benched
//    hot path, bench_test.go:126-146);
//  * serialization back to wire bytes;
//  * the Fiat-Shamir challenge hash: SHA-256 over
//    DOM_SEP ++ u64_16bytes(4096) ++ blob ++ commitment, with batched
//    variant for batch verification (reference: fiatshamir.go:22-40).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).
// Build: make -C native  (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <cstddef>

namespace {

// BLS12-381 scalar-field modulus r as 16 big-endian 16-bit words.
constexpr uint16_t R_WORDS_BE[16] = {
    0x73ed, 0xa753, 0x299d, 0x7d48, 0x3339, 0xd808, 0x09a1, 0xd805,
    0x53bd, 0xa402, 0xfffe, 0x5bfe, 0xffff, 0xffff, 0x0000, 0x0001,
};

inline bool scalar_canonical_and_decode(const uint8_t* in, uint32_t* out16) {
    // big-endian bytes -> 16 BE words; compare lexicographically against r;
    // write little-endian limb order.
    uint16_t w[16];
    for (int k = 0; k < 16; ++k)
        w[k] = (uint16_t)((in[2 * k] << 8) | in[2 * k + 1]);
    bool lt = false, eq = true;
    for (int k = 0; k < 16; ++k) {
        if (eq && w[k] < R_WORDS_BE[k]) { lt = true; eq = false; }
        else if (eq && w[k] > R_WORDS_BE[k]) { eq = false; }
    }
    if (!lt) return false;
    for (int k = 0; k < 16; ++k)
        out16[k] = w[15 - k];
    return true;
}

// ---------------------------------------------------------------- SHA-256
struct Sha256 {
    uint32_t h[8];
    uint64_t len;
    uint8_t buf[64];
    size_t buflen;

    static constexpr uint32_t K[64] = {
        0x428a2f98,0x71374491,0xb5c0fbcf,0xe9b5dba5,0x3956c25b,0x59f111f1,
        0x923f82a4,0xab1c5ed5,0xd807aa98,0x12835b01,0x243185be,0x550c7dc3,
        0x72be5d74,0x80deb1fe,0x9bdc06a7,0xc19bf174,0xe49b69c1,0xefbe4786,
        0x0fc19dc6,0x240ca1cc,0x2de92c6f,0x4a7484aa,0x5cb0a9dc,0x76f988da,
        0x983e5152,0xa831c66d,0xb00327c8,0xbf597fc7,0xc6e00bf3,0xd5a79147,
        0x06ca6351,0x14292967,0x27b70a85,0x2e1b2138,0x4d2c6dfc,0x53380d13,
        0x650a7354,0x766a0abb,0x81c2c92e,0x92722c85,0xa2bfe8a1,0xa81a664b,
        0xc24b8b70,0xc76c51a3,0xd192e819,0xd6990624,0xf40e3585,0x106aa070,
        0x19a4c116,0x1e376c08,0x2748774c,0x34b0bcb5,0x391c0cb3,0x4ed8aa4a,
        0x5b9cca4f,0x682e6ff3,0x748f82ee,0x78a5636f,0x84c87814,0x8cc70208,
        0x90befffa,0xa4506ceb,0xbef9a3f7,0xc67178f2,
    };

    void init() {
        static const uint32_t H0[8] = {
            0x6a09e667,0xbb67ae85,0x3c6ef372,0xa54ff53a,
            0x510e527f,0x9b05688c,0x1f83d9ab,0x5be0cd19};
        memcpy(h, H0, sizeof(h));
        len = 0; buflen = 0;
    }

    static inline uint32_t rotr(uint32_t x, int n) {
        return (x >> n) | (x << (32 - n));
    }

    void block(const uint8_t* p) {
        uint32_t w[64];
        for (int i = 0; i < 16; ++i)
            w[i] = (uint32_t(p[4*i]) << 24) | (uint32_t(p[4*i+1]) << 16) |
                   (uint32_t(p[4*i+2]) << 8) | uint32_t(p[4*i+3]);
        for (int i = 16; i < 64; ++i) {
            uint32_t s0 = rotr(w[i-15],7) ^ rotr(w[i-15],18) ^ (w[i-15] >> 3);
            uint32_t s1 = rotr(w[i-2],17) ^ rotr(w[i-2],19) ^ (w[i-2] >> 10);
            w[i] = w[i-16] + s0 + w[i-7] + s1;
        }
        uint32_t a=h[0],b=h[1],c=h[2],d=h[3],e=h[4],f=h[5],g=h[6],hh=h[7];
        for (int i = 0; i < 64; ++i) {
            uint32_t S1 = rotr(e,6) ^ rotr(e,11) ^ rotr(e,25);
            uint32_t ch = (e & f) ^ (~e & g);
            uint32_t t1 = hh + S1 + ch + K[i] + w[i];
            uint32_t S0 = rotr(a,2) ^ rotr(a,13) ^ rotr(a,22);
            uint32_t mj = (a & b) ^ (a & c) ^ (b & c);
            uint32_t t2 = S0 + mj;
            hh=g; g=f; f=e; e=d+t1; d=c; c=b; b=a; a=t1+t2;
        }
        h[0]+=a; h[1]+=b; h[2]+=c; h[3]+=d; h[4]+=e; h[5]+=f; h[6]+=g; h[7]+=hh;
    }

    void update(const uint8_t* p, size_t n) {
        len += n;
        if (buflen) {
            size_t take = 64 - buflen;
            if (take > n) take = n;
            memcpy(buf + buflen, p, take);
            buflen += take; p += take; n -= take;
            if (buflen == 64) { block(buf); buflen = 0; }
        }
        while (n >= 64) { block(p); p += 64; n -= 64; }
        if (n) { memcpy(buf, p, n); buflen = n; }
    }

    void final(uint8_t out[32]) {
        uint64_t bits = len * 8;
        uint8_t pad = 0x80;
        update(&pad, 1);
        uint8_t z = 0;
        while (buflen != 56) update(&z, 1);
        uint8_t lb[8];
        for (int i = 0; i < 8; ++i) lb[i] = (uint8_t)(bits >> (56 - 8*i));
        update(lb, 8);
        for (int i = 0; i < 8; ++i) {
            out[4*i]   = (uint8_t)(h[i] >> 24);
            out[4*i+1] = (uint8_t)(h[i] >> 16);
            out[4*i+2] = (uint8_t)(h[i] >> 8);
            out[4*i+3] = (uint8_t)(h[i]);
        }
    }
};

constexpr uint32_t Sha256::K[64];

}  // namespace

extern "C" {

// Decode `count` big-endian 32-byte scalars into [count, 16] LE uint32
// limbs with canonicality checks.  Returns -1 - i (index of the first
// offending scalar) on a non-canonical scalar, 0 on success.
int kzg_scalars_to_limbs(const uint8_t* in, int64_t count, uint32_t* out) {
    for (int64_t i = 0; i < count; ++i) {
        if (!scalar_canonical_and_decode(in + 32 * i, out + 16 * i))
            return (int)(-1 - i);
    }
    return 0;
}

// Encode [count, 16] LE uint32 limbs (each < 2^16) into big-endian
// 32-byte scalars.
void kzg_limbs_to_scalars(const uint32_t* in, int64_t count, uint8_t* out) {
    for (int64_t i = 0; i < count; ++i) {
        const uint32_t* limbs = in + 16 * i;
        uint8_t* p = out + 32 * i;
        for (int k = 0; k < 16; ++k) {
            uint32_t w = limbs[15 - k];
            p[2 * k] = (uint8_t)(w >> 8);
            p[2 * k + 1] = (uint8_t)(w & 0xFF);
        }
    }
}

// Fiat-Shamir challenge digests for a batch: for each i,
// digest_i = SHA256(dom_sep[16] ++ u64_16be(poly_degree) ++ blob_i ++ comm_i).
// blobs: count*blob_len bytes, comms: count*48 bytes, out: count*32 bytes.
void kzg_compute_challenges(const uint8_t* dom_sep, uint64_t poly_degree,
                            const uint8_t* blobs, int64_t blob_len,
                            const uint8_t* comms, int64_t count,
                            uint8_t* out) {
    uint8_t hdr[16] = {0};
    for (int i = 0; i < 8; ++i)
        hdr[8 + i] = (uint8_t)(poly_degree >> (56 - 8 * i));
    for (int64_t i = 0; i < count; ++i) {
        Sha256 s;
        s.init();
        s.update(dom_sep, 16);
        s.update(hdr, 16);
        s.update(blobs + i * blob_len, (size_t)blob_len);
        s.update(comms + i * 48, 48);
        s.final(out + 32 * i);
    }
}

}  // extern "C"
