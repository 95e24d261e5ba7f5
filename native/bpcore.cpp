// bpcore: native host runtime for mpc-bulletproof-tpu.
//
// The reference's performance-critical host components live in native Rust
// crates (mpc-stark algebra, merlin keccak — SURVEY.md §2.4).  This C++
// library is their counterpart for the host side of this framework: STARK
// base-field Montgomery arithmetic, Jacobian curve arithmetic, Pippenger
// MSM, IPP generator folds, fixed-base generator derivation, and keccak256.
// The TPU kernels remain the primary compute path; this backend accelerates
// host-resident work (transcript hashing, generator setup, and the host
// fallback prover) ~100x over pure Python.
//
// ABI: all field elements cross the boundary as 32-byte little-endian
// buffers; points as (x, y, infinity_flag).  Build: `make -C native`.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>
#include <thread>
#include <mutex>
#include <functional>
#include <condition_variable>
#include <atomic>

typedef unsigned __int128 u128;
typedef uint64_t u64;
typedef uint8_t u8;
typedef uint32_t u32;

// ---------------------------------------------------------------------------
// 4x64 field element, Montgomery form, modulus = STARK prime P
// ---------------------------------------------------------------------------

struct Fp { u64 v[4]; };

static const Fp P_MOD   = {{0x1ULL, 0x0ULL, 0x0ULL, 0x0800000000000011ULL}};
static const u64 P_INV  = 0xffffffffffffffffULL;  // -P^{-1} mod 2^64
static const Fp P_R2    = {{0xfffffd737e000401ULL, 0x1330fffffULL,
                            0xffffffffff6f8000ULL, 0x07ffd4ab5e008810ULL}};
static const Fp FP_ONE  = {{0xffffffffffffffe1ULL, 0xffffffffffffffffULL,
                            0xffffffffffffffffULL, 0x07fffffffffffdf0ULL}};
static const Fp FP_ZEROV = {{0, 0, 0, 0}};
// curve b (Montgomery form); a = 1 (Montgomery form == FP_ONE)
static const Fp B_MONT  = {{0x359ddd67b59a21caULL, 0x6725f2237aab9006ULL,
                            0xab8a1e002a41f947ULL, 0x013931651774247fULL}};

static inline bool fp_is_zero(const Fp &a) {
    return (a.v[0] | a.v[1] | a.v[2] | a.v[3]) == 0;
}

static inline bool fp_eq(const Fp &a, const Fp &b) {
    return a.v[0] == b.v[0] && a.v[1] == b.v[1] && a.v[2] == b.v[2] && a.v[3] == b.v[3];
}

static inline bool geq_mod(const Fp &a, const Fp &m) {
    for (int i = 3; i >= 0; --i) {
        if (a.v[i] > m.v[i]) return true;
        if (a.v[i] < m.v[i]) return false;
    }
    return true;
}

static inline void sub_mod_raw(Fp &a, const Fp &m) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a.v[i] - m.v[i] - borrow;
        a.v[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
}

static inline void fp_add(Fp &out, const Fp &a, const Fp &b) {
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
        u128 s = (u128)a.v[i] + b.v[i] + carry;
        out.v[i] = (u64)s;
        carry = s >> 64;
    }
    if (carry || geq_mod(out, P_MOD)) sub_mod_raw(out, P_MOD);
}

static inline void fp_sub(Fp &out, const Fp &a, const Fp &b) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a.v[i] - b.v[i] - borrow;
        out.v[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < 4; ++i) {
            u128 s = (u128)out.v[i] + P_MOD.v[i] + carry;
            out.v[i] = (u64)s;
            carry = s >> 64;
        }
    }
}

// Montgomery multiplication (CIOS, 4 limbs).
static void fp_mul(Fp &out, const Fp &a, const Fp &b) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; ++i) {
        u128 carry = 0;
        for (int j = 0; j < 4; ++j) {
            u128 cur = (u128)t[j] + (u128)a.v[i] * b.v[j] + carry;
            t[j] = (u64)cur;
            carry = cur >> 64;
        }
        u128 cur = (u128)t[4] + carry;
        t[4] = (u64)cur;
        t[5] = (u64)(cur >> 64);

        u64 m = t[0] * P_INV;
        carry = ((u128)t[0] + (u128)m * P_MOD.v[0]) >> 64;
        for (int j = 1; j < 4; ++j) {
            u128 c2 = (u128)t[j] + (u128)m * P_MOD.v[j] + carry;
            t[j - 1] = (u64)c2;
            carry = c2 >> 64;
        }
        cur = (u128)t[4] + carry;
        t[3] = (u64)cur;
        t[4] = t[5] + (u64)(cur >> 64);
        t[5] = 0;
    }
    out.v[0] = t[0]; out.v[1] = t[1]; out.v[2] = t[2]; out.v[3] = t[3];
    if (t[4] || geq_mod(out, P_MOD)) sub_mod_raw(out, P_MOD);
}

static inline void fp_sqr(Fp &out, const Fp &a) { fp_mul(out, a, a); }

static inline void fp_dbl(Fp &out, const Fp &a) { fp_add(out, a, a); }

static void fp_from_bytes(Fp &out, const u8 *le32) {
    Fp raw;
    memcpy(raw.v, le32, 32);
    fp_mul(out, raw, P_R2);  // into Montgomery form
}

static void fp_to_bytes(u8 *le32, const Fp &a) {
    Fp one_raw = {{1, 0, 0, 0}};
    Fp std_form;
    fp_mul(std_form, a, one_raw);  // out of Montgomery form
    memcpy(le32, std_form.v, 32);
}

// a^(P-2) by square-and-multiply (exponent scanned from raw P-2 bytes).
static void fp_inv(Fp &out, const Fp &a) {
    // P - 2
    static const u64 e[4] = {0xffffffffffffffffULL, 0xffffffffffffffffULL,
                             0xffffffffffffffffULL, 0x0800000000000010ULL};
    Fp result = FP_ONE, base = a;
    for (int limb = 0; limb < 4; ++limb) {
        u64 bits = e[limb];
        for (int i = 0; i < 64; ++i) {
            if (bits & 1) { Fp tmp; fp_mul(tmp, result, base); result = tmp; }
            bits >>= 1;
            if (limb == 3 && bits == 0) break;
            Fp sq; fp_sqr(sq, base); base = sq;
        }
    }
    out = result;
}

// ---------------------------------------------------------------------------
// Jacobian curve arithmetic: y^2 = x^3 + a x + b, a = 1
// ---------------------------------------------------------------------------

struct Pt { Fp X, Y, Z; };  // Z == 0 -> identity

static const Pt PT_IDENT = {{{0, 0, 0, 0}}, {{0, 0, 0, 0}}, {{0, 0, 0, 0}}};

static inline bool pt_is_ident(const Pt &p) { return fp_is_zero(p.Z); }

static void pt_dbl(Pt &out, const Pt &p) {
    if (pt_is_ident(p) || fp_is_zero(p.Y)) { out = PT_IDENT; return; }
    Fp XX, YY, YYYY, ZZ, S, M, T, t0, t1;
    fp_sqr(XX, p.X);
    fp_sqr(YY, p.Y);
    fp_sqr(YYYY, YY);
    fp_sqr(ZZ, p.Z);
    // S = 2*((X+YY)^2 - XX - YYYY)
    fp_add(t0, p.X, YY); fp_sqr(t0, t0); fp_sub(t0, t0, XX); fp_sub(t0, t0, YYYY);
    fp_dbl(S, t0);
    // M = 3*XX + a*ZZ^2  (a = 1)
    fp_dbl(t0, XX); fp_add(t0, t0, XX);
    fp_sqr(t1, ZZ); fp_mul(t1, t1, FP_ONE);
    fp_add(M, t0, t1);
    // T = M^2 - 2S
    fp_sqr(T, M); fp_sub(T, T, S); fp_sub(T, T, S);
    out.X = T;
    // Y3 = M*(S - T) - 8*YYYY
    fp_sub(t0, S, T); fp_mul(t0, M, t0);
    fp_dbl(t1, YYYY); fp_dbl(t1, t1); fp_dbl(t1, t1);
    fp_sub(out.Y, t0, t1);
    // Z3 = (Y + Z)^2 - YY - ZZ
    fp_add(t0, p.Y, p.Z); fp_sqr(t0, t0); fp_sub(t0, t0, YY); fp_sub(out.Z, t0, ZZ);
}

static void pt_add(Pt &out, const Pt &p, const Pt &q) {
    if (pt_is_ident(p)) { out = q; return; }
    if (pt_is_ident(q)) { out = p; return; }
    Fp Z1Z1, Z2Z2, U1, U2, S1, S2, t0;
    fp_sqr(Z1Z1, p.Z);
    fp_sqr(Z2Z2, q.Z);
    fp_mul(U1, p.X, Z2Z2);
    fp_mul(U2, q.X, Z1Z1);
    fp_mul(t0, p.Y, q.Z); fp_mul(S1, t0, Z2Z2);
    fp_mul(t0, q.Y, p.Z); fp_mul(S2, t0, Z1Z1);
    if (fp_eq(U1, U2)) {
        if (!fp_eq(S1, S2)) { out = PT_IDENT; return; }
        pt_dbl(out, p);
        return;
    }
    Fp H, I, J, rr, V, t1;
    fp_sub(H, U2, U1);
    fp_dbl(I, H); fp_sqr(I, I);
    fp_mul(J, H, I);
    fp_sub(rr, S2, S1); fp_dbl(rr, rr);
    fp_mul(V, U1, I);
    // X3 = rr^2 - J - 2V
    fp_sqr(t0, rr); fp_sub(t0, t0, J); fp_sub(t0, t0, V); fp_sub(out.X, t0, V);
    // Y3 = rr*(V - X3) - 2*S1*J
    fp_sub(t0, V, out.X); fp_mul(t0, rr, t0);
    fp_mul(t1, S1, J); fp_dbl(t1, t1);
    fp_sub(out.Y, t0, t1);
    // Z3 = ((Z1 + Z2)^2 - Z1Z1 - Z2Z2) * H
    fp_add(t0, p.Z, q.Z); fp_sqr(t0, t0); fp_sub(t0, t0, Z1Z1); fp_sub(t0, t0, Z2Z2);
    fp_mul(out.Z, t0, H);
}

// Mixed addition: q is affine (implicit Z = 1, in Montgomery form).
static void pt_add_mixed(Pt &out, const Pt &p, const Fp &qx, const Fp &qy) {
    if (pt_is_ident(p)) { out.X = qx; out.Y = qy; out.Z = FP_ONE; return; }
    Fp Z1Z1, U2, S2, t0;
    fp_sqr(Z1Z1, p.Z);
    fp_mul(U2, qx, Z1Z1);
    fp_mul(t0, qy, p.Z); fp_mul(S2, t0, Z1Z1);
    if (fp_eq(p.X, U2)) {
        if (!fp_eq(p.Y, S2)) { out = PT_IDENT; return; }
        pt_dbl(out, p);
        return;
    }
    // madd-2007-bl
    Fp H, HH, I, J, rr, V, t1;
    fp_sub(H, U2, p.X);
    fp_sqr(HH, H);
    fp_dbl(I, HH); fp_dbl(I, I);
    fp_mul(J, H, I);
    fp_sub(rr, S2, p.Y); fp_dbl(rr, rr);
    fp_mul(V, p.X, I);
    fp_sqr(t0, rr); fp_sub(t0, t0, J); fp_sub(t0, t0, V); fp_sub(out.X, t0, V);
    fp_sub(t0, V, out.X); fp_mul(t0, rr, t0);
    fp_mul(t1, p.Y, J); fp_dbl(t1, t1);
    fp_sub(out.Y, t0, t1);
    fp_add(t0, p.Z, H); fp_sqr(t0, t0); fp_sub(t0, t0, Z1Z1); fp_sub(out.Z, t0, HH);
}

static inline void pt_neg(Pt &out, const Pt &p) {
    out = p;
    if (!pt_is_ident(p)) fp_sub(out.Y, FP_ZEROV, p.Y);
}

static void pt_from_affine(Pt &out, const u8 *x_le, const u8 *y_le, u8 inf) {
    if (inf) { out = PT_IDENT; return; }
    fp_from_bytes(out.X, x_le);
    fp_from_bytes(out.Y, y_le);
    out.Z = FP_ONE;
}

static void pt_to_affine(u8 *x_le, u8 *y_le, u8 *inf, const Pt &p) {
    if (pt_is_ident(p)) {
        memset(x_le, 0, 32); memset(y_le, 0, 32); *inf = 1;
        return;
    }
    Fp zinv, zinv2, zinv3, xa, ya;
    fp_inv(zinv, p.Z);
    fp_sqr(zinv2, zinv);
    fp_mul(zinv3, zinv2, zinv);
    fp_mul(xa, p.X, zinv2);
    fp_mul(ya, p.Y, zinv3);
    fp_to_bytes(x_le, xa);
    fp_to_bytes(y_le, ya);
    *inf = 0;
}

// Batch affine conversion with one inversion (Montgomery's trick).
static void pt_to_affine_batch(u8 *xs, u8 *ys, u8 *inf, const Pt *pts, size_t n) {
    std::vector<Fp> prefix(n);
    Fp acc = FP_ONE;
    for (size_t i = 0; i < n; ++i) {
        prefix[i] = acc;
        if (!pt_is_ident(pts[i])) { Fp t; fp_mul(t, acc, pts[i].Z); acc = t; }
    }
    Fp inv_acc;
    fp_inv(inv_acc, acc);
    for (size_t idx = n; idx-- > 0;) {
        if (pt_is_ident(pts[idx])) {
            memset(xs + 32 * idx, 0, 32); memset(ys + 32 * idx, 0, 32); inf[idx] = 1;
            continue;
        }
        Fp zinv, t;
        fp_mul(zinv, inv_acc, prefix[idx]);
        fp_mul(t, inv_acc, pts[idx].Z); inv_acc = t;
        Fp zinv2, zinv3, xa, ya;
        fp_sqr(zinv2, zinv); fp_mul(zinv3, zinv2, zinv);
        fp_mul(xa, pts[idx].X, zinv2);
        fp_mul(ya, pts[idx].Y, zinv3);
        fp_to_bytes(xs + 32 * idx, xa);
        fp_to_bytes(ys + 32 * idx, ya);
        inf[idx] = 0;
    }
}

// ---------------------------------------------------------------------------
// scalar helpers (raw 256-bit little-endian, no field ops needed)
// ---------------------------------------------------------------------------

static inline int scalar_bit(const u8 *s, int bit) {
    return (s[bit >> 3] >> (bit & 7)) & 1;
}

static inline u64 scalar_window(const u8 *s, int start_bit, int width) {
    // width <= 16: one unaligned little-endian load covers the window
    // ((start&7) + width <= 23 bits); clamped near the 32-byte tail.
    int byte = start_bit >> 3;
    if (byte >= 32) return 0;
    u64 w;
    if (byte <= 24) {
        memcpy(&w, s + byte, 8);
    } else {
        w = 0;
        memcpy(&w, s + byte, 32 - byte);
    }
    return (w >> (start_bit & 7)) & (((u64)1 << width) - 1);
}

// ---------------------------------------------------------------------------
// exported API
// ---------------------------------------------------------------------------

extern "C" {

// ---- keccak256 (original padding 0x01) ----
static const u64 KECCAK_RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL,
};
static const int KECCAK_ROT[5][5] = {
    {0, 36, 3, 41, 18}, {1, 44, 10, 45, 2}, {62, 6, 43, 15, 61},
    {28, 55, 25, 21, 56}, {27, 20, 39, 8, 14},
};

static inline u64 rol64(u64 x, int s) { return s ? (x << s) | (x >> (64 - s)) : x; }

static void keccak_f(u64 st[25]) {
    // Flattened round: state in registers, theta/rho/pi/chi fused per round
    // (the rolled 5x5 loops kept the state in a churned stack array and the
    // modulo indexing defeated the optimizer — measured 2.6us/permutation;
    // this form is ~0.4us).  Transcript hashing is ~50 permutations per
    // proof verification, so this is on the verify critical path.
    u64 a00 = st[0], a01 = st[1], a02 = st[2], a03 = st[3], a04 = st[4];
    u64 a05 = st[5], a06 = st[6], a07 = st[7], a08 = st[8], a09 = st[9];
    u64 a10 = st[10], a11 = st[11], a12 = st[12], a13 = st[13], a14 = st[14];
    u64 a15 = st[15], a16 = st[16], a17 = st[17], a18 = st[18], a19 = st[19];
    u64 a20 = st[20], a21 = st[21], a22 = st[22], a23 = st[23], a24 = st[24];
    for (int round = 0; round < 24; ++round) {
        // theta
        u64 c0 = a00 ^ a05 ^ a10 ^ a15 ^ a20;
        u64 c1 = a01 ^ a06 ^ a11 ^ a16 ^ a21;
        u64 c2 = a02 ^ a07 ^ a12 ^ a17 ^ a22;
        u64 c3 = a03 ^ a08 ^ a13 ^ a18 ^ a23;
        u64 c4 = a04 ^ a09 ^ a14 ^ a19 ^ a24;
        u64 d0 = c4 ^ rol64(c1, 1);
        u64 d1 = c0 ^ rol64(c2, 1);
        u64 d2 = c1 ^ rol64(c3, 1);
        u64 d3 = c2 ^ rol64(c4, 1);
        u64 d4 = c3 ^ rol64(c0, 1);
        a00 ^= d0; a05 ^= d0; a10 ^= d0; a15 ^= d0; a20 ^= d0;
        a01 ^= d1; a06 ^= d1; a11 ^= d1; a16 ^= d1; a21 ^= d1;
        a02 ^= d2; a07 ^= d2; a12 ^= d2; a17 ^= d2; a22 ^= d2;
        a03 ^= d3; a08 ^= d3; a13 ^= d3; a18 ^= d3; a23 ^= d3;
        a04 ^= d4; a09 ^= d4; a14 ^= d4; a19 ^= d4; a24 ^= d4;
        // rho + pi: b[y + 5*((2x+3y)%5)] = rol(a[x + 5y], ROT[x][y])
        u64 b00 = a00;
        u64 b10 = rol64(a01, 1);
        u64 b20 = rol64(a02, 62);
        u64 b05 = rol64(a03, 28);
        u64 b15 = rol64(a04, 27);
        u64 b16 = rol64(a05, 36);
        u64 b01 = rol64(a06, 44);
        u64 b11 = rol64(a07, 6);
        u64 b21 = rol64(a08, 55);
        u64 b06 = rol64(a09, 20);
        u64 b07 = rol64(a10, 3);
        u64 b17 = rol64(a11, 10);
        u64 b02 = rol64(a12, 43);
        u64 b12 = rol64(a13, 25);
        u64 b22 = rol64(a14, 39);
        u64 b23 = rol64(a15, 41);
        u64 b08 = rol64(a16, 45);
        u64 b18 = rol64(a17, 15);
        u64 b03 = rol64(a18, 21);
        u64 b13 = rol64(a19, 8);
        u64 b14 = rol64(a20, 18);
        u64 b24 = rol64(a21, 2);
        u64 b09 = rol64(a22, 61);
        u64 b19 = rol64(a23, 56);
        u64 b04 = rol64(a24, 14);
        // chi
        a00 = b00 ^ ((~b01) & b02); a01 = b01 ^ ((~b02) & b03);
        a02 = b02 ^ ((~b03) & b04); a03 = b03 ^ ((~b04) & b00);
        a04 = b04 ^ ((~b00) & b01);
        a05 = b05 ^ ((~b06) & b07); a06 = b06 ^ ((~b07) & b08);
        a07 = b07 ^ ((~b08) & b09); a08 = b08 ^ ((~b09) & b05);
        a09 = b09 ^ ((~b05) & b06);
        a10 = b10 ^ ((~b11) & b12); a11 = b11 ^ ((~b12) & b13);
        a12 = b12 ^ ((~b13) & b14); a13 = b13 ^ ((~b14) & b10);
        a14 = b14 ^ ((~b10) & b11);
        a15 = b15 ^ ((~b16) & b17); a16 = b16 ^ ((~b17) & b18);
        a17 = b17 ^ ((~b18) & b19); a18 = b18 ^ ((~b19) & b15);
        a19 = b19 ^ ((~b15) & b16);
        a20 = b20 ^ ((~b21) & b22); a21 = b21 ^ ((~b22) & b23);
        a22 = b22 ^ ((~b23) & b24); a23 = b23 ^ ((~b24) & b20);
        a24 = b24 ^ ((~b20) & b21);
        // iota
        a00 ^= KECCAK_RC[round];
    }
    st[0] = a00; st[1] = a01; st[2] = a02; st[3] = a03; st[4] = a04;
    st[5] = a05; st[6] = a06; st[7] = a07; st[8] = a08; st[9] = a09;
    st[10] = a10; st[11] = a11; st[12] = a12; st[13] = a13; st[14] = a14;
    st[15] = a15; st[16] = a16; st[17] = a17; st[18] = a18; st[19] = a19;
    st[20] = a20; st[21] = a21; st[22] = a22; st[23] = a23; st[24] = a24;
}

void bp_keccak256(const u8 *data, size_t len, u8 out[32]) {
    u64 st[25] = {0};
    const size_t rate = 136;
    size_t off = 0;
    while (len - off >= rate) {
        for (size_t i = 0; i < rate / 8; ++i) {
            u64 w; memcpy(&w, data + off + 8 * i, 8);
            st[i] ^= w;
        }
        keccak_f(st);
        off += rate;
    }
    u8 block[136] = {0};
    memcpy(block, data + off, len - off);
    block[len - off] ^= 0x01;
    block[rate - 1] ^= 0x80;
    for (size_t i = 0; i < rate / 8; ++i) {
        u64 w; memcpy(&w, block + 8 * i, 8);
        st[i] ^= w;
    }
    keccak_f(st);
    memcpy(out, st, 32);
}


// ---- persistent worker pool (thread spawn costs ~30us; tiny MSMs and
// per-party kernels would otherwise pay it dozens of times per proof) ----

struct WorkPool {
    // Serializes whole run() calls: two application threads (e.g. both MPC
    // parties proving in one process) may issue pool MSMs concurrently;
    // without this the second caller clobbers fn/total/next/done mid-batch
    // — corrupted results (MAC-check failures) or a lost completion signal
    // (both parties futex-parked forever).
    std::mutex run_mu;
    std::mutex mu;
    std::condition_variable cv_work, cv_done;
    const std::function<void(size_t)> *fn = nullptr;
    std::atomic<size_t> next{0};
    std::atomic<size_t> done{0};
    size_t total = 0;
    // Workers currently between capturing fn (under mu) and finishing
    // drain().  run() waits for this to hit zero in addition to
    // done==total: a straggler that woke for batch N but was descheduled
    // before claiming an item would otherwise outlive run(), then claim
    // item 0 of batch N+1 through a dangling std::function pointer.
    size_t active = 0;
    u64 epoch = 0;
    bool stop = false;
    std::vector<std::thread> ths;

    WorkPool() {
        unsigned hw = std::thread::hardware_concurrency();
        int n = hw ? (int)hw : 1;
        // the calling thread participates, so keep hw-1 workers
        for (int i = 0; i < n - 1; ++i) ths.emplace_back([this] { loop(); });
    }
    ~WorkPool() {
        {
            std::lock_guard<std::mutex> lk(mu);
            stop = true;
        }
        cv_work.notify_all();
        for (auto &t : ths) t.join();
    }
    void drain(const std::function<void(size_t)> *f) {
        size_t n_done = 0;
        for (size_t i = next.fetch_add(1); i < total; i = next.fetch_add(1)) {
            (*f)(i);
            ++n_done;
        }
        if (n_done && done.fetch_add(n_done) + n_done == total) {
            std::lock_guard<std::mutex> lk(mu);
            cv_done.notify_all();
        }
    }
    void loop() {
        u64 seen = 0;
        for (;;) {
            const std::function<void(size_t)> *f;
            {
                std::unique_lock<std::mutex> lk(mu);
                cv_work.wait(lk, [&] { return stop || epoch != seen; });
                if (stop) return;
                seen = epoch;
                f = fn;
                ++active;  // counted before mu is released: run() cannot
                           // return while this worker may still touch state
            }
            drain(f);
            {
                std::lock_guard<std::mutex> lk(mu);
                if (--active == 0) cv_done.notify_all();
            }
        }
    }
    // Completion counts finished ITEMS plus quiesced WORKERS: run() returns
    // only once every item ran AND no woken worker can still hold a pointer
    // into this batch, so the next run() can safely reset fn/total/next.
    void run(size_t n_items, const std::function<void(size_t)> &f) {
        std::lock_guard<std::mutex> run_lk(run_mu);
        {
            std::lock_guard<std::mutex> lk(mu);
            fn = &f;
            total = n_items;
            next.store(0);
            done.store(0);
            ++epoch;
        }
        cv_work.notify_all();
        drain(&f);  // the caller works too
        std::unique_lock<std::mutex> lk(mu);
        cv_done.wait(lk, [&] { return done.load() == total && active == 0; });
    }
};

static thread_local bool g_in_pool = false;

// Mega-check thread scaling: one worker per this many MSM points.  At 4x
// split expansion an m=1 rangeproof mega-check is ~550 points -> 2 threads
// (measured on the 4-core AVX-512 bench box: 1 thread 1.43/1.57 ms
// min/med, 2 threads 1.07/1.12, 4 threads 1.11/1.18 with p90 1.73 —
// full fan-out only adds scheduling jitter at this size), m=64 is ~33k
// points -> all cores.  OPTIMIZATIONS.md round-4 "thresholds".
#ifndef BP_MEGA_WORK_PER_THREAD
#define BP_MEGA_WORK_PER_THREAD 256
#endif

// parallel_for: run fn(0..n-1) on the pool; serial when nested or tiny.
static void parallel_for(size_t n, int max_threads,
                         const std::function<void(size_t)> &fn) {
    static WorkPool *pool = new WorkPool();  // leaked: workers live for the process
    if (n == 0) return;
    if (g_in_pool || n == 1 || max_threads <= 1) {
        for (size_t i = 0; i < n; ++i) fn(i);
        return;
    }
    auto wrapped = [&fn](size_t i) {
        g_in_pool = true;
        fn(i);
        g_in_pool = false;
    };
    pool->run(n, wrapped);
}

// ---- Pippenger MSM (mixed bucket adds, threaded windows) ----

struct AffinePt { Fp x, y; u8 inf; };

// ---------------------------------------------------------------------------
// AVX-512 IFMA 8-way bucket engine
//
// Field elements in radix-2^52 (5 limbs), Montgomery domain R = 2^260,
// eight independent elements per __m512i limb-slice.  The Pippenger bucket
// and reduction phases run 8 windows in lockstep: one broadcast affine
// point, eight independent bucket chains (vpmadd52 does 8 52x52 mults per
// instruction, so a field mult costs ~18 instructions for 8 lanes).
// Rare identity/doubling lanes are fixed up through the scalar path.
// ---------------------------------------------------------------------------
#if defined(__AVX512IFMA__) && defined(__AVX512VL__) && defined(__AVX512DQ__)
#define BP_HAVE_IFMA 1
#include <immintrin.h>

static const u64 MASK52     = 0xfffffffffffffULL;
static const u64 P52[5]     = {0x0000000000001ULL, 0, 0,
                               0x0011000000000ULL, 0x0080000000000ULL};
static const u64 NINV52     = 0xfffffffffffffULL;   // -P^{-1} mod 2^52
static const u64 ONE52[5]   = {0xffffffffffe01ULL, 0xfffffffffffffULL,
                               0xfffffffffffffULL, 0xde10fffffffffULL,
                               0x007ffffffffffULL}; // 2^260 mod P
static const u64 R2_52[5]   = {0xd737e00040001ULL, 0x330ffffffffffULL,
                               0xf800000000001ULL, 0x0010ffffffff6ULL,
                               0x007d4ab5e0088ULL}; // 2^520 mod P
// Lazy-reduction domain: every Fe8 value is kept < 2P (one AMM bound);
// subtraction adds a borrow-proof padded 3P (valid for subtrahends < 2P),
// conditional reduction is against 2P.
static const u64 PAD3P[5]   = {0x20000000000003ULL, 0x1ffffffffffffeULL,
                               0x1ffffffffffffeULL, 0x20032ffffffffeULL,
                               0x017fffffffffeULL};
static const u64 P2_52[5]   = {0x2, 0, 0, 0x0022000000000ULL,
                               0x0100000000000ULL};

// ---- scalar radix-52 Montgomery (conversions + rare-lane fixups) ----

static void m52_cond_sub(u64 r[5]) {
    u64 d[5];
    u64 borrow = 0;
    for (int i = 0; i < 5; ++i) {
        u64 t = r[i] + (MASK52 + 1) - P52[i] - borrow;
        d[i] = t & MASK52;
        borrow = 1 - (t >> 52);
    }
    if (!borrow)
        for (int i = 0; i < 5; ++i) r[i] = d[i];
}

static void m52_mul(u64 r[5], const u64 a[5], const u64 b[5]) {
    u128 t[10] = {0};
    for (int i = 0; i < 5; ++i)
        for (int j = 0; j < 5; ++j) t[i + j] += (u128)a[i] * b[j];
    for (int i = 0; i < 5; ++i) {
        u64 m = (((u64)t[i] & MASK52) * NINV52) & MASK52;
        for (int j = 0; j < 5; ++j) t[i + j] += (u128)m * P52[j];
        t[i + 1] += (u64)(t[i] >> 52);
    }
    u128 c = 0;
    for (int k = 0; k < 5; ++k) {
        u128 v = t[5 + k] + c;
        r[k] = (u64)v & MASK52;
        c = v >> 52;
    }
    m52_cond_sub(r);
}

// canonical 4x64 <-> 5x52 repacking
static void limbs52_from_words(u64 r[5], const u64 w[4]) {
    r[0] = w[0] & MASK52;
    r[1] = ((w[0] >> 52) | (w[1] << 12)) & MASK52;
    r[2] = ((w[1] >> 40) | (w[2] << 24)) & MASK52;
    r[3] = ((w[2] >> 28) | (w[3] << 36)) & MASK52;
    r[4] = (w[3] >> 16) & MASK52;
}

static void words_from_limbs52(u64 w[4], const u64 r[5]) {
    w[0] = r[0] | (r[1] << 52);
    w[1] = (r[1] >> 12) | (r[2] << 40);
    w[2] = (r[2] >> 24) | (r[3] << 28);
    w[3] = (r[3] >> 36) | (r[4] << 16);
}

static void fe52_from_fp(u64 r[5], const Fp &a) {
    u8 bytes[32];
    fp_to_bytes(bytes, a);          // leave R64 Montgomery domain
    u64 w[4];
    memcpy(w, bytes, 32);
    limbs52_from_words(r, w);
    m52_mul(r, r, R2_52);           // enter R52 Montgomery domain
}

static void fe52_to_fp(Fp &out, const u64 a[5]) {
    static const u64 one_raw[5] = {1, 0, 0, 0, 0};
    u64 c[5];
    m52_mul(c, a, one_raw);         // leave R52 Montgomery domain
    u64 w[4];
    words_from_limbs52(w, c);
    u8 bytes[32];
    memcpy(bytes, w, 32);
    fp_from_bytes(out, bytes);      // enter R64 Montgomery domain
}

// ---- 8-way limb-sliced field arithmetic ----

struct Fe8 { __m512i l[5]; };
struct Jac8 { Fe8 X, Y, Z; };   // per-lane Jacobian; Z == 0 -> identity

static inline __m512i m52v(void) { return _mm512_set1_epi64((long long)MASK52); }

static inline void fe8_zero(Fe8 &a) {
    for (int i = 0; i < 5; ++i) a.l[i] = _mm512_setzero_si512();
}

static inline void fe8_bcast(Fe8 &a, const u64 s[5]) {
    for (int i = 0; i < 5; ++i) a.l[i] = _mm512_set1_epi64((long long)s[i]);
}

static inline __mmask8 fe8_is_zero(const Fe8 &a) {
    __m512i acc = a.l[0];
    for (int i = 1; i < 5; ++i) acc = _mm512_or_si512(acc, a.l[i]);
    return _mm512_cmpeq_epu64_mask(acc, _mm512_setzero_si512());
}

static inline __mmask8 fe8_eq(const Fe8 &a, const Fe8 &b) {
    __mmask8 k = 0xff;
    for (int i = 0; i < 5; ++i)
        k &= _mm512_cmpeq_epu64_mask(a.l[i], b.l[i]);
    return k;
}

static inline void fe8_blend(Fe8 &dst, __mmask8 k, const Fe8 &src) {
    // lanes in k take src
    for (int i = 0; i < 5; ++i)
        dst.l[i] = _mm512_mask_blend_epi64(k, dst.l[i], src.l[i]);
}

static inline void fe8_carry(Fe8 &a) {
    const __m512i M = m52v();
    __m512i c = _mm512_setzero_si512();
    for (int i = 0; i < 5; ++i) {
        __m512i t = _mm512_add_epi64(a.l[i], c);
        a.l[i] = _mm512_and_si512(t, M);
        c = _mm512_srli_epi64(t, 52);
    }
}

static inline void fe8_cond_sub_mod(Fe8 &a, const u64 mod[5]) {
    const __m512i M1 = _mm512_set1_epi64((long long)(MASK52 + 1));
    __m512i d[5];
    __m512i borrow = _mm512_setzero_si512();
    for (int i = 0; i < 5; ++i) {
        __m512i t = _mm512_add_epi64(a.l[i], M1);
        t = _mm512_sub_epi64(t, _mm512_set1_epi64((long long)mod[i]));
        t = _mm512_sub_epi64(t, borrow);
        d[i] = _mm512_and_si512(t, m52v());
        borrow = _mm512_xor_si512(_mm512_srli_epi64(t, 52),
                                  _mm512_set1_epi64(1));
    }
    __mmask8 geq = _mm512_cmpeq_epu64_mask(borrow, _mm512_setzero_si512());
    for (int i = 0; i < 5; ++i)
        a.l[i] = _mm512_mask_blend_epi64(geq, a.l[i], d[i]);
}

static inline void fe8_cond_sub(Fe8 &a) { fe8_cond_sub_mod(a, P52); }

static inline void fe8_add(Fe8 &r, const Fe8 &a, const Fe8 &b) {
    for (int i = 0; i < 5; ++i) r.l[i] = _mm512_add_epi64(a.l[i], b.l[i]);
    fe8_carry(r);
    fe8_cond_sub_mod(r, P2_52);
}

static inline void fe8_sub(Fe8 &r, const Fe8 &a, const Fe8 &b) {
    for (int i = 0; i < 5; ++i) {
        __m512i t = _mm512_add_epi64(a.l[i], _mm512_set1_epi64((long long)PAD3P[i]));
        r.l[i] = _mm512_sub_epi64(t, b.l[i]);
    }
    fe8_carry(r);
    fe8_cond_sub_mod(r, P2_52);
    fe8_cond_sub_mod(r, P2_52);
}

// 8 independent Montgomery multiplications (radix-52 CIOS; P52[1]=P52[2]=0)
static void fe8_mul(Fe8 &r, const Fe8 &a, const Fe8 &b) {
    const __m512i zero = _mm512_setzero_si512();
    const __m512i ninv = _mm512_set1_epi64((long long)NINV52);
    const __m512i p3 = _mm512_set1_epi64((long long)P52[3]);
    const __m512i p4 = _mm512_set1_epi64((long long)P52[4]);
    __m512i t0 = zero, t1 = zero, t2 = zero, t3 = zero, t4 = zero;
    for (int i = 0; i < 5; ++i) {
        __m512i ai = a.l[i];
        t0 = _mm512_madd52lo_epu64(t0, ai, b.l[0]);
        t1 = _mm512_madd52lo_epu64(t1, ai, b.l[1]);
        t2 = _mm512_madd52lo_epu64(t2, ai, b.l[2]);
        t3 = _mm512_madd52lo_epu64(t3, ai, b.l[3]);
        t4 = _mm512_madd52lo_epu64(t4, ai, b.l[4]);
        __m512i m = _mm512_madd52lo_epu64(zero, t0, ninv);
        t0 = _mm512_madd52lo_epu64(t0, m, _mm512_set1_epi64(1)); // + m*1
        t3 = _mm512_madd52lo_epu64(t3, m, p3);
        t4 = _mm512_madd52lo_epu64(t4, m, p4);
        __m512i carry = _mm512_srli_epi64(t0, 52);
        __m512i n0 = _mm512_add_epi64(t1, carry);
        n0 = _mm512_madd52hi_epu64(n0, ai, b.l[0]);
        __m512i n1 = _mm512_madd52hi_epu64(t2, ai, b.l[1]);
        __m512i n2 = _mm512_madd52hi_epu64(t3, ai, b.l[2]);
        __m512i n3 = _mm512_madd52hi_epu64(t4, ai, b.l[3]);
        n3 = _mm512_madd52hi_epu64(n3, m, p3);
        __m512i n4 = _mm512_madd52hi_epu64(zero, ai, b.l[4]);
        n4 = _mm512_madd52hi_epu64(n4, m, p4);
        t0 = n0; t1 = n1; t2 = n2; t3 = n3; t4 = n4;
    }
    r.l[0] = t0; r.l[1] = t1; r.l[2] = t2; r.l[3] = t3; r.l[4] = t4;
    fe8_carry(r);
    // AMM: inputs < 2P give output < P + 4P^2/2^260 < 2P — no reduction
}

static inline void fe8_sqr(Fe8 &r, const Fe8 &a) { fe8_mul(r, a, a); }

// a == b (mod p) for lazy values < 2P: their padded difference, reduced to
// [0, 2P), is 0 or P.
static inline __mmask8 fe8_diff_is_zero_mod(const Fe8 &d) {
    Fe8 pp;
    fe8_bcast(pp, P52);
    return fe8_is_zero(d) | fe8_eq(d, pp);
}

// ---- 8-way Jacobian point ops (a = 1 curve) ----

// Lane transport between AoS bucket slots (16 u64: X[0..4] Y[0..4] Z[0..4] pad)
// and limb-sliced registers.
static void jac8_load(Jac8 &io, u64 *const bp[8], __mmask8 active) {
    // one hardware gather per limb: the per-lane slot pointers act as
    // absolute 64-bit indices (base = limb byte offset, scale = 1)
    const __m512i addr = _mm512_loadu_si512((const void *)bp);
    const __m512i zero = _mm512_setzero_si512();
    for (int l = 0; l < 5; ++l) {
        io.X.l[l] = _mm512_mask_i64gather_epi64(
            zero, active, addr, (const void *)(uintptr_t)(8 * l), 1);
        io.Y.l[l] = _mm512_mask_i64gather_epi64(
            zero, active, addr, (const void *)(uintptr_t)(8 * (5 + l)), 1);
        io.Z.l[l] = _mm512_mask_i64gather_epi64(
            zero, active, addr, (const void *)(uintptr_t)(8 * (10 + l)), 1);
    }
}

static void jac8_store(const Jac8 &io, u64 *const bp[8], __mmask8 storemask) {
    // one hardware scatter per limb (masked lanes untouched; callers mask
    // off conflict/doubling lanes, so live addresses are distinct)
    const __m512i addr = _mm512_loadu_si512((const void *)bp);
    for (int l = 0; l < 5; ++l) {
        _mm512_mask_i64scatter_epi64(
            (void *)(uintptr_t)(8 * l), storemask, addr, io.X.l[l], 1);
        _mm512_mask_i64scatter_epi64(
            (void *)(uintptr_t)(8 * (5 + l)), storemask, addr, io.Y.l[l], 1);
        _mm512_mask_i64scatter_epi64(
            (void *)(uintptr_t)(8 * (10 + l)), storemask, addr, io.Z.l[l], 1);
    }
}

// io += (qx, qy) on active lanes (mixed add, madd-2007-bl).  Lanes that hit
// the doubling case are left untouched and returned for scalar fixup.
static __mmask8 pt8_add_mixed(Jac8 &io, const Fe8 &qx, const Fe8 &qy,
                              __mmask8 active) {
    __mmask8 identp = fe8_is_zero(io.Z) & active;
    Fe8 Z1Z1, U2, S2, t;
    fe8_sqr(Z1Z1, io.Z);
    fe8_mul(U2, qx, Z1Z1);
    fe8_mul(t, qy, io.Z);
    fe8_mul(S2, t, Z1Z1);
    Fe8 H, HH, I, J, rr, V, X3, Y3, Z3, t2;
    fe8_sub(H, U2, io.X);
    fe8_sub(rr, S2, io.Y);
    __mmask8 xeq = fe8_diff_is_zero_mod(H) & active & (__mmask8)~identp;
    __mmask8 yeq = fe8_diff_is_zero_mod(rr);
    __mmask8 dblm = xeq & yeq;
    __mmask8 negm = xeq & (__mmask8)~yeq;
    fe8_sqr(HH, H);
    fe8_add(I, HH, HH);
    fe8_add(I, I, I);
    fe8_mul(J, H, I);
    fe8_add(rr, rr, rr);
    fe8_mul(V, io.X, I);
    fe8_sqr(X3, rr);
    fe8_sub(X3, X3, J);
    fe8_sub(X3, X3, V);
    fe8_sub(X3, X3, V);
    fe8_sub(Y3, V, X3);
    fe8_mul(Y3, rr, Y3);
    fe8_mul(t2, io.Y, J);
    fe8_add(t2, t2, t2);
    fe8_sub(Y3, Y3, t2);
    fe8_add(Z3, io.Z, H);
    fe8_sqr(Z3, Z3);
    fe8_sub(Z3, Z3, Z1Z1);
    fe8_sub(Z3, Z3, HH);

    __mmask8 normal = active & (__mmask8)~(identp | dblm | negm);
    fe8_blend(io.X, normal, X3);
    fe8_blend(io.Y, normal, Y3);
    fe8_blend(io.Z, normal, Z3);
    // identity += q  ->  (qx, qy, 1)
    Fe8 one8;
    fe8_bcast(one8, ONE52);
    fe8_blend(io.X, identp, qx);
    fe8_blend(io.Y, identp, qy);
    fe8_blend(io.Z, identp, one8);
    // q == -p  ->  identity
    Fe8 z8;
    fe8_zero(z8);
    fe8_blend(io.X, negm, z8);
    fe8_blend(io.Y, negm, z8);
    fe8_blend(io.Z, negm, z8);
    return dblm;
}


// Two independent mixed adds in lockstep: the interleaved primitive pairs
// dual-issue on the IFMA port (~1.5x the throughput of serial calls).
static void pt8_add_mixed2(Jac8 io[2], const Fe8 qx[2], const Fe8 qy[2],
                           const __mmask8 active[2], __mmask8 dbl_out[2]) {
    __mmask8 identp[2], xeq[2], yeq[2], dblm[2], negm[2];
    Fe8 Z1Z1[2], U2[2], S2[2], t[2];
    for (int u = 0; u < 2; ++u) identp[u] = fe8_is_zero(io[u].Z) & active[u];
    for (int u = 0; u < 2; ++u) fe8_sqr(Z1Z1[u], io[u].Z);
    for (int u = 0; u < 2; ++u) fe8_mul(U2[u], qx[u], Z1Z1[u]);
    for (int u = 0; u < 2; ++u) fe8_mul(t[u], qy[u], io[u].Z);
    for (int u = 0; u < 2; ++u) fe8_mul(S2[u], t[u], Z1Z1[u]);
    Fe8 H[2], HH[2], I[2], J[2], rr[2], V[2], X3[2], Y3[2], Z3[2], t2[2];
    for (int u = 0; u < 2; ++u) fe8_sub(H[u], U2[u], io[u].X);
    for (int u = 0; u < 2; ++u) fe8_sub(rr[u], S2[u], io[u].Y);
    for (int u = 0; u < 2; ++u) {
        xeq[u] = fe8_diff_is_zero_mod(H[u]) & active[u] & (__mmask8)~identp[u];
        yeq[u] = fe8_diff_is_zero_mod(rr[u]);
        dblm[u] = xeq[u] & yeq[u];
        negm[u] = xeq[u] & (__mmask8)~yeq[u];
    }
    for (int u = 0; u < 2; ++u) fe8_mul(HH[u], H[u], H[u]);
    for (int u = 0; u < 2; ++u) { fe8_add(I[u], HH[u], HH[u]); }
    for (int u = 0; u < 2; ++u) { fe8_add(I[u], I[u], I[u]); }
    for (int u = 0; u < 2; ++u) fe8_mul(J[u], H[u], I[u]);
    for (int u = 0; u < 2; ++u) { fe8_add(rr[u], rr[u], rr[u]); }
    for (int u = 0; u < 2; ++u) fe8_mul(V[u], io[u].X, I[u]);
    for (int u = 0; u < 2; ++u) fe8_mul(X3[u], rr[u], rr[u]);
    for (int u = 0; u < 2; ++u) { fe8_sub(X3[u], X3[u], J[u]); }
    for (int u = 0; u < 2; ++u) { fe8_sub(X3[u], X3[u], V[u]); fe8_sub(X3[u], X3[u], V[u]); }
    for (int u = 0; u < 2; ++u) fe8_sub(Y3[u], V[u], X3[u]);
    for (int u = 0; u < 2; ++u) fe8_mul(Y3[u], rr[u], Y3[u]);
    for (int u = 0; u < 2; ++u) fe8_mul(t2[u], io[u].Y, J[u]);
    for (int u = 0; u < 2; ++u) { fe8_add(t2[u], t2[u], t2[u]); fe8_sub(Y3[u], Y3[u], t2[u]); }
    for (int u = 0; u < 2; ++u) fe8_add(Z3[u], io[u].Z, H[u]);
    for (int u = 0; u < 2; ++u) fe8_mul(Z3[u], Z3[u], Z3[u]);
    for (int u = 0; u < 2; ++u) { fe8_sub(Z3[u], Z3[u], Z1Z1[u]); fe8_sub(Z3[u], Z3[u], HH[u]); }
    Fe8 one8, z8;
    fe8_bcast(one8, ONE52);
    fe8_zero(z8);
    for (int u = 0; u < 2; ++u) {
        __mmask8 normal = active[u] & (__mmask8)~(identp[u] | dblm[u] | negm[u]);
        fe8_blend(io[u].X, normal, X3[u]);
        fe8_blend(io[u].Y, normal, Y3[u]);
        fe8_blend(io[u].Z, normal, Z3[u]);
        fe8_blend(io[u].X, identp[u], qx[u]);
        fe8_blend(io[u].Y, identp[u], qy[u]);
        fe8_blend(io[u].Z, identp[u], one8);
        fe8_blend(io[u].X, negm[u], z8);
        fe8_blend(io[u].Y, negm[u], z8);
        fe8_blend(io[u].Z, negm[u], z8);
        dbl_out[u] = dblm[u];
    }
}

// io += q (full Jacobian add, add-2007-bl).  Doubling lanes returned for
// scalar fixup.
static __mmask8 pt8_add(Jac8 &io, const Jac8 &q, __mmask8 active) {
    __mmask8 identp = fe8_is_zero(io.Z) & active;
    __mmask8 identq = fe8_is_zero(q.Z) & active;
    Fe8 Z1Z1, Z2Z2, U1, U2, S1, S2, t;
    fe8_sqr(Z1Z1, io.Z);
    fe8_sqr(Z2Z2, q.Z);
    fe8_mul(U1, io.X, Z2Z2);
    fe8_mul(U2, q.X, Z1Z1);
    fe8_mul(t, io.Y, q.Z);
    fe8_mul(S1, t, Z2Z2);
    fe8_mul(t, q.Y, io.Z);
    fe8_mul(S2, t, Z1Z1);
    __mmask8 live = active & (__mmask8)~(identp | identq);
    Fe8 H, I, J, rr, V, X3, Y3, Z3, t2;
    fe8_sub(H, U2, U1);
    fe8_sub(rr, S2, S1);
    __mmask8 xeq = fe8_diff_is_zero_mod(H) & live;
    __mmask8 yeq = fe8_diff_is_zero_mod(rr);
    __mmask8 dblm = xeq & yeq;
    __mmask8 negm = xeq & (__mmask8)~yeq;
    fe8_add(I, H, H);
    fe8_sqr(I, I);
    fe8_mul(J, H, I);
    fe8_add(rr, rr, rr);
    fe8_mul(V, U1, I);
    fe8_sqr(X3, rr);
    fe8_sub(X3, X3, J);
    fe8_sub(X3, X3, V);
    fe8_sub(X3, X3, V);
    fe8_sub(Y3, V, X3);
    fe8_mul(Y3, rr, Y3);
    fe8_mul(t2, S1, J);
    fe8_add(t2, t2, t2);
    fe8_sub(Y3, Y3, t2);
    fe8_add(Z3, io.Z, q.Z);
    fe8_sqr(Z3, Z3);
    fe8_sub(Z3, Z3, Z1Z1);
    fe8_sub(Z3, Z3, Z2Z2);
    fe8_mul(Z3, Z3, H);

    __mmask8 normal = live & (__mmask8)~(dblm | negm);
    fe8_blend(io.X, normal, X3);
    fe8_blend(io.Y, normal, Y3);
    fe8_blend(io.Z, normal, Z3);
    fe8_blend(io.X, identp, q.X);   // identity += q -> q (incl. both-ident)
    fe8_blend(io.Y, identp, q.Y);
    fe8_blend(io.Z, identp, q.Z);
    Fe8 z8;
    fe8_zero(z8);
    __mmask8 negonly = negm & (__mmask8)~identp;
    fe8_blend(io.X, negonly, z8);
    fe8_blend(io.Y, negonly, z8);
    fe8_blend(io.Z, negonly, z8);
    return dblm & (__mmask8)~identp;
}

// io = 2*io per lane (dbl-2007-bl, a = 1 so a*Z^4 = (Z^2)^2 needs no extra
// multiplication).  Identity lanes need no mask: Z = 0 gives
// Z3 = (Y+Z)^2 - Y^2 - Z^2 = 2YZ = 0 (a multiple of P in the lazy
// representation, canonicalized on slot extraction).
static void jac8_dbl(Jac8 &io) {
    Fe8 XX, YY, YYYY, ZZ, S, M, T, t0, t1, Z3;
    fe8_sqr(XX, io.X);
    fe8_sqr(YY, io.Y);
    fe8_sqr(YYYY, YY);
    fe8_sqr(ZZ, io.Z);
    // S = 2*((X+YY)^2 - XX - YYYY)
    fe8_add(t0, io.X, YY);
    fe8_sqr(t0, t0);
    fe8_sub(t0, t0, XX);
    fe8_sub(t0, t0, YYYY);
    fe8_add(S, t0, t0);
    // M = 3*XX + (Z^2)^2
    fe8_add(t0, XX, XX);
    fe8_add(t0, t0, XX);
    fe8_sqr(t1, ZZ);
    fe8_add(M, t0, t1);
    // Z3 = (Y+Z)^2 - YY - ZZ   (before Y/Z are overwritten)
    fe8_add(Z3, io.Y, io.Z);
    fe8_sqr(Z3, Z3);
    fe8_sub(Z3, Z3, YY);
    fe8_sub(Z3, Z3, ZZ);
    // T = M^2 - 2S; Y3 = M*(S-T) - 8*YYYY
    fe8_sqr(T, M);
    fe8_sub(T, T, S);
    fe8_sub(T, T, S);
    fe8_sub(t0, S, T);
    fe8_mul(t0, M, t0);
    fe8_add(t1, YYYY, YYYY);
    fe8_add(t1, t1, t1);
    fe8_add(t1, t1, t1);
    fe8_sub(io.Y, t0, t1);
    io.X = T;
    io.Z = Z3;
}

// bucket slot (fe52 mont Jacobian) <-> scalar Pt for rare-lane fixups
static void slot_to_pt(Pt &out, const u64 *slot) {
    if (!(slot[10] | slot[11] | slot[12] | slot[13] | slot[14])) {
        out = PT_IDENT;
        return;
    }
    fe52_to_fp(out.X, slot);
    fe52_to_fp(out.Y, slot + 5);
    fe52_to_fp(out.Z, slot + 10);
}

static void slot_from_pt(u64 *slot, const Pt &p) {
    if (pt_is_ident(p)) {
        memset(slot, 0, 15 * sizeof(u64));
        return;
    }
    fe52_from_fp(slot, p.X);
    fe52_from_fp(slot + 5, p.Y);
    fe52_from_fp(slot + 10, p.Z);
}

// Process windows [w0, w0+nl) of one MSM with 8-way bucket + reduction
// phases (nl <= 8 lanes; lane L = window w0+L).
static void msm_window_group_ifma(const u8 *scalars, const u32 *indices,
                                  const std::vector<AffinePt> &pts,
                                  const u64 *fe52pts, size_t k, int c,
                                  int w0, int nl, Pt *window_out) {
    const size_t nbuckets = ((size_t)1 << c) - 1;
    const size_t stride = 16;
    std::vector<u64> buckets((size_t)nl * nbuckets * stride, 0);
    u64 *bp[8] = {nullptr};
    alignas(64) u64 dummy[16] = {0};

    // bucket phase: two points in flight (independent adds dual-issue);
    // lanes where both points hit the same bucket defer the second add to
    // the scalar path.
    u64 *bp2[2][8];
    auto scalar_bucket_add = [&](u64 *slot, const AffinePt &ap) {
        Pt p, r;
        slot_to_pt(p, slot);
        pt_add_mixed(r, p, ap.x, ap.y);
        slot_from_pt(slot, r);
    };
    size_t i = 0;
    for (; i + 1 < k; i += 2) {
        const size_t pi0 = indices ? indices[i] : i;
        const size_t pi1 = indices ? indices[i + 1] : i + 1;
        const AffinePt &ap0 = pts[pi0];
        const AffinePt &ap1 = pts[pi1];
        __mmask8 act[2] = {0, 0};
        for (int L = 0; L < nl; ++L) {
            u64 d0 = scalar_window(scalars + 32 * i, (w0 + L) * c, c);
            u64 d1 = scalar_window(scalars + 32 * (i + 1), (w0 + L) * c, c);
            if (d0 && !ap0.inf) {
                act[0] |= (__mmask8)(1u << L);
                bp2[0][L] = buckets.data() +
                            ((size_t)L * nbuckets + (d0 - 1)) * stride;
            } else bp2[0][L] = dummy;
            if (d1 && !ap1.inf) {
                act[1] |= (__mmask8)(1u << L);
                bp2[1][L] = buckets.data() +
                            ((size_t)L * nbuckets + (d1 - 1)) * stride;
            } else bp2[1][L] = dummy;
        }
        // same-bucket conflicts: second add handled scalar after the store
        __mmask8 conflict = 0;
        for (int L = 0; L < nl; ++L)
            if (((act[0] >> L) & 1) && ((act[1] >> L) & 1) &&
                bp2[0][L] == bp2[1][L])
                conflict |= (__mmask8)(1u << L);
        act[1] &= (__mmask8)~conflict;
        if (!(act[0] | act[1] | conflict)) continue;
        Jac8 acc[2];
        jac8_load(acc[0], bp2[0], act[0]);
        jac8_load(acc[1], bp2[1], act[1]);
        Fe8 qx[2], qy[2];
        fe8_bcast(qx[0], fe52pts + 10 * pi0);
        fe8_bcast(qy[0], fe52pts + 10 * pi0 + 5);
        fe8_bcast(qx[1], fe52pts + 10 * pi1);
        fe8_bcast(qy[1], fe52pts + 10 * pi1 + 5);
        __mmask8 dblm[2];
        pt8_add_mixed2(acc, qx, qy, act, dblm);
        jac8_store(acc[0], bp2[0], act[0] & (__mmask8)~dblm[0]);
        jac8_store(acc[1], bp2[1], act[1] & (__mmask8)~dblm[1]);
        __mmask8 m0 = dblm[0];
        while (m0) {
            int L = __builtin_ctz(m0); m0 = (__mmask8)(m0 & (m0 - 1));
            scalar_bucket_add(bp2[0][L], ap0);
        }
        __mmask8 m1 = (__mmask8)(dblm[1] | conflict);
        while (m1) {
            int L = __builtin_ctz(m1); m1 = (__mmask8)(m1 & (m1 - 1));
            scalar_bucket_add(bp2[1][L], ap1);
        }
    }
    for (; i < k; ++i) {
        const size_t pi = indices ? indices[i] : i;
        const AffinePt &ap = pts[pi];
        __mmask8 active = 0;
        for (int L = 0; L < nl; ++L) {
            u64 d = scalar_window(scalars + 32 * i, (w0 + L) * c, c);
            if (d && !ap.inf) {
                active |= (__mmask8)(1u << L);
                bp[L] = buckets.data() + ((size_t)L * nbuckets + (d - 1)) * stride;
            } else bp[L] = dummy;
        }
        if (!active) continue;
        Jac8 acc;
        jac8_load(acc, bp, active);
        Fe8 qx, qy;
        fe8_bcast(qx, fe52pts + 10 * pi);
        fe8_bcast(qy, fe52pts + 10 * pi + 5);
        __mmask8 dblm = pt8_add_mixed(acc, qx, qy, active);
        jac8_store(acc, bp, active & (__mmask8)~dblm);
        while (dblm) {
            int L = __builtin_ctz(dblm);
            dblm = (__mmask8)(dblm & (dblm - 1));
            scalar_bucket_add(bp[L], ap);
        }
    }

    // reduction: running suffix sums, 8 windows in lockstep
    std::vector<u64> run((size_t)nl * stride, 0), tot((size_t)nl * stride, 0);
    u64 *rp[8], *tp[8];
    for (int L = 0; L < 8; ++L) {
        rp[L] = (L < nl) ? run.data() + (size_t)L * stride : dummy;
        tp[L] = (L < nl) ? tot.data() + (size_t)L * stride : dummy;
    }
    __mmask8 lanes = (__mmask8)((1u << nl) - 1);
    for (size_t b = nbuckets; b-- > 0;) {
        for (int L = 0; L < nl; ++L)
            bp[L] = buckets.data() + ((size_t)L * nbuckets + b) * stride;
        for (int L = nl; L < 8; ++L) bp[L] = dummy;
        Jac8 running, bucket8;
        jac8_load(running, rp, lanes);
        jac8_load(bucket8, bp, lanes);
        __mmask8 dblm = pt8_add(running, bucket8, lanes);
        jac8_store(running, rp, lanes & (__mmask8)~dblm);
        while (dblm) {
            int L = __builtin_ctz(dblm);
            dblm = (__mmask8)(dblm & (dblm - 1));
            Pt p, q, r;
            slot_to_pt(p, rp[L]);
            slot_to_pt(q, bp[L]);
            pt_add(r, p, q);
            slot_from_pt(rp[L], r);
        }
        Jac8 total;
        jac8_load(total, tp, lanes);
        jac8_load(running, rp, lanes);
        dblm = pt8_add(total, running, lanes);
        jac8_store(total, tp, lanes & (__mmask8)~dblm);
        while (dblm) {
            int L = __builtin_ctz(dblm);
            dblm = (__mmask8)(dblm & (dblm - 1));
            Pt p, q, r;
            slot_to_pt(p, tp[L]);
            slot_to_pt(q, rp[L]);
            pt_add(r, p, q);
            slot_from_pt(tp[L], r);
        }
    }
    for (int L = 0; L < nl; ++L) slot_to_pt(window_out[w0 + L], tp[L]);
}

// Window/partition cost model.  Work units are 8-lane point ops (a serial
// scalar op costs about the same wall time as one 8-wide op).  Per (group,
// part) task: bucket adds over the part's chunk — with a penalty for
// same-bucket conflicts that kick the dual-issue pair onto the scalar
// path — plus the suffix-sum reduction of 2^c-1 buckets.  Serial tail:
// the combine doubling chain (= bits) plus the per-window part merges.
// ``parts`` splits the points so few-window MSMs (64-bit split chunks
// have at most two 8-window groups) still use every core.
static void msm_pick_c_parts_ifma(size_t k, int njobs, int nthreads, int bits,
                                  int *out_c, int *out_parts) {
    int best_c = 8, best_parts = 1;
    double best = 1e300;
    for (int cc = 2; cc <= 18; ++cc) {
        int windows = (bits + cc - 1) / cc;
        int groups = (windows + 7) / 8;
        int max_parts = nthreads / (njobs * groups);
        if (max_parts < 1) max_parts = 1;
        if (max_parts > 8) max_parts = 8;
        for (int parts = 1; parts <= max_parts; ++parts) {
            if ((size_t)parts * 16 > k && parts > 1) break;  // tiny chunks
            int tasks = njobs * groups * parts;
            int span = (tasks + nthreads - 1) / nthreads;
            double conflict = 8.0 / (double)((u64)1 << cc);
            double per_task = ((double)k / parts) * (1.0 + conflict) +
                              2.0 * (double)(((u64)1 << cc) - 1);
            double serial = (double)bits + (double)windows * parts;
            double cost = (double)span * per_task + serial;
            if (cost < best) { best = cost; best_c = cc; best_parts = parts; }
        }
    }
    *out_c = best_c;
    *out_parts = best_parts;
}

static int msm_pick_c_ifma(size_t k, int nthreads, int bits = 252) {
    int c, parts;
    msm_pick_c_parts_ifma(k, 1, nthreads, bits, &c, &parts);
    return c;
}

static void msm_combine(const Pt *window_sums, int windows, int c,
                        u8 *out_x, u8 *out_y, u8 *out_inf);

// Run ``njobs`` same-size MSMs over one point table with window-group AND
// point-partition parallelism; used by both the single and L/R-pair paths.
struct MsmJob {
    const u8 *s;
    const u32 *idx;
    u8 *ox, *oy;
    u8 *oi;
};

static void msm_run_ifma_jobs(MsmJob *jobs, int njobs,
                              const std::vector<AffinePt> &pts,
                              const u64 *fe52, size_t k, int bits,
                              int nthreads) {
    int c, parts;
    msm_pick_c_parts_ifma(k, njobs, nthreads, bits, &c, &parts);
    int windows = (bits + c - 1) / c;
    int ngroups = (windows + 7) / 8;
    // point-chunking offsets index arrays; synthesize iota for null-index jobs
    std::vector<u32> iota;
    if (parts > 1) {
        for (int j = 0; j < njobs; ++j) {
            if (jobs[j].idx) continue;
            if (iota.empty()) {
                iota.resize(k);
                for (size_t i = 0; i < k; ++i) iota[i] = (u32)i;
            }
            jobs[j].idx = iota.data();
        }
    }
    std::vector<Pt> wsums((size_t)njobs * parts * windows);
    size_t chunk = (k + parts - 1) / parts;
    int tasks = njobs * ngroups * parts;
    int nt = nthreads < tasks ? nthreads : tasks;
    parallel_for((size_t)tasks, nt, [&](size_t t) {
        int j = (int)(t % njobs);            // interleave jobs across cores
        size_t gp = t / njobs;
        int g = (int)(gp % ngroups);
        int p = (int)(gp / ngroups);
        size_t b = (size_t)p * chunk;
        size_t e = b + chunk > k ? k : b + chunk;
        if (b >= e) {
            Pt *out = wsums.data() + ((size_t)j * parts + p) * windows;
            int w0 = g * 8;
            int nl = windows - w0 < 8 ? windows - w0 : 8;
            for (int L = 0; L < nl; ++L) out[w0 + L] = PT_IDENT;
            return;
        }
        int w0 = g * 8;
        int nl = windows - w0 < 8 ? windows - w0 : 8;
        msm_window_group_ifma(jobs[j].s + 32 * b,
                              jobs[j].idx ? jobs[j].idx + b : nullptr,
                              pts, fe52, e - b, c, w0, nl,
                              wsums.data() + ((size_t)j * parts + p) * windows);
    });
    parallel_for((size_t)njobs, njobs, [&](size_t j) {
        Pt *acc = wsums.data() + (size_t)j * parts * windows;
        for (int p = 1; p < parts; ++p) {
            const Pt *part = acc + (size_t)p * windows;
            for (int w = 0; w < windows; ++w) {
                Pt t;
                pt_add(t, acc[w], part[w]);
                acc[w] = t;
            }
        }
        msm_combine(acc, windows, c, jobs[j].ox, jobs[j].oy, jobs[j].oi);
    });
}

// ---------------------------------------------------------------------------
// Byte-shift-table MSM (the small-MSM fast path).
//
// With table entries 2^(8t) * P for t = 0..31, every byte of a canonical
// 32-byte LE scalar is a base-256 digit against ONE shared bucket space:
//   msm = sum_d d * B_d,  B_d = sum of table entries whose byte digit == d.
// Versus the split/window path this trades NOTHING in bucket adds
// (k * 32 = k * 256bits / 8) but replaces per-window-group suffix
// reductions + the 64-doubling combine chain with a single weighted
// reduction, vectorized over 8 bucket segments — the dominant fixed cost of
// proof-scale MSMs (m=1 IPP rounds: k = 65).  Used when k is small; large
// MSMs amortize reductions fine and keep the split path's larger-c bucket
// phase.
// ---------------------------------------------------------------------------

// Bucket accumulation for points [i_begin, i_end) into a 256-slot bucket
// array (slot d-1 for digit d; slot 255 stays identity).  Dual-issues two
// 8-window groups of the same point; same-bucket collisions (equal byte
// values anywhere in the pair) defer to the scalar path.
static void msm_bytes_chunk_ifma(const u8 *scalars, const u32 *indices,
                                 const std::vector<AffinePt> &pts_b,
                                 const u64 *fe52b, size_t base_n,
                                 size_t i_begin, size_t i_end, u64 *buckets) {
    alignas(64) u64 dummy[16] = {0};
    auto scalar_bucket_add = [&](u64 *slot, const AffinePt &ap) {
        Pt p, r;
        slot_to_pt(p, slot);
        pt_add_mixed(r, p, ap.x, ap.y);
        slot_from_pt(slot, r);
    };
    for (size_t i = i_begin; i < i_end; ++i) {
        const u8 *sc = scalars + 32 * i;
        size_t pi = indices ? indices[i] : i;
        if (pts_b[pi].inf) continue;
        for (int pair = 0; pair < 2; ++pair) {
            __mmask8 act[2] = {0, 0};
            u64 *bptr[2][8];
            alignas(64) long long offs[2][8];
            struct Defer { u64 *slot; u32 eid; };
            Defer defers[16];
            int ndefer = 0;
            u64 seen[4] = {0, 0, 0, 0};
            for (int u = 0; u < 2; ++u) {
                int g = 2 * pair + u;
                for (int L = 0; L < 8; ++L) {
                    u8 d = sc[8 * g + L];
                    u32 e = (u32)((size_t)(8 * g + L) * base_n + pi);
                    offs[u][L] = (long long)e * 80;  // fe52 record: 10 u64
                    if (!d) { bptr[u][L] = dummy; continue; }
                    u64 *slot = buckets + ((size_t)d - 1) * 16;
                    if (seen[d >> 6] & (1ull << (d & 63))) {
                        defers[ndefer++] = {slot, e};
                        bptr[u][L] = dummy;
                    } else {
                        seen[d >> 6] |= 1ull << (d & 63);
                        act[u] |= (__mmask8)(1u << L);
                        bptr[u][L] = slot;
                    }
                }
            }
            if (!(act[0] | act[1]) && !ndefer) continue;
            Jac8 acc[2];
            jac8_load(acc[0], bptr[0], act[0]);
            jac8_load(acc[1], bptr[1], act[1]);
            Fe8 qx[2], qy[2];
            const __m512i zero = _mm512_setzero_si512();
            for (int u = 0; u < 2; ++u) {
                const __m512i off = _mm512_load_si512((const void *)offs[u]);
                for (int l = 0; l < 5; ++l) {
                    qx[u].l[l] = _mm512_mask_i64gather_epi64(
                        zero, act[u], off,
                        (const void *)((const u8 *)fe52b + 8 * l), 1);
                    qy[u].l[l] = _mm512_mask_i64gather_epi64(
                        zero, act[u], off,
                        (const void *)((const u8 *)fe52b + 8 * (5 + l)), 1);
                }
            }
            __mmask8 dblm[2];
            pt8_add_mixed2(acc, qx, qy, act, dblm);
            jac8_store(acc[0], bptr[0], act[0] & (__mmask8)~dblm[0]);
            jac8_store(acc[1], bptr[1], act[1] & (__mmask8)~dblm[1]);
            for (int u = 0; u < 2; ++u) {
                __mmask8 m = dblm[u];
                while (m) {
                    int L = __builtin_ctz(m);
                    m = (__mmask8)(m & (m - 1));
                    int g = 2 * pair + u;
                    scalar_bucket_add(bptr[u][L],
                                      pts_b[(size_t)(8 * g + L) * base_n + pi]);
                }
            }
            for (int d = 0; d < ndefer; ++d)
                scalar_bucket_add(defers[d].slot, pts_b[defers[d].eid]);
        }
    }
}

// Weighted reduction: out = sum_{d=1..255} d * B_d over a 256-slot bucket
// array, with 8 contiguous 32-bucket segments on the vector lanes:
//   per segment L (digits 32L+1 .. 32L+32, s = d - 32L):
//     W_L = sum_s s * B_(32L+s)   (suffix running trick, 2 adds per bucket)
//     S_L = sum_s B_(32L+s)
//   out = sum_L W_L + 32 * sum_L L * S_L
static void msm_bytes_reduce(u64 *buckets, Pt &out) {
    alignas(64) u64 dummy[16] = {0};
    alignas(64) u64 run[8][16], wgt[8][16];
    memset(run, 0, sizeof(run));
    memset(wgt, 0, sizeof(wgt));
    u64 *rp[8], *wp[8], *bp[8];
    for (int L = 0; L < 8; ++L) { rp[L] = run[L]; wp[L] = wgt[L]; }
    const __mmask8 lanes = 0xFF;
    for (int s = 32; s >= 1; --s) {
        for (int L = 0; L < 8; ++L) {
            size_t d = (size_t)32 * L + s;  // 1..256; slot 255 stays identity
            bp[L] = buckets + (d - 1) * 16;
        }
        Jac8 running, bucket8;
        jac8_load(running, rp, lanes);
        jac8_load(bucket8, bp, lanes);
        __mmask8 dblm = pt8_add(running, bucket8, lanes);
        jac8_store(running, rp, lanes & (__mmask8)~dblm);
        while (dblm) {
            int L = __builtin_ctz(dblm);
            dblm = (__mmask8)(dblm & (dblm - 1));
            Pt p, q, r;
            slot_to_pt(p, rp[L]);
            slot_to_pt(q, bp[L]);
            pt_add(r, p, q);
            slot_from_pt(rp[L], r);
        }
        Jac8 weighted;
        jac8_load(weighted, wp, lanes);
        jac8_load(running, rp, lanes);
        dblm = pt8_add(weighted, running, lanes);
        jac8_store(weighted, wp, lanes & (__mmask8)~dblm);
        while (dblm) {
            int L = __builtin_ctz(dblm);
            dblm = (__mmask8)(dblm & (dblm - 1));
            Pt p, q, r;
            slot_to_pt(p, wp[L]);
            slot_to_pt(q, rp[L]);
            pt_add(r, p, q);
            slot_from_pt(wp[L], r);
        }
    }
    (void)dummy;
    // tail: out = sum_L W_L + 32 * sum_L L * S_L
    Pt total = PT_IDENT;
    for (int L = 0; L < 8; ++L) {
        Pt w, t;
        slot_to_pt(w, wp[L]);
        pt_add(t, total, w);
        total = t;
    }
    Pt acc = PT_IDENT, acc2 = PT_IDENT;
    for (int L = 7; L >= 1; --L) {
        Pt s, t;
        slot_to_pt(s, rp[L]);
        pt_add(t, acc, s);
        acc = t;
        pt_add(t, acc2, acc);
        acc2 = t;
    }
    for (int d = 0; d < 5; ++d) { Pt t; pt_dbl(t, acc2); acc2 = t; }
    pt_add(out, total, acc2);
}

// Up to BYTES_K_MAX lanes: run njobs byte-table MSMs with point-chunk
// parallelism; the weighted reduction is linear in bucket values, so each
// (job, part) task reduces its own buckets and partials just add.
static void msm_run_bytes_jobs(MsmJob *jobs, int njobs,
                               const std::vector<AffinePt> &pts_b,
                               const u64 *fe52b, size_t base_n, size_t k,
                               int nthreads) {
    int parts = nthreads / njobs;
    if (parts < 1) parts = 1;
    if (parts > 4) parts = 4;
    while (parts > 1 && k / (size_t)parts < 16) --parts;
    int tasks = njobs * parts;
    std::vector<Pt> partials((size_t)tasks);
    size_t chunk = (k + parts - 1) / parts;
    parallel_for((size_t)tasks, nthreads < tasks ? nthreads : tasks,
                 [&](size_t t) {
        int j = (int)(t % njobs);
        int p = (int)(t / njobs);
        size_t b = (size_t)p * chunk;
        size_t e = b + chunk > k ? k : b + chunk;
        if (b >= e) { partials[t] = PT_IDENT; return; }
        std::vector<u64> buckets((size_t)256 * 16, 0);
        msm_bytes_chunk_ifma(jobs[j].s, jobs[j].idx, pts_b, fe52b, base_n,
                             b, e, buckets.data());
        msm_bytes_reduce(buckets.data(), partials[t]);
    });
    parallel_for((size_t)njobs, njobs, [&](size_t j) {
        Pt acc = partials[j];
        for (int p = 1; p < parts; ++p) {
            Pt t;
            pt_add(t, acc, partials[(size_t)p * njobs + j]);
            acc = t;
        }
        pt_to_affine(jobs[j].ox, jobs[j].oy, jobs[j].oi, acc);
    });
}

// Small-MSM routing threshold: byte-path bucket adds are k*32; the split
// path's are k*4*ceil(64/c) with per-group reductions on top.  Measured
// crossover on the 4-core IFMA box is well above proof scale; cap where
// the work terms equalize (c ~ 8 at k4 ~ 4k lanes).  BP_BYTES_K_MAX env
// overrides for experiments.
static size_t bytes_k_max() {
    static size_t v = [] {
        const char *e = getenv("BP_BYTES_K_MAX");
        return (e && *e) ? (size_t)atol(e) : (size_t)1024;
    }();
    return v;
}
#endif  // BP_HAVE_IFMA


static int msm_pick_c(size_t n, int bits = 252) {
    int c = 4;
    double best = 1e300;
    for (int cc = 2; cc <= 14; ++cc) {
        double windows = ((double)bits + cc - 1) / cc;
        double cost = windows * ((double)n + 2.0 * (double)((u64)1 << cc));
        if (cost < best) { best = cost; c = cc; }
    }
    return c;
}

static void msm_window_range(const u8 *scalars, const u32 *indices,
                             const std::vector<AffinePt> &pts, size_t k,
                             int c, int w_begin, int w_end, Pt *window_out) {
    size_t nbuckets = ((size_t)1 << c) - 1;
    std::vector<Pt> buckets(nbuckets);
    for (int w = w_begin; w < w_end; ++w) {
        for (size_t b = 0; b < nbuckets; ++b) buckets[b] = PT_IDENT;
        for (size_t i = 0; i < k; ++i) {
            u64 digit = scalar_window(scalars + 32 * i, w * c, c);
            if (!digit) continue;
            const AffinePt &ap = pts[indices ? indices[i] : i];
            if (ap.inf) continue;
            Pt t;
            pt_add_mixed(t, buckets[digit - 1], ap.x, ap.y);
            buckets[digit - 1] = t;
        }
        Pt running = PT_IDENT, total = PT_IDENT;
        for (size_t b = nbuckets; b-- > 0;) {
            Pt t;
            pt_add(t, running, buckets[b]); running = t;
            pt_add(t, total, running); total = t;
        }
        window_out[w] = total;
    }
}

static void msm_combine_pt(const Pt *window_sums, int windows, int c,
                           Pt &result) {
    result = PT_IDENT;
    for (int w = windows - 1; w >= 0; --w) {
        for (int i = 0; i < c; ++i) { Pt t; pt_dbl(t, result); result = t; }
        Pt t; pt_add(t, result, window_sums[w]); result = t;
    }
}

static void msm_combine(const Pt *window_sums, int windows, int c,
                        u8 *out_x, u8 *out_y, u8 *out_inf) {
    Pt result;
    msm_combine_pt(window_sums, windows, c, result);
    pt_to_affine(out_x, out_y, out_inf, result);
}

#ifdef BP_HAVE_IFMA
// fe52 affine table (10 u64 per slot, aligned with an AffinePt table)
static std::vector<u64> fe52_table(const std::vector<AffinePt> &pts) {
    std::vector<u64> fe((size_t)10 * pts.size(), 0);
    for (size_t i = 0; i < pts.size(); ++i) {
        if (pts[i].inf) continue;
        fe52_from_fp(&fe[10 * i], pts[i].x);
        fe52_from_fp(&fe[10 * i + 5], pts[i].y);
    }
    return fe;
}
#endif

static void msm_run(const u8 *scalars, const u32 *indices,
                    const std::vector<AffinePt> &pts, size_t k,
                    u8 *out_x, u8 *out_y, u8 *out_inf,
                    const u64 *fe52_cache = nullptr, int nthreads_cap = 0,
                    int bits = 252) {
    if (k == 0) { memset(out_x, 0, 32); memset(out_y, 0, 32); *out_inf = 1; return; }
    unsigned hw = std::thread::hardware_concurrency();
    int nthreads = (int)(hw ? hw : 1);
    if (nthreads_cap > 0 && nthreads > nthreads_cap) nthreads = nthreads_cap;

#ifdef BP_HAVE_IFMA
    if (k >= 16) {
        std::vector<u64> fe_local;
        if (!fe52_cache) {
            fe_local = fe52_table(pts);
            fe52_cache = fe_local.data();
        }
        // pool dispatch costs more than it buys on tiny MSMs — decide the
        // effective parallelism first so the window picker models it.
        // Threshold measured on the 4-core host: n=64/130 MSMs improve
        // 1.3-1.4x from window-group tasks on the pool; n=29 regresses
        // (wakeup latency exceeds the whole bucket phase).
        int eff_threads = (k < 56) ? 1 : nthreads;
        MsmJob job{scalars, indices, out_x, out_y, out_inf};
        msm_run_ifma_jobs(&job, 1, pts, fe52_cache, k, bits, eff_threads);
        return;
    }
#endif

    int c = msm_pick_c(k, bits);
    int windows = (bits + c - 1) / c;
    std::vector<Pt> window_sums(windows);
    if (nthreads > windows) nthreads = windows;
    if (k < 64) nthreads = 1;
    if (nthreads <= 1) {
        msm_window_range(scalars, indices, pts, k, c, 0, windows, window_sums.data());
    } else {
        int per = (windows + nthreads - 1) / nthreads;
        int tasks = (windows + per - 1) / per;
        parallel_for((size_t)tasks, nthreads, [&](size_t t) {
            int b = (int)t * per, e = b + per;
            if (e > windows) e = windows;
            if (b < e)
                msm_window_range(scalars, indices, pts, k, c, b, e,
                                 window_sums.data());
        });
    }
    msm_combine(window_sums.data(), windows, c, out_x, out_y, out_inf);
}

#ifdef BP_HAVE_IFMA
// Heterogeneous MSM jobs (distinct point tables, point counts, and scalar
// widths) flattened onto ONE pool dispatch.  The verifier mega-check is the
// user: the split-table fixed-generator part (64-bit chunks) and the
// variable-base proof-point part (252-bit) each carry a serial combine tail
// comparable to their bucket phase; run sequentially the tails add up, run
// here the bucket tasks tile all cores and the combines proceed on separate
// workers (reference mega-check: src/r1cs/verifier.rs:516-547).
struct MixedJob {
    const u8 *s;
    const u32 *idx;
    const std::vector<AffinePt> *pts;
    const u64 *fe52;
    size_t k;
    int bits;
    Pt result;  // Jacobian output
    // byte-table mode: pts/fe52 point at the 32-block byte-shift table and
    // each (part) task runs chunk-bucket + weighted-reduce into wsums[p]
    bool bytes = false;
    size_t base_n = 0;
    // derived
    int c = 0, parts = 0, windows = 0, ngroups = 0;
    std::vector<Pt> wsums;
    std::vector<u32> iota;
};

static void msm_bytes_chunk_ifma(const u8 *, const u32 *,
                                 const std::vector<AffinePt> &, const u64 *,
                                 size_t, size_t, size_t, u64 *);
static void msm_bytes_reduce(u64 *, Pt &);

static void msm_run_mixed(MixedJob *jobs, int njobs, int nthreads) {
    struct Task { int j, g, p; };
    std::vector<Task> tasks;
    for (int j = 0; j < njobs; ++j) {
        MixedJob &jb = jobs[j];
        if (jb.bytes) {
            jb.parts = nthreads / njobs;
            if (jb.parts < 1) jb.parts = 1;
            if (jb.parts > 4) jb.parts = 4;
            while (jb.parts > 1 && jb.k / (size_t)jb.parts < 16) --jb.parts;
            jb.windows = 1;
            jb.ngroups = 1;
            jb.wsums.assign((size_t)jb.parts, PT_IDENT);
            for (int p = 0; p < jb.parts; ++p) tasks.push_back({j, 0, p});
            continue;
        }
        // njobs=1 to the picker: each job splits as if it owned the pool.
        // Jobs here are heterogeneous (a 4k-chunk split-table job next to a
        // 29-point variable job); modeling the shared pool would make the
        // big job's tasks coarse and cap the makespan at one giant task.
        msm_pick_c_parts_ifma(jb.k, 1, nthreads, jb.bits, &jb.c, &jb.parts);
        jb.windows = (jb.bits + jb.c - 1) / jb.c;
        jb.ngroups = (jb.windows + 7) / 8;
        jb.wsums.assign((size_t)jb.parts * jb.windows, PT_IDENT);
        if (jb.parts > 1 && !jb.idx) {
            jb.iota.resize(jb.k);
            for (size_t i = 0; i < jb.k; ++i) jb.iota[i] = (u32)i;
            jb.idx = jb.iota.data();
        }
        for (int p = 0; p < jb.parts; ++p)
            for (int g = 0; g < jb.ngroups; ++g) tasks.push_back({j, g, p});
    }
    parallel_for(tasks.size(), nthreads, [&](size_t t) {
        const Task &tk = tasks[t];
        MixedJob &jb = jobs[tk.j];
        size_t chunk = (jb.k + jb.parts - 1) / jb.parts;
        size_t b = (size_t)tk.p * chunk;
        size_t e = b + chunk > jb.k ? jb.k : b + chunk;
        if (jb.bytes) {
            if (b >= e) { jb.wsums[tk.p] = PT_IDENT; return; }
            std::vector<u64> buckets((size_t)256 * 16, 0);
            msm_bytes_chunk_ifma(jb.s, jb.idx, *jb.pts, jb.fe52, jb.base_n,
                                 b, e, buckets.data());
            msm_bytes_reduce(buckets.data(), jb.wsums[tk.p]);
            return;
        }
        int w0 = tk.g * 8;
        int nl = jb.windows - w0 < 8 ? jb.windows - w0 : 8;
        Pt *out = jb.wsums.data() + (size_t)tk.p * jb.windows;
        if (b >= e) {
            for (int L = 0; L < nl; ++L) out[w0 + L] = PT_IDENT;
            return;
        }
        msm_window_group_ifma(jb.s + 32 * b, jb.idx ? jb.idx + b : nullptr,
                              *jb.pts, jb.fe52, e - b, jb.c, w0, nl, out);
    });
    parallel_for((size_t)njobs, njobs < nthreads ? njobs : nthreads,
                 [&](size_t j) {
        MixedJob &jb = jobs[j];
        if (jb.bytes) {
            Pt acc = jb.wsums[0];
            for (int p = 1; p < jb.parts; ++p) {
                Pt t;
                pt_add(t, acc, jb.wsums[p]);
                acc = t;
            }
            jb.result = acc;
            return;
        }
        Pt *acc = jb.wsums.data();
        for (int p = 1; p < jb.parts; ++p) {
            const Pt *part = acc + (size_t)p * jb.windows;
            for (int w = 0; w < jb.windows; ++w) {
                Pt t;
                pt_add(t, acc[w], part[w]);
                acc[w] = t;
            }
        }
        msm_combine_pt(acc, jb.windows, jb.c, jb.result);
    });
}
#endif  // BP_HAVE_IFMA

// Two same-size MSMs over one point table, all window groups of both sides
// flattened onto the pool (the IPP's L/R pair: independent until both are
// absorbed into the transcript, so their bucket phases share the cores
// instead of running back to back).
static void msm_run_pair(const u8 *sL, const u32 *idxL,
                         const u8 *sR, const u32 *idxR,
                         const std::vector<AffinePt> &pts, size_t k,
                         u8 *Lx, u8 *Ly, u8 *Li,
                         u8 *Rx, u8 *Ry, u8 *Ri,
                         const u64 *fe52_cache = nullptr, int bits = 252) {
#ifdef BP_HAVE_IFMA
    if (k >= 16) {
        unsigned hw = std::thread::hardware_concurrency();
        int nthreads = (int)(hw ? hw : 1);
        std::vector<u64> fe_local;
        if (!fe52_cache) {
            fe_local = fe52_table(pts);
            fe52_cache = fe_local.data();
        }
        MsmJob jobs[2] = {{sL, idxL, Lx, Ly, Li}, {sR, idxR, Rx, Ry, Ri}};
        msm_run_ifma_jobs(jobs, 2, pts, fe52_cache, k, bits, nthreads);
        return;
    }
#endif
    parallel_for(2, 2, [&](size_t t) {
        if (t == 0) msm_run(sL, idxL, pts, k, Lx, Ly, Li, fe52_cache, 0, bits);
        else        msm_run(sR, idxR, pts, k, Rx, Ry, Ri, fe52_cache, 0, bits);
    });
}

// ---- 64-bit-chunk scalar splitting against pre-shifted base copies ----
//
// A table with split = 4 holds [P | 2^64 P | 2^128 P | 2^192 P] blocks; a
// 252-bit scalar splits into four 64-bit chunks (plain integer identity
// s = s0 + 2^64 s1 + 2^128 s2 + 2^192 s3), so the MSM runs over 4k points
// with 64-bit scalars.  Total bucket adds stay ~k*252/c, but the serial
// window-combine chain drops from 252 to 64 doublings and the window count
// packs into two 8-lane IFMA groups — the dominant cost at proof-scale k.
static void expand_split4(const u8 *scalars, const u32 *indices, size_t k,
                          size_t base_n, std::vector<u8> &s4,
                          std::vector<u32> &i4) {
    s4.assign(32 * 4 * k, 0);
    i4.resize(4 * k);
    for (size_t j = 0; j < 4; ++j) {
        u8 *dst = s4.data() + 32 * j * k;
        u32 *idst = i4.data() + j * k;
        u32 off = (u32)(j * base_n);
        for (size_t i = 0; i < k; ++i) {
            memcpy(dst + 32 * i, scalars + 32 * i + 8 * j, 8);
            idst[i] = off + (indices ? indices[i] : (u32)i);
        }
    }
}

// Batched affine normalization staying in the field domain (Montgomery trick).
static void pts_to_affine_fp(AffinePt *out, const Pt *pts, size_t n) {
    std::vector<Fp> prefix(n);
    Fp acc = FP_ONE;
    for (size_t i = 0; i < n; ++i) {
        prefix[i] = acc;
        if (!pt_is_ident(pts[i])) { Fp t; fp_mul(t, acc, pts[i].Z); acc = t; }
    }
    Fp inv_acc;
    fp_inv(inv_acc, acc);
    for (size_t i = n; i-- > 0;) {
        if (pt_is_ident(pts[i])) { out[i].inf = 1; continue; }
        Fp zinv, t;
        fp_mul(zinv, inv_acc, prefix[i]);
        fp_mul(t, inv_acc, pts[i].Z);
        inv_acc = t;
        Fp z2, z3;
        fp_sqr(z2, zinv);
        fp_mul(z3, z2, zinv);
        fp_mul(out[i].x, pts[i].X, z2);
        fp_mul(out[i].y, pts[i].Y, z3);
        out[i].inf = 0;
    }
}

// out[i] = 2^64 * in[i] for a block of <= 8 points (8-wide doubling chain
// under IFMA; scalar fallback otherwise).
static void shift64_block(const AffinePt *in, AffinePt *out, size_t n) {
    std::vector<Pt> res(n);
#ifdef BP_HAVE_IFMA
    for (size_t g = 0; g < n; g += 8) {
        int nl = (int)((n - g) < 8 ? (n - g) : 8);
        alignas(64) u64 slots[8][16];
        memset(slots, 0, sizeof(slots));
        u64 *bp[8];
        __mmask8 act = 0;
        for (int L = 0; L < 8; ++L) bp[L] = slots[L];
        for (int L = 0; L < nl; ++L) {
            if (in[g + L].inf) continue;
            Pt p;
            p.X = in[g + L].x; p.Y = in[g + L].y; p.Z = FP_ONE;
            slot_from_pt(slots[L], p);
            act |= (__mmask8)(1u << L);
        }
        Jac8 acc;
        jac8_load(acc, bp, act);
        for (int d = 0; d < 64; ++d) jac8_dbl(acc);
        jac8_store(acc, bp, act);
        for (int L = 0; L < nl; ++L) {
            if (in[g + L].inf) res[g + L] = PT_IDENT;
            else slot_to_pt(res[g + L], slots[L]);
        }
    }
#else
    for (size_t i = 0; i < n; ++i) {
        if (in[i].inf) { res[i] = PT_IDENT; continue; }
        Pt p;
        p.X = in[i].x; p.Y = in[i].y; p.Z = FP_ONE;
        for (int d = 0; d < 64; ++d) { Pt t; pt_dbl(t, p); p = t; }
        res[i] = p;
    }
#endif
    pts_to_affine_fp(out, res.data(), n);
}

// out[i] = 2^8 * in[i] for a block of <= 8 points (byte-shift table build).
static void shift8_block(const AffinePt *in, AffinePt *out, size_t n) {
    std::vector<Pt> res(n);
#ifdef BP_HAVE_IFMA
    for (size_t g = 0; g < n; g += 8) {
        int nl = (int)((n - g) < 8 ? (n - g) : 8);
        alignas(64) u64 slots[8][16];
        memset(slots, 0, sizeof(slots));
        u64 *bp[8];
        __mmask8 act = 0;
        for (int L = 0; L < 8; ++L) bp[L] = slots[L];
        for (int L = 0; L < nl; ++L) {
            if (in[g + L].inf) continue;
            Pt p;
            p.X = in[g + L].x; p.Y = in[g + L].y; p.Z = FP_ONE;
            slot_from_pt(slots[L], p);
            act |= (__mmask8)(1u << L);
        }
        Jac8 acc;
        jac8_load(acc, bp, act);
        for (int d = 0; d < 8; ++d) jac8_dbl(acc);
        jac8_store(acc, bp, act);
        for (int L = 0; L < nl; ++L) {
            if (in[g + L].inf) res[g + L] = PT_IDENT;
            else slot_to_pt(res[g + L], slots[L]);
        }
    }
#else
    for (size_t i = 0; i < n; ++i) {
        if (in[i].inf) { res[i] = PT_IDENT; continue; }
        Pt p;
        p.X = in[i].x; p.Y = in[i].y; p.Z = FP_ONE;
        for (int d = 0; d < 8; ++d) { Pt t; pt_dbl(t, p); p = t; }
        res[i] = p;
    }
#endif
    pts_to_affine_fp(out, res.data(), n);
}

static std::vector<AffinePt> load_affine(const u8 *xs, const u8 *ys,
                                         const u8 *inf, size_t n) {
    std::vector<AffinePt> pts(n);
    for (size_t i = 0; i < n; ++i) {
        pts[i].inf = inf[i];
        if (!inf[i]) {
            fp_from_bytes(pts[i].x, xs + 32 * i);
            fp_from_bytes(pts[i].y, ys + 32 * i);
        }
    }
    return pts;
}

void bp_msm(const u8 *scalars, const u8 *xs, const u8 *ys, const u8 *inf,
            size_t n, u8 *out_x, u8 *out_y, u8 *out_inf) {
    std::vector<AffinePt> pts = load_affine(xs, ys, inf, n);
    msm_run(scalars, nullptr, pts, n, out_x, out_y, out_inf);
}

// Indexed MSM over a pre-registered point table (see bp_points_new).
struct PointTable {
    std::vector<AffinePt> pts;   // split == 4: blocks [P | 2^64P | 2^128P | 2^192P]
    size_t base_n = 0;
    int split = 1;
    // Byte-shift table (small-MSM fast path): blocks [2^(8t) P] for
    // t = 0..31, so every byte of a canonical scalar is a digit against a
    // SINGLE shared bucket space — one weighted reduction for the whole
    // MSM instead of per-window suffix sums + a doubling combine chain.
    bool has_bytes = false;
    std::vector<AffinePt> pts_b;   // 32 * base_n entries, block-major t
#ifdef BP_HAVE_IFMA
    std::vector<u64> fe52;
    std::vector<u64> fe52_b;
#endif
};

void *bp_points_new(const u8 *xs, const u8 *ys, const u8 *inf, size_t n) {
    PointTable *t = new PointTable();
    t->pts = load_affine(xs, ys, inf, n);
    t->base_n = n;
#ifdef BP_HAVE_IFMA
    t->fe52 = fe52_table(t->pts);
#endif
    return t;
}

// Split-table registration: precompute the 2^64/2^128/2^192 base shifts
// (one-time, 8-wide doubling chains threaded across the pool) so later MSMs
// run with 64-bit scalar chunks.
void *bp_points_new_split(const u8 *xs, const u8 *ys, const u8 *inf, size_t n) {
    PointTable *t = new PointTable();
    t->base_n = n;
    t->split = 4;
    t->pts.resize(4 * n);
    std::vector<AffinePt> base = load_affine(xs, ys, inf, n);
    std::copy(base.begin(), base.end(), t->pts.begin());
    unsigned hw = std::thread::hardware_concurrency();
    for (int j = 1; j < 4; ++j) {
        const AffinePt *src = t->pts.data() + (size_t)(j - 1) * n;
        AffinePt *dst = t->pts.data() + (size_t)j * n;
        size_t ngroups = (n + 7) / 8;
        parallel_for(ngroups, (int)(hw ? hw : 1), [&](size_t g) {
            size_t b = 8 * g;
            size_t e = (b + 8 > n) ? n : b + 8;
            shift64_block(src + b, dst + b, e - b);
        });
    }
#ifdef BP_HAVE_IFMA
    t->fe52 = fe52_table(t->pts);
#endif
    // Byte-shift table for the small-MSM path.  Memory is 32 blocks of
    // base_n AffinePt (+fe52): ~6 KB/point — gate by size so huge
    // aggregated-generator tables (m = 64: 8k+ points, whose MSMs use the
    // split path anyway) skip the build.
    size_t byte_max = 2048;
    if (const char *env = getenv("BP_BYTE_TABLE_MAX")) {
        long v = atol(env);
        if (v >= 0) byte_max = (size_t)v;
    }
    if (n <= byte_max) {
        t->pts_b.resize(32 * n);
        for (int j = 0; j < 4; ++j)
            std::copy(t->pts.begin() + (size_t)j * n,
                      t->pts.begin() + (size_t)(j + 1) * n,
                      t->pts_b.begin() + (size_t)(8 * j) * n);
        for (int j = 0; j < 4; ++j) {
            for (int s = 1; s < 8; ++s) {
                const AffinePt *src = t->pts_b.data() + (size_t)(8 * j + s - 1) * n;
                AffinePt *dst = t->pts_b.data() + (size_t)(8 * j + s) * n;
                size_t ngroups = (n + 7) / 8;
                parallel_for(ngroups, (int)(hw ? hw : 1), [&](size_t g) {
                    size_t b = 8 * g;
                    size_t e = (b + 8 > n) ? n : b + 8;
                    shift8_block(src + b, dst + b, e - b);
                });
            }
        }
#ifdef BP_HAVE_IFMA
        t->fe52_b = fe52_table(t->pts_b);
#endif
        t->has_bytes = true;
    }
    return t;
}

void bp_points_free(void *table) { delete (PointTable *)table; }

void bp_msm_indexed(void *table, const u8 *scalars, const u32 *indices, size_t k,
                    u8 *out_x, u8 *out_y, u8 *out_inf) {
    PointTable *t = (PointTable *)table;
#ifdef BP_HAVE_IFMA
    if (t->has_bytes && k <= bytes_k_max() && k >= 2) {
        unsigned hw = std::thread::hardware_concurrency();
        MsmJob job{scalars, indices, out_x, out_y, out_inf};
        msm_run_bytes_jobs(&job, 1, t->pts_b, t->fe52_b.data(), t->base_n, k,
                           (int)(hw ? hw : 1));
        return;
    }
#endif
    const u8 *s = scalars;
    const u32 *idx = indices;
    size_t kk = k;
    int bits = 252;
    std::vector<u8> s4;
    std::vector<u32> i4;
    if (t->split == 4) {
        expand_split4(scalars, indices, k, t->base_n, s4, i4);
        s = s4.data(); idx = i4.data(); kk = 4 * k; bits = 64;
    }
#ifdef BP_HAVE_IFMA
    msm_run(s, idx, t->pts, kk, out_x, out_y, out_inf, t->fe52.data(), 0, bits);
#else
    msm_run(s, idx, t->pts, kk, out_x, out_y, out_inf, nullptr, 0, bits);
#endif
}

// Verifier mega-check: table-indexed fixed part + variable-base part as ONE
// pool dispatch (see msm_run_mixed), returning the summed point.  The
// reference computes the same single MSM at src/r1cs/verifier.rs:516-547;
// here the fixed-generator columns ride the pre-shifted split table
// (64-bit chunks) while the per-proof points (A, S, T_i, V, L_j, R_j) run
// at full scalar width — with shared cores and overlapped combine tails.
void bp_mega_check(void *table,
                   const u8 *s_fixed, const u32 *idx_fixed, size_t k_fixed,
                   const u8 *s_var, const u8 *xs, const u8 *ys,
                   const u8 *inf, size_t k_var,
                   u8 *out_x, u8 *out_y, u8 *out_inf) {
    PointTable *t = (PointTable *)table;
    const u8 *sf = s_fixed;
    const u32 *idxf = idx_fixed;
    size_t kf = k_fixed;
    int bits_f = 252;
    std::vector<u8> s4;
    std::vector<u32> i4;
    bool fixed_bytes = false;
#ifdef BP_HAVE_IFMA
    fixed_bytes = t->has_bytes && k_fixed <= bytes_k_max();
#endif
    if (t->split == 4 && !fixed_bytes) {
        expand_split4(s_fixed, idx_fixed, k_fixed, t->base_n, s4, i4);
        sf = s4.data(); idxf = i4.data(); kf = 4 * k_fixed; bits_f = 64;
    }
    std::vector<AffinePt> var_pts = load_affine(xs, ys, inf, k_var);
#ifdef BP_HAVE_IFMA
    if (kf >= 16 && k_var >= 16) {
        std::vector<u64> var_fe = fe52_table(var_pts);
        unsigned hw = std::thread::hardware_concurrency();
        int nthreads = (int)(hw ? hw : 1);
        // Small mega-checks (m=1: ~550 points) are latency-bound: extra
        // workers only add pool wake-up jitter on a shared box — the
        // round-3 m=1 verify spread (950 us min vs 1,138 us median) was
        // exactly this.  Cap threads by work size; BP_THREADS overrides.
        const char *bp_threads = getenv("BP_THREADS");
        if (bp_threads && *bp_threads) {
            int v = atoi(bp_threads);
            if (v > 0) nthreads = v;
        } else {
            // byte mode keeps kf at k_fixed; normalize to split-equivalent
            // work units so the thread cap stays calibrated
            size_t work = (fixed_bytes ? 4 * k_fixed : kf) + k_var;
            int cap = (int)(work / BP_MEGA_WORK_PER_THREAD);
            if (cap < 1) cap = 1;
            if (nthreads > cap) nthreads = cap;
        }
        MixedJob jobs[2];
        if (fixed_bytes) {
            // byte-table fixed part: raw 252-bit scalars, shared buckets,
            // one weighted reduction per part — no split expansion
            jobs[0].s = s_fixed; jobs[0].idx = idx_fixed; jobs[0].pts = &t->pts_b;
            jobs[0].fe52 = t->fe52_b.data(); jobs[0].k = k_fixed;
            jobs[0].bits = 252; jobs[0].bytes = true; jobs[0].base_n = t->base_n;
        } else {
            jobs[0].s = sf; jobs[0].idx = idxf; jobs[0].pts = &t->pts;
            jobs[0].fe52 = t->fe52.data(); jobs[0].k = kf; jobs[0].bits = bits_f;
        }
        jobs[1].s = s_var; jobs[1].idx = nullptr; jobs[1].pts = &var_pts;
        jobs[1].fe52 = var_fe.data(); jobs[1].k = k_var; jobs[1].bits = 252;
        msm_run_mixed(jobs, 2, nthreads);
        Pt sum;
        pt_add(sum, jobs[0].result, jobs[1].result);
        pt_to_affine(out_x, out_y, out_inf, sum);
        return;
    }
#endif
    if (fixed_bytes) {
        // mixed branch not taken (tiny variable part): expand for the
        // split path after all
        expand_split4(s_fixed, idx_fixed, k_fixed, t->base_n, s4, i4);
        sf = s4.data(); idxf = i4.data(); kf = 4 * k_fixed; bits_f = 64;
    }
    u8 fx[32], fy[32], fi;
    msm_run(sf, idxf, t->pts, kf, fx, fy, &fi,
#ifdef BP_HAVE_IFMA
            t->fe52.data(),
#else
            nullptr,
#endif
            0, bits_f);
    u8 vx[32], vy[32], vi;
    msm_run(s_var, nullptr, var_pts, k_var, vx, vy, &vi);
    Pt a, b, sum;
    pt_from_affine(a, fx, fy, fi);
    pt_from_affine(b, vx, vy, vi);
    pt_add(sum, a, b);
    pt_to_affine(out_x, out_y, out_inf, sum);
}

// ---- per-element double-scalar fold: out_i = ul_i * L_i + ur_i * R_i ----
// (w-NAF-free simple 4-bit windowed Straus per element; scalars vary per
//  element to cover the IPP first-round factor folding)
void bp_fold_points(const u8 *ul, const u8 *ur,
                    const u8 *xl, const u8 *yl, const u8 *il,
                    const u8 *xr, const u8 *yr, const u8 *ir,
                    size_t n, u8 *out_x, u8 *out_y, u8 *out_inf) {
    std::vector<Pt> results(n);
    Pt tableL[16], tableR[16];
    for (size_t i = 0; i < n; ++i) {
        Pt L, Rp;
        pt_from_affine(L, xl + 32 * i, yl + 32 * i, il[i]);
        pt_from_affine(Rp, xr + 32 * i, yr + 32 * i, ir[i]);
        tableL[0] = PT_IDENT; tableR[0] = PT_IDENT;
        tableL[1] = L;        tableR[1] = Rp;
        for (int j = 2; j < 16; ++j) {
            pt_add(tableL[j], tableL[j - 1], L);
            pt_add(tableR[j], tableR[j - 1], Rp);
        }
        const u8 *sl = ul + 32 * i;
        const u8 *sr = ur + 32 * i;
        Pt acc = PT_IDENT;
        for (int w = 63; w >= 0; --w) {
            if (w != 63) {
                Pt t;
                pt_dbl(t, acc); pt_dbl(acc, t); pt_dbl(t, acc); pt_dbl(acc, t);
            }
            u64 dl = scalar_window(sl, w * 4, 4);
            u64 dr = scalar_window(sr, w * 4, 4);
            if (dl) { Pt t; pt_add(t, acc, tableL[dl]); acc = t; }
            if (dr) { Pt t; pt_add(t, acc, tableR[dr]); acc = t; }
        }
        results[i] = acc;
    }
    pt_to_affine_batch(out_x, out_y, out_inf, results.data(), n);
}

// ---- batch fixed-base: out_i = scalar_i * G (generator derivation) ----
void bp_fixed_base_mul(const u8 *scalars, size_t n,
                       const u8 *base_x, const u8 *base_y,
                       u8 *out_x, u8 *out_y, u8 *out_inf) {
    Pt base;
    pt_from_affine(base, base_x, base_y, 0);
    // 4-bit window table of the shared base.
    Pt table[16];
    table[0] = PT_IDENT; table[1] = base;
    for (int j = 2; j < 16; ++j) pt_add(table[j], table[j - 1], base);
    std::vector<Pt> results(n);
    for (size_t i = 0; i < n; ++i) {
        const u8 *s = scalars + 32 * i;
        Pt acc = PT_IDENT;
        for (int w = 63; w >= 0; --w) {
            if (w != 63) {
                Pt t;
                pt_dbl(t, acc); pt_dbl(acc, t); pt_dbl(t, acc); pt_dbl(acc, t);
            }
            u64 d = scalar_window(s, w * 4, 4);
            if (d) { Pt t; pt_add(t, acc, table[d]); acc = t; }
        }
        results[i] = acc;
    }
    pt_to_affine_batch(out_x, out_y, out_inf, results.data(), n);
}

// ---- batch pairwise add: out_i = A_i + B_i ----
void bp_point_add_batch(const u8 *xa, const u8 *ya, const u8 *ia,
                        const u8 *xb, const u8 *yb, const u8 *ib,
                        size_t n, u8 *out_x, u8 *out_y, u8 *out_inf) {
    std::vector<Pt> results(n);
    for (size_t i = 0; i < n; ++i) {
        Pt A, B;
        pt_from_affine(A, xa + 32 * i, ya + 32 * i, ia[i]);
        pt_from_affine(B, xb + 32 * i, yb + 32 * i, ib[i]);
        pt_add(results[i], A, B);
    }
    pt_to_affine_batch(out_x, out_y, out_inf, results.data(), n);
}

}  // extern "C"

// ===========================================================================
// Scalar field (mod r, the curve group order) — Montgomery, 4 limbs
// ===========================================================================

struct Fr { u64 v[4]; };

static const Fr R_MOD  = {{0x1e66a241adc64d2fULL, 0xb781126dcae7b232ULL,
                           0xffffffffffffffffULL, 0x0800000000000010ULL}};
static const u64 R_INV = 0xbb6b3c4ce8bde631ULL;  // -r^{-1} mod 2^64
static const Fr R_R2   = {{0x6021b3f1ea1c688dULL, 0x509cf64d14ce60b9ULL,
                           0xbaf0ab4cf78bbabbULL, 0x07d9e57c2333766eULL}};
static const Fr FR_ONE = {{0x51925a0bf4fca74fULL, 0xc75ec4b46df16beeULL,
                           0x8ULL, 0x07fffffffffffdf1ULL}};

static inline bool fr_geq(const Fr &a, const Fr &m) {
    for (int i = 3; i >= 0; --i) {
        if (a.v[i] > m.v[i]) return true;
        if (a.v[i] < m.v[i]) return false;
    }
    return true;
}

static inline void fr_sub_raw(Fr &a, const Fr &m) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a.v[i] - m.v[i] - borrow;
        a.v[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
}

static inline void fr_add(Fr &out, const Fr &a, const Fr &b) {
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
        u128 s = (u128)a.v[i] + b.v[i] + carry;
        out.v[i] = (u64)s;
        carry = s >> 64;
    }
    if (carry || fr_geq(out, R_MOD)) fr_sub_raw(out, R_MOD);
}

static void fr_mul(Fr &out, const Fr &a, const Fr &b) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; ++i) {
        u128 carry = 0;
        for (int j = 0; j < 4; ++j) {
            u128 cur = (u128)t[j] + (u128)a.v[i] * b.v[j] + carry;
            t[j] = (u64)cur;
            carry = cur >> 64;
        }
        u128 cur = (u128)t[4] + carry;
        t[4] = (u64)cur;
        t[5] = (u64)(cur >> 64);

        u64 m = t[0] * R_INV;
        carry = ((u128)t[0] + (u128)m * R_MOD.v[0]) >> 64;
        for (int j = 1; j < 4; ++j) {
            u128 c2 = (u128)t[j] + (u128)m * R_MOD.v[j] + carry;
            t[j - 1] = (u64)c2;
            carry = c2 >> 64;
        }
        cur = (u128)t[4] + carry;
        t[3] = (u64)cur;
        t[4] = t[5] + (u64)(cur >> 64);
        t[5] = 0;
    }
    out.v[0] = t[0]; out.v[1] = t[1]; out.v[2] = t[2]; out.v[3] = t[3];
    if (t[4] || fr_geq(out, R_MOD)) fr_sub_raw(out, R_MOD);
}

static void fr_from_bytes(Fr &out, const u8 *le32) {
    Fr raw;
    memcpy(raw.v, le32, 32);
    // raw may be >= r (callers pass canonical values; reduce defensively)
    while (fr_geq(raw, R_MOD)) fr_sub_raw(raw, R_MOD);
    fr_mul(out, raw, R_R2);
}

static void fr_to_bytes(u8 *le32, const Fr &a) {
    Fr one_raw = {{1, 0, 0, 0}};
    Fr std_form;
    fr_mul(std_form, a, one_raw);
    memcpy(le32, std_form.v, 32);
}

// (hi*2^256 + lo) mod r for a 64-byte LE buffer -> standard domain
static void fr_from_bytes_wide(Fr &out, const u8 *le64) {
    Fr lo_raw, hi_raw, lo_m, hi_m, lo_std;
    memcpy(lo_raw.v, le64, 32);
    memcpy(hi_raw.v, le64 + 32, 32);
    // lo mod r = montmul(montmul(lo, R2), 1)
    fr_mul(lo_m, lo_raw, R_R2);
    Fr one_raw = {{1, 0, 0, 0}};
    fr_mul(lo_std, lo_m, one_raw);
    // hi * 2^256 mod r = montmul(hi, R2)
    fr_mul(hi_m, hi_raw, R_R2);
    fr_add(out, lo_std, hi_m);  // standard domain
}

// a^(r-2) (for challenge inverses); input/output Montgomery domain
static void fr_inv(Fr &out, const Fr &a) {
    static const u64 e[4] = {0x1e66a241adc64d2dULL, 0xb781126dcae7b232ULL,
                             0xffffffffffffffffULL, 0x0800000000000010ULL};
    Fr result = FR_ONE, base = a;
    for (int limb = 0; limb < 4; ++limb) {
        u64 bits = e[limb];
        for (int i = 0; i < 64; ++i) {
            if (bits & 1) { Fr tmp; fr_mul(tmp, result, base); result = tmp; }
            bits >>= 1;
            if (limb == 3 && bits == 0) break;
            Fr sq; fr_mul(sq, base, base); base = sq;
        }
    }
    out = result;
}

// ===========================================================================
// transcript (keccak hash chain per docs/transcript-spec.md)
// ===========================================================================

struct Transcript { u8 state[32]; };

static void tr_absorb(Transcript &t, const u8 *label, size_t label_len,
                      const u8 *msg, size_t msg_len) {
    // state = keccak(state || pad_label(label) || msg)
    size_t padded = (label_len + 31) / 32 * 32;
    std::vector<u8> buf(32 + padded + msg_len, 0);
    memcpy(buf.data(), t.state, 32);
    memcpy(buf.data() + 32, label, label_len);
    if (msg_len) memcpy(buf.data() + 32 + padded, msg, msg_len);
    bp_keccak256(buf.data(), buf.size(), t.state);
}

static void tr_append_point_affine(Transcript &t, const u8 *label, size_t label_len,
                                   const u8 *x_le, const u8 *y_le, u8 inf) {
    u8 msg[64] = {0};
    if (!inf) { memcpy(msg, x_le, 32); memcpy(msg + 32, y_le, 32); }
    tr_absorb(t, label, label_len, msg, 64);
}

static void tr_challenge_scalar(Transcript &t, const u8 *label, size_t label_len,
                                Fr &out_mont) {
    // state = keccak(state || pad_label(label)); low = state; high = keccak(low)
    tr_absorb(t, label, label_len, nullptr, 0);
    u8 wide[64];
    memcpy(wide, t.state, 32);
    bp_keccak256(t.state, 32, wide + 32);
    Fr std_val;
    fr_from_bytes_wide(std_val, wide);
    fr_mul(out_mont, std_val, R_R2);  // into Montgomery domain
}

// ===========================================================================
// full IPP prover (coefficient tracking) in one call
// ===========================================================================

extern "C" void bp_ipp_create(
    u8 *transcript_state,                       // 32 bytes, in/out (dom-sep done)
    const u8 *q_x, const u8 *q_y, u8 q_inf,     // Q
    const u8 *g_factors, const u8 *h_factors,   // 32*n each (canonical LE)
    const u8 *g_xs, const u8 *g_ys, const u8 *g_inf,
    const u8 *h_xs, const u8 *h_ys, const u8 *h_inf,
    const u8 *a_in, const u8 *b_in,             // 32*n each
    size_t n,
    u8 *out_lr_x, u8 *out_lr_y, u8 *out_lr_inf, // 2*lg(n) points: L0,R0,L1,R1,...
    u8 *out_a, u8 *out_b)                       // 32 bytes each
{
    Transcript tr;
    memcpy(tr.state, transcript_state, 32);

    // load generators + Q into one affine table: [G | H | Q]
    std::vector<AffinePt> pts(2 * n + 1);
    for (size_t i = 0; i < n; ++i) {
        pts[i].inf = g_inf[i];
        if (!g_inf[i]) { fp_from_bytes(pts[i].x, g_xs + 32 * i); fp_from_bytes(pts[i].y, g_ys + 32 * i); }
        pts[n + i].inf = h_inf[i];
        if (!h_inf[i]) { fp_from_bytes(pts[n + i].x, h_xs + 32 * i); fp_from_bytes(pts[n + i].y, h_ys + 32 * i); }
    }
    pts[2 * n].inf = q_inf;
    if (!q_inf) { fp_from_bytes(pts[2 * n].x, q_x); fp_from_bytes(pts[2 * n].y, q_y); }

    std::vector<Fr> wG(n), wH(n), av(n), bv(n);
    for (size_t i = 0; i < n; ++i) {
        fr_from_bytes(wG[i], g_factors + 32 * i);
        fr_from_bytes(wH[i], h_factors + 32 * i);
        fr_from_bytes(av[i], a_in + 32 * i);
        fr_from_bytes(bv[i], b_in + 32 * i);
    }

    std::vector<u8> sL_bytes(32 * (n + 1)), sR_bytes(32 * (n + 1));
    std::vector<u32> idxL(n + 1), idxR(n + 1);
    size_t round = 0;
#ifdef BP_HAVE_IFMA
    std::vector<u64> fe52 = fe52_table(pts);
    const u64 *fe52p = fe52.data();
#else
    const u64 *fe52p = nullptr;
#endif

    size_t cur = n;
    while (cur > 1) {
        size_t half = cur / 2;
        // c_L = <a_L, b_R>, c_R = <a_R, b_L>
        Fr c_L = {{0,0,0,0}}, c_R = {{0,0,0,0}}, t0;
        for (size_t i = 0; i < half; ++i) {
            fr_mul(t0, av[i], bv[half + i]); fr_add(c_L, c_L, t0);
            fr_mul(t0, av[half + i], bv[i]); fr_add(c_R, c_R, t0);
        }

        u8 Lx[32], Ly[32], Li, Rx[32], Ry[32], Ri;
        for (size_t i = 0; i < n; ++i) {
            size_t r = i % cur;
            Fr s;
            if (r >= half) { fr_mul(s, wG[i], av[r - half]); idxL[i] = (u32)i; }
            else           { fr_mul(s, wH[i], bv[half + r]); idxL[i] = (u32)(n + i); }
            fr_to_bytes(sL_bytes.data() + 32 * i, s);
            if (r >= half) { fr_mul(s, wH[i], bv[r - half]); idxR[i] = (u32)(n + i); }
            else           { fr_mul(s, wG[i], av[half + r]); idxR[i] = (u32)i; }
            fr_to_bytes(sR_bytes.data() + 32 * i, s);
        }
        fr_to_bytes(sL_bytes.data() + 32 * n, c_L);
        fr_to_bytes(sR_bytes.data() + 32 * n, c_R);
        idxL[n] = idxR[n] = (u32)(2 * n);
        msm_run_pair(sL_bytes.data(), idxL.data(), sR_bytes.data(), idxR.data(),
                     pts, n + 1, Lx, Ly, &Li, Rx, Ry, &Ri, fe52p);

        memcpy(out_lr_x + 64 * round, Lx, 32); memcpy(out_lr_x + 64 * round + 32, Rx, 32);
        memcpy(out_lr_y + 64 * round, Ly, 32); memcpy(out_lr_y + 64 * round + 32, Ry, 32);
        out_lr_inf[2 * round] = Li; out_lr_inf[2 * round + 1] = Ri;

        tr_append_point_affine(tr, (const u8 *)"L", 1, Lx, Ly, Li);
        tr_append_point_affine(tr, (const u8 *)"R", 1, Rx, Ry, Ri);
        Fr u, u_inv;
        tr_challenge_scalar(tr, (const u8 *)"u", 1, u);
        fr_inv(u_inv, u);

        if (half > 1) {
            for (size_t i = 0; i < n; ++i) {
                Fr t;
                if ((i % cur) < half) { fr_mul(t, wG[i], u_inv); wG[i] = t; fr_mul(t, wH[i], u); wH[i] = t; }
                else                  { fr_mul(t, wG[i], u); wG[i] = t; fr_mul(t, wH[i], u_inv); wH[i] = t; }
            }
        }
        for (size_t i = 0; i < half; ++i) {
            Fr t1, t2;
            fr_mul(t1, av[i], u); fr_mul(t2, av[half + i], u_inv); fr_add(av[i], t1, t2);
            fr_mul(t1, bv[i], u_inv); fr_mul(t2, bv[half + i], u); fr_add(bv[i], t1, t2);
        }
        cur = half;
        ++round;
    }

    fr_to_bytes(out_a, av[0]);
    fr_to_bytes(out_b, bv[0]);
    memcpy(transcript_state, tr.state, 32);
}

// IPP prover over a pre-registered split point table (bp_points_new_split).
// The table holds the fixed bases [.. G .. | .. H .. | B ..] with their
// 2^64/2^128/2^192 shifts; callers pass base-table offsets so one cached
// aggregated-generator table serves every proof size (g index = g_off + i,
// h index = h_off + i, Q term = (c_L * w) * table[q_idx] since Q = w * B).
// Each round's L/R MSM runs with 64-bit scalar chunks: the serial window
// combine is 64 doublings instead of 252 — the dominant cost at small n.
extern "C" void bp_ipp_create_table(
    u8 *transcript_state,                       // 32 bytes, in/out (dom-sep done)
    void *table_handle,                         // split PointTable
    const u8 *w_bytes,                          // 32B scalar w (Q = w*B)
    const u8 *g_factors, const u8 *h_factors,   // 32*n each (canonical LE)
    const u8 *a_in, const u8 *b_in,             // 32*n each
    size_t n, size_t g_off, size_t h_off, size_t q_idx,
    u8 *out_lr_x, u8 *out_lr_y, u8 *out_lr_inf, // 2*lg(n) points: L0,R0,L1,R1,...
    u8 *out_a, u8 *out_b)                       // 32 bytes each
{
    PointTable *table = (PointTable *)table_handle;
    Transcript tr;
    memcpy(tr.state, transcript_state, 32);

    std::vector<Fr> wG(n), wH(n), av(n), bv(n);
    Fr w;
    fr_from_bytes(w, w_bytes);
    for (size_t i = 0; i < n; ++i) {
        fr_from_bytes(wG[i], g_factors + 32 * i);
        fr_from_bytes(wH[i], h_factors + 32 * i);
        fr_from_bytes(av[i], a_in + 32 * i);
        fr_from_bytes(bv[i], b_in + 32 * i);
    }

    std::vector<u8> sL_bytes(32 * (n + 1)), sR_bytes(32 * (n + 1));
    std::vector<u32> idxL(n + 1), idxR(n + 1);
    std::vector<u8> sL4, sR4;
    std::vector<u32> iL4, iR4;
    const u64 *fe52p = nullptr;
#ifdef BP_HAVE_IFMA
    fe52p = table->fe52.data();
#endif

    size_t round = 0;
    size_t cur = n;
    while (cur > 1) {
        size_t half = cur / 2;
        Fr c_L = {{0, 0, 0, 0}}, c_R = {{0, 0, 0, 0}}, t0;
        for (size_t i = 0; i < half; ++i) {
            fr_mul(t0, av[i], bv[half + i]); fr_add(c_L, c_L, t0);
            fr_mul(t0, av[half + i], bv[i]); fr_add(c_R, c_R, t0);
        }

        for (size_t i = 0; i < n; ++i) {
            size_t r = i % cur;
            Fr s;
            if (r >= half) { fr_mul(s, wG[i], av[r - half]); idxL[i] = (u32)(g_off + i); }
            else           { fr_mul(s, wH[i], bv[half + r]); idxL[i] = (u32)(h_off + i); }
            fr_to_bytes(sL_bytes.data() + 32 * i, s);
            if (r >= half) { fr_mul(s, wH[i], bv[r - half]); idxR[i] = (u32)(h_off + i); }
            else           { fr_mul(s, wG[i], av[half + r]); idxR[i] = (u32)(g_off + i); }
            fr_to_bytes(sR_bytes.data() + 32 * i, s);
        }
        Fr cq;
        fr_mul(cq, c_L, w);
        fr_to_bytes(sL_bytes.data() + 32 * n, cq);
        fr_mul(cq, c_R, w);
        fr_to_bytes(sR_bytes.data() + 32 * n, cq);
        idxL[n] = idxR[n] = (u32)q_idx;

        u8 Lx[32], Ly[32], Li, Rx[32], Ry[32], Ri;
#ifdef BP_HAVE_IFMA
        if (table->has_bytes && n + 1 <= bytes_k_max()) {
            // byte-table pair: shared bucket space per job, one weighted
            // reduction each — no split expansion, no combine chain
            unsigned hw = std::thread::hardware_concurrency();
            MsmJob jobs[2] = {{sL_bytes.data(), idxL.data(), Lx, Ly, &Li},
                              {sR_bytes.data(), idxR.data(), Rx, Ry, &Ri}};
            msm_run_bytes_jobs(jobs, 2, table->pts_b, table->fe52_b.data(),
                               table->base_n, n + 1, (int)(hw ? hw : 1));
        } else
#endif
        {
            expand_split4(sL_bytes.data(), idxL.data(), n + 1, table->base_n,
                          sL4, iL4);
            expand_split4(sR_bytes.data(), idxR.data(), n + 1, table->base_n,
                          sR4, iR4);
            msm_run_pair(sL4.data(), iL4.data(), sR4.data(), iR4.data(),
                         table->pts, 4 * (n + 1), Lx, Ly, &Li, Rx, Ry, &Ri,
                         fe52p, 64);
        }

        memcpy(out_lr_x + 64 * round, Lx, 32); memcpy(out_lr_x + 64 * round + 32, Rx, 32);
        memcpy(out_lr_y + 64 * round, Ly, 32); memcpy(out_lr_y + 64 * round + 32, Ry, 32);
        out_lr_inf[2 * round] = Li; out_lr_inf[2 * round + 1] = Ri;

        tr_append_point_affine(tr, (const u8 *)"L", 1, Lx, Ly, Li);
        tr_append_point_affine(tr, (const u8 *)"R", 1, Rx, Ry, Ri);
        Fr u, u_inv;
        tr_challenge_scalar(tr, (const u8 *)"u", 1, u);
        fr_inv(u_inv, u);

        if (half > 1) {
            for (size_t i = 0; i < n; ++i) {
                Fr t;
                if ((i % cur) < half) { fr_mul(t, wG[i], u_inv); wG[i] = t; fr_mul(t, wH[i], u); wH[i] = t; }
                else                  { fr_mul(t, wG[i], u); wG[i] = t; fr_mul(t, wH[i], u_inv); wH[i] = t; }
            }
        }
        for (size_t i = 0; i < half; ++i) {
            Fr t1, t2;
            fr_mul(t1, av[i], u); fr_mul(t2, av[half + i], u_inv); fr_add(av[i], t1, t2);
            fr_mul(t1, bv[i], u_inv); fr_mul(t2, bv[half + i], u); fr_add(bv[i], t1, t2);
        }
        cur = half;
        ++round;
    }

    fr_to_bytes(out_a, av[0]);
    fr_to_bytes(out_b, bv[0]);
    memcpy(transcript_state, tr.state, 32);
}

// ---- sum of selected points: out = sum_{i: bits[i] != 0} P_i ----
extern "C" void bp_sum_selected(const u8 *bits, const u8 *xs, const u8 *ys,
                                const u8 *inf, size_t n,
                                u8 *out_x, u8 *out_y, u8 *out_inf) {
    Pt acc = PT_IDENT;
    for (size_t i = 0; i < n; ++i) {
        if (!bits[i] || inf[i]) continue;
        Fp px, py;
        fp_from_bytes(px, xs + 32 * i);
        fp_from_bytes(py, ys + 32 * i);
        Pt t;
        pt_add_mixed(t, acc, px, py);
        acc = t;
    }
    pt_to_affine(out_x, out_y, out_inf, acc);
}


// ---- aggregated range-proof party phases, batched across parties ----
// (state machine stays in Python — these are the compute kernels;
//  reference: docs/range-proof-protocol.md "Party's algorithm")

static inline void fr_sub(Fr &out, const Fr &a, const Fr &b) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a.v[i] - b.v[i] - borrow;
        out.v[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < 4; ++i) {
            u128 s = (u128)out.v[i] + R_MOD.v[i] + carry;
            out.v[i] = (u64)s;
            carry = s >> 64;
        }
    }
}

// Phase 1: A_j (bit commitment, no scalar muls) and S_j (2n+1-term MSM)
// for every party, threaded across parties.
extern "C" void bp_rp_phase1(
    size_t m, size_t n, const u64 *vs,
    const u8 *s_blinds,                                  // 32*m
    const u8 *sL, const u8 *sR,                          // 32*m*n each
    const u8 *gxs, const u8 *gys, const u8 *ginf,        // m*n points
    const u8 *hxs, const u8 *hys, const u8 *hinf,
    const u8 *abx, const u8 *aby, const u8 *abinf,       // m pts: a_blind*B~
    const u8 *bbx, const u8 *bby,                        // B_blinding
    u8 *out_ax, u8 *out_ay, u8 *out_ainf,
    u8 *out_sx, u8 *out_sy, u8 *out_sinf)
{
    std::vector<Pt> As(m), Ss(m);
    auto party = [&](size_t j) {
        const u8 *gx = gxs + 32 * n * j, *gy = gys + 32 * n * j, *gi = ginf + n * j;
        const u8 *hx = hxs + 32 * n * j, *hy = hys + 32 * n * j, *hi = hinf + n * j;
        // A_j = a_blind*B~ + sum_{bit=1} G_i + sum_{bit=0} -H_i
        Pt acc;
        pt_from_affine(acc, abx + 32 * j, aby + 32 * j, abinf[j]);
        for (size_t i = 0; i < n; ++i) {
            int bit = (int)((vs[j] >> i) & 1);
            Pt t;
            if (bit) {
                if (gi[i]) continue;
                Fp px, py;
                fp_from_bytes(px, gx + 32 * i);
                fp_from_bytes(py, gy + 32 * i);
                pt_add_mixed(t, acc, px, py);
            } else {
                if (hi[i]) continue;
                Fp px, py;
                fp_from_bytes(px, hx + 32 * i);
                fp_from_bytes(py, hy + 32 * i);
                fp_sub(py, FP_ZEROV, py);   // -H_i
                pt_add_mixed(t, acc, px, py);
            }
            acc = t;
        }
        As[j] = acc;
        // S_j = s_blind*B~ + <sL, G_j> + <sR, H_j>
        std::vector<AffinePt> pts(2 * n + 1);
        for (size_t i = 0; i < n; ++i) {
            pts[i].inf = gi[i];
            if (!gi[i]) { fp_from_bytes(pts[i].x, gx + 32 * i); fp_from_bytes(pts[i].y, gy + 32 * i); }
            pts[n + i].inf = hi[i];
            if (!hi[i]) { fp_from_bytes(pts[n + i].x, hx + 32 * i); fp_from_bytes(pts[n + i].y, hy + 32 * i); }
        }
        pts[2 * n].inf = 0;
        fp_from_bytes(pts[2 * n].x, bbx);
        fp_from_bytes(pts[2 * n].y, bby);
        std::vector<u8> sbytes(32 * (2 * n + 1));
        memcpy(sbytes.data(), sL + 32 * n * j, 32 * n);
        memcpy(sbytes.data() + 32 * n, sR + 32 * n * j, 32 * n);
        memcpy(sbytes.data() + 64 * n, s_blinds + 32 * j, 32);
        u8 sx[32], sy[32], si;
        msm_run(sbytes.data(), nullptr, pts, 2 * n + 1, sx, sy, &si, nullptr, 1);
        pt_from_affine(Ss[j], sx, sy, si);
    };
    unsigned hw = std::thread::hardware_concurrency();
    parallel_for(m, (int)(hw ? hw : 1), party);
    pt_to_affine_batch(out_ax, out_ay, out_ainf, As.data(), m);
    pt_to_affine_batch(out_sx, out_sy, out_sinf, Ss.data(), m);
}

// Phase 1 over a pre-registered split generator table (layout
// [G_agg(m*n) | H_agg(m*n) | ... | B_blinding]): A_j needs no scalar muls
// (bit-selected adds against the table's base block); S_j runs as a
// 64-bit-chunk split MSM (combine chain 64 doublings instead of 252).
extern "C" void bp_rp_phase1_table(
    size_t m, size_t n, const u64 *vs,
    const u8 *s_blinds,                                  // 32*m
    const u8 *sL, const u8 *sR,                          // 32*m*n each
    void *table_handle, size_t g_off, size_t h_off, size_t bb_idx,
    const u8 *abx, const u8 *aby, const u8 *abinf,       // m pts: a_blind*B~
    u8 *out_ax, u8 *out_ay, u8 *out_ainf,
    u8 *out_sx, u8 *out_sy, u8 *out_sinf)
{
    PointTable *table = (PointTable *)table_handle;
    const u64 *fe52p = nullptr;
#ifdef BP_HAVE_IFMA
    fe52p = table->fe52.data();
#endif
    std::vector<Pt> As(m), Ss(m);
    auto party = [&](size_t j) {
        // A_j = a_blind*B~ + sum_{bit=1} G_i + sum_{bit=0} -H_i
        Pt acc;
        pt_from_affine(acc, abx + 32 * j, aby + 32 * j, abinf[j]);
        for (size_t i = 0; i < n; ++i) {
            int bit = (int)((vs[j] >> i) & 1);
            const AffinePt &ap =
                table->pts[(bit ? g_off : h_off) + j * n + i];
            if (ap.inf) continue;
            Pt t;
            if (bit) {
                pt_add_mixed(t, acc, ap.x, ap.y);
            } else {
                Fp ny;
                fp_sub(ny, FP_ZEROV, ap.y);
                pt_add_mixed(t, acc, ap.x, ny);
            }
            acc = t;
        }
        As[j] = acc;
        // S_j = <sL_j, G_j> + <sR_j, H_j> + s_blind*B~ (split MSM)
        size_t k = 2 * n + 1;
        std::vector<u8> sbytes(32 * k);
        std::vector<u32> idx(k);
        memcpy(sbytes.data(), sL + 32 * n * j, 32 * n);
        memcpy(sbytes.data() + 32 * n, sR + 32 * n * j, 32 * n);
        memcpy(sbytes.data() + 64 * n, s_blinds + 32 * j, 32);
        for (size_t i = 0; i < n; ++i) {
            idx[i] = (u32)(g_off + j * n + i);
            idx[n + i] = (u32)(h_off + j * n + i);
        }
        idx[2 * n] = (u32)bb_idx;
        u8 sx[32], sy[32], si;
#ifdef BP_HAVE_IFMA
        if (table->has_bytes && k <= bytes_k_max()) {
            unsigned hww = std::thread::hardware_concurrency();
            MsmJob job{sbytes.data(), idx.data(), sx, sy, &si};
            msm_run_bytes_jobs(&job, 1, table->pts_b, table->fe52_b.data(),
                               table->base_n, k,
                               m > 1 ? 1 : (int)(hww ? hww : 1));
        } else
#endif
        {
            std::vector<u8> s4;
            std::vector<u32> i4;
            expand_split4(sbytes.data(), idx.data(), k, table->base_n, s4, i4);
            // parties already span the pool; keep per-party MSMs
            // single-threaded unless there is only one party
            msm_run(s4.data(), i4.data(), table->pts, 4 * k, sx, sy, &si,
                    fe52p, m > 1 ? 1 : 0, 64);
        }
        pt_from_affine(Ss[j], sx, sy, si);
    };
    unsigned hw = std::thread::hardware_concurrency();
    parallel_for(m, (int)(hw ? hw : 1), party);
    pt_to_affine_batch(out_ax, out_ay, out_ainf, As.data(), m);
    pt_to_affine_batch(out_sx, out_sy, out_sinf, Ss.data(), m);
}

// Phase 2: l/r polynomial coefficient vectors and t-poly coefficients per
// party given the bit challenge (y, z).
extern "C" void bp_rp_phase2(
    size_t m, size_t n, const u64 *vs,
    const u8 *y32, const u8 *z32,
    const u8 *sL, const u8 *sR,               // 32*m*n
    u8 *out_t012,                             // 32*3*m
    u8 *out_l0, u8 *out_l1, u8 *out_r0, u8 *out_r1)  // 32*m*n
{
    Fr y, z, zz, two;
    fr_from_bytes(y, y32);
    fr_from_bytes(z, z32);
    fr_mul(zz, z, z);
    u8 twob[32] = {2};
    fr_from_bytes(two, twob);
    // y^n for the per-party offset step
    Fr y_n = FR_ONE;
    for (size_t i = 0; i < n; ++i) { Fr t; fr_mul(t, y_n, y); y_n = t; }

    auto party = [&](size_t j, const Fr &oy0, const Fr &oz) {
        Fr ozz;
        fr_mul(ozz, zz, oz);
        Fr ey = oy0, e2 = FR_ONE;
        Fr t0 = {{0,0,0,0}}, t2 = {{0,0,0,0}}, tm = {{0,0,0,0}};
        const u8 *sLj = sL + 32 * n * j, *sRj = sR + 32 * n * j;
        u8 *l0 = out_l0 + 32 * n * j, *l1 = out_l1 + 32 * n * j;
        u8 *r0 = out_r0 + 32 * n * j, *r1 = out_r1 + 32 * n * j;
        for (size_t i = 0; i < n; ++i) {
            int bit = (int)((vs[j] >> i) & 1);
            Fr aL = bit ? FR_ONE : Fr{{0,0,0,0}};
            Fr aR;  // aL - 1
            if (bit) aR = Fr{{0,0,0,0}};
            else fr_sub(aR, Fr{{0,0,0,0}}, FR_ONE);
            Fr l0i, l1i, r0i, r1i, t, u;
            fr_sub(l0i, aL, z);
            fr_from_bytes(l1i, sLj + 32 * i);
            fr_add(t, aR, z);
            fr_mul(t, ey, t);
            fr_mul(u, ozz, e2);
            fr_add(r0i, t, u);
            fr_from_bytes(r1i, sRj + 32 * i);
            fr_mul(r1i, ey, r1i);
            fr_to_bytes(l0 + 32 * i, l0i);
            fr_to_bytes(l1 + 32 * i, l1i);
            fr_to_bytes(r0 + 32 * i, r0i);
            fr_to_bytes(r1 + 32 * i, r1i);
            // t-poly accumulation: t0 += l0*r0, t2 += l1*r1, tm += (l0+l1)(r0+r1)
            fr_mul(t, l0i, r0i); fr_add(t0, t0, t);
            fr_mul(t, l1i, r1i); fr_add(t2, t2, t);
            Fr ls, rs;
            fr_add(ls, l0i, l1i);
            fr_add(rs, r0i, r1i);
            fr_mul(t, ls, rs); fr_add(tm, tm, t);
            fr_mul(t, ey, y); ey = t;
            fr_mul(t, e2, two); e2 = t;
        }
        Fr t1;
        fr_sub(t1, tm, t0);
        fr_sub(t1, t1, t2);
        fr_to_bytes(out_t012 + 96 * j, t0);
        fr_to_bytes(out_t012 + 96 * j + 32, t1);
        fr_to_bytes(out_t012 + 96 * j + 64, t2);
    };
    // per-party offsets are sequential: oy_{j+1} = oy_j * y^n, oz_{j+1} = oz_j * z
    Fr oy = FR_ONE, oz = FR_ONE;
    std::vector<Fr> oys(m), ozs(m);
    for (size_t j = 0; j < m; ++j) {
        oys[j] = oy; ozs[j] = oz;
        Fr t;
        fr_mul(t, oy, y_n); oy = t;
        fr_mul(t, oz, z); oz = t;
    }
    unsigned hw = std::thread::hardware_concurrency();
    parallel_for(m, (int)(hw ? hw : 1),
                 [&](size_t j) { party(j, oys[j], ozs[j]); });
}

// Phase 3: evaluate l(x), r(x) per party.
extern "C" void bp_rp_phase3(
    size_t m, size_t n, const u8 *x32,
    const u8 *l0, const u8 *l1, const u8 *r0, const u8 *r1,
    u8 *out_l, u8 *out_r)
{
    Fr x;
    fr_from_bytes(x, x32);
    size_t total = m * n;
    for (size_t i = 0; i < total; ++i) {
        Fr a, b, t;
        fr_from_bytes(a, l0 + 32 * i);
        fr_from_bytes(b, l1 + 32 * i);
        fr_mul(t, b, x);
        fr_add(a, a, t);
        fr_to_bytes(out_l + 32 * i, a);
        fr_from_bytes(a, r0 + 32 * i);
        fr_from_bytes(b, r1 + 32 * i);
        fr_mul(t, b, x);
        fr_add(a, a, t);
        fr_to_bytes(out_r + 32 * i, a);
    }
}


// ---- fixed-base window tables + Pedersen commit batches ----
// Pedersen commits are always over the same (B, B_blinding) pair; an 8-bit
// window table (32 windows x 255 multiples, affine) reduces value*B +
// blind*B~ to ~64 mixed adds with no doublings.

struct FixedBaseTable {
    Fp key_x, key_y;
    std::vector<AffinePt> tbl;   // [w * 255 + (d-1)] = d * 2^(8w) * B
    bool init = false;
};

static const int FB_SLOTS = 8;
static FixedBaseTable g_fb_tables[FB_SLOTS];
static int g_fb_evict = 0;
static std::mutex g_fb_mutex;

// Find or build the window table for a base.  ``avoid`` is the slot of a
// table the caller also holds (never evicted by this call).
static const FixedBaseTable &fb_table_locked(const Fp &bx, const Fp &by,
                                             int avoid, int &slot_out) {
    int free_slot = -1;
    for (int s = 0; s < FB_SLOTS; ++s) {
        if (g_fb_tables[s].init && fp_eq(g_fb_tables[s].key_x, bx) &&
            fp_eq(g_fb_tables[s].key_y, by)) {
            slot_out = s;
            return g_fb_tables[s];
        }
        if (!g_fb_tables[s].init && free_slot < 0) free_slot = s;
    }
    int s = free_slot;
    if (s < 0) {
        do { s = g_fb_evict; g_fb_evict = (g_fb_evict + 1) % FB_SLOTS; }
        while (s == avoid);
    }
    slot_out = s;
    FixedBaseTable &t = g_fb_tables[s];
    t.key_x = bx; t.key_y = by;
    Pt base; base.X = bx; base.Y = by; base.Z = FP_ONE;
    std::vector<Pt> jac(32 * 255);
    Pt cur = base;
    for (int w = 0; w < 32; ++w) {
        Pt acc = cur;
        for (int d = 1; d <= 255; ++d) {
            jac[w * 255 + d - 1] = acc;
            if (d < 255) { Pt nx; pt_add(nx, acc, cur); acc = nx; }
        }
        for (int k = 0; k < 8; ++k) { Pt nx; pt_dbl(nx, cur); cur = nx; }
    }
    std::vector<u8> xs(32 * jac.size()), ys(32 * jac.size()), inf(jac.size());
    pt_to_affine_batch(xs.data(), ys.data(), inf.data(), jac.data(), jac.size());
    t.tbl.resize(jac.size());
    for (size_t i = 0; i < jac.size(); ++i) {
        t.tbl[i].inf = inf[i];
        if (!inf[i]) {
            fp_from_bytes(t.tbl[i].x, xs.data() + 32 * i);
            fp_from_bytes(t.tbl[i].y, ys.data() + 32 * i);
        }
    }
    t.init = true;
    return t;
}

static void fb_tables_pair(const Fp &b1x, const Fp &b1y,
                           const Fp &b2x, const Fp &b2y,
                           const FixedBaseTable *&t1, const FixedBaseTable *&t2) {
    std::lock_guard<std::mutex> lk(g_fb_mutex);
    int s1, s2;
    t1 = &fb_table_locked(b1x, b1y, -1, s1);
    t2 = &fb_table_locked(b2x, b2y, s1, s2);
}

static const FixedBaseTable &fb_table(const Fp &bx, const Fp &by) {
    std::lock_guard<std::mutex> lk(g_fb_mutex);
    int s;
    return fb_table_locked(bx, by, -1, s);
}

static void fb_mul_acc(Pt &acc, const FixedBaseTable &t, const u8 *scalar) {
    for (int w = 0; w < 32; ++w) {
        u8 d = scalar[w];
        if (!d) continue;
        const AffinePt &e = t.tbl[w * 255 + d - 1];
        if (e.inf) continue;
        Pt nx;
        pt_add_mixed(nx, acc, e.x, e.y);
        acc = nx;
    }
}

extern "C" void bp_commit_batch(const u8 *values, const u8 *blinds, size_t n,
                                const u8 *bx, const u8 *by,
                                const u8 *b2x, const u8 *b2y,
                                u8 *ox, u8 *oy, u8 *oinf) {
    Fp B_x, B_y, B2_x, B2_y;
    fp_from_bytes(B_x, bx); fp_from_bytes(B_y, by);
    fp_from_bytes(B2_x, b2x); fp_from_bytes(B2_y, b2y);
    const FixedBaseTable *t1p, *t2p;
    fb_tables_pair(B_x, B_y, B2_x, B2_y, t1p, t2p);
    const FixedBaseTable &t1 = *t1p, &t2 = *t2p;
    std::vector<Pt> out(n);
    auto work = [&](size_t i) {
        Pt acc = PT_IDENT;
        fb_mul_acc(acc, t1, values + 32 * i);
        fb_mul_acc(acc, t2, blinds + 32 * i);
        out[i] = acc;
    };
    unsigned hw = std::thread::hardware_concurrency();
    parallel_for(n, n < 16 ? 1 : (int)(hw ? hw : 1), work);
    pt_to_affine_batch(ox, oy, oinf, out.data(), n);
}

// Single Pedersen commit with a pre-registered base context: one pointer
// argument so the ctypes FFI overhead (~2 us/arg) stops dominating the
// ~3 us table walk.  io layout: v(32) | blind(32) | out_x(32) | out_y(32)
// | out_inf(1).
struct CommitCtx {
    FixedBaseTable t1;   // owned copies: the global slots can be evicted
    FixedBaseTable t2;
};

extern "C" void *bp_commit_ctx_new(const u8 *bx, const u8 *by,
                                   const u8 *b2x, const u8 *b2y) {
    Fp B_x, B_y, B2_x, B2_y;
    fp_from_bytes(B_x, bx); fp_from_bytes(B_y, by);
    fp_from_bytes(B2_x, b2x); fp_from_bytes(B2_y, b2y);
    CommitCtx *ctx = new CommitCtx();
    {
        std::lock_guard<std::mutex> lk(g_fb_mutex);
        int s1, s2;
        ctx->t1 = fb_table_locked(B_x, B_y, -1, s1);
        ctx->t2 = fb_table_locked(B2_x, B2_y, s1, s2);
    }
    return ctx;
}

extern "C" void bp_commit_ctx_free(void *ctx) { delete (CommitCtx *)ctx; }

extern "C" void bp_commit_one(void *ctx_p, u8 *io) {
    CommitCtx *ctx = (CommitCtx *)ctx_p;
    Pt acc = PT_IDENT;
    fb_mul_acc(acc, ctx->t1, io);
    fb_mul_acc(acc, ctx->t2, io + 32);
    pt_to_affine(io + 64, io + 96, io + 128, acc);
}

// Fixed-base mul through the table cache ONLY if already built (callers
// fall back to the untabled path on miss — building a table for a one-off
// base would cost more than it saves).  Returns 1 on hit.
extern "C" int bp_fixed_base_mul_cached(const u8 *scalars, size_t n,
                                        const u8 *base_x, const u8 *base_y,
                                        u8 *out_x, u8 *out_y, u8 *out_inf) {
    Fp bx, by;
    fp_from_bytes(bx, base_x); fp_from_bytes(by, base_y);
    const FixedBaseTable *t = nullptr;
    {
        std::lock_guard<std::mutex> lk(g_fb_mutex);
        for (int s = 0; s < FB_SLOTS; ++s)
            if (g_fb_tables[s].init && fp_eq(g_fb_tables[s].key_x, bx) &&
                fp_eq(g_fb_tables[s].key_y, by)) {
                t = &g_fb_tables[s];
                break;
            }
    }
    if (!t) return 0;
    std::vector<Pt> out(n);
    for (size_t i = 0; i < n; ++i) {
        Pt acc = PT_IDENT;
        fb_mul_acc(acc, *t, scalars + 32 * i);
        out[i] = acc;
    }
    pt_to_affine_batch(out_x, out_y, out_inf, out.data(), n);
    return 1;
}

// Fixed-base scalar-mul batch through the same window tables.
extern "C" void bp_fixed_base_mul_tbl(const u8 *scalars, size_t n,
                                      const u8 *base_x, const u8 *base_y,
                                      u8 *out_x, u8 *out_y, u8 *out_inf) {
    Fp bx, by;
    fp_from_bytes(bx, base_x); fp_from_bytes(by, base_y);
    const FixedBaseTable &t = fb_table(bx, by);
    std::vector<Pt> out(n);
    for (size_t i = 0; i < n; ++i) {
        Pt acc = PT_IDENT;
        fb_mul_acc(acc, t, scalars + 32 * i);
        out[i] = acc;
    }
    pt_to_affine_batch(out_x, out_y, out_inf, out.data(), n);
}

// ---- counter-mode keccak RNG fill: out[i] = keccak(state || LE64(ctr+i)) ----
extern "C" void bp_rng_fill(const u8 state[32], u64 counter_start,
                            size_t nblocks, u8 *out) {
    u8 buf[40];
    memcpy(buf, state, 32);
    for (size_t i = 0; i < nblocks; ++i) {
        u64 ctr = counter_start + i;
        memcpy(buf + 32, &ctr, 8);  // little-endian on this target
        bp_keccak256(buf, 40, out + 32 * i);
    }
}

// ---- microbenchmark hooks ----
extern "C" u64 bp_bench_fp_mul(u64 iters) {
    Fp a = P_R2, b = FP_ONE;
    for (u64 i = 0; i < iters; ++i) {
        Fp t;
        fp_mul(t, a, b);
        b = a; a = t;
    }
    return a.v[0];
}

extern "C" u64 bp_bench_pt_add(u64 iters) {
    Pt p, q;
    Fp gx = {{0x3d723d8bc943cfcaULL, 0xdeacfd9b0d1819e0ULL, 0x7beced415a40f0c7ULL, 0x01ef15c18599971bULL}};
    Fp gy = {{0x2873000c36e8dc1fULL, 0xde53ecd11abe43a3ULL, 0xb7be4801df46ec62ULL, 0x005668060aa49730ULL}};
    Fp gx_m, gy_m;
    fp_mul(gx_m, gx, P_R2);
    fp_mul(gy_m, gy, P_R2);
    p.X = gx_m; p.Y = gy_m; p.Z = FP_ONE;
    pt_dbl(q, p);
    for (u64 i = 0; i < iters; ++i) {
        Pt t;
        pt_add(t, q, p);
        q = t;
    }
    return q.X.v[0];
}

// ---- range-proof verifier scalar vectors -------------------------------
// Derives the mega-check generator coefficient vectors in one native pass
// (the per-element python-int loops dominated verification at m=64).
// Inputs are canonical LE32; outputs likewise.
//   s (inductive from u_sq), u_sq/u_inv_sq,
//   g[i] = -(z + a * s[i])
//   h[i] = z + y^-i * (z^{2+j} 2^{i mod n} - b * s_inv[i])
static void rp_vectors_core(
    const std::vector<Fr> &u, const std::vector<Fr> &ui,
    const Fr &yinv, const Fr &z, const Fr &a, const Fr &b,
    size_t n, size_t m,
    u8 *out_g, u8 *out_h, u8 *out_u_sq, u8 *out_u_inv_sq)
{
    const size_t nm = n * m;
    const size_t lg = u.size();
    std::vector<Fr> usq(lg), uisq(lg);
    Fr one;
    {
        u8 onebuf[32] = {1};
        fr_from_bytes(one, onebuf);
    }
    Fr allinv = one;
    for (size_t i = 0; i < lg; ++i) {
        fr_mul(usq[i], u[i], u[i]);
        fr_mul(uisq[i], ui[i], ui[i]);
        fr_to_bytes(out_u_sq + 32 * i, usq[i]);
        fr_to_bytes(out_u_inv_sq + 32 * i, uisq[i]);
        Fr t;
        fr_mul(t, allinv, ui[i]);
        allinv = t;
    }

    std::vector<Fr> s(nm);
    s[0] = allinv;
    for (size_t i = 1; i < nm; ++i) {
        int lg_i = 63 - __builtin_clzll((u64)i);
        size_t k = (size_t)1 << lg_i;
        fr_mul(s[i], s[i - k], usq[lg - 1 - (size_t)lg_i]);
    }

    Fr zz;
    fr_mul(zz, z, z);
    Fr two;
    fr_add(two, one, one);
    const Fr zero = {{0, 0, 0, 0}};

    Fr yip = one;    // y^-idx, global index
    Fr exp_z = zz;   // z^{2+j}
    for (size_t j = 0; j < m; ++j) {
        Fr exp2 = exp_z;  // z^{2+j} * 2^i
        for (size_t i = 0; i < n; ++i) {
            const size_t idx = j * n + i;
            Fr t1, t2, t3, g, h;
            // g = -(z + a * s[idx])
            fr_mul(t1, a, s[idx]);
            fr_add(t2, z, t1);
            fr_sub(g, zero, t2);
            fr_to_bytes(out_g + 32 * idx, g);
            // h = z + yip * (exp2 - b * s[nm-1-idx])
            fr_mul(t1, b, s[nm - 1 - idx]);
            fr_sub(t2, exp2, t1);
            fr_mul(t3, yip, t2);
            fr_add(h, z, t3);
            fr_to_bytes(out_h + 32 * idx, h);
            fr_mul(exp2, exp2, two);
            fr_mul(yip, yip, yinv);
        }
        Fr t;
        fr_mul(t, exp_z, z);
        exp_z = t;
    }
}

extern "C" void bp_rp_verify_vectors(
    const u8 *u_le, const u8 *u_inv_le, size_t lg,
    const u8 *y_inv_le, const u8 *z_le,
    const u8 *a_le, const u8 *b_le,
    size_t n, size_t m,
    u8 *out_g, u8 *out_h, u8 *out_u_sq, u8 *out_u_inv_sq)
{
    std::vector<Fr> u(lg), ui(lg);
    for (size_t i = 0; i < lg; ++i) {
        fr_from_bytes(u[i], u_le + 32 * i);
        fr_from_bytes(ui[i], u_inv_le + 32 * i);
    }
    Fr yinv, z, a, b;
    fr_from_bytes(yinv, y_inv_le);
    fr_from_bytes(z, z_le);
    fr_from_bytes(a, a_le);
    fr_from_bytes(b, b_le);
    rp_vectors_core(u, ui, yinv, z, a, b, n, m,
                    out_g, out_h, out_u_sq, out_u_inv_sq);
}

// Whole verifier scalar derivation in one call: replay the IPP transcript
// (absorb L_j/R_j, squeeze u_j — reference src/inner_product_proof.rs:
// 254-310), squeeze the batching challenge c, batch-invert, and emit the
// mega-check vectors.  Removes ~50 python<->native keccak round trips from
// the verify critical path.  Returns nonzero if any L/R is the identity
// (the transcript's validate_and_append_point rejection).
extern "C" int bp_rp_verify_terms(
    u8 *transcript_state,
    const u8 *lxs, const u8 *lys, const u8 *lis,
    const u8 *rxs, const u8 *rys, const u8 *ris, size_t lg,
    const u8 *y_le, const u8 *z_le, const u8 *a_le, const u8 *b_le,
    size_t n, size_t m,
    u8 *out_g, u8 *out_h, u8 *out_u_sq, u8 *out_u_inv_sq, u8 *out_c)
{
    const size_t nm = n * m;
    Transcript tr;
    memcpy(tr.state, transcript_state, 32);
    // innerproduct_domain_sep(nm): append_message("dom-sep", pad32("ipp v1"))
    // then append_u64("n", nm)
    u8 dom[32] = {0};
    memcpy(dom, "ipp v1", 6);
    tr_absorb(tr, (const u8 *)"dom-sep", 7, dom, 32);
    u8 nm_le[8];
    u64 nm64 = (u64)nm;
    memcpy(nm_le, &nm64, 8);
    tr_absorb(tr, (const u8 *)"n", 1, nm_le, 8);

    std::vector<Fr> u(lg), ui(lg);
    for (size_t i = 0; i < lg; ++i) {
        if (lis[i] || ris[i]) return 1;  // identity point in transcript
        tr_append_point_affine(tr, (const u8 *)"L", 1,
                               lxs + 32 * i, lys + 32 * i, 0);
        tr_append_point_affine(tr, (const u8 *)"R", 1,
                               rxs + 32 * i, rys + 32 * i, 0);
        tr_challenge_scalar(tr, (const u8 *)"u", 1, u[i]);
    }
    Fr c;
    tr_challenge_scalar(tr, (const u8 *)"c", 1, c);
    fr_to_bytes(out_c, c);
    memcpy(transcript_state, tr.state, 32);

    // batch inversion of the challenges (one fr_inv for all lg)
    if (lg) {
        std::vector<Fr> prefix(lg);
        Fr acc;
        {
            u8 onebuf[32] = {1};
            fr_from_bytes(acc, onebuf);
        }
        for (size_t i = 0; i < lg; ++i) {
            prefix[i] = acc;
            Fr t;
            fr_mul(t, acc, u[i]);
            acc = t;
        }
        Fr inv_acc;
        fr_inv(inv_acc, acc);
        for (size_t i = lg; i-- > 0;) {
            fr_mul(ui[i], inv_acc, prefix[i]);
            Fr t;
            fr_mul(t, inv_acc, u[i]);
            inv_acc = t;
        }
    }

    Fr y, yinv, z, a, b;
    fr_from_bytes(y, y_le);
    fr_inv(yinv, y);
    fr_from_bytes(z, z_le);
    fr_from_bytes(a, a_le);
    fr_from_bytes(b, b_le);
    rp_vectors_core(u, ui, yinv, z, a, b, n, m,
                    out_g, out_h, out_u_sq, out_u_inv_sq);
    return 0;
}
