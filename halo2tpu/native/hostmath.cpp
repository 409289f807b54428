// Native host runtime for halo2tpu (SURVEY N15-adjacent): the reference's
// entire stack is native Rust; here the host-side hot loops that back the
// Python layer are C++ behind a C ABI (ctypes):
//   * keccak256 — Fiat-Shamir transcript hashing (contract.sol keccak
//     schedule, /root/reference/solidity_verifier_contract/contract.sol:89-112)
//   * BN254 Fr Montgomery arithmetic (4x64 limbs, the same representation
//     halo2curves uses) + a stack-machine gate evaluator: evaluates every
//     gate polynomial on every row — the MockProver hot loop
//     (halo2_proofs::dev::MockProver equivalent, SURVEY N9).
//
// Build: g++ -O2 -shared -fPIC hostmath.cpp -o libhostmath.so  (see build.py)
#include <cstdint>
#include <cstring>
#include <cstddef>
#include <vector>

typedef unsigned __int128 u128;

// ---------------------------------------------------------------------------
// keccak256 (FIPS 202 / original Keccak padding 0x01 for SHA3? NO — Ethereum
// keccak256 uses the original Keccak padding 0x01) — one-shot hashing.
// ---------------------------------------------------------------------------
static const uint64_t KECCAK_RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL,
};
// rho rotation offsets, indexed [x][y] with lane A[x,y] at st[x + 5y]
static const int KECCAK_R[5][5] = {
    {0, 36, 3, 41, 18},
    {1, 44, 10, 45, 2},
    {62, 6, 43, 15, 61},
    {28, 55, 25, 21, 56},
    {27, 20, 39, 8, 14},
};

static inline uint64_t rotl64(uint64_t x, int n) {
    return n == 0 ? x : (x << n) | (x >> (64 - n));
}

static void keccak_f1600(uint64_t st[25]) {
    for (int round = 0; round < 24; round++) {
        // theta
        uint64_t bc[5], t;
        for (int x = 0; x < 5; x++)
            bc[x] = st[x] ^ st[x + 5] ^ st[x + 10] ^ st[x + 15] ^ st[x + 20];
        for (int x = 0; x < 5; x++) {
            t = bc[(x + 4) % 5] ^ rotl64(bc[(x + 1) % 5], 1);
            for (int y = 0; y < 25; y += 5) st[y + x] ^= t;
        }
        // rho + pi: B[y, 2x+3y] = rotl(A[x, y], r[x][y])
        uint64_t b[25];
        for (int x = 0; x < 5; x++)
            for (int y = 0; y < 5; y++)
                b[y + 5 * ((2 * x + 3 * y) % 5)] =
                    rotl64(st[x + 5 * y], KECCAK_R[x][y]);
        // chi
        for (int y = 0; y < 25; y += 5)
            for (int x = 0; x < 5; x++)
                st[y + x] = b[y + x] ^ ((~b[y + (x + 1) % 5]) & b[y + (x + 2) % 5]);
        // iota
        st[0] ^= KECCAK_RC[round];
    }
}

extern "C" void keccak256(const uint8_t* data, size_t len, uint8_t out[32]) {
    uint64_t st[25];
    memset(st, 0, sizeof(st));
    const size_t rate = 136;
    while (len >= rate) {
        for (size_t i = 0; i < rate / 8; i++) {
            uint64_t w;
            memcpy(&w, data + 8 * i, 8);
            st[i] ^= w;
        }
        keccak_f1600(st);
        data += rate;
        len -= rate;
    }
    uint8_t block[136];
    memset(block, 0, sizeof(block));
    memcpy(block, data, len);
    block[len] = 0x01;      // Keccak (pre-SHA3) domain padding
    block[rate - 1] |= 0x80;
    for (size_t i = 0; i < rate / 8; i++) {
        uint64_t w;
        memcpy(&w, block + 8 * i, 8);
        st[i] ^= w;
    }
    keccak_f1600(st);
    memcpy(out, st, 32);
}

// ---------------------------------------------------------------------------
// BN254 Fr Montgomery arithmetic, 4x64 limbs little-endian
// ---------------------------------------------------------------------------
struct U256 { uint64_t v[4]; };

static const U256 FR_P = {{0x43e1f593f0000001ULL, 0x2833e84879b97091ULL,
                           0xb85045b68181585dULL, 0x30644e72e131a029ULL}};
static const uint64_t FR_PINV = 0xc2e1f593efffffffULL;
static const U256 FR_R2 = {{0x1bb8e645ae216da7ULL, 0x53fe3ab1e35c59e3ULL,
                            0x8c49833d53bb8085ULL, 0x0216d0b17f4e44a5ULL}};

static inline bool geq_p(const U256& a) {
    for (int i = 3; i >= 0; i--) {
        if (a.v[i] > FR_P.v[i]) return true;
        if (a.v[i] < FR_P.v[i]) return false;
    }
    return true;  // equal
}

static inline void sub_p(U256& a) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a.v[i] - FR_P.v[i] - borrow;
        a.v[i] = (uint64_t)d;
        borrow = (d >> 64) ? 1 : 0;
    }
}

static inline void fr_add(const U256& a, const U256& b, U256& out) {
    u128 carry = 0;
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)a.v[i] + b.v[i] + carry;
        out.v[i] = (uint64_t)s;
        carry = s >> 64;
    }
    if (carry || geq_p(out)) sub_p(out);
}

static inline void fr_neg(const U256& a, U256& out) {
    bool zero = !(a.v[0] | a.v[1] | a.v[2] | a.v[3]);
    if (zero) { out = a; return; }
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)FR_P.v[i] - a.v[i] - borrow;
        out.v[i] = (uint64_t)d;
        borrow = (d >> 64) ? 1 : 0;
    }
}

// CIOS Montgomery multiplication
static inline void fr_mul(const U256& a, const U256& b, U256& out) {
    uint64_t t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u128 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 cur = (u128)t[j] + (u128)a.v[i] * b.v[j] + carry;
            t[j] = (uint64_t)cur;
            carry = cur >> 64;
        }
        u128 cur = (u128)t[4] + carry;
        t[4] = (uint64_t)cur;
        t[5] = (uint64_t)(cur >> 64);

        uint64_t m = t[0] * FR_PINV;
        carry = ((u128)t[0] + (u128)m * FR_P.v[0]) >> 64;
        for (int j = 1; j < 4; j++) {
            u128 c2 = (u128)t[j] + (u128)m * FR_P.v[j] + carry;
            t[j - 1] = (uint64_t)c2;
            carry = c2 >> 64;
        }
        cur = (u128)t[4] + carry;
        t[3] = (uint64_t)cur;
        t[4] = t[5] + (uint64_t)(cur >> 64);
        t[5] = 0;
    }
    out.v[0] = t[0]; out.v[1] = t[1]; out.v[2] = t[2]; out.v[3] = t[3];
    if (t[4] || geq_p(out)) sub_p(out);
}

extern "C" void fr_to_mont_batch(uint64_t* vals, size_t n) {
    U256* p = (U256*)vals;
    for (size_t i = 0; i < n; i++) fr_mul(p[i], FR_R2, p[i]);
}

extern "C" void fr_mul_batch(const uint64_t* a, const uint64_t* b,
                             uint64_t* out, size_t n) {
    const U256* pa = (const U256*)a;
    const U256* pb = (const U256*)b;
    U256* po = (U256*)out;
    for (size_t i = 0; i < n; i++) fr_mul(pa[i], pb[i], po[i]);
}

// ---------------------------------------------------------------------------
// Gate evaluator: postfix bytecode over column row-vectors.
//   opcodes: 0 = PUSH_CONST(arg -> constants table index, Montgomery form)
//            1 = PUSH_FIXED(arg = col * 256 + (rot & 0xff signed))
//            2 = PUSH_ADVICE(arg)
//            3 = PUSH_INSTANCE(arg)
//            4 = NEG, 5 = ADD, 6 = MUL
// Columns are passed Montgomery-form, shape [ncols][nrows] of U256.
// Evaluates rows [0, usable) with wrap-around rotations mod nrows; writes
// the row indices of the first `max_fail` nonzero results.
// ---------------------------------------------------------------------------
extern "C" long mock_eval_poly(
    const uint32_t* ops, const uint64_t* args, size_t nops,
    const uint64_t* constants /* [nconst][4] mont */,
    const uint64_t* fixed, size_t nfixed,
    const uint64_t* advice, size_t nadvice,
    const uint64_t* instance, size_t ninstance,
    size_t nrows, size_t usable,
    long* fail_rows, size_t max_fail) {
    std::vector<U256> stack(nops);
    const U256* cst = (const U256*)constants;
    const U256* fx = (const U256*)fixed;
    const U256* adv = (const U256*)advice;
    const U256* ins = (const U256*)instance;
    size_t nfail = 0;
    for (size_t row = 0; row < usable && nfail < max_fail; row++) {
        int sp = 0;
        for (size_t k = 0; k < nops; k++) {
            uint32_t op = ops[k];
            uint64_t arg = args[k];
            switch (op) {
                case 0: stack[sp++] = cst[arg]; break;
                case 1: case 2: case 3: {
                    size_t col = arg >> 8;
                    int rot = (int)(int8_t)(arg & 0xff);
                    size_t r = (row + (size_t)((long)nrows + rot)) % nrows;
                    const U256* base = op == 1 ? fx : (op == 2 ? adv : ins);
                    stack[sp++] = base[col * nrows + r];
                    break;
                }
                case 4: { U256 t; fr_neg(stack[sp - 1], t); stack[sp - 1] = t; break; }
                case 5: { U256 t; fr_add(stack[sp - 2], stack[sp - 1], t);
                          stack[--sp - 1] = t; break; }
                case 6: { U256 t; fr_mul(stack[sp - 2], stack[sp - 1], t);
                          stack[--sp - 1] = t; break; }
            }
        }
        const U256& r0 = stack[0];
        if (r0.v[0] | r0.v[1] | r0.v[2] | r0.v[3]) {
            fail_rows[nfail++] = (long)row;
        }
    }
    return (long)nfail;
}
