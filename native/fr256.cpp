// Host-side 256-bit Montgomery field arithmetic (C ABI, ctypes-loaded).
//
// The TPU owns the compute path (Pallas/XLA limb kernels); this library is
// the host runtime piece: fast witness generation, R1CS evaluation and
// polynomial utilities that would otherwise be python-int loops during
// circuit synthesis and data staging.  Plays the role rayon-side host code
// plays in the reference (e.g. witness checks, groth16-r1cs/src/lib.rs:296-316)
// without touching the device path.
//
// Representation: 4 x 64-bit little-endian limbs, Montgomery form with
// R = 2^256.  Parameters (modulus, -p^-1 mod 2^64, R^2) are passed per call
// so one .so serves any <= 256-bit field (BLS12-381 Fr, BN254 Fr/Fq).

#include <cstdint>
#include <cstring>

extern "C" {

typedef unsigned __int128 u128;

struct FrParams {
    uint64_t p[4];     // modulus
    uint64_t pinv64;   // -p^-1 mod 2^64
    uint64_t r2[4];    // R^2 mod p
};

static inline int geq(const uint64_t a[4], const uint64_t b[4]) {
    for (int i = 3; i >= 0; --i) {
        if (a[i] != b[i]) return a[i] > b[i];
    }
    return 1;
}

static inline void sub_p(uint64_t a[4], const uint64_t p[4]) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 t = (u128)a[i] - p[i] - borrow;
        a[i] = (uint64_t)t;
        borrow = (t >> 64) ? 1 : 0;
    }
}

static inline void add_mod(const uint64_t a[4], const uint64_t b[4],
                           uint64_t out[4], const uint64_t p[4]) {
    u128 carry = 0;
    uint64_t t[4];
    for (int i = 0; i < 4; ++i) {
        u128 s = (u128)a[i] + b[i] + carry;
        t[i] = (uint64_t)s;
        carry = s >> 64;
    }
    if (carry || geq(t, p)) sub_p(t, p);
    std::memcpy(out, t, 32);
}

static inline void sub_mod(const uint64_t a[4], const uint64_t b[4],
                           uint64_t out[4], const uint64_t p[4]) {
    u128 borrow = 0;
    uint64_t t[4];
    for (int i = 0; i < 4; ++i) {
        u128 s = (u128)a[i] - b[i] - borrow;
        t[i] = (uint64_t)s;
        borrow = (s >> 64) ? 1 : 0;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < 4; ++i) {
            u128 s = (u128)t[i] + p[i] + carry;
            t[i] = (uint64_t)s;
            carry = s >> 64;
        }
    }
    std::memcpy(out, t, 32);
}

// CIOS Montgomery multiplication, 4 limbs.
static inline void mont_mul(const uint64_t a[4], const uint64_t b[4],
                            uint64_t out[4], const FrParams* prm) {
    const uint64_t* p = prm->p;
    uint64_t t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; ++i) {
        u128 carry = 0;
        for (int j = 0; j < 4; ++j) {
            u128 s = (u128)t[j] + (u128)a[i] * b[j] + carry;
            t[j] = (uint64_t)s;
            carry = s >> 64;
        }
        u128 s = (u128)t[4] + carry;
        t[4] = (uint64_t)s;
        t[5] = (uint64_t)(s >> 64);

        uint64_t m = t[0] * prm->pinv64;
        carry = ((u128)t[0] + (u128)m * p[0]) >> 64;
        for (int j = 1; j < 4; ++j) {
            u128 s2 = (u128)t[j] + (u128)m * p[j] + carry;
            t[j - 1] = (uint64_t)s2;
            carry = s2 >> 64;
        }
        s = (u128)t[4] + carry;
        t[3] = (uint64_t)s;
        t[4] = t[5] + (uint64_t)(s >> 64);
        t[5] = 0;
    }
    uint64_t r[4] = {t[0], t[1], t[2], t[3]};
    if (t[4] || geq(r, p)) sub_p(r, p);
    std::memcpy(out, r, 32);
}

// ---- vectorized entry points (n elements, 4*n uint64 arrays) ----

void fr_mont_mul_vec(const uint64_t* a, const uint64_t* b, uint64_t* out,
                     int64_t n, const FrParams* p) {
    for (int64_t i = 0; i < n; ++i)
        mont_mul(a + 4 * i, b + 4 * i, out + 4 * i, p);
}

void fr_add_vec(const uint64_t* a, const uint64_t* b, uint64_t* out,
                int64_t n, const FrParams* p) {
    for (int64_t i = 0; i < n; ++i)
        add_mod(a + 4 * i, b + 4 * i, out + 4 * i, p->p);
}

void fr_sub_vec(const uint64_t* a, const uint64_t* b, uint64_t* out,
                int64_t n, const FrParams* p) {
    for (int64_t i = 0; i < n; ++i)
        sub_mod(a + 4 * i, b + 4 * i, out + 4 * i, p->p);
}

void fr_to_mont_vec(const uint64_t* a, uint64_t* out, int64_t n,
                    const FrParams* p) {
    for (int64_t i = 0; i < n; ++i)
        mont_mul(a + 4 * i, p->r2, out + 4 * i, p);
}

void fr_from_mont_vec(const uint64_t* a, uint64_t* out, int64_t n,
                      const FrParams* p) {
    static const uint64_t one[4] = {1, 0, 0, 0};
    for (int64_t i = 0; i < n; ++i)
        mont_mul(a + 4 * i, one, out + 4 * i, p);
}

// COO sparse matrix-vector product over Fr (Montgomery form):
// out[rows[k]] += coeffs[k] * z[cols[k]].  out must be zeroed (n_rows*4).
void fr_spmv_coo(const int32_t* rows, const int32_t* cols,
                 const uint64_t* coeffs, const uint64_t* z, uint64_t* out,
                 int64_t nnz, const FrParams* p) {
    uint64_t prod[4];
    for (int64_t k = 0; k < nnz; ++k) {
        mont_mul(coeffs + 4 * k, z + 4 * (int64_t)cols[k], prod, p);
        add_mod(out + 4 * (int64_t)rows[k], prod, out + 4 * (int64_t)rows[k], p->p);
    }
}

// R1CS satisfaction: returns index of first violated constraint, or -1.
// a/b/c evals must be precomputed via fr_spmv_coo into separate arrays.
int64_t fr_r1cs_check(const uint64_t* av, const uint64_t* bv, const uint64_t* cv,
                      int64_t n, const FrParams* p) {
    uint64_t prod[4];
    for (int64_t i = 0; i < n; ++i) {
        mont_mul(av + 4 * i, bv + 4 * i, prod, p);
        if (std::memcmp(prod, cv + 4 * i, 32) != 0) return i;
    }
    return -1;
}

// Horner evaluation of a polynomial (Montgomery coefficients) at a point.
void fr_horner(const uint64_t* coeffs, int64_t n, const uint64_t* point,
               uint64_t* out, const FrParams* p) {
    uint64_t acc[4] = {0, 0, 0, 0};
    for (int64_t i = n - 1; i >= 0; --i) {
        mont_mul(acc, point, acc, p);
        add_mod(acc, coeffs + 4 * i, acc, p->p);
    }
    std::memcpy(out, acc, 32);
}

// Elementwise product chain for witness generation of multiplication chains:
// out[i] = a[i] * b[i] (Montgomery).
void fr_hadamard(const uint64_t* a, const uint64_t* b, uint64_t* out,
                 int64_t n, const FrParams* p) {
    fr_mont_mul_vec(a, b, out, n, p);
}

}  // extern "C"
