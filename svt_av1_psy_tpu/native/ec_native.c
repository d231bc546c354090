/* Native entropy coder: daala/AV1 range encoder + CDF adaptation + the
 * per-transform-block coefficient writer.
 *
 * The Python package svt_av1_psy_tpu.bitstream.range_coder is the reference
 * implementation (oracle-tested); this module must produce bit-identical
 * output (verified by tests/test_ec_native.py). Entropy coding is the
 * serial host hot loop (SURVEY.md §7: "entropy coding on host CPU in C++"),
 * everything else is batched device math.
 *
 * Build: tools/build_native.sh
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define CDF_PROB_TOP 32768
#define EC_PROB_SHIFT 6
#define EC_MIN_PROB 4

typedef struct {
    uint32_t low;
    uint32_t rng;
    int32_t cnt;
    uint16_t *precarry;
    size_t len, cap;
} EcEnc;

static void grow(EcEnc *e, size_t need) {
    if (e->len + need > e->cap) {
        e->cap = e->cap * 2 + need + 4096;
        e->precarry = (uint16_t *)realloc(e->precarry, e->cap * sizeof(uint16_t));
    }
}

EcEnc *ec_create(void) {
    EcEnc *e = (EcEnc *)calloc(1, sizeof(EcEnc));
    e->rng = 0x8000;
    e->cnt = -9;
    e->cap = 1 << 16;
    e->precarry = (uint16_t *)malloc(e->cap * sizeof(uint16_t));
    return e;
}

void ec_free(EcEnc *e) {
    if (e) {
        free(e->precarry);
        free(e);
    }
}

void ec_reset(EcEnc *e) {
    e->low = 0;
    e->rng = 0x8000;
    e->cnt = -9;
    e->len = 0;
}

static inline int ilog_nz(uint32_t x) { return 32 - __builtin_clz(x); }

static void ec_normalize(EcEnc *e, uint32_t low, uint32_t rng) {
    int d = 16 - ilog_nz(rng);
    int s = e->cnt + d;
    if (s >= 0) {
        grow(e, 2);
        int c = e->cnt + 16;
        uint32_t m = (1u << c) - 1;
        if (s >= 8) {
            e->precarry[e->len++] = (uint16_t)(low >> c);
            low &= m;
            c -= 8;
            m >>= 8;
        }
        e->precarry[e->len++] = (uint16_t)(low >> c);
        s = c + d - 24;
        low &= m;
    }
    e->low = low << d;
    e->rng = rng << d;
    e->cnt = s;
}

void ec_bool(EcEnc *e, int val, unsigned f) {
    uint32_t l = e->low, r = e->rng;
    uint32_t v = ((r >> 8) * (f >> EC_PROB_SHIFT) >> (7 - EC_PROB_SHIFT)) + EC_MIN_PROB;
    if (val) {
        l += r - v;
        r = v;
    } else {
        r -= v;
    }
    ec_normalize(e, l, r);
}

void ec_literal(EcEnc *e, uint32_t value, int bits) {
    for (int i = bits - 1; i >= 0; i--) ec_bool(e, (value >> i) & 1, 16384);
}

static void update_cdf(uint16_t *icdf, int sym, int nsyms) {
    static const int speeds[17] = {0, 0, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2};
    int count = icdf[nsyms];
    int rate = 3 + (count > 15) + (count > 31) + speeds[nsyms];
    for (int i = 0; i < nsyms - 1; i++) {
        if (i < sym)
            icdf[i] += (CDF_PROB_TOP - icdf[i]) >> rate;
        else
            icdf[i] -= icdf[i] >> rate;
    }
    icdf[nsyms] = count + (count < 32);
}

void ec_symbol(EcEnc *e, int sym, uint16_t *icdf, int nsyms, int adapt) {
    uint32_t fl = sym > 0 ? icdf[sym - 1] : CDF_PROB_TOP;
    uint32_t fh = icdf[sym];
    uint32_t l = e->low, r = e->rng;
    int n = nsyms - 1;
    if (fl < CDF_PROB_TOP) {
        uint32_t u = ((r >> 8) * (fl >> EC_PROB_SHIFT) >> (7 - EC_PROB_SHIFT)) +
                     EC_MIN_PROB * (n - (sym - 1));
        uint32_t v = ((r >> 8) * (fh >> EC_PROB_SHIFT) >> (7 - EC_PROB_SHIFT)) +
                     EC_MIN_PROB * (n - sym);
        l += r - u;
        r = u - v;
    } else {
        r -= ((r >> 8) * (fh >> EC_PROB_SHIFT) >> (7 - EC_PROB_SHIFT)) + EC_MIN_PROB * (n - sym);
    }
    ec_normalize(e, l, r);
    if (adapt) update_cdf(icdf, sym, nsyms);
}

/* no-adapt variant for gathered/temporary cdfs */
void ec_symbol_noadapt(EcEnc *e, int sym, const uint16_t *icdf, int nsyms) {
    ec_symbol(e, sym, (uint16_t *)icdf, nsyms, 0);
}

int64_t ec_tell(EcEnc *e) { return (int64_t)e->cnt + 10 + 8 * (int64_t)e->len; }

/* Finalize into out (carry-propagated). Returns byte count. */
int64_t ec_done(EcEnc *e, uint8_t *out, int64_t cap) {
    uint32_t l = e->low;
    int c = e->cnt;
    int s = 10 + c;
    uint32_t m = 0x3FFF;
    uint32_t ev = ((l + m) & ~m) | (m + 1);
    grow(e, 8);
    size_t len = e->len;
    uint16_t *buf = e->precarry;
    if (s > 0) {
        uint32_t n = (1u << (c + 16)) - 1;
        do {
            buf[len++] = (uint16_t)(ev >> (c + 16));
            ev &= n;
            s -= 8;
            c -= 8;
            n >>= 8;
        } while (s > 0);
    }
    if ((int64_t)len > cap) return -1;
    uint32_t carry = 0;
    for (size_t i = len; i-- > 0;) {
        carry += buf[i];
        out[i] = (uint8_t)carry;
        carry >>= 8;
    }
    return (int64_t)len;
}

/* ---------------------------------------------------------------------- */
/* coefficient block writer (av1_write_coeffs_txb_1d equivalent)           */
/* ---------------------------------------------------------------------- */

#define NUM_BASE_LEVELS 2
#define COEFF_BASE_RANGE 12
#define BR_CDF_SIZE 4
#define COEFF_CONTEXT_BITS 6
#define COEFF_CONTEXT_MASK 63

static const int16_t eob_group_start[12] = {0, 1, 2, 3, 5, 9, 17, 33, 65, 129, 257, 513};
static const int16_t eob_offset_bits[12] = {0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9};
static const uint8_t eob_to_pos_small[33] = {0, 1, 2, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 5, 5,
                                             5, 5, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6,
                                             6, 6, 6};
static const uint8_t eob_to_pos_large[17] = {6, 7, 8, 8, 9, 9, 9, 9, 10, 10, 10, 10, 10,
                                             10, 10, 10, 11};

static void write_golomb(EcEnc *e, int level) {
    int x = level + 1;
    int length = 32 - __builtin_clz(x);
    for (int i = 0; i < length - 1; i++) ec_bool(e, 0, 16384);
    for (int i = length - 1; i >= 0; i--) ec_bool(e, (x >> i) & 1, 16384);
}

/* cdf row pointers/strides let Python hand us views into the FrameContext
 * arrays so adaptation state stays shared. All cdf rows include the
 * adaptation counter element. */
int32_t ec_write_coeffs_txb(
    EcEnc *e, const int32_t *qcoeff, int n, int eob, const int16_t *scan,
    const int8_t *coeff_ctxs,      /* per scan index, len eob */
    const int8_t *br_ctx_map,      /* per raster position, len n */
    int adapt,
    uint16_t *txb_skip_row,        /* 2-sym row */
    uint16_t *eob_multi_row, int eob_multi_nsyms,
    uint16_t *eob_extra_rows,      /* 22 rows x 3 (indexed by eob_pt) */
    uint16_t *base_eob_rows,       /* 4 ctx rows x 4 */
    uint16_t *base_rows,           /* 42 ctx rows x 5 */
    uint16_t *br_rows,             /* 21 ctx rows x 5 */
    uint16_t *dc_sign_row, int include_skip) {
    if (include_skip) {
        ec_symbol(e, eob == 0, txb_skip_row, 2, adapt);
        if (eob == 0) return 0;
    }

    int eob_pt, eob_extra;
    if (eob < 33) {
        eob_pt = eob_to_pos_small[eob];
    } else {
        int i = (eob - 1) >> 5;
        eob_pt = eob_to_pos_large[i > 16 ? 16 : i];
    }
    eob_extra = eob - eob_group_start[eob_pt];
    ec_symbol(e, eob_pt - 1, eob_multi_row, eob_multi_nsyms, adapt);
    int bits = eob_offset_bits[eob_pt];
    if (bits > 0) {
        int bit = (eob_extra >> (bits - 1)) & 1;
        ec_symbol(e, bit, eob_extra_rows + 3 * eob_pt, 2, adapt);
        for (int i = 1; i < bits; i++) ec_bool(e, (eob_extra >> (bits - 1 - i)) & 1, 16384);
    }

    for (int c = eob - 1; c >= 0; c--) {
        int pos = scan[c];
        int32_t v = qcoeff[pos];
        int level = v < 0 ? -v : v;
        int cctx = coeff_ctxs[c];
        if (c == eob - 1) {
            int s = (level < 3 ? level : 3) - 1;
            ec_symbol(e, s, base_eob_rows + 4 * cctx, 3, adapt);
        } else {
            int s = level < 3 ? level : 3;
            ec_symbol(e, s, base_rows + 5 * cctx, 4, adapt);
        }
        if (level > NUM_BASE_LEVELS) {
            int base_range = level - 1 - NUM_BASE_LEVELS;
            int brc = br_ctx_map[pos];
            for (int idx = 0; idx < COEFF_BASE_RANGE; idx += BR_CDF_SIZE - 1) {
                int k = base_range - idx;
                if (k > BR_CDF_SIZE - 1) k = BR_CDF_SIZE - 1;
                ec_symbol(e, k, br_rows + 5 * brc, BR_CDF_SIZE, adapt);
                if (k < BR_CDF_SIZE - 1) break;
            }
        }
    }

    int cul_level = 0;
    for (int c = 0; c < eob; c++) {
        int pos = scan[c];
        int32_t v = qcoeff[pos];
        int level = v < 0 ? -v : v;
        cul_level += level;
        if (level) {
            int sign = v < 0;
            if (c == 0)
                ec_symbol(e, sign, dc_sign_row, 2, adapt);
            else
                ec_bool(e, sign, 16384);
            if (level > COEFF_BASE_RANGE + NUM_BASE_LEVELS)
                write_golomb(e, level - COEFF_BASE_RANGE - 1 - NUM_BASE_LEVELS);
        }
    }
    if (cul_level > COEFF_CONTEXT_MASK) cul_level = COEFF_CONTEXT_MASK;
    if (qcoeff[0] < 0)
        cul_level |= 1 << COEFF_CONTEXT_BITS;
    else if (qcoeff[0] > 0)
        cul_level += 2 << COEFF_CONTEXT_BITS;
    return cul_level;
}

/* ---------------------------------------------------------------------- */
/* generic butterfly-graph evaluator (1-D transform stages)                */
/* ---------------------------------------------------------------------- */

/* Stage-major flattened op arrays (see codec/transforms.compiled_stages):
 * per output lane: acc = wa*cur[A] + wb*cur[B];
 * kind 0 = passthrough, 1 = clamp(acc), 2 = round_shift(acc, cos_bit). */
void txfm_eval_graph(const int32_t *A, const int32_t *B, const int64_t *wa,
                     const int64_t *wb, const int8_t *kind, int n_stages, int n,
                     const int64_t *x, int batch, int cos_bit, int clamp_bit,
                     int64_t *out) {
    int64_t bufa[64], bufb[64];
    int64_t rnd = 1ll << (cos_bit - 1);
    int64_t lo = 0, hi = 0;
    if (clamp_bit > 0) {
        lo = -(1ll << (clamp_bit - 1));
        hi = (1ll << (clamp_bit - 1)) - 1;
    }
    for (int b = 0; b < batch; b++) {
        const int64_t *src = x + (size_t)b * n;
        int64_t *cur = bufa, *nxt = bufb;
        memcpy(cur, src, n * sizeof(int64_t));
        for (int s = 0; s < n_stages; s++) {
            const int32_t *sA = A + (size_t)s * n;
            const int32_t *sB = B + (size_t)s * n;
            const int64_t *swa = wa + (size_t)s * n;
            const int64_t *swb = wb + (size_t)s * n;
            const int8_t *sk = kind + (size_t)s * n;
            for (int i = 0; i < n; i++) {
                int64_t acc = swa[i] * cur[sA[i]] + swb[i] * cur[sB[i]];
                if (sk[i] == 2)
                    acc = (acc + rnd) >> cos_bit;
                else if (sk[i] == 1 && clamp_bit > 0)
                    acc = acc < lo ? lo : (acc > hi ? hi : acc);
                nxt[i] = acc;
            }
            int64_t *t = cur;
            cur = nxt;
            nxt = t;
        }
        memcpy(out + (size_t)b * n, cur, n * sizeof(int64_t));
    }
}

/* ---- Whole-2D transform drivers (transforms.py forward_transform_2d /
 * inverse_transform_add; behavior ref transforms.c + inv_transforms.c).
 * The 1-D butterfly graphs are the same flattened stage arrays used by
 * txfm_eval_graph; ADST4 (sinpi form) and IDTX are hand-coded. ---- */

static const int64_t tx_sinpi[7][5] = { /* [cos_bit-10][j]; spec constants */
    {0, 330, 621, 836, 951},      {0, 660, 1241, 1672, 1901},
    {0, 1321, 2482, 3344, 3803},  {0, 2642, 4964, 6689, 7606},
    {0, 5283, 9929, 13377, 15212},{0, 10566, 19858, 26755, 30424},
    {0, 21133, 39716, 53510, 60849},
};

static inline int64_t rshift(int64_t x, int bit) {
    if (bit == 0) return x;
    if (bit > 0) return (x + (1ll << (bit - 1))) >> bit;
    return x << (-bit);
}

/* kind1d: 0 = butterfly graph, 1 = forward ADST4, 2 = inverse ADST4,
 * 3 = identity. */
typedef struct {
    int kind1d;
    const int32_t *A, *B;
    const int64_t *wa, *wb;
    const int8_t *k;
    int nstages, cos_bit, clamp_bit;
} tx1d_t;

static void tx1d_vec(int64_t *v, int n, const tx1d_t *t) {
    if (t->kind1d == 3) { /* identity */
        for (int i = 0; i < n; i++) {
            switch (n) {
            case 4:  v[i] = rshift(v[i] * 5793, 12); break;
            case 8:  v[i] = v[i] * 2; break;
            case 16: v[i] = rshift(v[i] * 2 * 5793, 12); break;
            case 32: v[i] = v[i] * 4; break;
            default: v[i] = rshift(v[i] * 4 * 5793, 12); break;
            }
        }
        return;
    }
    if (t->kind1d == 1 || t->kind1d == 2) { /* ADST4 */
        const int64_t *sp = tx_sinpi[t->cos_bit - 10];
        int64_t x0 = v[0], x1 = v[1], x2 = v[2], x3 = v[3];
        int64_t o0, o1, o2, o3;
        if (t->kind1d == 2) { /* inverse */
            int64_t s0 = sp[1] * x0 + sp[4] * x2 + sp[2] * x3;
            int64_t s1 = sp[2] * x0 - sp[1] * x2 - sp[4] * x3;
            int64_t s2 = sp[3] * ((x0 - x2) + x3);
            int64_t s3 = sp[3] * x1;
            o0 = s0 + s3;
            o1 = s1 + s3;
            o2 = s2;
            o3 = (s0 + s1) - s3;
        } else {
            int64_t a0 = sp[1] * x0 + sp[2] * x1 + sp[4] * x3;
            int64_t a1 = sp[3] * ((x0 + x1) - x3);
            int64_t a2 = sp[4] * x0 - sp[1] * x1 + sp[2] * x3;
            int64_t a3 = sp[3] * x2;
            o0 = a0 + a3;
            o1 = a1;
            o2 = a2 - a3;
            o3 = (a2 - a0) + a3;
        }
        v[0] = rshift(o0, t->cos_bit);
        v[1] = rshift(o1, t->cos_bit);
        v[2] = rshift(o2, t->cos_bit);
        v[3] = rshift(o3, t->cos_bit);
        return;
    }
    int64_t bufa[64], bufb[64];
    int64_t rnd = 1ll << (t->cos_bit - 1);
    int64_t lo = 0, hi = 0;
    if (t->clamp_bit > 0) {
        lo = -(1ll << (t->clamp_bit - 1));
        hi = (1ll << (t->clamp_bit - 1)) - 1;
    }
    int64_t *cur = bufa, *nxt = bufb;
    memcpy(cur, v, n * sizeof(int64_t));
    for (int s = 0; s < t->nstages; s++) {
        const int32_t *sA = t->A + (size_t)s * n;
        const int32_t *sB = t->B + (size_t)s * n;
        const int64_t *swa = t->wa + (size_t)s * n;
        const int64_t *swb = t->wb + (size_t)s * n;
        const int8_t *sk = t->k + (size_t)s * n;
        for (int i = 0; i < n; i++) {
            int64_t acc = swa[i] * cur[sA[i]] + swb[i] * cur[sB[i]];
            if (sk[i] == 2)
                acc = (acc + rnd) >> t->cos_bit;
            else if (sk[i] == 1 && t->clamp_bit > 0)
                acc = acc < lo ? lo : (acc > hi ? hi : acc);
            nxt[i] = acc;
        }
        int64_t *tmp = cur; cur = nxt; nxt = tmp;
    }
    memcpy(v, cur, n * sizeof(int64_t));
}

/* Apply a 1-D transform to nvec vectors of length len inside buf, where
 * vector v's element e lives at buf[v*vstride + e*estride]. */
static void tx1d_apply(int64_t *buf, int nvec, int len, int vstride,
                       int estride, const tx1d_t *t, int post_shift) {
    int64_t vec[64];
    for (int v = 0; v < nvec; v++) {
        int64_t *base = buf + (size_t)v * vstride;
        for (int e = 0; e < len; e++) vec[e] = base[(size_t)e * estride];
        tx1d_vec(vec, len, t);
        for (int e = 0; e < len; e++)
            base[(size_t)e * estride] = rshift(vec[e], post_shift);
    }
}

void txfm2d_fwd(const int32_t *res, int nblk, int H, int W,
                int ck, const void *cA, const void *cB, const void *cwa,
                const void *cwb, const void *ckd, int cns, int cbit,
                int rk, const void *rA, const void *rB, const void *rwa,
                const void *rwb, const void *rkd, int rns, int rbit,
                int s0, int s1, int s2, int ud, int lr, int rect,
                int32_t *out) {
    tx1d_t col = {ck, cA, cB, cwa, cwb, ckd, cns, cbit, 0};
    tx1d_t row = {rk, rA, rB, rwa, rwb, rkd, rns, rbit, 0};
    int64_t buf[64 * 64];
    for (int b = 0; b < nblk; b++) {
        const int32_t *src = res + (size_t)b * H * W;
        for (int r = 0; r < H; r++) {
            const int32_t *sr = src + (size_t)(ud ? H - 1 - r : r) * W;
            for (int c = 0; c < W; c++)
                buf[r * W + c] = rshift((int64_t)sr[c], -s0);
        }
        /* columns: length H, stride W */
        tx1d_apply(buf, W, H, 1, W, &col, -s1);
        if (lr)
            for (int r = 0; r < H; r++)
                for (int c = 0; c < W / 2; c++) {
                    int64_t t = buf[r * W + c];
                    buf[r * W + c] = buf[r * W + W - 1 - c];
                    buf[r * W + W - 1 - c] = t;
                }
        /* rows: length W, contiguous */
        tx1d_apply(buf, H, W, W, 1, &row, -s2);
        int32_t *dst = out + (size_t)b * H * W;
        for (int r = 0; r < H; r++)
            for (int c = 0; c < W; c++) {
                int64_t x = buf[r * W + c];
                if (rect) x = rshift(x * 5793, 12);
                if ((W == 64 && c >= 32) || (H == 64 && r >= 32)) x = 0;
                dst[r * W + c] = (int32_t)x;
            }
    }
}

void txfm2d_inv_add(const int32_t *coeff, const uint16_t *pred, int nblk,
                    int H, int W,
                    int rk, const void *rA, const void *rB, const void *rwa,
                    const void *rwb, const void *rkd, int rns, int rclamp,
                    int ck, const void *cA, const void *cB, const void *cwa,
                    const void *cwb, const void *ckd, int cns, int cclamp,
                    int s0, int s1, int clamp_in, int clamp_mid, int ud,
                    int lr, int rect, int bd, uint16_t *out) {
    tx1d_t row = {rk, rA, rB, rwa, rwb, rkd, rns, 12, rclamp};
    tx1d_t col = {ck, cA, cB, cwa, cwb, ckd, cns, 12, cclamp};
    int64_t buf[64 * 64];
    const int64_t ilo = -(1ll << (clamp_in - 1)), ihi = (1ll << (clamp_in - 1)) - 1;
    const int64_t mlo = -(1ll << (clamp_mid - 1)), mhi = (1ll << (clamp_mid - 1)) - 1;
    const int peak = (1 << bd) - 1;
    for (int b = 0; b < nblk; b++) {
        const int32_t *src = coeff + (size_t)b * H * W;
        for (int r = 0; r < H; r++)
            for (int c = 0; c < W; c++) {
                int64_t x = ((W == 64 && c >= 32) || (H == 64 && r >= 32))
                            ? 0 : src[r * W + c];
                if (rect) x = rshift(x * 2896, 12);
                buf[r * W + c] = x < ilo ? ilo : (x > ihi ? ihi : x);
            }
        /* rows: length W */
        tx1d_apply(buf, H, W, W, 1, &row, -s0);
        if (lr)
            for (int r = 0; r < H; r++)
                for (int c = 0; c < W / 2; c++) {
                    int64_t t = buf[r * W + c];
                    buf[r * W + c] = buf[r * W + W - 1 - c];
                    buf[r * W + W - 1 - c] = t;
                }
        for (int i = 0; i < H * W; i++)
            buf[i] = buf[i] < mlo ? mlo : (buf[i] > mhi ? mhi : buf[i]);
        /* columns: length H */
        tx1d_apply(buf, W, H, 1, W, &col, -s1);
        const uint16_t *pr = pred + (size_t)b * H * W;
        uint16_t *dst = out + (size_t)b * H * W;
        for (int r = 0; r < H; r++) {
            const int64_t *br = buf + (size_t)(ud ? H - 1 - r : r) * W;
            for (int c = 0; c < W; c++) {
                int64_t y = (int64_t)pr[r * W + c] + br[c];
                dst[r * W + c] = (uint16_t)(y < 0 ? 0 : (y > peak ? peak : y));
            }
        }
    }
}

/* ---- lane-batched 2-D transforms (walk_precommit): same graph tables
 * and rounding as the scalar paths above, but processing L blocks per
 * slab with the block index as the innermost (contiguous) dimension so
 * every stage op vectorizes across lanes. The conformant walk is
 * single-threaded, so static scratch is safe. */
#define TXB_CAP 32768   /* max len*lanes elements per slab */
/* int32 lanes: AV1's stage ranges keep every between-stage value within
 * int32 (the reference's own C uses int32 buffers); products are computed
 * in int64 at the multiply. Halving the element size doubles the SIMD
 * width of every lane loop. */
static int32_t txb_slab[TXB_CAP], txb_slab2[TXB_CAP];
static int32_t txb_bufA[TXB_CAP], txb_bufB[TXB_CAP];

/* 1-D transform along `len` elements, each a row of `lw` lanes in
 * slab[len][lw]; applies rshift(post_shift) afterward (tx1d_apply). */
static void tx1d_batch(int32_t *slab, int len, int lw, const tx1d_t *t,
                       int post_shift) {
    if (t->kind1d == 3) { /* identity */
        for (int e = 0; e < len; e++) {
            int32_t *v = slab + (size_t)e * lw;
            switch (len) {
            case 4:
                for (int l = 0; l < lw; l++)
                    v[l] = (int32_t)rshift((int64_t)v[l] * 5793, 12);
                break;
            case 8:
                for (int l = 0; l < lw; l++) v[l] = v[l] * 2;
                break;
            case 16:
                for (int l = 0; l < lw; l++)
                    v[l] = (int32_t)rshift((int64_t)v[l] * 2 * 5793, 12);
                break;
            case 32:
                for (int l = 0; l < lw; l++) v[l] = v[l] * 4;
                break;
            default:
                for (int l = 0; l < lw; l++)
                    v[l] = (int32_t)rshift((int64_t)v[l] * 4 * 5793, 12);
                break;
            }
        }
    } else if (t->kind1d == 1 || t->kind1d == 2) { /* ADST4 */
        const int64_t *sp = tx_sinpi[t->cos_bit - 10];
        int32_t *x0 = slab, *x1 = slab + lw, *x2 = slab + 2 * lw,
                *x3 = slab + 3 * lw;
        if (t->kind1d == 2) { /* inverse */
            for (int l = 0; l < lw; l++) {
                int64_t s0 = sp[1] * x0[l] + sp[4] * x2[l] + sp[2] * x3[l];
                int64_t s1 = sp[2] * x0[l] - sp[1] * x2[l] - sp[4] * x3[l];
                int64_t s2 = sp[3] * ((int64_t)(x0[l] - x2[l]) + x3[l]);
                int64_t s3 = sp[3] * x1[l];
                x0[l] = (int32_t)rshift(s0 + s3, t->cos_bit);
                x1[l] = (int32_t)rshift(s1 + s3, t->cos_bit);
                x2[l] = (int32_t)rshift(s2, t->cos_bit);
                x3[l] = (int32_t)rshift((s0 + s1) - s3, t->cos_bit);
            }
        } else {
            for (int l = 0; l < lw; l++) {
                int64_t a0 = sp[1] * x0[l] + sp[2] * x1[l] + sp[4] * x3[l];
                int64_t a1 = sp[3] * ((int64_t)(x0[l] + x1[l]) - x3[l]);
                int64_t a2 = sp[4] * x0[l] - sp[1] * x1[l] + sp[2] * x3[l];
                int64_t a3 = sp[3] * x2[l];
                x0[l] = (int32_t)rshift(a0 + a3, t->cos_bit);
                x1[l] = (int32_t)rshift(a1, t->cos_bit);
                x2[l] = (int32_t)rshift(a2 - a3, t->cos_bit);
                x3[l] = (int32_t)rshift((a2 - a0) + a3, t->cos_bit);
            }
        }
    } else { /* butterfly graph */
        int64_t rnd = 1ll << (t->cos_bit - 1);
        int32_t lo = 0, hi = 0;
        if (t->clamp_bit > 0) {
            lo = (int32_t)-(1ll << (t->clamp_bit - 1));
            hi = (int32_t)((1ll << (t->clamp_bit - 1)) - 1);
        }
        int32_t *cur = txb_bufA, *nxt = txb_bufB;
        memcpy(cur, slab, (size_t)len * lw * sizeof(int32_t));
        for (int s = 0; s < t->nstages; s++) {
            const int32_t *sA = t->A + (size_t)s * len;
            const int32_t *sB = t->B + (size_t)s * len;
            const int64_t *swa = t->wa + (size_t)s * len;
            const int64_t *swb = t->wb + (size_t)s * len;
            const int8_t *sk = t->k + (size_t)s * len;
            for (int i = 0; i < len; i++) {
                const int64_t wa = swa[i], wb = swb[i];
                const int32_t *a = cur + (size_t)sA[i] * lw;
                const int32_t *b = cur + (size_t)sB[i] * lw;
                int32_t *o = nxt + (size_t)i * lw;
                if (sk[i] == 2) {
                    for (int l = 0; l < lw; l++)
                        o[l] = (int32_t)((wa * a[l] + wb * b[l] + rnd)
                                         >> t->cos_bit);
                } else if (sk[i] == 1 && t->clamp_bit > 0) {
                    /* |w| == 1 on non-shift stages (asserted at table
                       extraction): int32 adds cannot overflow here */
                    const int32_t wa32 = (int32_t)wa, wb32 = (int32_t)wb;
                    for (int l = 0; l < lw; l++) {
                        int32_t acc = wa32 * a[l] + wb32 * b[l];
                        o[l] = acc < lo ? lo : (acc > hi ? hi : acc);
                    }
                } else {
                    const int32_t wa32 = (int32_t)wa, wb32 = (int32_t)wb;
                    for (int l = 0; l < lw; l++)
                        o[l] = wa32 * a[l] + wb32 * b[l];
                }
            }
            int32_t *tmp = cur; cur = nxt; nxt = tmp;
        }
        memcpy(slab, cur, (size_t)len * lw * sizeof(int32_t));
    }
    if (post_shift > 0) {
        int32_t prnd = 1 << (post_shift - 1);
        for (size_t i = 0; i < (size_t)len * lw; i++)
            slab[i] = (slab[i] + prnd) >> post_shift;
    } else if (post_shift < 0) {
        for (size_t i = 0; i < (size_t)len * lw; i++)
            slab[i] <<= -post_shift;
    }
}

static int txb_lanes(int H, int W) {
    int L = TXB_CAP / (H * W);
    return L > 32 ? 32 : (L < 1 ? 1 : L);
}

void txfm2d_fwd_batch(const int32_t *res, int nblk, int H, int W,
                      int ck, const void *cA, const void *cB, const void *cwa,
                      const void *cwb, const void *ckd, int cns, int cbit,
                      int rk, const void *rA, const void *rB, const void *rwa,
                      const void *rwb, const void *rkd, int rns, int rbit,
                      int s0, int s1, int s2, int ud, int lr, int rect,
                      int32_t *out) {
    tx1d_t col = {ck, cA, cB, cwa, cwb, ckd, cns, cbit, 0};
    tx1d_t row = {rk, rA, rB, rwa, rwb, rkd, rns, rbit, 0};
    int L = txb_lanes(H, W);
    for (int b0 = 0; b0 < nblk; b0 += L) {
        int Lb = nblk - b0 < L ? nblk - b0 : L;
        /* load: slab[(r*W+c)*Lb + l], s0 pre-shift + ud row reversal */
        for (int r = 0; r < H; r++)
            for (int c = 0; c < W; c++) {
                int32_t *o = txb_slab + ((size_t)(r * W + c)) * Lb;
                int sr = ud ? H - 1 - r : r;
                for (int l = 0; l < Lb; l++)
                    o[l] = (int32_t)rshift(
                        (int64_t)res[(size_t)(b0 + l) * H * W + sr * W + c],
                        -s0);
            }
        /* columns: elements are rows, lanes = W*Lb contiguous */
        tx1d_batch(txb_slab, H, W * Lb, &col, -s1);
        if (lr)
            for (int r = 0; r < H; r++)
                for (int c = 0; c < W / 2; c++) {
                    int32_t *a = txb_slab + ((size_t)(r * W + c)) * Lb;
                    int32_t *b =
                        txb_slab + ((size_t)(r * W + W - 1 - c)) * Lb;
                    for (int l = 0; l < Lb; l++) {
                        int32_t t = a[l]; a[l] = b[l]; b[l] = t;
                    }
                }
        /* transpose to [(c*H+r)*Lb + l] for the row pass */
        for (int r = 0; r < H; r++)
            for (int c = 0; c < W; c++) {
                const int32_t *a = txb_slab + ((size_t)(r * W + c)) * Lb;
                int32_t *b = txb_slab2 + ((size_t)(c * H + r)) * Lb;
                for (int l = 0; l < Lb; l++) b[l] = a[l];
            }
        tx1d_batch(txb_slab2, W, H * Lb, &row, -s2);
        for (int r = 0; r < H; r++)
            for (int c = 0; c < W; c++) {
                const int32_t *a = txb_slab2 + ((size_t)(c * H + r)) * Lb;
                int zero = (W == 64 && c >= 32) || (H == 64 && r >= 32);
                for (int l = 0; l < Lb; l++) {
                    int64_t x = a[l];
                    if (rect) x = rshift(x * 5793, 12);
                    if (zero) x = 0;
                    out[(size_t)(b0 + l) * H * W + r * W + c] = (int32_t)x;
                }
            }
    }
}

void txfm2d_inv_add_batch(const int32_t *coeff, const uint16_t *pred,
                          int nblk, int H, int W,
                          int rk, const void *rA, const void *rB,
                          const void *rwa, const void *rwb, const void *rkd,
                          int rns, int rclamp,
                          int ck, const void *cA, const void *cB,
                          const void *cwa, const void *cwb, const void *ckd,
                          int cns, int cclamp,
                          int s0, int s1, int clamp_in, int clamp_mid,
                          int ud, int lr, int rect, int bd, uint16_t *out) {
    tx1d_t row = {rk, rA, rB, rwa, rwb, rkd, rns, 12, rclamp};
    tx1d_t col = {ck, cA, cB, cwa, cwb, ckd, cns, 12, cclamp};
    const int64_t ilo = -(1ll << (clamp_in - 1));
    const int64_t ihi = (1ll << (clamp_in - 1)) - 1;
    const int64_t mlo = -(1ll << (clamp_mid - 1));
    const int64_t mhi = (1ll << (clamp_mid - 1)) - 1;
    const int peak = (1 << bd) - 1;
    int L = txb_lanes(H, W);
    for (int b0 = 0; b0 < nblk; b0 += L) {
        int Lb = nblk - b0 < L ? nblk - b0 : L;
        /* load into [(c*H+r)*Lb + l]: elements c contiguous for row pass */
        for (int r = 0; r < H; r++)
            for (int c = 0; c < W; c++) {
                int32_t *o = txb_slab + ((size_t)(c * H + r)) * Lb;
                int zero = (W == 64 && c >= 32) || (H == 64 && r >= 32);
                for (int l = 0; l < Lb; l++) {
                    int64_t x = zero ? 0
                        : coeff[(size_t)(b0 + l) * H * W + r * W + c];
                    if (rect) x = rshift(x * 2896, 12);
                    o[l] = (int32_t)(x < ilo ? ilo : (x > ihi ? ihi : x));
                }
            }
        /* rows: elements are c, lanes = H*Lb */
        tx1d_batch(txb_slab, W, H * Lb, &row, -s0);
        if (lr)
            for (int c = 0; c < W / 2; c++) {
                int32_t *a = txb_slab + ((size_t)c * H) * Lb;
                int32_t *b = txb_slab + ((size_t)(W - 1 - c) * H) * Lb;
                for (size_t l = 0; l < (size_t)H * Lb; l++) {
                    int32_t t = a[l]; a[l] = b[l]; b[l] = t;
                }
            }
        for (size_t i = 0; i < (size_t)H * W * Lb; i++)
            txb_slab[i] = (int32_t)(txb_slab[i] < mlo ? mlo
                : (txb_slab[i] > mhi ? mhi : txb_slab[i]));
        /* transpose to [(r*W+c)*Lb + l] for the column pass */
        for (int r = 0; r < H; r++)
            for (int c = 0; c < W; c++) {
                const int32_t *a = txb_slab + ((size_t)(c * H + r)) * Lb;
                int32_t *b = txb_slab2 + ((size_t)(r * W + c)) * Lb;
                for (int l = 0; l < Lb; l++) b[l] = a[l];
            }
        tx1d_batch(txb_slab2, H, W * Lb, &col, -s1);
        for (int r = 0; r < H; r++) {
            int sr = ud ? H - 1 - r : r;
            for (int c = 0; c < W; c++) {
                const int32_t *a = txb_slab2 + ((size_t)(sr * W + c)) * Lb;
                for (int l = 0; l < Lb; l++) {
                    size_t px = (size_t)(b0 + l) * H * W + r * W + c;
                    int64_t y = (int64_t)pred[px] + a[l];
                    out[px] = (uint16_t)(y < 0 ? 0 : (y > peak ? peak : y));
                }
            }
        }
    }
}

/* params-array wrappers (layouts documented at txfm2d_fwd_p below) */
void txfm2d_fwd_batch_p(const int64_t *p, const int32_t *res, int nblk,
                        int32_t *out) {
    txfm2d_fwd_batch(res, nblk, (int)p[22], (int)p[23],
                     (int)p[0], (const void *)p[1], (const void *)p[2],
                     (const void *)p[3], (const void *)p[4],
                     (const void *)p[5], (int)p[6], (int)p[7],
                     (int)p[8], (const void *)p[9], (const void *)p[10],
                     (const void *)p[11], (const void *)p[12],
                     (const void *)p[13], (int)p[14], (int)p[15],
                     (int)p[16], (int)p[17], (int)p[18], (int)p[19],
                     (int)p[20], (int)p[21], out);
}

void txfm2d_inv_add_batch_p(const int64_t *p, const int32_t *coeff,
                            const uint16_t *pred, int nblk, uint16_t *out) {
    txfm2d_inv_add_batch(coeff, pred, nblk, (int)p[24], (int)p[25],
                         (int)p[0], (const void *)p[1], (const void *)p[2],
                         (const void *)p[3], (const void *)p[4],
                         (const void *)p[5], (int)p[6], (int)p[7],
                         (int)p[8], (const void *)p[9], (const void *)p[10],
                         (const void *)p[11], (const void *)p[12],
                         (const void *)p[13], (int)p[14], (int)p[15],
                         (int)p[16], (int)p[17], (int)p[18], (int)p[19],
                         (int)p[20], (int)p[21], (int)p[22], (int)p[23],
                         out);
}

/* Coefficient writer that derives the base/BR contexts internally
 * (get_nz_map_ctx / get_br_ctx, encode_txb_ref_c.c) instead of receiving
 * numpy-computed maps. Bit-identical to coeff_coding.write_coeffs_txb.
 * nz_off2d: w*h int8 offset table for TX_CLASS_2D (unused for 1-D classes).
 * The skip symbol is written by the caller (include_skip equivalent 0). */
int32_t ec_write_coeffs_txb_full(
    EcEnc *e, const int32_t *qcoeff, int w, int h, int eob,
    const int16_t *scan, int tx_class, const int8_t *nz_off2d, int adapt,
    uint16_t *eob_multi_row, int eob_multi_nsyms,
    uint16_t *eob_extra_rows, uint16_t *base_eob_rows, uint16_t *base_rows,
    uint16_t *br_rows, uint16_t *dc_sign_row) {
    const int st = w + 4;
    uint8_t lv[36 * 36];
    memset(lv, 0, (size_t)st * (h + 4));
    for (int r = 0; r < h; r++)
        for (int c = 0; c < w; c++) {
            int32_t v = qcoeff[r * w + c];
            int a = v < 0 ? -v : v;
            lv[r * st + c] = (uint8_t)(a > 127 ? 127 : a);
        }
    int bwl = 0;
    while ((1 << bwl) < w) bwl++;
    int8_t cctx[1024];
    int8_t brm[1024];
#define C3(x) ((x) > 3 ? 3 : (x))
    for (int si = 0; si < eob; si++) {
        int pos = scan[si];
        int row = pos >> bwl, col = pos & (w - 1);
        const uint8_t *p = lv + row * st + col;
        int mag, base;
        if (tx_class == 0)
            mag = C3(p[1]) + C3(p[st]) + C3(p[st + 1]) + C3(p[2]) + C3(p[2 * st]);
        else if (tx_class == 2)
            mag = C3(p[1]) + C3(p[st]) + C3(p[2 * st]) + C3(p[3 * st]) + C3(p[4 * st]);
        else
            mag = C3(p[1]) + C3(p[st]) + C3(p[2]) + C3(p[3]) + C3(p[4]);
        int ctx = (mag + 1) >> 1;
        if (ctx > 4) ctx = 4;
        if (tx_class == 0)
            base = pos == 0 ? 0 : ctx + nz_off2d[pos];
        else {
            int axis = tx_class == 1 ? col : row;
            base = ctx + (axis == 0 ? 0 : (axis == 1 ? 5 : 10));
        }
        if (si == eob - 1)
            base = si == 0 ? 0 : (si <= (w * h) / 8 ? 1 : (si <= (w * h) / 4 ? 2 : 3));
        cctx[si] = (int8_t)base;
        int32_t v = qcoeff[pos];
        int level = v < 0 ? -v : v;
        if (level > NUM_BASE_LEVELS) { /* br ctx needed only for these */
            int m = p[1] + p[st];
            if (tx_class == 0) m += p[st + 1];
            else if (tx_class == 1) m += p[2];
            else m += p[2 * st];
            m = (m + 1) >> 1;
            if (m > 6) m = 6;
            int off;
            if (pos == 0) off = 0;
            else if (tx_class == 0) off = (row < 2 && col < 2) ? 7 : 14;
            else if (tx_class == 1) off = col == 0 ? 7 : 14;
            else off = row == 0 ? 7 : 14;
            brm[pos] = (int8_t)(m + off);
        }
    }
#undef C3
    return ec_write_coeffs_txb(e, qcoeff, w * h, eob, scan, cctx, brm, adapt,
                               0, eob_multi_row, eob_multi_nsyms,
                               eob_extra_rows, base_eob_rows, base_rows,
                               br_rows, dc_sign_row, 0);
}

/* Params-array entry points: the 20+ scalar ctypes args above cost ~2us of
 * marshalling per call; these take one preassembled int64 params array
 * (built once per (tx_size, tx_type, bd) and cached on the Python side).
 * Layout fwd: [ck,cA,cB,cwa,cwb,ckd,cns,cbit, rk,rA,rB,rwa,rwb,rkd,rns,rbit,
 *              s0,s1,s2,ud,lr,rect,H,W]
 * Layout inv: [rk,rA,rB,rwa,rwb,rkd,rns,rclamp, ck,cA,cB,cwa,cwb,ckd,cns,
 *              cclamp, s0,s1,clamp_in,clamp_mid,ud,lr,rect,bd,H,W] */
void txfm2d_fwd_p(const int64_t *p, const int32_t *res, int nblk,
                  int32_t *out) {
    txfm2d_fwd(res, nblk, (int)p[22], (int)p[23],
               (int)p[0], (const void *)p[1], (const void *)p[2],
               (const void *)p[3], (const void *)p[4], (const void *)p[5],
               (int)p[6], (int)p[7],
               (int)p[8], (const void *)p[9], (const void *)p[10],
               (const void *)p[11], (const void *)p[12], (const void *)p[13],
               (int)p[14], (int)p[15],
               (int)p[16], (int)p[17], (int)p[18], (int)p[19], (int)p[20],
               (int)p[21], out);
}

void txfm2d_inv_add_p(const int64_t *p, const int32_t *coeff,
                      const uint16_t *pred, int nblk, uint16_t *out) {
    txfm2d_inv_add(coeff, pred, nblk, (int)p[24], (int)p[25],
                   (int)p[0], (const void *)p[1], (const void *)p[2],
                   (const void *)p[3], (const void *)p[4], (const void *)p[5],
                   (int)p[6], (int)p[7],
                   (int)p[8], (const void *)p[9], (const void *)p[10],
                   (const void *)p[11], (const void *)p[12], (const void *)p[13],
                   (int)p[14], (int)p[15],
                   (int)p[16], (int)p[17], (int)p[18], (int)p[19], (int)p[20],
                   (int)p[21], (int)p[22], (int)p[23], out);
}
