/* Native motion-compensation + motion-estimation kernels.
 *
 * Behavior reference: svt_av1_convolve_2d_sr_c and the x/y/copy
 * specializations (inter_prediction.c:311) plus the SAD loops of
 * motion_estimation.c. Bit-identical to codec/convolve.py (verified by
 * tests/test_convolve.py); the ME helpers are encoder-side only.
 */
#include <stdint.h>
#include <stdlib.h>
#include <time.h>
#include <stdio.h>
#include <string.h>

#define FILTER_BITS 7

/* Convolve one (h+7, w+7) int32 patch into (h, w) uint16 out.
 * fx / fy: 8-tap kernels (int32). subpel flags select the rounding mode.
 * Matches convolve.py convolve_2d_sr exactly. */
void mc_convolve_2d_sr(const int32_t *src, int src_stride, int w, int h,
                       const int32_t *fx, const int32_t *fy,
                       int subpel_x, int subpel_y, int bd, uint16_t *out) {
    const int round_0 = 3, round_1 = 11;
    const int peak = (1 << bd) - 1;
    if (!subpel_x && !subpel_y) {
        for (int r = 0; r < h; r++)
            for (int c = 0; c < w; c++)
                out[r * w + c] = (uint16_t)src[(r + 3) * src_stride + c + 3];
        return;
    }
    if (subpel_x && subpel_y) {
        int32_t im[(128 + 7) * 128];
        const int off = 1 << (bd + FILTER_BITS - 1);
        for (int r = 0; r < h + 7; r++) {
            const int32_t *s = src + r * src_stride;
            for (int c = 0; c < w; c++) {
                int32_t acc = off + (1 << (round_0 - 1));
                for (int k = 0; k < 8; k++) acc += fx[k] * s[c + k];
                im[r * w + c] = acc >> round_0;
            }
        }
        const int offset_bits = bd + 2 * FILTER_BITS - round_0;
        const int bits = 2 * FILTER_BITS - round_0 - round_1;
        const int32_t sub = (1 << (offset_bits - round_1)) +
                            (1 << (offset_bits - round_1 - 1));
        for (int r = 0; r < h; r++)
            for (int c = 0; c < w; c++) {
                int32_t acc = (1 << offset_bits) + (1 << (round_1 - 1));
                for (int k = 0; k < 8; k++) acc += fy[k] * im[(r + k) * w + c];
                int32_t v = (acc >> round_1) - sub;
                if (bits > 0) v = (v + (1 << (bits - 1))) >> bits;
                if (v < 0) v = 0;
                if (v > peak) v = peak;
                out[r * w + c] = (uint16_t)v;
            }
        return;
    }
    if (subpel_x) {
        const int bits = FILTER_BITS - round_0;
        for (int r = 0; r < h; r++) {
            const int32_t *s = src + (r + 3) * src_stride;
            for (int c = 0; c < w; c++) {
                int32_t acc = 0;
                for (int k = 0; k < 8; k++) acc += fx[k] * s[c + k];
                acc = (acc + (1 << (round_0 - 1))) >> round_0;
                acc = (acc + (1 << (bits - 1))) >> bits;
                if (acc < 0) acc = 0;
                if (acc > peak) acc = peak;
                out[r * w + c] = (uint16_t)acc;
            }
        }
        return;
    }
    for (int r = 0; r < h; r++)
        for (int c = 0; c < w; c++) {
            int32_t acc = 1 << (FILTER_BITS - 1);
            for (int k = 0; k < 8; k++)
                acc += fy[k] * src[(r + k) * src_stride + c + 3];
            acc >>= FILTER_BITS;
            if (acc < 0) acc = 0;
            if (acc > peak) acc = peak;
            out[r * w + c] = (uint16_t)acc;
        }
}

/* Convolve + SAD against cur in one pass (no output buffer round-trip).
 * src points at the (h+7, w+7) window; cur is (h, w) int32. */
int64_t mc_subpel_sad(const int32_t *src, int src_stride, int w, int h,
                      const int32_t *fx, const int32_t *fy,
                      int subpel_x, int subpel_y, int bd,
                      const int32_t *cur) {
    uint16_t buf[128 * 128];
    mc_convolve_2d_sr(src, src_stride, w, h, fx, fy, subpel_x, subpel_y, bd, buf);
    int64_t sad = 0;
    for (int i = 0; i < w * h; i++) {
        int32_t d = (int32_t)buf[i] - cur[i];
        sad += d < 0 ? -d : d;
    }
    return sad;
}

/* Full-pel SAD grid over offsets dy in [y0, y1), dx in [x0, x1) (relative to
 * ref top-left). cur: (h, w) int32; ref: int32 with stride. Writes argmin to
 * best[3] = {dy, dx, sad}. Caller guarantees all windows are in bounds. */
static int64_t sad_one(const int32_t *cur, int w, int h,
                       const int32_t *ref, int ref_stride, int dy, int dx,
                       int64_t lim) {
    int64_t sad = 0;
    for (int r = 0; r < h; r++) {
        const int32_t *rp = ref + (dy + r) * ref_stride + dx;
        const int32_t *cp = cur + r * w;
        for (int c = 0; c < w; c++) {
            int32_t d = rp[c] - cp[c];
            sad += d < 0 ? -d : d;
        }
        if (sad >= lim) return sad;
    }
    return sad;
}

void me_sad_grid(const int32_t *cur, int w, int h,
                 const int32_t *ref, int ref_stride,
                 int y0, int y1, int x0, int x1, int step,
                 int64_t *best) {
    int64_t best_sad = INT64_MAX;
    int best_dy = y0, best_dx = x0;
    /* seed with the grid centre: the predicted position usually wins, and a
     * tight initial bound lets the per-row early-exit cut most candidates */
    int cy = (y0 + y1 - 1) >> 1, cx = (x0 + x1 - 1) >> 1;
    if (cy >= y0 && cx >= x0) {
        best_sad = sad_one(cur, w, h, ref, ref_stride, cy, cx, INT64_MAX);
        best_dy = cy; best_dx = cx;
    }
    for (int dy = y0; dy < y1; dy += step) {
        for (int dx = x0; dx < x1; dx += step) {
            int64_t sad = 0;
            for (int r = 0; r < h; r++) {
                const int32_t *rp = ref + (dy + r) * ref_stride + dx;
                const int32_t *cp = cur + r * w;
                for (int c = 0; c < w; c++) {
                    int32_t d = rp[c] - cp[c];
                    sad += d < 0 ? -d : d;
                }
                if (sad >= best_sad) break;
            }
            if (sad < best_sad) {
                best_sad = sad;
                best_dy = dy;
                best_dx = dx;
            }
        }
    }
    best[0] = best_dy;
    best[1] = best_dx;
    best[2] = best_sad;
}

/* Whole-block ME search: HME on the 1/4 pyramid, full-pel refine, then a
 * half/quarter/eighth-pel diamond (two descent iterations per step).
 * Mirrors codec/me.py search_block. filters: 16x8 int32 subpel kernel table
 * (regular 8-tap). out[3] = {mv_row, mv_col, sad}, MV in 1/8-pel units. */
static int64_t subpel_try(const int32_t *cur, int w, int h,
                          const int32_t *ref, int refH, int refW,
                          const int32_t *filters, int bd,
                          int x0, int y0, int mvy, int mvx) {
    int py = y0 + (mvy >> 3), px = x0 + (mvx >> 3);
    int sy = (mvy & 7) << 1, sx = (mvx & 7) << 1;
    if (py - 3 < 0 || px - 3 < 0 || py + h + 4 > refH || px + w + 4 > refW)
        return INT64_MAX;
    return mc_subpel_sad(ref + (py - 3) * refW + (px - 3), refW, w, h,
                         filters + 8 * sx, filters + 8 * sy, sx != 0, sy != 0,
                         bd, cur);
}

/* grid search with an external pruning bound: candidates that cannot beat
 * `bound` are cut by the per-row early exit; if nothing in the grid beats
 * it, best[2] = INT64_MAX (exact for a strictly-smaller comparison). */
static void me_sad_grid_bounded(const int32_t *cur, int w, int h,
                                const int32_t *ref, int ref_stride,
                                int y0, int y1, int x0, int x1,
                                int64_t bound, int64_t *best) {
    int64_t best_sad = bound;
    int best_dy = -1, best_dx = 0;
    for (int dy = y0; dy < y1; dy++)
        for (int dx = x0; dx < x1; dx++) {
            int64_t sad = sad_one(cur, w, h, ref, ref_stride, dy, dx, best_sad);
            if (sad < best_sad) {
                best_sad = sad;
                best_dy = dy;
                best_dx = dx;
            }
        }
    if (best_dy < 0) {
        best[2] = INT64_MAX;
    } else {
        best[0] = best_dy;
        best[1] = best_dx;
        best[2] = best_sad;
    }
}

static void sad_grid_clamped(const int32_t *cur, int w, int h,
                             const int32_t *ref, int refH, int refW,
                             int cy, int cx, int rad, int64_t *best) {
    int y0 = cy - rad, x0 = cx - rad;
    int y1 = cy + rad + 1, x1 = cx + rad + 1;
    if (y0 < 0) y0 = 0;
    if (x0 < 0) x0 = 0;
    if (y1 > refH - h + 1) y1 = refH - h + 1;
    if (x1 > refW - w + 1) x1 = refW - w + 1;
    if (y1 <= y0 || x1 <= x0) {
        best[0] = cy; best[1] = cx; best[2] = INT64_MAX;
        return;
    }
    me_sad_grid(cur, w, h, ref, refW, y0, y1, x0, x1, 1, best);
}

void me_search_block_seeded2(const int32_t *cur, int w, int h,
                             const int32_t *ref, int refH, int refW,
                             const int32_t *curq, int qw, int qh,
                             const int32_t *refq, int qH, int qW,
                             int x0, int y0, int range,
                             const int32_t *filters, int bd, int subpel,
                             int n_seeds, const int *seeds_dy,
                             const int *seeds_dx, int64_t *out) {
    int64_t b[3];
    /* seed MVs (spatial neighbour, temporal co-located): evaluated first,
     * they both add (usually good) candidates and hand the grids a tight
     * pruning bound */
    int64_t seed_sad = INT64_MAX;
    int sbest_dy = 0, sbest_dx = 0, seed_valid = 0;
    for (int k = 0; k < n_seeds; k++) {
        int sy = y0 + seeds_dy[k], sx = x0 + seeds_dx[k];
        if (sy < 0 || sx < 0 || sy + h > refH || sx + w > refW)
            continue;
        int64_t sd = sad_one(cur, w, h, ref, refW, sy, sx, seed_sad);
        if (sd < seed_sad) {
            seed_sad = sd;
            sbest_dy = seeds_dy[k];
            sbest_dx = seeds_dx[k];
            seed_valid = 1;
        }
    }
    /* near-perfect seed: the grids cannot pay for themselves (subpel
     * refinement is also skipped below this SAD) */
    if (seed_valid && seed_sad < (int64_t)(w * h) / 2) {
        out[0] = sbest_dy * 8;
        out[1] = sbest_dx * 8;
        out[2] = seed_sad;
        return;
    }
    /* HME on the 1/4 pyramid */
    int rad_q = range >> 2;
    if (rad_q < 2) rad_q = 2;
    sad_grid_clamped(curq, qw, qh, refq, qH, qW, y0 >> 2, x0 >> 2, rad_q, b);
    int dyq = b[2] == INT64_MAX ? 0 : (int)b[0] - (y0 >> 2);
    int dxq = b[2] == INT64_MAX ? 0 : (int)b[1] - (x0 >> 2);
    /* full-pel refine around the scaled HME candidate; when HME moved away
     * from zero also check the zero-MV neighborhood (HME can miss sub-pel
     * pans at quarter resolution) and keep the better region */
    sad_grid_clamped(cur, w, h, ref, refH, refW, y0 + dyq * 4, x0 + dxq * 4, 7, b);
    if (seed_valid && seed_sad < b[2]) {
        b[0] = y0 + sbest_dy;
        b[1] = x0 + sbest_dx;
        b[2] = seed_sad;
    }
    if (dyq != 0 || dxq != 0) {
        int64_t b2[3];
        int zy0 = y0 - 7, zx0 = x0 - 7, zy1 = y0 + 8, zx1 = x0 + 8;
        if (zy0 < 0) zy0 = 0;
        if (zx0 < 0) zx0 = 0;
        if (zy1 > refH - h + 1) zy1 = refH - h + 1;
        if (zx1 > refW - w + 1) zx1 = refW - w + 1;
        if (zy1 > zy0 && zx1 > zx0) {
            me_sad_grid_bounded(cur, w, h, ref, refW, zy0, zy1, zx0, zx1,
                                b[2], b2);
            if (b2[2] < b[2]) {
                b[0] = b2[0];
                b[1] = b2[1];
                b[2] = b2[2];
            }
        }
    }
    int fy, fx;
    int64_t sad;
    if (b[2] == INT64_MAX) {
        fy = fx = 0;
        sad = 1;   /* degenerate frame edge: keep zero MV, skip subpel */
        int64_t s = 0;
        for (int r = 0; r < h && y0 + r < refH; r++)
            for (int c = 0; c < w && x0 + c < refW; c++) {
                int32_t d = ref[(y0 + r) * refW + x0 + c] - cur[r * w + c];
                s += d < 0 ? -d : d;
            }
        sad = s;
    } else {
        fy = (int)b[0] - y0;
        fx = (int)b[1] - x0;
        sad = b[2];
    }
    int mvy = fy * 8, mvx = fx * 8;
    if (subpel && sad > (int64_t)(w * h) / 2) {
        for (int step = 4; step >= 1; step >>= 1) {
            for (int it = 0; it < 2; it++) {
                int by = mvy, bx = mvx;
                static const int dmy[4] = {-1, 1, 0, 0};
                static const int dmx[4] = {0, 0, -1, 1};
                for (int d = 0; d < 4; d++) {
                    int ty = by + dmy[d] * step, tx = bx + dmx[d] * step;
                    int64_t s = subpel_try(cur, w, h, ref, refH, refW,
                                           filters, bd, x0, y0, ty, tx);
                    if (s < sad) { sad = s; mvy = ty; mvx = tx; }
                }
                if (mvy == by && mvx == bx) break;
            }
        }
    }
    out[0] = mvy;
    out[1] = mvx;
    out[2] = sad;
}

void me_search_block(const int32_t *cur, int w, int h,
                     const int32_t *ref, int refH, int refW,
                     const int32_t *curq, int qw, int qh,
                     const int32_t *refq, int qH, int qW,
                     int x0, int y0, int range,
                     const int32_t *filters, int bd, int subpel,
                     int64_t *out) {
    me_search_block_seeded2(cur, w, h, ref, refH, refW, curq, qw, qh, refq,
                            qH, qW, x0, y0, range, filters, bd, subpel,
                            0, 0, 0, out);
}

/* Quantize one txb (mirror of codec/quant.quantize_b: highbd semantics,
 * optional quantizer-matrix weights). Raster-order arrays of n coeffs;
 * scan gives raster positions in scan order for the eob computation.
 * Returns eob. */
int quantize_txb(const int64_t *coeff, int n,
                 const int16_t *scan,
                 int zbin_dc, int zbin_ac, int rnd_dc, int rnd_ac,
                 int quant_dc, int quant_ac, int qshift_dc, int qshift_ac,
                 int deq_dc, int deq_ac, int log_scale,
                 const uint8_t *qm, const uint16_t *iqm,
                 int32_t *qcoeff, int32_t *dqcoeff) {
    if (log_scale) {                /* ROUND_POWER_OF_TWO(zbin/round, log2) */
        zbin_dc = (zbin_dc + (1 << (log_scale - 1))) >> log_scale;
        zbin_ac = (zbin_ac + (1 << (log_scale - 1))) >> log_scale;
        rnd_dc = (rnd_dc + (1 << (log_scale - 1))) >> log_scale;
        rnd_ac = (rnd_ac + (1 << (log_scale - 1))) >> log_scale;
    }
    for (int i = 0; i < n; i++) {
        int64_t c = coeff[i];
        int sign = c < 0;
        int64_t a = sign ? -c : c;
        int64_t wt = qm ? qm[i] : 32;
        int64_t iwt = iqm ? iqm[i] : 32;
        int zbin = i ? zbin_ac : zbin_dc;
        int64_t abs_q = 0;
        if (a * wt >= ((int64_t)zbin << 5)) {
            int64_t tmpw = (a + (i ? rnd_ac : rnd_dc)) * wt;
            int64_t q = i ? quant_ac : quant_dc;
            int64_t qs = i ? qshift_ac : qshift_dc;
            abs_q = ((((tmpw * q) >> 16) + tmpw) * qs) >> (16 - log_scale + 5);
        }
        int64_t dequant = (((int64_t)(i ? deq_ac : deq_dc)) * iwt + 16) >> 5;
        int64_t abs_dq = (abs_q * dequant) >> log_scale;
        qcoeff[i] = (int32_t)(sign ? -abs_q : abs_q);
        dqcoeff[i] = (int32_t)(sign ? -abs_dq : abs_dq);
    }
    int eob = 0;
    for (int si = n - 1; si >= 0; si--) {
        if (qcoeff[scan[si]] != 0) {
            eob = si + 1;
            break;
        }
    }
    return eob;
}

/* Filter-intra prediction (spec 7.11.2.3; reference filterintra_c.c:70):
 * recursive 4x2 patches, 7 taps each. above/left are the substituted
 * neighbor rows ([0] = top-left corner); taps is the (8,8) int32 table for
 * one mode (only the first 7 columns are used). w,h <= 32. */
void filter_intra_pred(const int32_t *above, const int32_t *left,
                       int w, int h, const int32_t *taps, int bd,
                       uint16_t *out) {
    int32_t buf[33 * 33];
    const int st = w + 1;
    const int peak = (1 << bd) - 1;
    for (int c = 0; c <= w; c++) buf[c] = above[c];
    for (int r = 1; r <= h; r++) buf[r * st] = left[r];
    for (int r = 1; r <= h; r += 2) {
        for (int c = 1; c <= w; c += 4) {
            const int32_t p0 = buf[(r - 1) * st + c - 1];
            const int32_t p1 = buf[(r - 1) * st + c];
            const int32_t p2 = buf[(r - 1) * st + c + 1];
            const int32_t p3 = buf[(r - 1) * st + c + 2];
            const int32_t p4 = buf[(r - 1) * st + c + 3];
            const int32_t p5 = buf[r * st + c - 1];
            const int32_t p6 = buf[(r + 1) * st + c - 1];
            for (int k = 0; k < 8; k++) {
                const int32_t *t = taps + k * 8;
                int32_t acc = t[0] * p0 + t[1] * p1 + t[2] * p2 + t[3] * p3
                            + t[4] * p4 + t[5] * p5 + t[6] * p6;
                int32_t v = acc < 0 ? -((-acc + 8) >> 4) : (acc + 8) >> 4;
                if (v < 0) v = 0;
                if (v > peak) v = peak;
                buf[(r + (k >> 2)) * st + c + (k & 3)] = v;
            }
        }
    }
    for (int r = 0; r < h; r++)
        for (int c = 0; c < w; c++)
            out[r * w + c] = (uint16_t)buf[(r + 1) * st + c + 1];
}

/* psy-rd energy kernels (reference psy_rd.c:65,99,135): SA8D / 4x4 SATD via
 * fast Walsh-Hadamard butterflies. abs-sum is invariant under the WHT's
 * coefficient permutation, so butterflies match the H @ b @ H^T form. */
static void wht8(int32_t *v) {
    for (int s = 1; s < 8; s <<= 1)
        for (int i = 0; i < 8; i += s << 1)
            for (int j = i; j < i + s; j++) {
                int32_t a = v[j], b = v[j + s];
                v[j] = a + b;
                v[j + s] = a - b;
            }
}

static int64_t sa8d_8x8(const int32_t *x, int stride) {
    int32_t m[8][8];
    for (int r = 0; r < 8; r++) {
        for (int c = 0; c < 8; c++) m[r][c] = x[r * stride + c];
        wht8(m[r]);
    }
    int64_t sum = 0;
    for (int c = 0; c < 8; c++) {
        int32_t col[8];
        for (int r = 0; r < 8; r++) col[r] = m[r][c];
        wht8(col);
        for (int r = 0; r < 8; r++) sum += col[r] < 0 ? -col[r] : col[r];
    }
    return (sum + 2) >> 2;
}

static int64_t satd_4x4(const int32_t *x, int stride) {
    int32_t m[4][4];
    for (int r = 0; r < 4; r++) {
        int32_t a = x[r * stride], b = x[r * stride + 1];
        int32_t c = x[r * stride + 2], d = x[r * stride + 3];
        int32_t s0 = a + b, d0 = a - b, s1 = c + d, d1 = c - d;
        m[r][0] = s0 + s1; m[r][1] = d0 + d1; m[r][2] = s0 - s1; m[r][3] = d0 - d1;
    }
    int64_t sum = 0;
    for (int c = 0; c < 4; c++) {
        int32_t a = m[0][c], b = m[1][c], cc = m[2][c], d = m[3][c];
        int32_t s0 = a + b, d0 = a - b, s1 = cc + d, d1 = cc - d;
        int32_t o[4] = {s0 + s1, d0 + d1, s0 - s1, d0 - d1};
        for (int k = 0; k < 4; k++) sum += o[k] < 0 ? -o[k] : o[k];
    }
    return sum >> 1;
}

/* Per-tile energy = SA8D (or SATD4) - SAD/4, raster tile order. t in {4,8};
 * trailing partial tiles are dropped (matches the numpy tiler). */
void psy_block_energy(const int32_t *x, int stride, int h, int w, int t,
                      int64_t *out) {
    int n = 0;
    for (int ty = 0; ty + t <= h; ty += t)
        for (int tx = 0; tx + t <= w; tx += t) {
            const int32_t *p = x + ty * stride + tx;
            int64_t sad = 0;
            for (int r = 0; r < t; r++)
                for (int c = 0; c < t; c++) {
                    int32_t v = p[r * stride + c];
                    sad += v < 0 ? -v : v;
                }
            int64_t txd = t == 8 ? sa8d_8x8(p, stride) : satd_4x4(p, stride);
            out[n++] = txd - (sad >> 2);
        }
}

/* sum |src_energy[i] - energy(recon tile i)| */
int64_t psy_distortion_sum(const int32_t *recon, int stride, int h, int w,
                           int t, const int64_t *src_energy) {
    int64_t total = 0;
    int n = 0;
    for (int ty = 0; ty + t <= h; ty += t)
        for (int tx = 0; tx + t <= w; tx += t) {
            const int32_t *p = recon + ty * stride + tx;
            int64_t sad = 0;
            for (int r = 0; r < t; r++)
                for (int c = 0; c < t; c++) {
                    int32_t v = p[r * stride + c];
                    sad += v < 0 ? -v : v;
                }
            int64_t txd = t == 8 ? sa8d_8x8(p, stride) : satd_4x4(p, stride);
            int64_t d = src_energy[n++] - (txd - (sad >> 2));
            total += d < 0 ? -d : d;
        }
    return total;
}

/* ---- CDEF (spec 7.15; reference cdef.c svt_aom_cdef_find_dir_c:150,
 * svt_cdef_filter_block_c:253). Bit-identical to codec/cdef.py. ---- */

#define CDEF_VERY_LARGE 0x7F7F

static const int cdef_dirs[8][2][2] = { /* [dir][k][dy,dx] */
    {{-1, 1}, {-2, 2}}, {{0, 1}, {-1, 2}}, {{0, 1}, {0, 2}}, {{0, 1}, {1, 2}},
    {{1, 1}, {2, 2}},   {{1, 0}, {2, 1}},  {{1, 0}, {2, 0}}, {{1, 0}, {2, -1}},
};
static const int cdef_pri_taps[2][2] = {{4, 2}, {3, 3}};
static const int cdef_sec_taps[2][2] = {{2, 1}, {2, 1}};
static const int64_t cdef_div[9] = {0, 840, 420, 280, 210, 168, 140, 120, 105};

static int32_t cdef_constrain(int32_t diff, int threshold, int damping) {
    if (!threshold) return 0;
    int shift = damping - (31 - __builtin_clz((unsigned)threshold));
    if (shift < 0) shift = 0;
    int32_t a = diff < 0 ? -diff : diff;
    int32_t v = threshold - (a >> shift);
    if (v < 0) v = 0;
    if (a < v) v = a;
    return diff < 0 ? -v : v;
}

/* Direction + variance for nblk 8x8 blocks of img (int32, unpadded). */
void cdef_find_dir_blocks(const int32_t *img, int stride, const int32_t *by,
                          const int32_t *bx, int nblk, int coeff_shift,
                          int32_t *dirs, int64_t *var) {
    for (int n = 0; n < nblk; n++) {
        const int32_t *p = img + by[n] * 8 * stride + bx[n] * 8;
        int64_t partial[8][15];
        memset(partial, 0, sizeof(partial));
        for (int i = 0; i < 8; i++)
            for (int j = 0; j < 8; j++) {
                int64_t x = (p[i * stride + j] >> coeff_shift) - 128;
                partial[0][i + j] += x;
                partial[1][i + j / 2] += x;
                partial[2][i] += x;
                partial[3][3 + i - j / 2] += x;
                partial[4][7 + i - j] += x;
                partial[5][3 - i / 2 + j] += x;
                partial[6][j] += x;
                partial[7][i / 2 + j] += x;
            }
        int64_t cost[8] = {0};
        for (int i = 0; i < 8; i++) {
            cost[2] += partial[2][i] * partial[2][i] * cdef_div[8];
            cost[6] += partial[6][i] * partial[6][i] * cdef_div[8];
        }
        for (int d = 0; d < 8; d += 4) {
            for (int i = 0; i < 7; i++)
                cost[d] += (partial[d][i] * partial[d][i]
                          + partial[d][14 - i] * partial[d][14 - i]) * cdef_div[i + 1];
            cost[d] += partial[d][7] * partial[d][7] * cdef_div[8];
        }
        for (int d = 1; d < 8; d += 2) {
            for (int i = 3; i < 8; i++)
                cost[d] += partial[d][i] * partial[d][i] * cdef_div[8];
            for (int j = 0; j < 3; j++)
                cost[d] += (partial[d][j] * partial[d][j]
                          + partial[d][10 - j] * partial[d][10 - j]) * cdef_div[2 * j + 2];
        }
        int best = 0;
        for (int d = 1; d < 8; d++)
            if (cost[d] > cost[best]) best = d;
        dirs[n] = best;
        var[n] = (cost[best] - cost[(best + 4) & 7]) >> 10;
    }
}

/* Filter nblk blocks. pad: padded plane (2px border, CDEF_VERY_LARGE
 * outside); dst: int32 plane (no border) filtered blocks are written to.
 * Block n covers dst[by*bh .. +bh, bx*bw .. +bw]. */
void cdef_filter_blocks(const int32_t *pad, int pstride, int32_t *dst,
                        int dstride, const int32_t *by, const int32_t *bx,
                        int nblk, const int32_t *dirs, const int32_t *pri_str,
                        int sec_str, int pri_damp, int sec_damp, int bw,
                        int bh, int bd) {
    /* constrain() as lookup tables per distinct (strength, damping): the
     * per-tap branchy clamp becomes one load. Sentinel border pixels
     * (CDEF_VERY_LARGE) constrain to 0 at any codable strength, so they are
     * handled by a skip branch, keeping the table at +/-(1<<bd). */
    enum { MAXTAB = 8 };
    const int off = 1 << bd;
    const int tabn = 2 * (1 << bd) + 1;
    static __thread int16_t *tabmem = NULL;
    static __thread int tabcap = 0;
    if (tabcap < MAXTAB * tabn) {
        free(tabmem);
        tabmem = (int16_t *)malloc(sizeof(int16_t) * MAXTAB * tabn);
        tabcap = MAXTAB * tabn;
    }
    int tkey[MAXTAB], tcnt = 0, tevict = 0;
    /* slot 0 is pinned to the secondary strength (its pointer outlives the
     * block loop); eviction cycles through slots 1..MAXTAB-1 only */
    #define GET_TAB(TH, DAMP, OUT) do { \
        int key_ = ((TH) << 5) | (DAMP); \
        int fi_ = -1; \
        for (int q_ = 0; q_ < tcnt; q_++) \
            if (tkey[q_] == key_) { fi_ = q_; break; } \
        if (fi_ < 0) { \
            fi_ = tcnt < MAXTAB ? tcnt++ \
                                : 1 + (tevict++ % (MAXTAB - 1)); \
            tkey[fi_] = key_; \
            int16_t *t_ = tabmem + fi_ * tabn; \
            for (int d_ = -off; d_ <= off; d_++) \
                t_[d_ + off] = (int16_t)cdef_constrain(d_, (TH), (DAMP)); \
        } \
        (OUT) = tabmem + fi_ * tabn + off; \
    } while (0)
    const int16_t *stab;
    GET_TAB(sec_str, sec_damp, stab);
    for (int n = 0; n < nblk; n++) {
        const int dir = dirs[n];
        const int pri = pri_str[n];
        const int ti = (pri >> (bd - 8)) & 1;
        const int y0 = by[n] * bh, x0 = bx[n] * bw;
        const int16_t *ptab;
        GET_TAB(pri, pri_damp, ptab);
        /* hoisted tap geometry: 4 primary + 8 secondary (offset, tap) */
        int poff[4], ptap[4], soff[8], stap[8], np = 0, ns = 0;
        for (int k = 0; k < 2; k++) {
            int dy = cdef_dirs[dir][k][0], dx = cdef_dirs[dir][k][1];
            for (int sgn = 1; sgn >= -1; sgn -= 2) {
                poff[np] = sgn * dy * pstride + sgn * dx;
                ptap[np++] = cdef_pri_taps[ti][k];
            }
            for (int delta = 2; delta >= -2; delta -= 4) {
                int d2 = (dir + delta) & 7;
                int sdy = cdef_dirs[d2][k][0], sdx = cdef_dirs[d2][k][1];
                for (int sgn = 1; sgn >= -1; sgn -= 2) {
                    soff[ns] = sgn * sdy * pstride + sgn * sdx;
                    stap[ns++] = cdef_sec_taps[ti][k];
                }
            }
        }
        for (int r = 0; r < bh; r++)
            for (int c = 0; c < bw; c++) {
                const int32_t *px = pad + (y0 + r + 2) * pstride + x0 + c + 2;
                int32_t x = *px;
                int32_t sum = 0, mx = x, mn = x;
                for (int k = 0; k < 4; k++) {
                    int32_t p = px[poff[k]];
                    if (p != CDEF_VERY_LARGE) {
                        sum += ptap[k] * ptab[p - x];
                        if (p > mx) mx = p;
                        if (p < mn) mn = p;
                    }
                }
                for (int k = 0; k < 8; k++) {
                    int32_t p = px[soff[k]];
                    if (p != CDEF_VERY_LARGE) {
                        sum += stap[k] * stab[p - x];
                        if (p > mx) mx = p;
                        if (p < mn) mn = p;
                    }
                }
                int32_t y = x + ((8 + sum - (sum < 0)) >> 4);
                if (y < mn) y = mn;
                if (y > mx) y = mx;
                dst[(y0 + r) * dstride + x0 + c] = y;
            }
    }
    #undef GET_TAB
}

/* ---- Intra predictors (spec 7.11.2; reference intra_prediction.c
 * dc/v/h/smooth/paeth :1094-1160 and dr z1/z2/z3 :314-440). Bit-identical
 * to codec/intra.py + codec/intra_dir.py. ---- */

static const uint16_t sm_w4[4] = {255, 149, 85, 64};
static const uint16_t sm_w8[8] = {255, 197, 146, 105, 73, 50, 37, 32};
static const uint16_t sm_w16[16] = {255, 225, 196, 170, 145, 123, 102, 84,
                                    68, 54, 43, 33, 26, 20, 17, 16};
static const uint16_t sm_w32[32] = {255, 240, 225, 210, 196, 182, 169, 157,
                                    145, 133, 122, 111, 101, 92, 83, 74, 66,
                                    59, 52, 45, 39, 34, 29, 25, 21, 17, 14,
                                    12, 10, 9, 8, 8};
static const uint16_t sm_w64[64] = {255, 248, 240, 233, 225, 218, 210, 203,
    196, 189, 182, 176, 169, 163, 156, 150, 144, 138, 133, 127, 121, 116,
    111, 106, 101, 96, 91, 86, 82, 77, 73, 69, 65, 61, 57, 54, 50, 47, 44,
    41, 38, 35, 32, 29, 27, 25, 22, 20, 18, 16, 15, 13, 12, 10, 9, 8, 7, 6,
    6, 5, 5, 4, 4, 4};

static const uint16_t *sm_weights(int n) {
    switch (n) {
    case 4: return sm_w4;
    case 8: return sm_w8;
    case 16: return sm_w16;
    case 32: return sm_w32;
    default: return sm_w64;
    }
}

/* mode: 0 DC, 1 V, 2 H, 3 SMOOTH, 4 SMOOTH_V, 5 SMOOTH_H, 6 PAETH */
void intra_pred_block(int mode, const int32_t *above, const int32_t *left,
                      int32_t corner, int have_above, int have_left,
                      int W, int H, int bd, uint16_t *out) {
    if (mode == 0) { /* DC */
        int64_t dc;
        if (have_above && have_left) {
            int64_t s = 0;
            for (int i = 0; i < W; i++) s += above[i];
            for (int i = 0; i < H; i++) s += left[i];
            dc = (s + ((W + H) >> 1)) / (W + H);
        } else if (have_above) {
            int64_t s = 0;
            for (int i = 0; i < W; i++) s += above[i];
            int lg = 0; while ((1 << lg) < W) lg++;
            dc = (s + (W >> 1)) >> lg;
        } else if (have_left) {
            int64_t s = 0;
            for (int i = 0; i < H; i++) s += left[i];
            int lg = 0; while ((1 << lg) < H) lg++;
            dc = (s + (H >> 1)) >> lg;
        } else {
            dc = 1 << (bd - 1);
        }
        for (int i = 0; i < H * W; i++) out[i] = (uint16_t)dc;
        return;
    }
    if (mode == 1) { /* V */
        for (int r = 0; r < H; r++)
            for (int c = 0; c < W; c++) out[r * W + c] = (uint16_t)above[c];
        return;
    }
    if (mode == 2) { /* H */
        for (int r = 0; r < H; r++)
            for (int c = 0; c < W; c++) out[r * W + c] = (uint16_t)left[r];
        return;
    }
    if (mode == 6) { /* PAETH */
        for (int r = 0; r < H; r++)
            for (int c = 0; c < W; c++) {
                int32_t t = above[c], l = left[r], tl = corner;
                int32_t base = t + l - tl;
                int32_t pl = base - l; if (pl < 0) pl = -pl;
                int32_t pt = base - t; if (pt < 0) pt = -pt;
                int32_t ptl = base - tl; if (ptl < 0) ptl = -ptl;
                out[r * W + c] = (uint16_t)(
                    (pl <= pt && pl <= ptl) ? l : (pt <= ptl ? t : tl));
            }
        return;
    }
    const uint16_t *ww = sm_weights(W);
    const uint16_t *wh = sm_weights(H);
    const int scale = 256;
    if (mode == 3) { /* SMOOTH */
        int32_t below = left[H - 1], right = above[W - 1];
        for (int r = 0; r < H; r++)
            for (int c = 0; c < W; c++) {
                uint32_t p = (uint32_t)wh[r] * above[c]
                           + (uint32_t)(scale - wh[r]) * below
                           + (uint32_t)ww[c] * left[r]
                           + (uint32_t)(scale - ww[c]) * right;
                out[r * W + c] = (uint16_t)((p + 256) >> 9);
            }
        return;
    }
    if (mode == 4) { /* SMOOTH_V */
        int32_t below = left[H - 1];
        for (int r = 0; r < H; r++)
            for (int c = 0; c < W; c++) {
                uint32_t p = (uint32_t)wh[r] * above[c]
                           + (uint32_t)(scale - wh[r]) * below;
                out[r * W + c] = (uint16_t)((p + 128) >> 8);
            }
        return;
    }
    /* SMOOTH_H */
    int32_t right = above[W - 1];
    for (int r = 0; r < H; r++)
        for (int c = 0; c < W; c++) {
            uint32_t p = (uint32_t)ww[c] * left[r]
                       + (uint32_t)(scale - ww[c]) * right;
            out[r * W + c] = (uint16_t)((p + 128) >> 8);
        }
}

/* Directional zones. above_buf/left_buf: 1+W+H entries, [0] = corner. */
void intra_dr_pred(const int32_t *above_buf, const int32_t *left_buf,
                   int W, int H, int dx, int dy, int zone, int bd,
                   uint16_t *out) {
    const int peak = (1 << bd) - 1;
    if (zone == 1) {
        const int32_t *a = above_buf + 1;
        const int maxb = W + H - 1;
        for (int r = 0; r < H; r++) {
            int x = (r + 1) * dx;
            for (int c = 0; c < W; c++) {
                int base = (x >> 6) + c;
                int shift = (x & 0x3F) >> 1;
                int32_t v;
                if (base >= maxb) v = a[maxb];
                else {
                    int b1 = base + 1 > maxb ? maxb : base + 1;
                    v = (a[base] * (32 - shift) + a[b1] * shift + 16) >> 5;
                }
                if (v < 0) v = 0;
                if (v > peak) v = peak;
                out[r * W + c] = (uint16_t)v;
            }
        }
        return;
    }
    if (zone == 3) {
        const int32_t *l = left_buf + 1;
        const int maxb = W + H - 1;
        for (int r = 0; r < H; r++)
            for (int c = 0; c < W; c++) {
                int y = (c + 1) * dy;
                int base = (y >> 6) + r;
                int shift = (y & 0x3F) >> 1;
                int32_t v;
                if (base >= maxb) v = l[maxb];
                else {
                    int b1 = base + 1 > maxb ? maxb : base + 1;
                    v = (l[base] * (32 - shift) + l[b1] * shift + 16) >> 5;
                }
                if (v < 0) v = 0;
                if (v > peak) v = peak;
                out[r * W + c] = (uint16_t)v;
            }
        return;
    }
    /* zone 2 */
    const int la = 1 + W + H;
    for (int r = 0; r < H; r++)
        for (int c = 0; c < W; c++) {
            int x = -(r + 1) * dx + (c << 6);
            int base1 = x >> 6;
            int32_t v;
            if (base1 >= -1) {
                int shift = (x & 0x3F) >> 1;
                int i1 = base1 + 1;
                if (i1 < 0) i1 = 0;
                if (i1 > la - 2) i1 = la - 2;
                v = (above_buf[i1] * (32 - shift) + above_buf[i1 + 1] * shift + 16) >> 5;
            } else {
                int y = (r << 6) - (c + 1) * dy;
                int shift = (y & 0x3F) >> 1;
                int i2 = (y >> 6) + 1;
                if (i2 < 0) i2 = 0;
                if (i2 > la - 2) i2 = la - 2;
                v = (left_buf[i2] * (32 - shift) + left_buf[i2 + 1] * shift + 16) >> 5;
            }
            if (v < 0) v = 0;
            if (v > peak) v = peak;
            out[r * W + c] = (uint16_t)v;
        }
}

/* uint16 variant of psy_distortion_sum: recon planes/blocks are uint16 in
 * the encoder, so this skips the per-candidate int32 conversion. */
int64_t psy_distortion_sum_u16(const uint16_t *recon, int stride, int h,
                               int w, int t, const int64_t *src_energy) {
    int64_t total = 0;
    int n = 0;
    int32_t tile[64];
    for (int ty = 0; ty + t <= h; ty += t)
        for (int tx = 0; tx + t <= w; tx += t) {
            const uint16_t *p = recon + ty * stride + tx;
            int64_t sad = 0;
            for (int r = 0; r < t; r++)
                for (int c = 0; c < t; c++) {
                    int32_t v = p[r * stride + c];
                    tile[r * t + c] = v;
                    sad += v;
                }
            int64_t txd = t == 8 ? sa8d_8x8(tile, t) : satd_4x4(tile, t);
            int64_t d = src_energy[n++] - (txd - (sad >> 2));
            total += d < 0 ? -d : d;
        }
    return total;
}

/* ---- Open-loop per-block P-frame mode decision -------------------------
 * Mirrors the decision section of codec/inter_encoder._encode_block with an
 * open-loop intra estimate (source neighbors instead of decoded ones):
 * NEWMV (whole-block ME) + GLOBALMV on LAST, a residual-gated GOLDEN NEWMV,
 * and a 5-mode intra fallback (DC/V/H/SMOOTH/PAETH). Candidate cost is
 * SSE + psy-rd energy distortion (psy/psy_rd.py semantics). One call per
 * frame; out[5*i..] = {use_inter, ref_frame, mode, mv_row, mv_col}.
 * Behavioral reference: mode-decision candidate generation in
 * product_coding_loop.c (open-loop MD) -- re-architected as a batched
 * decision pre-pass feeding a sequential commit walk. */

static int64_t sse_pred_u16(const uint16_t *src, int sstride,
                            const uint16_t *pred, int W, int H) {
    int64_t s = 0;
    for (int r = 0; r < H; r++)
        for (int c = 0; c < W; c++) {
            int32_t d = (int32_t)src[r * sstride + c] - (int32_t)pred[r * W + c];
            s += (int64_t)d * d;
        }
    return s;
}

/* bounded SSE: once the partial sum reaches `lim` the candidate has lost
 * every comparison it feeds (psy cost >= 0), so bail (exact pruning) */
static int64_t sse_pred_u16_b(const uint16_t *src, int sstride,
                              const uint16_t *pred, int W, int H,
                              int64_t lim) {
    int64_t s = 0;
    for (int r = 0; r < H; r++) {
        const uint16_t *sp = src + r * sstride;
        const uint16_t *pp = pred + r * W;
        for (int c = 0; c < W; c++) {
            int32_t d = (int32_t)sp[c] - (int32_t)pp[c];
            s += (int64_t)d * d;
        }
        if (s >= lim) return s;
    }
    return s;
}

static void mc_pred_luma(const int32_t *ref_pad, int pW, int pad,
                         int x0, int y0, int W, int H, int mvr, int mvc,
                         const int32_t *filters8, const int32_t *filters4,
                         int bd, uint16_t *out) {
    int ipy = mvr >> 3, fy = (mvr & 7) << 1;
    int ipx = mvc >> 3, fx = (mvc & 7) << 1;
    int yy = y0 + ipy + pad, xx = x0 + ipx + pad;
    const int32_t *fxk = (W > 4 ? filters8 : filters4) + 8 * fx;
    const int32_t *fyk = (H > 4 ? filters8 : filters4) + 8 * fy;
    mc_convolve_2d_sr(ref_pad + (yy - 3) * pW + (xx - 3), pW, W, H,
                      fxk, fyk, fx != 0, fy != 0, bd, out);
}

void inter_decide_frame(
    const uint16_t *src, int sstride,
    const int32_t *ref_me, int rH, int rW,
    const int32_t *refq, int qH, int qW,
    const int32_t *curq, int cqW,
    const int32_t *ref_pad, int pW, int pad,
    const int32_t *gref_me, int grH, int grW,
    const int32_t *grefq, int gqH, int gqW,
    const int32_t *gref_pad, int gpW,
    const int32_t *filters8, const int32_t *filters4,
    int bd, int range, int range2, int gm_row, int gm_col, double psy_rd, int ref2_gate,
    int inter_bias_pct,
    const int32_t *bx, const int32_t *by,
    const int32_t *bws, const int32_t *bhs, int nb,
    const int32_t *tseed_dy, const int32_t *tseed_dx,
    int dist1, int dist2,
    int32_t *out) {
    int32_t cur[64 * 64];
    int32_t cq[16 * 16];
    int32_t nb_above[64], nb_left[64];
    uint16_t pred[64 * 64];
    uint16_t pred_l[64 * 64], pred_a[64 * 64];   /* best pred per reference */
    int64_t eng[64];
    int prev_valid = 0, prev_dy = 0, prev_dx = 0;   /* LAST-ref seed */
    int prev2_valid = 0, prev2_dy = 0, prev2_dx = 0; /* second-ref seed */
    if (dist1 < 1) dist1 = 1;
    if (dist2 < 1) dist2 = 1;
    for (int i = 0; i < nb; i++) {
        int x0 = bx[i], y0 = by[i], W = bws[i], H = bhs[i];
        const uint16_t *sblk = src + y0 * sstride + x0;
        for (int r = 0; r < H; r++)
            for (int c = 0; c < W; c++)
                cur[r * W + c] = sblk[r * sstride + c];
        int t = (W >= 8 && H >= 8) ? 8 : 4;
        if (psy_rd > 0.0)
            psy_block_energy(cur, W, H, W, t, eng);
        /* psy cost of a candidate prediction */
        #define PSY_COST(P) (psy_rd > 0.0 ? (int64_t)( \
            (bd == 8 ? (psy_distortion_sum_u16((P), W, H, W, t, eng) >> 1) \
                     : (psy_distortion_sum_u16((P), W, H, W, t, eng) << 2)) \
            * psy_rd) : 0)

        /* ---- zero-motion candidates on both references first: GLOBALMV
           on LAST (gm) and GLOBALMV/identity on the second reference. The
           full NEWMV search then runs on the more promising reference
           only, and on the other one only if the residual is still large
           (the reference's MD early-exit ladder). */
        mc_pred_luma(ref_pad, pW, pad, x0, y0, W, H, gm_row, gm_col,
                     filters8, filters4, bd, pred);
        int64_t cost_zero = sse_pred_u16(sblk, sstride, pred, W, H) + PSY_COST(pred);
        int two_ref = gref_pad && ref2_gate < 0;
        int64_t best_l = cost_zero, best_a = INT64_MAX;
        int mvl_r = gm_row, mvl_c = gm_col, mva_r = 0, mva_c = 0;
        memcpy(pred_l, pred, sizeof(uint16_t) * W * H);
        int64_t cost_zero2 = INT64_MAX;
        if (two_ref) {
            mc_pred_luma(gref_pad, gpW, pad, x0, y0, W, H, 0, 0,
                         filters8, filters4, bd, pred);
            int64_t sse2 = sse_pred_u16(sblk, sstride, pred, W, H);
            best_a = sse2 + PSY_COST(pred);
            memcpy(pred_a, pred, sizeof(uint16_t) * W * H);
            cost_zero2 = sse2 < cost_zero ? best_a : INT64_MAX;
        }
        int best_ref = cost_zero2 < cost_zero ? 4 : 1;
        int best_mode = 15;                       /* GLOBALMV */
        int best_mvr = best_ref == 1 ? gm_row : 0;
        int best_mvc = best_ref == 1 ? gm_col : 0;
        int64_t best_inter = cost_zero2 < cost_zero ? cost_zero2 : cost_zero;

        int qw = W >> 2, qh = H >> 2;
        if (qw < 1) qw = 1;
        if (qh < 1) qh = 1;
        int qy = y0 >> 2, qx = x0 >> 2;
        int64_t me_out[3];
        for (int r = 0; r < qh; r++)
            for (int c = 0; c < qw; c++)
                cq[r * qw + c] = curq[(qy + r) * cqW + qx + c];

        /* NEWMV on the primary (better zero-cost) reference */
        int primary2 = two_ref && cost_zero2 < cost_zero;
        if (best_inter > ((int64_t)(W * H) << 2)) {
            if (primary2) {
                int sdy[1], sdx[1], ns = 0;
                if (prev2_valid) { sdy[0] = prev2_dy; sdx[0] = prev2_dx; ns = 1; }
                me_search_block_seeded2(cur, W, H, gref_me, grH, grW, cq, qw,
                                        qh, grefq, gqH, gqW, x0, y0, range2,
                                        filters8, bd, 1, ns, sdy, sdx,
                                        me_out);
            }
            else {
                int sdy[2], sdx[2], ns = 0;
                if (prev_valid) { sdy[ns] = prev_dy; sdx[ns] = prev_dx; ns++; }
                if (tseed_dy && tseed_dy[i] != INT32_MAX) {
                    sdy[ns] = tseed_dy[i]; sdx[ns] = tseed_dx[i]; ns++;
                }
                me_search_block_seeded2(cur, W, H, ref_me, rH, rW, cq, qw, qh,
                                        refq, qH, qW, x0, y0, range, filters8,
                                        bd, 1, ns, sdy, sdx, me_out);
            }
            mc_pred_luma(primary2 ? gref_pad : ref_pad,
                         primary2 ? gpW : pW, pad, x0, y0, W, H,
                         (int)me_out[0], (int)me_out[1],
                         filters8, filters4, bd, pred);
            /* PSY_COST >= 0: skip it when SSE alone already loses (exact) */
            int64_t plim = primary2 ? best_a : best_l;
            if (best_inter > plim) plim = best_inter;
            int64_t sse = sse_pred_u16_b(sblk, sstride, pred, W, H, plim);
            int64_t full = sse < plim ? sse + PSY_COST(pred) : INT64_MAX;
            if (primary2) {
                if (full < best_a) {
                    best_a = full; mva_r = (int)me_out[0]; mva_c = (int)me_out[1];
                    memcpy(pred_a, pred, sizeof(uint16_t) * W * H);
                }
            } else if (full < best_l) {
                best_l = full; mvl_r = (int)me_out[0]; mvl_c = (int)me_out[1];
                memcpy(pred_l, pred, sizeof(uint16_t) * W * H);
            }
            int64_t c = sse < best_inter ? full : INT64_MAX;
            if (c < best_inter) {
                best_inter = c;
                best_ref = primary2 ? 4 : 1;
                best_mode = 16;
                best_mvr = (int)me_out[0];
                best_mvc = (int)me_out[1];
            }
        }

        /* NEWMV on the other reference: for two-ref frames only when the
           residual is still noticeable; for gated GOLDEN per ref2_gate */
        int try2;
        if (two_ref)
            try2 = !primary2 && best_inter > ((int64_t)(W * H) << 3);
        else
            try2 = gref_pad && best_inter > ((int64_t)(W * H) << ref2_gate);
        int try1 = two_ref && primary2 && best_inter > ((int64_t)(W * H) << 3);
        if (try2) {
            /* seeds: this block's LAST MV scaled by the distance ratio +
             * the previous block's second-ref MV */
            int sdy[2], sdx[2], ns = 0;
            sdy[ns] = (mvl_r >> 3) * dist2 / dist1;
            sdx[ns] = (mvl_c >> 3) * dist2 / dist1;
            ns++;
            if (prev2_valid) { sdy[ns] = prev2_dy; sdx[ns] = prev2_dx; ns++; }
            me_search_block_seeded2(cur, W, H, gref_me, grH, grW, cq, qw, qh,
                                    grefq, gqH, gqW, x0, y0, range2, filters8,
                                    bd, 1, ns, sdy, sdx, me_out);
            mc_pred_luma(gref_pad, gpW, pad, x0, y0, W, H,
                         (int)me_out[0], (int)me_out[1],
                         filters8, filters4, bd, pred);
            int64_t glim = best_inter;
            if (two_ref && best_a > glim) glim = best_a;
            int64_t sse_g = sse_pred_u16_b(sblk, sstride, pred, W, H, glim);
            int64_t full_g = sse_g < glim ? sse_g + PSY_COST(pred) : INT64_MAX;
            if (two_ref && full_g < best_a) {
                best_a = full_g; mva_r = (int)me_out[0]; mva_c = (int)me_out[1];
                memcpy(pred_a, pred, sizeof(uint16_t) * W * H);
            }
            int64_t cost_g = sse_g < best_inter ? full_g : INT64_MAX;
            if (cost_g < best_inter) {
                best_inter = cost_g;
                best_ref = 4;
                best_mode = 16;
                best_mvr = (int)me_out[0];
                best_mvc = (int)me_out[1];
            }
        } else if (try1) {
            int sdy[2], sdx[2], ns = 0;
            if (prev_valid) { sdy[ns] = prev_dy; sdx[ns] = prev_dx; ns++; }
            if (tseed_dy && tseed_dy[i] != INT32_MAX) {
                sdy[ns] = tseed_dy[i]; sdx[ns] = tseed_dx[i]; ns++;
            }
            me_search_block_seeded2(cur, W, H, ref_me, rH, rW, cq, qw, qh,
                                    refq, qH, qW, x0, y0, range, filters8, bd,
                                    1, ns, sdy, sdx, me_out);
            mc_pred_luma(ref_pad, pW, pad, x0, y0, W, H,
                         (int)me_out[0], (int)me_out[1],
                         filters8, filters4, bd, pred);
            int64_t lim1 = best_inter > best_l ? best_inter : best_l;
            int64_t sse1 = sse_pred_u16_b(sblk, sstride, pred, W, H, lim1);
            int64_t full1 = sse1 < lim1 ? sse1 + PSY_COST(pred) : INT64_MAX;
            if (full1 < best_l) {
                best_l = full1; mvl_r = (int)me_out[0]; mvl_c = (int)me_out[1];
                memcpy(pred_l, pred, sizeof(uint16_t) * W * H);
            }
            int64_t cost1 = sse1 < best_inter ? full1 : INT64_MAX;
            if (cost1 < best_inter) {
                best_inter = cost1;
                best_ref = 1;
                best_mode = 16;
                best_mvr = (int)me_out[0];
                best_mvc = (int)me_out[1];
            }
        }
        /* ---- COMPOUND_AVERAGE candidate: average of the per-reference
           best predictions (decision-level approximation of the exact
           jnt rounding). Requires a clear win over the singles to pay the
           extra mode/mv rate. */
        int comp_mvl_r = 0, comp_mvl_c = 0, comp_mva_r = 0, comp_mva_c = 0;
        int use_comp = 0;
        if (two_ref) {
            for (int k = 0; k < W * H; k++)
                pred[k] = (uint16_t)((pred_l[k] + pred_a[k] + 1) >> 1);
            int64_t clim = best_inter - (best_inter >> 4);
            int64_t sse_c = sse_pred_u16_b(sblk, sstride, pred, W, H, clim);
            if (sse_c < clim) {
                int64_t cost_c = sse_c + PSY_COST(pred);
                if (cost_c < best_inter - (best_inter >> 4)) {
                    best_inter = cost_c;
                    use_comp = 1;
                    comp_mvl_r = mvl_r; comp_mvl_c = mvl_c;
                    comp_mva_r = mva_r; comp_mva_c = mva_c;
                }
            }
        }

        /* ---- open-loop intra estimate from source neighbors (skipped when
           the inter match is already near-lossless) */
        int64_t best_icost = INT64_MAX;
        int best_imode = 0;
        if (best_inter > ((int64_t)(W * H) << 1)) {
        int have_a = y0 > 0, have_l = x0 > 0;
        int32_t base = 1 << (bd - 1);
        for (int c = 0; c < W; c++)
            nb_above[c] = have_a ? sblk[-sstride + c]
                                 : (have_l ? sblk[-1] : base);
        for (int r = 0; r < H; r++)
            nb_left[r] = have_l ? sblk[r * sstride - 1]
                                : (have_a ? sblk[-sstride] : base);
        int32_t corner = (have_a && have_l) ? sblk[-sstride - 1]
                         : (have_a ? nb_above[0]
                                   : (have_l ? nb_left[0] : base));
        static const int cmodes[5] = {0, 1, 2, 3, 6};   /* DC V H SMOOTH PAETH */
        static const int pmodes[5] = {0, 1, 2, 9, 12};  /* PredictionMode */
        int64_t prune = best_inter;   /* intra only matters below this */
        for (int m = 0; m < 5; m++) {
            int64_t lim = best_icost < prune ? best_icost : prune;
            intra_pred_block(cmodes[m], nb_above, nb_left, corner,
                             have_a, have_l, W, H, bd, pred);
            int64_t sse_i = sse_pred_u16_b(sblk, sstride, pred, W, H, lim);
            if (sse_i >= lim) continue;   /* exact prune: PSY_COST >= 0 */
            int64_t c = sse_i + PSY_COST(pred);
            if (c < best_icost) { best_icost = c; best_imode = pmodes[m]; }
        }
        }
        #undef PSY_COST

        /* seed for the next (raster-adjacent) block: this block's best
         * LAST-ref full-pel MV */
        prev_valid = 1;
        prev_dy = mvl_r >> 3;
        prev_dx = mvl_c >> 3;
        if (best_a != INT64_MAX) {
            prev2_valid = 1;
            prev2_dy = mva_r >> 3;
            prev2_dx = mva_c >> 3;
        }

        int32_t *o = out + 8 * i;
        o[5] = o[6] = 0;
        /* tune-3 unipred psy bias (uni_psy_bias, md_process.h:1277): scale
         * the inter cost before the intra comparison */
        int64_t inter_biased = best_inter == INT64_MAX
            ? best_inter : best_inter * inter_bias_pct / 100;
        /* winning cost (SSE + psy) for the caller's partition DP */
        int64_t bc = inter_biased <= best_icost ? inter_biased : best_icost;
        o[7] = bc > INT32_MAX ? INT32_MAX : (int32_t)bc;
        if (inter_biased <= best_icost) {
            if (use_comp) {
                o[0] = 1; o[1] = 7; o[2] = 24;   /* NEW_NEWMV on (LAST, ref2) */
                o[3] = comp_mvl_r; o[4] = comp_mvl_c;
                o[5] = comp_mva_r; o[6] = comp_mva_c;
            } else {
                o[0] = 1; o[1] = best_ref; o[2] = best_mode;
                o[3] = best_mvr; o[4] = best_mvc;
            }
        } else {
            o[0] = 0; o[1] = 0; o[2] = best_imode; o[3] = 0; o[4] = 0;
        }
    }
}

/* ---- deblocking loop filter (normative; mirror of codec/deblock.py,
 * itself mirroring deblocking_common.c filter4/6/8/14 + the edge walk).
 * Scalar per-lane transcription of the vectorized Python; identical
 * modification order (vertical edges left->right, then horizontal). ---- */

static int32_t db_clip(int32_t x, int32_t lo, int32_t hi) {
    return x < lo ? lo : (x > hi ? hi : x);
}

/* filter4 on one lane; writes {p1,p0,q0,q1} results into o[0..3] */
static void db_filter4(int32_t p1, int32_t p0, int32_t q0, int32_t q1,
                       int mask, int thresh, int bd, int32_t o[4]) {
    int32_t off = 0x80 << (bd - 8), lo = -off, hi = off - 1;
    int32_t ps1 = p1 - off, ps0 = p0 - off, qs0 = q0 - off, qs1 = q1 - off;
    int32_t ap = p1 - p0; if (ap < 0) ap = -ap;
    int32_t aq = q1 - q0; if (aq < 0) aq = -aq;
    int hev = ap > thresh || aq > thresh;
    int32_t f = hev ? db_clip(ps1 - qs1, lo, hi) : 0;
    f = mask ? db_clip(f + 3 * (qs0 - ps0), lo, hi) : 0;
    int32_t f1 = db_clip(f + 4, lo, hi) >> 3;
    int32_t f2 = db_clip(f + 3, lo, hi) >> 3;
    o[2] = db_clip(qs0 - f1, lo, hi) + off;
    o[1] = db_clip(ps0 + f2, lo, hi) + off;
    int32_t f3 = hev ? 0 : (f1 + 1) >> 1;
    o[3] = db_clip(qs1 - f3, lo, hi) + off;
    o[0] = db_clip(ps1 + f3, lo, hi) + off;
}

#define RPOT(v, n) (((v) + (1 << ((n) - 1))) >> (n))

/* one 14-pixel segment [p6..p0 q0..q6] at s[0..13*stride], filter size fs */
static void db_filter_seg(int32_t *s, int stride, int fs, int blimit,
                          int limit, int thresh, int bd) {
    int32_t p[7], q[7];
    for (int i = 0; i < 7; i++) {
        p[i] = s[(6 - i) * stride];
        q[i] = s[(7 + i) * stride];
    }
#define A(x, y) ((x) > (y) ? (x) - (y) : (y) - (x))
    int mask2 = !(A(p[1], p[0]) > limit || A(q[1], q[0]) > limit
                  || A(p[0], q[0]) * 2 + A(p[1], q[1]) / 2 > blimit);
    int mask3 = mask2 && !(A(p[2], p[1]) > limit || A(q[2], q[1]) > limit);
    int mask4 = mask3 && !(A(p[3], p[2]) > limit || A(q[3], q[2]) > limit);
    int32_t f1 = 1 << (bd - 8);
    int flat3 = !(A(p[1], p[0]) > f1 || A(q[1], q[0]) > f1
                  || A(p[2], p[0]) > f1 || A(q[2], q[0]) > f1);
    int flat4 = flat3 && !(A(p[3], p[0]) > f1 || A(q[3], q[0]) > f1);
    int flat2 = !(A(p[6], p[0]) > f1 || A(q[6], q[0]) > f1
                  || A(p[5], p[0]) > f1 || A(q[5], q[0]) > f1
                  || A(p[4], p[0]) > f1 || A(q[4], q[0]) > f1);
#undef A
    int mask = fs == 4 ? mask2 : (fs == 6 ? mask3 : mask4);
    int32_t n4[4];
    db_filter4(p[1], p[0], q[0], q[1], mask, thresh, bd, n4);
    if (fs == 4) {
        s[5 * stride] = n4[0]; s[6 * stride] = n4[1];
        s[7 * stride] = n4[2]; s[8 * stride] = n4[3];
        return;
    }
    if (fs == 6) {
        if (mask && flat3) {
            s[5 * stride] = RPOT(p[2] * 3 + p[1] * 2 + p[0] * 2 + q[0], 3);
            s[6 * stride] = RPOT(p[2] + p[1] * 2 + p[0] * 2 + q[0] * 2 + q[1], 3);
            s[7 * stride] = RPOT(p[1] + p[0] * 2 + q[0] * 2 + q[1] * 2 + q[2], 3);
            s[8 * stride] = RPOT(p[0] + q[0] * 2 + q[1] * 2 + q[2] * 3, 3);
        } else {
            s[5 * stride] = n4[0]; s[6 * stride] = n4[1];
            s[7 * stride] = n4[2]; s[8 * stride] = n4[3];
        }
        return;
    }
    int flat_ok = mask && flat4;
    int32_t w8[6];
    if (flat_ok) {
        w8[0] = RPOT(p[3] * 3 + 2 * p[2] + p[1] + p[0] + q[0], 3);
        w8[1] = RPOT(p[3] * 2 + p[2] + 2 * p[1] + p[0] + q[0] + q[1], 3);
        w8[2] = RPOT(p[3] + p[2] + p[1] + 2 * p[0] + q[0] + q[1] + q[2], 3);
        w8[3] = RPOT(p[2] + p[1] + p[0] + 2 * q[0] + q[1] + q[2] + q[3], 3);
        w8[4] = RPOT(p[1] + p[0] + q[0] + 2 * q[1] + q[2] + 2 * q[3], 3);
        w8[5] = RPOT(p[0] + q[0] + q[1] + 2 * q[2] + 3 * q[3], 3);
    }
    if (fs == 8) {
        if (flat_ok)
            for (int i = 0; i < 6; i++) s[(4 + i) * stride] = w8[i];
        else {
            s[5 * stride] = n4[0]; s[6 * stride] = n4[1];
            s[7 * stride] = n4[2]; s[8 * stride] = n4[3];
        }
        return;
    }
    /* fs == 14 */
    if (flat_ok && flat2) {
        int32_t w14[12];
        w14[0] = RPOT(p[6] * 7 + p[5] * 2 + p[4] * 2 + p[3] + p[2] + p[1] + p[0] + q[0], 4);
        w14[1] = RPOT(p[6] * 5 + p[5] * 2 + p[4] * 2 + p[3] * 2 + p[2] + p[1] + p[0] + q[0] + q[1], 4);
        w14[2] = RPOT(p[6] * 4 + p[5] + p[4] * 2 + p[3] * 2 + p[2] * 2 + p[1] + p[0] + q[0] + q[1] + q[2], 4);
        w14[3] = RPOT(p[6] * 3 + p[5] + p[4] + p[3] * 2 + p[2] * 2 + p[1] * 2 + p[0] + q[0] + q[1] + q[2] + q[3], 4);
        w14[4] = RPOT(p[6] * 2 + p[5] + p[4] + p[3] + p[2] * 2 + p[1] * 2 + p[0] * 2 + q[0] + q[1] + q[2] + q[3] + q[4], 4);
        w14[5] = RPOT(p[6] + p[5] + p[4] + p[3] + p[2] + p[1] * 2 + p[0] * 2 + q[0] * 2 + q[1] + q[2] + q[3] + q[4] + q[5], 4);
        w14[6] = RPOT(p[5] + p[4] + p[3] + p[2] + p[1] + p[0] * 2 + q[0] * 2 + q[1] * 2 + q[2] + q[3] + q[4] + q[5] + q[6], 4);
        w14[7] = RPOT(p[4] + p[3] + p[2] + p[1] + p[0] + q[0] * 2 + q[1] * 2 + q[2] * 2 + q[3] + q[4] + q[5] + q[6] * 2, 4);
        w14[8] = RPOT(p[3] + p[2] + p[1] + p[0] + q[0] + q[1] * 2 + q[2] * 2 + q[3] * 2 + q[4] + q[5] + q[6] * 3, 4);
        w14[9] = RPOT(p[2] + p[1] + p[0] + q[0] + q[1] + q[2] * 2 + q[3] * 2 + q[4] * 2 + q[5] + q[6] * 4, 4);
        w14[10] = RPOT(p[1] + p[0] + q[0] + q[1] + q[2] + q[3] * 2 + q[4] * 2 + q[5] * 2 + q[6] * 5, 4);
        w14[11] = RPOT(p[0] + q[0] + q[1] + q[2] + q[3] + q[4] * 2 + q[5] * 2 + q[6] * 7, 4);
        for (int i = 0; i < 12; i++) s[(1 + i) * stride] = w14[i];
    } else if (flat_ok) {
        for (int i = 0; i < 6; i++) s[(4 + i) * stride] = w8[i];
    } else {
        s[5 * stride] = n4[0]; s[6 * stride] = n4[1];
        s[7 * stride] = n4[2]; s[8 * stride] = n4[3];
    }
}

static void db_thresholds(int level, int sharpness, int bd, int *blimit,
                          int *limit, int *thresh) {
    int inside = level >> ((sharpness > 0) + (sharpness > 4));
    if (sharpness > 0 && inside > 9 - sharpness) inside = 9 - sharpness;
    if (inside < 1) inside = 1;
    int sc = 1 << (bd - 8);
    *blimit = (2 * (level + 2) + inside) * sc;
    *limit = inside * sc;
    *thresh = (level >> 4) * sc;
}

/* buf: (H + 2*pad, W + 2*pad) edge-padded plane (int32). Maps are per-4x4
 * unit with stride mstride. Filters in place. */
void deblock_plane_native(int32_t *buf, int bstride, int H, int W, int pad,
                          const uint8_t *txw, const uint8_t *txh,
                          const uint8_t *bev, const uint8_t *beh, int mstride,
                          int is_luma, int level_v, int level_h,
                          int sharpness, int bd) {
    int hu = (H + 3) >> 2, wu = (W + 3) >> 2;
    int blimit, limit, thresh;
    if (level_v) {
        db_thresholds(level_v, sharpness, bd, &blimit, &limit, &thresh);
        for (int xu = 1; xu < wu; xu++) {
            int x = xu * 4;
            if (x >= W) break;
            for (int y = 0; y < H; y++) {
                int u = y >> 2;
                if (!bev[u * mstride + xu]) continue;
                int a = txw[u * mstride + xu], b = txw[u * mstride + xu - 1];
                int m = a < b ? a : b;
                int fs = is_luma ? (m >= 16 ? 14 : (m >= 8 ? 8 : 4))
                                 : (m >= 8 ? 6 : 4);
                db_filter_seg(buf + (pad + y) * bstride + pad + x - 7, 1, fs,
                              blimit, limit, thresh, bd);
            }
        }
    }
    if (level_h) {
        db_thresholds(level_h, sharpness, bd, &blimit, &limit, &thresh);
        for (int yu = 1; yu < hu; yu++) {
            int y = yu * 4;
            if (y >= H) break;
            for (int xc = 0; xc < W; xc++) {
                int u = xc >> 2;
                if (!beh[yu * mstride + u]) continue;
                int a = txh[yu * mstride + u], b = txh[(yu - 1) * mstride + u];
                int m = a < b ? a : b;
                int fs = is_luma ? (m >= 16 ? 14 : (m >= 8 ? 8 : 4))
                                 : (m >= 8 ? 6 : 4);
                db_filter_seg(buf + (pad + y - 7) * bstride + pad + xc,
                              bstride, fs, blimit, limit, thresh, bd);
            }
        }
    }
}

/* ---- self-guided restoration core (normative; mirror of codec/sgr.py
 * selfguided_restoration, itself mirroring restoration.c:468-810). The
 * box sums are edge-truncated over the (h+6, w+6) extended block; the A/B
 * nonlinearity and the 565/343 blends are exact integer transcriptions.
 * Exposed so the per-unit LR search runs at native speed. ---- */

static const int64_t sgr_one_by_x[25] = {
    4096, 2048, 1365, 1024, 819, 683, 585, 512, 455, 410, 372, 341, 315,
    293, 273, 256, 241, 228, 216, 205, 195, 186, 178, 171, 164};

static int64_t sgr_x_by_xplus1(int x) {
    if (x == 0) return 1;
    if (x >= 255) return 256;
    int64_t v = (256 * (int64_t)x + (x + 1) / 2) / (x + 1);
    return v > 256 ? 256 : v;
}

#define SGR_RPOT(x, n) ((n) > 0 ? (((x) + ((int64_t)1 << ((n) - 1))) >> (n)) : (x))

/* edge-truncated (2r+1)^2 box sums of d (int32, EH x EW) -> out (int64) */
static void sgr_boxsum(const int32_t *d, int EH, int EW, int r, int sqr,
                       int64_t *vtmp, int64_t *out) {
    /* vertical pass with clamped windows */
    for (int c = 0; c < EW; c++) {
        int64_t run = 0;
        for (int i = 0; i <= r && i < EH; i++) {
            int64_t v = d[i * EW + c];
            run += sqr ? v * v : v;
        }
        for (int i = 0; i < EH; i++) {
            vtmp[i * EW + c] = run;
            int add = i + r + 1, sub = i - r;
            if (add < EH) {
                int64_t v = d[add * EW + c];
                run += sqr ? v * v : v;
            }
            if (sub >= 0) {
                int64_t v = d[sub * EW + c];
                run -= sqr ? v * v : v;
            }
        }
    }
    /* horizontal pass with clamped windows */
    for (int i = 0; i < EH; i++) {
        const int64_t *row = vtmp + i * EW;
        int64_t run = 0;
        for (int j = 0; j <= r && j < EW; j++) run += row[j];
        for (int j = 0; j < EW; j++) {
            out[i * EW + j] = run;
            int add = j + r + 1, sub = j - r;
            if (add < EW) run += row[add];
            if (sub >= 0) run -= row[sub];
        }
    }
}

/* (r0,r1,s0,s1) of svt_aom_eb_sgr_params */
static const int sgr_params_c[16][4] = {
    {2, 1, 140, 3236}, {2, 1, 112, 2158}, {2, 1, 93, 1618}, {2, 1, 80, 1438},
    {2, 1, 70, 1295}, {2, 1, 58, 1177}, {2, 1, 47, 1079}, {2, 1, 37, 996},
    {2, 1, 30, 925}, {2, 1, 25, 863}, {0, 1, -1, 2589}, {0, 1, -1, 1618},
    {0, 1, -1, 1177}, {0, 1, -1, 925}, {2, 0, 56, -1}, {2, 0, 22, -1}};

/* A/B transform into At/Bt over the (h+2, w+2) window starting at
 * (BORDER-1, BORDER-1) of the extended grid */
static void sgr_ab(const int64_t *A, const int64_t *B, int EW, int h2, int w2,
                   int off, int r, int s, int bd, int64_t *At, int64_t *Bt) {
    int n = (2 * r + 1) * (2 * r + 1);
    for (int i = 0; i < h2; i++)
        for (int j = 0; j < w2; j++) {
            int64_t a = SGR_RPOT(A[(i + off) * EW + j + off], 2 * (bd - 8));
            int64_t b = SGR_RPOT(B[(i + off) * EW + j + off], bd - 8);
            int64_t p = a * n - b * b;
            if (p < 0) p = 0;
            int64_t z = SGR_RPOT(p * s, 20);            /* MTABLE_BITS */
            int64_t at = sgr_x_by_xplus1(z > 255 ? 255 : (int)z);
            At[i * w2 + j] = at;
            Bt[i * w2 + j] = SGR_RPOT((256 - at) * B[(i + off) * EW + j + off]
                                      * sgr_one_by_x[n - 1], 12);
        }
}

/* flt0/flt1 (int64, h x w) from the (h+6, w+6) extended block (int32).
 * Either output pointer may be NULL when the ep does not use that radius. */
void sgr_selfguided(const int32_t *dgd_ext, int w, int h, int ep, int bd,
                    int64_t *flt0, int64_t *flt1) {
    int EH = h + 6, EW = w + 6;
    int r0 = sgr_params_c[ep][0], r1 = sgr_params_c[ep][1];
    int s0 = sgr_params_c[ep][2], s1 = sgr_params_c[ep][3];
    int h2 = h + 2, w2 = w + 2;
    int64_t *A = malloc(sizeof(int64_t) * EH * EW);
    int64_t *B = malloc(sizeof(int64_t) * EH * EW);
    int64_t *T = malloc(sizeof(int64_t) * EH * EW);
    int64_t *At = malloc(sizeof(int64_t) * h2 * w2);
    int64_t *Bt = malloc(sizeof(int64_t) * h2 * w2);
    if (r0 > 0 && flt0) {
        sgr_boxsum(dgd_ext, EH, EW, r0, 1, T, A);
        sgr_boxsum(dgd_ext, EH, EW, r0, 0, T, B);
        sgr_ab(A, B, EW, h2, w2, 2, r0, s0, bd, At, Bt);  /* off = BORDER-1 */
        for (int i = 0; i < h; i++) {
            int k = i + 1;
            const int32_t *dr = dgd_ext + (i + 3) * EW + 3;
            int64_t *o = flt0 + i * w;
            if ((i & 1) == 0) {
                for (int j = 0; j < w; j++) {
                    int64_t a = (At[(k - 1) * w2 + j + 1] + At[(k + 1) * w2 + j + 1]) * 6
                              + (At[(k - 1) * w2 + j] + At[(k + 1) * w2 + j]
                                 + At[(k - 1) * w2 + j + 2] + At[(k + 1) * w2 + j + 2]) * 5;
                    int64_t b = (Bt[(k - 1) * w2 + j + 1] + Bt[(k + 1) * w2 + j + 1]) * 6
                              + (Bt[(k - 1) * w2 + j] + Bt[(k + 1) * w2 + j]
                                 + Bt[(k - 1) * w2 + j + 2] + Bt[(k + 1) * w2 + j + 2]) * 5;
                    o[j] = SGR_RPOT(a * dr[j] + b, 8 + 5 - 4);
                }
            } else {
                for (int j = 0; j < w; j++) {
                    int64_t a = At[k * w2 + j + 1] * 6
                              + (At[k * w2 + j] + At[k * w2 + j + 2]) * 5;
                    int64_t b = Bt[k * w2 + j + 1] * 6
                              + (Bt[k * w2 + j] + Bt[k * w2 + j + 2]) * 5;
                    o[j] = SGR_RPOT(a * dr[j] + b, 8 + 4 - 4);
                }
            }
        }
    }
    if (r1 > 0 && flt1) {
        sgr_boxsum(dgd_ext, EH, EW, r1, 1, T, A);
        sgr_boxsum(dgd_ext, EH, EW, r1, 0, T, B);
        sgr_ab(A, B, EW, h2, w2, 2, r1, s1, bd, At, Bt);
        for (int i = 0; i < h; i++) {
            const int32_t *dr = dgd_ext + (i + 3) * EW + 3;
            int64_t *o = flt1 + i * w;
            for (int j = 0; j < w; j++) {
                int64_t a = (At[(i + 1) * w2 + j + 1]
                             + At[(i + 1) * w2 + j] + At[(i + 1) * w2 + j + 2]
                             + At[i * w2 + j + 1] + At[(i + 2) * w2 + j + 1]) * 4
                          + (At[i * w2 + j] + At[i * w2 + j + 2]
                             + At[(i + 2) * w2 + j] + At[(i + 2) * w2 + j + 2]) * 3;
                int64_t b = (Bt[(i + 1) * w2 + j + 1]
                             + Bt[(i + 1) * w2 + j] + Bt[(i + 1) * w2 + j + 2]
                             + Bt[i * w2 + j + 1] + Bt[(i + 2) * w2 + j + 1]) * 4
                          + (Bt[i * w2 + j] + Bt[i * w2 + j + 2]
                             + Bt[(i + 2) * w2 + j] + Bt[(i + 2) * w2 + j + 2]) * 3;
                o[j] = SGR_RPOT(a * dr[j] + b, 8 + 5 - 4);
            }
        }
    }
    free(A); free(B); free(T); free(At); free(Bt);
}

/* Batched sub-pel refinement of device-decided full-pel MVs: for each block
 * whose refine flag is set, run the half/quarter/eighth-pel diamond around
 * mv[i] on the given reference (same diamond as me_search_block's tail).
 * mvs are (N, 2) int32 in 1/8-pel units, updated in place. */
void me_subpel_refine_blocks(const uint16_t *src, int sstride,
                             const int32_t *ref, int refH, int refW,
                             const int32_t *filters, int bd,
                             const int32_t *bx, const int32_t *by,
                             const int32_t *bw, const int32_t *bh,
                             const uint8_t *refine, int nb, int32_t *mvs) {
    int32_t cur[64 * 64];
    for (int i = 0; i < nb; i++) {
        if (!refine[i]) continue;
        int x0 = bx[i], y0 = by[i], W = bw[i], H = bh[i];
        for (int r = 0; r < H; r++)
            for (int c = 0; c < W; c++)
                cur[r * W + c] = src[(y0 + r) * sstride + x0 + c];
        int mvy = mvs[2 * i], mvx = mvs[2 * i + 1];
        int64_t sad = subpel_try(cur, W, H, ref, refH, refW, filters, bd,
                                 x0, y0, mvy, mvx);
        if (sad == INT64_MAX) continue;
        for (int step = 4; step >= 1; step >>= 1) {
            for (int it = 0; it < 2; it++) {
                int byy = mvy, bxx = mvx;
                static const int dmy[4] = {-1, 1, 0, 0};
                static const int dmx[4] = {0, 0, -1, 1};
                for (int d = 0; d < 4; d++) {
                    int ty = byy + dmy[d] * step, tx = bxx + dmx[d] * step;
                    int64_t s = subpel_try(cur, W, H, ref, refH, refW,
                                           filters, bd, x0, y0, ty, tx);
                    if (s < sad) { sad = s; mvy = ty; mvx = tx; }
                }
                if (mvy == byy && mvx == bxx) break;
            }
        }
        mvs[2 * i] = mvy;
        mvs[2 * i + 1] = mvx;
    }
}

/* 8x8-windowed SSIM stepped by 4 (aom_ssim2 grid; see metrics.py) in one
 * pass: integer window sums, float64 per-window SSIM. Returns the mean. */
double ssim_grid_u16(const uint16_t *a, int as, const uint16_t *b, int bs,
                     int W, int H, double c1, double c2) {
    if (W < 8 || H < 8) return 1.0;
    double total = 0.0;
    long count = 0;
    for (int i = 0; i + 8 <= H; i += 4) {
        for (int j = 0; j + 8 <= W; j += 4) {
            uint32_t sa = 0, sb = 0;
            uint64_t saa = 0, sbb = 0, sab = 0;
            for (int r = 0; r < 8; r++) {
                const uint16_t *pa = a + (i + r) * as + j;
                const uint16_t *pb = b + (i + r) * bs + j;
                for (int c = 0; c < 8; c++) {
                    uint32_t va = pa[c], vb = pb[c];
                    sa += va; sb += vb;
                    saa += (uint64_t)va * va;
                    sbb += (uint64_t)vb * vb;
                    sab += (uint64_t)va * vb;
                }
            }
            double mu_a = sa / 64.0, mu_b = sb / 64.0;
            double var_a = saa / 64.0 - mu_a * mu_a;
            double var_b = sbb / 64.0 - mu_b * mu_b;
            double cov = sab / 64.0 - mu_a * mu_b;
            total += ((2 * mu_a * mu_b + c1) * (2 * cov + c2))
                   / ((mu_a * mu_a + mu_b * mu_b + c1) * (var_a + var_b + c2));
            count++;
        }
    }
    return count ? total / count : 1.0;
}

/* Sum of squared error between two u16 planes (PSNR numerator). */
double sse_u16(const uint16_t *a, int as, const uint16_t *b, int bs,
               int W, int H) {
    double total = 0.0;
    for (int i = 0; i < H; i++) {
        const uint16_t *pa = a + i * as, *pb = b + i * bs;
        int64_t row = 0;
        for (int j = 0; j < W; j++) {
            int d = (int)pa[j] - (int)pb[j];
            row += (int64_t)d * d;
        }
        total += (double)row;
    }
    return total;
}
