/* Native intra tile walk: the conformant final-encode pass in one C call.
 *
 * The TPU-first architecture splits the encoder into (a) the open-loop RDO
 * search running as batched device launches (ops/intra_search.py) and
 * (b) this sequential, recon-dependent final pass: partition walk, exact
 * intra prediction from recon neighbors, forward/inverse transforms,
 * quantization, CFL, and all tile syntax through the daala range coder.
 * It executes the decision maps the device produced; behavior mirrors
 * codec/intra_encoder.py line for line (which in turn mirrors
 * entropy_coding.c:4820-4960 / enc_dec_process.c:3284-3533).
 *
 * Compiled together with ec_native.c and mc_native.c into libwalk.so; the
 * CDF tables live in the Python FrameContext numpy arrays and adapt in
 * place through ec_symbol, so host Python can keep writing further syntax
 * (e.g. LR units) with the same state.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

/* ---- section timers (ns), SVT-style perf context for the walk:
 * 0 pred (MC/intra), 1 fwdTX+quant, 2 invTX+recon, 3 coeff EC,
 * 4 tile total. Read via walk_prof_get from profiling-aware callers. */
static long long walk_prof_ns[8];
static inline long long wp_now(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return (long long)ts.tv_sec * 1000000000LL + ts.tv_nsec;
}
void walk_prof_get(long long *out) {
    for (int i = 0; i < 8; i++) out[i] = walk_prof_ns[i];
}
void walk_prof_reset(void) {
    for (int i = 0; i < 8; i++) walk_prof_ns[i] = 0;
}

/* ---- from ec_native.c ---- */
typedef struct EcEnc EcEnc;
void ec_bool(EcEnc *e, int val, unsigned f);
void ec_literal(EcEnc *e, uint32_t value, int bits);
void ec_symbol(EcEnc *e, int sym, uint16_t *icdf, int nsyms, int adapt);
void ec_symbol_noadapt(EcEnc *e, int sym, const uint16_t *icdf, int nsyms);
int32_t ec_write_coeffs_txb_full(
    EcEnc *e, const int32_t *qcoeff, int w, int h, int eob,
    const int16_t *scan, int tx_class, const int8_t *nz_off2d, int adapt,
    uint16_t *eob_multi_row, int eob_multi_nsyms,
    uint16_t *eob_extra_rows, uint16_t *base_eob_rows, uint16_t *base_rows,
    uint16_t *br_rows, uint16_t *dc_sign_row);
void txfm2d_fwd_p(const int64_t *p, const int32_t *res, int nblk, int32_t *out);
void txfm2d_fwd_batch_p(const int64_t *p, const int32_t *res, int nblk,
                        int32_t *out);
void txfm2d_inv_add_batch_p(const int64_t *p, const int32_t *coeff,
                            const uint16_t *pred, int nblk, uint16_t *out);
void txfm2d_inv_add_p(const int64_t *p, const int32_t *coeff,
                      const uint16_t *pred, int nblk, uint16_t *out);

/* ---- from mc_native.c ---- */
void mc_convolve_2d_sr(const int32_t *src, int src_stride, int w, int h,
                       const int32_t *fx, const int32_t *fy,
                       int has_sx, int has_sy, int bd, uint16_t *dst);
void intra_pred_block(int mode, const int32_t *above, const int32_t *left,
                      int32_t corner, int have_above, int have_left,
                      int W, int H, int bd, uint16_t *out);
void intra_dr_pred(const int32_t *above_buf, const int32_t *left_buf,
                   int W, int H, int dx, int dy, int zone, int bd,
                   uint16_t *out);
int quantize_txb(const int64_t *coeff, int n, const int16_t *scan,
                 int zbin_dc, int zbin_ac, int rnd_dc, int rnd_ac,
                 int quant_dc, int quant_ac, int qshift_dc, int qshift_ac,
                 int deq_dc, int deq_ac, int log_scale,
                 const uint8_t *qm, const uint16_t *iqm,
                 int32_t *qcoeff, int32_t *dqcoeff);

/* ---- spec constants (mirrors codec/constants.py) ---- */
static const uint8_t BW[22] = {4,4,8,8,8,16,16,16,32,32,32,64,64,64,128,128,4,16,8,32,16,64};
static const uint8_t BH[22] = {4,8,4,8,16,8,16,32,16,32,64,32,64,128,64,128,16,4,32,8,64,16};
static const uint8_t TXW[19] = {4,8,16,32,64,4,8,8,16,16,32,32,64,4,16,8,32,16,64};
static const uint8_t TXH[19] = {4,8,16,32,64,8,4,16,8,32,16,64,32,16,4,32,8,64,16};
static const uint8_t TXS_CTX[19] = {0,1,2,3,4,1,1,2,2,3,3,4,4,1,1,2,2,3,3};
/* eob class: log2(min(w,32)*min(h,32)) - 4 (spec eobMultisize) —
   TX_16X64/TX_64X16 code a 16x32/32x16 area = class 5, not 6 */
static const uint8_t TXLOG2M4[19] = {0,2,4,6,6,1,1,3,3,5,5,6,6,2,2,4,4,5,5};
static const uint8_t SQR[19]   = {0,1,2,3,4,0,0,1,1,2,2,3,3,0,0,1,1,2,2};
static const uint8_t SQR_UP[19]= {0,1,2,3,4,1,1,2,2,3,3,4,4,2,2,3,3,4,4};
static const int8_t  TX_CLASS[16] = {0,0,0,0,0,0,0,0,0,0,2,1,2,1,2,1};
/* largest rect TX per bsize (MAX_TX_RECT) */
static const int8_t MAX_TX[22] = {0,5,6,1,7,8,2,9,10,3,11,12,4,-1,-1,-1,13,14,15,16,17,18};
/* partition neighbor-context bytes per subsize (PARTITION_CTX_LOOKUP a,l) */
static const uint8_t PCTX_A[22] = {31,31,30,30,30,28,28,28,24,24,24,16,16,16,0,0,31,28,30,24,28,16};
static const uint8_t PCTX_L[22] = {31,30,31,30,28,30,28,24,28,24,16,24,16,0,16,0,28,31,24,30,16,28};
/* kf y-mode neighbor context classes */
static const uint8_t IMODE_CTX[13] = {0,1,2,3,4,4,4,4,3,0,1,2,0};
/* ext-tx symbol map per intra set */
static const uint8_t EXT_IND_1[16] = {1,5,6,4,0,0,0,0,0,0,2,3,0,0,0,0};
static const uint8_t EXT_IND_2[16] = {1,3,4,2,0,0,0,0,0,0,0,0,0,0,0,0};
/* fimode -> intra dir for tx-type cdf ctx */
static const uint8_t FI2DIR[5] = {0,1,2,7,0};
/* dr_intra_derivative (intra_dir.py) */
static int dr_deriv(int angle) {
    static const int A[27] = {3,6,9,14,17,20,23,26,29,32,36,39,42,45,48,51,54,58,61,64,67,70,73,76,81,84,87};
    static const int V[27] = {1023,547,372,273,215,178,151,132,116,102,90,80,71,64,57,51,45,40,35,31,27,23,19,15,11,7,3};
    for (int i = 0; i < 27; i++) if (A[i] == angle) return V[i];
    return 0;
}
static const int MODE_ANGLE[9] = {0,90,180,45,135,113,157,203,67}; /* mode 1..8 at idx */

#define PART_NONE 0
#define PART_HORZ 1
#define PART_VERT 2
#define PART_SPLIT 3
#define COEFF_CTX_BITS 6
#define COEFF_CTX_MASK 63

/* ---------------------------------------------------------------- context */
typedef struct {
    EcEnc *enc;
    int adapt;                 /* 1 unless disable_cdf_update */
    /* geometry */
    int mi_rows, mi_cols;
    int tile_r0, tile_r1, tile_c0, tile_c1;
    int nplanes, bd, qindex;
    /* per-plane buffers */
    uint16_t *src[3];   int src_stride[3];
    uint16_t *recon[3]; int rec_stride[3];
    int pw[3], ph[3];          /* aligned plane dims */
    uint8_t *above_ctx[3], *left_ctx[3];
    uint8_t *decoded[3]; int dec_stride[3];
    uint8_t *dlf_txw[3], *dlf_txh[3], *dlf_skip[3], *dlf_bv[3], *dlf_bh[3];
    int dlf_stride[3];
    int8_t *mi_mode, *mi_skip;
    uint8_t *part_above, *part_left;
    /* decisions: grids of split flags / modes / tx types */
    const uint8_t *parts[4];   /* idx by log2(size)-3: 8,16,32,64 */
    int parts_cols[4];
    const int32_t *modes[4];   int modes_cols[4];
    const int32_t *txs[4];     int txs_cols[4];
    int max_leaf;
    /* quant: per-SB table index + flat tables */
    const int32_t *sb_qtab_idx; int sbq_cols;      /* per-SB row index */
    const int32_t *qp_tab;     /* n x nplanes x 10 */
    const int32_t *sb_qindex;  /* per-SB qindex for delta-q syntax */
    int delta_q_present, delta_q_res, base_qindex;
    /* QM per plane x tx_size (NULL = flat) */
    const uint8_t *qm[3][19];
    const uint16_t *iqm[3][19];
    /* transforms + scans per (tx_size, tx_type) */
    const int64_t *fwdp[19][16];
    const int64_t *invp[19][16];
    const int16_t *scans[19][16];
    const int8_t *nzoff[19];
    /* feature flags */
    int enable_filter_intra, allow_sct, enable_cfl;
    /* CDF table base pointers (FrameContext numpy memory) */
    uint16_t *cdf_partition;   /* (20,11) */
    uint16_t *cdf_skip;        /* (3,3) */
    uint16_t *cdf_kf_y;        /* (5,5,14) */
    uint16_t *cdf_angle;       /* (8,8) */
    uint16_t *cdf_uv;          /* (2,13,15) */
    uint16_t *cdf_cfl_sign;    /* (9,) */
    uint16_t *cdf_cfl_alpha;   /* (6,17) */
    uint16_t *cdf_fi;          /* (22,3) */
    uint16_t *cdf_fi_mode;     /* (6,) */
    uint16_t *cdf_ext_tx;      /* (3,4,13,17) */
    uint16_t *cdf_pal_y;       /* (7,3,3) */
    uint16_t *cdf_pal_uv;      /* (2,3) */
    uint16_t *cdf_delta_q;     /* (5,) */
    uint16_t *cdf_txb_skip;    /* (5,13,3) */
    uint16_t *cdf_eob[7];      /* eob_multi16..1024: (2,2,n+1) */
    uint16_t *cdf_eob_extra;   /* (5,2,22,3) */
    uint16_t *cdf_base_eob;    /* (5,2,4,4) */
    uint16_t *cdf_base;        /* (5,2,42,5) */
    uint16_t *cdf_br;          /* (5,2,21,5) */
    uint16_t *cdf_dc_sign;     /* (2,3,3) */
    /* loop-restoration unit syntax, precomputed per SB as op triples
       (kind, a, b): 0 = adaptive symbol a on cdf_wiener (nsyms 2),
       1 = bool(a, prob b), 2 = literal(a, b bits) */
    const int32_t *lr_ops;
    const int32_t *lr_start;   /* per SB: op index range [i, i+1) */
    int lr_sb_cols;
    uint16_t *cdf_wiener;      /* (3,) wiener_restore */
    uint16_t *cdf_sgr;         /* (3,) sgrproj_restore */
    uint16_t *cdf_switchable;  /* (4,) switchable_restore */
    /* walk state */
    int prev_qindex, sb_qindex_cur, sb_delta_pending;
    /* ---- inter (P-frame) extension: decisions from the native pre-pass
       (mc_native.inter_decide_frame), reference planes, the MiGrid mirror
       for normative MV prediction, and the inter-syntax CDFs. Mirrors
       codec/inter_encoder.py / codec/mv_pred.py. ---- */
    int is_inter_frame;
    int gm_row, gm_col;                  /* LAST global motion, 1/8 pel */
    const int32_t *d_ref, *d_mode, *d_mvr, *d_mvc;  /* mi grids (top-left) */
    const int32_t *refp[6];              /* [ref_idx * 3 + plane], padded */
    int refp_stride[6];
    int pad;
    const int32_t *filters8, *filters4;  /* (16, 8) subpel kernels */
    int8_t *g_ref;                       /* MiGrid.ref_frame */
    int16_t *g_mvr, *g_mvc;
    uint8_t *g_mode, *g_bw4, *g_bh4;
    uint16_t *cdf_intra_inter, *cdf_single_ref, *cdf_newmv, *cdf_zeromv,
             *cdf_refmv, *cdf_drl, *cdf_if_y, *cdf_inter_ext_tx,
             *cdf_nmv_joints, *cdf_nmv_sign, *cdf_nmv_classes, *cdf_nmv_class0,
             *cdf_nmv_bits, *cdf_nmv_fp0, *cdf_nmv_fp1, *cdf_nmv_fp,
             *cdf_nmv_c0hp, *cdf_nmv_hp;
    /* ---- compound (REFERENCE_MODE_SELECT) extension ---- */
    int ref_select;
    int ref2_const;                  /* second reference id (7 = ALTREF) */
    const int32_t *d_mvr2, *d_mvc2;  /* compound second-side MVs (mi grids) */
    int8_t *g_ref2;                  /* MiGrid.ref_frame2 / mv2 mirrors */
    int16_t *g_mv2r, *g_mv2c;
    uint16_t *cdf_comp_inter;        /* (5,3) */
    uint16_t *cdf_comp_ref_type;     /* (5,3) */
    uint16_t *cdf_comp_ref;          /* (3,3,3) */
    uint16_t *cdf_comp_bwdref;       /* (3,2,3) */
    uint16_t *cdf_comp_mode;         /* (8,9) inter_compound_mode */
    /* ---- inter TX-type search extension ---- */
    const int32_t *d_txt;
    /* ---- RDOQ ---- */
    int rdoq_fast;            /* mi grid: luma TxType per leaf */
    /* ---- device-precomputed residual results (ops/commit.py): when a
       leaf's pre_slot entry is nonzero, its pred/TX/quant/recon already
       ran on the TPU — the walk reads qcoeffs/eobs here and its recon
       buffer was prefilled with the device reconstruction. ---- */
    const int32_t *pre_slot;  /* per-mi: slot+1 at leaf top-left, else 0 */
    const int32_t *pre_off;   /* per slot: 3 offsets into pre_qc */
    const int32_t *pre_eob;   /* per slot: 3 eobs (y, u, v) */
    const int32_t *pre_qc;    /* packed quantized coeffs (raster order) */
    /* ---- order hints / skip mode (spec 7.8 + 5.11.27) ---- */
    int32_t sign_bias[8];     /* RefFrameSignBias per ref (0 = hints off) */
    int skip_mode_present;    /* frame header skip_mode_present */
    int skip_ref0, skip_ref1; /* SkipModeFrame pair */
    uint16_t *cdf_skip_mode;  /* (3,3) */
    int8_t *mi_skip_mode;     /* per-mi skip_mode flags (ctx) */
    /* ---- rectangular partitions (IntraDecisions.rect): per-size uint8
       node grids, 0 = none/split (parts decides), 2 = HORZ, 3 = VERT */
    const uint8_t *rect[4];
    int32_t rect_cols[4];
    /* ---- p<=6 feature extension: switchable interp filters, interintra,
       OBMC, masked compound. Decisions come from the feature-search
       pre-pass (walk_feature_search below / the Python inline search) as
       per-mi maps written at each leaf's top-left. Mirrors the Python
       walk's search+commit in inter_encoder._encode_block. ---- */
    int switchable_filters;          /* frame is_filter_switchable */
    int enable_interintra;           /* seq enable_interintra_compound */
    int enable_masked_compound;      /* seq enable_masked_compound */
    int motion_mode_switchable;      /* frame is_motion_mode_switchable */
    const int32_t *filt8[3];         /* (16,8) REGULAR/SMOOTH/SHARP */
    const int32_t *filt4[3];         /* 4-tap variants (sharp = regular) */
    const int8_t *d_filt;            /* decided interp filter 0..2 */
    const int8_t *d_mm;              /* motion mode: 0 SIMPLE, 1 OBMC */
    const int8_t *d_ii;              /* interintra mode + 1 (0 = none) */
    const int8_t *d_iiw;             /* II wedge index + 1 (0 = smooth) */
    const int8_t *d_ctype;           /* compound: 0 avg, 1 wedge, 2 diffwtd */
    const int8_t *d_widx;            /* wedge index / diffwtd mask type */
    const int8_t *d_wsign;           /* wedge sign */
    int8_t *g_filt;                  /* MiGrid.filt (ctx + OBMC filters) */
    int8_t *g_comp_group;            /* MiGrid.comp_group (group-idx ctx) */
    const int32_t *wedge_blob;       /* packed luma masks */
    const int32_t *wedge_off;        /* [size_idx*32 + idx*2 + sign] */
    const int32_t *ii_w1d;           /* II_WEIGHTS1D (128) */
    uint16_t *cdf_interintra;        /* (4,3) */
    uint16_t *cdf_interintra_mode;   /* (4,5) */
    uint16_t *cdf_wedge_interintra;  /* (22,3) */
    uint16_t *cdf_wedge_idx;         /* (22,17) */
    uint16_t *cdf_obmc;              /* (22,3) */
    uint16_t *cdf_comp_group_idx;    /* (6,3) */
    uint16_t *cdf_compound_type;     /* (22,3) */
    uint16_t *cdf_switchable_interp; /* (8,4) */
    double psy_rd;                   /* feature-search psy-rd strength */
    /* ---- TX size search extension (TX_MODE_SELECT var-tx; reference:
       perform_tx_partitioning, product_coding_loop.c:5307 +
       Docs/Appendix-TX-Search.md) ---- */
    int tx_mode_select;       /* frame header tx_mode == TX_MODE_SELECT */
    const int8_t *d_txsplit;  /* per-mi: 1 = split this leaf's luma tx */
    uint8_t *txfm_above;      /* per-mi-col tx-width bytes (tile-reset) */
    uint8_t *txfm_left;       /* per-mi-row tx-height bytes */
    uint16_t *cdf_tx_size;        /* (4,3,4): intra tx-depth symbol */
    uint16_t *cdf_txfm_partition; /* (21,3): inter var-tx split flag */
    /* ---- third reference extension (7-ref roles: GOLDEN rescue on
       hierarchical GoPs; reference pd_process.c:1030-1055) ---- */
    const int32_t *refp3[3];      /* padded GOLDEN planes (or NULL) */
    int refp3_stride[3];
    int ref3_const;               /* coded ref constant (4) or 0 */
    /* ---- stack-aware NEAREST/NEAR MV injection (feature search):
       lambda x MV-syntax bits a NEWMV pays over NEARESTMV; 0 = off ---- */
    int near_lam;
    /* ---- MFMV (use_ref_frame_mvs, spec 7.9/7.10.2.5): projected
       temporal motion field + per-ref cur->ref distances; mirror of
       mv_pred._temporal_scan / codec.mfmv ---- */
    int use_ref_frame_mvs;
    const int16_t *tpl_row;       /* ((mi_rows+1)/2, tpl_stride) */
    const int16_t *tpl_col;
    const uint8_t *tpl_off;       /* 0 = INVALID_MV sentinel */
    int tpl_stride;
    int cur_off[8];               /* rel_dist(cur_hint, ref_hint[rf]) */
    int allow_hp;
    int force_int;
} Walk;

/* Split_Tx_Size (spec 9.3): one var-tx / tx-depth step per tx size */
static const uint8_t SUB_TX[19] = {0,0,1,2,3,0,0,1,1,2,2,3,3,5,6,7,8,9,10};

static int bsize_of(int W, int H) {
    for (int b = 0; b < 22; b++)
        if (BW[b] == W && BH[b] == H) return b;
    return -1;
}

/* ------------------------------------------------------------- neighbors */
static int have_above_right(const Walk *w, int plane, int xu, int yu, int wu) {
    int ss = plane ? 1 : 0;
    int tile_right_u = w->tile_c1 >> ss;
    int pwu = w->pw[plane] >> 2;
    if (xu + wu >= (tile_right_u < pwu ? tile_right_u : pwu)) return 0;
    int sb_u = 64 >> (2 + ss);
    if (yu % sb_u == 0) return 1;
    return w->decoded[plane][(yu - 1) * w->dec_stride[plane] + xu + wu];
}

static int have_below_left(const Walk *w, int plane, int xu, int yu, int hu) {
    int ss = plane ? 1 : 0;
    int tile_bottom_u = w->tile_r1 >> ss;
    int phu = w->ph[plane] >> 2;
    if (yu + hu >= (tile_bottom_u < phu ? tile_bottom_u : phu)) return 0;
    int sb_u = 64 >> (2 + ss);
    if (xu % sb_u == 0) {
        int sb_bottom_u = (yu / sb_u + 1) * sb_u;
        return yu + hu < sb_bottom_u;
    }
    return w->decoded[plane][(yu + hu) * w->dec_stride[plane] + xu - 1];
}

/* above_buf/left_buf: 1+W+H entries with corner at [0] */
static void gather_neighbors(const Walk *w, int plane, int x0, int y0,
                             int W, int H, int32_t *above_buf,
                             int32_t *left_buf, int *p_have_a, int *p_have_l) {
    int ss = plane ? 1 : 0;
    const uint16_t *rec = w->recon[plane];
    int rs = w->rec_stride[plane];
    int have_a = y0 > ((w->tile_r0 * 4) >> ss);
    int have_l = x0 > ((w->tile_c0 * 4) >> ss);
    int base = 1 << (w->bd - 1);
    int maxx = w->pw[plane] - 1, maxy = w->ph[plane] - 1;
    int n = W + H;
    int32_t *above = above_buf + 1, *left = left_buf + 1;
    if (have_a) {
        int ar = have_above_right(w, plane, x0 >> 2, y0 >> 2, W >> 2);
        int span = ar ? n : W;
        for (int i = 0; i < span; i++) {
            int c = x0 + i; if (c > maxx) c = maxx;
            above[i] = rec[(y0 - 1) * rs + c];
        }
        if (!ar) for (int i = W; i < n; i++) above[i] = above[W - 1];
    }
    if (have_l) {
        int bl = have_below_left(w, plane, x0 >> 2, y0 >> 2, H >> 2);
        int span = bl ? n : H;
        for (int i = 0; i < span; i++) {
            int r = y0 + i; if (r > maxy) r = maxy;
            left[i] = rec[r * rs + x0 - 1];
        }
        if (!bl) for (int i = H; i < n; i++) left[i] = left[H - 1];
    }
    if (!have_a) { int32_t v = have_l ? left[0] : base - 1; for (int i = 0; i < n; i++) above[i] = v; }
    if (!have_l) { int32_t v = have_a ? above[0] : base + 1; for (int i = 0; i < n; i++) left[i] = v; }
    int32_t corner;
    if (have_a && have_l) corner = rec[(y0 - 1) * rs + x0 - 1];
    else if (have_a) corner = above[0];
    else if (have_l) corner = left[0];
    else corner = base;
    above_buf[0] = corner;
    left_buf[0] = corner;
    *p_have_a = have_a; *p_have_l = have_l;
}

static void predict_mode(const Walk *w, int mode, const int32_t *above_buf,
                         const int32_t *left_buf, int have_a, int have_l,
                         int W, int H, uint16_t *out) {
    if (mode >= 1 && mode <= 8) {
        int angle = MODE_ANGLE[mode];
        if (angle == 90) {
            for (int r = 0; r < H; r++)
                for (int c = 0; c < W; c++) out[r * W + c] = (uint16_t)above_buf[1 + c];
            return;
        }
        if (angle == 180) {
            for (int r = 0; r < H; r++)
                for (int c = 0; c < W; c++) out[r * W + c] = (uint16_t)left_buf[1 + r];
            return;
        }
        int dx = 1, dy = 1;
        if (angle > 0 && angle < 90) dx = dr_deriv(angle);
        else if (angle > 90 && angle < 180) dx = dr_deriv(180 - angle);
        if (angle > 90 && angle < 180) dy = dr_deriv(angle - 90);
        else if (angle > 180 && angle < 270) dy = dr_deriv(270 - angle);
        int zone = angle < 90 ? 1 : (angle < 180 ? 2 : 3);
        intra_dr_pred(above_buf, left_buf, W, H, dx, dy, zone, w->bd, out);
        return;
    }
    /* map PredictionMode -> intra_pred_block native index */
    int nm;
    switch (mode) {
        case 0: nm = 0; break;      /* DC */
        case 9: nm = 3; break;      /* SMOOTH */
        case 10: nm = 4; break;     /* SMOOTH_V */
        case 11: nm = 5; break;     /* SMOOTH_H */
        default: nm = 6; break;     /* PAETH (12) */
    }
    intra_pred_block(nm, above_buf + 1, left_buf + 1, above_buf[0],
                     have_a, have_l, W, H, w->bd, out);
}

/* ------------------------------------------------------------ decisions */
static int dec_split(const Walk *w, int mi_row, int mi_col, int size) {
    int li = 0;
    while ((8 << li) < size) li++;
    const uint8_t *p = w->parts[li];
    if (!p) return size > w->max_leaf;
    int r = (mi_row * 4) / size, c = (mi_col * 4) / size;
    return p[r * w->parts_cols[li] + c];
}

static int dec_mode(const Walk *w, int mi_row, int mi_col, int W, int H) {
    int s = W < H ? W : H;
    int li;
    for (;;) {
        li = 0; while ((8 << li) < s) li++;
        if (s <= 8 || w->modes[li]) break;
        s >>= 1;
    }
    const int32_t *m = w->modes[li];
    if (!m) return 0;
    int cols = w->modes_cols[li];
    int r = (mi_row * 4) / s, c = (mi_col * 4) / s;
    /* clip like the python (min against grid dims is implicit: grids cover
       the padded frame, so only exact indexing happens in-walk) */
    return m[r * cols + c];
}

static int dec_tx(const Walk *w, int mi_row, int mi_col, int W, int H) {
    if (W != H || W > 16) return 0;
    int li = 0; while ((8 << li) < W) li++;
    const int32_t *t = w->txs[li];
    if (!t) return 0;
    return t[(mi_row * 4) / W * w->txs_cols[li] + (mi_col * 4) / W];
}

/* ------------------------------------------------------------ syntax bits */
static void write_partition(Walk *w, int mi_row, int mi_col, int bsize,
                            int part, int has_rows, int has_cols) {
    if (!has_rows && !has_cols) return;
    int wpx = BW[bsize];
    int bsl = wpx == 8 ? 0 : wpx == 16 ? 1 : wpx == 32 ? 2 : wpx == 64 ? 3 : 4;
    int above = (w->part_above[mi_col] >> bsl) & 1;
    int left = (w->part_left[mi_row] >> bsl) & 1;
    int ctx = (left * 2 + above) + bsl * 4;
    int nsyms = bsize == 3 ? 4 : (bsize == 15 ? 8 : 10);
    uint16_t *row = w->cdf_partition + ctx * 11;
    if (has_rows && has_cols) {
        ec_symbol(w->enc, part, row, nsyms, w->adapt);
        return;
    }
    /* gather split-alike cdf (2 syms, not adapted); symbol sets mirror
       _gather_vert_alike/_gather_horz_alike (PartitionType enum values) */
    int p = 32768;
#define PROB(ic, k) (((k) == 0 ? 32768 : (ic)[(k) - 1]) - (ic)[k])
    if (has_cols) { /* vert alike: VERT,SPLIT,HORZ_A,VERT_A,VERT_B + VERT_4 */
        const int syms[6] = {2, 3, 4, 6, 7, 9};
        for (int i = 0; i < 6; i++) p -= PROB(row, syms[i]);
    } else {       /* horz alike: HORZ,SPLIT,HORZ_A,HORZ_B,VERT_A + HORZ_4 */
        const int syms[6] = {1, 3, 4, 5, 6, 8};
        for (int i = 0; i < 6; i++) p -= PROB(row, syms[i]);
    }
#undef PROB
    uint16_t cdf2[3] = {(uint16_t)(32768 - p), 0, 0};
    ec_symbol_noadapt(w->enc, part == PART_SPLIT, cdf2, 2);
}

static void write_delta_q(Walk *w) {
    int reduced = (w->sb_qindex_cur - w->prev_qindex) / w->delta_q_res;
    w->prev_qindex = w->sb_qindex_cur;
    w->sb_delta_pending = 0;
    int sign = reduced < 0;
    int a = sign ? -reduced : reduced;
    ec_symbol(w->enc, a < 3 ? a : 3, w->cdf_delta_q, 4, w->adapt);
    if (a >= 3) {
        int rem_bits = 0, t = a - 1;
        while (t > 1) { t >>= 1; rem_bits++; }
        int thr = (1 << rem_bits) + 1;
        ec_literal(w->enc, rem_bits - 1, 3);
        ec_literal(w->enc, a - thr, rem_bits);
    }
    if (a > 0) ec_bool(w->enc, sign, 16384);
}

static void write_tx_type(Walk *w, int tx_size, int eff_mode, int tx_type) {
    int eset = SQR_UP[tx_size] >= 3 ? 0 : (SQR[tx_size] == 2 ? 2 : 1);
    if (eset == 0 || w->qindex == 0) return;
    int sqr = SQR[tx_size];
    int sym = eset == 1 ? EXT_IND_1[tx_type] : EXT_IND_2[tx_type];
    uint16_t *row = w->cdf_ext_tx + ((eset * 4 + sqr) * 13 + eff_mode) * 17;
    ec_symbol(w->enc, sym, row, eset == 1 ? 7 : 5, w->adapt);
}

/* quant params lookup: row = sb_qtab_idx[sb], plane-major 10 values */
static const int32_t *qp_row(const Walk *w, int sb_r, int sb_c, int plane) {
    int idx = w->sb_qtab_idx ? w->sb_qtab_idx[sb_r * w->sbq_cols + sb_c] : 0;
    return w->qp_tab + (idx * w->nplanes + plane) * 10;
}

/* ------------------------------------------------------------ block encode */
typedef struct {
    int plane, px, py, pw, ph, tx_size, tx_type, eob;
    int pre;                   /* device-precomputed: qc/recon ready */
    int sub;                   /* var-tx child: tx smaller than the block
                                  (luma txb_skip ctx uses Skip_Contexts) */
    const int32_t *pre_qc_p;   /* packed device qcoeffs when pre */
    uint16_t pred[64 * 64];
    int32_t qc[32 * 32], dqc[32 * 32];
} PlaneRes;

static void run_plane_rdoq(Walk *w, PlaneRes *r, int sb_r, int sb_c, int rdoq);

static void run_plane(Walk *w, PlaneRes *r, int sb_r, int sb_c) {
    run_plane_rdoq(w, r, sb_r, sb_c, 0);
}

static void run_plane_rdoq(Walk *w, PlaneRes *r, int sb_r, int sb_c, int rdoq) {
    long long wp_t0 = wp_now();
    r->pre = 0;
    r->sub = 0;
    int cw = r->pw < 32 ? r->pw : 32, ch = r->ph < 32 ? r->ph : 32;
    int32_t resid[64 * 64];
    const uint16_t *src = w->src[r->plane];
    int ss = w->src_stride[r->plane];
    for (int y = 0; y < r->ph; y++)
        for (int x = 0; x < r->pw; x++)
            resid[y * r->pw + x] = (int32_t)src[(r->py + y) * ss + r->px + x]
                                   - (int32_t)r->pred[y * r->pw + x];
    int32_t coeff[64 * 64];
    txfm2d_fwd_p(w->fwdp[r->tx_size][r->tx_type], resid, 1, coeff);
    /* clipped coeff area (TX_64 codes the low 32x32) */
    int64_t flat[32 * 32];
    for (int y = 0; y < ch; y++)
        for (int x = 0; x < cw; x++)
            flat[y * cw + x] = coeff[y * r->pw + x];
    const int32_t *qp = qp_row(w, sb_r, sb_c, r->plane);
    static const uint8_t TX_SCALE[19] = {0,0,0,1,2,0,0,0,0,1,1,2,2,0,0,0,0,1,1};
    int log_scale = TX_SCALE[r->tx_size];
    const uint8_t *qm = r->tx_type >= 9 ? 0 : w->qm[r->plane][r->tx_size];
    const uint16_t *iqm = r->tx_type >= 9 ? 0 : w->iqm[r->plane][r->tx_size];
    r->eob = quantize_txb(flat, cw * ch, w->scans[r->tx_size][r->tx_type],
                          qp[0], qp[1], qp[2], qp[3], qp[4], qp[5], qp[6],
                          qp[7], qp[8], qp[9], log_scale, qm, iqm,
                          r->qc, r->dqc);
    if (rdoq && r->eob) {
        /* RDOQ eob-fast tier (update_coeff_eob_fast, full_loop.c:1092):
         * trim the eob tail under a widened non-QM zbin */
        int zbin[2] = {qp[8] + ((qp[8] * 70 + 64) >> 7),
                       qp[9] + ((qp[9] * 70 + 64) >> 7)};
        const int16_t *scan = w->scans[r->tx_size][r->tx_type];
        int e = r->eob;
        for (int i = e - 1; i >= 0; i--) {
            int rc = scan[i];
            int64_t a = flat[rc] < 0 ? -flat[rc] : flat[rc];
            if ((a << (1 + log_scale)) < zbin[rc != 0] || r->qc[rc] == 0) {
                e--;
                r->qc[rc] = 0;
                r->dqc[rc] = 0;
            } else {
                break;
            }
        }
        r->eob = e;
    }
    walk_prof_ns[1] += wp_now() - wp_t0;
}

static void recon_plane_res(Walk *w, const PlaneRes *r, int skip) {
    long long wp_t0 = wp_now();
    int wr = r->pw, hr = r->ph;
    if (r->px + wr > w->pw[r->plane]) wr = w->pw[r->plane] - r->px;
    if (r->py + hr > w->ph[r->plane]) hr = w->ph[r->plane] - r->py;
    if (!r->pre) {   /* device-pre blocks: recon buffer already filled */
        int cw = r->pw < 32 ? r->pw : 32, ch = r->ph < 32 ? r->ph : 32;
        int32_t full[64 * 64];
        memset(full, 0, sizeof(int32_t) * r->pw * r->ph);
        if (!skip)
            for (int y = 0; y < ch; y++)
                for (int x = 0; x < cw; x++)
                    full[y * r->pw + x] = r->dqc[y * cw + x];
        uint16_t rec[64 * 64];
        txfm2d_inv_add_p(w->invp[r->tx_size][r->tx_type], full, r->pred, 1,
                         rec);
        uint16_t *dst = w->recon[r->plane];
        int rs = w->rec_stride[r->plane];
        for (int y = 0; y < hr; y++)
            memcpy(dst + (r->py + y) * rs + r->px, rec + y * r->pw,
                   sizeof(uint16_t) * wr);
    }
    /* decoded bitmap + dlf maps */
    int ds = w->dec_stride[r->plane];
    int yu0 = r->py >> 2, yu1 = (r->py + hr) >> 2;
    int xu0 = r->px >> 2, xu1 = (r->px + wr) >> 2;
    for (int y = yu0; y < yu1; y++)
        for (int x = xu0; x < xu1; x++)
            w->decoded[r->plane][y * ds + x] = 1;
    int ls = w->dlf_stride[r->plane];
    int txw = TXW[r->tx_size] < 255 ? TXW[r->tx_size] : 255;
    int txh = TXH[r->tx_size] < 255 ? TXH[r->tx_size] : 255;
    for (int y = yu0; y < yu1; y++)
        for (int x = xu0; x < xu1; x++) {
            w->dlf_txw[r->plane][y * ls + x] = (uint8_t)txw;
            w->dlf_txh[r->plane][y * ls + x] = (uint8_t)txh;
            w->dlf_skip[r->plane][y * ls + x] = (uint8_t)skip;
        }
    for (int y = yu0; y < yu1; y++) w->dlf_bv[r->plane][y * ls + xu0] = 1;
    for (int x = xu0; x < xu1; x++) w->dlf_bh[r->plane][yu0 * ls + x] = 1;
    walk_prof_ns[2] += wp_now() - wp_t0;
}

/* CFL: AC contributions + alpha search (intra_encoder._cfl_ac/_cfl_search) */
static void cfl_ac(const uint16_t *luma, int lstride, int cw, int ch,
                   int32_t *ac) {
    int64_t sum = 0;
    for (int y = 0; y < ch; y++)
        for (int x = 0; x < cw; x++) {
            int32_t v = (luma[(2 * y) * lstride + 2 * x]
                         + luma[(2 * y) * lstride + 2 * x + 1]
                         + luma[(2 * y + 1) * lstride + 2 * x]
                         + luma[(2 * y + 1) * lstride + 2 * x + 1]) << 1;
            ac[y * cw + x] = v;
            sum += v;
        }
    int npel_log2 = 0;
    while ((1 << (npel_log2 + 1)) <= cw * ch) npel_log2++;
    int32_t avg = (int32_t)((sum + (1 << (npel_log2 - 1))) >> npel_log2);
    for (int i = 0; i < cw * ch; i++) ac[i] -= avg;
}

static int64_t cfl_sse_for_alpha(const Walk *w, int plane, int alpha,
                                 const int32_t *ac, const uint16_t *dc,
                                 int cx, int cy, int cw, int ch,
                                 uint16_t *pred_out) {
    const uint16_t *src = w->src[plane];
    int ss = w->src_stride[plane];
    int peak = (1 << w->bd) - 1;
    int64_t sse = 0;
    for (int y = 0; y < ch; y++)
        for (int x = 0; x < cw; x++) {
            int64_t scaled = (int64_t)alpha * ac[y * cw + x];
            int32_t d = scaled < 0 ? -(int32_t)((-scaled + 32) >> 6)
                                   : (int32_t)((scaled + 32) >> 6);
            int32_t v = (int32_t)dc[y * cw + x] + d;
            if (v < 0) v = 0; if (v > peak) v = peak;
            if (pred_out) pred_out[y * cw + x] = (uint16_t)v;
            int32_t e = v - (int32_t)src[(cy + y) * ss + cx + x];
            sse += (int64_t)e * e;
        }
    return sse;
}

/* ----------------------------------------------- shared coefficient pass */
static void write_tx_type_inter(Walk *w, int tx_size, int tx_type) {
    /* inter ext-tx sets (inter_encoder.inter_ext_tx_set); symbols per
       av1_ext_tx_ind rows (cabac_context_model.h:686); qindex 0 writes
       nothing (lossless has no tx types) */
    if (w->qindex == 0 || SQR_UP[tx_size] > 3) return;
    int eset = SQR_UP[tx_size] == 3 ? 3 : (SQR[tx_size] == 2 ? 2 : 1);
    static const int ind1[16] = {7, 8, 9, 12, 10, 11, 13, 14, 15,
                                 0, 1, 2, 3, 4, 5, 6};           /* ALL16 */
    static const int ind2[16] = {3, 4, 5, 8, 6, 7, 9, 10, 11,
                                 0, 1, 2, 0, 0, 0, 0};    /* DTT9_IDTX_1DDCT */
    static const int ind3[16] = {1, 0, 0, 0, 0, 0, 0, 0, 0,
                                 0, 0, 0, 0, 0, 0, 0};           /* DCT_IDTX */
    static const int nsyms[4] = {0, 16, 12, 2};
    int sym = eset == 1 ? ind1[tx_type]
            : eset == 2 ? ind2[tx_type] : ind3[tx_type];
    uint16_t *row = w->cdf_inter_ext_tx + (eset * 4 + SQR[tx_size]) * 17;
    ec_symbol(w->enc, sym, row, nsyms[eset], w->adapt);
}

/* coefficients + recon for all planes of one block (shared by the intra and
   inter block encoders; only the luma tx-type syntax differs) */
static void code_residual_planes(Walk *w, PlaneRes *res, int nres, int skip,
                                 int inter_blk, int eff_mode) {
    for (int i = 0; i < nres; i++) {
        long long wp_t0 = wp_now();
        PlaneRes *r = &res[i];
        int xu = r->px >> 2, yu = r->py >> 2;
        int wu = TXW[r->tx_size] >> 2, hu = TXH[r->tx_size] >> 2;
        int maxwu = (w->pw[r->plane] - r->px) >> 2;
        int maxhu = (w->ph[r->plane] - r->py) >> 2;
        if (wu > maxwu) wu = maxwu;
        if (hu > maxhu) hu = maxhu;
        uint8_t *actx = w->above_ctx[r->plane];
        uint8_t *lctx = w->left_ctx[r->plane];
        int cul = 0;
        if (!skip) {
            int plane_type = r->plane > 0;
            /* txb_skip_ctx: block matches tx -> 0 for luma; chroma base+7 */
            int txb_skip_ctx = 0;
            if (!plane_type && r->sub) {
                /* var-tx child: Skip_Contexts over the neighbor levels */
                static const uint8_t SKIP_CTXS[5][5] = {
                    {1, 2, 2, 2, 3}, {1, 4, 4, 4, 5}, {1, 4, 4, 4, 5},
                    {1, 4, 4, 4, 5}, {1, 4, 4, 4, 6}};
                int top = 0, lft = 0;
                for (int k = 0; k < wu; k++) top |= actx[xu + k];
                for (int k = 0; k < hu; k++) lft |= lctx[yu + k];
                top &= COEFF_CTX_MASK;
                lft &= COEFF_CTX_MASK;
                int mx = (top | lft) < 4 ? (top | lft) : 4;
                int mn = top < lft ? top : lft;
                if (mn > 4) mn = 4;
                txb_skip_ctx = SKIP_CTXS[mn][mx];
            }
            int signs = 0;
            for (int k = 0; k < wu; k++) {
                int s = actx[xu + k] >> COEFF_CTX_BITS;
                signs += s == 1 ? -1 : (s == 2 ? 1 : 0);
            }
            for (int k = 0; k < hu; k++) {
                int s = lctx[yu + k] >> COEFF_CTX_BITS;
                signs += s == 1 ? -1 : (s == 2 ? 1 : 0);
            }
            int dc_sign_ctx = signs > 0 ? 2 : (signs < 0 ? 1 : 0);
            if (plane_type) {
                int any_a = 0, any_l = 0;
                for (int k = 0; k < wu; k++) if (actx[xu + k]) any_a = 1;
                for (int k = 0; k < hu; k++) if (lctx[yu + k]) any_l = 1;
                txb_skip_ctx = any_a + any_l + 7;
            }
            int txs = TXS_CTX[r->tx_size];
            ec_symbol(w->enc, r->eob == 0,
                      w->cdf_txb_skip + (txs * 13 + txb_skip_ctx) * 3, 2,
                      w->adapt);
            if (r->eob) {
                if (r->plane == 0) {
                    if (inter_blk) write_tx_type_inter(w, r->tx_size,
                                                       r->tx_type);
                    else write_tx_type(w, r->tx_size, eff_mode, r->tx_type);
                }
                int cw = r->pw < 32 ? r->pw : 32, ch = r->ph < 32 ? r->ph : 32;
                int lg = TXLOG2M4[r->tx_size];
                cul = ec_write_coeffs_txb_full(
                    w->enc, r->pre ? r->pre_qc_p : r->qc, cw, ch, r->eob,
                    w->scans[r->tx_size][r->tx_type],
                    TX_CLASS[r->tx_type], w->nzoff[r->tx_size], w->adapt,
                    w->cdf_eob[lg] + (plane_type * 2
                                      + (TX_CLASS[r->tx_type] != 0)) * (lg + 6),
                    lg + 5,
                    w->cdf_eob_extra + (txs * 2 + plane_type) * 22 * 3,
                    w->cdf_base_eob + (txs * 2 + plane_type) * 4 * 4,
                    w->cdf_base + (txs * 2 + plane_type) * 42 * 5,
                    w->cdf_br + ((txs < 3 ? txs : 3) * 2 + plane_type) * 21 * 5,
                    w->cdf_dc_sign + (plane_type * 3 + dc_sign_ctx) * 3);
            }
        }
        for (int k = 0; k < wu; k++) actx[xu + k] = (uint8_t)cul;
        for (int k = 0; k < hu; k++) lctx[yu + k] = (uint8_t)cul;
        walk_prof_ns[3] += wp_now() - wp_t0;
        recon_plane_res(w, r, skip || r->eob == 0);
    }
}

/* ---------------------------------------------- TX size syntax (var-tx) */
static void txfm_set_span(Walk *w, int mi_row, int mi_col, int bw4, int bh4,
                          int txw, int txh) {
    for (int i = 0; i < bw4 && mi_col + i < w->mi_cols; i++)
        w->txfm_above[mi_col + i] = (uint8_t)txw;
    for (int i = 0; i < bh4 && mi_row + i < w->mi_rows; i++)
        w->txfm_left[mi_row + i] = (uint8_t)txh;
}

static int txfm_part_ctx(Walk *w, int mi_row, int mi_col, int W, int H,
                         int tx_size) {
    /* txfm_partition_context: above/left tx dims vs this tx + a category
       from the block's square-up max tx */
    int above = w->txfm_above[mi_col] < TXW[tx_size];
    int left = w->txfm_left[mi_row] < TXH[tx_size];
    int maxd = W > H ? W : H;
    int sq = maxd >= 64 ? 4 : maxd >= 32 ? 3 : maxd >= 16 ? 2 : 1;
    /* category compares the tx's SQUARE-UP against the block's (rect
       max-tx at depth 0 is the same category as its square: dav1d
       cat = 2*(TX_64X64 - sqr_up(tx)) - depth) */
    int category = (SQR_UP[tx_size] != sq && sq > 1) + (4 - sq) * 2;
    return category * 3 + above + left;
}

static void write_vartx(Walk *w, int mi_row, int mi_col, int W, int H,
                        int tx_size, int depth, int split) {
    /* write_tx_size_vartx: one flag per unit; our decisions split one
       depth only, so children always code flag 0 (MAX_VARTX_DEPTH = 2
       never binds for the <= 64px units this walk codes) */
    if (mi_row >= w->mi_rows || mi_col >= w->mi_cols) return;
    int ctx = txfm_part_ctx(w, mi_row, mi_col, W, H, tx_size);
    int tw4 = TXW[tx_size] >> 2, th4 = TXH[tx_size] >> 2;
    if (!split) {
        ec_symbol(w->enc, 0, w->cdf_txfm_partition + ctx * 3, 2, w->adapt);
        txfm_set_span(w, mi_row, mi_col, tw4, th4,
                      TXW[tx_size], TXH[tx_size]);
        return;
    }
    ec_symbol(w->enc, 1, w->cdf_txfm_partition + ctx * 3, 2, w->adapt);
    int stx = SUB_TX[tx_size];
    if (stx == 0) {              /* TX_4X4 children: no further flags */
        txfm_set_span(w, mi_row, mi_col, tw4, th4, 4, 4);
        return;
    }
    int sw4 = TXW[stx] >> 2, sh4 = TXH[stx] >> 2;
    for (int r = 0; r < th4; r += sh4)
        for (int c = 0; c < tw4; c += sw4)
            write_vartx(w, mi_row + r, mi_col + c, W, H, stx, depth + 1, 0);
}

static void write_intra_tx_size(Walk *w, int mi_row, int mi_col, int bsize) {
    /* write_selected_tx_size: depth-0 symbol (the walk's intra blocks
       keep the max rect tx; coded only because TX_MODE_SELECT is on) */
    int maxtx = MAX_TX[bsize];
    int chain = 0, t = maxtx;
    while (t != 0) { chain++; t = SUB_TX[t]; }
    int cat = chain - 1;
    if (cat > 3) cat = 3;
    int maxdepth = chain < 2 ? chain : 2;
    int mtw = TXW[maxtx], mth = TXH[maxtx];
    int have_a = mi_row > w->tile_r0, have_l = mi_col > w->tile_c0;
    int above = w->txfm_above[mi_col] >= mtw;
    int left = w->txfm_left[mi_row] >= mth;
    if (have_a) {
        int j = (mi_row - 1) * w->mi_cols + mi_col;
        if (w->g_ref[j]) above = w->g_bw4[j] * 4 >= mtw;
    }
    if (have_l) {
        int j = mi_row * w->mi_cols + mi_col - 1;
        if (w->g_ref[j]) left = w->g_bh4[j] * 4 >= mth;
    }
    int ctx = (have_a && have_l) ? above + left
              : (have_a ? above : (have_l ? left : 0));
    ec_symbol(w->enc, 0, w->cdf_tx_size + (cat * 3 + ctx) * 4,
              maxdepth + 1, w->adapt);
    txfm_set_span(w, mi_row, mi_col, BW[bsize] >> 2, BH[bsize] >> 2,
                  mtw, mth);
}

/* ------------------------------------------------------------- the block */
static void encode_block(Walk *w, int mi_row, int mi_col, int bsize,
                         int sb_r, int sb_c) {
    int W = BW[bsize], H = BH[bsize];
    int x0 = mi_col * 4, y0 = mi_row * 4;
    int bw4 = W >> 2, bh4 = H >> 2;

    int y_mode = dec_mode(w, mi_row, mi_col, W, H);
    int tx_type_y = dec_tx(w, mi_row, mi_col, W, H);

    int32_t above_buf[1 + 128 + 128], left_buf[1 + 128 + 128];
    int have_a, have_l;
    gather_neighbors(w, 0, x0, y0, W, H, above_buf, left_buf, &have_a, &have_l);

    PlaneRes res[3];
    int nres = 1;
    PlaneRes *ry = &res[0];
    ry->plane = 0; ry->px = x0; ry->py = y0; ry->pw = W; ry->ph = H;
    ry->tx_size = MAX_TX[bsize]; ry->tx_type = tx_type_y;
    predict_mode(w, y_mode, above_buf, left_buf, have_a, have_l, W, H, ry->pred);
    run_plane(w, ry, sb_r, sb_c);

    int uv_mode = 0;             /* UV_DC */
    int cfl_alpha_u = 0, cfl_alpha_v = 0;
    int has_uv = w->nplanes > 1;
    int cfl_allowed = W <= 32 && H <= 32;
    if (has_uv) {
        /* luma recon for CFL (decoder view: pred + inv(dq)) */
        uint16_t luma_rec[64 * 64];
        {
            int cw = W < 32 ? W : 32, ch = H < 32 ? H : 32;
            int32_t full[64 * 64];
            memset(full, 0, sizeof(int32_t) * W * H);
            for (int y = 0; y < ch; y++)
                for (int x = 0; x < cw; x++)
                    full[y * W + x] = ry->dqc[y * cw + x];
            txfm2d_inv_add_p(w->invp[ry->tx_size][ry->tx_type], full, ry->pred,
                             1, luma_rec);
        }
        int uv_w = W >> 1 > 4 ? W >> 1 : 4, uv_h = H >> 1 > 4 ? H >> 1 : 4;
        int uv_bsize = bsize_of(uv_w, uv_h);
        int tx_uv = MAX_TX[uv_bsize];
        int cw = W >> 1, ch = H >> 1;
        int cx = x0 >> 1, cy = y0 >> 1;
        int in_frame = (x0 + W <= w->pw[0]) && (y0 + H <= w->ph[0]);
        uint16_t dcp[2][32 * 32];
        for (int pl = 1; pl <= 2; pl++) {
            int32_t ab[1 + 64 + 64], lb[1 + 64 + 64];
            int ha, hl;
            gather_neighbors(w, pl, cx, cy, cw, ch, ab, lb, &ha, &hl);
            predict_mode(w, 0, ab, lb, ha, hl, cw, ch, dcp[pl - 1]);
        }
        int use_cfl = 0;
        uint16_t cflp[2][32 * 32];
        if (cfl_allowed && in_frame && w->enable_cfl) {
            int32_t ac[32 * 32];
            cfl_ac(luma_rec, W, cw, ch, ac);
            int64_t gain = 0;
            int best_a[2] = {0, 0};
            for (int pl = 0; pl < 2; pl++) {
                int64_t best = -1; int bi = 0;
                int64_t sse0 = 0;
                for (int a = -16; a <= 16; a++) {
                    int64_t s = cfl_sse_for_alpha(w, pl + 1, a, ac, dcp[pl],
                                                  cx, cy, cw, ch, 0);
                    if (a == 0) sse0 = s;
                    if (best < 0 || s < best) { best = s; bi = a; }
                }
                best_a[pl] = bi;
                gain += sse0 - best;
            }
            if (gain > 0 && (best_a[0] != 0 || best_a[1] != 0)) {
                use_cfl = 1;
                cfl_alpha_u = best_a[0]; cfl_alpha_v = best_a[1];
                uv_mode = 13; /* UV_CFL_PRED */
                cfl_sse_for_alpha(w, 1, best_a[0], ac, dcp[0], cx, cy, cw, ch, cflp[0]);
                cfl_sse_for_alpha(w, 2, best_a[1], ac, dcp[1], cx, cy, cw, ch, cflp[1]);
            }
        }
        for (int pl = 1; pl <= 2; pl++) {
            PlaneRes *r = &res[nres++];
            r->plane = pl; r->px = cx; r->py = cy; r->pw = cw; r->ph = ch;
            r->tx_size = tx_uv; r->tx_type = 0;
            memcpy(r->pred, use_cfl ? cflp[pl - 1] : dcp[pl - 1],
                   sizeof(uint16_t) * cw * ch);
            run_plane(w, r, sb_r, sb_c);
        }
    }

    int skip = 1;
    for (int i = 0; i < nres; i++) if (res[i].eob) skip = 0;

    /* ---- syntax */
    {   /* skip flag */
        int above = mi_row > w->tile_r0 ? w->mi_skip[(mi_row - 1) * w->mi_cols + mi_col] : 0;
        int left = mi_col > w->tile_c0 ? w->mi_skip[mi_row * w->mi_cols + mi_col - 1] : 0;
        ec_symbol(w->enc, skip, w->cdf_skip + (above + left) * 3, 2, w->adapt);
    }
    if (w->sb_delta_pending && (mi_row & 15) == 0 && (mi_col & 15) == 0
        && (bsize != 12 || !skip))
        write_delta_q(w);
    {   /* kf y mode + angle delta */
        int am = mi_row > w->tile_r0 ? w->mi_mode[(mi_row - 1) * w->mi_cols + mi_col] : 0;
        int lm = mi_col > w->tile_c0 ? w->mi_mode[mi_row * w->mi_cols + mi_col - 1] : 0;
        int actx = mi_row > w->tile_r0 ? IMODE_CTX[am] : 0;
        int lctx = mi_col > w->tile_c0 ? IMODE_CTX[lm] : 0;
        ec_symbol(w->enc, y_mode, w->cdf_kf_y + (actx * 5 + lctx) * 14, 13, w->adapt);
        if (bsize >= 3 && y_mode >= 1 && y_mode <= 8)
            ec_symbol(w->enc, 3, w->cdf_angle + (y_mode - 1) * 8, 7, w->adapt);
    }
    if (has_uv) {
        ec_symbol(w->enc, uv_mode,
                  w->cdf_uv + (cfl_allowed * 13 + y_mode) * 15,
                  cfl_allowed ? 14 : 13, w->adapt);
        if (uv_mode == 13) { /* cfl alphas */
            int su = cfl_alpha_u == 0 ? 0 : (cfl_alpha_u < 0 ? 1 : 2);
            int sv = cfl_alpha_v == 0 ? 0 : (cfl_alpha_v < 0 ? 1 : 2);
            int joint = su * 3 + sv - 1;
            ec_symbol(w->enc, joint, w->cdf_cfl_sign, 8, w->adapt);
            if (su != 0) {
                int au = cfl_alpha_u < 0 ? -cfl_alpha_u : cfl_alpha_u;
                ec_symbol(w->enc, au - 1, w->cdf_cfl_alpha + (joint - 2) * 17,
                          16, w->adapt);
            }
            if (sv != 0) {
                int av = cfl_alpha_v < 0 ? -cfl_alpha_v : cfl_alpha_v;
                ec_symbol(w->enc, av - 1,
                          w->cdf_cfl_alpha + (sv * 3 + su - 3) * 17, 16, w->adapt);
            }
        }
    }
    if (w->allow_sct && W <= 64 && H <= 64 && bsize >= 3) {
        int npl2 = 0, t = W * H;
        while (t > 1) { t >>= 1; npl2++; }
        int bctx = npl2 - 6;
        if (y_mode == 0)
            ec_symbol(w->enc, 0, w->cdf_pal_y + (bctx * 3 + 0) * 3, 2, w->adapt);
        if (has_uv && uv_mode == 0)
            ec_symbol(w->enc, 0, w->cdf_pal_uv, 2, w->adapt);
    }
    if (w->enable_filter_intra && y_mode == 0 && W <= 32 && H <= 32)
        ec_symbol(w->enc, 0, w->cdf_fi + bsize * 3, 2, w->adapt);

    /* ---- coefficients + recon per plane */
    code_residual_planes(w, res, nres, skip, 0, y_mode);

    /* mi grids */
    int r1 = mi_row + bh4 < w->mi_rows ? mi_row + bh4 : w->mi_rows;
    int c1 = mi_col + bw4 < w->mi_cols ? mi_col + bw4 : w->mi_cols;
    for (int r = mi_row; r < r1; r++)
        for (int c = mi_col; c < c1; c++) {
            w->mi_mode[r * w->mi_cols + c] = (int8_t)y_mode;
            w->mi_skip[r * w->mi_cols + c] = (int8_t)skip;
        }
}

/* ================================================ inter (P-frame) blocks */
/* size_group_lookup for the non-kf y-mode cdf (definitions.h) */
/* size_group_lookup: the six extended bsizes (4x16..64x16) group as
   0,0,1,1,2,2 - one LOWER than their areas suggest */
static const uint8_t SIZE_GROUP[22] = {0,0,0,1,1,1,2,2,2,3,3,3,3,3,3,3,0,0,1,1,2,2};

/* MC prediction for one plane (mirror of inter_encoder._mc_pred +
   mc_native.convolve_block kernel selection: 4-tap tables at dim <= 4) */
/* per-block interpolation filter kernels: 0 REGULAR / 1 SMOOTH / 2 SHARP
   (the 4-tap set has no sharp variant; spec uses the regular 4-tap) */
static const int32_t *fkern8(const Walk *w, int filt) {
    if (filt > 0 && w->filt8[filt]) return w->filt8[filt];
    return w->filters8;
}
static const int32_t *fkern4(const Walk *w, int filt) {
    if (filt == 1 && w->filt4[1]) return w->filt4[1];
    return w->filters4;
}

static int ref_to_idx(const Walk *w, int ref) {
    if (ref == 1) return 0;
    if (w->ref3_const && ref == w->ref3_const) return 2;
    return 1;
}

static void mc_pred_plane_f(const Walk *w, int ref_idx, int plane, int px,
                            int py, int pw_, int ph_, int mvr, int mvc,
                            int filt, uint16_t *out) {
    long long wp_t0 = wp_now();
    const int32_t *ref = ref_idx == 2 ? w->refp3[plane]
                                      : w->refp[ref_idx * 3 + plane];
    int stride = ref_idx == 2 ? w->refp3_stride[plane]
                              : w->refp_stride[ref_idx * 3 + plane];
    int ipy, ipx, fy, fx;
    if (plane == 0) {
        ipy = mvr >> 3; fy = (mvr & 7) << 1;
        ipx = mvc >> 3; fx = (mvc & 7) << 1;
    } else {
        ipy = mvr >> 4; fy = mvr & 15;
        ipx = mvc >> 4; fx = mvc & 15;
    }
    int yy = py + ipy + w->pad, xx = px + ipx + w->pad;
    const int32_t *fxk = (pw_ > 4 ? fkern8(w, filt) : fkern4(w, filt)) + 8 * fx;
    const int32_t *fyk = (ph_ > 4 ? fkern8(w, filt) : fkern4(w, filt)) + 8 * fy;
    mc_convolve_2d_sr(ref + (yy - 3) * stride + (xx - 3), stride, pw_, ph_,
                      fxk, fyk, fx != 0, fy != 0, w->bd, out);
    walk_prof_ns[0] += wp_now() - wp_t0;
}

static void mc_pred_plane(const Walk *w, int ref_idx, int plane, int px,
                          int py, int pw_, int ph_, int mvr, int mvc,
                          uint16_t *out) {
    mc_pred_plane_f(w, ref_idx, plane, px, py, pw_, ph_, mvr, mvc, 0, out);
}

/* ---- normative reference-MV stack (mirror of mv_pred.setup_ref_mv_list,
   spec 7.10.2 / adaptive_mv_pred.c:637). Single-ref, no temporal MVs. ---- */
typedef struct {
    const Walk *w;
    int mi_row, mi_col, n8_w, n8_h, ref;
    int gm_r, gm_c;
    int mvr[10], mvc[10], wt[10];
    int count, newmv_count, row_match, col_match;
    int max_row_offset, max_col_offset;
    int processed_rows, processed_cols;
} RefMv;

static int md_is_newmv(int md) {
    return md == 16 || md == 19 || md == 20 || md == 21 || md == 22 || md == 24;
}
static int md_is_global(int md) { return md == 15 || md == 23; }

static void rm_add(RefMv *s, int r, int c, int length, int weight) {
    const Walk *w = s->w;
    int idx = r * w->mi_cols + c;
    int md = w->g_mode[idx];
    if (w->g_ref[idx] == 0 && md < 13) return;   /* intra neighbor */
    /* scan BOTH references of the neighbor (add_ref_mv_candidate) */
    int rfs[2] = {w->g_ref[idx], w->g_ref2 ? w->g_ref2[idx] : 0};
    int mrs[2] = {w->g_mvr[idx], w->g_mv2r ? w->g_mv2r[idx] : 0};
    int mcs[2] = {w->g_mvc[idx], w->g_mv2c ? w->g_mv2c[idx] : 0};
    for (int k = 0; k < 2; k++) {
        if (rfs[k] != s->ref) continue;
        int mr, mc;
        if (md_is_global(md)) { mr = s->gm_r; mc = s->gm_c; }
        else { mr = mrs[k]; mc = mcs[k]; }
        int merged = 0;
        for (int i = 0; i < s->count; i++)
            if (s->mvr[i] == mr && s->mvc[i] == mc) {
                s->wt[i] += weight * length;
                merged = 1;
                break;
            }
        if (!merged && s->count < 8) {
            s->mvr[s->count] = mr; s->mvc[s->count] = mc;
            s->wt[s->count] = weight * length;
            s->count++;
        }
        if (md_is_newmv(md)) s->newmv_count++;
    }
}

static int rm_ref_at(const Walk *w, int idx, int ref) {
    return w->g_ref[idx] == ref || (w->g_ref2 && w->g_ref2[idx] == ref);
}

static void rm_scan_row(RefMv *s, int row_offset) {
    const Walk *w = s->w;
    int end_mi = s->n8_w;
    if (w->mi_cols - s->mi_col < end_mi) end_mi = w->mi_cols - s->mi_col;
    if (end_mi > 16) end_mi = 16;
    int aro = row_offset < 0 ? -row_offset : row_offset;
    int col_off = 0;
    if (aro > 1) {
        col_off = 1;
        if ((s->mi_col & 1) && s->n8_w < 2) col_off -= 1;
    }
    int use_step_16 = s->n8_w >= 16;
    int i = 0, found = 0;
    while (i < end_mi) {
        int r = s->mi_row + row_offset, c = s->mi_col + col_off + i;
        if (c >= w->mi_cols) break;
        int idx = r * w->mi_cols + c;
        int cand_w = w->g_bw4[idx];
        int length = s->n8_w < cand_w ? s->n8_w : cand_w;
        if (use_step_16) { if (length < 4) length = 4; }
        else if (aro > 1) { if (length < 2) length = 2; }
        int weight = 2;
        if (s->n8_w >= 2 && s->n8_w <= cand_w) {
            int inc = -s->max_row_offset + row_offset + 1;
            int bh = w->g_bh4[idx];
            if (bh < inc) inc = bh;
            if (inc > weight) weight = inc;
            s->processed_rows = inc - row_offset - 1;
        }
        if (rm_ref_at(w, idx, s->ref)) found = 1;
        rm_add(s, r, c, length, weight);
        i += length;
    }
    if (found) s->row_match++;
}

static void rm_scan_col(RefMv *s, int col_offset) {
    const Walk *w = s->w;
    int end_mi = s->n8_h;
    if (w->mi_rows - s->mi_row < end_mi) end_mi = w->mi_rows - s->mi_row;
    if (end_mi > 16) end_mi = 16;
    int aco = col_offset < 0 ? -col_offset : col_offset;
    int row_off = 0;
    if (aco > 1) {
        row_off = 1;
        if ((s->mi_row & 1) && s->n8_h < 2) row_off -= 1;
    }
    int use_step_16 = s->n8_h >= 16;
    int i = 0, found = 0;
    while (i < end_mi) {
        int r = s->mi_row + row_off + i, c = s->mi_col + col_offset;
        if (r >= w->mi_rows) break;
        int idx = r * w->mi_cols + c;
        int cand_h = w->g_bh4[idx];
        int length = s->n8_h < cand_h ? s->n8_h : cand_h;
        if (use_step_16) { if (length < 4) length = 4; }
        else if (aco > 1) { if (length < 2) length = 2; }
        int weight = 2;
        if (s->n8_h >= 2 && s->n8_h <= cand_h) {
            int inc = -s->max_col_offset + col_offset + 1;
            int bw = w->g_bw4[idx];
            if (bw < inc) inc = bw;
            if (inc > weight) weight = inc;
            s->processed_cols = inc - col_offset - 1;
        }
        if (rm_ref_at(w, idx, s->ref)) found = 1;
        rm_add(s, r, c, length, weight);
        i += length;
    }
    if (found) s->col_match++;
}

static void rm_scan_blk(RefMv *s, int ro, int co) {
    const Walk *w = s->w;
    int r = s->mi_row + ro, c = s->mi_col + co;
    if (r < w->tile_r0 || c < w->tile_c0 || r >= w->tile_r1 || c >= w->tile_c1)
        return;
    int found = rm_ref_at(w, r * w->mi_cols + c, s->ref);
    rm_add(s, r, c, 2, 2);
    if (found) s->row_match++;
}

static int rm_has_tr(int mi_row, int mi_col, int n8_w, int n8_h) {
    int bs = n8_w > n8_h ? n8_w : n8_h;
    if (bs > 16) return 0;
    /* two-rect rules (has_top_right, adaptive_mv_pred.c:270-281): the
       bottom of a HORZ pair never has a top-right; the left of a VERT
       pair always does. is_sec_rect per adaptive_mv_pred.c:1030-1041. */
    if (n8_w > n8_h && (mi_row & (n8_w - 1))) return 0;
    if (n8_w < n8_h && ((mi_col + n8_w) & (n8_h - 1)) != 0) return 1;
    int mask_row = mi_row & 15, mask_col = mi_col & 15;
    int has_tr = !((mask_row & bs) && (mask_col & bs));
    int b = bs;
    while (b < 16) {
        if (mask_col & b) {
            if ((mask_col & (2 * b)) && (mask_row & (2 * b))) {
                has_tr = 0;
                break;
            }
        } else break;
        b <<= 1;
    }
    return has_tr;
}

/* ---- MFMV temporal scan (add_tpl_ref_mv, adaptive_mv_pred.c:337 /
   spec 7.10.2.5): mirrors mv_pred._temporal_scan exactly ---- */
static const int mfmv_div_mult[32] = {
    0, 16384, 8192, 5461, 4096, 3276, 2730, 2340, 2048, 1820, 1638,
    1489, 1365, 1260, 1170, 1092, 1024, 963, 910, 862, 819, 780,
    744, 712, 682, 655, 630, 606, 585, 564, 546, 528};

static int mfmv_proj(int mv, int num, int den) {
    if (den > 31) den = 31;
    num = num > 31 ? 31 : (num < -31 ? -31 : num);
    long long p = (long long)mv * num * mfmv_div_mult[den];
    int out = p >= 0 ? (int)((p + 8192) >> 14) : -(int)((-p + 8192) >> 14);
    return out > 16383 ? 16383 : (out < -16383 ? -16383 : out);
}

static int mfmv_lower(int v, int allow_hp, int force_int) {
    if (force_int) {
        int mod = v % 8;
        if (mod) {
            v -= mod;
            if (mod > 4) v += 8;
            else if (mod < -4) v -= 8;
        }
        return v;
    }
    if (!allow_hp && (v & 1)) v += v > 0 ? -1 : 1;
    return v;
}

/* returns the ZeroMvContext bit; add() dedupes into the caller's stack */
static int tpl_scan(const Walk *w, int mi_row, int mi_col, int n8_w, int n8_h,
                    int rf0, int rf1, int gm0r, int gm0c, int gm1r, int gm1c,
                    void *ctx, void (*add)(void *, int, int, int, int)) {
    int cur0 = w->cur_off[rf0];
    int cur1 = rf1 ? w->cur_off[rf1] : 0;
    int zero_bit = 0, avail = 0;
    int step_h = n8_h >= 16 ? 4 : 2;
    int step_w = n8_w >= 16 ? 4 : 2;
    int end_h = n8_h < 16 ? n8_h : 16;
    int end_w = n8_w < 16 ? n8_w : 16;
    int pos[67][2];
    int n_pos = 0, n_main;
    for (int br = 0; br < end_h; br += step_h)
        for (int bc = 0; bc < end_w; bc += step_w) {
            pos[n_pos][0] = br; pos[n_pos][1] = bc; n_pos++;
        }
    n_main = n_pos;
    if (n8_h >= 2 && n8_h < 16 && n8_w >= 2 && n8_w < 16) {
        int voff = n8_h > 2 ? n8_h : 2;
        int hoff = n8_w > 2 ? n8_w : 2;
        int mrow = mi_row & 15, mcol = mi_col & 15;   /* check_sb_border */
        int e[3][2] = {{voff, -2}, {voff, hoff}, {voff - 2, hoff}};
        for (int i = 0; i < 3; i++) {
            if (mrow + e[i][0] < 0 || mrow + e[i][0] >= 16
                || mcol + e[i][1] < 0 || mcol + e[i][1] >= 16) continue;
            pos[n_pos][0] = e[i][0]; pos[n_pos][1] = e[i][1]; n_pos++;
        }
    }
    for (int i = 0; i < n_pos; i++) {
        int br = pos[i][0], bc = pos[i][1];
        int pr = (mi_row & 1) ? br : br + 1;
        int pc = (mi_col & 1) ? bc : bc + 1;
        int r = mi_row + pr, c = mi_col + pc;
        int ret = 0;
        if (r >= w->tile_r0 && r < w->tile_r1
            && c >= w->tile_c0 && c < w->tile_c1) {
            int ti = (r >> 1) * w->tpl_stride + (c >> 1);
            int off = w->tpl_off[ti];
            if (off) {
                int fr = w->tpl_row[ti], fc = w->tpl_col[ti];
                int mr = mfmv_lower(mfmv_proj(fr, cur0, off),
                                    w->allow_hp, w->force_int);
                int mc = mfmv_lower(mfmv_proj(fc, cur0, off),
                                    w->allow_hp, w->force_int);
                int m2r = 0, m2c = 0;
                if (rf1) {
                    m2r = mfmv_lower(mfmv_proj(fr, cur1, off),
                                     w->allow_hp, w->force_int);
                    m2c = mfmv_lower(mfmv_proj(fc, cur1, off),
                                     w->allow_hp, w->force_int);
                }
                if (br == 0 && bc == 0) {
                    int far = abs(mr - gm0r) >= 16 || abs(mc - gm0c) >= 16;
                    if (rf1)
                        far = far || abs(m2r - gm1r) >= 16
                                  || abs(m2c - gm1c) >= 16;
                    if (far) zero_bit = 1;
                }
                add(ctx, mr, mc, m2r, m2c);
                ret = 1;
            }
        }
        if (i < n_main && br == 0 && bc == 0) avail = ret;
    }
    if (!avail) zero_bit = 1;
    return zero_bit;
}

static void rm_tpl_add(void *vp, int mr, int mc, int m2r, int m2c) {
    (void)m2r; (void)m2c;
    RefMv *s = (RefMv *)vp;
    for (int i = 0; i < s->count; i++)
        if (s->mvr[i] == mr && s->mvc[i] == mc) { s->wt[i] += 2; return; }
    if (s->count < 8) {
        s->mvr[s->count] = mr; s->mvc[s->count] = mc;
        s->wt[s->count] = 2; s->count++;
    }
}

static void ref_mv_list(const Walk *w, int mi_row, int mi_col, int n8_w,
                        int n8_h, int ref, int gm_r, int gm_c,
                        int *st_r, int *st_c, int *st_w,
                        int *p_mode_ctx, int *p_refmv_count, int *p_nstack) {
    RefMv s;
    memset(&s, 0, sizeof s);
    s.w = w; s.mi_row = mi_row; s.mi_col = mi_col;
    s.n8_w = n8_w; s.n8_h = n8_h; s.ref = ref; s.gm_r = gm_r; s.gm_c = gm_c;
    int up_avail = mi_row > w->tile_r0;
    int left_avail = mi_col > w->tile_c0;
    int row_adj = (n8_h < 2) && (mi_row & 1);
    int col_adj = (n8_w < 2) && (mi_col & 1);
    if (up_avail) {
        s.max_row_offset = (n8_h < 2 ? -4 : -6) + row_adj;
        int lo = w->tile_r0 - mi_row, hi = w->tile_r1 - mi_row - 1;
        if (s.max_row_offset < lo) s.max_row_offset = lo;
        if (s.max_row_offset > hi) s.max_row_offset = hi;
    }
    if (left_avail) {
        s.max_col_offset = (n8_w < 2 ? -4 : -6) + col_adj;
        int lo = w->tile_c0 - mi_col, hi = w->tile_c1 - mi_col - 1;
        if (s.max_col_offset < lo) s.max_col_offset = lo;
        if (s.max_col_offset > hi) s.max_col_offset = hi;
    }
    if (s.max_row_offset) rm_scan_row(&s, -1);
    if (s.max_col_offset) rm_scan_col(&s, -1);
    if (rm_has_tr(mi_row, mi_col, n8_w, n8_h)) rm_scan_blk(&s, -1, n8_w);

    int nearest_match = (s.row_match > 0) + (s.col_match > 0);
    int nearest_newmv = s.newmv_count;
    for (int i = 0; i < s.count; i++) s.wt[i] += 640;   /* REF_CAT_LEVEL */

    int tpl_zero = 0;
    if (w->use_ref_frame_mvs)
        tpl_zero = tpl_scan(w, mi_row, mi_col, n8_w, n8_h, ref, 0,
                            gm_r, gm_c, 0, 0, &s, rm_tpl_add);

    rm_scan_blk(&s, -1, -1);
    for (int idx = 2; idx <= 3; idx++) {                /* MVREF_ROWS = 3 */
        int ro = -(idx << 1) + 1 + row_adj;
        int co = -(idx << 1) + 1 + col_adj;
        int aro = ro < 0 ? -ro : ro;
        int amro = s.max_row_offset < 0 ? -s.max_row_offset : s.max_row_offset;
        int aco = co < 0 ? -co : co;
        int amco = s.max_col_offset < 0 ? -s.max_col_offset : s.max_col_offset;
        if (aro <= amro && aro > s.processed_rows) rm_scan_row(&s, ro);
        if (aco <= amco && aco > s.processed_cols) rm_scan_col(&s, co);
    }
    s.newmv_count = nearest_newmv;   /* outer scans use a dummy counter */

    int mode_ctx = tpl_zero << 3;     /* ZeroMvContext (GLOBALMV_OFFSET) */
    int ref_match = (s.row_match > 0) + (s.col_match > 0);
    if (nearest_match == 0) {
        if (ref_match >= 1) mode_ctx |= 1;
        if (ref_match == 1) mode_ctx |= 1 << 4;
        else if (ref_match >= 2) mode_ctx |= 2 << 4;
    } else if (nearest_match == 1) {
        mode_ctx |= nearest_newmv > 0 ? 2 : 3;
        if (ref_match == 1) mode_ctx |= 3 << 4;
        else if (ref_match >= 2) mode_ctx |= 4 << 4;
    } else {
        mode_ctx |= nearest_newmv >= 1 ? 4 : 5;
        mode_ctx |= 5 << 4;
    }

    /* stable sort by weight (descending) */
    int ord[10];
    for (int i = 0; i < s.count; i++) ord[i] = i;
    for (int i = 1; i < s.count; i++) {
        int k = ord[i], j = i - 1;
        while (j >= 0 && s.wt[ord[j]] < s.wt[k]) { ord[j + 1] = ord[j]; j--; }
        ord[j + 1] = k;
    }
    int n = s.count;
    for (int i = 0; i < n; i++) {
        st_r[i] = s.mvr[ord[i]]; st_c[i] = s.mvc[ord[i]]; st_w[i] = s.wt[ord[i]];
    }

    /* extension scan (single-ref add_extra_mv_candidate) + gm padding */
    int refmv_count = n;
    if (refmv_count < 2) {
        int mi_w = n8_w < 16 ? n8_w : 16;
        if (w->mi_cols - mi_col < mi_w) mi_w = w->mi_cols - mi_col;
        int mi_h = n8_h < 16 ? n8_h : 16;
        if (w->mi_rows - mi_row < mi_h) mi_h = w->mi_rows - mi_row;
        int mi_size = mi_w < mi_h ? mi_w : mi_h;
        for (int pass = 0; pass < 2; pass++) {
            int offs_row = pass == 0;
            if (offs_row && !s.max_row_offset) continue;
            if (!offs_row && !s.max_col_offset) continue;
            int i = 0;
            while (i < mi_size && refmv_count < 2) {
                int r, c, step;
                if (offs_row) { r = mi_row - 1; c = mi_col + i; }
                else { r = mi_row + i; c = mi_col - 1; }
                int idx = r * w->mi_cols + c;
                step = offs_row ? w->g_bw4[idx] : w->g_bh4[idx];
                int rfs[2] = {w->g_ref[idx], w->g_ref2 ? w->g_ref2[idx] : 0};
                int mrs[2] = {w->g_mvr[idx], w->g_mv2r ? w->g_mv2r[idx] : 0};
                int mcs[2] = {w->g_mvc[idx], w->g_mv2c ? w->g_mv2c[idx] : 0};
                for (int t = 0; t < 2; t++) {
                    if (rfs[t] <= 0 || refmv_count >= 2) continue;
                    int mr = mrs[t], mc = mcs[t];
                    /* spec 7.10.2.10: different-signed refs enter negated
                       (RefFrameSignBias; all-zero with order hints off) */
                    if (w->sign_bias[rfs[t]] != w->sign_bias[ref]) {
                        mr = -mr; mc = -mc;
                    }
                    int dup = 0;
                    for (int k = 0; k < refmv_count; k++)
                        if (st_r[k] == mr && st_c[k] == mc) { dup = 1; break; }
                    if (!dup) {
                        st_r[refmv_count] = mr; st_c[refmv_count] = mc;
                        st_w[refmv_count] = 2;
                        if (refmv_count >= n) n = refmv_count + 1;
                        refmv_count++;
                    }
                }
                i += step;
            }
        }
        for (int idx = refmv_count; idx < 2; idx++) {
            st_r[idx] = gm_r; st_c[idx] = gm_c;
            if (idx >= n) { st_w[idx] = 2; n = idx + 1; }
        }
    }

    /* clamp (MV_BORDER = 128) */
    int bw_px = n8_w * 4, bh_px = n8_h * 4;
    int lo_c = -(mi_col * 4) * 8 - bw_px * 8 - 128;
    int hi_c = (w->mi_cols - n8_w - mi_col) * 32 + bw_px * 8 + 128;
    int lo_r = -(mi_row * 4) * 8 - bh_px * 8 - 128;
    int hi_r = (w->mi_rows - n8_h - mi_row) * 32 + bh_px * 8 + 128;
    for (int i = 0; i < n; i++) {
        if (st_r[i] < lo_r) st_r[i] = lo_r;
        if (st_r[i] > hi_r) st_r[i] = hi_r;
        if (st_c[i] < lo_c) st_c[i] = lo_c;
        if (st_c[i] > hi_c) st_c[i] = hi_c;
    }
    *p_mode_ctx = mode_ctx;
    *p_refmv_count = refmv_count;
    *p_nstack = n;
}

/* ---- inter syntax writers (mirror of inter_encoder._write_*) ---- */
static void write_is_inter(Walk *w, int mi_row, int mi_col, int is_inter) {
    int has_a = mi_row > w->tile_r0, has_l = mi_col > w->tile_c0;
    int a_inter = has_a ? w->g_ref[(mi_row - 1) * w->mi_cols + mi_col] > 0 : 0;
    int l_inter = has_l ? w->g_ref[mi_row * w->mi_cols + mi_col - 1] > 0 : 0;
    int ctx;
    if (has_a && has_l)
        ctx = (!a_inter && !l_inter) ? 3 : (!a_inter || !l_inter);
    else if (has_a || has_l)
        ctx = 2 * !(has_a ? a_inter : l_inter);
    else
        ctx = 0;
    ec_symbol(w->enc, is_inter, w->cdf_intra_inter + ctx * 3, 2, w->adapt);
}

static void write_ref_frames(Walk *w, int mi_row, int mi_col, int ref) {
    int counts[8] = {0};
    int has_a = mi_row > w->tile_r0, has_l = mi_col > w->tile_c0;
    if (has_a) {
        int idx = (mi_row - 1) * w->mi_cols + mi_col;
        if (w->g_ref[idx] > 0) {
            counts[w->g_ref[idx]]++;
            if (w->g_ref2 && w->g_ref2[idx] > 0) counts[w->g_ref2[idx]]++;
        }
    }
    if (has_l) {
        int idx = mi_row * w->mi_cols + mi_col - 1;
        if (w->g_ref[idx] > 0) {
            counts[w->g_ref[idx]]++;
            if (w->g_ref2 && w->g_ref2[idx] > 0) counts[w->g_ref2[idx]]++;
        }
    }
    int fwd = counts[1] + counts[2] + counts[3] + counts[4];
    int bwd = counts[5] + counts[6] + counts[7];
    int ctx_p1 = fwd == bwd ? 1 : (fwd < bwd ? 0 : 2);
    int is_bwd = ref >= 5;   /* BWDREF/ALTREF2/ALTREF group */
    ec_symbol(w->enc, is_bwd, w->cdf_single_ref + (ctx_p1 * 6 + 0) * 3, 2,
              w->adapt);
    if (is_bwd) {
        /* single_ref_p2: ALTREF vs BWDREF/ALTREF2
           (get_pred_context_brfarf2_or_arf, entropy_coding.c:1974) */
        int brfarf2 = counts[5] + counts[6], arf = counts[7];
        int ctx_p2 = brfarf2 == arf ? 1 : (brfarf2 < arf ? 0 : 2);
        ec_symbol(w->enc, ref == 7, w->cdf_single_ref + (ctx_p2 * 6 + 1) * 3,
                  2, w->adapt);
        return;   /* only ALTREF single references are produced */
    }
    int ll2 = counts[1] + counts[2], l3g = counts[3] + counts[4];
    int ctx_p3 = ll2 == l3g ? 1 : (ll2 < l3g ? 0 : 2);
    int is_gold = ref == 4;
    ec_symbol(w->enc, is_gold, w->cdf_single_ref + (ctx_p3 * 6 + 2) * 3, 2,
              w->adapt);
    if (is_gold) {
        int ctx_p5 = counts[3] == counts[4] ? 1 : (counts[3] < counts[4] ? 0 : 2);
        ec_symbol(w->enc, 1, w->cdf_single_ref + (ctx_p5 * 6 + 4) * 3, 2,
                  w->adapt);
    } else {
        int ctx_p4 = counts[1] == counts[2] ? 1 : (counts[1] < counts[2] ? 0 : 2);
        ec_symbol(w->enc, ref == 2, w->cdf_single_ref + (ctx_p4 * 6 + 3) * 3,
                  2, w->adapt);   /* LAST vs LAST2 */
    }
}

static void write_inter_mode(Walk *w, int mode, int mode_ctx) {
    ec_symbol(w->enc, mode != 16, w->cdf_newmv + (mode_ctx & 7) * 3, 2,
              w->adapt);
    if (mode != 16) {
        ec_symbol(w->enc, mode != 15, w->cdf_zeromv + ((mode_ctx >> 3) & 1) * 3,
                  2, w->adapt);
        if (mode != 15)
            ec_symbol(w->enc, mode != 13,
                      w->cdf_refmv + ((mode_ctx >> 4) & 15) * 3, 2, w->adapt);
    }
}

static void write_drl(Walk *w, const int *st_w, int nstack, int refmv_count) {
    /* drl_index = 0 (write_drl_idx NEWMV branch) */
    if (refmv_count > 1) {
        int w0 = nstack > 0 ? st_w[0] : 0;
        int w1 = nstack > 1 ? st_w[1] : 0;
        int ctx = (w0 >= 640 && w1 >= 640) ? 0 : (w0 >= 640 ? 1 : 2);
        ec_symbol(w->enc, 0, w->cdf_drl + ctx * 3, 2, w->adapt);
    }
}

static void write_mv(Walk *w, int mvr, int mvc, int refr, int refc) {
    int diff[2] = {mvr - refr, mvc - refc};
    int joint = (diff[0] == 0 && diff[1] == 0) ? 0
                : (diff[0] == 0 ? 1 : (diff[1] == 0 ? 2 : 3));
    ec_symbol(w->enc, joint, w->cdf_nmv_joints, 4, w->adapt);
    for (int comp = 0; comp < 2; comp++) {
        int d = diff[comp];
        if (d == 0) continue;
        int sign = d < 0;
        int mag = sign ? -d : d;
        int z = mag - 1;
        int cls, base;
        if (z >= 2 * 4096) cls = 10;
        else {
            cls = 0;
            int t = z >> 3;
            while (t > 1) { t >>= 1; cls++; }
        }
        base = cls ? (2 << (cls + 2)) : 0;
        int offset = z - base;
        int di = offset >> 3, fr = (offset >> 1) & 3, hp = offset & 1;
        ec_symbol(w->enc, sign, w->cdf_nmv_sign + comp * 3, 2, w->adapt);
        ec_symbol(w->enc, cls, w->cdf_nmv_classes + comp * 12, 11, w->adapt);
        if (cls == 0)
            ec_symbol(w->enc, di, w->cdf_nmv_class0 + comp * 3, 2, w->adapt);
        else
            for (int i = 0; i < cls; i++)
                ec_symbol(w->enc, (di >> i) & 1,
                          w->cdf_nmv_bits + (comp * 10 + i) * 3, 2, w->adapt);
        /* precision: allow_high_precision_mv = 1, force_integer = 0 */
        if (cls == 0)
            ec_symbol(w->enc, fr,
                      (di ? w->cdf_nmv_fp1 : w->cdf_nmv_fp0) + comp * 5, 4,
                      w->adapt);
        else
            ec_symbol(w->enc, fr, w->cdf_nmv_fp + comp * 5, 4, w->adapt);
        if (cls == 0)
            ec_symbol(w->enc, hp, w->cdf_nmv_c0hp + comp * 3, 2, w->adapt);
        else
            ec_symbol(w->enc, hp, w->cdf_nmv_hp + comp * 3, 2, w->adapt);
    }
}


/* ================================== compound (COMPOUND_AVERAGE) blocks */
/* jnt convolve into the ConvBuf domain (mirror of codec/compound.py /
   svt_av1_jnt_convolve_*_c; round_0 = 3, round_1 = 7 for bd <= 10) */
static void jnt_conv(const int32_t *patch, int pstride, int w_, int h_,
                     const int32_t *fx, const int32_t *fy, int sx, int sy,
                     int bd, int32_t *out) {
    const int R0 = 3, R1 = 7, FB = 7;
    int offset_bits = bd + 2 * FB - R0;
    int32_t round_offset = (1 << (offset_bits - R1))
        + (1 << (offset_bits - R1 - 1));
    if (sx && sy) {
        int32_t im[(64 + 7) * 64];
        for (int y = 0; y < h_ + 7; y++)
            for (int x = 0; x < w_; x++) {
                int64_t acc = (int64_t)1 << (bd + FB - 1);
                for (int k = 0; k < 8; k++)
                    acc += (int64_t)fx[k] * patch[y * pstride + x + k];
                im[y * w_ + x] = (int32_t)((acc + (1 << (R0 - 1))) >> R0);
            }
        for (int y = 0; y < h_; y++)
            for (int x = 0; x < w_; x++) {
                int64_t acc = (int64_t)1 << offset_bits;
                for (int k = 0; k < 8; k++)
                    acc += (int64_t)fy[k] * im[(y + k) * w_ + x];
                out[y * w_ + x] = (int32_t)((acc + (1 << (R1 - 1))) >> R1);
            }
        return;
    }
    if (sx) {
        int bits = FB - R1;
        for (int y = 0; y < h_; y++)
            for (int x = 0; x < w_; x++) {
                int64_t acc = 0;
                for (int k = 0; k < 8; k++)
                    acc += (int64_t)fx[k] * patch[(y + 3) * pstride + x + k];
                int32_t res = (int32_t)((acc + (1 << (R0 - 1))) >> R0)
                              * (1 << bits);
                out[y * w_ + x] = res + round_offset;
            }
        return;
    }
    if (sy) {
        int bits = FB - R0;
        for (int y = 0; y < h_; y++)
            for (int x = 0; x < w_; x++) {
                int64_t acc = 0;
                for (int k = 0; k < 8; k++)
                    acc += (int64_t)fy[k] * patch[(y + k) * pstride + x + 3];
                acc *= (1 << bits);
                out[y * w_ + x] = (int32_t)((acc + (1 << (R1 - 1))) >> R1)
                                  + round_offset;
            }
        return;
    }
    int bits = 2 * 7 - R1 - R0;
    for (int y = 0; y < h_; y++)
        for (int x = 0; x < w_; x++)
            out[y * w_ + x] = (patch[(y + 3) * pstride + x + 3] << bits)
                              + round_offset;
}

/* the pair's ConvBuf-domain predictions (inter_encoder._jnt_bufs) */
static void jnt_bufs(const Walk *w, int plane, int px, int py, int pw_,
                     int ph_, int mv0r, int mv0c, int mv1r, int mv1c,
                     int filt, int32_t *buf0, int32_t *buf1) {
    int32_t *bufs[2] = {buf0, buf1};
    const int mvr[2] = {mv0r, mv1r}, mvc[2] = {mv0c, mv1c};
    for (int ri = 0; ri < 2; ri++) {
        const int32_t *ref = w->refp[ri * 3 + plane];
        int stride = w->refp_stride[ri * 3 + plane];
        int ipy, ipx, fy, fx;
        if (plane == 0) {
            ipy = mvr[ri] >> 3; fy = (mvr[ri] & 7) << 1;
            ipx = mvc[ri] >> 3; fx = (mvc[ri] & 7) << 1;
        } else {
            ipy = mvr[ri] >> 4; fy = mvr[ri] & 15;
            ipx = mvc[ri] >> 4; fx = mvc[ri] & 15;
        }
        int yy = py + ipy + w->pad, xx = px + ipx + w->pad;
        const int32_t *fxk = (pw_ > 4 ? fkern8(w, filt) : fkern4(w, filt))
                             + 8 * fx;
        const int32_t *fyk = (ph_ > 4 ? fkern8(w, filt) : fkern4(w, filt))
                             + 8 * fy;
        jnt_conv(ref + (yy - 3) * stride + (xx - 3), stride, pw_, ph_,
                 fxk, fyk, fx != 0, fy != 0, w->bd, bufs[ri]);
    }
}

static void mc_pred_compound_f(const Walk *w, int plane, int px, int py,
                               int pw_, int ph_, int mv0r, int mv0c,
                               int mv1r, int mv1c, int filt, uint16_t *out) {
    long long wp_t0 = wp_now();
    int32_t buf0[64 * 64], buf1[64 * 64];
    jnt_bufs(w, plane, px, py, pw_, ph_, mv0r, mv0c, mv1r, mv1c, filt,
             buf0, buf1);
    /* COMPOUND_AVERAGE tail */
    const int R0 = 3, R1 = 7, FB = 7;
    int offset_bits = w->bd + 2 * FB - R0;
    int32_t round_offset = (1 << (offset_bits - R1))
        + (1 << (offset_bits - R1 - 1));
    int round_bits = 2 * FB - R0 - R1;
    int peak = (1 << w->bd) - 1;
    for (int k = 0; k < pw_ * ph_; k++) {
        int32_t tmp = ((buf0[k] + buf1[k]) >> 1) - round_offset;
        tmp = (tmp + (1 << (round_bits - 1))) >> round_bits;
        if (tmp < 0) tmp = 0;
        if (tmp > peak) tmp = peak;
        out[k] = (uint16_t)tmp;
    }
    walk_prof_ns[0] += wp_now() - wp_t0;
}

static void mc_pred_compound(const Walk *w, int plane, int px, int py,
                             int pw_, int ph_, int mv0r, int mv0c,
                             int mv1r, int mv1c, uint16_t *out) {
    mc_pred_compound_f(w, plane, px, py, pw_, ph_, mv0r, mv0c, mv1r, mv1c,
                       0, out);
}

/* aom blend_a64_d16: blend the pair's ConvBuf predictions under `mask`
   (weights for prediction 0) and round to pixels (codec/wedge.blend_d16) */
static void blend_d16_c(const Walk *w, const int32_t *b0, const int32_t *b1,
                        const int32_t *mask, int mstride, int n_w, int n_h,
                        uint16_t *out) {
    const int R0 = 3, R1 = 7, FB = 7;
    int offset_bits = w->bd + 2 * FB - R0;
    int32_t round_offset = (1 << (offset_bits - R1))
        + (1 << (offset_bits - R1 - 1));
    int round_bits = 2 * FB - R0 - R1;
    int peak = (1 << w->bd) - 1;
    for (int y = 0; y < n_h; y++)
        for (int x = 0; x < n_w; x++) {
            int k = y * n_w + x;
            int m = mask[y * mstride + x];
            int32_t v = (m * b0[k] + (64 - m) * b1[k]) >> 6;
            v -= round_offset;
            v = (v + (1 << (round_bits - 1))) >> round_bits;
            if (v < 0) v = 0;
            if (v > peak) v = peak;
            out[k] = (uint16_t)v;
        }
}

/* COMPOUND_DIFFWTD masks from the ConvBuf pair (codec/wedge.diffwtd_masks):
   mask_type 0 = 38 + diff/16, mask_type 1 = its inverse */
static void diffwtd_mask_c(const Walk *w, const int32_t *b0,
                           const int32_t *b1, int n, int mask_type,
                           int32_t *mask) {
    int rnd = 2 * 7 - 3 - 7 + (w->bd - 8);
    for (int k = 0; k < n; k++) {
        int32_t d = b0[k] - b1[k];
        if (d < 0) d = -d;
        d = (d + (1 << (rnd - 1))) >> rnd;
        int32_t m = 38 + d / 16;
        if (m > 64) m = 64;
        mask[k] = mask_type ? 64 - m : m;
    }
}

/* 2x2-average chroma mask from a luma-plane mask (spec 7.11.3.11) */
static void subsample_mask_c(const int32_t *m, int n_w, int n_h,
                             int32_t *out) {
    for (int y = 0; y < n_h / 2; y++)
        for (int x = 0; x < n_w / 2; x++)
            out[y * (n_w / 2) + x] =
                (m[(2 * y) * n_w + 2 * x] + m[(2 * y) * n_w + 2 * x + 1]
                 + m[(2 * y + 1) * n_w + 2 * x]
                 + m[(2 * y + 1) * n_w + 2 * x + 1] + 2) >> 2;
}

static const int32_t *wedge_mask_c(const Walk *w, int size, int idx,
                                   int sign) {
    int si = size == 8 ? 0 : (size == 16 ? 1 : 2);
    return w->wedge_blob + w->wedge_off[si * 32 + idx * 2 + sign];
}

/* smooth interintra mask (inter_encoder.ii_mask): 64 = full intra */
static void ii_mask_c(const Walk *w, int mode, int n_w, int n_h,
                      int32_t *out) {
    int mx = n_w > n_h ? n_w : n_h;
    int ss = 128 / mx;               /* II_SIZE_SCALE */
    for (int i = 0; i < n_h; i++)
        for (int j = 0; j < n_w; j++) {
            int v;
            if (mode == 1) v = w->ii_w1d[i * ss];          /* II_V */
            else if (mode == 2) v = w->ii_w1d[j * ss];     /* II_H */
            else if (mode == 3)                             /* II_SMOOTH */
                v = w->ii_w1d[(i < j ? i : j) * ss];
            else v = 32;                                    /* II_DC */
            out[i * n_w + j] = v;
        }
}

/* AOM_BLEND_A64(mask, intra, inter) in place over `inter` */
static void ii_blend_c(uint16_t *inter, const uint16_t *intra,
                       const int32_t *mask, int n) {
    for (int k = 0; k < n; k++)
        inter[k] = (uint16_t)((mask[k] * (int32_t)intra[k]
                               + (64 - mask[k]) * (int32_t)inter[k] + 32)
                              >> 6);
}

/* compound reference-MV stack (mirror of mv_pred.setup_comp_mv_list) */
typedef struct {
    const Walk *w;
    int mi_row, mi_col, n8_w, n8_h;
    int rf0, rf1;
    int gm0r, gm0c, gm1r, gm1c;
    int m0r[10], m0c[10], m1r[10], m1c[10], wt[10];
    int count, newmv_count, row_match, col_match;
    int max_row_offset, max_col_offset;
    int processed_rows, processed_cols;
} CompMv;

static void cm_add(CompMv *s, int r, int c, int length, int weight) {
    const Walk *w = s->w;
    int idx = r * w->mi_cols + c;
    int md = w->g_mode[idx];
    if (w->g_ref[idx] == 0 && md < 13) return;
    if (w->g_ref[idx] != s->rf0 || !w->g_ref2 || w->g_ref2[idx] != s->rf1)
        return;
    int a_r, a_c, b_r, b_c;
    if (md_is_global(md)) {
        a_r = s->gm0r; a_c = s->gm0c; b_r = s->gm1r; b_c = s->gm1c;
    } else {
        a_r = w->g_mvr[idx]; a_c = w->g_mvc[idx];
        b_r = w->g_mv2r[idx]; b_c = w->g_mv2c[idx];
    }
    int merged = 0;
    for (int i = 0; i < s->count; i++)
        if (s->m0r[i] == a_r && s->m0c[i] == a_c
            && s->m1r[i] == b_r && s->m1c[i] == b_c) {
            s->wt[i] += weight * length;
            merged = 1;
            break;
        }
    if (!merged && s->count < 8) {
        s->m0r[s->count] = a_r; s->m0c[s->count] = a_c;
        s->m1r[s->count] = b_r; s->m1c[s->count] = b_c;
        s->wt[s->count] = weight * length;
        s->count++;
    }
    if (md_is_newmv(md)) s->newmv_count++;
}

static void cm_tpl_add(void *vp, int mr, int mc, int m2r, int m2c) {
    CompMv *s = (CompMv *)vp;
    for (int i = 0; i < s->count; i++)
        if (s->m0r[i] == mr && s->m0c[i] == mc
            && s->m1r[i] == m2r && s->m1c[i] == m2c) {
            s->wt[i] += 2;
            return;
        }
    if (s->count < 8) {
        s->m0r[s->count] = mr; s->m0c[s->count] = mc;
        s->m1r[s->count] = m2r; s->m1c[s->count] = m2c;
        s->wt[s->count] = 2; s->count++;
    }
}

static int cm_pair_at(const CompMv *s, int idx) {
    const Walk *w = s->w;
    return w->g_ref[idx] == s->rf0 && w->g_ref2 && w->g_ref2[idx] == s->rf1;
}

static void cm_scan_row(CompMv *s, int row_offset) {
    const Walk *w = s->w;
    int end_mi = s->n8_w;
    if (w->mi_cols - s->mi_col < end_mi) end_mi = w->mi_cols - s->mi_col;
    if (end_mi > 16) end_mi = 16;
    int aro = row_offset < 0 ? -row_offset : row_offset;
    int col_off = 0;
    if (aro > 1) {
        col_off = 1;
        if ((s->mi_col & 1) && s->n8_w < 2) col_off -= 1;
    }
    int use_step_16 = s->n8_w >= 16;
    int i = 0, found = 0;
    while (i < end_mi) {
        int r = s->mi_row + row_offset, c = s->mi_col + col_off + i;
        if (c >= w->mi_cols) break;
        int idx = r * w->mi_cols + c;
        int cand_w = w->g_bw4[idx];
        int length = s->n8_w < cand_w ? s->n8_w : cand_w;
        if (use_step_16) { if (length < 4) length = 4; }
        else if (aro > 1) { if (length < 2) length = 2; }
        int weight = 2;
        if (s->n8_w >= 2 && s->n8_w <= cand_w) {
            int inc = -s->max_row_offset + row_offset + 1;
            int bh = w->g_bh4[idx];
            if (bh < inc) inc = bh;
            if (inc > weight) weight = inc;
            s->processed_rows = inc - row_offset - 1;
        }
        if (cm_pair_at(s, idx)) found = 1;
        cm_add(s, r, c, length, weight);
        i += length;
    }
    if (found) s->row_match++;
}

static void cm_scan_col(CompMv *s, int col_offset) {
    const Walk *w = s->w;
    int end_mi = s->n8_h;
    if (w->mi_rows - s->mi_row < end_mi) end_mi = w->mi_rows - s->mi_row;
    if (end_mi > 16) end_mi = 16;
    int aco = col_offset < 0 ? -col_offset : col_offset;
    int row_off = 0;
    if (aco > 1) {
        row_off = 1;
        if ((s->mi_row & 1) && s->n8_h < 2) row_off -= 1;
    }
    int use_step_16 = s->n8_h >= 16;
    int i = 0, found = 0;
    while (i < end_mi) {
        int r = s->mi_row + row_off + i, c = s->mi_col + col_offset;
        if (r >= w->mi_rows) break;
        int idx = r * w->mi_cols + c;
        int cand_h = w->g_bh4[idx];
        int length = s->n8_h < cand_h ? s->n8_h : cand_h;
        if (use_step_16) { if (length < 4) length = 4; }
        else if (aco > 1) { if (length < 2) length = 2; }
        int weight = 2;
        if (s->n8_h >= 2 && s->n8_h <= cand_h) {
            int inc = -s->max_col_offset + col_offset + 1;
            int bw = w->g_bw4[idx];
            if (bw < inc) inc = bw;
            if (inc > weight) weight = inc;
            s->processed_cols = inc - col_offset - 1;
        }
        if (cm_pair_at(s, idx)) found = 1;
        cm_add(s, r, c, length, weight);
        i += length;
    }
    if (found) s->col_match++;
}

static void cm_scan_blk(CompMv *s, int ro, int co) {
    const Walk *w = s->w;
    int r = s->mi_row + ro, c = s->mi_col + co;
    if (r < w->tile_r0 || c < w->tile_c0 || r >= w->tile_r1 || c >= w->tile_c1)
        return;
    int found = cm_pair_at(s, r * w->mi_cols + c);
    cm_add(s, r, c, 2, 2);
    if (found) s->row_match++;
}

static void comp_mv_list(const Walk *w, int mi_row, int mi_col, int n8_w,
                         int n8_h, int rf0, int rf1, int gm0r, int gm0c,
                         int *s0r, int *s0c, int *s1r, int *s1c, int *st_w,
                         int *p_mode_ctx, int *p_refmv_count, int *p_nstack) {
    CompMv s;
    memset(&s, 0, sizeof s);
    s.w = w; s.mi_row = mi_row; s.mi_col = mi_col;
    s.n8_w = n8_w; s.n8_h = n8_h; s.rf0 = rf0; s.rf1 = rf1;
    s.gm0r = gm0r; s.gm0c = gm0c; s.gm1r = 0; s.gm1c = 0;
    int up_avail = mi_row > w->tile_r0;
    int left_avail = mi_col > w->tile_c0;
    int row_adj = (n8_h < 2) && (mi_row & 1);
    int col_adj = (n8_w < 2) && (mi_col & 1);
    if (up_avail) {
        s.max_row_offset = (n8_h < 2 ? -4 : -6) + row_adj;
        int lo = w->tile_r0 - mi_row, hi = w->tile_r1 - mi_row - 1;
        if (s.max_row_offset < lo) s.max_row_offset = lo;
        if (s.max_row_offset > hi) s.max_row_offset = hi;
    }
    if (left_avail) {
        s.max_col_offset = (n8_w < 2 ? -4 : -6) + col_adj;
        int lo = w->tile_c0 - mi_col, hi = w->tile_c1 - mi_col - 1;
        if (s.max_col_offset < lo) s.max_col_offset = lo;
        if (s.max_col_offset > hi) s.max_col_offset = hi;
    }
    if (s.max_row_offset) cm_scan_row(&s, -1);
    if (s.max_col_offset) cm_scan_col(&s, -1);
    if (rm_has_tr(mi_row, mi_col, n8_w, n8_h)) cm_scan_blk(&s, -1, n8_w);

    int nearest_match = (s.row_match > 0) + (s.col_match > 0);
    int nearest_newmv = s.newmv_count;
    for (int i = 0; i < s.count; i++) s.wt[i] += 640;

    int tpl_zero = 0;
    if (w->use_ref_frame_mvs)
        tpl_zero = tpl_scan(w, mi_row, mi_col, n8_w, n8_h, rf0, rf1,
                            gm0r, gm0c, 0, 0, &s, cm_tpl_add);

    cm_scan_blk(&s, -1, -1);
    for (int idx = 2; idx <= 3; idx++) {
        int ro = -(idx << 1) + 1 + row_adj;
        int co = -(idx << 1) + 1 + col_adj;
        int aro = ro < 0 ? -ro : ro;
        int amro = s.max_row_offset < 0 ? -s.max_row_offset : s.max_row_offset;
        int aco = co < 0 ? -co : co;
        int amco = s.max_col_offset < 0 ? -s.max_col_offset : s.max_col_offset;
        if (aro <= amro && aro > s.processed_rows) cm_scan_row(&s, ro);
        if (aco <= amco && aco > s.processed_cols) cm_scan_col(&s, co);
    }
    s.newmv_count = nearest_newmv;

    int mode_ctx = tpl_zero << 3;     /* ZeroMvContext (GLOBALMV_OFFSET) */
    int ref_match = (s.row_match > 0) + (s.col_match > 0);
    if (nearest_match == 0) {
        if (ref_match >= 1) mode_ctx |= 1;
        if (ref_match == 1) mode_ctx |= 1 << 4;
        else if (ref_match >= 2) mode_ctx |= 2 << 4;
    } else if (nearest_match == 1) {
        mode_ctx |= nearest_newmv > 0 ? 2 : 3;
        if (ref_match == 1) mode_ctx |= 3 << 4;
        else if (ref_match >= 2) mode_ctx |= 4 << 4;
    } else {
        mode_ctx |= nearest_newmv >= 1 ? 4 : 5;
        mode_ctx |= 5 << 4;
    }

    int ord[10];
    for (int i = 0; i < s.count; i++) ord[i] = i;
    for (int i = 1; i < s.count; i++) {
        int k = ord[i], j = i - 1;
        while (j >= 0 && s.wt[ord[j]] < s.wt[k]) { ord[j + 1] = ord[j]; j--; }
        ord[j + 1] = k;
    }
    int n = s.count;
    for (int i = 0; i < n; i++) {
        s0r[i] = s.m0r[ord[i]]; s0c[i] = s.m0c[ord[i]];
        s1r[i] = s.m1r[ord[i]]; s1c[i] = s.m1c[ord[i]];
        st_w[i] = s.wt[ord[i]];
    }

    int refmv_count = n;
    if (refmv_count < 2) {
        /* scan_row_col_light compound branch */
        int mi_w = n8_w < 16 ? n8_w : 16;
        if (w->mi_cols - mi_col < mi_w) mi_w = w->mi_cols - mi_col;
        int mi_h = n8_h < 16 ? n8_h : 16;
        if (w->mi_rows - mi_row < mi_h) mi_h = w->mi_rows - mi_row;
        int mi_size = mi_w < mi_h ? mi_w : mi_h;
        int id_r[2][2], id_c[2][2], df_r[2][2], df_c[2][2];
        int idn[2] = {0, 0}, dfn[2] = {0, 0};
        int rfp[2] = {rf0, rf1};
        for (int pass = 0; pass < 2; pass++) {
            int have = pass == 0 ? (s.max_row_offset ? 1 : 0)
                                 : (s.max_col_offset ? 1 : 0);
            if (!have) continue;
            int i = 0;
            while (i < mi_size) {
                int r = pass == 0 ? mi_row - 1 : mi_row + i;
                int c = pass == 0 ? mi_col + i : mi_col - 1;
                int idx = r * w->mi_cols + c;
                int rfs[2] = {w->g_ref[idx], w->g_ref2 ? w->g_ref2[idx] : 0};
                int mrs[2] = {w->g_mvr[idx], w->g_mv2r ? w->g_mv2r[idx] : 0};
                int mcs[2] = {w->g_mvc[idx], w->g_mv2c ? w->g_mv2c[idx] : 0};
                for (int t = 0; t < 2; t++)
                    for (int side = 0; side < 2; side++) {
                        if (rfs[t] == rfp[side] && idn[side] < 2) {
                            id_r[side][idn[side]] = mrs[t];
                            id_c[side][idn[side]] = mcs[t];
                            idn[side]++;
                        } else if (rfs[t] > 0 && dfn[side] < 2) {
                            /* spec 7.10.2.13: sign-bias mismatch negates */
                            int fl = w->sign_bias[rfs[t]]
                                     != w->sign_bias[rfp[side]];
                            df_r[side][dfn[side]] = fl ? -mrs[t] : mrs[t];
                            df_c[side][dfn[side]] = fl ? -mcs[t] : mcs[t];
                            dfn[side]++;
                        }
                    }
                i += pass == 0 ? w->g_bw4[idx] : w->g_bh4[idx];
            }
        }
        int cl_r[3][2], cl_c[3][2];
        for (int side = 0; side < 2; side++) {
            int k = 0;
            for (int li = 0; li < idn[side] && k < 2; li++, k++) {
                cl_r[k][side] = id_r[side][li]; cl_c[k][side] = id_c[side][li];
            }
            for (int li = 0; li < dfn[side] && k < 2; li++, k++) {
                cl_r[k][side] = df_r[side][li]; cl_c[k][side] = df_c[side][li];
            }
            for (; k < 2; k++) {
                cl_r[k][side] = side == 0 ? gm0r : 0;
                cl_c[k][side] = side == 0 ? gm0c : 0;
            }
        }
        if (refmv_count) {   /* == 1 */
            int pick = (cl_r[0][0] == s0r[0] && cl_c[0][0] == s0c[0]
                        && cl_r[0][1] == s1r[0] && cl_c[0][1] == s1c[0]) ? 1 : 0;
            s0r[1] = cl_r[pick][0]; s0c[1] = cl_c[pick][0];
            s1r[1] = cl_r[pick][1]; s1c[1] = cl_c[pick][1];
            st_w[1] = 2;
            refmv_count = 2; n = 2;
        } else {
            for (int k = 0; k < 2; k++) {
                s0r[k] = cl_r[k][0]; s0c[k] = cl_c[k][0];
                s1r[k] = cl_r[k][1]; s1c[k] = cl_c[k][1];
                st_w[k] = 2;
            }
            refmv_count = 2; n = 2;
        }
    }

    int bw_px = n8_w * 4, bh_px = n8_h * 4;
    int lo_c = -(mi_col * 4) * 8 - bw_px * 8 - 128;
    int hi_c = (w->mi_cols - n8_w - mi_col) * 32 + bw_px * 8 + 128;
    int lo_r = -(mi_row * 4) * 8 - bh_px * 8 - 128;
    int hi_r = (w->mi_rows - n8_h - mi_row) * 32 + bh_px * 8 + 128;
    for (int i = 0; i < n; i++) {
        if (s0r[i] < lo_r) s0r[i] = lo_r;
        if (s0r[i] > hi_r) s0r[i] = hi_r;
        if (s0c[i] < lo_c) s0c[i] = lo_c;
        if (s0c[i] > hi_c) s0c[i] = hi_c;
        if (s1r[i] < lo_r) s1r[i] = lo_r;
        if (s1r[i] > hi_r) s1r[i] = hi_r;
        if (s1c[i] < lo_c) s1c[i] = lo_c;
        if (s1c[i] > hi_c) s1c[i] = hi_c;
    }
    *p_mode_ctx = mode_ctx;
    *p_refmv_count = refmv_count;
    *p_nstack = n;
}

static int comp_mode_ctx_analyzer(int mode_ctx) {
    static const int MAP[3][5] = {{0, 1, 1, 1, 1}, {1, 2, 3, 4, 4},
                                  {4, 4, 5, 6, 7}};
    int newmv_ctx = mode_ctx & 7;
    int refmv_ctx = (mode_ctx >> 4) & 15;
    return MAP[refmv_ctx >> 1][newmv_ctx < 4 ? newmv_ctx : 4];
}

/* ---- compound syntax (mirror of inter_encoder._write_comp_*) ---- */
static void comp_neighbor(const Walk *w, int r, int c, int avail, int *inter,
                          int *has2, int *ref0) {
    if (!avail) { *inter = -1; return; }
    int idx = r * w->mi_cols + c;
    *inter = w->g_ref[idx] > 0;
    *has2 = w->g_ref2 && w->g_ref2[idx] > 0;
    *ref0 = w->g_ref[idx];
}

static void write_comp_inter(Walk *w, int mi_row, int mi_col, int is_comp) {
    int ai, a2 = 0, ar = 0, li, l2 = 0, lr = 0;
    comp_neighbor(w, mi_row - 1, mi_col, mi_row > w->tile_r0, &ai, &a2, &ar);
    comp_neighbor(w, mi_row, mi_col - 1, mi_col > w->tile_c0, &li, &l2, &lr);
    int ctx;
#define BWD(rf) ((rf) >= 5)
    if (ai >= 0 && li >= 0) {
        if (!a2 && !l2) ctx = BWD(ar) ^ BWD(lr);
        else if (!a2) ctx = 2 + (BWD(ar) || !ai);
        else if (!l2) ctx = 2 + (BWD(lr) || !li);
        else ctx = 4;
    } else if (ai >= 0 || li >= 0) {
        int e2 = ai >= 0 ? a2 : l2, er = ai >= 0 ? ar : lr;
        ctx = e2 ? 3 : BWD(er);
    } else
        ctx = 1;
    ec_symbol(w->enc, is_comp, w->cdf_comp_inter + ctx * 3, 2, w->adapt);
}

static void neighbor_counts2(const Walk *w, int mi_row, int mi_col,
                             int *counts) {
    for (int k = 0; k < 8; k++) counts[k] = 0;
    int has_a = mi_row > w->tile_r0, has_l = mi_col > w->tile_c0;
    int rcs[2][2] = {{mi_row - 1, mi_col}, {mi_row, mi_col - 1}};
    int ok[2] = {has_a, has_l};
    for (int t = 0; t < 2; t++) {
        if (!ok[t]) continue;
        int idx = rcs[t][0] * w->mi_cols + rcs[t][1];
        if (w->g_ref[idx] > 0) {
            counts[w->g_ref[idx]]++;
            if (w->g_ref2 && w->g_ref2[idx] > 0) counts[w->g_ref2[idx]]++;
        }
    }
}

static void write_comp_refs(Walk *w, int mi_row, int mi_col) {
    int ai, a2 = 0, ar = 0, li, l2 = 0, lr = 0;
    comp_neighbor(w, mi_row - 1, mi_col, mi_row > w->tile_r0, &ai, &a2, &ar);
    comp_neighbor(w, mi_row, mi_col - 1, mi_col > w->tile_c0, &li, &l2, &lr);
    int ctx_t;
    if (ai >= 0 && li >= 0) {
        if (!ai && !li) ctx_t = 2;
        else if (!ai || !li) ctx_t = (!ai ? l2 : a2) ? 1 : 2;
        else if (!a2 && !l2) ctx_t = 1 + 2 * !(BWD(ar) ^ BWD(lr));
        else if (!a2 || !l2) ctx_t = 1;
        else ctx_t = 0;
    } else if (ai >= 0 || li >= 0) {
        int ei = ai >= 0 ? ai : li, e2 = ai >= 0 ? a2 : l2;
        ctx_t = !ei ? 2 : (e2 ? 0 : 2);
    } else
        ctx_t = 2;
#undef BWD
    ec_symbol(w->enc, 1, w->cdf_comp_ref_type + ctx_t * 3, 2, w->adapt);
    int counts[8];
    neighbor_counts2(w, mi_row, mi_col, counts);
    int ll2 = counts[1] + counts[2], l3g = counts[3] + counts[4];
    int ctx0 = ll2 == l3g ? 1 : (ll2 < l3g ? 0 : 2);
    ec_symbol(w->enc, 0, w->cdf_comp_ref + (ctx0 * 3 + 0) * 3, 2, w->adapt);
    int ctx1 = counts[1] == counts[2] ? 1 : (counts[1] < counts[2] ? 0 : 2);
    ec_symbol(w->enc, 0, w->cdf_comp_ref + (ctx1 * 3 + 1) * 3, 2, w->adapt);
    int brf = counts[5] + counts[6], arf = counts[7];
    int ctxb = brf == arf ? 1 : (brf < arf ? 0 : 2);
    ec_symbol(w->enc, 1, w->cdf_comp_bwdref + (ctxb * 2 + 0) * 3, 2, w->adapt);
}

/* ---- feature syntax contexts (mirror of inter_encoder helpers) ---- */
/* av1_get_pred_context_switchable_interp (dir 0, dual off) */
static int switchable_filter_ctx_c(const Walk *w, int mi_row, int mi_col,
                                   int ref, int is_comp) {
    int left = 3, above = 3;
    if (mi_col > w->tile_c0) {
        int idx = mi_row * w->mi_cols + mi_col - 1;
        if (w->g_ref[idx] > 0
            && (w->g_ref[idx] == ref
                || (w->g_ref2 && w->g_ref2[idx] == ref))) {
            int f = w->g_filt ? w->g_filt[idx] : 0;
            left = f < 3 ? f : 0;
        }
    }
    if (mi_row > w->tile_r0) {
        int idx = (mi_row - 1) * w->mi_cols + mi_col;
        if (w->g_ref[idx] > 0
            && (w->g_ref[idx] == ref
                || (w->g_ref2 && w->g_ref2[idx] == ref))) {
            int f = w->g_filt ? w->g_filt[idx] : 0;
            above = f < 3 ? f : 0;
        }
    }
    int ctx = is_comp ? 4 : 0;   /* INTER_FILTER_COMP_OFFSET */
    if (left == above) ctx += left;
    else if (left == 3) ctx += above;
    else if (above == 3) ctx += left;
    else ctx += 3;
    return ctx;
}

/* get_comp_group_idx_context: neighbor comp_group flags (ALTREF single
   neighbors count 3), capped at 5 */
static int comp_group_ctx_c(const Walk *w, int mi_row, int mi_col) {
    int ctx = 0;
    if (mi_row > w->tile_r0) {
        int idx = (mi_row - 1) * w->mi_cols + mi_col;
        if (w->g_ref2 && w->g_ref2[idx] > 0)
            ctx += w->g_comp_group ? w->g_comp_group[idx] : 0;
        else if (w->g_ref[idx] == 7) ctx += 3;
    }
    if (mi_col > w->tile_c0) {
        int idx = mi_row * w->mi_cols + mi_col - 1;
        if (w->g_ref2 && w->g_ref2[idx] > 0)
            ctx += w->g_comp_group ? w->g_comp_group[idx] : 0;
        else if (w->g_ref[idx] == 7) ctx += 3;
    }
    return ctx < 5 ? ctx : 5;
}

/* =========================== OBMC (mirror of codec/obmc.py) ========== */
static const int32_t OBMC_W1[1] = {64};
static const int32_t OBMC_W2[2] = {45, 64};
static const int32_t OBMC_W4[4] = {39, 50, 59, 64};
static const int32_t OBMC_W8[8] = {36, 42, 48, 53, 57, 61, 64, 64};
static const int32_t OBMC_W16[16] = {34, 37, 40, 43, 46, 49, 52, 54, 56, 58,
                                     60, 61, 64, 64, 64, 64};
static const int32_t OBMC_W32[32] = {33, 35, 36, 38, 40, 41, 43, 44, 45, 47,
                                     48, 50, 51, 52, 53, 55, 56, 57, 58, 59,
                                     60, 60, 61, 62, 64, 64, 64, 64, 64, 64,
                                     64, 64};
static const int32_t *obmc_mask_of(int l) {
    switch (l) {
        case 1: return OBMC_W1;
        case 2: return OBMC_W2;
        case 4: return OBMC_W4;
        case 8: return OBMC_W8;
        case 16: return OBMC_W16;
        default: return OBMC_W32;
    }
}
/* max_neighbor_obmc[mi_size_wide_log2] */
static const int OBMC_NB_MAX[6] = {0, 1, 2, 3, 4, 4};

typedef struct { int pos, len_mi, nb; } ObmcNb;

static int obmc_above_nbs(const Walk *w, int mi_row, int mi_col, int n4_w,
                          ObmcNb *out) {
    if (mi_row <= w->tile_r0) return 0;
    int lg = 0; while ((1 << lg) < n4_w) lg++;
    int nb_max = OBMC_NB_MAX[lg < 5 ? lg : 5];
    int end_col = mi_col + n4_w < w->mi_cols ? mi_col + n4_w : w->mi_cols;
    int c = mi_col, count = 0;
    while (c < end_col && count < nb_max) {
        int nbc = c;
        int step = w->g_bw4[(mi_row - 1) * w->mi_cols + c];
        if (step > 16) step = 16;
        if (step == 1) { c &= ~1; nbc = c + 1; step = 2; }
        if (w->g_ref[(mi_row - 1) * w->mi_cols + nbc] > 0) {
            out[count].pos = c;
            out[count].len_mi = n4_w < step ? n4_w : step;
            out[count].nb = nbc;
            count++;
        }
        c += step;
    }
    return count;
}

static int obmc_left_nbs(const Walk *w, int mi_row, int mi_col, int n4_h,
                         ObmcNb *out) {
    if (mi_col <= w->tile_c0) return 0;
    int lg = 0; while ((1 << lg) < n4_h) lg++;
    int nb_max = OBMC_NB_MAX[lg < 5 ? lg : 5];
    int end_row = mi_row + n4_h < w->mi_rows ? mi_row + n4_h : w->mi_rows;
    int r = mi_row, count = 0;
    while (r < end_row && count < nb_max) {
        int nbr = r;
        int step = w->g_bh4[r * w->mi_cols + mi_col - 1];
        if (step > 16) step = 16;
        if (step == 1) { r &= ~1; nbr = r + 1; step = 2; }
        if (w->g_ref[r * w->mi_cols + mi_col - 1] > 0) {
            out[count].pos = r;
            out[count].len_mi = n4_h < step ? n4_h : step;
            out[count].nb = nbr;
            count++;
        }
        r += step;
    }
    return count;
}

static int obmc_eligible_c(const Walk *w, int mi_row, int mi_col, int W,
                           int H, int is_comp) {
    /* motion_mode_allowed == OBMC_CAUSAL; gm_wm (warp) frames never walk
       natively, so the is_global_mv_block exclusion is vacuous here */
    if (!w->motion_mode_switchable || is_comp) return 0;
    if ((W < H ? W : H) < 8) return 0;
    ObmcNb nbs[4];
    return obmc_above_nbs(w, mi_row, mi_col, W >> 2, nbs) > 0
        || obmc_left_nbs(w, mi_row, mi_col, H >> 2, nbs) > 0;
}

/* svt_av1_skip_u4x4_pred_in_obmc: the ABOVE pass skips chroma when the
   chroma block is 4x4/8x4/4x8 */
static int obmc_skip_chroma_above(int W, int H) {
    int cw = W >> 1 > 4 ? W >> 1 : 4, ch = H >> 1 > 4 ? H >> 1 : 4;
    return (cw == 4 && ch == 4) || (cw == 8 && ch == 4)
        || (cw == 4 && ch == 8);
}

/* blend neighbor-motion predictions into the block preds (in place).
   preds[p] = block-sized buffers (or NULL to skip the plane); mirrors
   obmc.build_obmc_preds. */
static void obmc_apply(const Walk *w, int mi_row, int mi_col, int W, int H,
                       uint16_t *preds[3]) {
    int n4_w = W >> 2, n4_h = H >> 2;
    ObmcNb nbs[4];
    uint16_t tmp[64 * 64];
    int skip_ca = obmc_skip_chroma_above(W, H);
    int overlap_v = (H < 64 ? H : 64) >> 1;
    int na = obmc_above_nbs(w, mi_row, mi_col, n4_w, nbs);
    for (int i = 0; i < na; i++) {
        int idx = (mi_row - 1) * w->mi_cols + nbs[i].nb;
        int mvr = w->g_mvr[idx], mvc = w->g_mvc[idx];
        int ref = w->g_ref[idx];
        int nf = w->g_filt ? w->g_filt[idx] : 0;
        if (nf >= 3) nf = 0;
        int ref_idx = ref_to_idx(w, ref);
        for (int p = 0; p < w->nplanes; p++) {
            if (!preds[p]) continue;
            if (p > 0 && skip_ca) continue;
            int ss = p ? 1 : 0;
            int bw = (nbs[i].len_mi * 4) >> ss;
            int bh = overlap_v >> ss;
            int px = (nbs[i].pos * 4) >> ss;
            int py = (mi_row * 4) >> ss;
            mc_pred_plane_f(w, ref_idx, p, px, py, bw, bh, mvr, mvc, nf, tmp);
            int bW = (p ? (W >> 1 > 4 ? W >> 1 : 4) : W);
            int ox = px - ((mi_col * 4) >> ss);
            const int32_t *m = obmc_mask_of(bh);
            uint16_t *dst = preds[p];
            for (int y = 0; y < bh; y++)
                for (int x = 0; x < bw; x++) {
                    uint16_t *d = dst + y * bW + ox + x;
                    *d = (uint16_t)((m[y] * (int32_t)*d
                                     + (64 - m[y]) * (int32_t)tmp[y * bw + x]
                                     + 32) >> 6);
                }
        }
    }
    int overlap_h = (W < 64 ? W : 64) >> 1;
    int nl = obmc_left_nbs(w, mi_row, mi_col, n4_h, nbs);
    for (int i = 0; i < nl; i++) {
        int idx = nbs[i].nb * w->mi_cols + mi_col - 1;
        int mvr = w->g_mvr[idx], mvc = w->g_mvc[idx];
        int ref = w->g_ref[idx];
        int nf = w->g_filt ? w->g_filt[idx] : 0;
        if (nf >= 3) nf = 0;
        int ref_idx = ref_to_idx(w, ref);
        for (int p = 0; p < w->nplanes; p++) {
            if (!preds[p]) continue;
            int ss = p ? 1 : 0;
            int bw = overlap_h >> ss;
            int bh = (nbs[i].len_mi * 4) >> ss;
            int px = (mi_col * 4) >> ss;
            int py = (nbs[i].pos * 4) >> ss;
            mc_pred_plane_f(w, ref_idx, p, px, py, bw, bh, mvr, mvc, nf, tmp);
            int bW = (p ? (W >> 1 > 4 ? W >> 1 : 4) : W);
            int oy = py - ((mi_row * 4) >> ss);
            const int32_t *m = obmc_mask_of(bw);
            uint16_t *dst = preds[p];
            for (int y = 0; y < bh; y++)
                for (int x = 0; x < bw; x++) {
                    uint16_t *d = dst + (oy + y) * bW + x;
                    *d = (uint16_t)((m[x] * (int32_t)*d
                                     + (64 - m[x]) * (int32_t)tmp[y * bw + x]
                                     + 32) >> 6);
                }
        }
    }
}

/* ===== feature-aware prediction builder (shared by the walk and the
   precommit): build the final luma/chroma predictions for one decided
   inter leaf from the decision + feature maps. II intra components read
   the recon planes (walk-time closed loop). ===== */
typedef struct {
    int filt, mm, ii, iiw, ctype, widx, wsign;
} Feats;

static void read_feats(const Walk *w, int mi, Feats *f) {
    f->filt = w->d_filt ? w->d_filt[mi] : 0;
    f->mm = w->d_mm ? w->d_mm[mi] : 0;
    f->ii = w->d_ii ? w->d_ii[mi] - 1 : -1;     /* -1 = none */
    f->iiw = w->d_iiw ? w->d_iiw[mi] - 1 : -1;
    f->ctype = w->d_ctype ? w->d_ctype[mi] : 0;
    f->widx = w->d_widx ? w->d_widx[mi] : 0;
    f->wsign = w->d_wsign ? w->d_wsign[mi] : 0;
}

static const int II_TO_INTRA_C[4] = {0, 1, 2, 9};

/* build the prediction for one plane of an inter leaf (no OBMC — OBMC is
   applied by the caller after every plane's pred exists) */
static void build_inter_pred_plane(const Walk *w, int plane, int x0, int y0,
                                   int W, int H, int is_comp,
                                   int ref_idx, int mvr, int mvc, int mv2r,
                                   int mv2c, const Feats *f, int luma_size,
                                   uint16_t *out) {
    if (is_comp && f->ctype > 0) {
        int32_t b0[64 * 64], b1[64 * 64];
        jnt_bufs(w, plane, x0, y0, W, H, mvr, mvc, mv2r, mv2c, f->filt,
                 b0, b1);
        int32_t mbuf[64 * 64];
        const int32_t *mask;
        int mstride;
        if (f->ctype == 1) {            /* wedge */
            const int32_t *lm = wedge_mask_c(w, luma_size, f->widx, f->wsign);
            if (plane == 0) { mask = lm; mstride = W; }
            else {
                subsample_mask_c(lm, luma_size, luma_size, mbuf);
                mask = mbuf; mstride = luma_size / 2;
            }
        } else {                        /* diffwtd */
            if (plane == 0) {
                diffwtd_mask_c(w, b0, b1, W * H, f->widx, mbuf);
            } else {
                /* chroma uses the subsampled LUMA-derived mask */
                int32_t lb0[64 * 64], lb1[64 * 64], lmask[64 * 64];
                jnt_bufs(w, 0, x0 << 1, y0 << 1, luma_size, luma_size,
                         mvr, mvc, mv2r, mv2c, f->filt, lb0, lb1);
                diffwtd_mask_c(w, lb0, lb1, luma_size * luma_size, f->widx,
                               lmask);
                subsample_mask_c(lmask, luma_size, luma_size, mbuf);
            }
            mask = mbuf; mstride = W;
        }
        blend_d16_c(w, b0, b1, mask, mstride, W, H, out);
    } else if (is_comp) {
        mc_pred_compound_f(w, plane, x0, y0, W, H, mvr, mvc, mv2r, mv2c,
                           f->filt, out);
    } else {
        mc_pred_plane_f(w, ref_idx, plane, x0, y0, W, H, mvr, mvc, f->filt,
                        out);
    }
    if (f->ii >= 0 && !is_comp) {
        int32_t ab[1 + 128 + 128], lb[1 + 128 + 128];
        int ha, hl;
        gather_neighbors(w, plane, x0, y0, W, H, ab, lb, &ha, &hl);
        uint16_t ip[64 * 64];
        predict_mode(w, II_TO_INTRA_C[f->ii], ab, lb, ha, hl, W, H, ip);
        int32_t mbuf[64 * 64];
        if (f->iiw >= 0) {
            const int32_t *lm = wedge_mask_c(w, luma_size, f->iiw, 0);
            if (plane == 0) {
                ii_blend_c(out, ip, lm, W * H);
                return;
            }
            subsample_mask_c(lm, luma_size, luma_size, mbuf);
        } else {
            ii_mask_c(w, f->ii, W, H, mbuf);
        }
        ii_blend_c(out, ip, mbuf, W * H);
    }
}

/* ---- the P-frame block (mirror of inter_encoder._encode_block on the
   decided path: decisions from the native pre-pass, MC or closed-loop
   intra prediction, DCT-only transforms, inter syntax) ---- */
static void encode_block_inter(Walk *w, int mi_row, int mi_col, int bsize,
                               int sb_r, int sb_c) {
    int W = BW[bsize], H = BH[bsize];
    int x0 = mi_col * 4, y0 = mi_row * 4;
    int bw4 = W >> 2, bh4 = H >> 2;
    int mi = mi_row * w->mi_cols + mi_col;
    int ref = w->d_ref[mi];                  /* 0 intra, 1 LAST, 4 GOLDEN */
    int mode = w->d_mode[mi];
    int mvr = w->d_mvr[mi], mvc = w->d_mvc[mi];
    int use_inter = ref > 0;
    int is_comp = use_inter && mode >= 17;
    int mv2r = is_comp && w->d_mvr2 ? w->d_mvr2[mi] : 0;
    int mv2c = is_comp && w->d_mvc2 ? w->d_mvc2[mi] : 0;
    int ref_idx = ref_to_idx(w, ref);
    Feats ft = {0, 0, -1, -1, 0, 0, 0};
    if (use_inter) read_feats(w, mi, &ft);

    PlaneRes res[3];
    int nres = 1;
    PlaneRes *ry = &res[0];
    ry->plane = 0; ry->px = x0; ry->py = y0; ry->pw = W; ry->ph = H;
    ry->tx_size = MAX_TX[bsize];
    /* luma TX type from the pre-pass search (qindex 0 codes none) */
    int tt_y = (use_inter && w->d_txt && w->qindex > 0) ? w->d_txt[mi] : 0;
    if (SQR_UP[ry->tx_size] > 3) tt_y = 0;
    ry->tx_type = tt_y;
    /* device-precomputed leaf (ops/commit.py)? */
    int pslot = (w->pre_slot && use_inter) ? w->pre_slot[mi] - 1 : -1;
    if (pslot >= 0) {
        ry->pre = 1;
        ry->sub = 0;
        ry->pre_qc_p = w->pre_qc + w->pre_off[pslot * 3];
        ry->eob = w->pre_eob[pslot * 3];
    } else if (use_inter) {
        build_inter_pred_plane(w, 0, x0, y0, W, H, is_comp, ref_idx,
                               mvr, mvc, mv2r, mv2c, &ft, W, ry->pred);
    } else {
        int32_t ab[1 + 128 + 128], lb[1 + 128 + 128];
        int ha, hl;
        gather_neighbors(w, 0, x0, y0, W, H, ab, lb, &ha, &hl);
        predict_mode(w, mode, ab, lb, ha, hl, W, H, ry->pred);
    }

    int has_uv = w->nplanes > 1;
    int cfl_allowed = W <= 32 && H <= 32;
    if (has_uv) {
        int uv_w = W >> 1 > 4 ? W >> 1 : 4, uv_h = H >> 1 > 4 ? H >> 1 : 4;
        int tx_uv = MAX_TX[bsize_of(uv_w, uv_h)];
        int cw = W >> 1, ch = H >> 1;
        int cx = x0 >> 1, cy = y0 >> 1;
        for (int pl = 1; pl <= 2; pl++) {
            PlaneRes *r = &res[nres++];
            r->plane = pl; r->px = cx; r->py = cy; r->pw = cw; r->ph = ch;
            r->tx_size = tx_uv;
            r->tx_type = 0;      /* finalized after the luma quantize */
            if (pslot >= 0) {
                r->pre = 1;
                r->sub = 0;
                r->pre_qc_p = w->pre_qc + w->pre_off[pslot * 3 + pl];
                r->eob = w->pre_eob[pslot * 3 + pl];
                continue;
            }
            if (use_inter) {
                build_inter_pred_plane(w, pl, cx, cy, cw, ch, is_comp,
                                       ref_idx, mvr, mvc, mv2r, mv2c, &ft, W,
                                       r->pred);
            } else {
                int32_t ab[1 + 64 + 64], lb[1 + 64 + 64];
                int ha, hl;
                gather_neighbors(w, pl, cx, cy, cw, ch, ab, lb, &ha, &hl);
                predict_mode(w, 0, ab, lb, ha, hl, cw, ch, r->pred);
            }
        }
    }

    /* OBMC blends every plane's pred before any transform runs */
    if (ft.mm && pslot < 0) {
        uint16_t *preds[3] = {res[0].pred, 0, 0};
        if (has_uv) { preds[1] = res[1].pred; preds[2] = res[2].pred; }
        obmc_apply(w, mi_row, mi_col, W, H, preds);
    }

    /* var-tx: split this leaf's luma tx one depth when the pre-pass
       search decided it (TX_MODE_SELECT; perform_tx_partitioning,
       product_coding_loop.c:5307) */
    int split = (w->tx_mode_select && use_inter && pslot < 0
                 && w->qindex > 0 && w->d_txsplit && w->d_txsplit[mi]
                 && ry->tx_size != 0);
    PlaneRes kids[4];
    int nkids = 0;
    if (pslot < 0) {
        if (!split) {
            run_plane_rdoq(w, ry, sb_r, sb_c, w->rdoq_fast && use_inter);
        } else {
            int stx = SUB_TX[ry->tx_size];
            int cw2 = TXW[stx], ch2 = TXH[stx];
            for (int sy = 0; sy < H; sy += ch2)
                for (int sx = 0; sx < W; sx += cw2) {
                    if (x0 + sx >= w->pw[0] || y0 + sy >= w->ph[0])
                        continue;   /* decoder skips out-of-frame txbs */
                    PlaneRes *k = &kids[nkids++];
                    k->plane = 0;
                    k->px = x0 + sx; k->py = y0 + sy;
                    k->pw = cw2; k->ph = ch2;
                    k->tx_size = stx;
                    k->tx_type = tt_y;
                    for (int yy = 0; yy < ch2; yy++)
                        memcpy(k->pred + yy * cw2,
                               ry->pred + (sy + yy) * W + sx,
                               cw2 * sizeof(uint16_t));
                    run_plane_rdoq(w, k, sb_r, sb_c,
                                   w->rdoq_fast && use_inter);
                    k->sub = 1;
                }
            ry->eob = 0;   /* aggregate below; block-level res unused */
        }
    }
    int luma_tl_eob = split ? kids[0].eob : res[0].eob;
    for (int i = 1; i < nres; i++) {
        PlaneRes *r = &res[i];
        /* inter chroma inherits the luma type when in the chroma tx
           size's set (spec 5.11.40 compute_tx_type; the co-located luma
           4x4 is the block's top-left child) */
        int tt_uv = use_inter ? tt_y : 0;
        if (luma_tl_eob == 0) tt_uv = 0;  /* luma eob 0: stored type DCT */
        if (SQR_UP[r->tx_size] > 3) tt_uv = 0;
        else if (SQR_UP[r->tx_size] == 3 && tt_uv != 0 && tt_uv != 9)
            tt_uv = 0;
        r->tx_type = tt_uv;
        if (pslot < 0)
            run_plane_rdoq(w, r, sb_r, sb_c, w->rdoq_fast && use_inter);
    }

    int skip = 1;
    for (int i = split ? 1 : 0; i < nres; i++) if (res[i].eob) skip = 0;
    for (int i = 0; i < nkids; i++) if (kids[i].eob) skip = 0;
    if (split && skip) {
        /* all-zero children == all-zero block: revert to depth 0 so the
           DLF tx dims match the decoder's skip-inferred (max) tx. The
           stored type is the CHILD's (possibly outside the parent tx
           size's set); skip blocks are DCT (zero coeffs), so reset it. */
        split = 0;
        ry->pre = 0;
        ry->sub = 0;
        ry->eob = 0;
        ry->tx_type = 0;
        tt_y = 0;
    }

    /* MV stack (needed for inter syntax only) */
    int st_r[10], st_c[10], st_w[10], nstack = 0, mode_ctx = 0, refmv_count = 0;
    int s1r[10], s1c[10];
    if (is_comp) {
        comp_mv_list(w, mi_row, mi_col, bw4, bh4, 1, w->ref2_const,
                     w->gm_row, w->gm_col, st_r, st_c, s1r, s1c, st_w,
                     &mode_ctx, &refmv_count, &nstack);
    } else if (use_inter) {
        int gm_r = ref == 1 ? w->gm_row : 0;
        int gm_c = ref == 1 ? w->gm_col : 0;
        ref_mv_list(w, mi_row, mi_col, bw4, bh4, ref, gm_r, gm_c,
                    st_r, st_c, st_w, &mode_ctx, &refmv_count, &nstack);
    }
    /* NEWMV whose MV equals the stack head re-codes as NEARESTMV (same
     * prediction, no DRL/MV syntax); ditto NEW_NEWMV -> NEAREST_NEARESTMV */
    int near_idx = 0;    /* NEARMV DRL: 0 -> stack[1], 1 -> stack[2] */
    if (use_inter && !is_comp && mode == 16
        && mvr == st_r[0] && mvc == st_c[0])
        mode = 13;
    else if (use_inter && !is_comp && mode == 16 && refmv_count >= 2
             && nstack > 1 && mvr == st_r[1] && mvc == st_c[1])
        mode = 14;   /* NEARMV: RefMvIdx 1 via read_drl_idx */
    /* NOTE: converting NEWMV == stack[2] to NEARMV at DRL index 1 was
       measured NON-conformant (our stack beyond index 1 diverges from
       the decoder's on real GoPs); the writer below supports it once
       stack parity extends past index 1. */
    if (is_comp && mode == 24) {
        int m0 = mvr == st_r[0] && mvc == st_c[0];
        int m1 = mv2r == s1r[0] && mv2c == s1c[0];
        if (m0 && m1) mode = 17;        /* NEAREST_NEARESTMV: no syntax */
        else if (m0) mode = 19;         /* NEAREST_NEWMV: mv[1] only   */
        else if (m1) mode = 20;         /* NEW_NEARESTMV: mv[0] only   */
    }

    /* ---- skip-mode candidate (the reference evaluates skip_mode as an
       MD candidate, product_coding_loop.c): a zero-residual simple inter
       block trials the compound-NEAREST prediction on the skip pair; if
       that also quantizes to zero without raising luma distortion, ONE
       skip_mode bit replaces the whole block syntax.  Mirrors the Python
       walk's conversion bit-exactly. */
    if (w->skip_mode_present && W >= 8 && H >= 8 && skip && use_inter
        && !split
        && w->skip_ref0 == 1 && w->skip_ref1 == w->ref2_const
        && !(is_comp && mode == 17)
        && ft.ii < 0 && !ft.mm && ft.ctype == 0) {
        int c0r[10], c0c[10], c1r[10], c1c[10], cwt[10];
        int cmc_, crc_, cns_;
        comp_mv_list(w, mi_row, mi_col, bw4, bh4, 1, w->ref2_const,
                     w->gm_row, w->gm_col, c0r, c0c, c1r, c1c, cwt,
                     &cmc_, &crc_, &cns_);
        int smr = c0r[0], smc = c0c[0], sm2r = c1r[0], sm2c = c1c[0];
        static PlaneRes tr[3];   /* single-threaded walk: static is safe */
        int sm_zero = 1;
        for (int i = 0; i < nres && sm_zero; i++) {
            tr[i].plane = res[i].plane;
            tr[i].px = res[i].px; tr[i].py = res[i].py;
            tr[i].pw = res[i].pw; tr[i].ph = res[i].ph;
            tr[i].tx_size = res[i].tx_size;
            tr[i].tx_type = 0;
            mc_pred_compound(w, tr[i].plane, tr[i].px, tr[i].py, tr[i].pw,
                             tr[i].ph, smr, smc, sm2r, sm2c, tr[i].pred);
            run_plane_rdoq(w, &tr[i], sb_r, sb_c, 0);
            if (tr[i].eob) sm_zero = 0;
        }
        if (sm_zero) {
            /* luma SSE compare: decided pred (recompute for prefilled
               device leaves) vs the skip-mode pred */
            uint16_t curp[64 * 64];
            const uint16_t *cp = res[0].pred;
            if (pslot >= 0) {
                build_inter_pred_plane(w, 0, x0, y0, W, H, is_comp,
                                       ref_idx, mvr, mvc, mv2r, mv2c, &ft,
                                       W, curp);
                cp = curp;
            }
            const uint16_t *srcp = w->src[0];
            int ss = w->src_stride[0];
            long long d_cur = 0, d_sm = 0;
            for (int yy = 0; yy < H; yy++)
                for (int xx = 0; xx < W; xx++) {
                    int sv = srcp[(y0 + yy) * ss + x0 + xx];
                    long long a = sv - cp[yy * W + xx];
                    long long b = sv - tr[0].pred[yy * W + xx];
                    d_cur += a * a;
                    d_sm += b * b;
                }
            if (d_sm <= d_cur) {
                mode = 17; is_comp = 1;
                mvr = smr; mvc = smc; mv2r = sm2r; mv2c = sm2c;
                for (int i = 0; i < nres; i++) res[i] = tr[i];
                pslot = -1;
                ft.filt = 0;   /* skip-mode implies the REGULAR filter */
            }
        }
    }

    /* ---- syntax (order: skip_mode, skip, delta-q, is_inter, mode) */
    /* skip_mode (spec 5.11.27): one bit replaces the whole mode-info
       syntax for zero-residual NEAREST_NEARESTMV average-compound blocks
       on the frame's skip pair */
    int sm_coded = w->skip_mode_present && W >= 8 && H >= 8;
    int use_sm = sm_coded && skip && use_inter && is_comp && mode == 17
        && w->skip_ref0 == 1 && w->skip_ref1 == w->ref2_const
        && ft.filt == 0 && ft.ii < 0 && !ft.mm && ft.ctype == 0;
    if (sm_coded) {
        int above = mi_row > w->tile_r0
            ? w->mi_skip_mode[(mi_row - 1) * w->mi_cols + mi_col] : 0;
        int left = mi_col > w->tile_c0
            ? w->mi_skip_mode[mi_row * w->mi_cols + mi_col - 1] : 0;
        ec_symbol(w->enc, use_sm, w->cdf_skip_mode + (above + left) * 3, 2,
                  w->adapt);
    }
    if (!use_sm) {
        int above = mi_row > w->tile_r0 ? w->mi_skip[(mi_row - 1) * w->mi_cols + mi_col] : 0;
        int left = mi_col > w->tile_c0 ? w->mi_skip[mi_row * w->mi_cols + mi_col - 1] : 0;
        ec_symbol(w->enc, skip, w->cdf_skip + (above + left) * 3, 2, w->adapt);
    }
    if (w->sb_delta_pending && (mi_row & 15) == 0 && (mi_col & 15) == 0
        && (bsize != 12 || !skip))
        write_delta_q(w);
    if (!use_sm) write_is_inter(w, mi_row, mi_col, use_inter);
    if (use_sm) {
        /* everything else is inferred from the skip pair */
    } else if (use_inter) {
        if (w->ref_select && (W < H ? W : H) >= 8)
            write_comp_inter(w, mi_row, mi_col, is_comp);
        if (is_comp) {
            write_comp_refs(w, mi_row, mi_col);
            ec_symbol(w->enc, mode - 17,
                      w->cdf_comp_mode + comp_mode_ctx_analyzer(mode_ctx) * 9,
                      8, w->adapt);
            if (mode == 24) {   /* NEW_NEWMV */
                write_drl(w, st_w, nstack, refmv_count);
                write_mv(w, mvr, mvc, st_r[0], st_c[0]);
                write_mv(w, mv2r, mv2c, s1r[0], s1c[0]);
            } else if (mode == 19) {   /* NEAREST_NEWMV: no drl
                                          (entropy_coding.c:5074,:5092) */
                write_mv(w, mv2r, mv2c, s1r[0], s1c[0]);
            } else if (mode == 20) {   /* NEW_NEARESTMV */
                write_mv(w, mvr, mvc, st_r[0], st_c[0]);
            }
        } else {
            write_ref_frames(w, mi_row, mi_col, ref);
            write_inter_mode(w, mode, mode_ctx);
            if (mode == 16) {
                write_drl(w, st_w, nstack, refmv_count);
                write_mv(w, mvr, mvc, st_r[0], st_c[0]);
            } else if (mode == 14) {
                /* read_drl_idx NEARMV branch: bit per idx, stop at 0
                   (ref_mv_idx = near_idx -> stack[1 + near_idx]) */
                if (refmv_count > 2) {
                    int w1 = nstack > 1 ? st_w[1] : 0;
                    int w2 = nstack > 2 ? st_w[2] : 0;
                    int ctx = (w1 >= 640 && w2 >= 640) ? 0 : (w1 >= 640 ? 1 : 2);
                    ec_symbol(w->enc, near_idx > 0, w->cdf_drl + ctx * 3, 2,
                              w->adapt);
                    if (near_idx > 0 && refmv_count > 3) {
                        int w3 = nstack > 3 ? st_w[3] : 0;
                        int c2 = (w2 >= 640 && w3 >= 640) ? 0
                                 : (w2 >= 640 ? 1 : 2);
                        ec_symbol(w->enc, 0, w->cdf_drl + c2 * 3, 2,
                                  w->adapt);
                    }
                }
            }
        }
        /* interintra (read_interintra_mode): flag, mode, wedge */
        if (w->enable_interintra && !is_comp
            && W >= 8 && W <= 32 && H >= 8 && H <= 32
            && W <= 2 * H && H <= 2 * W) {   /* spec: 8x8..32x32 enum
                                                range excludes 8x32/32x8 */
            int grp = SIZE_GROUP[bsize];
            ec_symbol(w->enc, ft.ii >= 0, w->cdf_interintra + grp * 3, 2,
                      w->adapt);
            if (ft.ii >= 0) {
                ec_symbol(w->enc, ft.ii, w->cdf_interintra_mode + grp * 5, 4,
                          w->adapt);
                ec_symbol(w->enc, ft.iiw >= 0,
                          w->cdf_wedge_interintra + bsize * 3, 2, w->adapt);
                if (ft.iiw >= 0)
                    ec_symbol(w->enc, ft.iiw, w->cdf_wedge_idx + bsize * 17,
                              16, w->adapt);
            }
        }
        /* motion_mode (write_motion_mode): obmc flag when OBMC is the max
           allowed mode */
        if (w->motion_mode_switchable && ft.ii < 0
            && obmc_eligible_c(w, mi_row, mi_col, W, H, is_comp))
            ec_symbol(w->enc, ft.mm != 0, w->cdf_obmc + bsize * 3, 2,
                      w->adapt);
        /* read_compound_type: comp_group_idx + masked geometry */
        if (is_comp && w->enable_masked_compound) {
            int gctx = comp_group_ctx_c(w, mi_row, mi_col);
            ec_symbol(w->enc, ft.ctype > 0, w->cdf_comp_group_idx + gctx * 3,
                      2, w->adapt);
            if (ft.ctype > 0) {
                if (W <= 32 && W <= 2 * H && H <= 2 * W)
                    /* wedge codebook exists -> explicit symbol */
                    ec_symbol(w->enc, ft.ctype == 2,
                              w->cdf_compound_type + bsize * 3, 2, w->adapt);
                if (ft.ctype == 1) {
                    ec_symbol(w->enc, ft.widx, w->cdf_wedge_idx + bsize * 17,
                              16, w->adapt);
                    ec_literal(w->enc, ft.wsign, 1);
                } else {
                    ec_literal(w->enc, ft.widx, 1);
                }
            }
        }
        /* read_interpolation_filter: one symbol, dual off */
        {
            int filt_coded = 0;
            if (w->switchable_filters) {
                if ((W < H ? W : H) >= 8 && mode == 15)
                    /* GLOBALMV: coded only for a TRANSLATION gm on LAST
                       (gm_wm/warp frames never reach the C walk) */
                    filt_coded = ref == 1 && (w->gm_row || w->gm_col);
                else
                    filt_coded = 1;
            }
            if (filt_coded) {
                int fctx = switchable_filter_ctx_c(
                    w, mi_row, mi_col, is_comp ? 1 : ref, is_comp);
                ec_symbol(w->enc, ft.filt,
                          w->cdf_switchable_interp + fctx * 4, 3, w->adapt);
            }
        }
    } else {
        int grp = SIZE_GROUP[bsize];
        ec_symbol(w->enc, mode, w->cdf_if_y + grp * 14, 13, w->adapt);
        if (bsize >= 3 && mode >= 1 && mode <= 8)
            ec_symbol(w->enc, 3, w->cdf_angle + (mode - 1) * 8, 7, w->adapt);
        if (has_uv)
            ec_symbol(w->enc, 0, w->cdf_uv + (cfl_allowed * 13 + mode) * 15,
                      cfl_allowed ? 14 : 13, w->adapt);
        if (w->allow_sct && W <= 64 && H <= 64 && bsize >= 3) {
            int npl2 = 0, t = W * H;
            while (t > 1) { t >>= 1; npl2++; }
            int bctx = npl2 - 6;
            if (mode == 0)
                ec_symbol(w->enc, 0, w->cdf_pal_y + (bctx * 3 + 0) * 3, 2,
                          w->adapt);
            if (has_uv)
                ec_symbol(w->enc, 0, w->cdf_pal_uv, 2, w->adapt);
        }
        if (w->enable_filter_intra && mode == 0 && W <= 32 && H <= 32)
            ec_symbol(w->enc, 0, w->cdf_fi + bsize * 3, 2, w->adapt);
    }

    /* ---- block tx size (read_block_tx_size; only under TX_MODE_SELECT) */
    if (w->tx_mode_select) {
        if (use_inter && !skip) {
            write_vartx(w, mi_row, mi_col, W, H, ry->tx_size, 0, split);
        } else if (use_inter) {
            /* skip inter: no bits; ctx spans take the BLOCK dims */
            txfm_set_span(w, mi_row, mi_col, bw4, bh4, W, H);
        } else {
            write_intra_tx_size(w, mi_row, mi_col, bsize);
        }
    }

    /* ---- coefficients + recon */
    if (split) {
        code_residual_planes(w, kids, nkids, skip, use_inter, mode);
        code_residual_planes(w, res + 1, nres - 1, skip, use_inter, mode);
    } else {
        code_residual_planes(w, res, nres, skip, use_inter, mode);
    }

    /* ---- mi + MV-prediction grid state */
    int r1 = mi_row + bh4 < w->mi_rows ? mi_row + bh4 : w->mi_rows;
    int c1 = mi_col + bw4 < w->mi_cols ? mi_col + bw4 : w->mi_cols;
    for (int r = mi_row; r < r1; r++)
        for (int c = mi_col; c < c1; c++) {
            int j = r * w->mi_cols + c;
            w->mi_mode[j] = (int8_t)(use_inter ? 0 : mode);
            w->mi_skip[j] = (int8_t)skip;
            if (w->mi_skip_mode) w->mi_skip_mode[j] = (int8_t)use_sm;
            w->g_ref[j] = (int8_t)(is_comp ? 1 : (use_inter ? ref : 0));
            w->g_mvr[j] = (int16_t)(use_inter ? mvr : 0);
            w->g_mvc[j] = (int16_t)(use_inter ? mvc : 0);
            if (w->g_ref2) {
                w->g_ref2[j] = (int8_t)(is_comp ? w->ref2_const : 0);
                w->g_mv2r[j] = (int16_t)(is_comp ? mv2r : 0);
                w->g_mv2c[j] = (int16_t)(is_comp ? mv2c : 0);
            }
            w->g_mode[j] = (uint8_t)mode;
            w->g_bw4[j] = (uint8_t)bw4;
            w->g_bh4[j] = (uint8_t)bh4;
            if (w->g_filt && use_inter)   /* intra keeps the 3 sentinel */
                w->g_filt[j] = (int8_t)ft.filt;
            if (w->g_comp_group)
                w->g_comp_group[j] = (int8_t)(is_comp && ft.ctype > 0);
        }
}

/* ------------------------------------------------------------- the walk */
static int subsize_of(int bsize, int part) {
    int W = BW[bsize], H = BH[bsize];
    if (part == PART_NONE) return bsize;
    if (part == PART_SPLIT) return bsize_of(W / 2, H / 2);
    if (part == PART_HORZ) return bsize_of(W, H / 2);
    return bsize_of(W / 2, H);
}

static void enc_block(Walk *w, int mi_row, int mi_col, int bsize,
                      int sb_r, int sb_c) {
    if (w->is_inter_frame) encode_block_inter(w, mi_row, mi_col, bsize, sb_r, sb_c);
    else encode_block(w, mi_row, mi_col, bsize, sb_r, sb_c);
}

static void walk(Walk *w, int mi_row, int mi_col, int bsize, int sb_r, int sb_c) {
    if (mi_row >= w->mi_rows || mi_col >= w->mi_cols) return;
    int bw4 = BW[bsize] >> 2;
    int half = bw4 >> 1;
    int has_rows = (mi_row + half) < w->mi_rows;
    int has_cols = (mi_col + half) < w->mi_cols;
    int part;
    int W = BW[bsize];
    if (has_rows && has_cols) {
        int li = 0;
        while ((8 << li) < W) li++;
        const uint8_t *rp = li < 4 ? w->rect[li] : 0;
        int rv = rp ? rp[((mi_row * 4) / W) * w->rect_cols[li]
                        + (mi_col * 4) / W] : 0;
        if (rv == 2) part = PART_HORZ;
        else if (rv == 3) part = PART_VERT;
        else if (rv >= 4 && rv <= 9) part = rv;   /* HORZ_A..VERT_4 */
        else
            part = (W > 8 && dec_split(w, mi_row, mi_col, W))
                   ? PART_SPLIT : PART_NONE;
    }
    else if (has_cols) part = PART_HORZ;
    else if (has_rows) part = PART_VERT;
    else part = PART_SPLIT;

    if (bsize >= 3)
        write_partition(w, mi_row, mi_col, bsize, part, has_rows, has_cols);

    int subsize;
    if (part == 8)       subsize = bsize_of(BW[bsize], BH[bsize] / 4);
    else if (part == 9)  subsize = bsize_of(BW[bsize] / 4, BH[bsize]);
    else subsize = subsize_of(bsize, part >= 4 ? (part == 4 || part == 5
                                                  ? PART_HORZ : PART_VERT)
                                               : part);
    int quarter = subsize_of(bsize, PART_SPLIT);
    if (part == PART_NONE) {
        enc_block(w, mi_row, mi_col, bsize, sb_r, sb_c);
    } else if (part == PART_HORZ) {
        enc_block(w, mi_row, mi_col, subsize, sb_r, sb_c);
        if (mi_row + half < w->mi_rows)
            enc_block(w, mi_row + half, mi_col, subsize, sb_r, sb_c);
    } else if (part == PART_VERT) {
        enc_block(w, mi_row, mi_col, subsize, sb_r, sb_c);
        if (mi_col + half < w->mi_cols)
            enc_block(w, mi_row, mi_col + half, subsize, sb_r, sb_c);
    } else if (part == 4) {            /* HORZ_A (spec decode_partition) */
        enc_block(w, mi_row, mi_col, quarter, sb_r, sb_c);
        enc_block(w, mi_row, mi_col + half, quarter, sb_r, sb_c);
        enc_block(w, mi_row + half, mi_col, subsize, sb_r, sb_c);
    } else if (part == 5) {            /* HORZ_B */
        enc_block(w, mi_row, mi_col, subsize, sb_r, sb_c);
        enc_block(w, mi_row + half, mi_col, quarter, sb_r, sb_c);
        enc_block(w, mi_row + half, mi_col + half, quarter, sb_r, sb_c);
    } else if (part == 6) {            /* VERT_A */
        enc_block(w, mi_row, mi_col, quarter, sb_r, sb_c);
        enc_block(w, mi_row + half, mi_col, quarter, sb_r, sb_c);
        enc_block(w, mi_row, mi_col + half, subsize, sb_r, sb_c);
    } else if (part == 7) {            /* VERT_B */
        enc_block(w, mi_row, mi_col, subsize, sb_r, sb_c);
        enc_block(w, mi_row, mi_col + half, quarter, sb_r, sb_c);
        enc_block(w, mi_row + half, mi_col + half, quarter, sb_r, sb_c);
    } else if (part == 8) {            /* HORZ_4: four SxS/4 strips */
        int qh = bw4 >> 2;
        for (int i = 0; i < 4; i++)
            if (mi_row + i * qh < w->mi_rows)
                enc_block(w, mi_row + i * qh, mi_col, subsize, sb_r, sb_c);
    } else if (part == 9) {            /* VERT_4 */
        int qw = bw4 >> 2;
        for (int i = 0; i < 4; i++)
            if (mi_col + i * qw < w->mi_cols)
                enc_block(w, mi_row, mi_col + i * qw, subsize, sb_r, sb_c);
    } else {
        walk(w, mi_row, mi_col, subsize, sb_r, sb_c);
        walk(w, mi_row, mi_col + half, subsize, sb_r, sb_c);
        walk(w, mi_row + half, mi_col, subsize, sb_r, sb_c);
        walk(w, mi_row + half, mi_col + half, subsize, sb_r, sb_c);
    }

    if (part >= 4 && part <= 7) {
        /* update_ext_partition_context: two spans, ctx from the quarter
           on the SPLIT-like half */
        int sw4 = BW[subsize] >> 2, sh4 = BH[subsize] >> 2;
        int first_q = (part == 4 || part == 6);
        int r2 = (part == 4 || part == 5) ? mi_row + half : mi_row;
        int c2 = (part == 6 || part == 7) ? mi_col + half : mi_col;
        int cb1 = first_q ? quarter : subsize;
        int cb2 = first_q ? subsize : quarter;
        for (int c = mi_col; c < mi_col + sw4 && c < w->mi_cols; c++)
            w->part_above[c] = PCTX_A[cb1];
        for (int r = mi_row; r < mi_row + sh4 && r < w->mi_rows; r++)
            w->part_left[r] = PCTX_L[cb1];
        for (int c = c2; c < c2 + sw4 && c < w->mi_cols; c++)
            w->part_above[c] = PCTX_A[cb2];
        for (int r = r2; r < r2 + sh4 && r < w->mi_rows; r++)
            w->part_left[r] = PCTX_L[cb2];
    } else if (part != PART_SPLIT) {
        int c1 = mi_col + bw4 < w->mi_cols ? mi_col + bw4 : w->mi_cols;
        int r1 = mi_row + bw4 < w->mi_rows ? mi_row + bw4 : w->mi_rows;
        for (int c = mi_col; c < c1; c++) w->part_above[c] = PCTX_A[subsize];
        for (int r = mi_row; r < r1; r++) w->part_left[r] = PCTX_L[subsize];
    }
}

/* ============================================ batched host pre-commit ==
 * The host-side analog of the device residual commit (ops/commit.py,
 * same pre_* ABI): pred + fwd TX + quant (+rdoq) + inv TX + recon for the
 * decided inter leaves of one tile, BEFORE the EC walk, with transforms
 * running through the lane-batched kernels (txfm2d_*_batch_p in
 * ec_native.c) instead of one scalar graph interpretation per block.
 * The walk then reads qcoeffs/eobs via pre_slot and skips its per-leaf
 * compute (encode_block_inter's pslot path) — the reference interleaves
 * this compute with the syntax walk in one thread (coding_loop.c:1697);
 * here the EC-independent half batches per frame.
 *
 * leaves: [nl][3] = (mi_row, mi_col, bsize); modes/MVs/tx types read from
 * the d_* decision grids exactly like encode_block_inter, so results are
 * bit-identical by construction. pre_qc must be sized by the caller:
 * sum over leaves of min(W,32)*min(H,32) (+ 2 chroma terms at nplanes=3).
 */
typedef struct {
    int leaf, plane, px, py, pw, ph, ts, tt, sb_r, sb_c, qc_off;
    int ref_idx, is_comp, mvr, mvc, mv2r, mv2c;
    int mi, luma_size;   /* feature maps (filt / masked compound) */
} PreJob;

static void precommit_round(Walk *w, PreJob *jobs, int nj,
                            int32_t *pre_eob, int32_t *pre_qc) {
    /* group by (ts, tt): process each group in lane chunks */
    static int32_t resid[32768], coeffb[32768], fullb[32768];
    static uint16_t predb[32768], recb[32768];
    int *order = (int *)malloc(sizeof(int) * (size_t)(nj > 0 ? nj : 1));
    int used[19][16] = {{0}};
    for (int j = 0; j < nj; j++) used[jobs[j].ts][jobs[j].tt] = 1;
    for (int ts = 0; ts < 19; ts++)
        for (int tt = 0; tt < 16; tt++) {
            if (!used[ts][tt]) continue;
            int n = 0;
            for (int j = 0; j < nj; j++)
                if (jobs[j].ts == ts && jobs[j].tt == tt) order[n++] = j;
            if (!n) continue;
            int pw = jobs[order[0]].pw, ph = jobs[order[0]].ph;
            int B = 32768 / (pw * ph);
            if (B > 64) B = 64;
            if (B < 1) B = 1;
            int cw = pw < 32 ? pw : 32, ch = ph < 32 ? ph : 32;
            for (int c0 = 0; c0 < n; c0 += B) {
                int nb = n - c0 < B ? n - c0 : B;
                for (int k = 0; k < nb; k++) {
                    PreJob *jb = &jobs[order[c0 + k]];
                    uint16_t *pp = predb + (size_t)k * pw * ph;
                    Feats ft = {0, 0, -1, -1, 0, 0, 0};
                    read_feats(w, jb->mi, &ft);
                    /* II/OBMC leaves never precommit (recon/walk-order
                       dependent); filt + masked compound do */
                    build_inter_pred_plane(w, jb->plane, jb->px, jb->py,
                                           pw, ph, jb->is_comp, jb->ref_idx,
                                           jb->mvr, jb->mvc, jb->mv2r,
                                           jb->mv2c, &ft, jb->luma_size, pp);
                    const uint16_t *src = w->src[jb->plane];
                    int ss = w->src_stride[jb->plane];
                    int32_t *rs = resid + (size_t)k * pw * ph;
                    for (int y = 0; y < ph; y++)
                        for (int x = 0; x < pw; x++)
                            rs[y * pw + x] =
                                (int32_t)src[(jb->py + y) * ss + jb->px + x]
                                - (int32_t)pp[y * pw + x];
                }
                long long wp_t0 = wp_now();
                txfm2d_fwd_batch_p(w->fwdp[ts][tt], resid, nb, coeffb);
                for (int k = 0; k < nb; k++) {
                    PreJob *jb = &jobs[order[c0 + k]];
                    const int32_t *co = coeffb + (size_t)k * pw * ph;
                    int64_t flat[32 * 32];
                    for (int y = 0; y < ch; y++)
                        for (int x = 0; x < cw; x++)
                            flat[y * cw + x] = co[y * pw + x];
                    const int32_t *qp = qp_row(w, jb->sb_r, jb->sb_c,
                                               jb->plane);
                    static const uint8_t TXSC[19] =
                        {0,0,0,1,2,0,0,0,0,1,1,2,2,0,0,0,0,1,1};
                    int log_scale = TXSC[ts];
                    const uint8_t *qm = tt >= 9 ? 0 : w->qm[jb->plane][ts];
                    const uint16_t *iqm =
                        tt >= 9 ? 0 : w->iqm[jb->plane][ts];
                    int32_t *qc = pre_qc + jb->qc_off;
                    int32_t dqc[32 * 32];
                    int eob = quantize_txb(
                        flat, cw * ch, w->scans[ts][tt], qp[0], qp[1],
                        qp[2], qp[3], qp[4], qp[5], qp[6], qp[7], qp[8],
                        qp[9], log_scale, qm, iqm, qc, dqc);
                    if (w->rdoq_fast && eob) {
                        int zbin[2] = {qp[8] + ((qp[8] * 70 + 64) >> 7),
                                       qp[9] + ((qp[9] * 70 + 64) >> 7)};
                        const int16_t *scan = w->scans[ts][tt];
                        int e = eob;
                        for (int i = e - 1; i >= 0; i--) {
                            int rc = scan[i];
                            int64_t a = flat[rc] < 0 ? -flat[rc] : flat[rc];
                            if ((a << (1 + log_scale)) < zbin[rc != 0]
                                || qc[rc] == 0) {
                                e--;
                                qc[rc] = 0;
                                dqc[rc] = 0;
                            } else
                                break;
                        }
                        eob = e;
                    }
                    pre_eob[jb->leaf * 3 + jb->plane] = eob;
                    int32_t *fu = fullb + (size_t)k * pw * ph;
                    memset(fu, 0, sizeof(int32_t) * pw * ph);
                    if (eob)
                        for (int y = 0; y < ch; y++)
                            for (int x = 0; x < cw; x++)
                                fu[y * pw + x] = dqc[y * cw + x];
                }
                walk_prof_ns[1] += wp_now() - wp_t0;
                wp_t0 = wp_now();
                txfm2d_inv_add_batch_p(w->invp[ts][tt], fullb, predb, nb,
                                       recb);
                for (int k = 0; k < nb; k++) {
                    PreJob *jb = &jobs[order[c0 + k]];
                    int wr = pw, hr = ph;
                    if (jb->px + wr > w->pw[jb->plane])
                        wr = w->pw[jb->plane] - jb->px;
                    if (jb->py + hr > w->ph[jb->plane])
                        hr = w->ph[jb->plane] - jb->py;
                    uint16_t *dst = w->recon[jb->plane];
                    int rstr = w->rec_stride[jb->plane];
                    const uint16_t *rc2 = recb + (size_t)k * pw * ph;
                    for (int y = 0; y < hr; y++)
                        memcpy(dst + (jb->py + y) * rstr + jb->px,
                               rc2 + y * pw, sizeof(uint16_t) * wr);
                }
                walk_prof_ns[2] += wp_now() - wp_t0;
            }
        }
    free(order);
}

void walk_precommit(Walk *w, const int32_t *leaves, int nl,
                    int32_t *pre_slot, int32_t *pre_off, int32_t *pre_eob,
                    int32_t *pre_qc) {
    PreJob *jy = (PreJob *)malloc(sizeof(PreJob) * (size_t)nl);
    PreJob *juv = (PreJob *)malloc(sizeof(PreJob) * (size_t)nl * 2);
    int njy = 0;
    int qc_off = 0;
    for (int l = 0; l < nl; l++) {
        int mi_row = leaves[l * 3], mi_col = leaves[l * 3 + 1];
        int bsize = leaves[l * 3 + 2];
        int W = BW[bsize], H = BH[bsize];
        int mi = mi_row * w->mi_cols + mi_col;
        int ref = w->d_ref[mi];
        int mode = w->d_mode[mi];
        int is_comp = mode >= 17;
        int ny = (W < 32 ? W : 32) * (H < 32 ? H : 32);
        int cwf = W >> 1 < 32 ? W >> 1 : 32;
        int chf = H >> 1 < 32 ? H >> 1 : 32;
        int nuv = w->nplanes > 1 ? cwf * chf : 0;
        pre_slot[mi] = l + 1;
        pre_off[l * 3] = qc_off;
        pre_off[l * 3 + 1] = qc_off + ny;
        pre_off[l * 3 + 2] = qc_off + ny + nuv;
        PreJob *jb = &jy[njy++];
        jb->leaf = l;
        jb->plane = 0;
        jb->px = mi_col * 4;
        jb->py = mi_row * 4;
        jb->pw = W;
        jb->ph = H;
        jb->ts = MAX_TX[bsize];
        int tt_y = (w->d_txt && w->qindex > 0) ? w->d_txt[mi] : 0;
        if (SQR_UP[jb->ts] > 3) tt_y = 0;
        jb->tt = tt_y;
        jb->sb_r = mi_row >> 4;
        jb->sb_c = mi_col >> 4;
        jb->qc_off = qc_off;
        jb->ref_idx = ref_to_idx(w, ref);
        jb->is_comp = is_comp;
        jb->mvr = w->d_mvr[mi];
        jb->mvc = w->d_mvc[mi];
        jb->mv2r = is_comp && w->d_mvr2 ? w->d_mvr2[mi] : 0;
        jb->mv2c = is_comp && w->d_mvc2 ? w->d_mvc2[mi] : 0;
        jb->mi = mi;
        jb->luma_size = W;
        qc_off += ny + 2 * nuv;
    }
    precommit_round(w, jy, njy, pre_eob, pre_qc);
    if (w->nplanes > 1) {
        int njuv = 0;
        for (int j = 0; j < njy; j++) {
            PreJob *y = &jy[j];
            int W = y->pw, H = y->ph;
            int uv_w = W >> 1 > 4 ? W >> 1 : 4;
            int uv_h = H >> 1 > 4 ? H >> 1 : 4;
            int tx_uv = MAX_TX[bsize_of(uv_w, uv_h)];
            int tt_uv = y->tt;
            if (pre_eob[y->leaf * 3] == 0) tt_uv = 0;
            if (SQR_UP[tx_uv] > 3) tt_uv = 0;
            else if (SQR_UP[tx_uv] == 3 && tt_uv != 0 && tt_uv != 9)
                tt_uv = 0;
            for (int pl = 1; pl <= 2; pl++) {
                PreJob *jb = &juv[njuv++];
                *jb = *y;
                jb->plane = pl;
                jb->px = y->px >> 1;
                jb->py = y->py >> 1;
                jb->pw = W >> 1;
                jb->ph = H >> 1;
                jb->ts = tx_uv;
                jb->tt = tt_uv;
                jb->qc_off = pre_off[y->leaf * 3 + pl];
            }
        }
        precommit_round(w, juv, njuv, pre_eob, pre_qc);
    }
    free(jy);
    free(juv);
}

/* Entry: encode one tile's superblock range. The Walk struct is built by
 * Python (ctypes mirror). Returns 0. */
int walk_encode_tile(Walk *w) {
    long long wp_t0 = wp_now();
    w->prev_qindex = w->base_qindex;
    for (int mi_row = w->tile_r0; mi_row < w->tile_r1; mi_row += 16) {
        for (int mi_col = w->tile_c0; mi_col < w->tile_c1; mi_col += 16) {
            int sb_r = mi_row >> 4, sb_c = mi_col >> 4;
            if (w->delta_q_present) {
                w->sb_qindex_cur = w->sb_qindex[sb_r * w->sbq_cols + sb_c];
                w->sb_delta_pending = 1;
            }
            if (w->lr_ops) { /* LR unit info coded before the SB's partition */
                int sbi = sb_r * w->lr_sb_cols + sb_c;
                for (int i = w->lr_start[sbi]; i < w->lr_start[sbi + 1]; i++) {
                    const int32_t *op = w->lr_ops + 3 * i;
                    if (op[0] == 0)
                        ec_symbol(w->enc, op[1], w->cdf_wiener, 2, w->adapt);
                    else if (op[0] == 3)
                        ec_symbol(w->enc, op[1], w->cdf_sgr, 2, w->adapt);
                    else if (op[0] == 4)
                        ec_symbol(w->enc, op[1], w->cdf_switchable, 3, w->adapt);
                    else if (op[0] == 1)
                        ec_bool(w->enc, op[1], (unsigned)op[2]);
                    else
                        ec_literal(w->enc, (uint32_t)op[1], op[2]);
                }
            }
            walk(w, mi_row, mi_col, 12 /* BLOCK_64X64 */, sb_r, sb_c);
        }
    }
    walk_prof_ns[4] += wp_now() - wp_t0;
    return 0;
}

/* =============================== feature-search pre-pass ===============
 * Batched search for the p<=6 block features over all decided inter
 * leaves of a frame: switchable interp filter, interintra (+wedge II),
 * OBMC, masked compound (wedge/diffwtd). One call per frame replaces the
 * per-block Python search that forced the slow walk at quality presets
 * (reference: the same candidate trials inside md_encode_block,
 * product_coding_loop.c — re-architected batch-then-walk).
 *
 * The caller passes a *search* Walk: recon[] points at the SOURCE planes
 * (the open-loop stand-in for walk-order recon neighbors in the II intra
 * component), decoded[] is a zeroed scratch the search marks in leaf
 * order, and the g_* grids are pre-filled from the decision maps so OBMC
 * neighbor lookups see every leaf (g_filt starts zeroed and fills as
 * decided). Leaves must arrive in walk (z) order. Outputs are per-mi maps
 * written at each leaf's top-left (the encode walks read them back via
 * d_filt/d_mm/d_ii/d_iiw/d_ctype/d_widx/d_wsign). */
void psy_block_energy(const int32_t *x, int stride, int h, int w, int t,
                      int64_t *out);
int64_t psy_distortion_sum_u16(const uint16_t *recon, int stride, int h,
                               int w, int t, const int64_t *src_energy);

typedef struct {
    const Walk *w;
    int W, H, t;
    const uint16_t *src;
    int ss;
    int x0, y0;
    int64_t src_e[64];
    int has_e;
} FsCost;

static int64_t fs_sse(FsCost *fc, const uint16_t *pred) {
    int64_t s = 0;
    for (int y = 0; y < fc->H; y++)
        for (int x = 0; x < fc->W; x++) {
            int64_t d = (int64_t)fc->src[(fc->y0 + y) * fc->ss + fc->x0 + x]
                        - pred[y * fc->W + x];
            s += d * d;
        }
    return s;
}

static int64_t fs_psy(FsCost *fc, const uint16_t *pred) {
    const Walk *w = fc->w;
    if (w->psy_rd <= 0) return 0;
    if (!fc->has_e) {
        int32_t sb[64 * 64];
        for (int y = 0; y < fc->H; y++)
            for (int x = 0; x < fc->W; x++)
                sb[y * fc->W + x] =
                    fc->src[(fc->y0 + y) * fc->ss + fc->x0 + x];
        psy_block_energy(sb, fc->W, fc->H, fc->W, fc->t, fc->src_e);
        fc->has_e = 1;
    }
    int64_t d = psy_distortion_sum_u16(pred, fc->W, fc->H, fc->W, fc->t,
                                       fc->src_e);
    d = w->bd == 8 ? (d >> 1) : (d << 2);
    return (int64_t)(d * w->psy_rd);
}

static int64_t fs_cost(FsCost *fc, const uint16_t *pred) {
    return fs_sse(fc, pred) + fs_psy(fc, pred);
}

void walk_feature_search(Walk *w, const int32_t *leaves, int nl,
                         int8_t *o_filt, int8_t *o_mm, int8_t *o_ii,
                         int8_t *o_iiw, int8_t *o_ctype, int8_t *o_widx,
                         int8_t *o_wsign) {
    for (int l = 0; l < nl; l++) {
        int mi_row = leaves[l * 3], mi_col = leaves[l * 3 + 1];
        int bsize = leaves[l * 3 + 2];
        int W = BW[bsize], H = BH[bsize];
        int x0 = mi_col * 4, y0 = mi_row * 4;
        int bw4 = W >> 2, bh4 = H >> 2;
        int mi = mi_row * w->mi_cols + mi_col;
        int ref = w->d_ref[mi], mode = w->d_mode[mi];
        int use_inter = ref > 0;
        int r1 = mi_row + bh4 < w->mi_rows ? mi_row + bh4 : w->mi_rows;
        int c1 = mi_col + bw4 < w->mi_cols ? mi_col + bw4 : w->mi_cols;
        if (!use_inter) {
            for (int r = mi_row; r < r1; r++)
                for (int c = mi_col; c < c1; c++)
                    w->decoded[0][r * w->dec_stride[0] + c] = 1;
            continue;
        }
        int is_comp = mode >= 17;
        int mvr = w->d_mvr[mi], mvc = w->d_mvc[mi];
        int mv2r = is_comp && w->d_mvr2 ? w->d_mvr2[mi] : 0;
        int mv2c = is_comp && w->d_mvc2 ? w->d_mvc2[mi] : 0;
        int ref_idx = ref_to_idx(w, ref);

        FsCost fc;
        fc.w = w; fc.W = W; fc.H = H;
        fc.t = (W >= 8 && H >= 8) ? 8 : 4;
        fc.src = w->src[0]; fc.ss = w->src_stride[0];
        fc.x0 = x0; fc.y0 = y0; fc.has_e = 0;

        uint16_t pred[64 * 64], altp[64 * 64];
        if (is_comp)
            mc_pred_compound_f(w, 0, x0, y0, W, H, mvr, mvc, mv2r, mv2c, 0,
                               pred);
        else
            mc_pred_plane_f(w, ref_idx, 0, x0, y0, W, H, mvr, mvc, 0, pred);

        /* ---- stack-aware NEAREST/NEAR MV injection (decide-time DRL).
           Trial the reference-MV stack head/runner-up as replacements for
           the decided NEWMV: an exact stack match collapses to
           NEARESTMV/NEARMV in both walks (no DRL/MV syntax), so a
           candidate within near_lam (lambda x saved MV bits) of the NEWMV
           cost wins RD. Always conformance-safe: the encode walk
           re-derives its own stack and only collapses on exact equality.
           (reference: inject_mvp_candidates, mode_decision.c:1934) */
        if (w->near_lam > 0 && !is_comp && mode == 16) {
            int st_r[10], st_c[10], st_w2[10];
            int mc2, rc2, ns2;
            int gm_r = ref == 1 ? w->gm_row : 0;
            int gm_c = ref == 1 ? w->gm_col : 0;
            ref_mv_list(w, mi_row, mi_col, bw4, bh4, ref, gm_r, gm_c,
                        st_r, st_c, st_w2, &mc2, &rc2, &ns2);
            int64_t thr = fs_cost(&fc, pred) + w->near_lam;
            int take = -1;
            int kmax = (rc2 >= 2 && ns2 > 1) ? 1 : 0;
            for (int k = 0; k <= kmax; k++) {
                if (st_r[k] == mvr && st_c[k] == mvc)
                    break;               /* already collapses at this k */
                if (k == 1 && st_r[1] == st_r[0] && st_c[1] == st_c[0])
                    break;
                /* stay inside the padded reference window */
                int ipy = st_r[k] >> 3, ipx = st_c[k] >> 3;
                if (y0 + ipy - 4 < -w->pad || x0 + ipx - 4 < -w->pad
                    || y0 + ipy + H + 5 > w->ph[0] + w->pad
                    || x0 + ipx + W + 5 > w->pw[0] + w->pad)
                    continue;
                mc_pred_plane_f(w, ref_idx, 0, x0, y0, W, H,
                                st_r[k], st_c[k], 0, altp);
                /* NEARMV still pays drl bit(s) + a pricier mode symbol */
                int64_t c = fs_cost(&fc, altp)
                    + (k ? w->near_lam >> 3 : 0);
                if (c < thr) {
                    thr = c;
                    take = k;
                    memcpy(pred, altp, sizeof(uint16_t) * W * H);
                }
            }
            if (take >= 0) {
                mvr = st_r[take];
                mvc = st_c[take];
                ((int32_t *)w->d_mvr)[mi] = mvr;
                ((int32_t *)w->d_mvc)[mi] = mvc;
                /* later leaves' stacks + OBMC must see the final MV */
                for (int r = mi_row; r < r1; r++)
                    for (int c = mi_col; c < c1; c++) {
                        w->g_mvr[r * w->mi_cols + c] = (int16_t)mvr;
                        w->g_mvc[r * w->mi_cols + c] = (int16_t)mvc;
                    }
            }
        }

        /* ---- switchable interp filter (rebuild with SMOOTH/SHARP) */
        int filt = 0;
        int filt_coded = 0;
        if (w->switchable_filters) {
            if ((W < H ? W : H) >= 8 && mode == 15)
                filt_coded = ref == 1 && (w->gm_row || w->gm_col);
            else
                filt_coded = 1;
        }
        if (filt_coded) {
            int64_t best = fs_cost(&fc, pred);
            for (int f = 1; f <= 2; f++) {
                if (is_comp) {
                    int32_t b0[64 * 64], b1[64 * 64];
                    jnt_bufs(w, 0, x0, y0, W, H, mvr, mvc, mv2r, mv2c, f,
                             b0, b1);
                    const int R0 = 3, R1 = 7, FB = 7;
                    int offset_bits = w->bd + 2 * FB - R0;
                    int32_t roff = (1 << (offset_bits - R1))
                        + (1 << (offset_bits - R1 - 1));
                    int rb = 2 * FB - R0 - R1;
                    int peak = (1 << w->bd) - 1;
                    for (int k = 0; k < W * H; k++) {
                        int32_t tmp = ((b0[k] + b1[k]) >> 1) - roff;
                        tmp = (tmp + (1 << (rb - 1))) >> rb;
                        if (tmp < 0) tmp = 0;
                        if (tmp > peak) tmp = peak;
                        altp[k] = (uint16_t)tmp;
                    }
                } else {
                    mc_pred_plane_f(w, ref_idx, 0, x0, y0, W, H, mvr, mvc,
                                    f, altp);
                }
                int64_t c = fs_sse(&fc, altp);
                if (c >= best) continue;
                c += fs_psy(&fc, altp);
                if (c < best) {
                    best = c;
                    filt = f;
                    memcpy(pred, altp, sizeof(uint16_t) * W * H);
                }
            }
        }

        /* ---- interintra + OBMC (single-ref only) */
        int ii = -1, iiw = -1, mm = 0;
        int ii_elig = w->enable_interintra && !is_comp
            && W >= 8 && W <= 32 && H >= 8 && H <= 32
            && W <= 2 * H && H <= 2 * W;
        int ob_elig = obmc_eligible_c(w, mi_row, mi_col, W, H, is_comp);
        int64_t c_simple = 0, best_ii = -1;
        if (ii_elig || ob_elig) c_simple = fs_cost(&fc, pred);
        if (ii_elig) {
            int32_t ab[1 + 128 + 128], lb[1 + 128 + 128];
            int ha, hl;
            gather_neighbors(w, 0, x0, y0, W, H, ab, lb, &ha, &hl);
            uint16_t ip[64 * 64], best_ip[64 * 64];
            int32_t mbuf[64 * 64];
            for (int m = 0; m < 4; m++) {
                predict_mode(w, II_TO_INTRA_C[m], ab, lb, ha, hl, W, H, ip);
                ii_mask_c(w, m, W, H, mbuf);
                memcpy(altp, pred, sizeof(uint16_t) * W * H);
                ii_blend_c(altp, ip, mbuf, W * H);
                int64_t c = fs_cost(&fc, altp);
                if (c < c_simple && (best_ii < 0 || c < best_ii)) {
                    best_ii = c;
                    ii = m;
                    memcpy(best_ip, ip, sizeof(uint16_t) * W * H);
                }
            }
            if (ii >= 0 && W == H) {
                /* wedge interintra: sign-0 masks with the winning mode's
                   intra prediction (pick_interintra_wedge) */
                for (int widx = 0; widx < 16; widx++) {
                    const int32_t *wm = wedge_mask_c(w, W, widx, 0);
                    memcpy(altp, pred, sizeof(uint16_t) * W * H);
                    ii_blend_c(altp, best_ip, wm, W * H);
                    int64_t c = fs_cost(&fc, altp);
                    if (c < best_ii - (best_ii >> 5)) {
                        best_ii = c;
                        iiw = widx;
                    }
                }
            }
        }
        if (ob_elig) {
            memcpy(altp, pred, sizeof(uint16_t) * W * H);
            uint16_t *preds[3] = {altp, 0, 0};
            obmc_apply(w, mi_row, mi_col, W, H, preds);
            int64_t c_obmc = fs_cost(&fc, altp);
            int64_t c_beat = ii >= 0 ? best_ii : c_simple;
            if (c_obmc < c_beat) {
                mm = 1;
                ii = -1;
                iiw = -1;
            }
        }

        /* ---- masked compound (wedge / diffwtd) */
        int ctype = 0, widx_o = 0, wsign = 0;
        if (is_comp && w->enable_masked_compound && W == H
            && W >= 8 && W <= 64) {
            int32_t b0[64 * 64], b1[64 * 64], mbuf[64 * 64];
            jnt_bufs(w, 0, x0, y0, W, H, mvr, mvc, mv2r, mv2c, filt, b0, b1);
            int64_t c_avg = fs_cost(&fc, pred);
            int64_t best_w = -1;
            int bw_ct = 0, bw_idx = 0, bw_sign = 0;
            if (W <= 32 && W <= 2 * H && H <= 2 * W) {
                for (int widx = 0; widx < 16; widx++)
                    for (int sign = 0; sign < 2; sign++) {
                        const int32_t *wm = wedge_mask_c(w, W, widx, sign);
                        blend_d16_c(w, b0, b1, wm, W, W, H, altp);
                        int64_t c = fs_sse(&fc, altp);
                        if (best_w >= 0 && c >= best_w) continue;
                        c += fs_psy(&fc, altp);
                        if (best_w < 0 || c < best_w) {
                            best_w = c;
                            bw_ct = 1; bw_idx = widx; bw_sign = sign;
                        }
                    }
            }
            for (int mt = 0; mt < 2; mt++) {
                diffwtd_mask_c(w, b0, b1, W * H, mt, mbuf);
                blend_d16_c(w, b0, b1, mbuf, W, W, H, altp);
                int64_t c = fs_sse(&fc, altp);
                if (best_w >= 0 && c >= best_w) continue;
                c += fs_psy(&fc, altp);
                if (best_w < 0 || c < best_w) {
                    best_w = c;
                    bw_ct = 2; bw_idx = mt; bw_sign = 0;
                }
            }
            /* the masked syntax costs ~7 bits over the average's 1 */
            if (best_w >= 0 && best_w < c_avg - (c_avg >> 5)) {
                ctype = bw_ct;
                widx_o = bw_idx;
                wsign = bw_sign;
            }
        }

        o_filt[mi] = (int8_t)filt;
        o_mm[mi] = (int8_t)mm;
        o_ii[mi] = (int8_t)(ii + 1);
        o_iiw[mi] = (int8_t)(iiw + 1);
        o_ctype[mi] = (int8_t)ctype;
        o_widx[mi] = (int8_t)widx_o;
        o_wsign[mi] = (int8_t)wsign;

        /* pre-grid state for later leaves (OBMC neighbor filters) +
           decoded marks (II neighbor availability) */
        for (int r = mi_row; r < r1; r++)
            for (int c = mi_col; c < c1; c++) {
                if (w->g_filt) w->g_filt[r * w->mi_cols + c] = (int8_t)filt;
                w->decoded[0][r * w->dec_stride[0] + c] = 1;
            }
    }
}
