"""Inter (P) frame encoder: single reference (LAST), NEWMV/GLOBALMV modes,
intra fallback per block. Extends the intra encoder's tile/partition walk.

Behavioral references: write_modes_b inter branch (entropy_coding.c:5058+),
write_inter_mode (:1426), write_drl_idx (:1447), svt_av1_encode_mv (:1525),
write_ref_frames (:2086) with neighbor ref counts (:1896), MV prediction via
codec/mv_pred.py (normative stack), MC via codec/convolve.py.
"""

from __future__ import annotations

import os

import numpy as np

# experimental: convert NEWMV == stack[2] into NEARMV at DRL index 1
# (RefMvIdx 2). Behind an env flag while stack parity beyond index 1 is
# being qualified against dav1d (see _write_drl_near).
_NEAR2 = bool(int(os.environ.get("SVT_NEAR2", "0")))
_NEAR2_HITS = 0  # debug counter for the qualification harness

from .constants import (BLOCK_HEIGHT, BLOCK_WIDTH, BlockSize, PartitionType,
                        PredictionMode)
from . import mc_native
from .coeff_coding import get_txb_ctx, write_coeffs_txb, write_coeffs_txb_native
from .intra_encoder import (
    EXT_TX_IND_INTRA,
    IntraFrameEncoder,
    MAX_TX_RECT,
    _BSIZE_BY_WH,
    _SQR,
    _SQR_UP,
    _partition_subsize,
)
from .me import MotionEstimator
from .mv_pred import (ALTREF_FRAME, GLOBALMV, GOLDEN_FRAME, LAST_FRAME,
                      MiGrid, NEARESTMV, NEARMV, NEAREST_NEWMV, NEWMV,
                      NEW_NEARESTMV, NEW_NEWMV,
                      REF_CAT_LEVEL,
                      mode_context_analyzer, setup_comp_mv_list,
                      setup_ref_mv_list)
from .quant import quantize_b
from .transforms import forward_transform_2d, inverse_transform_add

# size_group_lookup (definitions.h) for the non-kf y-mode cdf
SIZE_GROUP = [0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3, 3, 3, 3, 3, 0, 0, 1, 1, 2, 2]

# inter-intra smooth blending (inter_prediction.c:2140 ii_weights1d /
# build_smooth_interintra_mask; blend = AOM_BLEND_A64)
II_WEIGHTS1D = np.array([
    60, 58, 56, 54, 52, 50, 48, 47, 45, 44, 42, 41, 39, 38, 37, 35, 34, 33,
    32, 31, 30, 29, 28, 27, 26, 25, 24, 23, 22, 22, 21, 20, 19, 19, 18, 18,
    17, 16, 16, 15, 15, 14, 14, 13, 13, 12, 12, 12, 11, 11, 10, 10, 10, 9,
    9, 9, 8, 8, 8, 8, 7, 7, 7, 7, 6, 6, 6, 6, 6, 5, 5, 5, 5, 5, 4, 4, 4, 4,
    4, 4, 4, 4, 3, 3, 3, 3, 3, 3, 3, 3, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1], np.int32)
II_SIZE_SCALE = {4: 32, 8: 16, 16: 8, 32: 4, 64: 2}   # square plane bsizes
II_TO_INTRA = (0, 1, 2, 9)   # II_DC/V/H/SMOOTH -> DC/V/H/SMOOTH_PRED
_II_MASKS = {}


def ii_mask(mode: int, W: int, H: int) -> np.ndarray:
    """Smooth interintra mask (64 = full intra weight)."""
    key = (mode, W, H)
    m = _II_MASKS.get(key)
    if m is None:
        ss = II_SIZE_SCALE[max(W, H)]
        i = np.arange(H, dtype=np.int64)[:, None]
        j = np.arange(W, dtype=np.int64)[None, :]
        if mode == 1:      # II_V
            m = np.broadcast_to(II_WEIGHTS1D[i * ss], (H, W)).copy()
        elif mode == 2:    # II_H
            m = np.broadcast_to(II_WEIGHTS1D[j * ss], (H, W)).copy()
        elif mode == 3:    # II_SMOOTH
            m = II_WEIGHTS1D[np.minimum(i, j) * ss]
        else:              # II_DC
            m = np.full((H, W), 32, np.int32)
        _II_MASKS[key] = m
    return m


def ii_blend(inter: np.ndarray, intra: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """AOM_BLEND_A64(mask, intra, inter)."""
    out = (mask * intra.astype(np.int64)
           + (64 - mask) * inter.astype(np.int64) + 32) >> 6
    return out.astype(inter.dtype)

# inter mode-decision backends: the native C kernel (one call per frame)
# and the device (TPU) open-loop search (ops/inter_search.py). The device
# rows arrive prefetched through shared["device_rows"] (api.py's
# parallel/pipeline worker, overlapped with the previous frame's commit);
# blocks it does not cover (forced odd-size edge leaves) still go through
# the native kernel. Decisions differ between backends (full-pel grid +
# host subpel refine vs native subpel search) but both commit conformantly.

# inter ext-tx: eset via ext_tx_set_index[1][set_type] (definitions.h:1808):
# DCT_IDTX -> 3, DTT9_IDTX_1DDCT -> 2, ALL16 -> 1; DCT_DCT symbol per
# av1_ext_tx_ind rows (cabac_context_model.h:686)
# eset -> av1_ext_tx_ind row (cabac_context_model.h:686; set types:
# eset 1 = ALL16 (row 5), eset 2 = DTT9_IDTX_1DDCT (row 4),
# eset 3 = DCT_IDTX (row 1)); indexed by TxType 0..15
EXT_TX_IND_INTER = {
    1: [7, 8, 9, 12, 10, 11, 13, 14, 15, 0, 1, 2, 3, 4, 5, 6],
    2: [3, 4, 5, 8, 6, 7, 9, 10, 11, 0, 1, 2, 0, 0, 0, 0],
    3: [1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
}
EXT_TX_NSYMS_INTER = {3: 2, 2: 12, 1: 16}
# inter TX-type search candidates (subset with prebuilt C tables)
INTER_TX_CANDS = (0, 1, 2, 3, 9)   # DCT, ADST_DCT, DCT_ADST, ADST_ADST, IDTX


def inter_chroma_tx_type(luma_tt: int, tx_uv: int) -> int:
    """Inter chroma inherits the luma tx type when it is in the chroma tx
    size's set, else DCT (spec 5.11.40 compute_tx_type)."""
    eset = inter_ext_tx_set(int(tx_uv))
    if eset == 0:
        return 0
    if eset == 3:
        return luma_tt if luma_tt in (0, 9) else 0
    return luma_tt


def inter_ext_tx_set(tx_size: int) -> int:
    if _SQR_UP[tx_size] > 3:
        return 0  # DCT only, no signaling
    if _SQR_UP[tx_size] == 3:
        return 3  # EXT_TX_SET_DCT_IDTX
    if _SQR[tx_size] == 2:
        return 2  # EXT_TX_SET_DTT9_IDTX_1DDCT
    return 1      # EXT_TX_SET_ALL16


def _mv_class(z: int):
    z = int(z)   # numpy ints (from the ME fallback path) lack bit_length
    c = 10 if z >= 2 * 4096 else max((z >> 3).bit_length() - 1, 0)
    base = (2 << (c + 2)) if c else 0
    return c, z - base


class InterFrameEncoder(IntraFrameEncoder):
    def __init__(self, width, height, qindex, ref_planes, bd=8, monochrome=False,
                 sharpness=0, sb_qindex_map=None, gm_mv=(0, 0),
                 golden_planes=None, future_planes=None,
                 ref_distances=(1, 1), ref_select=False, shared=None,
                 inter_depths=(32,), gm_wm=None, inter_bias_pct=100,
                 inter_tx_search=False, golden_const=None,
                 motion_mode_switchable=False, enable_interintra=False,
                 enable_masked_compound=False, rdoq_fast=False,
                 tx_size_search=False, ref3_dist=1,
                 seed_grid=None, switchable_filters=False,
                 device_commit=None, sign_bias=None,
                 skip_mode_present=False, skip_mode_pair=None,
                 skip_mode_weights=(0, 0), inter_rect=False,
                 inter_part4=False, tpl_mvs=None, **kw):
        super().__init__(width, height, qindex, bd=bd, monochrome=monochrome,
                         sharpness=sharpness, sb_qindex_map=sb_qindex_map, **kw)
        # square leaf sizes the partition DP may choose (preset ladder);
        # a single entry keeps the fixed-size walk of rounds 1-2
        self.inter_depths = tuple(sorted(int(d) for d in inter_depths))
        # PARTITION_HORZ/VERT candidates at 16..dmax nodes
        # (product_coding_loop.c:9791-9895)
        self.inter_rect = bool(inter_rect)
        # HORZ_4/VERT_4 strip candidates at 32/64 nodes (research presets)
        self.inter_part4 = bool(inter_part4)
        # AB (HORZ_A/B, VERT_A/B) candidates ride inter_rect; separable
        # for experiments
        self.inter_ab = bool(inter_rect)
        # tune-3 unipred psy bias percent applied to inter costs in the
        # decide kernel (uni_psy_bias/bi_psy_bias, md_process.h:1277)
        self.inter_bias_pct = int(inter_bias_pct)
        self.inter_tx_search = bool(inter_tx_search)
        # frame-level switchable_motion_mode: eligible single-ref blocks
        # code an OBMC flag and may blend neighbor-motion predictions
        self.motion_mode_switchable = bool(motion_mode_switchable)
        # seq enable_interintra_compound: eligible single-ref 8..32 blocks
        # code an interintra flag (read_interintra_mode, spec 5.11.23)
        self.enable_interintra = bool(enable_interintra)
        # seq enable_masked_compound: compound blocks code comp_group_idx
        # and may pick COMPOUND_WEDGE (read_compound_type)
        self.enable_masked_compound = bool(enable_masked_compound)
        # RDOQ eob-fast tier (svt_fast_optimize_b): trim soft eob tails on
        # inter residual blocks (rdoq_ctrls eob_fast analog)
        self.rdoq_fast = bool(rdoq_fast)
        # previous frame's (mv_row, mv_col) mi grids: temporal co-located
        # ME seeds for the decide kernel (mv-merge candidate analog)
        self.seed_grid = seed_grid
        # frame-level interpolation_filter == SWITCHABLE: eligible blocks
        # code interp_filter[0] (dual off) and may use SMOOTH/SHARP MC
        self.switchable_filters = bool(switchable_filters)
        self.leaf_geom = {}     # (mi_row, mi_col) -> (W, H) of decided leaves
        self.inter_txt = {}     # (mi_row, mi_col) -> luma TxType
        # TX-size search: one-depth var-tx splits (TX_MODE_SELECT)
        self.tx_size_search = bool(tx_size_search)
        self.inter_txsplit = {}  # (mi_row, mi_col) -> True (split leaf)
        self.tx_mode_select = False
        # device residual commit (ops/commit.py): None = auto (on when an
        # accelerator is attached), True/False forces
        self.device_commit = device_commit
        self.pre_commit = None
        # order hints: per-ref RefFrameSignBias (spec 7.8) feeding the MV
        # stack extension scans; skip-mode frame state (spec 5.9.22 /
        # 5.11.27) — eligible NEAREST_NEARESTMV zero-residual compound
        # blocks on the skip pair code one skip_mode bit and nothing else
        self.sign_bias = tuple(sign_bias) if sign_bias is not None else None
        # MFMV (use_ref_frame_mvs): projected temporal motion field + the
        # per-ref cur->ref distances; feeds the MV-stack temporal scan in
        # search and both walks (codec/mfmv.py, spec 7.9/7.10.2.5)
        self.tpl_mvs = tpl_mvs
        self.skip_mode_present = bool(skip_mode_present)
        self.skip_mode_pair = skip_mode_pair
        # dist-weight pair (fwd, bck) for skip-mode prediction
        self.skip_mode_weights = tuple(skip_mode_weights)
        self.mi_skip_mode = np.zeros((self.mi_rows, self.mi_cols), np.uint8)
        # ROTZOOM global motion for LAST: wmmat[6] + shear; GLOBALMV blocks
        # >= 8x8 predict through the normative warp filter, and the model
        # projects to a per-block MV at the block center (codec/warp.py)
        self.gm_wm = None
        self.gm_shear = None
        if gm_wm is not None:
            from .warp import get_shear_params

            shear = get_shear_params(gm_wm)
            if shear is not None:
                self.gm_wm = [int(v) for v in gm_wm]
                self.gm_shear = shear
                # decide-kernel approximation: the model's translation part
                gm_mv = (int(gm_wm[1]) >> 13, int(gm_wm[0]) >> 13)
        # global motion (TRANSLATION) vector for LAST, 1/8-pel (row, col);
        # (0, 0) = IDENTITY. GLOBALMV blocks and ref-MV stack padding use it.
        # Other references always code with identity global motion.
        self.gm_mv = tuple(int(v) for v in gm_mv)
        # MC reference padding emulates the decoder's clamp-to-visible-frame
        # reads (spec 7.11.3.2): must cover the longest decided MV — the
        # device search reaches REACH(120) + grid R(12) + subpel + taps
        self.pad = 160
        # `shared` carries expensive per-frame state across the two encode
        # passes of the LR re-encode (padded refs, ME pyramids, decisions)
        self.shared = shared if shared is not None else {}

        def _add_ref(const, planes):
            # session-level cache (api passes "ref_cache"): the same DPB
            # recon serves as a reference for several frames of a GoP, and
            # padding + ME-pyramid construction cost ~7 ms each. Entries
            # validate through a weakref so a recycled id() can never
            # resurface a dead plane's pyramids.
            import weakref

            cache = self.shared.get("ref_cache")
            key = (id(planes[0]), width, height)
            got = None
            if cache is not None:
                ent = cache.get(key)
                if ent is not None and ent[0]() is planes[0]:
                    got = ent[1]
            if got is None:
                padded = self._pad_refs(planes, width, height)
                me = MotionEstimator(np.asarray(
                    padded[0][self.pad:-self.pad or None,
                              self.pad:-self.pad or None]))
                got = (padded, me)
                if cache is not None:
                    cache[key] = (weakref.ref(planes[0]), got)
                    while len(cache) > 24:      # DPB is <= 8 slots
                        cache.pop(next(iter(cache)))
            self.refs[const], self.me[const] = got

        self.refs, self.me = {}, {}
        _add_ref(LAST_FRAME, ref_planes)
        # second reference: a future (higher display order) ALTREF in the
        # hierarchical GoP, else a past single ref -- the GOLDEN key frame
        # or LAST2 (the caller picks via golden_const). One extra ref per
        # frame keeps the decide kernel's 2-ref shape.
        gconst = GOLDEN_FRAME if golden_const is None else int(golden_const)
        self.ref3 = None
        self.ref3_dist = int(max(1, ref3_dist))
        if future_planes is not None:
            _add_ref(ALTREF_FRAME, future_planes)
            if golden_planes is not None:
                # third reference (7-ref roles, pd_process.c:1030-1055):
                # the GoP anchor rides as GOLDEN next to LAST+ALTREF; a
                # post-decide rescue pass flips occluded blocks to it
                _add_ref(GOLDEN_FRAME, golden_planes)
                self.ref3 = GOLDEN_FRAME
        elif golden_planes is not None:
            _add_ref(gconst, golden_planes)
        self.ref2 = (ALTREF_FRAME if future_planes is not None
                     else gconst if golden_planes is not None else None)
        # ME range scales with temporal distance (pyramid leaves search a
        # small window; the GoP top searches wide)
        self.sr = tuple(int(np.clip(16 + 8 * d, 16, 64)) for d in ref_distances)
        self.ref_distances = tuple(int(max(1, abs(d))) for d in ref_distances)
        # compound (REFERENCE_MODE_SELECT): two-ref frames may code blocks
        # with the (LAST, ALTREF) pair averaged (COMPOUND_AVERAGE)
        self.ref_select = bool(ref_select) and self.ref2 == ALTREF_FRAME
        self.grid = MiGrid(self.mi_rows, self.mi_cols)

    def _pad_refs(self, ref_planes, width, height):
        """Pad final (post-filter) recon planes. The decoder clamps MC reads
        to the VISIBLE frame dims (RefUpscaledWidth, spec 7.11.3.2), so pad
        from the visible crop, not the mi-aligned extent."""
        out = []
        for plane, p in enumerate(ref_planes):
            ss = 0 if plane == 0 else 1
            vh = (height + ss) >> ss
            vw = (width + ss) >> ss
            crop = p[:vh, :vw].astype(np.int32)
            ah, aw = p.shape
            out.append(np.pad(
                crop,
                ((self.pad, self.pad + ah - vh), (self.pad, self.pad + aw - vw)),
                mode="edge"))
        return out

    # ------------------------------------------------- decision pre-pass
    def _walk_blocks(self):
        """Leaf blocks (mi_row, mi_col, bsize) in the exact geometry of
        _walk_partition with decisions=None (fixed target size, forced
        HORZ/VERT/SPLIT at frame edges)."""
        out = []
        target_w = int(BLOCK_WIDTH[self.target_bsize])

        def walk(mi_row, mi_col, bsize):
            if mi_row >= self.mi_rows or mi_col >= self.mi_cols:
                return
            bw4 = int(BLOCK_WIDTH[bsize]) >> 2
            half = bw4 >> 1
            has_rows = (mi_row + half) < self.mi_rows
            has_cols = (mi_col + half) < self.mi_cols
            if has_rows and has_cols:
                part = (PartitionType.PARTITION_SPLIT
                        if int(BLOCK_WIDTH[bsize]) > target_w
                        else PartitionType.PARTITION_NONE)
            elif has_cols:
                part = PartitionType.PARTITION_HORZ
            elif has_rows:
                part = PartitionType.PARTITION_VERT
            else:
                part = PartitionType.PARTITION_SPLIT
            subsize = _partition_subsize(bsize, part)
            if part == PartitionType.PARTITION_NONE:
                out.append((mi_row, mi_col, bsize))
            elif part == PartitionType.PARTITION_HORZ:
                out.append((mi_row, mi_col, subsize))
                if mi_row + half < self.mi_rows:
                    out.append((mi_row + half, mi_col, subsize))
            elif part == PartitionType.PARTITION_VERT:
                out.append((mi_row, mi_col, subsize))
                if mi_col + half < self.mi_cols:
                    out.append((mi_row, mi_col + half, subsize))
            else:
                walk(mi_row, mi_col, subsize)
                walk(mi_row, mi_col + half, subsize)
                walk(mi_row + half, mi_col, subsize)
                walk(mi_row + half, mi_col + half, subsize)

        sb_mi = self.sb_size >> 2
        for mi_row in range(0, self.mi_rows, sb_mi):
            for mi_col in range(0, self.mi_cols, sb_mi):
                walk(mi_row, mi_col, BlockSize.BLOCK_64X64)
        return out

    def _closed_device_rows(self):
        """CLOSED-LOOP device decide: the same staged TPU search the
        pipeline runs open-loop (ops/inter_search), but against this
        frame's actual reconstructed references — the open-loop rows'
        one quality gap on long pyramid intervals (source-ref costs
        cannot model recon noise; tools/ab_search.py measured -1.4 dB at
        interval 16). Synchronous: recon only exists at commit time, so
        this search cannot be prefetched; it replaces the native decide
        for the covered (square/rect, grid-aligned) jobs."""
        from ..ops.inter_search import search_frame_np
        from ..profiling import stage
        from .rd import lambda_sse_per_bit

        try:
            with stage("device:inter_search"):
                h, w = self.h, self.w
                src = np.asarray(self.src[0])[:h, :w]
                ref_l = np.asarray(self.me[LAST_FRAME].ref)[:h, :w]
                ref_a = (np.asarray(self.me[self.ref2].ref)[:h, :w]
                         if self.ref2 is not None else None)
                lam = 0.35 * float(lambda_sse_per_bit(self.qindex, self.bd,
                                                      "p"))
                return search_frame_np(
                    src, ref_l, ref_a, self.gm_mv, lam,
                    float(self.psy_rd), float(self.inter_bias_pct),
                    self.bd, depths=self.inter_depths,
                    rect=self.inter_rect)
        except Exception:
            from ..log import svt_warn

            svt_warn("closed-loop device decide unavailable; native")
            return None

    def _decide_jobs(self, jobs):
        """Decision rows + costs for (r, c, W, H) candidate jobs, from the
        prefetched device search where it covers the block (square,
        grid-aligned, depth computed on device) and the native kernel for
        the rest (forced odd-size edge leaves). Returns (res, costj) dicts
        keyed by (r, c, W, H), or None when no backend is available."""
        dr = self.shared.get("device_rows")
        if dr is None and self.shared.get("closed_device_decide"):
            dr = self._closed_device_rows()
        res, costj = {}, {}
        native_jobs = []
        if dr is not None:
            from ..ops.inter_search import pad_dims

            Hp, Wp = pad_dims(self.h, self.w)
            any_dev = False
            for (r, c, w, h) in jobs:
                dv = dr.get(w) if w == h else dr.get((w, h))
                if dv is not None and (r * 4) % h == 0 and (c * 4) % w == 0:
                    idx = (r * 4 // h) * (Wp // w) + (c * 4 // w)
                    row = [int(v) for v in dv[0][idx]]
                    if row[0] == 1 and row[2] == 15:
                        # GLOBALMV rows carry the real (subpel) global MV
                        mv = self.gm_mv if row[1] == 1 else (0, 0)
                        row[3], row[4] = int(mv[0]), int(mv[1])
                    res[(r, c, w, h)] = row
                    costj[(r, c, w, h)] = float(dv[1][idx])
                    any_dev = True
                else:
                    native_jobs.append((r, c, w, h))
            if any_dev:
                self.shared["device_fullpel"] = True
        else:
            native_jobs = list(jobs)
        if native_jobs:
            blocks = np.array([(c * 4, r * 4, w, h)
                               for (r, c, w, h) in native_jobs], np.int32)
            rows = self._native_decide(blocks)
            if rows is None:
                if dr is None or not res:
                    return None
                # no native library: code uncovered edge leaves as intra DC
                for (r, c, w, h) in native_jobs:
                    x0, y0 = c * 4, r * 4
                    blkpx = self.src[0][y0 : y0 + h, x0 : x0 + w] \
                        .astype(np.int64)
                    sse = float(((blkpx - int(blkpx.mean())) ** 2).sum())
                    res[(r, c, w, h)] = [0, 0, 0, 0, 0, 0, 0, 0]
                    costj[(r, c, w, h)] = sse
            else:
                for (r, c, w, h), row in zip(native_jobs, rows):
                    res[(r, c, w, h)] = [int(v) for v in row]
                    costj[(r, c, w, h)] = float(row[7])
        return res, costj

    def _refine_fullpel(self, dec_map):
        """Sub-pel diamond refinement against the real reconstructed
        references of the device search's full-pel NEWMV / NEW_NEWMV
        decisions (the closed-loop MD half of the reference's
        open-loop-ME split; native kernel does this inline)."""
        if not self.shared.pop("device_fullpel", False):
            return
        if not mc_native.available():
            return
        per_ref = {}    # ref const -> [(key, mv_slot), ...]
        for key, d in dec_map.items():
            if not d[0]:
                continue
            if len(d) >= 7 and int(d[2]) >= 17:
                per_ref.setdefault(LAST_FRAME, []).append((key, 3))
                if self.ref2 is not None:
                    per_ref.setdefault(self.ref2, []).append((key, 5))
            elif int(d[2]) == NEWMV:
                rf = d[1] if d[1] in self.me else LAST_FRAME
                per_ref.setdefault(rf, []).append((key, 3))
        filters = self.me[LAST_FRAME]._filters
        for rf, items in per_ref.items():
            blocks = np.empty((len(items), 4), np.int32)
            mvs = np.empty((len(items), 2), np.int32)
            for i, ((r, c), slot) in enumerate(items):
                W, H = self.leaf_geom[(r, c)]
                blocks[i] = (c * 4, r * 4, W, H)
                d = dec_map[(r, c)]
                mvs[i] = (int(d[slot]), int(d[slot + 1]))
            refine = np.ones(len(items), np.uint8)
            if mc_native.subpel_refine_blocks(
                    self.src[0], self.me[rf].ref, filters, self.bd,
                    blocks, refine, mvs) is None:
                return
            for i, ((r, c), slot) in enumerate(items):
                d = list(dec_map[(r, c)])
                d[slot], d[slot + 1] = int(mvs[i, 0]), int(mvs[i, 1])
                dec_map[(r, c)] = tuple(d)

    def _native_decide(self, blocks):
        """One native call: decision rows (N, 8) for (x0, y0, W, H) blocks
        (mc_native.inter_decide_frame over the frame's reference state)."""
        from ..profiling import stage
        with stage("host:inter_decide"):
            return self._native_decide_timed(blocks)

    def _native_decide_timed(self, blocks):
        me = self.me[LAST_FRAME]
        curq = me._cur_pyramid(self.src[0])
        from .spec_tables import get_tables

        filters4 = np.ascontiguousarray(
            get_tables()._raw["interp_sub_pel_filters_4"], np.int32)
        golden = None
        ref2_gate = 4       # search ref2 when residual > (W*H) << 4
        if self.ref2 is not None:
            mg = self.me[self.ref2]
            golden = (mg.ref, mg.ref_q,
                      np.ascontiguousarray(self.refs[self.ref2][0], np.int32))
            if self.ref2 == ALTREF_FRAME:
                ref2_gate = -1  # B frame: always search the future reference
        ref_pad = np.ascontiguousarray(self.refs[LAST_FRAME][0], np.int32)
        tseed = None
        if self.seed_grid is not None:
            pr, pc = self.seed_grid
            b = np.asarray(blocks, np.int32)
            r = np.clip(b[:, 1] >> 2, 0, pr.shape[0] - 1)
            c = np.clip(b[:, 0] >> 2, 0, pr.shape[1] - 1)
            tdy = (pr[r, c].astype(np.int32) >> 3)
            tdx = (pc[r, c].astype(np.int32) >> 3)
            tseed = (np.ascontiguousarray(tdy, np.int32),
                     np.ascontiguousarray(tdx, np.int32))
        # device-search MVs as per-block seeds (long-interval frames where
        # the open-loop rows are not trusted as decisions): the dual-
        # pyramid HME already covered the +/-128 reach, so the native
        # kernel's own HME grid shrinks to a local refinement
        sr0, sr1 = self.sr
        dsr = self.shared.get("device_seed_rows")
        if dsr is not None:
            from ..ops.inter_search import pad_dims

            Hp, Wp = pad_dims(self.h, self.w)
            b = np.asarray(blocks, np.int32)
            nb = len(b)
            if tseed is None:
                tseed = (np.full(nb, np.iinfo(np.int32).max, np.int32),
                         np.full(nb, np.iinfo(np.int32).max, np.int32))
            n_seeded = 0
            for i in range(nb):
                x0, y0, w, h = (int(b[i, 0]), int(b[i, 1]),
                                int(b[i, 2]), int(b[i, 3]))
                dv = dsr.get(w) if w == h else dsr.get((w, h))
                if dv is None or (y0 % h) or (x0 % w):
                    continue
                idx = (y0 // h) * (Wp // w) + (x0 // w)
                row = dv[0][idx]
                if row[0] == 1 and row[2] >= 16:
                    # decided NEWMV / compound: first MV
                    tseed[0][i] = int(row[3]) >> 3
                    tseed[1][i] = int(row[4]) >> 3
                else:
                    # intra/zero rows stash the best single-ref MV in the
                    # mv2 slots (depth_stage row packing)
                    tseed[0][i] = int(row[5]) >> 3
                    tseed[1][i] = int(row[6]) >> 3
                n_seeded += 1
            # (shrinking the grid range when seeds cover the frame was
            # tried twice and measurably hurt at long intervals — the
            # native HME still finds better full-pel MVs than the rate-
            # weighted device grid argmin; seeds stay candidates + pruning
            # bounds only)
        return mc_native.inter_decide_frame(
            self.src[0], me.ref, me.ref_q, curq, ref_pad, self.pad, golden,
            me._filters, filters4, self.bd, sr0, self.gm_mv,
            float(self.psy_rd), blocks, ref2_gate=ref2_gate,
            search_range2=sr1, inter_bias_pct=self.inter_bias_pct,
            tseed=tseed, ref_dists=self.ref_distances)

    def _dec_from_row(self, row):
        """Kernel row -> decision tuple. The kernel reports the second
        reference as 4; mode-24 rows are COMPOUND_AVERAGE NEW_NEWMV."""
        ui, rf, md = row[0], row[1], row[2]
        if ui and md >= 17:
            if self.ref_select:
                return (1, 7, md, row[3], row[4], row[5], row[6])
            return (1, LAST_FRAME, NEWMV, row[3], row[4])
        if ui and rf == 4:
            rf = self.ref2
        return (ui, rf, md, row[3], row[4])

    def _pre_walk(self):
        """Whole-frame mode-decision pre-pass: device-prefetched rows or
        one native call evaluate NEWMV/GLOBALMV (+ gated ref2/compound)
        and an open-loop intra fallback for every leaf block; the walk
        below commits the decisions (the reference's MD/EncDec split,
        re-architected as batch-then-walk)."""
        self._pre_walk_decide()
        self._feature_pre_search()
        if self.inter_txsplit:
            # var-tx split coding lives only in the C walk; the Python
            # fallback codes TX_MODE_LARGEST, so the frame header must
            # agree with whichever walk will actually run (eligibility is
            # final only after the feature pre-pass sets self.feat)
            from . import walk_native

            if not walk_native.eligible(self):
                # drop the split decisions AND their tx types: a split
                # leaf's stored type is the CHILD's, which may be outside
                # the parent tx size's set (e.g. ADST at 32x32)
                for k in self.inter_txsplit:
                    self.inter_txt.pop(k, None)
                self.inter_txsplit = {}
                self.tx_mode_select = False
                self.shared["inter_txt"] = self.inter_txt
                self.shared["inter_txsplit"] = {}
                self.shared["tx_mode_select"] = False
        self._device_commit()

    def _feature_pre_search(self):
        """Batched search for the p<=6 block features (switchable filter,
        interintra, OBMC, masked compound) over all decided leaves in ONE
        native call (walk_native.feature_search) — the batch-then-walk
        re-architecture of the per-candidate trials the reference runs
        inside md_encode_block (product_coding_loop.c). Falls back to the
        walks' inline per-block search when the native library is absent
        (self.feat stays None). Warp (gm_wm) frames keep the inline path:
        their GLOBALMV predictions are warped, which the open-loop search
        does not model."""
        self.feat = None
        if getattr(self, "inter_dec", None) is None or self.gm_wm is not None:
            return
        if not (self.switchable_filters or self.enable_interintra
                or self.enable_masked_compound
                or self.motion_mode_switchable):
            return
        if self.shared.get("feat") is not None:
            self.feat = self.shared["feat"]
            return
        from . import walk_native

        if walk_native.feature_search(self):
            self.shared["feat"] = self.feat

    def _device_commit(self):
        """Device residual commit (ops/commit.py): batch-run pred/TX/
        quant/recon for the decided inter leaves on the accelerator; the
        C walk then only does syntax + range coding for them."""
        want = self.device_commit
        if want is None:
            # "auto" resolves to OFF on the tunneled single-chip link:
            # the commit's per-frame recon/ref transfers (~2 MB at
            # ~30-80 MB/s + ~28 ms RTT) exceed the host leg it replaces,
            # which the lane-batched walk_precommit already cut to
            # ~30 ms/frame. The path stays fully wired and bit-exact
            # (commit-backend=device, tests/test_commit.py,
            # tests/test_tpu_hw.py); it becomes the profitable default
            # once recon is device-resident (filters-backend=device
            # closes that loop on untunneled hardware).
            want = False
        if want and self.plane_dq[1:3] != self.plane_dq[3:5]:
            # the device commit shares one chroma quant row for u and v;
            # per-plane u != v deltas (chroma_*_qindex_offset) take the
            # host walk instead
            want = False
        if not want or getattr(self, "inter_dec", None) is None:
            return
        from . import walk_native

        if not walk_native.eligible(self):
            return
        from ..profiling import stage

        if "pre_commit" in self.shared:    # LR re-encode / later tiles
            res = self.shared["pre_commit"]
        else:
            try:
                from ..ops.commit import commit_frame

                # exclusive profiling: the device:* sub-stages inside
                # commit_frame account the device time; this wrapper's
                # own span is host glue (leaf enumeration + unpack)
                with stage("host:commit_glue"):
                    res = commit_frame(self)
            except Exception:
                import traceback

                traceback.print_exc()
                res = None
            self.shared["pre_commit"] = res
        if res is None:
            return
        self.pre_commit = res
        for p in range(self.nplanes):
            self.planes[p].recon[:] = res.recon[p]

    def _pre_walk_decide(self):
        self.inter_dec = self.shared.get("inter_dec")
        if self.inter_dec is not None:
            self.decisions = self.shared.get("inter_decisions")
            self.inter_txt = self.shared.get("inter_txt", {})
            self.inter_txsplit = self.shared.get("inter_txsplit", {})
            self.tx_mode_select = self.shared.get("tx_mode_select", False)
            return
        have_dev = self.shared.get("device_rows") is not None
        if not mc_native.available() and not have_dev:
            return
        if len(self.inter_depths) > 1 or have_dev:
            if self._pre_walk_multi():
                return
        blk = self._walk_blocks()
        blocks = np.array([(mi_col * 4, mi_row * 4,
                            int(BLOCK_WIDTH[bs]), int(BLOCK_HEIGHT[bs]))
                           for (mi_row, mi_col, bs) in blk], np.int32)
        dec = self._native_decide(blocks)
        if dec is None:
            return
        self.inter_dec = {}
        for i, (r, c, bs) in enumerate(blk):
            row = [int(v) for v in dec[i]]
            t = self._dec_from_row(row)
            W, H = int(BLOCK_WIDTH[bs]), int(BLOCK_HEIGHT[bs])
            if self.gm_wm is not None:
                t = self._warp_upgrade_dec(r, c, W, H, t, row[7])
            self.inter_dec[(r, c)] = t
            self.leaf_geom[(r, c)] = (W, H)
        self._inter_tx_search()
        self.shared["inter_dec"] = self.inter_dec

    def _pre_walk_multi(self):
        """Inter partition RDO: evaluate every center-inside square node at
        the preset's depths (+ the forced rectangular edge leaves) in one
        native call, then a bottom-up NONE-vs-SPLIT DP with partition-rate
        bits picks the tree (the inter analog of intra_rdo's DP; reference:
        md_encode_block partition recursion, product_coding_loop.c:10862).
        Emits self.decisions (parts maps) + self.inter_dec (chosen leaves).
        Returns False to fall back to the fixed-size walk."""
        from .intra_rdo import IntraDecisions
        from .rd import intra_rate_model, lambda_sse_per_bit

        dmin, dmax = self.inter_depths[0], self.inter_depths[-1]
        cands, forced, rect_jobs = [], [], []

        def collect(r, c, S):
            if r >= self.mi_rows or c >= self.mi_cols:
                return
            half = S >> 3
            has_rows = (r + half) < self.mi_rows
            has_cols = (c + half) < self.mi_cols
            bsize = _BSIZE_BY_WH[(S, S)]
            if has_rows and has_cols:
                if S <= dmax:
                    cands.append((r, c, S))
                    if self.inter_rect and S >= 16:
                        # HORZ/VERT halves of this node
                        # (product_coding_loop.c:9791)
                        rect_jobs.append((r, c, S, S >> 1))
                        rect_jobs.append((r + half, c, S, S >> 1))
                        rect_jobs.append((r, c, S >> 1, S))
                        rect_jobs.append((r, c + half, S >> 1, S))
                        if self.inter_part4 and S >= 32:
                            # HORZ_4/VERT_4 strips (>= 32: the 16x4
                            # strips' sub-4 chroma rules stay out)
                            sm = S >> 4        # strip pitch in mi units
                            for i in range(4):
                                rect_jobs.append((r + i * sm, c, S, S >> 2))
                                rect_jobs.append((r, c + i * sm, S >> 2, S))
                if S > dmin:
                    S2 = S >> 1
                    collect(r, c, S2)
                    collect(r, c + half, S2)
                    collect(r + half, c, S2)
                    collect(r + half, c + half, S2)
            elif has_cols:
                sub = _partition_subsize(bsize, PartitionType.PARTITION_HORZ)
                forced.append((r, c, sub))
                if r + half < self.mi_rows:
                    forced.append((r + half, c, sub))
            elif has_rows:
                sub = _partition_subsize(bsize, PartitionType.PARTITION_VERT)
                forced.append((r, c, sub))
                if c + half < self.mi_cols:
                    forced.append((r, c + half, sub))
            else:
                S2 = S >> 1
                collect(r, c, S2)
                collect(r, c + half, S2)
                collect(r + half, c, S2)
                collect(r + half, c + half, S2)

        sb_mi = self.sb_size >> 2
        for r0 in range(0, self.mi_rows, sb_mi):
            for c0 in range(0, self.mi_cols, sb_mi):
                collect(r0, c0, 64)

        jobs = [(r, c, S, S) for (r, c, S) in cands]
        jobs += [(r, c, int(BLOCK_WIDTH[bs]), int(BLOCK_HEIGHT[bs]))
                 for (r, c, bs) in forced]
        jobs += rect_jobs
        got = self._decide_jobs(jobs)
        if got is None:
            return False
        res, costj = got

        # 0.35x lambda: the kernel cost is SSE-only (no per-candidate rate),
        # so a full-strength lambda over-merges at high q (blurry 64x64
        # leaves on B frames); the reduced weight restores the RA-vs-LD margin
        # while keeping the preset-4 byte savings (measured on the pan set)
        lam = 0.35 * float(lambda_sse_per_bit(self.qindex, self.bd, "p"))
        rm = intra_rate_model(int(self.qindex))
        BSL = {8: 0, 16: 1, 32: 2, 64: 3}
        LEAF_BITS = 24.0   # flat mode/mv/skip overhead per coded leaf
        memo = {}

        def ncost(r, c, S):
            if r >= self.mi_rows or c >= self.mi_cols:
                return 0.0
            key = (r, c, S)
            got = memo.get(key)
            if got is not None:
                return got[0]
            half = S >> 3
            has_rows = (r + half) < self.mi_rows
            has_cols = (c + half) < self.mi_cols
            bsize = _BSIZE_BY_WH[(S, S)]
            split = 0   # chosen partition: 0 NONE, 1 SPLIT, 2 HORZ, 3 VERT
            if has_rows and has_cols:
                none_cost = np.inf
                if S <= dmax:
                    none_cost = (costj[(r, c, S, S)]
                                 + lam * (float(rm.part_none_bits[BSL[S]])
                                          + LEAF_BITS))
                split_cost = np.inf
                if S > dmin:
                    S2 = S >> 1
                    split_cost = (ncost(r, c, S2) + ncost(r, c + half, S2)
                                  + ncost(r + half, c, S2)
                                  + ncost(r + half, c + half, S2)
                                  + lam * float(rm.part_split_bits[BSL[S]]))
                horz_cost = vert_cost = np.inf
                ab_cost = [np.inf] * 4   # HORZ_A, HORZ_B, VERT_A, VERT_B
                do_ab = self.inter_ab
                if self.inter_rect and S >= 16 and S <= dmax:
                    horz_cost = (costj[(r, c, S, S >> 1)]
                                 + costj[(r + half, c, S, S >> 1)]
                                 + lam * (float(rm.part_horz_bits[BSL[S]])
                                          + 2 * LEAF_BITS))
                    vert_cost = (costj[(r, c, S >> 1, S)]
                                 + costj[(r, c + half, S >> 1, S)]
                                 + lam * (float(rm.part_vert_bits[BSL[S]])
                                          + 2 * LEAF_BITS))
                    # AB partitions (product_coding_loop.c:9791): priced
                    # from costs the job set already computed (quarter
                    # squares + rect halves) - no extra native searches
                    S2 = S >> 1

                    def q(rr, cc):
                        return costj.get((rr, cc, S2, S2))

                    combos = (
                        (q(r, c), q(r, c + half),
                         costj.get((r + half, c, S, S2))),        # HORZ_A
                        (costj.get((r, c, S, S2)),
                         q(r + half, c), q(r + half, c + half)),  # HORZ_B
                        (q(r, c), q(r + half, c),
                         costj.get((r, c + half, S2, S))),        # VERT_A
                        (costj.get((r, c, S2, S)),
                         q(r, c + half), q(r + half, c + half)),  # VERT_B
                    )
                    for i, parts3 in enumerate(combos):
                        if not do_ab:
                            break
                        if all(p is not None for p in parts3):
                            ab_cost[i] = (float(sum(parts3))
                                          + lam * (float(rm.part_split_bits[BSL[S]])
                                                   + 3 * LEAF_BITS))
                h4_cost = v4_cost = np.inf
                if self.inter_part4 and self.inter_rect \
                        and 32 <= S <= dmax:
                    sm = S >> 4
                    h4 = [costj.get((r + i * sm, c, S, S >> 2))
                          for i in range(4)]
                    v4 = [costj.get((r, c + i * sm, S >> 2, S))
                          for i in range(4)]
                    if all(x is not None for x in h4):
                        h4_cost = (float(sum(h4))
                                   + lam * (float(rm.part_split_bits[BSL[S]])
                                            + 4 * LEAF_BITS))
                    if all(x is not None for x in v4):
                        v4_cost = (float(sum(v4))
                                   + lam * (float(rm.part_split_bits[BSL[S]])
                                            + 4 * LEAF_BITS))
                cost = none_cost
                if split_cost < cost:
                    cost, split = split_cost, 1
                if horz_cost < cost:
                    cost, split = horz_cost, 2
                if vert_cost < cost:
                    cost, split = vert_cost, 3
                for i, acst in enumerate(ab_cost):
                    if acst < cost:
                        cost, split = acst, 4 + i
                if h4_cost < cost:
                    cost, split = h4_cost, 8
                if v4_cost < cost:
                    cost, split = v4_cost, 9
            elif has_cols:
                sub = _partition_subsize(bsize, PartitionType.PARTITION_HORZ)
                w, h = int(BLOCK_WIDTH[sub]), int(BLOCK_HEIGHT[sub])
                cost = costj[(r, c, w, h)] + lam * LEAF_BITS
                if r + half < self.mi_rows:
                    cost += costj[(r + half, c, w, h)] + lam * LEAF_BITS
            elif has_rows:
                sub = _partition_subsize(bsize, PartitionType.PARTITION_VERT)
                w, h = int(BLOCK_WIDTH[sub]), int(BLOCK_HEIGHT[sub])
                cost = costj[(r, c, w, h)] + lam * LEAF_BITS
                if c + half < self.mi_cols:
                    cost += costj[(r, c + half, w, h)] + lam * LEAF_BITS
            else:
                S2 = S >> 1
                cost = (ncost(r, c, S2) + ncost(r, c + half, S2)
                        + ncost(r + half, c, S2)
                        + ncost(r + half, c + half, S2))
            memo[key] = (cost, split)
            return cost

        for r0 in range(0, self.mi_rows, sb_mi):
            for c0 in range(0, self.mi_cols, sb_mi):
                ncost(r0, c0, 64)

        parts = {}
        for S in self.inter_depths:
            if S > dmin:
                gr = -((-self.mi_rows * 4) // S)
                gc = -((-self.mi_cols * 4) // S)
                parts[S] = np.zeros((gr, gc), bool)
        rects = {}
        if self.inter_rect:
            # all sizes 16..dmax: frame-corner nodes recurse below dmin,
            # so rect choices can appear at any node size
            S = 16
            while S <= dmax:
                gr = -((-self.mi_rows * 4) // S)
                gc = -((-self.mi_cols * 4) // S)
                rects[S] = np.zeros((gr, gc), np.uint8)
                S <<= 1
        dec_map = {}

        def extract(r, c, S):
            if r >= self.mi_rows or c >= self.mi_cols:
                return
            half = S >> 3
            has_rows = (r + half) < self.mi_rows
            has_cols = (c + half) < self.mi_cols
            bsize = _BSIZE_BY_WH[(S, S)]
            if has_rows and has_cols:
                part = memo[(r, c, S)][1] if S <= dmax else 1
                if part >= 8:         # HORZ_4/VERT_4: four strips
                    rects[S][(r * 4) // S, (c * 4) // S] = part
                    sm = S >> 4
                    if part == 8:
                        geoms4 = tuple(((r + i * sm, c), S, S >> 2)
                                       for i in range(4))
                    else:
                        geoms4 = tuple(((r, c + i * sm), S >> 2, S)
                                       for i in range(4))
                    for ((rr, cc), w_, h_) in geoms4:
                        t = self._dec_from_row(res[(rr, cc, w_, h_)])
                        if self.gm_wm is not None:
                            t = self._warp_upgrade_dec(
                                rr, cc, w_, h_, t, costj[(rr, cc, w_, h_)])
                        dec_map[(rr, cc)] = t
                        self.leaf_geom[(rr, cc)] = (w_, h_)
                elif part >= 4:       # AB: two quarters + one rect half
                    rects[S][(r * 4) // S, (c * 4) // S] = part
                    S2 = S >> 1
                    geoms3 = {
                        4: (((r, c), S2, S2), ((r, c + half), S2, S2),
                            ((r + half, c), S, S2)),
                        5: (((r, c), S, S2), ((r + half, c), S2, S2),
                            ((r + half, c + half), S2, S2)),
                        6: (((r, c), S2, S2), ((r + half, c), S2, S2),
                            ((r, c + half), S2, S)),
                        7: (((r, c), S2, S), ((r, c + half), S2, S2),
                            ((r + half, c + half), S2, S2)),
                    }[part]
                    for ((rr, cc), w_, h_) in geoms3:
                        t = self._dec_from_row(res[(rr, cc, w_, h_)])
                        if self.gm_wm is not None:
                            t = self._warp_upgrade_dec(
                                rr, cc, w_, h_, t, costj[(rr, cc, w_, h_)])
                        dec_map[(rr, cc)] = t
                        self.leaf_geom[(rr, cc)] = (w_, h_)
                elif part >= 2:
                    rects[S][(r * 4) // S, (c * 4) // S] = part
                    if part == 2:     # HORZ: two SxS/2 leaves
                        geoms = ((r, c), (r + half, c))
                        w_, h_ = S, S >> 1
                    else:             # VERT
                        geoms = ((r, c), (r, c + half))
                        w_, h_ = S >> 1, S
                    for (rr, cc) in geoms:
                        t = self._dec_from_row(res[(rr, cc, w_, h_)])
                        if self.gm_wm is not None:
                            t = self._warp_upgrade_dec(
                                rr, cc, w_, h_, t, costj[(rr, cc, w_, h_)])
                        dec_map[(rr, cc)] = t
                        self.leaf_geom[(rr, cc)] = (w_, h_)
                elif S > dmin and part == 1:
                    p = parts.get(S)
                    if p is not None:
                        p[(r * 4) // S, (c * 4) // S] = True
                    S2 = S >> 1
                    extract(r, c, S2)
                    extract(r, c + half, S2)
                    extract(r + half, c, S2)
                    extract(r + half, c + half, S2)
                else:
                    t = self._dec_from_row(res[(r, c, S, S)])
                    if self.gm_wm is not None:
                        t = self._warp_upgrade_dec(r, c, S, S, t,
                                                   costj[(r, c, S, S)])
                    dec_map[(r, c)] = t
                    self.leaf_geom[(r, c)] = (S, S)
            elif has_cols:
                sub = _partition_subsize(bsize, PartitionType.PARTITION_HORZ)
                w, h = int(BLOCK_WIDTH[sub]), int(BLOCK_HEIGHT[sub])
                for (rr, cc) in (((r, c),) + (((r + half, c),)
                                 if r + half < self.mi_rows else ())):
                    t = self._dec_from_row(res[(rr, cc, w, h)])
                    if self.gm_wm is not None:
                        t = self._warp_upgrade_dec(rr, cc, w, h, t,
                                                   costj[(rr, cc, w, h)])
                    dec_map[(rr, cc)] = t
                    self.leaf_geom[(rr, cc)] = (w, h)
            elif has_rows:
                sub = _partition_subsize(bsize, PartitionType.PARTITION_VERT)
                w, h = int(BLOCK_WIDTH[sub]), int(BLOCK_HEIGHT[sub])
                for (rr, cc) in (((r, c),) + (((r, c + half),)
                                 if c + half < self.mi_cols else ())):
                    t = self._dec_from_row(res[(rr, cc, w, h)])
                    if self.gm_wm is not None:
                        t = self._warp_upgrade_dec(rr, cc, w, h, t,
                                                   costj[(rr, cc, w, h)])
                    dec_map[(rr, cc)] = t
                    self.leaf_geom[(rr, cc)] = (w, h)
            else:
                S2 = S >> 1
                extract(r, c, S2)
                extract(r, c + half, S2)
                extract(r + half, c, S2)
                extract(r + half, c + half, S2)

        for r0 in range(0, self.mi_rows, sb_mi):
            for c0 in range(0, self.mi_cols, sb_mi):
                extract(r0, c0, 64)

        self._refine_fullpel(dec_map)
        self._third_ref_rescue(dec_map, costj)
        dec_obj = IntraDecisions(parts=parts, modes={}, tx_types={},
                                 max_leaf=dmax, min_leaf=dmin, rect=rects)
        self.decisions = dec_obj
        self.inter_dec = dec_map
        self._inter_tx_search()
        self.shared["inter_dec"] = dec_map
        self.shared["inter_decisions"] = dec_obj
        return True

    def _third_ref_rescue(self, dec_map, costj):
        """7-ref increment (pd_process.c:1030-1055 roles): re-search
        poorly-predicted leaves against the GoP anchor (GOLDEN) and flip
        them when the closed-loop cost improves — the long-range past ref
        rescues occlusions/uncovered background the (LAST, ALTREF)
        interval pair cannot see."""
        if self.ref3 is None or not mc_native.available():
            return
        if max(self.ref_distances) < 2:
            # interval-1 leaves see what the anchor sees; the rescue pays
            # on referenced layers (bench: unconditional rescue cost ~25%
            # of the p6 decide leg on pans)
            return
        cand = []
        for (r, c), (w, h) in self.leaf_geom.items():
            d = dec_map.get((r, c))
            if d is None:
                continue
            cost = costj.get((r, c, w, h))
            # rescue threshold: ~32 SSE/px (well-predicted blocks skip
            # the second search; the kernel costs are SSE+psy domain)
            if cost is not None and cost > float((w * h) << 5):
                cand.append((r, c, w, h, float(cost)))
        if not cand:
            return
        # cap the second search at the worst eighth of the leaves (noisy
        # content trips the threshold everywhere; the rescue targets
        # outliers, not the whole frame)
        cap = max(16, len(self.leaf_geom) >> 3)
        if len(cand) > cap:
            cand.sort(key=lambda t: -t[4])
            cand = cand[:cap]
        blocks = np.array([(c * 4, r * 4, w, h)
                           for (r, c, w, h, _) in cand], np.int32)
        me3 = self.me[self.ref3]
        me = self.me[LAST_FRAME]
        curq = me._cur_pyramid(self.src[0])
        from .spec_tables import get_tables

        filters4 = np.ascontiguousarray(
            get_tables()._raw["interp_sub_pel_filters_4"], np.int32)
        ref_pad3 = np.ascontiguousarray(self.refs[self.ref3][0], np.int32)
        sr3 = int(np.clip(16 + 8 * self.ref3_dist, 16, 64))
        from ..profiling import stage

        with stage("host:inter_decide"):
            rows = mc_native.inter_decide_frame(
                self.src[0], me3.ref, me3.ref_q, curq, ref_pad3, self.pad,
                None, me3._filters, filters4, self.bd, sr3, (0, 0),
                float(self.psy_rd), blocks, ref2_gate=4,
                search_range2=sr3, inter_bias_pct=self.inter_bias_pct,
                tseed=None, ref_dists=(self.ref3_dist, self.ref3_dist))
        if rows is None:
            return
        for (r, c, w, h, old), row in zip(cand, rows):
            ui, md = int(row[0]), int(row[2])
            # accept only clear wins (10% margin pays the ref-frame bits)
            if ui != 1 or md not in (15, 16) or float(row[7]) >= 0.9 * old:
                continue
            # GLOBALMV on a non-LAST ref is identity (zero MV)
            mv = (0, 0) if md == 15 else (int(row[3]), int(row[4]))
            dec_map[(r, c)] = (1, self.ref3, md, mv[0], mv[1])

    def _leaf_pred_luma(self, r, c, W, H, d):
        """Luma prediction of a decided inter leaf (mirrors _encode_block's
        commit exactly, so the search residual equals the coded one)."""
        x0, y0 = c * 4, r * 4
        if len(d) >= 7 and d[0] and int(d[2]) >= 17:
            return self._mc_pred_compound(0, x0, y0, W, H,
                                          (d[3], d[4]), (d[5], d[6]))
        if d[0]:
            if (int(d[2]) == GLOBALMV and d[1] == LAST_FRAME
                    and self.gm_wm is not None):
                mv = self._gm_block(r, c, W, H)
                return (self._warp_pred(0, x0, y0, W, H) if min(W, H) >= 8
                        else self._mc_pred(0, x0, y0, W, H, mv))
            return self._mc_pred(0, x0, y0, W, H, (d[3], d[4]), d[1])
        return None

    def _inter_tx_search(self):
        """Pre-pass inter TX-type search (the full-loop TX search of
        full_loop.c:2280, decision-level): batched fwd/quant/inv per
        candidate over all square inter leaves; picks min SSE + lam*bits.
        Conformance is untouched -- the walks just code the chosen type."""
        if not self.inter_tx_search or self.qindex == 0:
            self.shared["inter_txt"] = self.inter_txt
            return
        from ..profiling import stage

        with stage("host:tx_search"):
            self._inter_tx_search_timed()

    def _inter_tx_search_timed(self):
        from .rd import lambda_sse_per_bit

        lam = float(lambda_sse_per_bit(self.qindex, self.bd, "p"))
        groups = {}
        for (r, c), d in self.inter_dec.items():
            if not d[0]:
                continue
            geom = self.leaf_geom.get((r, c))
            if geom is None:
                continue
            W, H = geom
            if W != H or W > 32:       # square 8/16/32 (prebuilt C tables)
                continue
            groups.setdefault(W, []).append((r, c, d))
        # TX-SIZE search (perform_tx_partitioning, product_coding_loop.c
        # :5307, Docs/Appendix-TX-Search.md): also price each leaf's
        # one-depth var-tx split; splits engage TX_MODE_SELECT and the C
        # walk codes the txfm_partition tree. Gated off under an explicit
        # device commit (prefilled leaves quantize at the block tx).
        # qindex gate: measured on the 480p p6 A/B clip, splits win at
        # crf 25/35 (-0.6%/-0.2% bytes, +0.05 dB) but lose slightly at
        # crf 45 (+0.6% bytes) - residuals coarse enough to quantize away
        # rarely pay the partition-flag rate
        do_split = (self.tx_size_search and self.device_commit is not True
                    and 0 < self.qindex <= 160 and self.gm_wm is None
                    and self.use_native_ec)
        mid = 1 << 12   # signed-residual bias for inverse_transform_add

        def tx_costs(resids, W, extra_bits):
            """(len(cands), n) RD costs at the W-square tx; resids
            (n, W, W)."""
            tx = int(MAX_TX_RECT[_BSIZE_BY_WH[(W, W)]])
            eset = inter_ext_tx_set(tx)
            cands = (0, 9) if eset == 3 else INTER_TX_CANDS
            n = len(resids)
            costs = np.empty((len(cands), n), np.float64)
            for ci, tt in enumerate(cands):
                co = forward_transform_2d(resids.astype(np.int32), tx, tt,
                                          self.bd)
                cw = min(W, 32)
                flat = co[:, :cw, :cw].reshape(n, -1)
                scan = self.tables.scan(tx, tt)
                qmt, iqmt = self._get_qm(0, tx, tt)
                qc, dqc, eob = quantize_b(flat, scan, self.quant[0], tx,
                                          qm=qmt, iqm=iqmt)
                full = np.zeros((n, W, W), np.int32)
                full[:, :cw, :cw] = dqc.reshape(n, cw, cw)
                rec = inverse_transform_add(
                    full, np.full((n, W, W), mid, np.uint16), tx, tt, 13)
                err = rec.astype(np.int64) - mid - resids
                dist = (err * err).sum(axis=(1, 2)).astype(np.float64)
                aq = np.abs(qc)
                bits = ((aq > 0).sum(axis=1) * 2.0
                        + np.log2(aq.astype(np.float64) + 1).sum(axis=1))
                bits += (eob > 0) * 4.0 + (2.0 if tt != 0 else 0.0)
                costs[ci] = dist + lam * (bits + extra_bits)
            return cands, costs

        for W, items in groups.items():
            n = len(items)
            resids = np.empty((n, W, W), np.int32)
            for k, (r, c, d) in enumerate(items):
                pred = self._leaf_pred_luma(r, c, W, W, d)
                x0, y0 = c * 4, r * 4
                src = self.src[0][y0 : y0 + W, x0 : x0 + W]
                resids[k] = src.astype(np.int32) - pred.astype(np.int32)
            cands, costs = tx_costs(resids, W, 0.0)
            best = np.argmin(costs, axis=0)
            full_cost = costs[best, np.arange(n)]
            split_tt = split_cost = None
            if do_split and W >= 8:
                h = W >> 1
                quads = (resids.reshape(n, 2, h, 2, h).swapaxes(2, 3)
                         .reshape(n * 4, h, h))
                scand, scosts = tx_costs(quads, h, 0.0)
                per_blk = scosts.reshape(len(scand), n, 4).sum(axis=2)
                # + partition flags (1 parent + 4 child txfm_split bits)
                per_blk += lam * 5.0
                sbest = np.argmin(per_blk, axis=0)
                split_cost = per_blk[sbest, np.arange(n)]
                split_tt = [int(scand[i]) for i in sbest]
            for k, (r, c, d) in enumerate(items):
                if split_cost is not None and split_cost[k] < full_cost[k]:
                    self.inter_txsplit[(r, c)] = True
                    if split_tt[k]:
                        self.inter_txt[(r, c)] = split_tt[k]
                    continue
                tt = int(cands[int(best[k])])
                if tt:
                    self.inter_txt[(r, c)] = tt
        self.tx_mode_select = bool(self.inter_txsplit)
        self.shared["inter_txt"] = self.inter_txt
        self.shared["inter_txsplit"] = self.inter_txsplit
        self.shared["tx_mode_select"] = self.tx_mode_select

    def _obmc_eligible(self, mi_row, mi_col, W, H, y_mode, ref_sel, is_comp):
        """motion_mode_allowed == OBMC_CAUSAL (entropy_coding.c:1234):
        the obmc flag is coded (and OBMC may be used) exactly here."""
        if not self.motion_mode_switchable or is_comp:
            return False
        if min(W, H) < 8:
            return False
        if (int(y_mode) == GLOBALMV and ref_sel == LAST_FRAME
                and self.gm_wm is not None):
            return False    # is_global_mv_block: warp model, no motion mode
        from .obmc import overlappable_count

        return overlappable_count(self, mi_row, mi_col, W >> 2, H >> 2) > 0

    # -------------------------------------------------------------- helpers
    def _gm_block(self, mi_row, mi_col, W, H):
        """Projected ROTZOOM MV at the block center (gm_get_motion_vector)."""
        from .warp import ROTZOOM, gm_get_motion_vector

        return gm_get_motion_vector(ROTZOOM, self.gm_wm, mi_row, mi_col, W, H)

    def _gm_stack_mv(self, mi_row, mi_col, W, H, ref_sel):
        """gm vector used by the ref-MV stack for this block/ref."""
        if ref_sel == LAST_FRAME:
            if self.gm_wm is not None:
                return self._gm_block(mi_row, mi_col, W, H)
            return self.gm_mv
        return (0, 0)

    def _warp_pred(self, plane, px, py, pw, ph):
        """Normative warp prediction from the LAST recon (visible crop).
        Luma slices the whole-plane cache (8-aligned leaves only exist);
        chroma blocks can sit off the 8-grid, so they warp per block."""
        from .warp import ROTZOOM, warp_plane

        if plane == 0:
            return self._gm_warp_luma()[py : py + ph, px : px + pw]
        ss = 1
        vh = (self.h + ss) >> ss
        vw = (self.w + ss) >> ss
        ref = self.refs[LAST_FRAME][plane]
        vis = ref[self.pad : self.pad + vh, self.pad : self.pad + vw]
        return warp_plane(ROTZOOM, self.gm_wm, self.gm_shear, vis,
                          px, py, pw, ph, ss, ss, self.bd)

    def _gm_warp_luma(self):
        """Whole-plane (mi-aligned) luma warp, cached across encode passes.
        The warp is 8x8-block separable, so any 8-aligned region slice is
        identical to warping that region directly."""
        got = self.shared.get("gm_warp_luma")
        if got is None:
            from .warp import ROTZOOM, warp_plane

            ref = self.refs[LAST_FRAME][0]
            vis = ref[self.pad : self.pad + self.h,
                      self.pad : self.pad + self.w]
            got = warp_plane(ROTZOOM, self.gm_wm, self.gm_shear, vis, 0, 0,
                             self.aligned_w, self.aligned_h, 0, 0, self.bd)
            self.shared["gm_warp_luma"] = got
        return got

    def _warp_upgrade_dec(self, r, c, W, H, t, cost):
        """Swap the kernel's decision for GLOBALMV-warp when the warp
        prediction beats it (the decide kernel costs GLOBALMV with the
        model's translation part only; this re-scores with the real warp)."""
        if self.gm_wm is None or min(W, H) < 8:
            return t
        if t[0] == 1 and len(t) == 5 and int(t[2]) == GLOBALMV:
            if t[1] != LAST_FRAME:
                return t            # other refs keep identity gm (0, 0)
            # GLOBALMV decided on translation cost: MV comes from projection
            mv = self._gm_block(r, c, W, H)
            return (1, LAST_FRAME, GLOBALMV, mv[0], mv[1])
        x0, y0 = c * 4, r * 4
        wp = self._gm_warp_luma()[y0 : y0 + H, x0 : x0 + W]
        src = self.src[0][y0 : y0 + H, x0 : x0 + W]
        sse = int(np.sum((src.astype(np.int64) - wp) ** 2))
        if sse + self._psy_cost(src, wp) < cost:
            mv = self._gm_block(r, c, W, H)
            return (1, LAST_FRAME, GLOBALMV, mv[0], mv[1])
        return t

    def _mc_pred(self, plane, px, py, pw, ph, mv, ref_frame=LAST_FRAME,
                 filt=0):
        """Motion-compensated prediction (spec chroma 1/16-pel rules);
        filt: interp filter (0 REGULAR / 1 SMOOTH / 2 SHARP)."""
        ref = self.refs[ref_frame][plane]
        ss = 0 if plane == 0 else 1
        if ss == 0:
            ipart_y, frac_y = mv[0] >> 3, (mv[0] & 7) << 1
            ipart_x, frac_x = mv[1] >> 3, (mv[1] & 7) << 1
        else:
            ipart_y, frac_y = mv[0] >> 4, mv[0] & 15
            ipart_x, frac_x = mv[1] >> 4, mv[1] & 15
        y0 = py + ipart_y + self.pad
        x0 = px + ipart_x + self.pad
        patch = ref[y0 - 3 : y0 + ph + 4, x0 - 3 : x0 + pw + 4]
        if filt == 0:
            return mc_native.convolve_block(patch, pw, ph, frac_x, frac_y,
                                            bd=self.bd)
        from .convolve import convolve_2d_sr

        return convolve_2d_sr(patch[None], pw, ph, frac_x, frac_y,
                              interp_x=filt, interp_y=filt, bd=self.bd)[0]

    def _jnt_bufs(self, plane, px, py, pw, ph, mv0, mv1, filt=0):
        """The (LAST, ref2) pair's ConvBuf-domain predictions (jnt
        convolve; codec/compound.py, oracle-bit-exact)."""
        from . import compound as cmp
        from .convolve import get_filter_kernel

        bufs = []
        for mv, rfc in ((mv0, LAST_FRAME), (mv1, self.ref2)):
            ref = self.refs[rfc][plane]
            if plane == 0:
                ipy, fy = mv[0] >> 3, (mv[0] & 7) << 1
                ipx, fx = mv[1] >> 3, (mv[1] & 7) << 1
            else:
                ipy, fy = mv[0] >> 4, mv[0] & 15
                ipx, fx = mv[1] >> 4, mv[1] & 15
            y0 = py + ipy + self.pad
            x0 = px + ipx + self.pad
            patch = ref[y0 - 3 : y0 + ph + 4, x0 - 3 : x0 + pw + 4]
            fxk = get_filter_kernel(filt, fx, pw)
            fyk = get_filter_kernel(filt, fy, ph)
            bufs.append(cmp.jnt_conv(patch, pw, ph, fxk, fyk, fx, fy, self.bd))
        return bufs

    def _mc_pred_compound(self, plane, px, py, pw, ph, mv0, mv1):
        """COMPOUND_AVERAGE prediction from the (LAST, ref2) pair."""
        from . import compound as cmp

        b0, b1 = self._jnt_bufs(plane, px, py, pw, ph, mv0, mv1)
        return cmp.compound_average(b0, b1, self.bd)

    def _switchable_filter_ctx(self, mi_row, mi_col, ref, is_comp):
        """av1_get_pred_context_switchable_interp (dir 0, dual off):
        ctx = comp_offset + combined left/above same-ref filter type."""
        t_r0, _, t_c0, _ = self.tile_mi

        def ftype(r, c):
            g = self.grid
            if int(g.ref_frame[r, c]) <= 0:
                return 3
            if (int(g.ref_frame[r, c]) == ref
                    or int(g.ref_frame2[r, c]) == ref):
                f = int(g.filt[r, c])
                return f if f < 3 else 0
            return 3
        left = ftype(mi_row, mi_col - 1) if mi_col > t_c0 else 3
        above = ftype(mi_row - 1, mi_col) if mi_row > t_r0 else 3
        ctx = 4 if is_comp else 0   # INTER_FILTER_COMP_OFFSET
        if left == above:
            ctx += left
        elif left == 3:
            ctx += above
        elif above == 3:
            ctx += left
        else:
            ctx += 3
        return ctx

    def _comp_group_ctx(self, mi_row, mi_col):
        """get_comp_group_idx_context: sum of neighbor comp_group flags
        (ALTREF single-ref neighbors count 3), capped at 5."""
        t_r0, _, t_c0, _ = self.tile_mi
        ctx = 0
        for r, c, avail in ((mi_row - 1, mi_col, mi_row > t_r0),
                            (mi_row, mi_col - 1, mi_col > t_c0)):
            if not avail:
                continue
            if int(self.grid.ref_frame2[r, c]) > 0:
                ctx += int(self.grid.comp_group[r, c])
            elif int(self.grid.ref_frame[r, c]) == ALTREF_FRAME:
                ctx += 3
        return min(5, ctx)

    def _neighbor_ref_counts(self, mi_row, mi_col):
        """Reference-frame counts over the above/left neighbors, including
        second references (collect_neighbors_ref_counts analog)."""
        counts = np.zeros(8, np.int32)
        has_a, has_l, a_inter, l_inter = self._neighbors_mi(mi_row, mi_col)
        for ok, r, c in ((has_a and a_inter, mi_row - 1, mi_col),
                         (has_l and l_inter, mi_row, mi_col - 1)):
            if ok:
                counts[self.grid.ref_frame[r, c]] += 1
                if self.grid.ref_frame2[r, c] > 0:
                    counts[self.grid.ref_frame2[r, c]] += 1
        return counts

    def _comp_neighbors(self, mi_row, mi_col):
        """(is_inter, has_second_ref, ref0) per above/left, or None when
        unavailable (inside-tile availability)."""
        mi_r0, _, mi_c0, _ = self.tile_mi
        out = []
        for r, c, avail in ((mi_row - 1, mi_col, mi_row > mi_r0),
                            (mi_row, mi_col - 1, mi_col > mi_c0)):
            if not avail:
                out.append(None)
                continue
            out.append((int(self.grid.ref_frame[r, c]) > 0,
                        int(self.grid.ref_frame2[r, c]) > 0,
                        int(self.grid.ref_frame[r, c])))
        return out

    def _write_comp_inter(self, mi_row, mi_col, is_comp):
        """comp_inter flag (svt_aom_get_reference_mode_context_new,
        entropy_coding.c:1668)."""
        a, l = self._comp_neighbors(mi_row, mi_col)

        def bwd(rf):
            return rf >= 5   # IS_BACKWARD_REF_FRAME

        if a is not None and l is not None:
            ai, a2, ar = a
            li, l2, lr = l
            if not a2 and not l2:
                ctx = int(bwd(ar) ^ bwd(lr))
            elif not a2:
                ctx = 2 + int(bwd(ar) or not ai)
            elif not l2:
                ctx = 2 + int(bwd(lr) or not li)
            else:
                ctx = 4
        elif a is not None or l is not None:
            e = a if a is not None else l
            ctx = 3 if e[1] else int(bwd(e[2]))
        else:
            ctx = 1
        self.fc.write(self.enc, "comp_inter", (ctx,), int(is_comp), 2)

    def _write_comp_refs(self, mi_row, mi_col):
        """BIDIR (LAST, ALTREF) compound reference coding: comp_ref_type +
        comp_ref_p/p1 + comp_bwdref_p (write_ref_frames compound branch,
        entropy_coding.c:2102-2143; contexts :1722-2021). Neighbors are
        never UNIDIR pairs here (we only produce LAST+ALTREF)."""
        a, l = self._comp_neighbors(mi_row, mi_col)

        def bwd(rf):
            return rf >= 5

        if a is not None and l is not None:
            ai, a2, ar = a
            li, l2, lr = l
            if not ai and not li:
                ctx_t = 2
            elif not ai or not li:
                e2 = l2 if not ai else a2
                ctx_t = 1 if e2 else 2
            else:
                if not a2 and not l2:
                    ctx_t = 1 + 2 * int(not (bwd(ar) ^ bwd(lr)))
                elif not a2 or not l2:
                    ctx_t = 1       # single/comp, comp is bidir
                else:
                    ctx_t = 0       # bidir/bidir
        elif a is not None or l is not None:
            e = a if a is not None else l
            ctx_t = 2 if not e[0] else (0 if e[1] else 2)
        else:
            ctx_t = 2
        self.fc.write(self.enc, "comp_ref_type", (ctx_t,), 1, 2)  # BIDIR
        counts = self._neighbor_ref_counts(mi_row, mi_col)
        ll2 = int(counts[1] + counts[2])
        l3g = int(counts[3] + counts[4])
        ctx0 = 1 if ll2 == l3g else (0 if ll2 < l3g else 2)
        self.fc.write(self.enc, "comp_ref", (ctx0, 0), 0, 2)   # ref0: L/L2 group
        ctx1 = 1 if counts[1] == counts[2] else (0 if counts[1] < counts[2] else 2)
        self.fc.write(self.enc, "comp_ref", (ctx1, 1), 0, 2)   # ref0 == LAST
        brf = int(counts[5] + counts[6])
        arf = int(counts[7])
        ctxb = 1 if brf == arf else (0 if brf < arf else 2)
        self.fc.write(self.enc, "comp_bwdref", (ctxb, 0), 1, 2)  # ref1 == ALTREF

    def _neighbors_mi(self, mi_row, mi_col):
        """(above_is_inter, left_is_inter, availability) within tile."""
        r0, _, c0, _ = self.tile_mi
        has_a = mi_row > r0
        has_l = mi_col > c0
        a_inter = bool(self.grid.ref_frame[mi_row - 1, mi_col] > 0) if has_a else False
        l_inter = bool(self.grid.ref_frame[mi_row, mi_col - 1] > 0) if has_l else False
        return has_a, has_l, a_inter, l_inter

    # --------------------------------------------------------------- block
    def _encode_block(self, mi_row, mi_col, bsize):
        W, H = int(BLOCK_WIDTH[bsize]), int(BLOCK_HEIGHT[bsize])
        x0, y0 = mi_col * 4, mi_row * 4
        bw4, bh4 = W >> 2, H >> 2
        n8_w, n8_h = bw4, bh4
        seg = self._block_segment(mi_row, mi_col)

        src = self.src[0][y0 : y0 + H, x0 : x0 + W]
        dec = (self.inter_dec.get((mi_row, mi_col))
               if getattr(self, "inter_dec", None) is not None else None)
        is_comp = False
        mv2 = (0, 0)
        if dec is not None:
            # decisions from the whole-frame native pre-pass (_pre_walk)
            use_inter, ref_sel, dmode, mvr, mvc = dec[:5]
            use_inter = bool(use_inter)
            is_comp = use_inter and int(dmode) >= 17
            if is_comp:
                y_mode = int(dmode)
                ref_sel = LAST_FRAME          # pair (LAST, self.ref2)
                mv = (int(mvr), int(mvc))
                mv2 = (int(dec[5]), int(dec[6]))
                y_pred = self._mc_pred_compound(0, x0, y0, W, H, mv, mv2)
            elif use_inter:
                y_mode = dmode
                if (int(dmode) == GLOBALMV and ref_sel == LAST_FRAME
                        and self.gm_wm is not None):
                    # ROTZOOM GLOBALMV: warp prediction (>=8x8), projected MV
                    mv = self._gm_block(mi_row, mi_col, W, H)
                    y_pred = (self._warp_pred(0, x0, y0, W, H)
                              if min(W, H) >= 8
                              else self._mc_pred(0, x0, y0, W, H, mv, ref_sel))
                else:
                    mv = (mvr, mvc)
                    y_pred = self._mc_pred(0, x0, y0, W, H, mv, ref_sel)
            else:
                ref_sel = LAST_FRAME
                y_mode = dmode
                mv = (0, 0)
                above_buf, left_buf, have_a, have_l = self._gather_neighbors(
                    0, x0, y0, W, H)
                y_pred = self._predict(int(y_mode), above_buf, left_buf,
                                       have_a, have_l, W, H)
        else:
            # ---- intra candidate
            above_buf, left_buf, have_a, have_l = self._gather_neighbors(0, x0, y0, W, H)
            best_imode, best_ipred, best_icost = None, None, None
            for mode in self._prune_modes(src):
                pred = self._predict(int(mode), above_buf, left_buf, have_a, have_l, W, H)
                cost = int(np.sum((src.astype(np.int64) - pred) ** 2))
                cost += self._psy_cost(src, pred)
                if best_icost is None or cost < best_icost:
                    best_imode, best_ipred, best_icost = mode, pred, cost

            # ---- inter candidates: NEWMV (ME) + GLOBALMV per available ref.
            # GOLDEN is searched only when LAST leaves significant residual
            # (occlusions / long-term background), keeping its cost marginal.
            me_res = self.me[LAST_FRAME].search_block(self.src[0], x0, y0, W, H,
                                                      subpel=True)
            cand = []
            pred_new = self._mc_pred(0, x0, y0, W, H, me_res.mv)
            cost_new = int(np.sum((src.astype(np.int64) - pred_new) ** 2))
            cand.append((LAST_FRAME, NEWMV, me_res.mv, pred_new,
                         cost_new + self._psy_cost(src, pred_new)))
            if self.gm_wm is not None:
                mvg = self._gm_block(mi_row, mi_col, W, H)
                pred_zero = (self._warp_pred(0, x0, y0, W, H)
                             if min(W, H) >= 8
                             else self._mc_pred(0, x0, y0, W, H, mvg))
            else:
                mvg = self.gm_mv
                pred_zero = self._mc_pred(0, x0, y0, W, H, self.gm_mv)
            cost_zero = int(np.sum((src.astype(np.int64) - pred_zero) ** 2))
            cand.append((LAST_FRAME, GLOBALMV, mvg, pred_zero,
                         cost_zero + self._psy_cost(src, pred_zero)))
            if (self.ref2 is not None
                    and (self.ref2 == ALTREF_FRAME
                         or min(c[4] for c in cand) > (W * H) << 4)):
                me_g = self.me[self.ref2].search_block(self.src[0], x0, y0,
                                                       W, H, subpel=True)
                pred_g = self._mc_pred(0, x0, y0, W, H, me_g.mv, self.ref2)
                cost_g = int(np.sum((src.astype(np.int64) - pred_g) ** 2))
                cand.append((self.ref2, NEWMV, me_g.mv, pred_g,
                             cost_g + self._psy_cost(src, pred_g)))
            ref_sel, inter_mode, inter_mv, inter_pred, inter_cost = min(
                cand, key=lambda c: c[4])
            use_inter = inter_cost <= best_icost
            if use_inter:
                y_mode, y_pred = inter_mode, inter_pred
                mv = inter_mv
            else:
                y_mode, y_pred = best_imode, best_ipred
                mv = (0, 0)
        if use_inter:
            t_r0, t_r1, t_c0, t_c1 = self.tile_mi
            if is_comp:
                stack, stack2, weights, mode_ctx, refmv_count = \
                    setup_comp_mv_list(self.grid, mi_row, mi_col, n8_w, n8_h,
                                       (LAST_FRAME, self.ref2),
                                       (t_r0, t_r1, t_c0, t_c1),
                                       gm=(self._gm_stack_mv(mi_row, mi_col,
                                                             W, H, LAST_FRAME),
                                           (0, 0)),
                                       sign_bias=self.sign_bias,
                                       tpl=self.tpl_mvs)
            else:
                gm_ref = self._gm_stack_mv(mi_row, mi_col, W, H, ref_sel)
                stack, weights, mode_ctx, refmv_count = setup_ref_mv_list(
                    self.grid, mi_row, mi_col, n8_w, n8_h, ref_sel,
                    (t_r0, t_r1, t_c0, t_c1), gm_mv=gm_ref,
                    sign_bias=self.sign_bias, tpl=self.tpl_mvs)
                near_idx = 0
                # NEWMV whose MV equals the stack head is re-coded as
                # NEARESTMV: same prediction, no DRL/MV syntax (the
                # inject_mvp-candidate == ME-result collapse in MD)
                if y_mode == NEWMV and tuple(mv) == tuple(stack[0]):
                    y_mode = NEARESTMV
                elif (y_mode == NEWMV and refmv_count >= 2
                        and len(stack) > 1 and tuple(mv) == tuple(stack[1])):
                    y_mode = NEARMV   # RefMvIdx 1 via read_drl_idx
                elif (_NEAR2 and y_mode == NEWMV and refmv_count >= 3
                        and len(stack) > 2 and tuple(mv) == tuple(stack[2])):
                    y_mode = NEARMV   # RefMvIdx 2 (two drl bits)
                    near_idx = 1
                    global _NEAR2_HITS
                    _NEAR2_HITS += 1
            if is_comp and y_mode == NEW_NEWMV:
                m0 = tuple(mv) == tuple(stack[0])
                m1 = tuple(mv2) == tuple(stack2[0])
                if m0 and m1:
                    y_mode = 17   # NEAREST_NEARESTMV: no drl/mv syntax
                elif m0:
                    # NEAREST_NEWMV: mv[0] inferred from the stack head,
                    # only mv[1] coded (entropy_coding.c:5092, no drl)
                    y_mode = NEAREST_NEWMV
                elif m1:
                    y_mode = NEW_NEARESTMV   # mv[0] coded only
        uv_mode = 0  # UV_DC for intra blocks

        # ---- switchable interpolation filter decision: rebuild the luma
        # prediction with SMOOTH/SHARP and keep the best (needs_interp_filter
        # gating per spec 5.11.27; dual filter off -> one filter both dirs)
        blk_filt = 0
        filt_coded = False
        if use_inter and self.switchable_filters:
            large = min(W, H) >= 8
            if large and int(y_mode) == GLOBALMV:
                # coded only for a TRANSLATION gm on this ref; IDENTITY /
                # ROTZOOM imply EIGHTTAP without syntax
                filt_coded = (ref_sel == LAST_FRAME and self.gm_wm is None
                              and tuple(self.gm_mv) != (0, 0))
            else:
                filt_coded = True
        feat = getattr(self, "feat", None)
        if filt_coded and feat is not None:
            # decision from the feature-search pre-pass (walk_native)
            blk_filt = int(feat["filt"][mi_row, mi_col])
            if blk_filt:
                if is_comp:
                    from . import compound as cmp

                    fb0, fb1 = self._jnt_bufs(0, x0, y0, W, H, mv, mv2,
                                              filt=blk_filt)
                    y_pred = cmp.compound_average(fb0, fb1, self.bd)
                else:
                    y_pred = self._mc_pred(0, x0, y0, W, H, mv, ref_sel,
                                           filt=blk_filt)
        elif filt_coded:
            src64f = src.astype(np.int64)
            best_f = (int(np.sum((src64f - y_pred) ** 2))
                      + self._psy_cost(src, y_pred), 0, y_pred)
            for f in (1, 2):
                if is_comp:
                    from . import compound as cmp

                    fb0, fb1 = self._jnt_bufs(0, x0, y0, W, H, mv, mv2,
                                              filt=f)
                    fp = cmp.compound_average(fb0, fb1, self.bd)
                elif (int(y_mode) == GLOBALMV and ref_sel == LAST_FRAME
                        and self.gm_wm is not None and min(W, H) >= 8):
                    break   # warp path: no filter
                else:
                    fp = self._mc_pred(0, x0, y0, W, H, mv, ref_sel, filt=f)
                c = int(np.sum((src64f - fp) ** 2))
                if c >= best_f[0]:
                    continue
                c += self._psy_cost(src, fp)
                if c < best_f[0]:
                    best_f = (c, f, fp)
            blk_filt = best_f[1]
            y_pred = best_f[2]

        # ---- inter-intra decision (combine_interintra): blend the inter
        # prediction with a DC/V/H/SMOOTH intra prediction under the smooth
        # mask; mutually exclusive with OBMC (RefFrame[1]=INTRA_FRAME forces
        # SIMPLE motion). Evaluate II and OBMC against the simple pred and
        # keep the best.
        ii_mode = None
        ii_wedge = None
        obmc_used = False
        ii_eligible = (use_inter and not is_comp and self.enable_interintra
                       and 8 <= W <= 32 and 8 <= H <= 32
                       and W <= 2 * H and H <= 2 * W)
        if use_inter and feat is not None:
            # commit the pre-pass decisions: II blends with the real recon
            # neighbors, OBMC with the walk-order grid state
            if ii_eligible and feat["ii"][mi_row, mi_col]:
                ii_mode = int(feat["ii"][mi_row, mi_col]) - 1
                if feat["iiw"][mi_row, mi_col]:
                    ii_wedge = int(feat["iiw"][mi_row, mi_col]) - 1
                ab, lb, ha, hl = self._gather_neighbors(0, x0, y0, W, H)
                ip = self._predict(II_TO_INTRA[ii_mode], ab, lb, ha, hl,
                                   W, H)
                if ii_wedge is not None:
                    from . import wedge as WG

                    y_pred = ii_blend(y_pred, ip,
                                      WG.wedge_mask(W, ii_wedge, 0))
                else:
                    y_pred = ii_blend(y_pred, ip, ii_mask(ii_mode, W, H))
            if feat["mm"][mi_row, mi_col] and ii_mode is None:
                from . import obmc as OB

                obmc_used = True
                oy = y_pred.copy()
                OB.build_obmc_preds(self, mi_row, mi_col, W, H, {0: oy})
                y_pred = oy
        elif use_inter:
            # inline search (no native feature-search pre-pass available)
            best_ii = None
            c_simple = None
            if ii_eligible or self._obmc_eligible(mi_row, mi_col, W, H,
                                                  y_mode, ref_sel, is_comp):
                c_simple = (int(np.sum((src.astype(np.int64)
                                        - y_pred) ** 2))
                            + self._psy_cost(src, y_pred))
            if ii_eligible:
                ab, lb, ha, hl = self._gather_neighbors(0, x0, y0, W, H)
                best_ip = None
                for m in range(4):
                    ip = self._predict(II_TO_INTRA[m], ab, lb, ha, hl, W, H)
                    bp = ii_blend(y_pred, ip, ii_mask(m, W, H))
                    c = (int(np.sum((src.astype(np.int64) - bp) ** 2))
                         + self._psy_cost(src, bp))
                    if c < c_simple and (best_ii is None or c < best_ii[0]):
                        best_ii = (c, m, bp)
                        best_ip = ip
                if best_ii is not None and W == H:
                    # wedge interintra: the 16 sign-0 wedge masks with the
                    # winning mode's intra pred (pick_interintra_wedge)
                    from . import wedge as WG

                    for widx in range(16):
                        wm = WG.wedge_mask(W, widx, 0)
                        bp = ii_blend(y_pred, best_ip, wm)
                        c = (int(np.sum((src.astype(np.int64) - bp) ** 2))
                             + self._psy_cost(src, bp))
                        if c < best_ii[0] - (best_ii[0] >> 5):
                            best_ii = (c, best_ii[1], bp)
                            ii_wedge = widx
                if best_ii is not None:
                    ii_mode = best_ii[1]
            # OBMC decision (motion_mode OBMC_CAUSAL): blend neighbor
            # predictions and keep them when they beat the best so far
            if self._obmc_eligible(mi_row, mi_col, W, H, y_mode, ref_sel,
                                   is_comp):
                from . import obmc as OB

                oy = y_pred.copy()
                OB.build_obmc_preds(self, mi_row, mi_col, W, H, {0: oy})
                c_obmc = (int(np.sum((src.astype(np.int64) - oy) ** 2))
                          + self._psy_cost(src, oy))
                c_beat = c_simple if ii_mode is None else best_ii[0]
                if c_obmc < c_beat:
                    obmc_used = True
                    ii_mode = None
                    ii_wedge = None
                    y_pred = oy
            if ii_mode is not None:
                y_pred = best_ii[2]

        # ---- COMPOUND_WEDGE decision: blend the pair's ConvBuf predictions
        # under each of the 16 masks x 2 signs, keep a clear winner over the
        # average (pick_interinter_wedge analog)
        wedge_info = None    # ("w", idx, sign) | ("d", mask_type, mask)
        if (is_comp and self.enable_masked_compound and W == H
                and 8 <= W <= 64 and feat is not None):
            # decision from the feature-search pre-pass
            ct = int(feat["ctype"][mi_row, mi_col])
            if ct:
                from . import wedge as WG

                b0, b1 = self._jnt_bufs(0, x0, y0, W, H, mv, mv2,
                                        filt=blk_filt)
                if ct == 1:
                    widx = int(feat["widx"][mi_row, mi_col])
                    wsign = int(feat["wsign"][mi_row, mi_col])
                    wedge_info = ("w", widx, wsign)
                    y_pred = WG.blend_d16(b0, b1,
                                          WG.wedge_mask(W, widx, wsign),
                                          self.bd)
                else:
                    mt = int(feat["widx"][mi_row, mi_col])
                    dm = WG.diffwtd_masks(b0, b1, self.bd)[mt]
                    wedge_info = ("d", mt, dm)
                    y_pred = WG.blend_d16(b0, b1, dm, self.bd)
        elif (is_comp and self.enable_masked_compound and W == H
                and 8 <= W <= 64):
            from . import wedge as WG

            b0, b1 = self._jnt_bufs(0, x0, y0, W, H, mv, mv2, filt=blk_filt)
            src64 = src.astype(np.int64)
            c_avg = (int(np.sum((src64 - y_pred) ** 2))
                     + self._psy_cost(src, y_pred))
            best_w = None
            if W <= 32 and W <= 2 * H and H <= 2 * W:
                # wedge codebooks exist for 8..32 (ratio <= 2)
                for widx in range(16):
                    for sign in (0, 1):
                        bp = WG.blend_d16(b0, b1,
                                          WG.wedge_mask(W, widx, sign),
                                          self.bd)
                        c = int(np.sum((src64 - bp) ** 2))
                        if best_w is not None and c >= best_w[0]:
                            continue
                        c += self._psy_cost(src, bp)
                        if best_w is None or c < best_w[0]:
                            best_w = (c, ("w", widx, sign), bp)
            # COMPOUND_DIFFWTD: the two normative difference-weight masks
            dm0, dm1 = WG.diffwtd_masks(b0, b1, self.bd)
            for mt, dm in ((0, dm0), (1, dm1)):
                bp = WG.blend_d16(b0, b1, dm, self.bd)
                c = int(np.sum((src64 - bp) ** 2))
                if best_w is not None and c >= best_w[0]:
                    continue
                c += self._psy_cost(src, bp)
                if best_w is None or c < best_w[0]:
                    best_w = (c, ("d", mt, dm), bp)
            # the masked syntax costs ~7 bits over the average's 1
            if best_w is not None and best_w[0] < c_avg - (c_avg >> 5):
                wedge_info = best_w[1]
                y_pred = best_w[2]

        # ---- transforms for all planes (luma TX type from the pre-pass
        # search; inter chroma inherits it per compute_tx_type)
        tx_y = MAX_TX_RECT[BlockSize(bsize)]
        tt_y = (self.inter_txt.get((mi_row, mi_col), 0)
                if use_inter and self.qindex > 0 else 0)
        plane_jobs = [(0, x0, y0, W, H, tx_y, y_pred, tt_y)]
        if not self.mono:
            uv_bsize = _BSIZE_BY_WH[(max(W >> 1, 4), max(H >> 1, 4))]
            tx_uv = MAX_TX_RECT[uv_bsize]
            # chroma inherits only a *stored* luma type: with luma eob 0 the
            # decoder's TxTypes map stays DCT (spec read_tx_type gating), so
            # the luma plane must be quantized first (see below)
            tt_uv = inter_chroma_tx_type(tt_y, tx_uv) if use_inter else 0
            uv_preds = {}
            for plane in (1, 2):
                cx, cy, cw, ch = x0 >> 1, y0 >> 1, W >> 1, H >> 1
                if is_comp:
                    if wedge_info is not None:
                        from . import wedge as WG

                        cb0, cb1 = self._jnt_bufs(plane, cx, cy, cw, ch,
                                                  mv, mv2, filt=blk_filt)
                        if wedge_info[0] == "w":
                            cm = WG.wedge_mask_chroma(W, wedge_info[1],
                                                      wedge_info[2])
                        else:
                            cm = WG.subsample_mask(wedge_info[2])
                        pred = WG.blend_d16(cb0, cb1, cm, self.bd)
                    else:
                        from . import compound as cmp

                        cb0, cb1 = self._jnt_bufs(plane, cx, cy, cw, ch,
                                                  mv, mv2, filt=blk_filt)
                        pred = cmp.compound_average(cb0, cb1, self.bd)
                elif use_inter:
                    if (int(y_mode) == GLOBALMV and ref_sel == LAST_FRAME
                            and self.gm_wm is not None and cw >= 8 and ch >= 8):
                        pred = self._warp_pred(plane, cx, cy, cw, ch)
                    else:
                        pred = self._mc_pred(plane, cx, cy, cw, ch, mv,
                                             ref_sel, filt=blk_filt)
                else:
                    pa, pl, pha, phl = self._gather_neighbors(plane, cx, cy, cw, ch)
                    pred = self._predict(0, pa, pl, pha, phl, cw, ch)
                if use_inter and ii_mode is not None:
                    pa, pl, pha, phl = self._gather_neighbors(plane, cx, cy, cw, ch)
                    ip = self._predict(II_TO_INTRA[ii_mode], pa, pl, pha, phl,
                                       cw, ch)
                    if ii_wedge is not None:
                        from . import wedge as WG

                        cm = WG.wedge_mask_chroma(W, ii_wedge, 0)
                        pred = ii_blend(pred, ip, cm)
                    else:
                        pred = ii_blend(pred, ip, ii_mask(ii_mode, cw, ch))
                uv_preds[plane] = pred.copy() if obmc_used else pred
            if obmc_used:
                from . import obmc as OB

                OB.build_obmc_preds(self, mi_row, mi_col, W, H, uv_preds)
            for plane in (1, 2):
                cx, cy, cw, ch = x0 >> 1, y0 >> 1, W >> 1, H >> 1
                plane_jobs.append((plane, cx, cy, cw, ch, tx_uv,
                                   uv_preds[plane], tt_uv))

        results = []
        for plane, px, py, pw, ph, tx_size, pred, tt in plane_jobs:
            if plane > 0 and results and results[0][9] == 0 and tt != 0:
                tt = 0   # luma eob 0 -> decoder chroma type is DCT
            psrc = self.src[plane][py : py + ph, px : px + pw]
            resid = psrc.astype(np.int16) - pred.astype(np.int16)
            coeffs = forward_transform_2d(resid[None].astype(np.int32),
                                          int(tx_size), int(tt), self.bd)[0]
            cw_t, ch_t = min(pw, 32), min(ph, 32)
            flat = coeffs[:ch_t, :cw_t].reshape(1, -1)
            scan = self.tables.scan(int(tx_size), int(tt))
            qm, iqm = self._get_qm(plane, int(tx_size), int(tt))
            qc, dqc, eob = quantize_b(flat, scan, self.quant[plane], int(tx_size),
                                      qm=qm, iqm=iqm)
            eob0 = int(eob[0])
            if self.rdoq_fast and use_inter and eob0 and not self.noise_norm:
                from .quant import eob_fast_trim

                eob0 = eob_fast_trim(flat[0], qc[0], dqc[0], eob0, scan,
                                     self.quant[plane], int(tx_size))
            if self.noise_norm and plane == 0:
                from .quant import noise_normalize

                eob0 = noise_normalize(flat[0], qc[0], dqc[0], eob0, scan,
                                       self.quant[plane], int(tx_size),
                                       self.noise_norm, iqm=iqm)
            results.append((plane, px, py, pw, ph, tx_size, pred, qc[0],
                            dqc[0], eob0, int(tt)))
        skip = all(r[9] == 0 for r in results)

        # ---- skip-mode candidate (the reference evaluates skip_mode as
        # an MD candidate, product_coding_loop.c): a zero-residual simple
        # inter block trials the compound-NEAREST prediction on the
        # frame's skip pair; if that also quantizes to zero without
        # raising luma distortion, ONE skip_mode bit replaces the whole
        # block syntax (skip/is_inter/refs/mode/...)
        if (self.skip_mode_present and min(W, H) >= 8
                and self.seg_params is None and self.noise_norm == 0
                and self.skip_mode_pair == (LAST_FRAME, self.ref2)
                and skip and use_inter
                and wedge_info is None and ii_mode is None and not obmc_used
                and not (int(y_mode) == GLOBALMV and self.gm_wm is not None)
                and not (is_comp and int(y_mode) == 17)):
            tr0_, tr1_, tc0_, tc1_ = self.tile_mi
            s0_, s1_, _w_, _mc_, _rc_ = setup_comp_mv_list(
                self.grid, mi_row, mi_col, n8_w, n8_h,
                (LAST_FRAME, self.ref2), (tr0_, tr1_, tc0_, tc1_),
                gm=(self._gm_stack_mv(mi_row, mi_col, W, H, LAST_FRAME),
                    (0, 0)), sign_bias=self.sign_bias, tpl=self.tpl_mvs)
            smv, smv2 = tuple(s0_[0]), tuple(s1_[0])
            from . import compound as cmp

            trial = []
            sm_zero = True
            for plane, px, py, pw, ph, tx_size, _pred, _tt in plane_jobs:
                b0, b1 = self._jnt_bufs(plane, px, py, pw, ph, smv, smv2,
                                        filt=0)
                # skip-mode blocks decode with seq enable_jnt_comp ?
                # distance-weighted : plain average; jnt_comp is off in
                # this encoder -> COMPOUND_AVERAGE (verified dav1d-exact)
                if self.skip_mode_weights != (0, 0):
                    fwd_o, bck_o = self.skip_mode_weights
                    spred = cmp.compound_dist_weighted(b0, b1, fwd_o,
                                                       bck_o, self.bd)
                else:
                    spred = cmp.compound_average(b0, b1, self.bd)
                psrc = self.src[plane][py : py + ph, px : px + pw]
                resid = psrc.astype(np.int16) - spred.astype(np.int16)
                coeffs = forward_transform_2d(
                    resid[None].astype(np.int32), int(tx_size), 0,
                    self.bd)[0]
                cw_t, ch_t = min(pw, 32), min(ph, 32)
                flat = coeffs[:ch_t, :cw_t].reshape(1, -1)
                scan = self.tables.scan(int(tx_size), 0)
                qm, iqm = self._get_qm(plane, int(tx_size), 0)
                qc, dqc, eob = quantize_b(flat, scan, self.quant[plane],
                                          int(tx_size), qm=qm, iqm=iqm)
                if int(eob[0]) != 0:
                    sm_zero = False
                    break
                trial.append((plane, px, py, pw, ph, tx_size, spred,
                              qc[0], dqc[0], 0, 0))
            if sm_zero:
                src64 = src.astype(np.int64)
                d_cur = int(np.sum((src64 - y_pred.astype(np.int64)) ** 2))
                d_sm = int(np.sum(
                    (src64 - trial[0][6].astype(np.int64)) ** 2))
                if d_sm <= d_cur:
                    y_mode = 17          # NEAREST_NEARESTMV
                    is_comp = True
                    ref_sel = LAST_FRAME   # decoder infers the skip pair
                    mv, mv2 = smv, smv2
                    y_pred = trial[0][6]
                    results = trial
                    blk_filt = 0
                    wedge_info = None

        # ---- syntax
        # skip_mode (spec 5.11.27): when present and the block qualifies,
        # ONE bit replaces the whole mode-info syntax — the decoder infers
        # compound NEAREST_NEARESTMV on the skip pair, skip=1, REGULAR
        # filter, simple motion
        tmr0, _tmr1, tmc0, _tmc1 = self.tile_mi
        sm_coded = (self.skip_mode_present and min(W, H) >= 8
                    and self.seg_params is None)
        use_skip_mode = bool(
            sm_coded and skip and use_inter and is_comp
            and int(y_mode) == 17          # NEAREST_NEARESTMV
            and self.skip_mode_pair == (LAST_FRAME, self.ref2)
            and wedge_info is None and ii_mode is None and not obmc_used
            and blk_filt == 0)
        if sm_coded:
            above_sm = (int(self.mi_skip_mode[mi_row - 1, mi_col])
                        if mi_row > tmr0 else 0)
            left_sm = (int(self.mi_skip_mode[mi_row, mi_col - 1])
                       if mi_col > tmc0 else 0)
            self.fc.write(self.enc, "skip_mode", (above_sm + left_sm,),
                          int(use_skip_mode), 2)
        if not use_skip_mode:
            self._write_skip(mi_row, mi_col, skip)
        self._write_segment_id(mi_row, mi_col, bsize, seg, skip)
        if (self._sb_delta_pending and (mi_row & 15) == 0 and (mi_col & 15) == 0
                and (bsize != BlockSize.BLOCK_64X64 or not skip)):
            self._write_delta_q_index()
        if not use_skip_mode:
            self._write_is_inter(mi_row, mi_col, use_inter)
        if use_skip_mode:
            pass    # everything else is inferred from the skip pair
        elif use_inter:
            if self.ref_select and min(W, H) >= 8:
                self._write_comp_inter(mi_row, mi_col, is_comp)
            if is_comp:
                self._write_comp_refs(mi_row, mi_col)
                self.fc.write(self.enc, "inter_compound_mode",
                              (mode_context_analyzer(mode_ctx, True),),
                              int(y_mode) - 17, 8)
                if y_mode == NEW_NEWMV:
                    self._write_drl(stack, weights, refmv_count)
                    self._write_mv(mv, stack[0])
                    self._write_mv(mv2, stack2[0])
                elif y_mode == NEAREST_NEWMV:
                    # mv[0] inferred; no drl (entropy_coding.c:5074,:5092)
                    self._write_mv(mv2, stack2[0])
                elif y_mode == NEW_NEARESTMV:
                    self._write_mv(mv, stack[0])
                # NEAREST_NEARESTMV: no drl, no mv syntax
            else:
                self._write_ref_frames(mi_row, mi_col, ref_sel)
                self._write_inter_mode(y_mode, mode_ctx)
                if y_mode == NEWMV:
                    self._write_drl(stack, weights, refmv_count)
                    self._write_mv(mv, stack[0])
                elif y_mode == NEARMV:
                    self._write_drl_near(weights, refmv_count, near_idx)
            if (self.enable_interintra and not is_comp
                    and 8 <= W <= 32 and 8 <= H <= 32
                    and W <= 2 * H and H <= 2 * W):
                # read_interintra_mode (spec 5.11.23; entropy_coding.c
                # write_inter_intra_info): flag, mode, wedge flag (0)
                grp = SIZE_GROUP[int(bsize)]
                self.fc.write(self.enc, "interintra", (grp,),
                              int(ii_mode is not None), 2)
                if ii_mode is not None:
                    self.fc.write(self.enc, "interintra_mode", (grp,),
                                  int(ii_mode), 4)
                    self.fc.write(self.enc, "wedge_interintra",
                                  (int(bsize),), int(ii_wedge is not None), 2)
                    if ii_wedge is not None:
                        self.fc.write(self.enc, "wedge_idx", (int(bsize),),
                                      int(ii_wedge), 16)
            if self.motion_mode_switchable and ii_mode is None:
                # motion_mode (write_motion_mode, entropy_coding.c:1265):
                # obmc_cdf flag when OBMC is the max allowed mode
                if self._obmc_eligible(mi_row, mi_col, W, H, y_mode,
                                       ref_sel, is_comp):
                    self.fc.write(self.enc, "obmc", (int(bsize),),
                                  int(obmc_used), 2)
            if is_comp and self.enable_masked_compound:
                # read_compound_type (spec 5.11.23): comp_group_idx, then
                # the masked type + wedge geometry (enable_jnt_comp off ->
                # compound_idx is implied 1 for group 0)
                ctx = self._comp_group_ctx(mi_row, mi_col)
                self.fc.write(self.enc, "comp_group_idx", (ctx,),
                              int(wedge_info is not None), 2)
                if wedge_info is not None:
                    if W <= 32 and W <= 2 * H and H <= 2 * W:
                        # wedge available -> explicit type symbol
                        self.fc.write(self.enc, "compound_type",
                                      (int(bsize),),
                                      int(wedge_info[0] == "d"), 2)
                    # else compound_type is implied COMPOUND_DIFFWTD
                    if wedge_info[0] == "w":
                        self.fc.write(self.enc, "wedge_idx", (int(bsize),),
                                      int(wedge_info[1]), 16)
                        self.enc.encode_literal(int(wedge_info[2]), 1)
                    else:
                        self.enc.encode_literal(int(wedge_info[1]), 1)
            if filt_coded:
                # read_interpolation_filter (spec 5.11.27): one symbol,
                # dual filter off -> filter[1] = filter[0]
                fctx = self._switchable_filter_ctx(mi_row, mi_col,
                                                   1 if is_comp else ref_sel,
                                                   is_comp)
                self.fc.write(self.enc, "switchable_interp", (fctx,),
                              int(blk_filt), 3)
        else:
            self._write_y_mode_inter(bsize, y_mode)
            if not self.mono:
                cfl_allowed = W <= 32 and H <= 32
                self.fc.write(self.enc, "uv_mode", (int(cfl_allowed), int(y_mode)),
                              int(uv_mode), 14 if cfl_allowed else 13)
            self._write_palette_off(bsize, int(y_mode),
                                    (not self.mono) and int(uv_mode) == 0)
            # filter_intra_mode_info: coded for DC intra blocks (unused here)
            if (self.enable_filter_intra and int(y_mode) == 0
                    and W <= 32 and H <= 32):
                self.fc.write(self.enc, "filter_intra", (int(bsize),), 0, 2)

        # ---- residual + recon (+ maps) — mirrors the intra tail
        for plane, px, py, pw, ph, tx_size, pred, qc, dqc, eob, tt in results:
            ps = self.planes[plane]
            xu, yu = px >> 2, py >> 2
            from .constants import TX_HEIGHT, TX_WIDTH

            wu = min(int(TX_WIDTH[tx_size]) >> 2, (ps.width - px) >> 2)
            hu = min(int(TX_HEIGHT[tx_size]) >> 2, (ps.height - py) >> 2)
            if not skip:
                plane_type = int(plane > 0)
                txb_skip_ctx, dc_sign_ctx = get_txb_ctx(
                    plane_type, int(tx_size),
                    ps.above_ctx[xu : xu + wu], ps.left_ctx[yu : yu + hu],
                    True, False)
                ttw = None
                if plane == 0:
                    ttw = (lambda ts=tx_size, t=tt:
                           self._write_tx_type_any(ts, y_mode, use_inter, t))
                writer = write_coeffs_txb_native if self.use_native_ec else write_coeffs_txb
                cul = writer(self.fc, self.enc, qc, eob, int(tx_size), int(tt),
                             plane_type, txb_skip_ctx, dc_sign_ctx, tx_type_writer=ttw)
            else:
                cul = 0
            ps.above_ctx[xu : xu + wu] = cul
            ps.left_ctx[yu : yu + hu] = cul
            cw_t, ch_t = min(pw, 32), min(ph, 32)
            full = np.zeros((ph, pw), np.int32)
            full[:ch_t, :cw_t] = dqc.reshape(ch_t, cw_t)
            recon = inverse_transform_add(full[None], pred[None].astype(np.uint16),
                                          int(tx_size), int(tt), self.bd)[0]
            wr = min(pw, ps.width - px)
            hr = min(ph, ps.height - py)
            ps.recon[py : py + hr, px : px + wr] = recon[:hr, :wr]
            self.decoded[plane][py >> 2 : (py + hr) >> 2, px >> 2 : (px + wr) >> 2] = True
            from .constants import TX_HEIGHT as _TH, TX_WIDTH as _TW

            m = self.dlf_maps[plane]
            yu0, yu1 = py >> 2, (py + hr) >> 2
            xu0, xu1 = px >> 2, (px + wr) >> 2
            m.txw[yu0:yu1, xu0:xu1] = min(int(_TW[tx_size]), 255)
            m.txh[yu0:yu1, xu0:xu1] = min(int(_TH[tx_size]), 255)
            m.skip[yu0:yu1, xu0:xu1] = skip
            m.bedge_v[yu0:yu1, xu0] = True
            m.bedge_h[yu0, xu0:xu1] = True

        # ---- mi state
        r1 = min(mi_row + bh4, self.mi_rows)
        c1 = min(mi_col + bw4, self.mi_cols)
        self.mi_skip[mi_row:r1, mi_col:c1] = int(skip)
        self.mi_skip_mode[mi_row:r1, mi_col:c1] = int(use_skip_mode)
        if use_inter:
            self.mi_mode[mi_row:r1, mi_col:c1] = 0  # DC for intra ctx purposes
            self.grid.set_block(mi_row, mi_col, bw4, bh4, ref_sel, mv, y_mode,
                                ref_frame2=(self.ref2 if is_comp else 0),
                                mv2=(mv2 if is_comp else (0, 0)))
            self.grid.comp_group[mi_row:r1, mi_col:c1] = \
                int(is_comp and wedge_info is not None)
            # neighbor-ctx + OBMC filter state (uncoded blocks are REGULAR)
            self.grid.filt[mi_row:r1, mi_col:c1] = int(blk_filt)
        else:
            self.mi_mode[mi_row:r1, mi_col:c1] = int(y_mode)
            self.grid.set_block(mi_row, mi_col, bw4, bh4, 0, (0, 0), int(y_mode))

    # ------------------------------------------------------------ syntax
    def _write_is_inter(self, mi_row, mi_col, is_inter):
        has_a, has_l, a_inter, l_inter = self._neighbors_mi(mi_row, mi_col)
        if has_a and has_l:
            ctx = 3 if (not a_inter and not l_inter) else int(not a_inter or not l_inter)
        elif has_a or has_l:
            ctx = 2 * int(not (a_inter if has_a else l_inter))
        else:
            ctx = 0
        self.fc.write(self.enc, "intra_inter", (ctx,), int(is_inter), 2)

    def _write_ref_frames(self, mi_row, mi_col, ref=LAST_FRAME):
        """Single ref (LAST, GOLDEN or ALTREF): p1 selects forward/backward,
        then p3/p4/p5 inside the forward group or p2 for ALTREF, all with
        neighbor-count contexts (entropy_coding.c:1896-2067)."""
        counts = self._neighbor_ref_counts(mi_row, mi_col)
        fwd = int(counts[1] + counts[2] + counts[3] + counts[4])
        bwd = int(counts[5] + counts[6] + counts[7])
        ctx_p1 = 1 if fwd == bwd else (0 if fwd < bwd else 2)
        is_bwd = int(ref >= 5)  # BWDREF/ALTREF2/ALTREF group
        self.fc.write(self.enc, "single_ref", (ctx_p1, 0), is_bwd, 2)
        if is_bwd:
            # single_ref_p2: ALTREF vs BWDREF/ALTREF2
            # (get_pred_context_brfarf2_or_arf, entropy_coding.c:1974)
            brfarf2 = int(counts[5] + counts[6])
            arf = int(counts[7])
            ctx_p2 = 1 if brfarf2 == arf else (0 if brfarf2 < arf else 2)
            self.fc.write(self.enc, "single_ref", (ctx_p2, 1),
                          int(ref == 7), 2)
            # only ALTREF is produced here (no BWDREF/ALTREF2 references)
            return
        ll2 = int(counts[1] + counts[2])
        l3g = int(counts[3] + counts[4])
        ctx_p3 = 1 if ll2 == l3g else (0 if ll2 < l3g else 2)
        is_gold = int(ref == GOLDEN_FRAME)
        self.fc.write(self.enc, "single_ref", (ctx_p3, 2), is_gold, 2)
        if is_gold:
            ctx_p5 = 1 if counts[3] == counts[4] else (0 if counts[3] < counts[4] else 2)
            self.fc.write(self.enc, "single_ref", (ctx_p5, 4), 1, 2)  # GOLDEN
        else:
            ctx_p4 = 1 if counts[1] == counts[2] else (0 if counts[1] < counts[2] else 2)
            self.fc.write(self.enc, "single_ref", (ctx_p4, 3),
                          int(ref == 2), 2)   # LAST vs LAST2

    def _write_inter_mode(self, mode, mode_ctx):
        newmv_ctx = mode_ctx & 7
        self.fc.write(self.enc, "newmv", (newmv_ctx,), int(mode != NEWMV), 2)
        if mode != NEWMV:
            zeromv_ctx = (mode_ctx >> 3) & 1
            self.fc.write(self.enc, "zeromv", (zeromv_ctx,), int(mode != GLOBALMV), 2)
            if mode != GLOBALMV:
                refmv_ctx = (mode_ctx >> 4) & 15
                self.fc.write(self.enc, "refmv", (refmv_ctx,), int(mode != 13), 2)

    def _write_drl(self, stack, weights, refmv_count):
        """drl_index = 0 always (write_drl_idx NEWMV branch)."""
        for idx in range(2):
            if refmv_count > idx + 1:
                w0 = weights[idx] if idx < len(weights) else 0
                w1 = weights[idx + 1] if idx + 1 < len(weights) else 0
                if w0 >= REF_CAT_LEVEL and w1 >= REF_CAT_LEVEL:
                    ctx = 0
                elif w0 >= REF_CAT_LEVEL and w1 < REF_CAT_LEVEL:
                    ctx = 1
                else:
                    ctx = 2
                self.fc.write(self.enc, "drl", (ctx,), int(0 != idx), 2)
                if idx == 0:
                    return

    def _write_drl_near(self, weights, refmv_count, near_idx=0):
        """read_drl_idx NEARMV branch: one bit per idx, stop at 0
        (ref_mv_idx = near_idx -> stack[1 + near_idx])."""
        def drl_ctx(i):
            a = weights[i] if len(weights) > i else 0
            b = weights[i + 1] if len(weights) > i + 1 else 0
            if a >= REF_CAT_LEVEL and b >= REF_CAT_LEVEL:
                return 0
            return 1 if a >= REF_CAT_LEVEL else 2

        if refmv_count > 2:
            self.fc.write(self.enc, "drl", (drl_ctx(1),),
                          int(near_idx > 0), 2)
            if near_idx > 0 and refmv_count > 3:
                self.fc.write(self.enc, "drl", (drl_ctx(2),), 0, 2)

    def _write_mv(self, mv, ref_mv):
        diff = (mv[0] - ref_mv[0], mv[1] - ref_mv[1])
        joint = (2 if diff[1] else 0) | (1 if diff[0] else 0)
        # MV_JOINT: ZERO=0, HNZVZ=1(col only), HZVNZ=2(row only), HNZVNZ=3
        joint = (0 if diff[0] == 0 and diff[1] == 0 else
                 1 if diff[0] == 0 else 2 if diff[1] == 0 else 3)
        self.fc.write(self.enc, "nmv_joints", (), joint, 4)
        for comp in range(2):
            d = diff[comp]
            if d == 0:
                continue
            sign = int(d < 0)
            mag = -d if sign else d
            cls, offset = _mv_class(mag - 1)
            di = offset >> 3
            fr = (offset >> 1) & 3
            hp = offset & 1
            self.fc.write(self.enc, "nmv_sign", (comp,), sign, 2)
            self.fc.write(self.enc, "nmv_classes", (comp,), cls, 11)
            if cls == 0:
                self.fc.write(self.enc, "nmv_class0", (comp,), di, 2)
            else:
                for i in range(cls + 0):
                    self.fc.write(self.enc, "nmv_bits", (comp, i), (di >> i) & 1, 2)
            # precision: allow_high_precision_mv=1, force_integer=0
            if cls == 0:
                self.fc.write(self.enc, f"nmv_class0_fp{di}", (comp,), fr, 4)
            else:
                self.fc.write(self.enc, "nmv_fp", (comp,), fr, 4)
            if cls == 0:
                self.fc.write(self.enc, "nmv_class0_hp", (comp,), hp, 2)
            else:
                self.fc.write(self.enc, "nmv_hp", (comp,), hp, 2)

    def _write_y_mode_inter(self, bsize, mode):
        """Intra y mode in inter frames: y_mode_cdf[size_group]."""
        grp = SIZE_GROUP[int(bsize)]
        self.fc.write(self.enc, "if_y_mode", (grp,), int(mode), 13)
        if bsize >= BlockSize.BLOCK_8X8 and 1 <= int(mode) <= 8:
            self.fc.write(self.enc, "angle_delta", (int(mode) - 1,), 3, 7)

    def _write_tx_type_any(self, tx_size, y_mode, is_inter, tx_type=0):
        if self.qindex == 0:
            return
        if is_inter:
            eset = inter_ext_tx_set(int(tx_size))
            if eset == 0:
                return
            self.fc.write(self.enc, "inter_ext_tx", (eset, int(_SQR[int(tx_size)])),
                          EXT_TX_IND_INTER[eset][int(tx_type)],
                          EXT_TX_NSYMS_INTER[eset])
        else:
            self._write_tx_type(tx_size, y_mode)
