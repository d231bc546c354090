"""All-intra (key frame) encoder: partition walk, mode decision, transform
pipeline, reconstruction, and tile symbol emission.

This is the v0 end-to-end slice (SURVEY.md §7 step 3): DC/V/H/SMOOTH/PAETH
intra over a 64x64-SB partition tree (forced splits at frame edges),
TX_MODE_LARGEST (one transform per plane block), DCT only, single or multiple
tiles, conformant recon (verified against libaom/dav1d via the AVIF oracle).

Behavioral reference for syntax order: entropy_coding.c:4820-4960
(write_modes_b I-slice path), encode_partition_av1 (:1005).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..bitstream import ec_native
from ..bitstream.frame_context import FrameContext
from ..bitstream.range_coder import RangeEncoder, update_cdf
from .coeff_coding import (
    COEFF_CONTEXT_MASK,
    get_txb_ctx,
    write_coeffs_txb,
    write_coeffs_txb_native,
)
from .constants import (
    BLOCK_HEIGHT,
    BLOCK_WIDTH,
    BlockSize,
    PartitionType,
    PredictionMode,
    TX_HEIGHT,
    TX_WIDTH,
    TxSize,
    UVPredictionMode,
)
from .intra import predict
from .intra_dir import dr_pred
from .quant import build_plane_quant, quantize_b
from .spec_tables import get_tables
from .deblock import DeblockMaps, deblock_plane
from .transforms import forward_transform_2d, inverse_transform_add

# largest rect tx fitting each block size (definitions.h max_txsize_rect)
MAX_TX_RECT = {
    BlockSize.BLOCK_4X4: TxSize.TX_4X4, BlockSize.BLOCK_4X8: TxSize.TX_4X8,
    BlockSize.BLOCK_8X4: TxSize.TX_8X4, BlockSize.BLOCK_8X8: TxSize.TX_8X8,
    BlockSize.BLOCK_8X16: TxSize.TX_8X16, BlockSize.BLOCK_16X8: TxSize.TX_16X8,
    BlockSize.BLOCK_16X16: TxSize.TX_16X16, BlockSize.BLOCK_16X32: TxSize.TX_16X32,
    BlockSize.BLOCK_32X16: TxSize.TX_32X16, BlockSize.BLOCK_32X32: TxSize.TX_32X32,
    BlockSize.BLOCK_32X64: TxSize.TX_32X64, BlockSize.BLOCK_64X32: TxSize.TX_64X32,
    BlockSize.BLOCK_64X64: TxSize.TX_64X64, BlockSize.BLOCK_4X16: TxSize.TX_4X16,
    BlockSize.BLOCK_16X4: TxSize.TX_16X4, BlockSize.BLOCK_8X32: TxSize.TX_8X32,
    BlockSize.BLOCK_32X8: TxSize.TX_32X8, BlockSize.BLOCK_16X64: TxSize.TX_16X64,
    BlockSize.BLOCK_64X16: TxSize.TX_64X16,
}

_BSIZE_BY_WH = {(int(BLOCK_WIDTH[b]), int(BLOCK_HEIGHT[b])): BlockSize(b) for b in range(22)}

# kf y-mode neighbor context classes (intra_mode_context)
INTRA_MODE_CONTEXT = np.array([0, 1, 2, 3, 4, 4, 4, 4, 3, 0, 1, 2, 0])

# partition context lookup (above, left) per block size
PARTITION_CTX_LOOKUP = {
    BlockSize.BLOCK_4X4: (31, 31), BlockSize.BLOCK_4X8: (31, 30),
    BlockSize.BLOCK_8X4: (30, 31), BlockSize.BLOCK_8X8: (30, 30),
    BlockSize.BLOCK_8X16: (30, 28), BlockSize.BLOCK_16X8: (28, 30),
    BlockSize.BLOCK_16X16: (28, 28), BlockSize.BLOCK_16X32: (28, 24),
    BlockSize.BLOCK_32X16: (24, 28), BlockSize.BLOCK_32X32: (24, 24),
    BlockSize.BLOCK_32X64: (24, 16), BlockSize.BLOCK_64X32: (16, 24),
    BlockSize.BLOCK_64X64: (16, 16), BlockSize.BLOCK_64X128: (16, 0),
    BlockSize.BLOCK_128X64: (0, 16), BlockSize.BLOCK_128X128: (0, 0),
    BlockSize.BLOCK_4X16: (31, 28), BlockSize.BLOCK_16X4: (28, 31),
    BlockSize.BLOCK_8X32: (30, 24), BlockSize.BLOCK_32X8: (24, 30),
    BlockSize.BLOCK_16X64: (28, 16), BlockSize.BLOCK_64X16: (16, 28),
}

# av1_ext_tx_ind / num sets (cabac_context_model.h:686, definitions.h:1769):
# intra sets: eset 1 = DTT4_IDTX_1DDCT (7 syms), eset 2 = DTT4_IDTX (5 syms);
# DCT_DCT codes as symbol 1 in both.
EXT_TX_IND_INTRA = {
    1: [1, 5, 6, 4, 0, 0, 0, 0, 0, 0, 2, 3, 0, 0, 0, 0],
    2: [1, 3, 4, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
}
EXT_TX_NSYMS_INTRA = {1: 7, 2: 5}

_SQR = np.array([0, 1, 2, 3, 4, 0, 0, 1, 1, 2, 2, 3, 3, 0, 0, 1, 1, 2, 2])
_SQR_UP = np.array([0, 1, 2, 3, 4, 1, 1, 2, 2, 3, 3, 4, 4, 2, 2, 3, 3, 4, 4])


def intra_ext_tx_set(tx_size: int) -> int:
    """Intra ext-tx set index (0 = DCT only, no signaling)."""
    if _SQR_UP[tx_size] >= 3:  # TX_32X32 and up
        return 0
    return 2 if _SQR[tx_size] == 2 else 1


def _partition_subsize(bsize: BlockSize, part: PartitionType) -> BlockSize:
    w, h = int(BLOCK_WIDTH[bsize]), int(BLOCK_HEIGHT[bsize])
    if part == PartitionType.PARTITION_NONE:
        return bsize
    if part == PartitionType.PARTITION_SPLIT:
        return _BSIZE_BY_WH[(w // 2, h // 2)]
    if part in (PartitionType.PARTITION_HORZ, PartitionType.PARTITION_HORZ_A,
                PartitionType.PARTITION_HORZ_B):
        return _BSIZE_BY_WH[(w, h // 2)]
    if part in (PartitionType.PARTITION_VERT, PartitionType.PARTITION_VERT_A,
                PartitionType.PARTITION_VERT_B):
        return _BSIZE_BY_WH[(w // 2, h)]
    if part == PartitionType.PARTITION_HORZ_4:
        return _BSIZE_BY_WH[(w, h // 4)]
    if part == PartitionType.PARTITION_VERT_4:
        return _BSIZE_BY_WH[(w // 4, h)]
    raise ValueError(part)


def _cdf_prob(icdf, i):
    prev = 32768 if i == 0 else int(icdf[i - 1])
    return prev - int(icdf[i])


def _gather_vert_alike(icdf, bsize):
    p = 32768
    for s in (PartitionType.PARTITION_VERT, PartitionType.PARTITION_SPLIT,
              PartitionType.PARTITION_HORZ_A, PartitionType.PARTITION_VERT_A,
              PartitionType.PARTITION_VERT_B):
        p -= _cdf_prob(icdf, int(s))
    if bsize != BlockSize.BLOCK_128X128:
        p -= _cdf_prob(icdf, int(PartitionType.PARTITION_VERT_4))
    return np.array([32768 - p, 0, 0], dtype=np.uint16)


def _gather_horz_alike(icdf, bsize):
    p = 32768
    for s in (PartitionType.PARTITION_HORZ, PartitionType.PARTITION_SPLIT,
              PartitionType.PARTITION_HORZ_A, PartitionType.PARTITION_HORZ_B,
              PartitionType.PARTITION_VERT_A):
        p -= _cdf_prob(icdf, int(s))
    if bsize != BlockSize.BLOCK_128X128:
        p -= _cdf_prob(icdf, int(PartitionType.PARTITION_HORZ_4))
    return np.array([32768 - p, 0, 0], dtype=np.uint16)


@dataclass
class PlaneState:
    recon: np.ndarray         # (aligned_h, aligned_w) uint16
    above_ctx: np.ndarray     # per-4x4 entropy context
    left_ctx: np.ndarray
    width: int                # aligned plane dims
    height: int


class IntraFrameEncoder:
    """Encodes one key frame; single tile v0 (tile loop lives in the caller)."""

    def __init__(self, width, height, qindex, bd=8, monochrome=False,
                 sharpness=0, disable_cdf_update=False,
                 target_bsize=BlockSize.BLOCK_32X32,
                 sb_qindex_map=None, delta_q_res=4, qm_levels=None, psy_rd=0.0,
                 seg_params=None, sb_seg_map=None, noise_norm=0,
                 enable_filter_intra=False, chroma_delta=0, plane_dq=None,
                 decisions=None, filter_intra_search=True, cfl_search=True,
                 allow_sct=False, palette_level=-1, allow_intrabc=False,
                 mode_candidates=(PredictionMode.DC_PRED, PredictionMode.V_PRED,
                                  PredictionMode.H_PRED, PredictionMode.D45_PRED,
                                  PredictionMode.D135_PRED, PredictionMode.D113_PRED,
                                  PredictionMode.D157_PRED, PredictionMode.D203_PRED,
                                  PredictionMode.D67_PRED, PredictionMode.SMOOTH_PRED,
                                  PredictionMode.SMOOTH_V_PRED, PredictionMode.SMOOTH_H_PRED,
                                  PredictionMode.PAETH_PRED)):
        # target_bsize: leaf block size when not forced smaller by frame edges
        # (32x32 default: full coefficient coverage; TX_64 codes only the
        # low-frequency 32x32 region). TX_MODE_LARGEST, so tx == block.
        self.target_bsize = BlockSize(target_bsize)
        # lossless coding (qindex 0): TxMode is ONLY_4X4 and every 4x4
        # transform is the WHT (spec 7.13.3); blocks code as 8x8 leaves
        # with four 4x4 luma txbs (EbSvtAv1Enc.h:940 --lossless)
        self.lossless = qindex == 0
        self.w, self.h = width, height
        self.bd = bd
        self.mono = monochrome
        self.qindex = qindex
        self.sharpness = sharpness
        self.mode_candidates = mode_candidates
        self.mi_cols = 2 * ((width + 7) >> 3)
        self.mi_rows = 2 * ((height + 7) >> 3)
        self.aligned_w = self.mi_cols * 4
        self.aligned_h = self.mi_rows * 4
        self.sb_size = 64
        self.fc = FrameContext(qindex, disable_cdf_update)
        self.use_native_ec = ec_native.available()
        self.enc = ec_native.NativeRangeEncoder() if self.use_native_ec else RangeEncoder()
        self.tables = get_tables()
        nplanes = 1 if monochrome else 3
        self.nplanes = nplanes
        # per-SB delta-q (variance boost / AQ); entries must be
        # qindex + k*delta_q_res (svt_variance_adjust_qp guarantees this)
        self.sb_qindex_map = sb_qindex_map
        self.delta_q_res = delta_q_res
        self.delta_q_present = sb_qindex_map is not None
        self._prev_qindex = qindex
        self._sb_qindex = qindex
        self._sb_delta_pending = False
        # chroma planes quantize at base + chroma_delta (tune-specific
        # chroma boost, rc_process.c:3444-3473; signaled as u/v delta q)
        self.chroma_delta = int(chroma_delta)
        # per-plane DC/AC qindex deltas (y_dc, u_dc, u_ac, v_dc, v_ac) —
        # must equal the frame header's delta_q fields (the user's
        # luma_y_dc_/chroma_*_qindex_offset knobs stack on chroma_delta)
        self.plane_dq = (tuple(int(d) for d in plane_dq)
                         if plane_dq is not None
                         else (0,) + (int(chroma_delta),) * 4)
        self.quant = self._build_quants(qindex)
        # quantizer matrices (spec §9.5): per-frame (qm_y, qm_u, qm_v) levels
        # or None for flat; applied to 2D transforms only (full_loop.c:1365)
        self.qm_levels = qm_levels
        self._qm_cache: dict = {}
        # psy-rd strength: energy-preserving bias in mode decision (psy_rd.c)
        self.psy_rd = float(psy_rd)
        self.enable_cfl = bool(cfl_search)  # chroma-from-luma candidate in uv decision
        # segmentation (SEG_LVL_ALT_Q): per-SB intended segments + 4x4 map
        self.seg_params = seg_params
        self.sb_seg_map = sb_seg_map
        self.seg_map = np.zeros((self.mi_rows, self.mi_cols), np.uint8)
        self._seg_quant = {}
        # PSY noise normalization strength (0 off; quant.noise_normalize)
        self.noise_norm = int(noise_norm)
        # filter intra (recursive 7-tap modes; must match the sequence
        # header's enable_filter_intra bit)
        self.enable_filter_intra = bool(enable_filter_intra)
        # device RDO decisions (codec/intra_rdo.IntraDecisions): partition
        # tree + per-block mode/tx-type maps from the open-loop search.
        # None -> legacy fixed-leaf behavior with host mode search.
        self.decisions = decisions
        self.filter_intra_search = bool(filter_intra_search)
        self.cfl_search = bool(cfl_search)
        # allow_screen_content_tools: frame header bit must match; when on,
        # DC blocks carry palette-off flags (write_palette_mode_info,
        # entropy_coding.c:4254)
        self.allow_sct = bool(allow_sct)
        # palette (screen content): level -1 = auto (on when screen-content
        # tools are on), 0 = off, 1..6 = on (palette.c candidate ladder)
        self.palette_enabled = (self.allow_sct and palette_level != 0
                                and qindex > 0)
        # mi-grid state
        self.tile_mi = (0, self.mi_rows, 0, self.mi_cols)
        self.mi_mode = np.zeros((self.mi_rows, self.mi_cols), np.int8)
        self.mi_skip = np.zeros((self.mi_rows, self.mi_cols), np.int8)
        self.pal_size = np.zeros((self.mi_rows, self.mi_cols), np.int8)
        self.pal_colors = {}   # (mi_row, mi_col) -> tuple of base colors
        # intra block copy (screen content): DVs tracked in a MiGrid so the
        # decoder-normative DV-ref stack (ref INTRA_FRAME) reproduces
        self.allow_intrabc_on = bool(allow_intrabc)
        if self.allow_intrabc_on:
            from .mv_pred import MiGrid

            self.ibc_grid = MiGrid(self.mi_rows, self.mi_cols)
        self.part_above = np.zeros(self.mi_cols, np.uint8)
        self.part_left = np.zeros(self.mi_rows, np.uint8)
        self.planes: list[PlaneState] = []

    # ------------------------------------------------------------ segments
    def _build_quants(self, qindex):
        pdq = self.plane_dq
        deltas = ((pdq[0], 0), (pdq[1], pdq[2]), (pdq[3], pdq[4]))
        return [build_plane_quant(qindex, deltas[p][0], deltas[p][1],
                                  self.bd, self.sharpness, self.qindex)
                for p in range(self.nplanes)]

    def _block_segment(self, mi_row, mi_col) -> int:
        """Intended segment for this block (per-SB assignment) and the
        matching quantizer tables (SEG_LVL_ALT_Q offsets the qindex)."""
        if self.seg_params is None:
            return 0
        seg = int(self.sb_seg_map[min(mi_row >> 4, self.sb_seg_map.shape[0] - 1),
                                  min(mi_col >> 4, self.sb_seg_map.shape[1] - 1)])
        if seg not in self._seg_quant:
            q = self.seg_params.seg_qindex(self.qindex, seg)
            self._seg_quant[seg] = self._build_quants(q)
        self.quant = self._seg_quant[seg]
        return seg

    def _write_segment_id(self, mi_row, mi_col, bsize, seg, skip):
        """Coded after the skip flag (seg_id_pre_skip = 0; entropy_coding.c
        :4838-4842). Skip blocks inherit the spatial prediction."""
        if self.seg_params is None:
            return
        from .segmentation import neg_interleave, spatial_seg_pred

        pred, ctx = spatial_seg_pred(self.seg_map, mi_row, mi_col, self.tile_mi)
        h4, w4 = int(BLOCK_HEIGHT[bsize]) >> 2, int(BLOCK_WIDTH[bsize]) >> 2
        r1 = min(mi_row + h4, self.mi_rows)
        c1 = min(mi_col + w4, self.mi_cols)
        if skip:
            self.seg_map[mi_row:r1, mi_col:c1] = pred
            return
        coded = neg_interleave(seg, pred,
                               self.seg_params.last_active_seg_id + 1)
        self.fc.write(self.enc, "spatial_pred_seg_tree", (ctx,), coded, 8)
        self.seg_map[mi_row:r1, mi_col:c1] = seg

    # ---------------------------------------------------------------- CFL
    @staticmethod
    def _cfl_ac(luma_recon: np.ndarray, cw: int, ch: int) -> np.ndarray:
        """Chroma-from-luma AC contributions (spec 7.11.5; 4:2:0 subsample
        svt_cfl_luma_subsampling_420 :420 then svt_subtract_average :448)."""
        l = luma_recon[: 2 * ch, : 2 * cw].astype(np.int32)
        sub_q3 = (l[0::2, 0::2] + l[0::2, 1::2] + l[1::2, 0::2] + l[1::2, 1::2]) << 1
        npel_log2 = (cw * ch).bit_length() - 1
        avg_q3 = (int(sub_q3.sum()) + (1 << (npel_log2 - 1))) >> npel_log2
        return sub_q3 - avg_q3

    def _cfl_search(self, ac: np.ndarray, dc_preds: list, cx, cy, cw, ch):
        """Best alpha_q3 per plane by SSE; returns ((a_u, a_v), preds, gain)
        where gain is the SSE improvement over plain DC."""
        peak = (1 << self.bd) - 1
        alphas = np.arange(-16, 17)
        scaled = alphas[:, None, None] * ac[None]
        scaled = np.where(scaled < 0, -((-scaled + 32) >> 6), (scaled + 32) >> 6)
        best = []
        preds = []
        gain = 0
        for plane in (1, 2):
            dc = dc_preds[plane - 1].astype(np.int32)
            cand = np.clip(dc[None] + scaled, 0, peak)
            srcp = self.src[plane][cy : cy + ch, cx : cx + cw].astype(np.int64)
            sse = ((cand - srcp) ** 2).sum(axis=(1, 2))
            k = int(np.argmin(sse))
            best.append(int(alphas[k]))
            preds.append(cand[k].astype(np.uint16))
            gain += int(sse[16] - sse[k])    # alpha 0 == plain DC
        return tuple(best), preds, gain

    def _write_cfl_alphas(self, alpha_u: int, alpha_v: int):
        """cfl_alpha_signs + per-plane alpha indices (definitions.h:1078-1094)."""
        def sign(a):
            return 0 if a == 0 else (1 if a < 0 else 2)   # ZERO, NEG, POS

        su, sv = sign(alpha_u), sign(alpha_v)
        joint = su * 3 + sv - 1
        self.fc.write(self.enc, "cfl_sign", (), joint, 8)
        if su != 0:
            ctx_u = joint - 2                              # CFL_CONTEXT_U
            self.fc.write(self.enc, "cfl_alpha", (ctx_u,), abs(alpha_u) - 1, 16)
        if sv != 0:
            ctx_v = sv * 3 + su - 3                        # CFL_CONTEXT_V
            self.fc.write(self.enc, "cfl_alpha", (ctx_v,), abs(alpha_v) - 1, 16)

    def _psy_cost(self, src: np.ndarray, pred: np.ndarray) -> int:
        """psy-rd bias for a mode candidate (product_coding_loop.c:1024).
        The source-side energy is cached per block (candidate-invariant)."""
        if self.psy_rd <= 0:
            return 0
        from ..psy.psy_rd import block_energy, psy_full_dist

        key = (src.__array_interface__["data"][0], src.shape)
        if getattr(self, "_psy_src_key", None) != key:
            self._psy_src_key = key
            self._psy_src_energy = block_energy(src)
        return psy_full_dist(src, pred, self.psy_rd, self.bd,
                             src_energy=self._psy_src_energy)

    def _get_qm(self, plane: int, tx_size: int, tx_type: int = 0):
        """(qm, iqm) for this plane/tx, or (None, None) when QM is off or the
        transform is 1D/identity (IS_2D_TRANSFORM gate, full_loop.c:1365)."""
        if self.qm_levels is None or tx_type >= 9:  # IS_2D_TRANSFORM: < IDTX
            return None, None
        key = (plane, int(tx_size))
        got = self._qm_cache.get(key)
        if got is None:
            from .qm import get_qm
            got = get_qm(self.qm_levels[plane], plane > 0, int(tx_size))
            self._qm_cache[key] = got
        return got

    # ------------------------------------------------------------- planes
    def _init_planes(self, y, u, v):
        def pad(plane, pw, ph):
            src = np.zeros((ph, pw), np.uint16)
            h0, w0 = plane.shape
            src[:h0, :w0] = plane
            src[:h0, w0:] = plane[:, -1:]
            src[h0:, :] = src[h0 - 1 : h0, :]
            return src

        # source is padded to SB-aligned extents: blocks whose top-left mi is
        # in-frame may legally stick out past the mi-aligned area (recon
        # writes stay clipped to the aligned dims, matching the decoder)
        sb_w = -(-self.aligned_w // self.sb_size) * self.sb_size
        sb_h = -(-self.aligned_h // self.sb_size) * self.sb_size
        self.decoded = []  # per-plane 4x4-unit decoded bitmap (spec BlockDecoded)
        self.src = [pad(y.astype(np.uint16), sb_w, sb_h)]
        self.planes = [PlaneState(
            recon=np.zeros((self.aligned_h, self.aligned_w), np.uint16),
            above_ctx=np.zeros(self.aligned_w >> 2, np.uint8),
            left_ctx=np.zeros(self.aligned_h >> 2, np.uint8),
            width=self.aligned_w, height=self.aligned_h)]
        self.decoded.append(np.zeros((self.aligned_h >> 2, self.aligned_w >> 2), bool))
        self.dlf_maps = [DeblockMaps(self.aligned_h >> 2, self.aligned_w >> 2)]
        if not self.mono:
            cw, ch = self.aligned_w >> 1, self.aligned_h >> 1
            for p in (u, v):
                self.src.append(pad(p.astype(np.uint16), sb_w >> 1, sb_h >> 1))
                self.planes.append(PlaneState(
                    recon=np.zeros((ch, cw), np.uint16),
                    above_ctx=np.zeros(cw >> 2, np.uint8),
                    left_ctx=np.zeros(ch >> 2, np.uint8),
                    width=cw, height=ch))
                self.decoded.append(np.zeros((ch >> 2, cw >> 2), bool))
                self.dlf_maps.append(DeblockMaps(ch >> 2, cw >> 2))

    # ------------------------------------------------------------ neighbors
    def _have_above_right(self, plane, xu, yu, wu):
        """Spec BlockDecoded semantics: the row above the SB is available only
        within the SB's own columns; inside the SB, the decoded bitmap."""
        ps = self.planes[plane]
        ss = 0 if plane == 0 else 1
        _, _, mi_c0, mi_c1 = self.tile_mi
        tile_right_u = (mi_c1 >> ss)
        if xu + wu >= min(tile_right_u, ps.width >> 2):
            return False
        sb_u = self.sb_size >> (2 + ss)
        if yu % sb_u == 0:
            # block at SB top: the row above belongs to the previous SB row,
            # which is fully decoded — above-right is available up to the
            # frame/tile edge (checked above), matching dav1d/libaom
            # has_top_right for mask_row == 0
            return True
        return bool(self.decoded[plane][yu - 1, xu + wu])

    def _have_below_left(self, plane, xu, yu, hu):
        ps = self.planes[plane]
        ss = 0 if plane == 0 else 1
        _, mi_r1, _, _ = self.tile_mi
        tile_bottom_u = (mi_r1 >> ss)
        if yu + hu >= min(tile_bottom_u, ps.height >> 2):
            return False
        sb_u = self.sb_size >> (2 + ss)
        if xu % sb_u == 0:  # block at SB left: target col is left of the SB
            sb_bottom_u = (yu // sb_u + 1) * sb_u
            return yu + hu < sb_bottom_u
        return bool(self.decoded[plane][yu + hu, xu - 1])

    def _gather_neighbors(self, plane, x0, y0, W, H):
        """Returns (above_buf, left_buf, have_above, have_left) with the spec
        substitutions/extensions applied. Buffers are length 1+W+H with the
        top-left corner at [0] (the layout dr prediction needs)."""
        ps = self.planes[plane]
        ss = 0 if plane == 0 else 1
        mi_r0, _, mi_c0, _ = self.tile_mi
        have_above = y0 > ((mi_r0 * 4) >> ss)
        have_left = x0 > ((mi_c0 * 4) >> ss)
        base = 1 << (self.bd - 1)
        maxx = ps.width - 1
        maxy = ps.height - 1
        n = W + H
        above = np.empty(n, np.uint16)
        left = np.empty(n, np.uint16)
        if have_above:
            have_ar = self._have_above_right(plane, x0 >> 2, y0 >> 2, W >> 2)
            span = n if have_ar else W
            cols = np.minimum(np.arange(x0, x0 + span), maxx)
            above[:span] = ps.recon[y0 - 1, cols]
            if not have_ar:
                above[W:] = above[W - 1]
        if have_left:
            have_bl = self._have_below_left(plane, x0 >> 2, y0 >> 2, H >> 2)
            span = n if have_bl else H
            rows = np.minimum(np.arange(y0, y0 + span), maxy)
            left[:span] = ps.recon[rows, x0 - 1]
            if not have_bl:
                left[H:] = left[H - 1]
        if not have_above:
            above[:] = left[0] if have_left else base - 1
        if not have_left:
            left[:] = above[0] if have_above else base + 1
        if have_above and have_left:
            corner = ps.recon[y0 - 1, x0 - 1]
        elif have_above:
            corner = above[0]
        elif have_left:
            corner = left[0]
        else:
            corner = base
        above_buf = np.concatenate(([corner], above)).astype(np.uint16)
        left_buf = np.concatenate(([corner], left)).astype(np.uint16)
        return above_buf, left_buf, have_above, have_left

    # -------------------------------------------------------------- encode
    def encode_frame(self, y, u=None, v=None) -> bytes:
        """Single-tile encode; returns the coded tile payload."""
        return self.encode_tiles(y, u, v)[0]

    def _pre_walk(self):
        """Hook run once per encode_tiles after _init_planes; subclasses use
        it for whole-frame decision pre-passes (inter mode decision)."""

    def encode_tiles(self, y, u=None, v=None, tile_cols_log2=0, tile_rows_log2=0) -> list:
        """Encode with uniform tile spacing; returns per-tile payloads in
        raster order. Tiles are fully independent (own CDFs, contexts,
        prediction boundaries) — the frame-level parallelism axis."""
        self._init_planes(y, u, v)
        self._pre_walk()
        sb_mi = self.sb_size >> 2
        sb_cols = -(-self.mi_cols // sb_mi)
        sb_rows = -(-self.mi_rows // sb_mi)
        tw = -(-sb_cols // (1 << tile_cols_log2))  # tile width in SBs
        th = -(-sb_rows // (1 << tile_rows_log2))
        col_starts = list(range(0, sb_cols, tw)) + [sb_cols]
        row_starts = list(range(0, sb_rows, th)) + [sb_rows]
        payloads = []
        for tr in range(len(row_starts) - 1):
            for tc in range(len(col_starts) - 1):
                payloads.append(self._encode_tile(
                    row_starts[tr] * sb_mi, min(row_starts[tr + 1] * sb_mi, self.mi_rows),
                    col_starts[tc] * sb_mi, min(col_starts[tc + 1] * sb_mi, self.mi_cols)))
        return payloads

    def _encode_tile(self, mi_r0, mi_r1, mi_c0, mi_c1) -> bytes:
        sb_mi = self.sb_size >> 2
        # fresh per-tile coding state (tiles are independent)
        self.fc = FrameContext(self.qindex, self.fc.disable_update)
        self.enc = ec_native.NativeRangeEncoder() if self.use_native_ec else RangeEncoder()
        self.tile_mi = (mi_r0, mi_r1, mi_c0, mi_c1)
        # per-tile LR coefficient references (set_default_wiener,
        # entropy_coding.c:3930)
        from .restoration import DEFAULT_TAPS, SGR_XQD_REF_INIT

        self._lr_refs = [{"h": list(DEFAULT_TAPS), "v": list(DEFAULT_TAPS),
                          "sgr": list(SGR_XQD_REF_INIT)} for _ in range(3)]
        self._prev_qindex = self.qindex
        self.part_above[mi_c0:mi_c1] = 0
        self.part_left[mi_r0:mi_r1] = 0
        for plane, ps in enumerate(self.planes):
            ss = 0 if plane == 0 else 1
            # entropy ctx arrays are in plane 4x4 units: unit = (mi*4>>ss)>>2
            ps.above_ctx[mi_c0 >> ss : mi_c1 >> ss] = 0
            ps.left_ctx[mi_r0 >> ss : mi_r1 >> ss] = 0
        # native tile walk: one C call for the whole conformant final pass
        # (falls back to the bit-identical Python walk for features the C
        # driver does not cover: segmentation, LR re-encode, noise-norm,
        # filter-intra search; tests/test_walk_native.py asserts equality)
        from . import walk_native

        if walk_native.eligible(self):
            from ..profiling import stage

            with stage("host:walk"):
                walk_native.encode_tile(self, mi_r0, mi_r1, mi_c0, mi_c1)
            return self.enc.done()
        for mi_row in range(mi_r0, mi_r1, sb_mi):
            for mi_col in range(mi_c0, mi_c1, sb_mi):
                if self.delta_q_present:
                    self._sb_qindex = int(self.sb_qindex_map[mi_row // sb_mi, mi_col // sb_mi])
                    self._sb_delta_pending = True
                    self.quant = self._build_quants(self._sb_qindex)
                self._write_lr_for_sb(mi_row, mi_col)
                self._walk_partition(mi_row, mi_col, BlockSize.BLOCK_64X64)
        return self.enc.done()

    def _write_lr_for_sb(self, mi_row, mi_col):
        """LR unit info for units whose top-left is in this SB (coded before
        the SB's partition symbol; entropy_coding.c:5333)."""
        if not getattr(self, "rsts", None):
            return
        from .restoration import RESTORE_NONE, lr_units_in_sb, write_lr_unit

        for plane, pr in enumerate(self.rsts):
            if pr is None or pr.frame_type == RESTORE_NONE:
                continue
            for (r, c) in lr_units_in_sb(pr, mi_row, mi_col, self.sb_size >> 2,
                                         getattr(self, 'sr_denom', 8)):
                write_lr_unit(self.fc, self.enc, pr.frame_type,
                              pr.unit_info[r][c], self._lr_refs[plane],
                              plane > 0)

    @property
    def recon_y(self):
        return self.planes[0].recon[: self.h, : self.w]

    def recon_plane(self, plane):
        if plane == 0:
            return self.recon_y
        ch, cw = (self.h + 1) >> 1, (self.w + 1) >> 1
        return self.planes[plane].recon[:ch, :cw]

    # ------------------------------------------------------- partition walk
    def _walk_partition(self, mi_row, mi_col, bsize):
        if mi_row >= self.mi_rows or mi_col >= self.mi_cols:
            return
        bw4 = int(BLOCK_WIDTH[bsize]) >> 2
        half = bw4 >> 1
        has_rows = (mi_row + half) < self.mi_rows
        has_cols = (mi_col + half) < self.mi_cols

        if has_rows and has_cols:
            W = int(BLOCK_WIDTH[bsize])
            if self.decisions is not None:
                rp = self.decisions.rect_part(mi_row, mi_col, W)
                if rp == 2:
                    part = PartitionType.PARTITION_HORZ
                elif rp == 3:
                    part = PartitionType.PARTITION_VERT
                elif 4 <= rp <= 9:
                    # AB/4-way partitions (product_coding_loop.c:9791)
                    part = PartitionType(rp)
                elif W > 8 and self.decisions.split(mi_row, mi_col, W):
                    part = PartitionType.PARTITION_SPLIT
                else:
                    part = PartitionType.PARTITION_NONE
            elif W > int(BLOCK_WIDTH[self.target_bsize]):
                part = PartitionType.PARTITION_SPLIT
            else:
                part = PartitionType.PARTITION_NONE
        elif has_cols:
            part = PartitionType.PARTITION_HORZ
        elif has_rows:
            part = PartitionType.PARTITION_VERT
        else:
            part = PartitionType.PARTITION_SPLIT

        if bsize >= BlockSize.BLOCK_8X8:
            self._write_partition(mi_row, mi_col, bsize, part, has_rows, has_cols)

        subsize = _partition_subsize(bsize, part)
        quarter = _partition_subsize(bsize, PartitionType.PARTITION_SPLIT)
        PT = PartitionType
        if part == PT.PARTITION_NONE:
            self._encode_block(mi_row, mi_col, bsize)
        elif part == PT.PARTITION_HORZ:
            self._encode_block(mi_row, mi_col, subsize)
            if mi_row + half < self.mi_rows:
                self._encode_block(mi_row + half, mi_col, subsize)
        elif part == PT.PARTITION_VERT:
            self._encode_block(mi_row, mi_col, subsize)
            if mi_col + half < self.mi_cols:
                self._encode_block(mi_row, mi_col + half, subsize)
        elif part == PT.PARTITION_HORZ_A:      # spec decode_partition order
            self._encode_block(mi_row, mi_col, quarter)
            self._encode_block(mi_row, mi_col + half, quarter)
            self._encode_block(mi_row + half, mi_col, subsize)
        elif part == PT.PARTITION_HORZ_B:
            self._encode_block(mi_row, mi_col, subsize)
            self._encode_block(mi_row + half, mi_col, quarter)
            self._encode_block(mi_row + half, mi_col + half, quarter)
        elif part == PT.PARTITION_VERT_A:
            self._encode_block(mi_row, mi_col, quarter)
            self._encode_block(mi_row + half, mi_col, quarter)
            self._encode_block(mi_row, mi_col + half, subsize)
        elif part == PT.PARTITION_VERT_B:
            self._encode_block(mi_row, mi_col, subsize)
            self._encode_block(mi_row, mi_col + half, quarter)
            self._encode_block(mi_row + half, mi_col + half, quarter)
        elif part == PT.PARTITION_HORZ_4:
            qh = bw4 >> 2
            for i in range(4):
                if mi_row + i * qh < self.mi_rows:
                    self._encode_block(mi_row + i * qh, mi_col, subsize)
        elif part == PT.PARTITION_VERT_4:
            qw = bw4 >> 2
            for i in range(4):
                if mi_col + i * qw < self.mi_cols:
                    self._encode_block(mi_row, mi_col + i * qw, subsize)
        else:  # SPLIT
            self._walk_partition(mi_row, mi_col, subsize)
            self._walk_partition(mi_row, mi_col + half, subsize)
            self._walk_partition(mi_row + half, mi_col, subsize)
            self._walk_partition(mi_row + half, mi_col + half, subsize)

        def _ctx_span(r, c, ctx_bsize, span_bsize):
            a, l = PARTITION_CTX_LOOKUP[ctx_bsize]
            w4 = int(BLOCK_WIDTH[span_bsize]) >> 2
            h4 = int(BLOCK_HEIGHT[span_bsize]) >> 2
            self.part_above[c : c + w4] = a
            self.part_left[r : r + h4] = l

        # update_ext_partition_context: AB partitions update in two spans
        if part == PT.PARTITION_HORZ_A:
            _ctx_span(mi_row, mi_col, quarter, subsize)
            _ctx_span(mi_row + half, mi_col, subsize, subsize)
        elif part == PT.PARTITION_HORZ_B:
            _ctx_span(mi_row, mi_col, subsize, subsize)
            _ctx_span(mi_row + half, mi_col, quarter, subsize)
        elif part == PT.PARTITION_VERT_A:
            _ctx_span(mi_row, mi_col, quarter, subsize)
            _ctx_span(mi_row, mi_col + half, subsize, subsize)
        elif part == PT.PARTITION_VERT_B:
            _ctx_span(mi_row, mi_col, subsize, subsize)
            _ctx_span(mi_row, mi_col + half, quarter, subsize)
        elif part != PT.PARTITION_SPLIT:
            a, l = PARTITION_CTX_LOOKUP[subsize]
            self.part_above[mi_col : mi_col + bw4] = a
            self.part_left[mi_row : mi_row + bw4] = l

    def _write_partition(self, mi_row, mi_col, bsize, part, has_rows, has_cols):
        if not has_rows and not has_cols:
            return  # implied SPLIT
        # bsl is relative to the 8x8 minimum partition point (encode_partition_av1)
        bsl = {8: 0, 16: 1, 32: 2, 64: 3, 128: 4}[int(BLOCK_WIDTH[bsize])]
        above = (int(self.part_above[mi_col]) >> bsl) & 1
        left = (int(self.part_left[mi_row]) >> bsl) & 1
        ctx_index = (left * 2 + above) + bsl * 4
        nsyms = 4 if bsize == BlockSize.BLOCK_8X8 else (8 if bsize == BlockSize.BLOCK_128X128 else 10)
        row = self.fc.tables["partition"][ctx_index]
        if has_rows and has_cols:
            if self.fc.disable_update:
                self.enc.encode_symbol(int(part), row, nsyms)
            else:
                self.enc.encode_symbol_adapt(int(part), row, nsyms)
        elif has_cols:
            cdf = _gather_vert_alike(row, bsize)
            self.enc.encode_symbol(int(part == PartitionType.PARTITION_SPLIT), cdf, 2)
        else:
            cdf = _gather_horz_alike(row, bsize)
            self.enc.encode_symbol(int(part == PartitionType.PARTITION_SPLIT), cdf, 2)

    # ------------------------------------------------------------- block
    def _encode_block(self, mi_row, mi_col, bsize):
        if self.lossless:
            return self._encode_block_lossless(mi_row, mi_col, bsize)
        W, H = int(BLOCK_WIDTH[bsize]), int(BLOCK_HEIGHT[bsize])
        x0, y0 = mi_col * 4, mi_row * 4
        bw4, bh4 = W >> 2, H >> 2
        seg = self._block_segment(mi_row, mi_col)

        # ---- luma mode decision on recon neighbors
        above_buf, left_buf, have_a, have_l = self._gather_neighbors(0, x0, y0, W, H)
        src = self.src[0][y0 : y0 + H, x0 : x0 + W]
        tx_type_y = 0
        if self.decisions is not None:
            # mode + tx type decided by the open-loop device RDO search
            best_mode = PredictionMode(self.decisions.mode(mi_row, mi_col, W, H))
            best_pred = self._predict(int(best_mode), above_buf, left_buf,
                                      have_a, have_l, W, H)
            best_cost = int(np.sum((src.astype(np.int64) - best_pred) ** 2))
            best_cost += self._psy_cost(src, best_pred)
            tx_type_y = self.decisions.tx_type(mi_row, mi_col, W, H)
        else:
            candidates = self._prune_modes(src)
            best_mode, best_pred, best_cost = None, None, None
            for mode in candidates:
                pred = self._predict(int(mode), above_buf, left_buf, have_a, have_l, W, H)
                cost = int(np.sum((src.astype(np.int64) - pred) ** 2))
                cost += self._psy_cost(src, pred)
                if best_cost is None or cost < best_cost:
                    best_mode, best_pred, best_cost = mode, pred, cost
        fi_mode = None
        if (self.enable_filter_intra and self.filter_intra_search
                and W <= 32 and H <= 32):
            from .intra import filter_intra_predict

            for fi in range(5):
                pred = filter_intra_predict(above_buf, left_buf, W, H, fi, self.bd)
                cost = int(np.sum((src.astype(np.int64) - pred) ** 2))
                cost += self._psy_cost(src, pred)
                if cost < best_cost:
                    best_mode = PredictionMode.DC_PRED
                    best_pred, best_cost = pred, cost
                    fi_mode = fi
        # ---- palette candidate (screen content; palette.c:380 ladder)
        pal_info = None
        if (self.palette_enabled and W >= 8 and W <= 64 and H <= 64
                and x0 + W <= self.w and y0 + H <= self.h):
            from . import palette as PAL
            from .rd import lambda_sse_per_bit

            sel = PAL.select_palette(src, self.bd)
            if sel is not None:
                colors, idx_map, psse = sel
                pal_pred = colors[idx_map.astype(np.int32)].astype(np.uint16)
                lam = getattr(self, "_lam_pal", None)
                if lam is None:
                    lam = self._lam_pal = float(
                        lambda_sse_per_bit(self.qindex, self.bd, "kf"))
                n = len(colors)
                bits = (2.0 + 3.0 + n * (self.bd - 2)
                        + PAL.map_rate_estimate(idx_map, n))
                pcost = psse + self._psy_cost(src, pal_pred) + lam * bits
                if pcost < best_cost:
                    best_mode = PredictionMode.DC_PRED
                    best_pred, best_cost = pal_pred, pcost
                    fi_mode = None
                    tx_type_y = 0
                    pal_info = (colors, idx_map)
        # ---- intra block copy candidate (use_intrabc; screen content)
        ibc_dv = None
        if self.allow_intrabc_on:
            got = self._ibc_search(mi_row, mi_col, W, H, src)
            if got is not None:
                (dvy, dvx), sse = got
                from .rd import lambda_sse_per_bit

                lam = getattr(self, "_lam_pal", None)
                if lam is None:
                    lam = self._lam_pal = float(
                        lambda_sse_per_bit(self.qindex, self.bd, "kf"))
                rec = self.planes[0].recon
                cand = rec[y0 + dvy : y0 + dvy + H, x0 + dvx : x0 + dvx + W]
                cost = (sse + self._psy_cost(src, cand) + lam * 20.0)
                if cost < best_cost:
                    best_mode = PredictionMode.DC_PRED
                    best_pred = cand.copy()
                    best_cost = cost
                    fi_mode = None
                    tx_type_y = 0
                    pal_info = None
                    ibc_dv = (dvy * 8, dvx * 8)
        y_mode = best_mode
        uv_mode = UVPredictionMode.UV_DC_PRED
        cfl_alphas = None   # (alpha_u_q3, alpha_v_q3) when uv_mode is CFL

        def run_plane(plane, px, py, pw, ph, tx_size, pred, tx_type=0):
            psrc = self.src[plane][py : py + ph, px : px + pw]
            resid = psrc.astype(np.int16) - pred.astype(np.int16)
            coeffs = forward_transform_2d(resid[None].astype(np.int32),
                                          int(tx_size), int(tx_type), self.bd)[0]
            cw_t, ch_t = min(pw, 32), min(ph, 32)
            flat = coeffs[:ch_t, :cw_t].reshape(1, -1)
            scan = self.tables.scan(int(tx_size), int(tx_type))
            qm, iqm = self._get_qm(plane, int(tx_size), int(tx_type))
            qc, dqc, eob = quantize_b(flat, scan, self.quant[plane], int(tx_size),
                                      qm=qm, iqm=iqm)
            eob0 = int(eob[0])
            if self.noise_norm and plane == 0:
                from .quant import noise_normalize

                eob0 = noise_normalize(flat[0], qc[0], dqc[0], eob0, scan,
                                       self.quant[plane], int(tx_size),
                                       self.noise_norm, iqm=iqm)
            return (plane, px, py, pw, ph, tx_size, pred, qc[0], dqc[0], eob0,
                    int(tx_type))

        # ---- luma first (its recon feeds CFL); skip decision precedes syntax
        has_uv = not self.mono
        tx_y = MAX_TX_RECT[BlockSize(bsize)]
        results = [run_plane(0, x0, y0, W, H, tx_y, best_pred, tx_type_y)]
        cfl_allowed = W <= 32 and H <= 32
        if has_uv:
            _, _, _, _, _, _, _, _, dqc_y, _, tt_y = results[0]
            cw_t, ch_t = min(W, 32), min(H, 32)
            full = np.zeros((H, W), np.int32)
            full[:ch_t, :cw_t] = dqc_y.reshape(ch_t, cw_t)
            luma_recon = inverse_transform_add(
                full[None], best_pred[None].astype(np.uint16), int(tx_y),
                int(tt_y), self.bd)[0]
            uv_bsize = _BSIZE_BY_WH[(max(W >> 1, 4), max(H >> 1, 4))]
            tx_uv = MAX_TX_RECT[uv_bsize]
            cw, ch = W >> 1, H >> 1
            cx, cy = x0 >> 1, y0 >> 1
            # CFL candidate: AC from this block's luma recon (the decoder's
            # view), alpha searched per plane (intra_prediction.c:420-464)
            in_frame = (x0 + W <= self.planes[0].width
                        and y0 + H <= self.planes[0].height)
            dc_preds = []
            if ibc_dv is not None:
                dvy, dvx = ibc_dv[0] >> 3, ibc_dv[1] >> 3
                for plane in (1, 2):
                    rc = self.planes[plane].recon
                    dc_preds.append(rc[cy + (dvy >> 1) : cy + (dvy >> 1) + ch,
                                       cx + (dvx >> 1) : cx + (dvx >> 1) + cw]
                                    .copy())
            else:
                for plane in (1, 2):
                    pa, pl, pha, phl = self._gather_neighbors(plane, cx, cy, cw, ch)
                    dc_preds.append(self._predict(0, pa, pl, pha, phl, cw, ch))
            if (cfl_allowed and in_frame and self.enable_cfl
                    and ibc_dv is None):
                ac = self._cfl_ac(luma_recon, cw, ch)
                alphas, cfl_preds, gain = self._cfl_search(ac, dc_preds, cx, cy, cw, ch)
                if gain > 0 and alphas != (0, 0):
                    uv_mode = UVPredictionMode.UV_CFL_PRED
                    cfl_alphas = alphas
                    for plane in (1, 2):
                        results.append(run_plane(plane, cx, cy, cw, ch, tx_uv,
                                                 cfl_preds[plane - 1]))
            if uv_mode != UVPredictionMode.UV_CFL_PRED:
                for plane in (1, 2):
                    results.append(run_plane(plane, cx, cy, cw, ch, tx_uv,
                                             dc_preds[plane - 1]))

        skip = all(r[9] == 0 for r in results)

        # ---- syntax: skip flag, segment id, delta-q, modes
        self._write_skip(mi_row, mi_col, skip)
        self._write_segment_id(mi_row, mi_col, bsize, seg, skip)
        if (self._sb_delta_pending and (mi_row & 15) == 0 and (mi_col & 15) == 0
                and (bsize != BlockSize.BLOCK_64X64 or not skip)):
            self._write_delta_q_index()
        if self.allow_intrabc_on:
            # use_intrabc + DV (write_intrabc_info, entropy_coding.c:4299)
            self.fc.write(self.enc, "intrabc", (), int(ibc_dv is not None), 2)
            if ibc_dv is not None:
                self._write_dv(ibc_dv,
                               self._dv_ref(mi_row, mi_col, W >> 2, H >> 2))
        if ibc_dv is None:
            self._write_y_mode_kf(mi_row, mi_col, bsize, y_mode)
        if has_uv and ibc_dv is None:
            self.fc.write(self.enc, "uv_mode", (int(cfl_allowed), int(y_mode)),
                          int(uv_mode), 14 if cfl_allowed else 13)
            if uv_mode == UVPredictionMode.UV_CFL_PRED:
                self._write_cfl_alphas(*cfl_alphas)
            # UV_DC / CFL are non-directional: no uv angle delta
        if ibc_dv is None:
            self._write_palette_info(
                mi_row, mi_col, bsize, int(y_mode),
                has_uv and uv_mode == UVPredictionMode.UV_DC_PRED, pal_info)
        # filter_intra_mode_info (spec 5.11.10 tail; after uv/palette;
        # gated on palette_size == 0, svt_aom_filter_intra_allowed)
        if (self.enable_filter_intra and int(y_mode) == int(PredictionMode.DC_PRED)
                and W <= 32 and H <= 32 and pal_info is None
                and ibc_dv is None):
            self.fc.write(self.enc, "filter_intra", (int(bsize),),
                          int(fi_mode is not None), 2)
            if fi_mode is not None:
                self.fc.write(self.enc, "filter_intra_mode", (), fi_mode, 5)
        if pal_info is not None:
            # color-index-map tokens (pack_map_tokens, after fi, before tx)
            from . import palette as PAL

            PAL.write_color_map(self.fc, self.enc, pal_info[1], len(pal_info[0]))
        # tx_mode LARGEST: no tx size syntax

        # ---- residual + recon
        for plane, px, py, pw, ph, tx_size, pred, qc, dqc, eob, tt in results:
            ps = self.planes[plane]
            xu, yu = px >> 2, py >> 2
            wu = min(int(TX_WIDTH[tx_size]) >> 2, (ps.width - px) >> 2)
            hu = min(int(TX_HEIGHT[tx_size]) >> 2, (ps.height - py) >> 2)
            if not skip:
                plane_type = int(plane > 0)
                block_matches_tx = True  # TX covers the whole plane block
                txb_skip_ctx, dc_sign_ctx = get_txb_ctx(
                    plane_type, int(tx_size),
                    ps.above_ctx[xu : xu + wu], ps.left_ctx[yu : yu + hu],
                    block_matches_tx, False)
                # tx-type cdf context uses the filter-intra equivalent dir
                eff_mode = y_mode
                if fi_mode is not None:
                    from .intra import FIMODE_TO_INTRADIR

                    eff_mode = FIMODE_TO_INTRADIR[fi_mode]
                if plane != 0:
                    ttw = None
                elif ibc_dv is not None:
                    ttw = (lambda ts=tx_size: self._write_tx_type_ibc(ts))
                else:
                    ttw = (lambda ts=tx_size, ym=eff_mode, t=tt:
                           self._write_tx_type(ts, ym, t))
                writer = write_coeffs_txb_native if self.use_native_ec else write_coeffs_txb
                cul = writer(self.fc, self.enc, qc, eob, int(tx_size), int(tt),
                             plane_type, txb_skip_ctx, dc_sign_ctx,
                             tx_type_writer=ttw)
            else:
                cul = 0
            ps.above_ctx[xu : xu + wu] = cul
            ps.left_ctx[yu : yu + hu] = cul
            # recon (clipped to aligned plane bounds)
            cw_t, ch_t = min(pw, 32), min(ph, 32)
            full = np.zeros((ph, pw), np.int32)
            full[:ch_t, :cw_t] = dqc.reshape(ch_t, cw_t)
            recon = inverse_transform_add(full[None], pred[None].astype(np.uint16),
                                          int(tx_size), int(tt), self.bd)[0]
            wr = min(pw, ps.width - px)
            hr = min(ph, ps.height - py)
            ps.recon[py : py + hr, px : px + wr] = recon[:hr, :wr]
            self.decoded[plane][py >> 2 : (py + hr) >> 2, px >> 2 : (px + wr) >> 2] = True
            m = self.dlf_maps[plane]
            yu0, yu1 = py >> 2, (py + hr) >> 2
            xu0, xu1 = px >> 2, (px + wr) >> 2
            m.txw[yu0:yu1, xu0:xu1] = min(int(TX_WIDTH[tx_size]), 255)
            m.txh[yu0:yu1, xu0:xu1] = min(int(TX_HEIGHT[tx_size]), 255)
            m.skip[yu0:yu1, xu0:xu1] = skip
            m.bedge_v[yu0:yu1, xu0] = True
            m.bedge_h[yu0, xu0:xu1] = True

        # ---- mi grid updates
        r1 = min(mi_row + bh4, self.mi_rows)
        c1 = min(mi_col + bw4, self.mi_cols)
        self.mi_mode[mi_row:r1, mi_col:c1] = int(y_mode)
        self.mi_skip[mi_row:r1, mi_col:c1] = int(skip)
        if self.allow_intrabc_on:
            # shadow grid for DV prediction: only IBC blocks are candidates
            # (is_inter_block includes intrabc; plain intra is skipped by the
            # mode < NEARESTMV guard), ref2=-1 so the pair scan can't match
            from .mv_pred import NEARESTMV as _NRST

            self.ibc_grid.set_block(mi_row, mi_col, bw4, bh4, 0,
                                    ibc_dv if ibc_dv is not None else (0, 0),
                                    _NRST if ibc_dv is not None else 0,
                                    ref_frame2=-1)
        if self.palette_enabled:
            n_pal = len(pal_info[0]) if pal_info is not None else 0
            self.pal_size[mi_row:r1, mi_col:c1] = n_pal
            if pal_info is not None:
                cols_t = tuple(int(v) for v in pal_info[0])
                for rr in range(mi_row, r1):
                    for cc in range(mi_col, c1):
                        self.pal_colors[(rr, cc)] = cols_t

    def _encode_block_lossless(self, mi_row, mi_col, bsize):
        """Lossless 8x8 block: per-4x4-txb intra prediction + forward WHT
        + qindex-0 quantize (step 4 on coefficients scaled by 4 — exact)
        + inverse WHT recon. The decoder's recon equals the source
        exactly, so prediction from recon neighbors is prediction from
        source (spec 7.13.3 WHT; TxMode ONLY_4X4 at CodedLossless).
        Reference: EbSvtAv1Enc.h:940 --lossless."""
        from .transforms import fwht4x4, iwht4x4_add

        W, H = int(BLOCK_WIDTH[bsize]), int(BLOCK_HEIGHT[bsize])
        # leaves are 8x8 except frame-edge nodes the partition walk forces
        # to HORZ/VERT rects; every leaf tiles exactly with 4x4 txbs
        x0, y0 = mi_col * 4, mi_row * 4
        bw4, bh4 = W >> 2, H >> 2
        seg = self._block_segment(mi_row, mi_col)

        # ---- luma mode decision on the whole block (rate matters, not
        # distortion — recon is exact either way; fewer residual bits win)
        above_buf, left_buf, have_a, have_l = self._gather_neighbors(
            0, x0, y0, W, H)
        src = self.src[0][y0 : y0 + H, x0 : x0 + W]
        safe = (PredictionMode.DC_PRED, PredictionMode.V_PRED,
                PredictionMode.H_PRED, PredictionMode.SMOOTH_PRED,
                PredictionMode.PAETH_PRED)
        best_mode, best_cost = PredictionMode.DC_PRED, None
        for mode in safe:
            pred = self._predict(int(mode), above_buf, left_buf,
                                 have_a, have_l, W, H)
            cost = int(np.abs(src.astype(np.int64) - pred).sum())
            if best_cost is None or cost < best_cost:
                best_mode, best_cost = mode, cost
        y_mode = best_mode

        scan = self.tables.scan(0, 0)           # TX_4X4, DCT_DCT

        def code_txb(plane, px, py, mode):
            """Predict/transform/quantize ONE 4x4 txb; recon immediately
            (later txbs of this block predict from it). Txbs entirely
            beyond the mi-aligned plane extent are not coded (spec
            residual(): transform blocks outside the frame are skipped)."""
            ps_ = self.planes[plane]
            if px >= ps_.width or py >= ps_.height:
                return None
            pa, pl, ha, hl = self._gather_neighbors(plane, px, py, 4, 4)
            pred = self._predict(int(mode), pa, pl, ha, hl, 4, 4)
            psrc = self.src[plane][py : py + 4, px : px + 4]
            resid = psrc.astype(np.int32) - pred.astype(np.int32)
            co = fwht4x4(resid[None])[0]
            qc, dqc, eob = quantize_b(co.reshape(1, -1), scan,
                                      self.quant[plane], 0)
            recon = iwht4x4_add(dqc.reshape(1, 4, 4),
                                pred[None].astype(np.uint16), self.bd)[0]
            ps = self.planes[plane]
            wr = min(4, ps.width - px)
            hr = min(4, ps.height - py)
            ps.recon[py : py + hr, px : px + wr] = recon[:hr, :wr]
            self.decoded[plane][py >> 2, px >> 2] = True
            return (plane, px, py, qc[0], int(eob[0]))

        results = []
        for ty in range(0, H, 4):               # luma txbs, raster
            for tx in range(0, W, 4):
                got = code_txb(0, x0 + tx, y0 + ty, y_mode)
                if got is not None:
                    results.append(got)
        has_uv = not self.mono
        uv_mode = UVPredictionMode.UV_DC_PRED
        if has_uv:
            cx, cy = x0 >> 1, y0 >> 1
            cw, ch = W >> 1, H >> 1
            for plane in (1, 2):                # u txbs raster, then v
                for ty in range(0, ch, 4):
                    for tx in range(0, cw, 4):
                        got = code_txb(plane, cx + tx, cy + ty, 0)
                        if got is not None:
                            results.append(got)

        skip = all(r[4] == 0 for r in results)

        # ---- syntax (same order as _encode_block; no palette/fi/IBC/
        # delta-q surfaces in a lossless session, no tx_type at qindex 0)
        self._write_skip(mi_row, mi_col, skip)
        self._write_segment_id(mi_row, mi_col, bsize, seg, skip)
        self._write_y_mode_kf(mi_row, mi_col, bsize, y_mode)
        if has_uv:
            # lossless CFL rule (is_cfl_allowed): CfL is available only
            # when the chroma plane block equals the 4x4 transform — NOT
            # the normal <=32x32 rule (that mismatch desyncs the forced
            # rect edge leaves: 16x32/32x16 code uv with 13 symbols here)
            cfl_allowed = W <= 8 and H <= 8
            self.fc.write(self.enc, "uv_mode",
                          (int(cfl_allowed), int(y_mode)),
                          int(uv_mode), 14 if cfl_allowed else 13)
        if (self.enable_filter_intra and max(W, H) <= 32
                and int(y_mode) == int(PredictionMode.DC_PRED)):
            # seq enable_filter_intra: eligible DC blocks (spec 5.11.10:
            # max dim <= 32) must code the flag even though the lossless
            # walk never uses the tool
            self.fc.write(self.enc, "filter_intra", (int(bsize),), 0, 2)

        # ---- coefficients per txb + per-unit context/filter-map updates
        for plane, px, py, qc, eob in results:
            ps = self.planes[plane]
            xu, yu = px >> 2, py >> 2
            if not skip:
                plane_type = int(plane > 0)
                # chroma ctx offset 10 when the chroma block exceeds the
                # 4x4 tx (forced rect edge leaves > 8x8)
                txb_skip_ctx, dc_sign_ctx = get_txb_ctx(
                    plane_type, 0,
                    ps.above_ctx[xu : xu + 1], ps.left_ctx[yu : yu + 1],
                    False, plane_type == 1 and (W > 8 or H > 8))
                writer = (write_coeffs_txb_native if self.use_native_ec
                          else write_coeffs_txb)
                cul = writer(self.fc, self.enc, qc, eob, 0, 0, plane_type,
                             txb_skip_ctx, dc_sign_ctx, tx_type_writer=None)
            else:
                cul = 0
            ps.above_ctx[xu] = cul
            ps.left_ctx[yu] = cul
            m = self.dlf_maps[plane]
            m.txw[yu, xu] = 4
            m.txh[yu, xu] = 4
            m.skip[yu, xu] = skip
            m.bedge_v[yu, xu] = True
            m.bedge_h[yu, xu] = True

        r1 = min(mi_row + bh4, self.mi_rows)
        c1 = min(mi_col + bw4, self.mi_cols)
        self.mi_mode[mi_row:r1, mi_col:c1] = int(y_mode)
        self.mi_skip[mi_row:r1, mi_col:c1] = int(skip)

    # per-directional-mode edge unit vectors (mode angle degrees)
    _DIR_MODES = (PredictionMode.V_PRED, PredictionMode.H_PRED, PredictionMode.D45_PRED,
                  PredictionMode.D135_PRED, PredictionMode.D113_PRED,
                  PredictionMode.D157_PRED, PredictionMode.D203_PRED, PredictionMode.D67_PRED)
    # image y points down: edge line direction for AV1 angle a is (cos a, -sin a)
    _DIR_VECS = np.array([
        (np.cos(np.deg2rad(a)), -np.sin(np.deg2rad(a)))
        for a in (90, 180, 45, 135, 113, 157, 203, 67)
    ])

    def _prune_modes(self, src):
        """Gradient-orientation pruning (the reference's intra-search gradient
        histogram analog, enc_mode_config/md): always try the smooth family,
        plus the 2 directional modes best aligned with the block's edges."""
        if len(self.mode_candidates) <= 6:
            return self.mode_candidates
        s = src.astype(np.int32)
        gx = (s[:, 1:] - s[:, :-1])[:-1, :].ravel()
        gy = (s[1:, :] - s[:-1, :])[:, :-1].ravel()
        energy = float(np.abs(gx).sum() + np.abs(gy).sum())
        base = (PredictionMode.DC_PRED, PredictionMode.SMOOTH_PRED, PredictionMode.PAETH_PRED)
        if energy < src.size:  # near-flat: directional modes won't win
            return base + (PredictionMode.V_PRED, PredictionMode.H_PRED)
        # edge direction e(theta): gradients perpendicular to the edge score low
        g = np.stack([gx, gy])
        proj = np.abs(self._DIR_VECS @ g).sum(axis=1)  # alignment penalty per mode
        order = np.argsort(proj)
        picks = tuple(self._DIR_MODES[i] for i in order[:3])
        return base + picks

    def _predict(self, mode, above_buf, left_buf, have_a, have_l, W, H):
        if 1 <= mode <= 8:  # directional (incl. V/H as angle 90/180)
            return dr_pred(mode, 0, above_buf, left_buf, W, H, self.bd)
        return predict(mode, above_buf[1 : 1 + W][None], left_buf[1 : 1 + H][None],
                       above_buf[0:1], have_a, have_l, self.bd)[0]

    def _write_delta_q_index(self):
        """av1_write_delta_q_index (entropy_coding.c): per-SB qindex delta."""
        reduced = (self._sb_qindex - self._prev_qindex) // self.delta_q_res
        self._prev_qindex = self._sb_qindex
        self._sb_delta_pending = False
        sign = 1 if reduced < 0 else 0
        a = abs(reduced)
        self.fc.write(self.enc, "delta_q", (), min(a, 3), 4)
        if a >= 3:
            rem_bits = (a - 1).bit_length() - 1
            thr = (1 << rem_bits) + 1
            self.enc.encode_literal(rem_bits - 1, 3)
            self.enc.encode_literal(a - thr, rem_bits)
        if a > 0:
            self.enc.encode_bool(sign, 16384)

    def _write_skip(self, mi_row, mi_col, skip):
        mi_r0, _, mi_c0, _ = self.tile_mi
        above = int(self.mi_skip[mi_row - 1, mi_col]) if mi_row > mi_r0 else 0
        left = int(self.mi_skip[mi_row, mi_col - 1]) if mi_col > mi_c0 else 0
        self.fc.write(self.enc, "skip", (above + left,), int(skip), 2)

    def _write_y_mode_kf(self, mi_row, mi_col, bsize, mode):
        mi_r0, _, mi_c0, _ = self.tile_mi
        above = int(self.mi_mode[mi_row - 1, mi_col]) if mi_row > mi_r0 else 0
        left = int(self.mi_mode[mi_row, mi_col - 1]) if mi_col > mi_c0 else 0
        actx = int(INTRA_MODE_CONTEXT[above]) if mi_row > mi_r0 else 0
        lctx = int(INTRA_MODE_CONTEXT[left]) if mi_col > mi_c0 else 0
        self.fc.write(self.enc, "kf_y_mode", (actx, lctx), int(mode), 13)
        if bsize >= BlockSize.BLOCK_8X8 and 1 <= int(mode) <= 8:
            # directional: angle_delta = 0 -> symbol 3
            self.fc.write(self.enc, "angle_delta", (int(mode) - 1,), 3, 7)

    # --------------------------------------------------------- intra bc
    def _dv_valid(self, mi_row, mi_col, W, H, dvy, dvx):
        """svt_aom_is_dv_valid (adaptive_mv_pred.c:1831), full-pel DV in
        pixels, 64px superblocks."""
        t_r0, t_r1, t_c0, t_c1 = self.tile_mi
        src_top = mi_row * 4 + dvy
        src_left = mi_col * 4 + dvx
        src_bottom = mi_row * 4 + H + dvy
        src_right = mi_col * 4 + W + dvx
        if (src_top < t_r0 * 4 or src_left < t_c0 * 4
                or src_bottom > t_r1 * 4 or src_right > t_c1 * 4):
            return False
        if not self.mono:
            if W < 8 and src_left < t_c0 * 4 + 4:
                return False
            if H < 8 and src_top < t_r0 * 4 + 4:
                return False
        # already-coded-SB + hardware-delay wavefront constraints
        active_sb_row = mi_row >> 4
        active_sb64_col = (mi_col * 4) >> 6
        src_sb_row = (src_bottom - 1) // 64
        src_sb64_col = (src_right - 1) >> 6
        total_sb64_per_row = ((t_c1 - t_c0 - 1) >> 4) + 1
        active_sb64 = active_sb_row * total_sb64_per_row + active_sb64_col
        src_sb64 = src_sb_row * total_sb64_per_row + src_sb64_col
        if src_sb64 >= active_sb64 - 4:      # INTRABC_DELAY_SB64
            return False
        gradient = 1 + 4                      # 64px superblocks
        wf_offset = gradient * (active_sb_row - src_sb_row)
        if (src_sb_row > active_sb_row
                or src_sb64_col >= active_sb64_col - 4 + wf_offset):
            return False
        if src_sb64_col > active_sb64_col + (active_sb_row - src_sb_row):
            return False
        return True

    def _dv_ref(self, mi_row, mi_col, bw4, bh4):
        """DV prediction: stack[0] else stack[1] else the default ref DV
        (mode_decision.c:3415 + svt_aom_find_ref_dv)."""
        from .mv_pred import setup_ref_mv_list

        t = self.tile_mi
        stack, weights, mode_ctx, cnt = setup_ref_mv_list(
            self.ibc_grid, mi_row, mi_col, bw4, bh4, 0,
            (t[0], t[1], t[2], t[3]), gm_mv=(0, 0))
        dv = tuple(int(v) for v in stack[0]) if cnt >= 1 else (0, 0)
        if dv == (0, 0) and cnt >= 2:
            dv = tuple(int(v) for v in stack[1])
        if dv == (0, 0):
            t_r0 = t[0]
            if mi_row - 16 < t_r0:
                dv = (0, (-64 - 256) * 8)
            else:
                dv = (-64 * 8, 0)
        # "Ref DV should not have sub-pel" (read_intrabc_info): truncate
        return ((dv[0] >> 3) * 8, (dv[1] >> 3) * 8)

    def _ibc_search(self, mi_row, mi_col, W, H, src):
        """Candidate-set DV search (intra_bc search analog): the reference
        DV, neighbor DVs, same-row horizontal copies, same-column vertical
        copies, and a coarse 2D grid reaching past the 256px hardware-delay
        wavefront (INTRABC_DELAY_PXLS); even offsets only (integer chroma
        DVs -> pure copies). Early-out on an exact match. Returns
        (dv_px, sse) or None."""
        x0, y0 = mi_col * 4, mi_row * 4
        rec = self.planes[0].recon
        cands = []
        rdv = self._dv_ref(mi_row, mi_col, W >> 2, H >> 2)
        if rdv[0] % 16 == 0 and rdv[1] % 16 == 0:
            cands.append((rdv[0] >> 3, rdv[1] >> 3))
        if mi_col > 0:   # left neighbor's DV
            ndv = (int(self.ibc_grid.mv_row[mi_row, mi_col - 1]),
                   int(self.ibc_grid.mv_col[mi_row, mi_col - 1]))
            if ndv != (0, 0) and ndv[0] % 16 == 0 and ndv[1] % 16 == 0:
                cands.append((ndv[0] >> 3, ndv[1] >> 3))
        if mi_row > 0:   # above neighbor's DV
            ndv = (int(self.ibc_grid.mv_row[mi_row - 1, mi_col]),
                   int(self.ibc_grid.mv_col[mi_row - 1, mi_col]))
            if ndv != (0, 0) and ndv[0] % 16 == 0 and ndv[1] % 16 == 0:
                cands.append((ndv[0] >> 3, ndv[1] >> 3))
        for k in range(2, 258, 2):
            cands.append((-k, 0))
        for k in range(2, 130, 2):
            cands.append((0, -k))
        for dy in range(-32, -257, -32):
            for dx in range(-128, 129, 16):
                if dx != 0:
                    cands.append((dy, dx))
        best = None
        seen = set()
        src64 = src.astype(np.int64)
        for (dy, dx) in cands:
            if (dy, dx) in seen:
                continue
            seen.add((dy, dx))
            if not self._dv_valid(mi_row, mi_col, W, H, dy, dx):
                continue
            blk = rec[y0 + dy : y0 + dy + H, x0 + dx : x0 + dx + W]
            sse = int(np.sum((src64 - blk) ** 2))
            if best is None or sse < best[1]:
                best = ((dy, dx), sse)
                if sse == 0:
                    break
        return best

    def _write_dv(self, dv, ref_dv):
        """svt_av1_encode_dv: nmv coding on the ndv context set, integer
        precision (no fr/hp bits)."""
        diff = (dv[0] - ref_dv[0], dv[1] - ref_dv[1])
        joint = (0 if diff[0] == 0 and diff[1] == 0 else
                 1 if diff[0] == 0 else 2 if diff[1] == 0 else 3)
        self.fc.write(self.enc, "ndv_joints", (), joint, 4)
        from .inter_encoder import _mv_class

        for comp in range(2):
            d = diff[comp]
            if d == 0:
                continue
            sign = int(d < 0)
            mag = -d if sign else d
            cls, offset = _mv_class(mag - 1)
            di = offset >> 3
            self.fc.write(self.enc, "ndv_sign", (comp,), sign, 2)
            self.fc.write(self.enc, "ndv_classes", (comp,), cls, 11)
            if cls == 0:
                self.fc.write(self.enc, "ndv_class0", (comp,), di, 2)
            else:
                for i in range(cls):
                    self.fc.write(self.enc, "ndv_bits", (comp, i),
                                  (di >> i) & 1, 2)
            # MV_SUBPEL_NONE: fr/hp are not coded

    def _write_tx_type_ibc(self, tx_size):
        """IBC blocks use the inter tx sets (use_intrabc -> is_inter)."""
        from .inter_encoder import (EXT_TX_IND_INTER, EXT_TX_NSYMS_INTER,
                                    inter_ext_tx_set)

        if self.qindex == 0:
            return
        eset = inter_ext_tx_set(int(tx_size))
        if eset == 0:
            return
        self.fc.write(self.enc, "inter_ext_tx",
                      (eset, int(_SQR[int(tx_size)])),
                      EXT_TX_IND_INTER[eset][0], EXT_TX_NSYMS_INTER[eset])

    def _write_palette_info(self, mi_row, mi_col, bsize, y_mode, uv_is_dc,
                            pal_info):
        """Palette mode info for key-frame intra blocks: y flag with real
        neighbor context, size, cache-referenced colors
        (write_palette_mode_info, entropy_coding.c:4254)."""
        if not self.allow_sct:
            return
        W, H = int(BLOCK_WIDTH[bsize]), int(BLOCK_HEIGHT[bsize])
        if W > 64 or H > 64 or bsize < BlockSize.BLOCK_8X8:
            return
        from . import palette as PAL

        bctx = PAL.bsize_ctx(W, H)
        t_r0, _, t_c0, _ = self.tile_mi
        have_a = mi_row > t_r0
        have_l = mi_col > t_c0
        n = len(pal_info[0]) if pal_info is not None else 0
        if y_mode == int(PredictionMode.DC_PRED):
            mctx = ((int(self.pal_size[mi_row - 1, mi_col] > 0) if have_a else 0)
                    + (int(self.pal_size[mi_row, mi_col - 1] > 0) if have_l else 0))
            self.fc.write(self.enc, "palette_y_mode", (bctx, mctx),
                          int(n > 0), 2)
            if n > 0:
                self.fc.write(self.enc, "palette_y_size", (bctx,),
                              n - PAL.PALETTE_MIN_SIZE, 7)
                # color cache: above gated off on SB-row boundaries
                # (svt_get_palette_cache_y, palette.c:158)
                above = (self.pal_colors.get((mi_row - 1, mi_col))
                         if have_a and (mi_row % 16) else None)
                left = (self.pal_colors.get((mi_row, mi_col - 1))
                        if have_l else None)
                cache = PAL.palette_cache(above, left)
                PAL.write_palette_colors_y(self.enc, cache, pal_info[0],
                                           self.bd)
        if uv_is_dc:
            self.fc.write(self.enc, "palette_uv_mode", (int(n > 0),), 0, 2)

    def _write_palette_off(self, bsize, y_mode, uv_is_dc):
        """Palette flags (coded 0: palette unused) for DC-predicted blocks
        when screen-content tools are on (write_palette_mode_info,
        entropy_coding.c:4254-4278; allow_palette gate :4892)."""
        if not self.allow_sct:
            return
        W, H = int(BLOCK_WIDTH[bsize]), int(BLOCK_HEIGHT[bsize])
        if W > 64 or H > 64 or bsize < BlockSize.BLOCK_8X8:
            return
        bsize_ctx = (W * H).bit_length() - 1 - 6  # num_pels_log2 - 6
        if y_mode == int(PredictionMode.DC_PRED):
            # neighbor ctx counts palette use; we never code palette -> 0
            self.fc.write(self.enc, "palette_y_mode", (bsize_ctx, 0), 0, 2)
        if uv_is_dc:
            self.fc.write(self.enc, "palette_uv_mode", (0,), 0, 2)

    def _write_tx_type(self, tx_size, y_mode, tx_type=0):
        eset = intra_ext_tx_set(int(tx_size))
        if eset == 0 or self.qindex == 0:
            return
        sqr = int(_SQR[int(tx_size)])
        sym = EXT_TX_IND_INTRA[eset][int(tx_type)]
        self.fc.write(self.enc, "intra_ext_tx", (eset, sqr, int(y_mode)),
                      sym, EXT_TX_NSYMS_INTRA[eset])

    def apply_loop_filter(self, level_y, level_uv, sharpness=0):
        """Normative post-frame deblocking (decoder mirror). Call after
        encode_tiles; updates self.planes[..].recon in place."""
        for plane, ps in enumerate(self.planes):
            lv = level_y if plane == 0 else (level_uv, level_uv)
            deblock_plane(ps.recon, self.dlf_maps[plane], plane,
                          lv[0], lv[1], sharpness, self.bd, ps.width, ps.height)
