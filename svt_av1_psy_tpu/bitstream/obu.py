"""OBU assembly: sequence header, frame header, OBU framing.

Behavior reference: Source/Lib/Codec/entropy_coding.c:3238-3900
(write_uncompressed_header_obu, write_sequence_header_obu, write_frame_size,
write_tile_info, encode_quantization) — field order is normative (AV1 spec
§5.5/§5.9).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..codec.constants import FrameType, ObuType
from .bitwriter import BitWriter, leb128


@dataclass
class SequenceParams:
    width: int
    height: int
    profile: int = 0
    still_picture: bool = False
    reduced_still_picture_header: bool = False
    seq_level_idx: int = 13          # 5.1
    seq_tier: int = 0
    use_128x128_superblock: bool = False
    enable_filter_intra: bool = False
    enable_intra_edge_filter: bool = False
    enable_interintra_compound: bool = False
    enable_masked_compound: bool = False
    enable_warped_motion: bool = False
    enable_dual_filter: bool = False
    enable_order_hint: bool = False
    enable_jnt_comp: bool = False
    enable_ref_frame_mvs: bool = False
    order_hint_bits: int = 7
    # 0/1 fixed, or 2 = per-frame choice. NOTE: reduced_still_picture_header
    # normatively forces this to 2 (spec 5.5.1), so the frame header then
    # always codes allow_screen_content_tools.
    seq_force_screen_content_tools: int = 2
    seq_force_integer_mv: int = 2
    enable_superres: bool = False
    enable_cdef: bool = False
    enable_restoration: bool = False
    bit_depth: int = 8
    monochrome: bool = False
    color_primaries: int = 2
    transfer_characteristics: int = 2
    matrix_coefficients: int = 2
    color_range: int = 0
    chroma_sample_position: int = 0
    separate_uv_delta_q: bool = False
    film_grain_params_present: bool = False

    @property
    def frame_dim_bits(self):
        wb = max(self.width - 1, 1).bit_length()
        hb = max(self.height - 1, 1).bit_length()
        return wb, hb


@dataclass
class FrameParams:
    frame_type: FrameType = FrameType.KEY_FRAME
    show_frame: bool = True
    showable_frame: bool = False
    error_resilient_mode: bool = False
    disable_cdf_update: bool = False
    allow_screen_content_tools: bool = False
    base_q_idx: int = 100
    y_dc_delta_q: int = 0
    u_dc_delta_q: int = 0
    u_ac_delta_q: int = 0
    v_dc_delta_q: int = 0
    v_ac_delta_q: int = 0
    using_qmatrix: bool = False
    qm_y: int = 15
    qm_u: int = 15
    qm_v: int = 15
    cdef_damping: int = 3
    cdef_bits: int = 0
    cdef_y_strengths: tuple = ((0, 0),)    # (pri, sec-coded) per index
    cdef_uv_strengths: tuple = ((0, 0),)
    delta_q_present: bool = False
    delta_q_res: int = 4
    filter_level: tuple = (0, 0)
    filter_level_uv: tuple = (0, 0)
    sharpness: int = 0
    tx_mode_select: bool = False     # False = TX_MODE_LARGEST
    reduced_tx_set: bool = False
    film_grain: object = None        # FilmGrainParams or None
    lr_types: tuple = (0, 0, 0)      # RestorationType per plane
    lr_unit_size: int = 64
    lr_uv_unit_size: int = 64
    superres_denom: int = 8   # 8 = off; 9..16 (spec SuperresDenom)
    gm_trans: tuple = None           # per-ref (row_q3, col_q3) or None
    gm_rotzoom: tuple = None         # LAST-ref ROTZOOM wmmat[6] or None
    segmentation: object = None      # codec.segmentation.SegmentationParams
    allow_intrabc: bool = False
    tile_cols_log2: int = 0
    tile_rows_log2: int = 0
    refresh_frame_flags: int = 0xFF
    order_hint: int = 0
    # per-ref order hints (RefOrderHint[ref_frame_idx[i]]), tracked by the
    # encoder DPB; feeds skip-mode derivation + ref sign bias
    ref_order_hints: tuple = (0, 0, 0, 0, 0, 0, 0)
    skip_mode_present: bool = False       # encoder request; written only
                                          # when skipModeAllowed (5.9.22)
    # inter-frame fields (single-ref v0 path)
    primary_ref_frame: int = 7            # PRIMARY_REF_NONE: CDFs reset per frame
    ref_frame_idx: tuple = (0, 0, 0, 0, 0, 0, 0)
    reference_select: bool = False        # REFERENCE_MODE_SELECT
    allow_high_precision_mv: bool = True
    interpolation_filter_switchable: bool = False
    interpolation_filter: int = 0         # EIGHTTAP_REGULAR
    is_motion_mode_switchable: bool = False
    # spec: forced to 1 for intra frames; coded only when screen-content
    # tools are on and seq_force_integer_mv == 2
    force_integer_mv: bool = False
    # temporal MV projection (spec 7.9); requires seq enable_ref_frame_mvs
    use_ref_frame_mvs: bool = False


def write_obu(obu_type: ObuType, payload: bytes, has_size: bool = True) -> bytes:
    """OBU header (no extension) + leb128 size + payload."""
    header = bytes([(int(obu_type) << 3) | (int(has_size) << 1)])
    if has_size:
        return header + leb128(len(payload)) + payload
    return header + payload


def temporal_delimiter_obu() -> bytes:
    return write_obu(ObuType.TEMPORAL_DELIMITER, b"")


def metadata_obu(metadata_type: int, payload: bytes) -> bytes:
    """METADATA OBU (spec 5.8.1): leb128 metadata_type + type payload +
    trailing bits (the reference's write_obu_metadata)."""
    return write_obu(ObuType.METADATA, leb128(metadata_type) + payload + b"\x80")


def _write_color_config(w: BitWriter, sp: SequenceParams):
    high_bitdepth = sp.bit_depth > 8
    w.f(int(high_bitdepth), 1)
    if sp.profile == 2 and high_bitdepth:
        w.f(0, 1)  # twelve_bit
    if sp.profile != 1:
        w.f(int(sp.monochrome), 1)
    described = not (
        sp.color_primaries == 2 and sp.transfer_characteristics == 2 and sp.matrix_coefficients == 2
    )
    w.f(int(described), 1)
    if described:
        w.f(sp.color_primaries, 8)
        w.f(sp.transfer_characteristics, 8)
        w.f(sp.matrix_coefficients, 8)
    if sp.monochrome:
        w.f(sp.color_range, 1)
        return
    if sp.color_primaries == 1 and sp.transfer_characteristics == 13 and sp.matrix_coefficients == 0:
        pass  # srgb: subsampling 0, color_range 1 implied
    else:
        w.f(sp.color_range, 1)
        if sp.profile == 0:
            pass  # 4:2:0 implied
        elif sp.profile == 1:
            pass  # 4:4:4 implied
        # (profile 2 subsampling signaling not needed for our profiles)
        w.f(sp.chroma_sample_position, 2)
    w.f(int(sp.separate_uv_delta_q), 1)


def sequence_header_payload(sp: SequenceParams) -> bytes:
    w = BitWriter()
    w.f(sp.profile, 3)
    w.f(int(sp.still_picture), 1)
    w.f(int(sp.reduced_still_picture_header), 1)
    if sp.reduced_still_picture_header:
        w.f(sp.seq_level_idx, 5)
    else:
        w.f(0, 1)  # timing_info_present
        w.f(0, 1)  # initial_display_delay_present
        w.f(0, 5)  # operating_points_cnt_minus_1
        w.f(0, 12)  # operating_point_idc[0]
        w.f(sp.seq_level_idx, 5)
        if sp.seq_level_idx > 7:
            w.f(sp.seq_tier, 1)
    wb, hb = sp.frame_dim_bits
    w.f(wb - 1, 4)
    w.f(hb - 1, 4)
    w.f(sp.width - 1, wb)
    w.f(sp.height - 1, hb)
    if not sp.reduced_still_picture_header:
        w.f(0, 1)  # frame_id_numbers_present
    w.f(int(sp.use_128x128_superblock), 1)
    w.f(int(sp.enable_filter_intra), 1)
    w.f(int(sp.enable_intra_edge_filter), 1)
    if not sp.reduced_still_picture_header:
        w.f(int(sp.enable_interintra_compound), 1)
        w.f(int(sp.enable_masked_compound), 1)
        w.f(int(sp.enable_warped_motion), 1)
        w.f(int(sp.enable_dual_filter), 1)
        w.f(int(sp.enable_order_hint), 1)
        if sp.enable_order_hint:
            w.f(int(sp.enable_jnt_comp), 1)
            w.f(int(sp.enable_ref_frame_mvs), 1)
        if sp.seq_force_screen_content_tools == 2:
            w.f(1, 1)
        else:
            w.f(0, 1)
            w.f(sp.seq_force_screen_content_tools, 1)
        if sp.seq_force_screen_content_tools > 0:
            if sp.seq_force_integer_mv == 2:
                w.f(1, 1)
            else:
                w.f(0, 1)
                w.f(sp.seq_force_integer_mv, 1)
        if sp.enable_order_hint:
            w.f(sp.order_hint_bits - 1, 3)
    w.f(int(sp.enable_superres), 1)
    w.f(int(sp.enable_cdef), 1)
    w.f(int(sp.enable_restoration), 1)
    _write_color_config(w, sp)
    w.f(int(sp.film_grain_params_present), 1)
    w.trailing_bits()
    return w.data()


def sequence_header_obu(sp: SequenceParams) -> bytes:
    return write_obu(ObuType.SEQUENCE_HEADER, sequence_header_payload(sp))


def _tile_log2(blk: int, target: int) -> int:
    k = 0
    while (blk << k) < target:
        k += 1
    return k


def clamp_tile_log2s(width: int, height: int, tile_cols_log2: int,
                     tile_rows_log2: int, use_128: bool = False):
    """Raise requested uniform tile log2s to the spec minimums (spec 5.9.15:
    tiles must not exceed 4096 px wide / 4096*2304 px area). The encoder and
    the header writer must agree on the effective values — call this before
    encoding tiles. Mirrors the reference's clamp in write_tile_info."""
    sb_shift = 7 if use_128 else 6
    sb_size = 1 << sb_shift
    sb_cols = (width + sb_size - 1) >> sb_shift
    sb_rows = (height + sb_size - 1) >> sb_shift
    max_tile_width_sb = 4096 >> sb_shift
    max_tile_area_sb = (4096 * 2304) >> (2 * sb_shift)
    min_log2_tile_cols = _tile_log2(max_tile_width_sb, sb_cols)
    max_log2_tile_cols = _tile_log2(1, min(sb_cols, 64))
    max_log2_tile_rows = _tile_log2(1, min(sb_rows, 64))
    min_log2_tiles = max(min_log2_tile_cols,
                         _tile_log2(max_tile_area_sb, sb_rows * sb_cols))
    tcl = min(max(tile_cols_log2, min_log2_tile_cols), max_log2_tile_cols)
    min_log2_tile_rows = max(min_log2_tiles - tcl, 0)
    trl = min(max(tile_rows_log2, min_log2_tile_rows), max_log2_tile_rows)
    return tcl, trl


def _write_tile_info(w: BitWriter, sp: SequenceParams, fp: FrameParams):
    sb_shift = 7 if sp.use_128x128_superblock else 6
    sb_size = 1 << sb_shift
    sb_cols = (sp.width + sb_size - 1) >> sb_shift
    sb_rows = (sp.height + sb_size - 1) >> sb_shift
    sb_size_log2 = sb_shift
    max_tile_width_sb = 4096 >> sb_size_log2
    max_tile_area_sb = (4096 * 2304) >> (2 * sb_size_log2)
    min_log2_tile_cols = _tile_log2(max_tile_width_sb, sb_cols)
    max_log2_tile_cols = _tile_log2(1, min(sb_cols, 64))
    max_log2_tile_rows = _tile_log2(1, min(sb_rows, 64))
    min_log2_tiles = max(min_log2_tile_cols, _tile_log2(max_tile_area_sb, sb_rows * sb_cols))
    eff_cols, eff_rows = clamp_tile_log2s(
        sp.width, sp.height, fp.tile_cols_log2, fp.tile_rows_log2,
        sp.use_128x128_superblock)

    w.f(1, 1)  # uniform_tile_spacing_flag
    tcl = min_log2_tile_cols
    while tcl < max_log2_tile_cols:
        if tcl < eff_cols:
            w.f(1, 1)
            tcl += 1
        else:
            w.f(0, 1)
            break
    min_log2_tile_rows = max(min_log2_tiles - tcl, 0)
    trl = min_log2_tile_rows
    while trl < max_log2_tile_rows:
        if trl < eff_rows:
            w.f(1, 1)
            trl += 1
        else:
            w.f(0, 1)
            break
    if tcl > 0 or trl > 0:
        w.f(0, tcl + trl)  # context_update_tile_id
        w.f(3, 2)          # tile_size_bytes_minus_1 = 3 (4-byte sizes)
    return tcl, trl


def _write_delta_q(w: BitWriter, v: int):
    if v:
        w.f(1, 1)
        w.su(v, 7)
    else:
        w.f(0, 1)


def _write_quantization(w: BitWriter, sp: SequenceParams, fp: FrameParams):
    w.f(fp.base_q_idx, 8)
    _write_delta_q(w, fp.y_dc_delta_q)
    if not sp.monochrome:
        if sp.separate_uv_delta_q:
            diff_uv = (fp.u_dc_delta_q != fp.v_dc_delta_q) or (fp.u_ac_delta_q != fp.v_ac_delta_q)
            w.f(int(diff_uv), 1)
        else:
            diff_uv = False
        _write_delta_q(w, fp.u_dc_delta_q)
        _write_delta_q(w, fp.u_ac_delta_q)
        if diff_uv:
            _write_delta_q(w, fp.v_dc_delta_q)
            _write_delta_q(w, fp.v_ac_delta_q)
    w.f(int(fp.using_qmatrix), 1)
    if fp.using_qmatrix:
        w.f(fp.qm_y, 4)
        w.f(fp.qm_u, 4)
        if not sp.monochrome and sp.separate_uv_delta_q:
            w.f(fp.qm_v, 4)


def _wb_write_subexpfin(w: BitWriter, n: int, k: int, v: int):
    """Finite subexponential code on the bit writer (entropy_coding.c:2882)."""
    i = mk = 0
    while True:
        b = k + i - 1 if i else k
        a = 1 << b
        if n <= mk + 3 * a:
            # quasi-uniform tail
            nn, vv = n - mk, v - mk
            if nn > 1:
                l = (nn - 1).bit_length()
                m = (1 << l) - nn
                if vv < m:
                    w.f(vv, l - 1)
                else:
                    w.f(m + ((vv - m) >> 1), l - 1)
                    w.f((vv - m) & 1, 1)
            break
        t = int(v >= mk + a)
        w.f(t, 1)
        if t:
            i += 1
            mk += a
        else:
            w.f(v - mk, b)
            break


def _wb_write_signed_refsubexpfin(w: BitWriter, n: int, k: int, ref: int, v: int):
    """svt_aom_wb_write_signed_primitive_refsubexpfin (entropy_coding.c:2941)."""
    ref += n - 1
    v += n - 1
    scaled_n = (n << 1) - 1

    def recenter(r, x):
        if x > 2 * r:
            return x
        if x >= r:
            return (x - r) << 1
        return ((r - x) << 1) - 1

    if 2 * ref <= scaled_n:
        rec = recenter(ref, v)
    else:
        rec = recenter(scaled_n - 1 - ref, scaled_n - 1 - v)
    _wb_write_subexpfin(w, scaled_n, k, rec)


def _write_global_motion(w: BitWriter, fp: FrameParams):
    """global_motion_params per ref (entropy_coding.c:2953/3021): IDENTITY,
    TRANSLATION, or ROTZOOM. fp.gm_trans: list of 7 entries, each None or
    (row_q3, col_q3) 1/8-pel; fp.gm_rotzoom: optional wmmat[6] for LAST
    (primary_ref NONE, so the coding reference is the identity params)."""
    gm = fp.gm_trans or (None,) * 7
    allow_hp = bool(fp.allow_high_precision_mv)
    trans_bits = 9 - (not allow_hp)       # GM_ABS_TRANS_ONLY_BITS - !hp
    prec_diff = 13 + (not allow_hp)       # GM_TRANS_ONLY_PREC_DIFF + !hp
    for i in range(7):
        if i == 0 and fp.gm_rotzoom is not None:
            mat = [int(v) for v in fp.gm_rotzoom]
            w.f(1, 1)                     # is_global
            w.f(1, 1)                     # ROTZOOM
            # alpha-class params: coded around identity (GM_ALPHA_*)
            _wb_write_signed_refsubexpfin(w, (1 << 12) + 1, 3, 0,
                                          (mat[2] >> 1) - (1 << 15))
            _wb_write_signed_refsubexpfin(w, (1 << 12) + 1, 3, 0,
                                          mat[3] >> 1)
            # translation at GM_TRANS precision (non-translation-only)
            _wb_write_signed_refsubexpfin(w, (1 << 12) + 1, 3, 0,
                                          mat[0] >> 10)
            _wb_write_signed_refsubexpfin(w, (1 << 12) + 1, 3, 0,
                                          mat[1] >> 10)
            continue
        t = gm[i]
        w.f(int(t is not None), 1)        # is_global
        if t is None:
            continue
        w.f(0, 1)                         # not ROTZOOM
        w.f(1, 1)                         # TRANSLATION
        for comp in t:                    # wmmat[0] (row), wmmat[1] (col)
            wmmat = int(comp) << 13       # q3 -> WARPEDMODEL_PREC_BITS
            _wb_write_signed_refsubexpfin(w, (1 << trans_bits) + 1, 3,
                                          0, wmmat >> prec_diff)


def _write_segmentation(w: BitWriter, fp: FrameParams):
    """segmentation_params (spec 5.9.14; entropy_coding.c:2241). With
    primary_ref NONE the update flags are implied (map=1, temporal=0,
    data=1) and only the feature table is coded."""
    seg = fp.segmentation
    if seg is None or not seg.enabled:
        w.f(0, 1)
        return
    from ..codec.segmentation import FEATURE_BITS, FEATURE_SIGNED, SEG_LVL_MAX

    w.f(1, 1)  # segmentation_enabled (update bits implied for primary_ref NONE)
    for s in range(8):
        for j in range(SEG_LVL_MAX):
            v = seg.feature_data[s][j]
            w.f(int(v is not None), 1)
            if v is not None:
                bits = FEATURE_BITS[j]
                if FEATURE_SIGNED[j]:
                    w.su(int(v), bits + 1)   # su(1 + bits)
                else:
                    w.f(int(v), bits)


def _write_lr_params(w: BitWriter, sp: SequenceParams, fp: FrameParams):
    """lr_params (spec 5.9.20; entropy_coding.c:2168). lr_types: per-plane
    RestorationType (0 NONE, 1 WIENER, 2 SGRPROJ, 3 SWITCHABLE)."""
    bits = {0: (0, 0), 1: (1, 0), 2: (1, 1), 3: (0, 1)}
    nplanes = 1 if sp.monochrome else 3
    all_none = True
    chroma_none = True
    for p in range(nplanes):
        t = fp.lr_types[p]
        b0, b1 = bits[t]
        w.f(b0, 1)
        w.f(b1, 1)
        if t != 0:
            all_none = False
            if p > 0:
                chroma_none = False
    if not all_none:
        w.f(int(fp.lr_unit_size > 64), 1)     # sb size 64
        if fp.lr_unit_size > 64:
            w.f(int(fp.lr_unit_size > 128), 1)
    if not chroma_none:
        w.f(int(fp.lr_uv_unit_size != fp.lr_unit_size), 1)


def get_relative_dist(sp: SequenceParams, a: int, b: int) -> int:
    """Signed wrap-around order-hint distance (spec 5.9.3)."""
    if not sp.enable_order_hint:
        return 0
    diff = a - b
    m = 1 << (sp.order_hint_bits - 1)
    return (diff & (m - 1)) - (diff & m)


def skip_mode_frames_raw(sp: SequenceParams, order_hint: int,
                         ref_order_hints):
    """Pure order-hint half of the skip-mode derivation (spec 5.9.22):
    nearest forward + nearest backward ref, else the two nearest forward
    refs.  Returns the LAST_FRAME-based (ref0, ref1) pair or None."""
    fwd = bwd = -1
    fwd_hint = bwd_hint = 0
    for i in range(7):
        hint = ref_order_hints[i]
        d = get_relative_dist(sp, hint, order_hint)
        if d < 0:
            if fwd < 0 or get_relative_dist(sp, hint, fwd_hint) > 0:
                fwd, fwd_hint = i, hint
        elif d > 0:
            if bwd < 0 or get_relative_dist(sp, hint, bwd_hint) < 0:
                bwd, bwd_hint = i, hint
    if fwd < 0:
        return None
    if bwd >= 0:
        return (1 + min(fwd, bwd), 1 + max(fwd, bwd))
    # no backward ref: the two closest forward refs
    snd = -1
    snd_hint = 0
    for i in range(7):
        hint = ref_order_hints[i]
        if (get_relative_dist(sp, hint, fwd_hint) < 0
                and (snd < 0 or get_relative_dist(sp, hint, snd_hint) > 0)):
            snd, snd_hint = i, hint
    if snd < 0:
        return None
    return (1 + min(fwd, snd), 1 + max(fwd, snd))


def skip_mode_frames(sp: SequenceParams, fp: FrameParams):
    """skipModeAllowed derivation (spec 5.9.22 skip_mode_params).

    Returns the (ref0, ref1) LAST_FRAME-based pair skip-mode blocks
    predict from, or None when skip mode is not allowed for this frame.
    Behavior reference: svt_av1_setup_skip_mode_allowed
    (pd_process.c:99-145)."""
    is_intra = fp.frame_type in (FrameType.KEY_FRAME, FrameType.INTRA_ONLY_FRAME)
    if (is_intra or not fp.reference_select or not sp.enable_order_hint):
        return None
    return skip_mode_frames_raw(sp, fp.order_hint, fp.ref_order_hints)


def coded_lossless(fp: FrameParams) -> bool:
    """Spec CodedLossless: every segment's effective qindex is 0 and all
    dc/ac delta_q are 0 (DeltaQ per-SB does not enter the computation)."""
    if (fp.y_dc_delta_q or fp.u_dc_delta_q or fp.u_ac_delta_q
            or fp.v_dc_delta_q or fp.v_ac_delta_q):
        return False
    if fp.base_q_idx != 0:
        if fp.segmentation is None:
            return False
        # segments may pull individual qindex to 0; all must land at 0
        return all(fp.segmentation.seg_qindex(fp.base_q_idx, s) == 0
                   for s in range(fp.segmentation.last_active_seg_id + 1))
    return True


def _write_loop_filter(w: BitWriter, sp: SequenceParams, fp: FrameParams):
    # spec 5.9.11: no loop-filter bits at all under CodedLossless/intrabc
    if coded_lossless(fp) or fp.allow_intrabc:
        return
    w.f(fp.filter_level[0], 6)
    w.f(fp.filter_level[1], 6)
    if not sp.monochrome and (fp.filter_level[0] or fp.filter_level[1]):
        w.f(fp.filter_level_uv[0], 6)
        w.f(fp.filter_level_uv[1], 6)
    w.f(fp.sharpness, 3)
    w.f(0, 1)  # loop_filter_delta_enabled


def frame_header_payload(sp: SequenceParams, fp: FrameParams) -> bytes:
    """Uncompressed header: KEY frames and single-ref INTER frames."""
    is_intra = fp.frame_type in (FrameType.KEY_FRAME, FrameType.INTRA_ONLY_FRAME)
    w = BitWriter()
    if not sp.reduced_still_picture_header:
        w.f(0, 1)  # show_existing_frame
        w.f(int(fp.frame_type), 2)
        w.f(int(fp.show_frame), 1)
        if not fp.show_frame:
            w.f(int(fp.showable_frame), 1)
        # error_resilient_mode implied for shown key frames
        if not (fp.frame_type == FrameType.KEY_FRAME and fp.show_frame):
            w.f(int(fp.error_resilient_mode), 1)
    w.f(int(fp.disable_cdf_update), 1)
    if sp.seq_force_screen_content_tools == 2:
        w.f(int(fp.allow_screen_content_tools), 1)
    # force_integer_mv is coded right here per spec 5.9.2 (for intra frames
    # the decoder overrides it to 1 after reading the bit)
    if fp.allow_screen_content_tools and sp.seq_force_integer_mv == 2:
        w.f(1 if is_intra else int(fp.force_integer_mv), 1)
    if not sp.reduced_still_picture_header:
        w.f(0, 1)  # frame_size_override_flag
        if sp.enable_order_hint:
            w.f(fp.order_hint, sp.order_hint_bits)
        if not fp.error_resilient_mode and not is_intra:
            w.f(fp.primary_ref_frame, 3)
        if fp.frame_type == FrameType.KEY_FRAME:
            if not fp.show_frame:
                w.f(fp.refresh_frame_flags, 8)
        else:
            w.f(fp.refresh_frame_flags, 8)
    if not is_intra:
        if sp.enable_order_hint:
            w.f(0, 1)  # frame_refs_short_signaling
        for i in range(7):
            w.f(fp.ref_frame_idx[i], 3)
        # frame_size (override 0); inter frames never downscale here
        if sp.enable_superres:
            w.f(0, 1)  # use_superres
        w.f(0, 1)  # render_and_frame_size_different
        w.f(int(fp.allow_high_precision_mv), 1)
        w.f(int(fp.interpolation_filter_switchable), 1)
        if not fp.interpolation_filter_switchable:
            w.f(fp.interpolation_filter, 2)
        w.f(int(fp.is_motion_mode_switchable), 1)
        if sp.enable_ref_frame_mvs and not fp.error_resilient_mode:
            w.f(int(fp.use_ref_frame_mvs), 1)
    else:
        if sp.enable_superres:
            # superres_params (spec 5.9.8): denom = coded_denom + 9
            use_sr = int(fp.superres_denom > 8)
            w.f(use_sr, 1)
            if use_sr:
                w.f(fp.superres_denom - 9, 3)
        w.f(0, 1)  # render_and_frame_size_different
        if fp.allow_screen_content_tools:
            w.f(int(fp.allow_intrabc), 1)
    might_bwd_adapt = (not sp.reduced_still_picture_header) and (not fp.disable_cdf_update)
    if might_bwd_adapt:
        w.f(0, 1)  # refresh_frame_context: 0 = backward adaptation enabled
    _write_tile_info(w, sp, fp)
    _write_quantization(w, sp, fp)
    _write_segmentation(w, fp)
    if fp.base_q_idx > 0:
        w.f(int(fp.delta_q_present), 1)
        if fp.delta_q_present:
            w.f(fp.delta_q_res.bit_length() - 1, 2)  # log2(delta_q_res)
            if not fp.allow_intrabc:
                w.f(0, 1)  # delta_lf_present
    _write_loop_filter(w, sp, fp)
    _cl = coded_lossless(fp)
    if sp.enable_cdef and not fp.allow_intrabc and not _cl:
        w.f(fp.cdef_damping - 3, 2)
        w.f(fp.cdef_bits, 2)
        for i in range(1 << fp.cdef_bits):
            pri, sec = fp.cdef_y_strengths[i]
            w.f(pri, 4)
            w.f(sec, 2)
            if not sp.monochrome:
                pri, sec = fp.cdef_uv_strengths[i]
                w.f(pri, 4)
                w.f(sec, 2)
    if sp.enable_restoration and not fp.allow_intrabc and not _cl:
        _write_lr_params(w, sp, fp)
    if not _cl:  # CodedLossless forces TX_MODE_ONLY_4X4, no bit (spec 5.9.21)
        w.f(int(fp.tx_mode_select), 1)
    if not is_intra:
        w.f(int(fp.reference_select), 1)  # REFERENCE_MODE_SELECT
    # skip_mode_params (spec 5.9.22): the present bit is coded only when
    # skipModeAllowed (derivation shared with the walks)
    if skip_mode_frames(sp, fp) is not None:
        w.f(int(fp.skip_mode_present), 1)
    # allow_warped_motion: seq enable_warped_motion off -> no bit
    w.f(int(fp.reduced_tx_set), 1)
    if not is_intra:
        _write_global_motion(w, fp)
    # grain params are coded for shown AND showable frames (spec 5.9.30:
    # a show_existing_frame later replays the stored params)
    if sp.film_grain_params_present and (fp.show_frame or fp.showable_frame):
        _write_film_grain(w, sp, fp)
    return w  # caller appends trailing bits or tile data alignment


def _write_film_grain(w: BitWriter, sp: SequenceParams, fp: FrameParams):
    """film_grain_params() (spec 5.9.30; entropy_coding.c:3054). Parameters
    are always re-coded (update_parameters=1) — single-ref IPP keeps the
    syntax simple and every decoder state self-contained."""
    fg = fp.film_grain
    if fg is None or not fg.apply_grain:
        w.f(0, 1)  # apply_grain
        return
    w.f(1, 1)
    w.f(fg.random_seed, 16)
    if fp.frame_type == FrameType.INTER_FRAME:
        w.f(1, 1)           # update_parameters
    w.f(fg.num_y_points, 4)
    for x, v in fg.scaling_points_y:
        w.f(x, 8)
        w.f(v, 8)
    if not sp.monochrome:
        w.f(int(fg.chroma_scaling_from_luma), 1)
    csfl = int(fg.chroma_scaling_from_luma) if not sp.monochrome else 0
    # 4:2:0 chroma-points suppression rule (spec: mono / csfl / subsampled
    # with no luma points -> chroma point counts are not coded, i.e. zero)
    suppress_chroma = sp.monochrome or csfl or fg.num_y_points == 0
    num_cb = 0 if suppress_chroma else fg.num_cb_points
    num_cr = 0 if suppress_chroma else fg.num_cr_points
    if not suppress_chroma:
        w.f(num_cb, 4)
        for x, v in fg.scaling_points_cb:
            w.f(x, 8)
            w.f(v, 8)
        w.f(num_cr, 4)
        for x, v in fg.scaling_points_cr:
            w.f(x, 8)
            w.f(v, 8)
    w.f(fg.scaling_shift - 8, 2)
    w.f(fg.ar_coeff_lag, 2)
    num_pos = 2 * fg.ar_coeff_lag * (fg.ar_coeff_lag + 1)
    n_c = num_pos + (1 if fg.num_y_points else 0)
    if fg.num_y_points:
        for i in range(num_pos):
            w.f((fg.ar_coeffs_y[i] if i < len(fg.ar_coeffs_y) else 0) + 128, 8)
    if num_cb or csfl:
        for i in range(n_c):
            w.f((fg.ar_coeffs_cb[i] if i < len(fg.ar_coeffs_cb) else 0) + 128, 8)
    if num_cr or csfl:
        for i in range(n_c):
            w.f((fg.ar_coeffs_cr[i] if i < len(fg.ar_coeffs_cr) else 0) + 128, 8)
    w.f(fg.ar_coeff_shift - 6, 2)
    w.f(fg.grain_scale_shift, 2)
    if num_cb:
        w.f(fg.cb_mult, 8)
        w.f(fg.cb_luma_mult, 8)
        w.f(fg.cb_offset, 9)
    if num_cr:
        w.f(fg.cr_mult, 8)
        w.f(fg.cr_luma_mult, 8)
        w.f(fg.cr_offset, 9)
    w.f(int(fg.overlap_flag), 1)
    w.f(int(fg.clip_to_restricted_range), 1)


def show_existing_frame_obu(slot: int) -> bytes:
    """OBU_FRAME_HEADER with show_existing_frame=1 (spec 5.9.2): displays
    the decoded frame held in DPB slot `slot`. Only used for showable INTER
    frames (no display_frame_id, no KEY-frame state reset)."""
    w = BitWriter()
    w.f(1, 1)                  # show_existing_frame
    w.f(slot, 3)               # frame_to_show_map_idx
    w.trailing_bits()
    return write_obu(ObuType.FRAME_HEADER, w.data())


def frame_obu(sp: SequenceParams, fp: FrameParams, tile_payloads: list) -> bytes:
    """OBU_FRAME: uncompressed header (byte-aligned) + tile group data.

    tile_payloads: list of per-tile coded byte strings, raster order."""
    w = frame_header_payload(sp, fp)
    w.byte_align()  # OBU_FRAME: header is byte-aligned, no trailing bits
    data = bytearray(w.data())
    n_tiles = len(tile_payloads)
    # tile group header: tile_start_and_end_present omitted when 1 tile total
    tlog2 = fp.tile_cols_log2 + fp.tile_rows_log2
    if tlog2:
        tg = BitWriter()
        tg.f(0, 1)  # tile_start_and_end_present_flag
        tg.byte_align()
        data += tg.data()
    for i, tp in enumerate(tile_payloads):
        if i != n_tiles - 1:
            data += (len(tp) - 1).to_bytes(4, "little")  # tile_size_minus_1, le(4)
        data += tp
    return write_obu(ObuType.FRAME, bytes(data))
