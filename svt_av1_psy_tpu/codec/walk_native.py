"""ctypes glue for the native intra tile walk (native/walk_native.c).

One C call encodes a whole tile: partition walk + prediction + transforms +
quant + CFL + all syntax, executing the device-search decision maps. The
CDF state stays in the FrameContext numpy arrays (adapted in place by the
C coder), so Python can continue writing syntax with the same state.

Eligibility is gated in IntraFrameEncoder._encode_tile: decisions present,
no segmentation / LR re-encode / noise-norm / filter-intra search; anything
else falls back to the (bit-identical) Python walk. test_walk_native.py
asserts byte equality between the two walks across feature matrices.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from .constants import TxType
from .quant import build_plane_quant
from .transforms import _fwd_params, _inv_params
from .coeff_coding import TX_TYPE_CLASS, _scan_and_off2d

_NATIVE = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE / "build" / "libwalk.so"
_lib = None

_VP = ctypes.c_void_p
_I = ctypes.c_int


class _CWalk(ctypes.Structure):
    _fields_ = [
        ("enc", _VP), ("adapt", _I),
        ("mi_rows", _I), ("mi_cols", _I),
        ("tile_r0", _I), ("tile_r1", _I), ("tile_c0", _I), ("tile_c1", _I),
        ("nplanes", _I), ("bd", _I), ("qindex", _I),
        ("src", _VP * 3), ("src_stride", _I * 3),
        ("recon", _VP * 3), ("rec_stride", _I * 3),
        ("pw", _I * 3), ("ph", _I * 3),
        ("above_ctx", _VP * 3), ("left_ctx", _VP * 3),
        ("decoded", _VP * 3), ("dec_stride", _I * 3),
        ("dlf_txw", _VP * 3), ("dlf_txh", _VP * 3), ("dlf_skip", _VP * 3),
        ("dlf_bv", _VP * 3), ("dlf_bh", _VP * 3), ("dlf_stride", _I * 3),
        ("mi_mode", _VP), ("mi_skip", _VP),
        ("part_above", _VP), ("part_left", _VP),
        ("parts", _VP * 4), ("parts_cols", _I * 4),
        ("modes", _VP * 4), ("modes_cols", _I * 4),
        ("txs", _VP * 4), ("txs_cols", _I * 4),
        ("max_leaf", _I),
        ("sb_qtab_idx", _VP), ("sbq_cols", _I),
        ("qp_tab", _VP), ("sb_qindex", _VP),
        ("delta_q_present", _I), ("delta_q_res", _I), ("base_qindex", _I),
        ("qm", (_VP * 19) * 3), ("iqm", (_VP * 19) * 3),
        ("fwdp", (_VP * 16) * 19), ("invp", (_VP * 16) * 19),
        ("scans", (_VP * 16) * 19), ("nzoff", _VP * 19),
        ("enable_filter_intra", _I), ("allow_sct", _I), ("enable_cfl", _I),
        ("cdf_partition", _VP), ("cdf_skip", _VP), ("cdf_kf_y", _VP),
        ("cdf_angle", _VP), ("cdf_uv", _VP), ("cdf_cfl_sign", _VP),
        ("cdf_cfl_alpha", _VP), ("cdf_fi", _VP), ("cdf_fi_mode", _VP),
        ("cdf_ext_tx", _VP), ("cdf_pal_y", _VP), ("cdf_pal_uv", _VP),
        ("cdf_delta_q", _VP), ("cdf_txb_skip", _VP),
        ("cdf_eob", _VP * 7),
        ("cdf_eob_extra", _VP), ("cdf_base_eob", _VP), ("cdf_base", _VP),
        ("cdf_br", _VP), ("cdf_dc_sign", _VP),
        ("lr_ops", _VP), ("lr_start", _VP), ("lr_sb_cols", _I),
        ("cdf_wiener", _VP), ("cdf_sgr", _VP), ("cdf_switchable", _VP),
        ("prev_qindex", _I), ("sb_qindex_cur", _I), ("sb_delta_pending", _I),
        # ---- inter (P-frame) extension ----
        ("is_inter_frame", _I), ("gm_row", _I), ("gm_col", _I),
        ("d_ref", _VP), ("d_mode", _VP), ("d_mvr", _VP), ("d_mvc", _VP),
        ("refp", _VP * 6), ("refp_stride", _I * 6),
        ("pad", _I),
        ("filters8", _VP), ("filters4", _VP),
        ("g_ref", _VP), ("g_mvr", _VP), ("g_mvc", _VP),
        ("g_mode", _VP), ("g_bw4", _VP), ("g_bh4", _VP),
        ("cdf_intra_inter", _VP), ("cdf_single_ref", _VP), ("cdf_newmv", _VP),
        ("cdf_zeromv", _VP), ("cdf_refmv", _VP), ("cdf_drl", _VP),
        ("cdf_if_y", _VP), ("cdf_inter_ext_tx", _VP),
        ("cdf_nmv_joints", _VP), ("cdf_nmv_sign", _VP),
        ("cdf_nmv_classes", _VP), ("cdf_nmv_class0", _VP),
        ("cdf_nmv_bits", _VP), ("cdf_nmv_fp0", _VP), ("cdf_nmv_fp1", _VP),
        ("cdf_nmv_fp", _VP), ("cdf_nmv_c0hp", _VP), ("cdf_nmv_hp", _VP),
        # ---- compound extension ----
        ("ref_select", _I), ("ref2_const", _I),
        ("d_mvr2", _VP), ("d_mvc2", _VP),
        ("g_ref2", _VP), ("g_mv2r", _VP), ("g_mv2c", _VP),
        ("cdf_comp_inter", _VP), ("cdf_comp_ref_type", _VP),
        ("cdf_comp_ref", _VP), ("cdf_comp_bwdref", _VP),
        ("cdf_comp_mode", _VP),
        # ---- inter TX-type search extension ----
        ("d_txt", _VP),
        # ---- RDOQ ----
        ("rdoq_fast", _I),
        # ---- device-precomputed residuals (ops/commit.py) ----
        ("pre_slot", _VP), ("pre_off", _VP), ("pre_eob", _VP),
        ("pre_qc", _VP),
        # ---- order hints / skip mode ----
        ("sign_bias", _I * 8),
        ("skip_mode_present", _I), ("skip_ref0", _I), ("skip_ref1", _I),
        ("cdf_skip_mode", _VP), ("mi_skip_mode", _VP),
        # ---- rectangular partitions (IntraDecisions.rect) ----
        ("rect", _VP * 4), ("rect_cols", _I * 4),
        # ---- p<=6 feature extension (switchable filters / interintra /
        # OBMC / masked compound) ----
        ("switchable_filters", _I), ("enable_interintra", _I),
        ("enable_masked_compound", _I), ("motion_mode_switchable", _I),
        ("filt8", _VP * 3), ("filt4", _VP * 3),
        ("d_filt", _VP), ("d_mm", _VP), ("d_ii", _VP), ("d_iiw", _VP),
        ("d_ctype", _VP), ("d_widx", _VP), ("d_wsign", _VP),
        ("g_filt", _VP), ("g_comp_group", _VP),
        ("wedge_blob", _VP), ("wedge_off", _VP), ("ii_w1d", _VP),
        ("cdf_interintra", _VP), ("cdf_interintra_mode", _VP),
        ("cdf_wedge_interintra", _VP), ("cdf_wedge_idx", _VP),
        ("cdf_obmc", _VP), ("cdf_comp_group_idx", _VP),
        ("cdf_compound_type", _VP), ("cdf_switchable_interp", _VP),
        ("psy_rd", ctypes.c_double),
        # ---- TX size search extension (var-tx, TX_MODE_SELECT) ----
        ("tx_mode_select", _I), ("d_txsplit", _VP),
        ("txfm_above", _VP), ("txfm_left", _VP),
        ("cdf_tx_size", _VP), ("cdf_txfm_partition", _VP),
        # ---- third reference extension (GOLDEN rescue) ----
        ("refp3", _VP * 3), ("refp3_stride", _I * 3), ("ref3_const", _I),
        # ---- stack-aware NEAREST/NEAR MV injection (feature search) ----
        ("near_lam", _I),
        # ---- MFMV (use_ref_frame_mvs) extension ----
        ("use_ref_frame_mvs", _I),
        ("tpl_row", _VP), ("tpl_col", _VP), ("tpl_off", _VP),
        ("tpl_stride", _I),
        ("cur_off", _I * 8),
        ("allow_hp", _I), ("force_int", _I),
    ]


def _load():
    global _lib
    if _lib is not None:
        return _lib
    srcs = [_NATIVE / "walk_native.c", _NATIVE / "ec_native.c",
            _NATIVE / "mc_native.c"]
    stale = (_LIB_PATH.is_file()
             and _LIB_PATH.stat().st_mtime < max(s.stat().st_mtime for s in srcs))
    if not _LIB_PATH.is_file() or stale:
        try:
            _LIB_PATH.parent.mkdir(exist_ok=True)
            subprocess.run(
                ["gcc", "-O3", "-march=native", "-funroll-loops", "-shared",
                 "-fPIC", "-o", str(_LIB_PATH),
                 str(_NATIVE / "walk_native.c"), str(_NATIVE / "ec_native.c"),
                 str(_NATIVE / "mc_native.c")],
                check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.walk_encode_tile.argtypes = [ctypes.POINTER(_CWalk)]
    lib.walk_encode_tile.restype = ctypes.c_int
    lib.walk_precommit.argtypes = [
        ctypes.POINTER(_CWalk), ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.walk_precommit.restype = None
    lib.walk_feature_search.argtypes = [
        ctypes.POINTER(_CWalk), ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.walk_feature_search.restype = None
    lib.ec_create.restype = ctypes.c_void_p
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def prof_snapshot(reset: bool = False) -> dict:
    """C-walk section timers (seconds): pred / txq / recon / coeff_ec /
    total (walk_native.c walk_prof_ns)."""
    lib = _load()
    if lib is None:
        return {}
    buf = (ctypes.c_longlong * 8)()
    lib.walk_prof_get(buf)
    if reset:
        lib.walk_prof_reset()
    keys = ("pred", "txq", "recon", "coeff_ec", "total")
    return {k: buf[i] / 1e9 for i, k in enumerate(keys)}


# decided tx types can only be these; transforms params are prebuilt for them
_SEARCH_TX = (int(TxType.DCT_DCT), int(TxType.ADST_DCT), int(TxType.DCT_ADST),
              int(TxType.ADST_ADST), int(TxType.IDTX))


def eligible(enc) -> bool:
    """Can this tile run through the C walk? Intra frames need the RDO
    decision maps; P frames need the native mode-decision pre-pass
    (enc.inter_dec). Anything else falls back to the Python walk."""
    if not (available()
            and enc.use_native_ec
            and enc.seg_params is None
            and enc.noise_norm == 0):
        return False
    tname = type(enc).__name__
    if tname == "InterFrameEncoder":
        # ROTZOOM frames need the Python walk (warp MC lives there); TX-type
        # search results flow through the C walk's d_txt map. Switchable
        # filters / interintra / OBMC / masked compound run natively when
        # their decisions came from the feature-search pre-pass (enc.feat).
        if (getattr(enc, "inter_dec", None) is None
                or getattr(enc, "gm_wm", None) is not None):
            return False
        needs_feat = (getattr(enc, "motion_mode_switchable", False)
                      or getattr(enc, "enable_interintra", False)
                      or getattr(enc, "enable_masked_compound", False)
                      or getattr(enc, "switchable_filters", False))
        return not needs_feat or getattr(enc, "feat", None) is not None
    if tname != "IntraFrameEncoder":
        return False
    if (enc.decisions is None
            or (enc.enable_filter_intra and enc.filter_intra_search)
            or getattr(enc, "palette_enabled", False)
            or getattr(enc, "allow_intrabc_on", False)):
        return False
    # only the searched tx set has transform/scan tables on the C side
    for t in enc.decisions.tx_types.values():
        if not np.isin(t, _SEARCH_TX).all():
            return False
    return True


def _ptr(a) -> int:
    return a.ctypes.data if a is not None else 0


_WEDGE_CACHE = None


def _wedge_tables():
    """Packed luma wedge masks (sizes 8/16/32 x 16 idx x 2 signs) + the
    per-(size, idx, sign) offset table the C side indexes."""
    global _WEDGE_CACHE
    if _WEDGE_CACHE is None:
        from . import wedge as WG

        off = np.zeros(3 * 16 * 2, np.int32)
        parts = []
        pos = 0
        for si, size in enumerate((8, 16, 32)):
            for idx in range(16):
                for sign in (0, 1):
                    m = np.ascontiguousarray(WG.wedge_mask(size, idx, sign),
                                             np.int32)
                    off[si * 32 + idx * 2 + sign] = pos
                    parts.append(m.ravel())
                    pos += m.size
        _WEDGE_CACHE = (np.ascontiguousarray(np.concatenate(parts), np.int32),
                        np.ascontiguousarray(off))
    return _WEDGE_CACHE


def _fill_features(enc, w, keep):
    """Fill the p<=6 feature extension fields (flags, filter kernel sets,
    decision maps, mask tables, CDFs) of a Walk from the encoder state."""
    from .spec_tables import get_tables

    t = get_tables()._raw
    w.switchable_filters = int(getattr(enc, "switchable_filters", False))
    w.enable_interintra = int(getattr(enc, "enable_interintra", False))
    w.enable_masked_compound = int(getattr(enc, "enable_masked_compound",
                                           False))
    w.motion_mode_switchable = int(getattr(enc, "motion_mode_switchable",
                                           False))
    f8s = np.ascontiguousarray(t["interp_sub_pel_filters_8smooth"], np.int32)
    f8sh = np.ascontiguousarray(t["interp_sub_pel_filters_8sharp"], np.int32)
    f4s = np.ascontiguousarray(t["interp_sub_pel_filters_4smooth"], np.int32)
    keep += [f8s, f8sh, f4s]
    w.filt8[1], w.filt8[2] = _ptr(f8s), _ptr(f8sh)
    w.filt4[1] = _ptr(f4s)          # sharp 4-tap == regular (spec)
    feat = getattr(enc, "feat", None)
    if feat is not None:
        for name in ("filt", "mm", "ii", "iiw", "ctype", "widx", "wsign"):
            arr = feat[name]
            keep.append(arr)
            setattr(w, "d_" + name, _ptr(arr))
    g = enc.grid
    w.g_filt = _ptr(g.filt)
    w.g_comp_group = _ptr(g.comp_group)
    blob, off = _wedge_tables()
    w.wedge_blob, w.wedge_off = _ptr(blob), _ptr(off)
    from .inter_encoder import II_WEIGHTS1D

    ii1d = np.ascontiguousarray(II_WEIGHTS1D, np.int32)
    keep.append(ii1d)
    w.ii_w1d = _ptr(ii1d)
    tb = enc.fc.tables
    w.cdf_interintra = _ptr(tb["interintra"])
    w.cdf_interintra_mode = _ptr(tb["interintra_mode"])
    w.cdf_wedge_interintra = _ptr(tb["wedge_interintra"])
    w.cdf_wedge_idx = _ptr(tb["wedge_idx"])
    w.cdf_obmc = _ptr(tb["obmc"])
    w.cdf_comp_group_idx = _ptr(tb["comp_group_idx"])
    w.cdf_compound_type = _ptr(tb["compound_type"])
    w.cdf_switchable_interp = _ptr(tb["switchable_interp"])
    w.psy_rd = float(getattr(enc, "psy_rd", 0.0))


def _fill_tpl(enc, w, keep):
    """Fill the MFMV extension fields (projected temporal motion field +
    per-ref distances) so the C stacks run the same temporal scan as
    mv_pred._temporal_scan."""
    tp = getattr(enc, "tpl_mvs", None)
    if tp is None:
        w.use_ref_frame_mvs = 0
        return
    w.use_ref_frame_mvs = 1
    tr = np.ascontiguousarray(tp["row"], np.int16)
    tc = np.ascontiguousarray(tp["col"], np.int16)
    to = np.ascontiguousarray(tp["off"], np.uint8)
    keep += [tr, tc, to]
    w.tpl_row, w.tpl_col, w.tpl_off = _ptr(tr), _ptr(tc), _ptr(to)
    w.tpl_stride = to.shape[1]
    for i in range(8):
        w.cur_off[i] = int(tp["cur_off"][i])
    w.allow_hp = int(bool(tp["allow_hp"]))
    w.force_int = int(bool(tp.get("force_int", False)))


def _z_order_leaves(enc):
    """Decided leaves (mi_row, mi_col, bsize) in partition-walk (Morton)
    order: SB raster, then the z-curve of the top-left corner within the
    SB — the order both walks visit them."""
    from .constants import BLOCK_HEIGHT, BLOCK_WIDTH

    bs_by_wh = {(int(BLOCK_WIDTH[b]), int(BLOCK_HEIGHT[b])): b
                for b in range(len(BLOCK_WIDTH))}

    def morton(r, c):
        m = 0
        for b in range(4):
            m |= ((c >> b) & 1) << (2 * b)
            m |= ((r >> b) & 1) << (2 * b + 1)
        return m

    rows = []
    for (r, c), geom in enc.leaf_geom.items():
        W, H = geom
        rows.append(((r >> 4, c >> 4, morton(r & 15, c & 15)),
                     (r, c, bs_by_wh[(W, H)])))
    rows.sort(key=lambda x: x[0])
    return np.ascontiguousarray(
        np.array([v for _, v in rows], np.int32).reshape(-1, 3))


def feature_search(enc) -> bool:
    """One C call searching the p<=6 block features (switchable filter,
    interintra, OBMC, masked compound) for every decided inter leaf; fills
    enc.feat with the per-mi decision maps both walks then commit. The
    search is open-loop: II intra components read SOURCE neighbors (the
    commit uses real recon), OBMC sees the pre-pass MV grid. Returns False
    when the native library is unavailable (callers fall back to the
    Python walk's inline search)."""
    lib = _load()
    if lib is None or getattr(enc, "inter_dec", None) is None:
        return False
    from .mv_pred import LAST_FRAME
    from .spec_tables import get_tables

    w = _CWalk()
    keep = []
    w.mi_rows, w.mi_cols = enc.mi_rows, enc.mi_cols
    w.tile_r0, w.tile_r1 = 0, enc.mi_rows
    w.tile_c0, w.tile_c1 = 0, enc.mi_cols
    w.nplanes, w.bd, w.qindex = enc.nplanes, enc.bd, enc.qindex
    for p in range(enc.nplanes):
        ps = enc.planes[p]
        w.src[p] = _ptr(enc.src[p])
        w.src_stride[p] = enc.src[p].shape[1]
        w.recon[p] = _ptr(enc.src[p])     # open-loop: source neighbors
        w.rec_stride[p] = enc.src[p].shape[1]
        w.pw[p], w.ph[p] = ps.width, ps.height
    dec_scratch = np.zeros(enc.decoded[0].shape, np.uint8)
    keep.append(dec_scratch)
    w.decoded[0] = _ptr(dec_scratch)
    w.dec_stride[0] = dec_scratch.shape[1]
    w.pad = enc.pad
    shape = (enc.mi_rows, enc.mi_cols)
    d_ref = np.zeros(shape, np.int32)
    d_mode = np.zeros(shape, np.int32)
    d_mvr = np.zeros(shape, np.int32)
    d_mvc = np.zeros(shape, np.int32)
    d_mvr2 = np.zeros(shape, np.int32)
    d_mvc2 = np.zeros(shape, np.int32)
    # pre-pass neighbour grids (OBMC lookups): every leaf's decision
    g_ref = np.zeros(shape, np.int8)
    g_mvr = np.zeros(shape, np.int16)
    g_mvc = np.zeros(shape, np.int16)
    g_bw4 = np.ones(shape, np.uint8)
    g_bh4 = np.ones(shape, np.uint8)
    g_mode = np.zeros(shape, np.uint8)
    g_filt = np.full(shape, 3, np.uint8)
    for (r, c), v in enc.inter_dec.items():
        ui, rf, md, mr, mc = v[:5]
        d_ref[r, c] = (1 if md >= 17 else rf) if ui else 0
        d_mode[r, c] = md
        d_mvr[r, c] = mr
        d_mvc[r, c] = mc
        if ui and md >= 17:
            d_mvr2[r, c] = v[5]
            d_mvc2[r, c] = v[6]
        geom = enc.leaf_geom.get((r, c))
        if geom is None:
            continue
        bw4, bh4 = geom[0] >> 2, geom[1] >> 2
        r1, c1 = min(r + bh4, enc.mi_rows), min(c + bw4, enc.mi_cols)
        g_ref[r:r1, c:c1] = d_ref[r, c] if ui else 0
        g_mvr[r:r1, c:c1] = mr if ui else 0
        g_mvc[r:r1, c:c1] = mc if ui else 0
        g_mode[r:r1, c:c1] = md
        g_bw4[r:r1, c:c1] = bw4
        g_bh4[r:r1, c:c1] = bh4
    keep += [d_ref, d_mode, d_mvr, d_mvc, d_mvr2, d_mvc2,
             g_ref, g_mvr, g_mvc, g_bw4, g_bh4, g_mode, g_filt]
    w.d_ref, w.d_mode = _ptr(d_ref), _ptr(d_mode)
    w.d_mvr, w.d_mvc = _ptr(d_mvr), _ptr(d_mvc)
    w.d_mvr2, w.d_mvc2 = _ptr(d_mvr2), _ptr(d_mvc2)
    w.g_ref, w.g_mvr, w.g_mvc = _ptr(g_ref), _ptr(g_mvr), _ptr(g_mvc)
    w.g_bw4, w.g_bh4, w.g_mode = _ptr(g_bw4), _ptr(g_bh4), _ptr(g_mode)
    w.ref2_const = int(enc.ref2) if enc.ref2 is not None else 7
    for ri, rf in ((0, LAST_FRAME), (1, enc.ref2)):
        if rf is not None and rf in enc.refs:
            for p in range(enc.nplanes):
                arr = np.ascontiguousarray(enc.refs[rf][p], np.int32)
                keep.append(arr)
                w.refp[ri * 3 + p] = _ptr(arr)
                w.refp_stride[ri * 3 + p] = arr.shape[1]
    f8 = enc.me[LAST_FRAME]._filters
    f4 = np.ascontiguousarray(
        get_tables()._raw["interp_sub_pel_filters_4"], np.int32)
    keep += [f8, f4]
    w.filters8, w.filters4 = _ptr(f8), _ptr(f4)
    w.gm_row, w.gm_col = enc.gm_mv

    class _Feat:
        pass

    fe = _Feat()
    fe.switchable_filters = getattr(enc, "switchable_filters", False)
    fe.enable_interintra = getattr(enc, "enable_interintra", False)
    fe.enable_masked_compound = getattr(enc, "enable_masked_compound", False)
    fe.motion_mode_switchable = getattr(enc, "motion_mode_switchable", False)
    fe.grid = _Feat()
    fe.grid.filt = g_filt
    fe.grid.comp_group = np.zeros(shape, np.uint8)
    fe.feat = None
    fe.fc = enc.fc
    fe.psy_rd = getattr(enc, "psy_rd", 0.0)
    _fill_features(fe, w, keep)
    _fill_tpl(enc, w, keep)
    sb = getattr(enc, "sign_bias", None)
    if sb is not None:
        for i in range(min(8, len(sb))):
            w.sign_bias[i] = int(sb[i])

    maps = {name: np.zeros(shape, np.int8)
            for name in ("filt", "mm", "ii", "iiw", "ctype", "widx",
                         "wsign")}
    leaves = _z_order_leaves(enc)
    from ..profiling import stage

    with stage("host:feature_search"):
        lib.walk_feature_search(
            ctypes.byref(w), _ptr(leaves), len(leaves),
            _ptr(maps["filt"]), _ptr(maps["mm"]), _ptr(maps["ii"]),
            _ptr(maps["iiw"]), _ptr(maps["ctype"]), _ptr(maps["widx"]),
            _ptr(maps["wsign"]))
    del keep
    enc.feat = maps
    return True


def encode_tile(enc, mi_r0, mi_r1, mi_c0, mi_c1) -> None:
    """Run the C walk over one tile of an IntraFrameEncoder (state mutated
    in place exactly as the Python walk would)."""
    lib = _load()
    w = _CWalk()
    keep = []  # keep converted arrays alive across the call

    w.enc = enc.enc._h
    w.adapt = 0 if enc.fc.disable_update else 1
    w.mi_rows, w.mi_cols = enc.mi_rows, enc.mi_cols
    w.tile_r0, w.tile_r1, w.tile_c0, w.tile_c1 = mi_r0, mi_r1, mi_c0, mi_c1
    w.nplanes, w.bd, w.qindex = enc.nplanes, enc.bd, enc.qindex

    for p, ps in enumerate(enc.planes):
        w.src[p] = _ptr(enc.src[p])
        w.src_stride[p] = enc.src[p].shape[1]
        w.recon[p] = _ptr(ps.recon)
        w.rec_stride[p] = ps.recon.shape[1]
        w.pw[p], w.ph[p] = ps.width, ps.height
        w.above_ctx[p] = _ptr(ps.above_ctx)
        w.left_ctx[p] = _ptr(ps.left_ctx)
        dec = enc.decoded[p].view(np.uint8)
        w.decoded[p] = _ptr(dec)
        w.dec_stride[p] = dec.shape[1]
        m = enc.dlf_maps[p]
        w.dlf_txw[p] = _ptr(m.txw)
        w.dlf_txh[p] = _ptr(m.txh)
        w.dlf_skip[p] = _ptr(m.skip.view(np.uint8))
        w.dlf_bv[p] = _ptr(m.bedge_v.view(np.uint8))
        w.dlf_bh[p] = _ptr(m.bedge_h.view(np.uint8))
        w.dlf_stride[p] = m.txw.shape[1]
    w.mi_mode = _ptr(enc.mi_mode)
    w.mi_skip = _ptr(enc.mi_skip)
    w.part_above = _ptr(enc.part_above)
    w.part_left = _ptr(enc.part_left)

    dec = enc.decisions
    if dec is not None:
        for li, size in enumerate((8, 16, 32, 64)):
            p = dec.parts.get(size)
            if p is not None:
                p8 = np.ascontiguousarray(p, np.uint8)
                keep.append(p8)
                w.parts[li] = _ptr(p8)
                w.parts_cols[li] = p8.shape[1]
            m = dec.modes.get(size)
            if m is not None:
                m32 = np.ascontiguousarray(m, np.int32)
                keep.append(m32)
                w.modes[li] = _ptr(m32)
                w.modes_cols[li] = m32.shape[1]
            t = dec.tx_types.get(size)
            if t is not None and size <= 16:
                t32 = np.ascontiguousarray(t, np.int32)
                keep.append(t32)
                w.txs[li] = _ptr(t32)
                w.txs_cols[li] = t32.shape[1]
            rp = getattr(dec, "rect", None)
            rp = rp.get(size) if rp else None
            if rp is not None:
                r8 = np.ascontiguousarray(rp, np.uint8)
                keep.append(r8)
                w.rect[li] = _ptr(r8)
                w.rect_cols[li] = r8.shape[1]
        w.max_leaf = dec.max_leaf
    else:
        # fixed-size leaves (inter frames): dec_split falls back to max_leaf
        from .constants import BLOCK_WIDTH

        w.max_leaf = int(BLOCK_WIDTH[enc.target_bsize])

    # ---- inter (P-frame) extension: decisions, refs, MiGrid, CDFs
    if type(enc).__name__ == "InterFrameEncoder":
        from .mv_pred import LAST_FRAME
        from .spec_tables import get_tables

        w.is_inter_frame = 1
        w.gm_row, w.gm_col = enc.gm_mv
        shape = (enc.mi_rows, enc.mi_cols)
        d_ref = np.zeros(shape, np.int32)
        d_mode = np.zeros(shape, np.int32)
        d_mvr = np.zeros(shape, np.int32)
        d_mvc = np.zeros(shape, np.int32)
        d_mvr2 = np.zeros(shape, np.int32)
        d_mvc2 = np.zeros(shape, np.int32)
        for (r, c), v in enc.inter_dec.items():
            ui, rf, md, mr, mc = v[:5]
            d_ref[r, c] = (1 if md >= 17 else rf) if ui else 0
            d_mode[r, c] = md
            d_mvr[r, c] = mr
            d_mvc[r, c] = mc
            if ui and md >= 17:
                d_mvr2[r, c] = v[5]
                d_mvc2[r, c] = v[6]
        keep += [d_ref, d_mode, d_mvr, d_mvc, d_mvr2, d_mvc2]
        w.d_ref, w.d_mode = _ptr(d_ref), _ptr(d_mode)
        w.d_mvr, w.d_mvc = _ptr(d_mvr), _ptr(d_mvc)
        w.d_mvr2, w.d_mvc2 = _ptr(d_mvr2), _ptr(d_mvc2)
        if getattr(enc, "inter_txt", None):
            d_txt = np.zeros(shape, np.int32)
            for (r, c), tt in enc.inter_txt.items():
                d_txt[r, c] = tt
            keep.append(d_txt)
            w.d_txt = _ptr(d_txt)
        # TX-size search (var-tx): per-mi split map + txfm partition
        # context rows (tile-reset to 64, the no-neighbor init)
        w.tx_mode_select = int(getattr(enc, "tx_mode_select", False))
        if w.tx_mode_select:
            d_sp = np.zeros(shape, np.int8)
            for (r, c) in getattr(enc, "inter_txsplit", {}):
                d_sp[r, c] = 1
            ta = np.full(enc.mi_cols, 64, np.uint8)
            tl = np.full(enc.mi_rows, 64, np.uint8)
            keep += [d_sp, ta, tl]
            w.d_txsplit = _ptr(d_sp)
            w.txfm_above, w.txfm_left = _ptr(ta), _ptr(tl)
            t0 = enc.fc.tables
            w.cdf_tx_size = _ptr(t0["tx_size"])
            w.cdf_txfm_partition = _ptr(t0["txfm_partition"])
        for ri, rf in ((0, LAST_FRAME), (1, enc.ref2)):
            if rf is not None and rf in enc.refs:
                for p in range(enc.nplanes):
                    arr = np.ascontiguousarray(enc.refs[rf][p], np.int32)
                    keep.append(arr)
                    w.refp[ri * 3 + p] = _ptr(arr)
                    w.refp_stride[ri * 3 + p] = arr.shape[1]
        rf3 = getattr(enc, "ref3", None)
        if rf3 is not None and rf3 in enc.refs:
            w.ref3_const = int(rf3)
            for p in range(enc.nplanes):
                arr = np.ascontiguousarray(enc.refs[rf3][p], np.int32)
                keep.append(arr)
                w.refp3[p] = _ptr(arr)
                w.refp3_stride[p] = arr.shape[1]
        w.pad = enc.pad
        f8 = enc.me[LAST_FRAME]._filters
        f4 = np.ascontiguousarray(
            get_tables()._raw["interp_sub_pel_filters_4"], np.int32)
        keep += [f8, f4]
        w.filters8, w.filters4 = _ptr(f8), _ptr(f4)
        g = enc.grid
        w.g_ref, w.g_mvr, w.g_mvc = _ptr(g.ref_frame), _ptr(g.mv_row), _ptr(g.mv_col)
        w.g_mode, w.g_bw4, w.g_bh4 = _ptr(g.mode), _ptr(g.bw4), _ptr(g.bh4)
        w.g_ref2 = _ptr(g.ref_frame2)
        w.g_mv2r, w.g_mv2c = _ptr(g.mv2_row), _ptr(g.mv2_col)
        w.ref_select = int(getattr(enc, "ref_select", False))
        from .mv_pred import ALTREF_FRAME as _ALT

        w.ref2_const = int(enc.ref2) if enc.ref2 is not None else _ALT
        w.rdoq_fast = int(getattr(enc, "rdoq_fast", False)
                          and enc.noise_norm == 0)
        # order hints: sign bias + skip-mode frame state (mirrors the
        # Python walk's fields; mi_skip_mode is the shared ctx grid)
        sb = getattr(enc, "sign_bias", None)
        if sb is not None:
            for i in range(8):
                w.sign_bias[i] = int(sb[i])
        sm_pair = getattr(enc, "skip_mode_pair", None)
        if (getattr(enc, "skip_mode_present", False) and sm_pair is not None):
            w.skip_mode_present = 1
            w.skip_ref0, w.skip_ref1 = int(sm_pair[0]), int(sm_pair[1])
            w.cdf_skip_mode = _ptr(enc.fc.tables["skip_mode"])
        w.mi_skip_mode = _ptr(enc.mi_skip_mode)
        # p<=6 features: flags, kernel sets, decision maps, masks, CDFs
        _fill_features(enc, w, keep)
        # MFMV: temporal motion field for the C stacks' temporal scan
        _fill_tpl(enc, w, keep)
        pre = getattr(enc, "pre_commit", None)
        if pre is not None:
            keep += [pre.pre_slot, pre.pre_off, pre.pre_eob, pre.pre_qc]
            w.pre_slot = _ptr(pre.pre_slot)
            w.pre_off = _ptr(pre.pre_off)
            w.pre_eob = _ptr(pre.pre_eob)
            w.pre_qc = _ptr(pre.pre_qc)
        t = enc.fc.tables
        w.cdf_intra_inter = _ptr(t["intra_inter"])
        w.cdf_single_ref = _ptr(t["single_ref"])
        w.cdf_newmv = _ptr(t["newmv"])
        w.cdf_zeromv = _ptr(t["zeromv"])
        w.cdf_refmv = _ptr(t["refmv"])
        w.cdf_drl = _ptr(t["drl"])
        w.cdf_if_y = _ptr(t["if_y_mode"])
        w.cdf_inter_ext_tx = _ptr(t["inter_ext_tx"])
        w.cdf_nmv_joints = _ptr(t["nmv_joints"])
        w.cdf_nmv_sign = _ptr(t["nmv_sign"])
        w.cdf_nmv_classes = _ptr(t["nmv_classes"])
        w.cdf_nmv_class0 = _ptr(t["nmv_class0"])
        w.cdf_nmv_bits = _ptr(t["nmv_bits"])
        w.cdf_nmv_fp0 = _ptr(t["nmv_class0_fp0"])
        w.cdf_nmv_fp1 = _ptr(t["nmv_class0_fp1"])
        w.cdf_nmv_fp = _ptr(t["nmv_fp"])
        w.cdf_nmv_c0hp = _ptr(t["nmv_class0_hp"])
        w.cdf_nmv_hp = _ptr(t["nmv_hp"])
        w.cdf_comp_inter = _ptr(t["comp_inter"])
        w.cdf_comp_ref_type = _ptr(t["comp_ref_type"])
        w.cdf_comp_ref = _ptr(t["comp_ref"])
        w.cdf_comp_bwdref = _ptr(t["comp_bwdref"])
        w.cdf_comp_mode = _ptr(t["inter_compound_mode"])

    # ---- quant tables: one row per distinct per-SB qindex (+ base)
    def qp_vals(qindex):
        rows = []
        pdq = enc.plane_dq
        deltas = ((pdq[0], 0), (pdq[1], pdq[2]), (pdq[3], pdq[4]))
        for p in range(enc.nplanes):
            pq = build_plane_quant(qindex, deltas[p][0], deltas[p][1],
                                   enc.bd, enc.sharpness, enc.qindex)
            rows.append([pq.zbin[0], pq.zbin[1], pq.round[0], pq.round[1],
                         pq.quant[0], pq.quant[1], pq.quant_shift[0],
                         pq.quant_shift[1], pq.dequant[0], pq.dequant[1]])
        return rows

    if enc.delta_q_present:
        qmap = np.asarray(enc.sb_qindex_map, np.int32)
        uniq = sorted(set(int(v) for v in qmap.ravel()))
        index_of = {q: i for i, q in enumerate(uniq)}
        qp_tab = np.array([qp_vals(q) for q in uniq], np.int32)
        sb_idx = np.vectorize(index_of.get)(qmap).astype(np.int32)
        sb_idx = np.ascontiguousarray(sb_idx)
        keep += [qp_tab, sb_idx, qmap]
        w.sb_qtab_idx = _ptr(sb_idx)
        w.sbq_cols = sb_idx.shape[1]
        w.qp_tab = _ptr(qp_tab)
        w.sb_qindex = _ptr(np.ascontiguousarray(qmap))
        w.delta_q_present = 1
    else:
        qp_tab = np.array([qp_vals(enc.qindex)], np.int32)
        keep.append(qp_tab)
        w.qp_tab = _ptr(qp_tab)
        w.delta_q_present = 0
    w.delta_q_res = enc.delta_q_res
    w.base_qindex = enc.qindex
    w.prev_qindex = getattr(enc, "_prev_qindex", enc.qindex)

    # ---- QM (uint8/uint16 copies of the int32 tables)
    tx_sizes = range(19)
    if enc.qm_levels is not None:
        from .qm import get_qm

        for p in range(enc.nplanes):
            for ts in tx_sizes:
                qm, iqm = get_qm(enc.qm_levels[p], p > 0, ts)
                if qm is None:
                    continue
                qm8 = np.ascontiguousarray(qm, np.uint8)
                iqm16 = np.ascontiguousarray(iqm, np.uint16)
                keep += [qm8, iqm16]
                w.qm[p][ts] = _ptr(qm8)
                w.iqm[p][ts] = _ptr(iqm16)

    # ---- transforms + scans for the (tx_size, tx_type) combos in use
    for ts in tx_sizes:
        types = (_SEARCH_TX if ts in (0, 1, 2)
                 else ((0, int(TxType.IDTX)) if ts == 3 else (0,)))
        for tt in types:
            fp = _fwd_params(ts, tt)
            ip = _inv_params(ts, tt, enc.bd)
            scan, off2d = _scan_and_off2d(ts, tt, int(TX_TYPE_CLASS[tt]))
            keep += [fp, ip, scan]
            w.fwdp[ts][tt] = _ptr(fp)
            w.invp[ts][tt] = _ptr(ip)
            w.scans[ts][tt] = _ptr(scan)
            if tt == 0:
                keep.append(off2d)
                w.nzoff[ts] = _ptr(off2d)

    w.enable_filter_intra = int(enc.enable_filter_intra)
    w.allow_sct = int(enc.allow_sct)
    w.enable_cfl = int(enc.enable_cfl)

    t = enc.fc.tables
    w.cdf_partition = _ptr(t["partition"])
    w.cdf_skip = _ptr(t["skip"])
    w.cdf_kf_y = _ptr(t["kf_y_mode"])
    w.cdf_angle = _ptr(t["angle_delta"])
    w.cdf_uv = _ptr(t["uv_mode"])
    w.cdf_cfl_sign = _ptr(t["cfl_sign"])
    w.cdf_cfl_alpha = _ptr(t["cfl_alpha"])
    w.cdf_fi = _ptr(t["filter_intra"])
    w.cdf_fi_mode = _ptr(t["filter_intra_mode"])
    w.cdf_ext_tx = _ptr(t["intra_ext_tx"])
    w.cdf_pal_y = _ptr(t["palette_y_mode"])
    w.cdf_pal_uv = _ptr(t["palette_uv_mode"])
    w.cdf_delta_q = _ptr(t["delta_q"])
    w.cdf_txb_skip = _ptr(t["txb_skip"])
    for i, name in enumerate(("eob_multi16", "eob_multi32", "eob_multi64",
                              "eob_multi128", "eob_multi256", "eob_multi512",
                              "eob_multi1024")):
        w.cdf_eob[i] = _ptr(t[name])
    w.cdf_eob_extra = _ptr(t["eob_extra"])
    w.cdf_base_eob = _ptr(t["coeff_base_eob_multi"])
    w.cdf_base = _ptr(t["coeff_base_multi"])
    w.cdf_br = _ptr(t["coeff_lps_multi"])
    w.cdf_dc_sign = _ptr(t["dc_sign"])
    w.cdf_wiener = _ptr(t["wiener_restore"])
    w.cdf_sgr = _ptr(t["sgrproj_restore"])
    w.cdf_switchable = _ptr(t["switchable_restore"])

    # ---- LR unit syntax, precomputed per SB as op triples
    if getattr(enc, "rsts", None):
        ops, starts = _record_lr_ops(enc, mi_r0, mi_r1, mi_c0, mi_c1)
        keep += [ops, starts]
        w.lr_ops = _ptr(ops)
        w.lr_start = _ptr(starts)
        w.lr_sb_cols = -(-enc.mi_cols // 16)

    # ---- batched host pre-commit: pred/TX/quant/recon for this tile's
    # decided inter leaves through the lane-batched C kernels before the
    # EC walk (same pre_* ABI as the device commit; bit-identical to the
    # walk's own per-leaf path by construction — tests/test_walk_native.py)
    if (w.is_inter_frame and getattr(enc, "pre_commit", None) is None
            and enc.qindex > 0):
        from .constants import BLOCK_HEIGHT
        from .constants import BLOCK_WIDTH as _BWF

        bs_by_wh = {(int(_BWF[b]), int(BLOCK_HEIGHT[b])): b
                    for b in range(len(_BWF))}
        rows = []
        total = 0
        feat = getattr(enc, "feat", None)
        for (r, c), d in enc.inter_dec.items():
            if not d[0]:
                continue
            geom = enc.leaf_geom.get((r, c))
            if geom is None:
                continue
            W, H = geom
            if (W < 8 or H < 8
                    or not (mi_r0 <= r < mi_r1 and mi_c0 <= c < mi_c1)):
                continue
            # II needs walk-time recon neighbors and OBMC walk-order grid
            # state: those leaves compute in-walk, not in the precommit
            if feat is not None and (feat["ii"][r, c] or feat["mm"][r, c]):
                continue
            # var-tx split leaves quantize per CHILD tx inside the walk;
            # the precommit's block-tx batch would use the child tx type
            # at the parent size (possibly outside its set)
            if (r, c) in getattr(enc, "inter_txsplit", {}):
                continue
            rows.append((r, c, bs_by_wh[(W, H)]))
            ny = min(W, 32) * min(H, 32)
            nuv = (min(W >> 1, 32) * min(H >> 1, 32)
                   if enc.nplanes > 1 else 0)
            total += ny + 2 * nuv
        if rows:
            leaves = np.ascontiguousarray(np.array(rows, np.int32))
            nl = len(rows)
            p_slot = np.zeros(enc.mi_rows * enc.mi_cols, np.int32)
            p_off = np.zeros(3 * nl, np.int32)
            p_eob = np.zeros(3 * nl, np.int32)
            p_qc = np.zeros(total, np.int32)
            keep += [leaves, p_slot, p_off, p_eob, p_qc]
            from ..profiling import stage

            with stage("host:precommit"):
                lib.walk_precommit(ctypes.byref(w), _ptr(leaves), nl,
                                   _ptr(p_slot), _ptr(p_off), _ptr(p_eob),
                                   _ptr(p_qc))
            w.pre_slot = _ptr(p_slot)
            w.pre_off = _ptr(p_off)
            w.pre_eob = _ptr(p_eob)
            w.pre_qc = _ptr(p_qc)

    lib.walk_encode_tile(ctypes.byref(w))
    del keep


class _OpRecorder:
    """Mock encoder + fc capturing the LR syntax as (kind, a, b) triples.
    kinds: 0 wiener_restore sym, 1 bool, 2 literal, 3 sgrproj_restore sym,
    4 switchable_restore sym."""

    _CDF_KIND = {"wiener_restore": 0, "sgrproj_restore": 3,
                 "switchable_restore": 4}

    def __init__(self):
        self.ops = []

    def write(self, enc, name, idx, symbol, nsyms):
        self.ops.append((self._CDF_KIND[name], int(symbol), int(nsyms)))

    def encode_bool(self, val, f):
        self.ops.append((1, int(val), int(f)))

    def encode_literal(self, value, bits):
        self.ops.append((2, int(value), int(bits)))


def _record_lr_ops(enc, mi_r0, mi_r1, mi_c0, mi_c1):
    """Replay _write_lr_for_sb over the tile's SBs into an op stream (the
    symbol VALUES are decision-determined; only CDF state evolves, which the
    C coder handles on the real wiener_restore table)."""
    from .restoration import RESTORE_NONE, lr_units_in_sb, write_lr_unit

    rec = _OpRecorder()
    starts = [0]
    lr_refs = [dict(h=list(r["h"]), v=list(r["v"]), sgr=list(r["sgr"]))
               for r in enc._lr_refs]
    sb_cols = -(-enc.mi_cols // 16)
    n_sb = (-(-enc.mi_rows // 16)) * sb_cols
    per_sb = {}
    for mi_row in range(mi_r0, mi_r1, 16):
        for mi_col in range(mi_c0, mi_c1, 16):
            n0 = len(rec.ops)
            for plane, pr in enumerate(enc.rsts):
                if pr is None or pr.frame_type == RESTORE_NONE:
                    continue
                for (r, c) in lr_units_in_sb(pr, mi_row, mi_col, 16,
                                             getattr(enc, 'sr_denom', 8)):
                    write_lr_unit(rec, rec, pr.frame_type,
                                  pr.unit_info[r][c], lr_refs[plane],
                                  plane > 0)
            per_sb[(mi_row >> 4) * sb_cols + (mi_col >> 4)] = (n0, len(rec.ops))
    starts = np.zeros(n_sb + 1, np.int32)
    for sbi in range(n_sb):
        if sbi in per_sb:
            starts[sbi] = per_sb[sbi][0]
            starts[sbi + 1] = per_sb[sbi][1]
        else:
            starts[sbi + 1] = starts[sbi]
    ops = np.asarray(rec.ops, np.int32).reshape(-1, 3) if rec.ops else         np.zeros((0, 3), np.int32)
    return np.ascontiguousarray(ops), starts
