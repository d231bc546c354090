"""Encoder configuration.

Mirrors the reference's three-tier config system (SURVEY.md §5 aux/config):
  1. `EncoderConfig` dataclass ~ `EbSvtAv1EncConfiguration`
     (Source/API/EbSvtAv1Enc.h:219-1043)
  2. `parse_parameter(cfg, name, value)` ~ `svt_av1_enc_parse_parameter`
     (Source/Lib/Globals/enc_settings.c:2106-2248 name→field maps,
      :1299-1883 typed str_to_* converters)
  3. `verify_settings(cfg)` ~ `svt_av1_verify_settings` (enc_settings.c:40)

Defaults follow the PSY fork (enc_settings.c:936 svt_av1_set_default_params;
rationale README_old.md:116-131): tune=2, variance boost on @ strength 2,
sharpness=1, psy_rd=0.5, sharp_tx=1, QM on with min_qm_level=2.
"""

from __future__ import annotations

import dataclasses
import enum
from dataclasses import dataclass, field
from typing import Optional

from .errors import ErrorCode, SvtAv1Error


# ---------------------------------------------------------------------------
# Enums (Source/API/EbSvtAv1Enc.h, EbSvtAv1Formats.h)
# ---------------------------------------------------------------------------

MIN_PRESET = -3  # ENC_MRS research preset (EbSvtAv1Enc.h:46-47)
MAX_PRESET = 13

MAX_QINDEX = 255
MIN_QP = 1
MAX_QP = 63
MAX_CRF = 70           # PSY extended CRF (README_old.md; enc_settings.c:1505)
CRF_QUARTER_STEP = 4   # CRF is stored in quarter units internally


class RateControlMode(enum.IntEnum):
    CRF_CQP = 0   # CRF when TPL enabled, CQP otherwise
    VBR = 1
    CBR = 2


class Tune(enum.IntEnum):
    VQ = 0
    PSNR = 1
    SSIM = 2          # PSY default
    SUBJECTIVE_SSIM = 3  # PSY tune 3
    STILL_PICTURE = 4    # PSY tune 4


class PredStructure(enum.IntEnum):
    LOW_DELAY = 1
    RANDOM_ACCESS = 2


class SuperResMode(enum.IntEnum):
    NONE = 0
    FIXED = 1
    RANDOM = 2
    QTHRESH = 3
    AUTO = 4


class ResizeMode(enum.IntEnum):
    NONE = 0
    FIXED = 1
    RANDOM = 2
    DYNAMIC = 3
    MANUAL = 4


class ColorFormat(enum.IntEnum):
    YUV400 = 0
    YUV420 = 1
    YUV422 = 2
    YUV444 = 3


class IntraRefreshType(enum.IntEnum):
    FWDKF = 1  # forward key frame (open GOP)
    KF = 2     # key frame (closed GOP / CRA)


class SFrameMode(enum.IntEnum):
    STRICT_BASE = 1
    NEAREST_BASE = 2


class VarianceBoostCurve(enum.IntEnum):
    DEFAULT = 0
    ALTERNATIVE = 1
    STILL_PICTURE = 2
    LOW = 3


# color description enums (EbSvtAv1Formats.h)
COLOR_PRIMARIES = {
    "bt709": 1, "unspecified": 2, "bt470m": 4, "bt470bg": 5, "bt601": 6,
    "smpte240": 7, "film": 8, "bt2020": 9, "xyz": 10, "smpte431": 11,
    "smpte432": 12, "ebu3213": 22,
}
TRANSFER_CHARACTERISTICS = {
    "bt709": 1, "unspecified": 2, "bt470m": 4, "bt470bg": 5, "bt601": 6,
    "smpte240": 7, "linear": 8, "log100": 9, "log100-sqrt10": 10,
    "iec61966": 11, "bt1361": 12, "srgb": 13, "bt2020-10": 14,
    "bt2020-12": 15, "smpte2084": 16, "smpte428": 17, "hlg": 18,
}
MATRIX_COEFFICIENTS = {
    "identity": 0, "bt709": 1, "unspecified": 2, "fcc": 4, "bt470bg": 5,
    "bt601": 6, "smpte240": 7, "ycgco": 8, "bt2020-ncl": 9, "bt2020-cl": 10,
    "smpte2085": 11, "chroma-ncl": 12, "chroma-cl": 13, "ictcp": 14,
}
COLOR_RANGE = {"studio": 0, "full": 1}
CHROMA_SAMPLE_POSITION = {
    "unknown": 0, "vertical": 1, "left": 1, "colocated": 2, "topleft": 2,
}


@dataclass
class FrameScale:
    """On-the-fly reference scaling events (resize-mode MANUAL)."""

    start_frame: int = 0
    denom: int = 8
    kf_denom: int = 8


@dataclass
class EncoderConfig:
    """All encoder settings. Field names follow the reference's CLI tokens
    (dashes→underscores) so parse_parameter is a 1:1 map."""

    # --- source description -------------------------------------------------
    width: int = 0                       # 4..16384, odd allowed (PSY)
    height: int = 0
    forced_max_frame_width: int = 0
    forced_max_frame_height: int = 0
    input_depth: int = 8                 # 8 | 10
    color_format: ColorFormat = ColorFormat.YUV420
    fps_num: int = 60000
    fps_denom: int = 1000

    # --- preset / tune -------------------------------------------------------
    preset: int = 10                     # enc_mode; -3..13
    tune: Tune = Tune.SSIM               # PSY default tune=2
    fast_decode: int = 0                 # 0..2
    avif: bool = False                   # single-image mode (EbSvtAv1Enc.h:946)
    lossless: bool = False               # (EbSvtAv1Enc.h:940)

    # --- GOP structure -------------------------------------------------------
    intra_period_length: int = -2        # -2 = auto, -1 = only first frame
    intra_refresh_type: IntraRefreshType = IntraRefreshType.KF
    hierarchical_levels: int = 0         # 0 = auto (2..5)
    pred_structure: PredStructure = PredStructure.RANDOM_ACCESS
    force_key_frames: bool = False
    sframe_dist: int = 0
    sframe_mode: SFrameMode = SFrameMode.STRICT_BASE
    startup_mg_size: int = 0
    startup_qp_offset: int = 0
    enable_dg: bool = True               # dynamic mini-GoP: high-motion
                                         # spans halve their pyramids
                                         # (api._split_gop_dynamic)

    # --- rate control --------------------------------------------------------
    rate_control_mode: RateControlMode = RateControlMode.CRF_CQP
    qp: int = 35                         # CQP/CRF value (quarter steps via crf str)
    crf_quarter: int = 0                 # extra quarter-step units 0..3 (PSY extended CRF)
    target_bit_rate: int = 2_000_000     # bits/sec (VBR/CBR)
    max_bit_rate: int = 0
    min_qp_allowed: int = MIN_QP
    max_qp_allowed: int = MAX_QP
    use_fixed_qindex_offsets: int = 0
    qindex_offsets: tuple = ()
    key_frame_qindex_offset: int = 0
    key_frame_chroma_qindex_offset: int = 0
    chroma_qindex_offsets: tuple = ()
    luma_y_dc_qindex_offset: int = 0
    chroma_u_dc_qindex_offset: int = 0
    chroma_u_ac_qindex_offset: int = 0
    chroma_v_dc_qindex_offset: int = 0
    chroma_v_ac_qindex_offset: int = 0
    undershoot_pct: int = 25
    overshoot_pct: int = 25
    mbr_overshoot_pct: int = 50
    buf_initial_sz: int = 6000
    buf_optimal_sz: int = 5000
    buf_sz: int = 6000
    minsection_pct: int = 0
    maxsection_pct: int = 2000
    recode_loop: int = 4                 # overshoot re-encode: 0 off,
                                         # 1 key only, 2/4 key+unshown,
                                         # 3 all (rc_process.c recode)
    vbv_bufsize: int = 0
    gop_constraint_rc: bool = False
    scene_change_detection: bool = False
    look_ahead_distance: int = -1        # -1 auto
    enable_tpl_la: bool = True
    aq_mode: int = 2                     # 0 off, 1 variance, 2 deltaq (default)
    enable_adaptive_quantization: int = 2

    # --- multi-pass ----------------------------------------------------------
    pass_num: int = 0                    # 0 single, 1/2/3 multipass
    stats_file: str = ""
    rc_stats_buffer: Optional[bytes] = None

    # --- PSY features (README_old.md:5-131; §2.6 of SURVEY) ------------------
    enable_variance_boost: bool = True
    variance_boost_strength: int = 2     # 1..4
    variance_octile: int = 6             # 1..8
    variance_boost_curve: VarianceBoostCurve = VarianceBoostCurve.DEFAULT
    psy_rd: float = 0.5                  # 0.0..6.0
    spy_rd: int = 0                      # 0..2
    luminance_qp_bias: int = 0           # 0..100 (PSY frame-luma-bias)
    sharp_tx: bool = True
    sharpness: int = 1                   # -7..7
    qp_scale_compress_strength: float = 1.0  # 0..3
    max_32_tx_size: bool = False
    noise_norm_strength: int = 0         # 0..4
    tf_strength: int = 1                 # 0..4 (scaled)
    kf_tf_strength: int = 1
    adaptive_film_grain: bool = True

    # --- quantization matrices ----------------------------------------------
    enable_qm: bool = True               # PSY default on
    min_qm_level: int = 2                # PSY default 2
    max_qm_level: int = 15
    min_chroma_qm_level: int = 8         # PSY decoupled chroma QM
    max_chroma_qm_level: int = 15

    # --- features / tools ----------------------------------------------------
    enable_dlf_flag: int = 1             # 0 off, 1 on, 2 quality mode
    cdef_level: int = -1                 # -1 auto
    enable_restoration_filtering: int = -1
    enable_global_motion: bool = True
    # inter mode-decision search backend: "auto" picks the batched device
    # (TPU) open-loop search when an accelerator is attached and the host
    # C kernel otherwise; "device"/"native" force one
    inter_me_backend: str = "auto"
    # post-EncDec filter backend: "auto"/"host" = C/numpy kernels;
    # "device" dispatches the batched CDEF apply to the accelerator
    # (ops/filters; profitable once recon is device-resident)
    filters_backend: str = "auto"
    # residual-commit backend: "auto" runs pred/TX/quant/recon of decided
    # inter leaves as batched device programs (ops/commit.py) when an
    # accelerator is attached; "device"/"host" force one
    commit_backend: str = "auto"
    # TPL backend: the host SA8D pass is the decision-quality default;
    # "device" opts into the batched ops/tpl cost pass (A/B-gate before
    # flipping the default — the round-4 device pass cost -0.62 dB on
    # screen content), "auto" = device when an accelerator is attached
    tpl_backend: str = "host"
    # temporal-filter backend: "auto" = whole-frame device TF (ops/tf)
    # when an accelerator is attached; "host" = per-block loop
    tf_backend: str = "auto"
    enable_mfmv: int = -1
    enable_overlays: bool = False
    enable_paeth: int = -1
    enable_smooth: int = -1
    intrabc_mode: int = -1
    palette_level: int = -1
    screen_content_mode: int = 2         # 0 off 1 on 2 content-based detect
    film_grain_denoise_strength: int = 0
    film_grain_denoise_apply: bool = False
    fgs_table_path: str = ""
    enable_tf: int = 1                   # 0 off, 1 on, 2 adaptive (PSY)
    tile_columns: int = 0                # log2
    tile_rows: int = 0                   # log2
    restricted_motion_vector: bool = False

    # --- super-res / reference scaling ---------------------------------------
    superres_mode: SuperResMode = SuperResMode.NONE
    superres_denom: int = 8
    superres_kf_denom: int = 8
    superres_qthres: int = 43
    superres_kf_qthres: int = 43
    resize_mode: ResizeMode = ResizeMode.NONE
    resize_denom: int = 8
    resize_kf_denom: int = 8
    frame_scale_evts: tuple = ()

    # --- color / HDR ----------------------------------------------------------
    color_primaries: int = 2
    transfer_characteristics: int = 2
    matrix_coefficients: int = 2
    color_range: int = 0
    chroma_sample_position: int = 0
    mastering_display: str = ""
    content_light: str = ""
    hbd_mds: int = 0

    # --- bitstream level/profile ----------------------------------------------
    profile: int = 0                     # main
    tier: int = 0
    level: int = 0                       # 0 = auto

    # --- run-time / threading (host-pipeline analog of --lp/--pin/--ss) -------
    logical_processors: int = 0
    pin_threads: int = 0
    target_socket: int = -1
    level_of_parallelism: int = 0

    # --- stats / debug ---------------------------------------------------------
    stat_report: bool = False
    recon_enabled: bool = False
    progress: int = 1

    # --- TPU-specific (new; no reference analog) -------------------------------
    # (frame_parallel, tile_parallel) jax.sharding.Mesh installed at init
    # (parallel/mesh.set_encode_mesh); () = single-device default
    tpu_mesh_shape: tuple = ()

    # ------------------------------------------------------------------ derived
    @property
    def crf(self) -> float:
        return self.qp + self.crf_quarter / CRF_QUARTER_STEP

    @property
    def bit_depth(self) -> int:
        return self.input_depth


# ---------------------------------------------------------------------------
# String parameter API (svt_av1_enc_parse_parameter)
# ---------------------------------------------------------------------------

def _to_bool(v: str) -> bool:
    s = v.strip().lower()
    if s in ("1", "true", "on", "yes"):
        return True
    if s in ("0", "false", "off", "no"):
        return False
    raise ValueError(f"not a bool: {v!r}")


def _to_int(v: str) -> int:
    return int(v.strip(), 0)


def _to_float(v: str) -> float:
    return float(v.strip())


def _to_str(v: str) -> str:
    return v.strip()


def _to_uint_list(v: str) -> tuple:
    s = v.strip().strip("[]")
    if not s:
        return ()
    return tuple(int(x) for x in s.replace(",", " ").split())


def _to_crf(cfg: EncoderConfig, v: str):
    # Extended CRF: 0..70 in quarter steps (enc_settings.c:1505 str_to_crf).
    f = float(v)
    if not (0 <= f <= MAX_CRF):
        raise ValueError(f"crf out of range: {v}")
    q = round(f * CRF_QUARTER_STEP)
    cfg.qp = q // CRF_QUARTER_STEP
    cfg.crf_quarter = q % CRF_QUARTER_STEP
    cfg.rate_control_mode = RateControlMode.CRF_CQP
    cfg.enable_tpl_la = True


def _to_rc_mode(cfg: EncoderConfig, v: str):
    names = {"cqp": 0, "crf": 0, "vbr": 1, "cbr": 2}
    s = v.strip().lower()
    cfg.rate_control_mode = RateControlMode(names[s] if s in names else int(s))


def _to_tune(cfg: EncoderConfig, v: str):
    names = {"vq": 0, "psnr": 1, "ssim": 2, "iq": 3, "still": 4}
    s = v.strip().lower()
    cfg.tune = Tune(names[s] if s in names else int(s))


def _to_color_enum(table):
    def conv(cfg, v, _field=None):
        s = v.strip().lower()
        return table[s] if s in table else int(s)

    return conv


def _to_profile(cfg: EncoderConfig, v: str):
    names = {"main": 0, "high": 1, "professional": 2}
    s = v.strip().lower()
    cfg.profile = names[s] if s in names else int(s)


def _to_color_format(cfg: EncoderConfig, v: str):
    names = {"mono": 0, "400": 0, "420": 1, "422": 2, "444": 3}
    s = v.strip().lower()
    cfg.color_format = ColorFormat(names[s] if s in names else int(s))


def _to_irefresh(cfg: EncoderConfig, v: str):
    names = {"fwdkf": 1, "cra": 1, "kf": 2, "idr": 2}
    s = v.strip().lower()
    cfg.intra_refresh_type = IntraRefreshType(names[s] if s in names else int(s))


def _to_level(cfg: EncoderConfig, v: str):
    # "4.1" → 41, "0" → auto
    f = float(v)
    cfg.level = int(round(f * 10)) if f else 0


# Simple fields: token → (attr, converter)
_SIMPLE_PARAMS = {
    "w": ("width", _to_int), "width": ("width", _to_int),
    "h": ("height", _to_int), "height": ("height", _to_int),
    "forced-max-frame-width": ("forced_max_frame_width", _to_int),
    "forced-max-frame-height": ("forced_max_frame_height", _to_int),
    "input-depth": ("input_depth", _to_int),
    "fps-num": ("fps_num", _to_int),
    "fps-denom": ("fps_denom", _to_int),
    "preset": ("preset", _to_int),
    "fast-decode": ("fast_decode", _to_int),
    "avif": ("avif", _to_bool),
    "lossless": ("lossless", _to_bool),
    "intra-period": ("intra_period_length", _to_int),
    "keyint": ("intra_period_length", _to_int),
    "hierarchical-levels": ("hierarchical_levels", _to_int),
    "enable-force-key-frames": ("force_key_frames", _to_bool),
    "sframe-dist": ("sframe_dist", _to_int),
    "startup-mg-size": ("startup_mg_size", _to_int),
    "startup-qp-offset": ("startup_qp_offset", _to_int),
    "enable-dg": ("enable_dg", _to_bool),
    "qp": ("qp", _to_int), "q": ("qp", _to_int),
    "tbr": ("target_bit_rate", _to_int),
    "target-bit-rate": ("target_bit_rate", _to_int),
    "mbr": ("max_bit_rate", _to_int),
    "max-bit-rate": ("max_bit_rate", _to_int),
    "min-qp": ("min_qp_allowed", _to_int),
    "max-qp": ("max_qp_allowed", _to_int),
    "use-fixed-qindex-offsets": ("use_fixed_qindex_offsets", _to_int),
    "qindex-offsets": ("qindex_offsets", _to_uint_list),
    "key-frame-qindex-offset": ("key_frame_qindex_offset", _to_int),
    "key-frame-chroma-qindex-offset": ("key_frame_chroma_qindex_offset", _to_int),
    "chroma-qindex-offsets": ("chroma_qindex_offsets", _to_uint_list),
    "luma-y-dc-qindex-offset": ("luma_y_dc_qindex_offset", _to_int),
    "chroma-u-dc-qindex-offset": ("chroma_u_dc_qindex_offset", _to_int),
    "chroma-u-ac-qindex-offset": ("chroma_u_ac_qindex_offset", _to_int),
    "chroma-v-dc-qindex-offset": ("chroma_v_dc_qindex_offset", _to_int),
    "chroma-v-ac-qindex-offset": ("chroma_v_ac_qindex_offset", _to_int),
    "undershoot-pct": ("undershoot_pct", _to_int),
    "overshoot-pct": ("overshoot_pct", _to_int),
    "mbr-overshoot-pct": ("mbr_overshoot_pct", _to_int),
    "buf-initial-sz": ("buf_initial_sz", _to_int),
    "buf-optimal-sz": ("buf_optimal_sz", _to_int),
    "buf-sz": ("buf_sz", _to_int),
    "minsection-pct": ("minsection_pct", _to_int),
    "maxsection-pct": ("maxsection_pct", _to_int),
    "recode-loop": ("recode_loop", _to_int),
    "gop-constraint-rc": ("gop_constraint_rc", _to_bool),
    "scd": ("scene_change_detection", _to_bool),
    "lookahead": ("look_ahead_distance", _to_int),
    "enable-tpl-la": ("enable_tpl_la", _to_bool),
    "aq-mode": ("aq_mode", _to_int),
    "pass": ("pass_num", _to_int),
    "stats": ("stats_file", _to_str),
    "enable-variance-boost": ("enable_variance_boost", _to_bool),
    "variance-boost-strength": ("variance_boost_strength", _to_int),
    "variance-octile": ("variance_octile", _to_int),
    "psy-rd": ("psy_rd", _to_float),
    "spy-rd": ("spy_rd", _to_int),
    "luminance-qp-bias": ("luminance_qp_bias", _to_int),
    "frame-luma-bias": ("luminance_qp_bias", _to_int),
    "sharp-tx": ("sharp_tx", _to_bool),
    "sharpness": ("sharpness", _to_int),
    "qp-scale-compress-strength": ("qp_scale_compress_strength", _to_float),
    "max-32-tx-size": ("max_32_tx_size", _to_bool),
    "noise-norm-strength": ("noise_norm_strength", _to_int),
    "tf-strength": ("tf_strength", _to_int),
    "kf-tf-strength": ("kf_tf_strength", _to_int),
    "enable-qm": ("enable_qm", _to_bool),
    "qm-min": ("min_qm_level", _to_int),
    "qm-max": ("max_qm_level", _to_int),
    "chroma-qm-min": ("min_chroma_qm_level", _to_int),
    "chroma-qm-max": ("max_chroma_qm_level", _to_int),
    "enable-dlf": ("enable_dlf_flag", _to_int),
    "enable-cdef": ("cdef_level", _to_int),
    "enable-restoration": ("enable_restoration_filtering", _to_int),
    "enable-global-motion": ("enable_global_motion", _to_bool),
    "inter-me-backend": ("inter_me_backend", str),
    "filters-backend": ("filters_backend", str),
    "commit-backend": ("commit_backend", str),
    "tpl-backend": ("tpl_backend", str),
    "tf-backend": ("tf_backend", str),
    "enable-mfmv": ("enable_mfmv", _to_int),
    "enable-overlays": ("enable_overlays", _to_bool),
    "scm": ("screen_content_mode", _to_int),
    "film-grain": ("film_grain_denoise_strength", _to_int),
    "film-grain-denoise": ("film_grain_denoise_apply", _to_bool),
    "fgs-table": ("fgs_table_path", _to_str),
    "enable-tf": ("enable_tf", _to_int),
    "tile-columns": ("tile_columns", _to_int),
    "tile-rows": ("tile_rows", _to_int),
    "restricted-motion-vector": ("restricted_motion_vector", _to_bool),
    "superres-denom": ("superres_denom", _to_int),
    "superres-kf-denom": ("superres_kf_denom", _to_int),
    "superres-qthres": ("superres_qthres", _to_int),
    "superres-kf-qthres": ("superres_kf_qthres", _to_int),
    "resize-denom": ("resize_denom", _to_int),
    "resize-kf-denom": ("resize_kf_denom", _to_int),
    "mastering-display": ("mastering_display", _to_str),
    "content-light": ("content_light", _to_str),
    "hbd-mds": ("hbd_mds", _to_int),
    "tier": ("tier", _to_int),
    "lp": ("logical_processors", _to_int),
    "pin": ("pin_threads", _to_int),
    "ss": ("target_socket", _to_int),
    "enable-stat-report": ("stat_report", _to_bool),
    "recon": ("recon_enabled", _to_bool),
    "progress": ("progress", _to_int),
}

# Complex fields: token → fn(cfg, value)
_COMPLEX_PARAMS = {
    "crf": _to_crf,
    "rc": _to_rc_mode,
    "tune": _to_tune,
    "profile": _to_profile,
    "color-format": _to_color_format,
    "irefresh-type": _to_irefresh,
    "level": _to_level,
}

# Enum-named fields
_ENUM_PARAMS = {
    "color-primaries": ("color_primaries", COLOR_PRIMARIES),
    "transfer-characteristics": ("transfer_characteristics", TRANSFER_CHARACTERISTICS),
    "matrix-coefficients": ("matrix_coefficients", MATRIX_COEFFICIENTS),
    "color-range": ("color_range", COLOR_RANGE),
    "chroma-sample-position": ("chroma_sample_position", CHROMA_SAMPLE_POSITION),
}

_INT_ENUM_FIELDS = {
    "pred-struct": ("pred_structure", PredStructure),
    "superres-mode": ("superres_mode", SuperResMode),
    "resize-mode": ("resize_mode", ResizeMode),
    "sframe-mode": ("sframe_mode", SFrameMode),
    "variance-boost-curve": ("variance_boost_curve", VarianceBoostCurve),
}


def parameter_names() -> list:
    """All accepted parameter tokens (for --help and API tests)."""
    names = set(_SIMPLE_PARAMS) | set(_COMPLEX_PARAMS) | set(_ENUM_PARAMS) | set(_INT_ENUM_FIELDS)
    return sorted(names)


def parse_parameter(cfg: EncoderConfig, name: str, value: str) -> EncoderConfig:
    """Set one parameter by CLI-token name. Raises SvtAv1Error(BAD_PARAMETER)."""
    name = name.strip().lstrip("-")
    try:
        if name in _SIMPLE_PARAMS:
            attr, conv = _SIMPLE_PARAMS[name]
            setattr(cfg, attr, conv(value))
        elif name in _COMPLEX_PARAMS:
            _COMPLEX_PARAMS[name](cfg, value)
        elif name in _ENUM_PARAMS:
            attr, table = _ENUM_PARAMS[name]
            s = value.strip().lower()
            setattr(cfg, attr, table[s] if s in table else int(s))
        elif name in _INT_ENUM_FIELDS:
            attr, etype = _INT_ENUM_FIELDS[name]
            setattr(cfg, attr, etype(int(value)))
        else:
            raise SvtAv1Error(ErrorCode.ERROR_BAD_PARAMETER, f"unknown parameter {name!r}")
    except SvtAv1Error:
        raise
    except Exception as e:
        raise SvtAv1Error(ErrorCode.ERROR_BAD_PARAMETER, f"{name}={value!r}: {e}") from e
    return cfg


# ---------------------------------------------------------------------------
# Validation (svt_av1_verify_settings, enc_settings.c:40)
# ---------------------------------------------------------------------------

def _check(ok: bool, msg: str):
    if not ok:
        raise SvtAv1Error(ErrorCode.ERROR_BAD_PARAMETER, msg)


def verify_settings(cfg: EncoderConfig) -> EncoderConfig:
    """Validate and normalize. Mirrors svt_av1_verify_settings; PSY relaxations:
    width/height >= 4 and odd dimensions allowed (README_old.md)."""
    _check(4 <= cfg.width <= 16384, f"width {cfg.width} out of range [4, 16384]")
    _check(4 <= cfg.height <= 16384, f"height {cfg.height} out of range [4, 16384]")
    _check(cfg.input_depth in (8, 10), f"input depth {cfg.input_depth} not in (8, 10)")
    _check(MIN_PRESET <= cfg.preset <= MAX_PRESET,
           f"preset {cfg.preset} out of range [{MIN_PRESET}, {MAX_PRESET}]")
    # honest rejection of accepted-but-unimplemented features (the
    # reference's verify-settings contract, enc_settings.c:40): silently
    # swallowing these would misreport parity
    _check(0 <= cfg.luminance_qp_bias <= 100,
           "luminance-qp-bias out of range [0, 100]")
    if cfg.lossless:
        # lossless = qindex-0 WHT-4x4 all-intra coding (EbSvtAv1Enc.h:940);
        # rate-controlled / inter / scaled / grained sessions cannot be
        # CodedLossless (spec coded_lossless requires qindex 0 everywhere)
        _check(cfg.rate_control_mode in (0, RateControlMode.CRF_CQP),
               "lossless requires CRF/CQP mode")
        _check(cfg.avif or cfg.intra_period_length in (-1, 0),
               "lossless requires intra-only (--keyint 0)")
        _check(int(cfg.superres_mode) == 0,
               "lossless cannot combine with super-resolution")
        _check(not cfg.film_grain_denoise_strength,
               "lossless cannot combine with film-grain denoising")
    _check(-1 <= cfg.palette_level <= 6, "palette_level out of range [-1, 6]")
    _check(-1 <= cfg.intrabc_mode <= 3, "intrabc_mode out of range [-1, 3]")
    _check(int(cfg.superres_mode) in (0, 1, 2, 3, 4),
           "superres_mode out of range [0, 4]")
    if int(cfg.superres_mode) == 1:
        _check(8 <= cfg.superres_kf_denom <= 16,
               "superres-kf-denom out of range [8, 16]")
        _check(8 <= cfg.superres_denom <= 16,
               "superres-denom out of range [8, 16]")
    _check(0 <= cfg.qp <= MAX_CRF, f"qp/crf {cfg.qp} out of range [0, {MAX_CRF}]")
    _check(cfg.rate_control_mode in (0, 1, 2), "bad rc mode")
    cfg.rate_control_mode = RateControlMode(int(cfg.rate_control_mode))
    if cfg.rate_control_mode != 0:
        _check(cfg.target_bit_rate > 0, "VBR/CBR require target-bit-rate > 0")
    _check(int(cfg.tune) in (0, 1, 2, 3, 4), "bad tune")
    _check(cfg.fps_num > 0 and cfg.fps_denom > 0, "bad frame rate")
    _check(cfg.color_format in (ColorFormat.YUV420, ColorFormat.YUV400),
           "only 4:2:0 / 4:0:0 supported (matches reference encoder profile 0)")
    _check(1 <= cfg.variance_boost_strength <= 4, "variance-boost-strength in [1,4]")
    _check(1 <= cfg.variance_octile <= 8, "variance-octile in [1,8]")
    _check(0.0 <= cfg.psy_rd <= 6.0, "psy-rd in [0,6]")
    _check(0 <= cfg.spy_rd <= 2, "spy-rd in [0,2]")
    _check(-7 <= cfg.sharpness <= 7, "sharpness in [-7,7]")
    _check(0.0 <= cfg.qp_scale_compress_strength <= 3.0, "qp-scale-compress in [0,3]")
    _check(0 <= cfg.noise_norm_strength <= 4, "noise-norm-strength in [0,4]")
    _check(0 <= cfg.tile_columns <= 4 and 0 <= cfg.tile_rows <= 4, "tile log2 in [0,4]")
    _check(cfg.aq_mode in (0, 1, 2), "aq-mode in [0,2]")
    for nm in ("min_qm_level", "max_qm_level", "min_chroma_qm_level", "max_chroma_qm_level"):
        _check(0 <= getattr(cfg, nm) <= 15, f"{nm} in [0,15]")
    _check(cfg.min_qm_level <= cfg.max_qm_level, "qm-min must be <= qm-max")
    _check(cfg.min_chroma_qm_level <= cfg.max_chroma_qm_level,
           "chroma-qm-min must be <= chroma-qm-max")
    _check(0 <= cfg.luminance_qp_bias <= 100, "frame-luma-bias in [0,100]")
    _check(cfg.min_qp_allowed >= 1 and cfg.max_qp_allowed <= 63
           and cfg.min_qp_allowed <= cfg.max_qp_allowed, "bad qp bounds")
    _check(0 <= cfg.tf_strength <= 4 and 0 <= cfg.kf_tf_strength <= 4,
           "tf-strength in [0,4]")
    if cfg.avif:
        # AVIF is a single-picture mode (enc_handle.c:5453 guard).
        _check(cfg.intra_period_length in (-1, -2, 0), "avif requires intra-only")
    if cfg.hierarchical_levels == 0:
        cfg.hierarchical_levels = _default_hierarchical_levels(cfg)
    _check(2 <= cfg.hierarchical_levels <= 5, "hierarchical-levels in [2,5]")
    for nm in ("tpl_backend", "tf_backend", "inter_me_backend",
               "filters_backend", "commit_backend"):
        ok = ("auto", "host", "device", "native")
        _check(getattr(cfg, nm) in ok, f"{nm} must be one of {ok}")
    # honest rejections (enc_settings.c:40 contract): features the encoder
    # does not implement must error, not silently no-op
    _check(cfg.sframe_dist == 0, "S-frames (sframe-dist) not implemented")
    _check(cfg.sframe_mode in (SFrameMode.STRICT_BASE,
                               SFrameMode.NEAREST_BASE), "bad sframe-mode")
    _check(not cfg.enable_overlays, "ALTREF overlay frames not implemented")
    _check(cfg.intra_refresh_type == IntraRefreshType.KF,
           "open-GOP forward key frames (irefresh-type 1) not implemented")
    _check(cfg.hbd_mds == 0, "reduced-precision HBD mode decision "
           "(hbd-mds != 0) not implemented")
    _check(not cfg.gop_constraint_rc,
           "gop-constraint-rc not implemented (VBR converges per-sequence)")
    _check(cfg.fast_decode in (0, 1, 2), "fast-decode in [0,2]")
    _check(cfg.enable_adaptive_quantization in (0, 1, 2),
           "adaptive-quantization in [0,2]")
    if cfg.enable_adaptive_quantization != 2:
        # --enable-adaptive-quantization is the reference's public alias
        # for the AQ mode (enc_settings.c enable_adaptive_quantization ->
        # aq_mode); non-default values override aq_mode
        cfg.aq_mode = cfg.enable_adaptive_quantization
    if cfg.max_bit_rate:
        _check(cfg.rate_control_mode == 0,
               "max-bit-rate (capped CRF) applies to CRF mode only")
        _check(cfg.max_bit_rate > 0, "max-bit-rate must be positive")
    _check(not (cfg.restricted_motion_vector
                and (cfg.tile_columns or cfg.tile_rows)),
           "restricted-motion-vector with multiple tiles not implemented "
           "(single-tile streams satisfy the tile-MV restriction trivially)")
    if cfg.look_ahead_distance < 0:
        # auto lookahead (enc_settings.c:970 + the later-derived window):
        # TF and TPL need future source frames; resolve to one mini-GoP
        # (+1 so the TF window reaches past the GoP top). Low-delay and
        # still-picture paths take no lookahead, matching the reference.
        if ((cfg.enable_tf or cfg.enable_tpl_la) and not cfg.avif
                and cfg.pred_structure != PredStructure.LOW_DELAY
                and cfg.intra_period_length != 0):
            cfg.look_ahead_distance = min(
                33, (1 << cfg.hierarchical_levels) + 1)
        else:
            cfg.look_ahead_distance = 0
    return cfg


def _default_hierarchical_levels(cfg: EncoderConfig) -> int:
    # Reference auto policy: 5 for most presets, fewer for fast presets.
    if cfg.pred_structure == PredStructure.LOW_DELAY:
        return 2
    return 5 if cfg.preset <= 12 else 4


def copy_config(cfg: EncoderConfig) -> EncoderConfig:
    return dataclasses.replace(cfg)
