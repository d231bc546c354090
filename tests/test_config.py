"""Config system tests (analog of test/api_test/SvtAv1EncParamsTest.cc)."""

import pytest

from svt_av1_psy_tpu.config import (
    EncoderConfig,
    RateControlMode,
    Tune,
    parameter_names,
    parse_parameter,
    verify_settings,
)
from svt_av1_psy_tpu.errors import SvtAv1Error


def test_psy_defaults():
    cfg = EncoderConfig()
    # PSY fork defaults (enc_settings.c:936 + README_old.md:116-131)
    assert cfg.tune == Tune.SSIM
    assert cfg.enable_variance_boost is True
    assert cfg.variance_boost_strength == 2
    assert cfg.sharpness == 1
    assert cfg.psy_rd == 0.5
    assert cfg.sharp_tx is True
    assert cfg.enable_qm is True
    assert cfg.min_qm_level == 2


def test_parse_simple():
    cfg = EncoderConfig()
    parse_parameter(cfg, "width", "1920")
    parse_parameter(cfg, "height", "1080")
    parse_parameter(cfg, "preset", "6")
    parse_parameter(cfg, "psy-rd", "1.5")
    assert (cfg.width, cfg.height, cfg.preset, cfg.psy_rd) == (1920, 1080, 6, 1.5)


def test_parse_extended_crf_quarter_steps():
    cfg = EncoderConfig()
    parse_parameter(cfg, "crf", "27.25")
    assert cfg.qp == 27 and cfg.crf_quarter == 1
    assert cfg.crf == 27.25
    assert cfg.rate_control_mode == RateControlMode.CRF_CQP
    parse_parameter(cfg, "crf", "70")
    assert cfg.qp == 70
    with pytest.raises(SvtAv1Error):
        parse_parameter(cfg, "crf", "71")


def test_parse_named_enums():
    cfg = EncoderConfig()
    parse_parameter(cfg, "tune", "3")
    assert cfg.tune == Tune.SUBJECTIVE_SSIM
    parse_parameter(cfg, "color-primaries", "bt2020")
    assert cfg.color_primaries == 9
    parse_parameter(cfg, "matrix-coefficients", "bt2020-ncl")
    assert cfg.matrix_coefficients == 9
    parse_parameter(cfg, "rc", "cbr")
    assert cfg.rate_control_mode == RateControlMode.CBR


def test_unknown_parameter_rejected():
    with pytest.raises(SvtAv1Error):
        parse_parameter(EncoderConfig(), "not-a-param", "1")


def test_verify_rejects_bad():
    cfg = EncoderConfig(width=1920, height=1080)
    verify_settings(cfg)  # ok
    with pytest.raises(SvtAv1Error):
        verify_settings(EncoderConfig(width=2, height=1080))
    with pytest.raises(SvtAv1Error):
        verify_settings(EncoderConfig(width=1920, height=1080, preset=14))
    with pytest.raises(SvtAv1Error):
        verify_settings(EncoderConfig(width=1920, height=1080, variance_octile=9))


def test_verify_psy_relaxed_dimensions():
    # PSY allows odd and tiny (>=4) dimensions (README_old.md).
    verify_settings(EncoderConfig(width=5, height=7))
    verify_settings(EncoderConfig(width=4, height=4))


def test_parameter_surface_has_psy_tokens():
    names = parameter_names()
    for tok in [
        "psy-rd", "spy-rd", "sharp-tx", "sharpness", "variance-boost-strength",
        "variance-octile", "variance-boost-curve", "qp-scale-compress-strength",
        "noise-norm-strength", "max-32-tx-size", "tf-strength", "kf-tf-strength",
        "chroma-qm-min", "chroma-qm-max", "fgs-table", "avif", "lossless",
    ]:
        assert tok in names, tok
