"""Film grain: header syntax + normative synthesis vs dav1d's grained output."""

import copy

import numpy as np
import pytest

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.codec.film_grain import (FilmGrainParams, apply_film_grain,
                                              parse_fgs_table, photon_noise_params)
from svt_av1_psy_tpu.config import EncoderConfig
from svt_av1_psy_tpu.io import dav1d

requires_dav1d = pytest.mark.skipif(not dav1d.available(), reason="dav1d shim unavailable")

# fgs table exercising AR lag 2, chroma points, and mults (filmgrn1 format)
FGS_TABLE = """filmgrn1
E 0 9223372036854775807 1 7391 1
\tp 2 7 0 8 0 1 128 192 256 128 192 256
\tsY 5 0 20 64 24 128 26 192 28 255 30
\tsCb 3 0 10 128 12 255 14
\tsCr 3 0 8 128 10 255 12
\tcY 4 -2 6 -1 0 8 -3 2 10 1 -4 12
\tcCb 0 1 -2 3 -1 2 0 4 -3 1 2 -1 5
\tcCr 1 0 -1 2 3 -2 1 0 -4 2 -1 3 1
"""


def _encode_grain(W, H, n=2, bd=8, strength=8, fgs_text=None, seed=4, q=40,
                  clip=False, tmp_path=None):
    rng = np.random.default_rng(seed)
    peak = (1 << bd) - 1
    dt = np.uint8 if bd == 8 else np.uint16
    base = (np.cumsum(rng.normal(0, peak / 60, (H + 32, W + 32)), axis=1)
            + peak // 2).clip(0, peak).astype(dt)
    kw = dict(width=W, height=H, input_depth=bd, recon_enabled=True)
    if fgs_text is not None:
        p = tmp_path / "grain.tbl"
        p.write_text(fgs_text)
        kw["fgs_table_path"] = str(p)
    else:
        kw["film_grain_denoise_strength"] = strength
    cfg = EncoderConfig(**kw)
    cfg.qp = q
    enc = Encoder(cfg).init()
    if clip:
        # pin the photon-noise profile (estimation would otherwise fit the
        # source at the first frame) and exercise the clip syntax path
        from svt_av1_psy_tpu.codec.film_grain import photon_noise_params

        enc._film_grain = photon_noise_params(strength, bd)
        enc._fg_estimate_pending = False
        enc._film_grain.clip_to_restricted_range = 1
    for i in range(n):
        y = base[2 * i : 2 * i + H, 3 * i : 3 * i + W].copy()
        u = np.full(((H + 1) // 2, (W + 1) // 2), peak // 2 - 12, dt)
        enc.send_picture(y, u, u.copy())
    enc.flush()
    stream = b""
    recons = []
    while (pkt := enc.get_packet()) is not None:
        stream += pkt.data
        if pkt.recon is not None:
            recons.append(pkt.recon)
    return enc, stream, recons


def _check_grain(enc, stream, recons, W, H, bd=8):
    for i in range(len(recons)):
        dy, du, dv = dav1d.decode_nth(stream, i, W, H)
        fgp = copy.copy(enc._film_grain)
        fgp.random_seed = (fgp.random_seed + 3248 * i) & 0xFFFF
        gy, gu, gv = apply_film_grain(fgp, recons[i][0], recons[i][1],
                                      recons[i][2], bd)
        assert not np.array_equal(dy, recons[i][0]), "grain had no effect"
        assert np.array_equal(dy, gy), f"frame {i} luma grain mismatch"
        assert np.array_equal(du, gu), f"frame {i} U grain mismatch"
        assert np.array_equal(dv, gv), f"frame {i} V grain mismatch"


@requires_dav1d
def test_photon_noise_grain_conformant():
    enc, stream, recons = _encode_grain(128, 96)
    _check_grain(enc, stream, recons, 128, 96)


@requires_dav1d
def test_photon_noise_grain_odd_dims():
    enc, stream, recons = _encode_grain(106, 74, n=1)
    _check_grain(enc, stream, recons, 106, 74)


@requires_dav1d
def test_photon_noise_grain_10bit():
    enc, stream, recons = _encode_grain(96, 64, n=1, bd=10)
    _check_grain(enc, stream, recons, 96, 64, bd=10)


@requires_dav1d
def test_fgs_table_ar_chroma_conformant(tmp_path):
    enc, stream, recons = _encode_grain(128, 96, n=2, fgs_text=FGS_TABLE,
                                        tmp_path=tmp_path)
    assert enc._film_grain.ar_coeff_lag == 2
    assert enc._film_grain.num_cb_points == 3
    _check_grain(enc, stream, recons, 128, 96)


@requires_dav1d
def test_grain_clip_restricted_range():
    enc, stream, recons = _encode_grain(96, 64, n=1, clip=True)
    _check_grain(enc, stream, recons, 96, 64)


def test_parse_fgs_table_fields():
    entries = parse_fgs_table(FGS_TABLE)
    assert len(entries) == 1
    start, end, fg = entries[0]
    assert (start, end) == (0, 9223372036854775807)
    assert fg.random_seed == 7391 and fg.ar_coeff_lag == 2
    assert fg.scaling_points_y[0] == (0, 20) and fg.num_y_points == 5
    assert len(fg.ar_coeffs_y) == 12 and len(fg.ar_coeffs_cb) == 13


def test_photon_noise_params_shape():
    fg = photon_noise_params(10)
    assert 1 <= fg.num_y_points <= 14
    xs = [p[0] for p in fg.scaling_points_y]
    assert xs == sorted(xs) and xs[0] == 0 and xs[-1] == 255
    # monotone non-decreasing noise with luma
    ys = [p[1] for p in fg.scaling_points_y]
    assert all(b >= a for a, b in zip(ys, ys[1:]))


def test_grain_deterministic():
    fg = FilmGrainParams(scaling_points_y=[(0, 8), (255, 12)])
    y = np.full((64, 64), 100, np.uint8)
    a = apply_film_grain(fg, y, None, None, 8)[0]
    b = apply_film_grain(fg, y, None, None, 8)[0]
    assert np.array_equal(a, b) and not np.array_equal(a, y)


@requires_dav1d
def test_film_grain_estimation_e2e():
    """--film-grain N with no fgs-table: the noise model fits grain params
    from the source; the stream must decode bit-exactly (grain synthesis is
    part of the conformance check) and carry a grain-param payload."""
    from svt_av1_psy_tpu.codec.film_grain import FilmGrainParams, apply_film_grain

    rng = np.random.default_rng(2)
    W, H = 192, 128
    yy, xx = np.mgrid[0:H, 0:W]
    clean = ((xx * 0.5 + yy * 0.25) % 190 + 30).astype(np.uint8)
    tr = FilmGrainParams(random_seed=99)
    tr.scaling_points_y = [(0, 56), (255, 56)]
    tr.ar_coeff_lag = 2
    tr.ar_coeffs_y = [3, -2, 7, 2, 11, 5, -2, 16, 4, 2, 12, 3]
    tr.ar_coeff_shift = 7
    u = np.full((H // 2, W // 2), 119, np.uint8)
    gy, gu, gv = apply_film_grain(tr, clean, u, u.copy())

    cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, recon_enabled=True,
                        film_grain_denoise_strength=8)
    cfg.qp = 40
    enc = Encoder(cfg).init()
    enc.send_picture(gy.astype(np.uint8), gu.astype(np.uint8),
                     gv.astype(np.uint8))
    pkt = enc.get_packet()
    assert enc._film_grain is not None and enc._film_grain.num_y_points > 0
    # dav1d output (WITH grain) must match recon + our normative synthesis
    dy, du, dv = dav1d.decode(pkt.data, W, H)
    ry, ru, rv = enc.get_recon()
    fy, fu, fv = apply_film_grain(enc._film_grain, ry, ru, rv)
    assert np.array_equal(dy, fy)
    assert np.array_equal(du, fu)
    assert np.array_equal(dv, fv)
    # the synthesized grain level should resemble the source's
    src_sigma = float((gy.astype(float) - clean.astype(float)).std())
    out_sigma = float((dy.astype(float) - ry.astype(float)).std())
    assert 0.4 * src_sigma < out_sigma < 2.0 * src_sigma


@requires_dav1d
def test_film_grain_denoise_apply():
    """--film-grain-denoise 1: the encoder codes the denoised source, so
    the recon should sit closer to the clean plate than the grainy input."""
    from svt_av1_psy_tpu.codec.film_grain import FilmGrainParams, apply_film_grain

    W, H = 192, 128
    yy, xx = np.mgrid[0:H, 0:W]
    clean = ((xx * 0.5 + yy * 0.25) % 190 + 30).astype(np.uint8)
    tr = FilmGrainParams(random_seed=99)
    tr.scaling_points_y = [(0, 56), (255, 56)]
    tr.ar_coeff_lag = 2
    tr.ar_coeffs_y = [3, -2, 7, 2, 11, 5, -2, 16, 4, 2, 12, 3]
    tr.ar_coeff_shift = 7
    u = np.full((H // 2, W // 2), 119, np.uint8)
    gy, gu, gv = apply_film_grain(tr, clean, u, u.copy())

    def encode(apply_dn):
        cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, recon_enabled=True,
                            film_grain_denoise_strength=8,
                            film_grain_denoise_apply=apply_dn)
        cfg.qp = 30
        enc = Encoder(cfg).init()
        enc.send_picture(gy.astype(np.uint8).copy(), gu.astype(np.uint8),
                         gv.astype(np.uint8))
        pkt = enc.get_packet()
        ry = enc.get_recon()[0]
        dy, _, _ = dav1d.decode(pkt.data, W, H)  # stream stays conformant
        from svt_av1_psy_tpu.codec.film_grain import apply_film_grain as ag
        assert np.array_equal(dy, ag(enc._film_grain, *enc.get_recon())[0])
        return float(np.abs(ry.astype(float) - clean.astype(float)).mean())

    err_plain = encode(False)
    err_dn = encode(True)
    assert err_dn < err_plain * 0.75, (err_dn, err_plain)
