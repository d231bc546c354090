"""Multi-tile, 10-bit, and stat-report tests."""

import numpy as np
import pytest

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.config import EncoderConfig
from svt_av1_psy_tpu.io import dav1d

requires_dav1d = pytest.mark.skipif(not dav1d.available(), reason="dav1d shim unavailable")


def _content(W, H, bd=8, seed=0):
    rng = np.random.default_rng(seed)
    peak = (1 << bd) - 1
    dt = np.uint8 if bd == 8 else np.uint16
    y = (np.cumsum(rng.normal(0, peak / 50, (H, W)), axis=1) + peak // 2).clip(0, peak).astype(dt)
    u = rng.integers(peak // 3, 2 * peak // 3, (H // 2, W // 2)).astype(dt)
    return y, u, u.copy()


@requires_dav1d
@pytest.mark.parametrize("tc,tr", [(1, 0), (1, 1), (2, 1)])
def test_multi_tile_conformance(tc, tr):
    W, H = 256, 192
    y, u, v = _content(W, H)
    cfg = EncoderConfig(width=W, height=H, recon_enabled=True,
                        tile_columns=tc, tile_rows=tr, enable_variance_boost=False)
    cfg.qp = 35
    enc = Encoder(cfg).init()
    enc.send_picture(y, u, v)
    pkt = enc.get_packet()
    dy, du, dv = dav1d.decode(pkt.data, W, H)
    ry, ru, rv = enc.get_recon()
    assert np.array_equal(dy, ry) and np.array_equal(du, ru) and np.array_equal(dv, rv)


@requires_dav1d
def test_10bit_conformance():
    W, H = 128, 96
    y, u, v = _content(W, H, bd=10)
    cfg = EncoderConfig(width=W, height=H, input_depth=10, recon_enabled=True)
    cfg.qp = 35
    enc = Encoder(cfg).init()
    enc.send_picture(y, u, v)
    pkt = enc.get_packet()
    dy, du, dv = dav1d.decode(pkt.data, W, H)
    assert dy.dtype == np.uint16
    ry, ru, rv = enc.get_recon()
    assert np.array_equal(dy, ry) and np.array_equal(du, ru)


@requires_dav1d
def test_10bit_variance_boost():
    W = H = 128
    y, u, v = _content(W, H, bd=10, seed=3)
    cfg = EncoderConfig(width=W, height=H, input_depth=10, recon_enabled=True,
                        enable_variance_boost=True)
    cfg.qp = 40
    enc = Encoder(cfg).init()
    enc.send_picture(y, u, v)
    pkt = enc.get_packet()
    dy, _, _ = dav1d.decode(pkt.data, W, H)
    assert np.array_equal(dy, enc.get_recon()[0])


def test_stat_report():
    from svt_av1_psy_tpu.codec.metrics import psnr, ssim

    W, H = 96, 64
    y, u, v = _content(W, H, seed=1)
    cfg = EncoderConfig(width=W, height=H, stat_report=True)
    cfg.qp = 30
    enc = Encoder(cfg).init()
    enc.send_picture(y, u, v)
    pkt = enc.get_packet()
    assert pkt.stats is not None
    assert 20 < pkt.stats["psnr_y"] < 100
    assert 0.5 < pkt.stats["ssim_y"] <= 1.0
    # identical planes -> max metrics
    assert psnr(y, y) == 100.0
    assert ssim(y, y) > 0.9999
