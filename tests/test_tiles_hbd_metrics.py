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
    cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, recon_enabled=True,
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
    cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, input_depth=10, recon_enabled=True)
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
    cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, input_depth=10, recon_enabled=True,
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
    cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, stat_report=True)
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


def test_native_metrics_match_numpy():
    """The C ssim/psnr kernels must match the numpy formulation exactly."""
    from svt_av1_psy_tpu.codec import mc_native
    from svt_av1_psy_tpu.codec.metrics import psnr, ssim

    rng = np.random.default_rng(7)
    for bd in (8, 10):
        hi = (1 << bd) - 1
        a = rng.integers(0, hi + 1, (72, 120)).astype(np.uint16)
        b = np.clip(a.astype(np.int32) + rng.integers(-9, 10, a.shape),
                    0, hi).astype(np.uint16)
        peak = hi
        c1, c2 = (0.01 * peak) ** 2, (0.03 * peak) ** 2
        got = mc_native.ssim_grid(a, b, c1, c2)
        if got is None:
            return  # no toolchain; numpy path is the only tier
        # numpy reference (integral-image form from metrics.ssim fallback)
        aa, bb = a.astype(np.float64), b.astype(np.float64)

        def box8(x):
            cp = np.zeros((x.shape[0] + 1, x.shape[1] + 1), np.float64)
            np.cumsum(np.cumsum(x, axis=0), axis=1, out=cp[1:, 1:])
            i = np.arange(0, x.shape[0] - 7, 4)
            j = np.arange(0, x.shape[1] - 7, 4)
            return (cp[np.ix_(i + 8, j + 8)] - cp[np.ix_(i, j + 8)]
                    - cp[np.ix_(i + 8, j)] + cp[np.ix_(i, j)]) / 64.0

        mu_a, mu_b = box8(aa), box8(bb)
        va = box8(aa * aa) - mu_a * mu_a
        vb = box8(bb * bb) - mu_b * mu_b
        cov = box8(aa * bb) - mu_a * mu_b
        want = float((((2 * mu_a * mu_b + c1) * (2 * cov + c2))
                      / ((mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2))).mean())
        assert abs(got - want) < 1e-9
        sse = mc_native.plane_sse(a, b)
        assert sse == float(np.sum((a.astype(np.int64) - b.astype(np.int64)) ** 2))
        assert abs(psnr(a, b, bd)
                   - 10 * np.log10(peak * peak / (sse / a.size))) < 1e-12
