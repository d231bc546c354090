"""Variance boost (PSY) tests: math sanity + conformance with delta-q."""

import numpy as np
import pytest

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.config import EncoderConfig
from svt_av1_psy_tpu.io import dav1d
from svt_av1_psy_tpu.psy.variance_boost import (
    deltaq_sb_variance_boost,
    sb_variances_8x8,
    variance_adjust_qp,
)

requires_dav1d = pytest.mark.skipif(not dav1d.available(), reason="dav1d shim unavailable")


def test_variance_stat():
    rng = np.random.default_rng(0)
    flat = np.full((64, 64), 100, np.uint8)
    noisy = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    vf = sb_variances_8x8(flat)
    vn = sb_variances_8x8(noisy)
    assert vf.shape == (1, 1, 64)
    assert vf.max() == 0
    assert vn.min() > 1000  # uniform noise variance ~5461


def test_boost_monotone_in_variance():
    # lower variance -> bigger boost (qindex decrease)
    boosts = []
    for var in (1, 4, 16, 64, 256):
        v = np.full(64, var, np.uint16)
        boosts.append(deltaq_sb_variance_boost(160, v, strength=2))
    assert all(boosts[i] >= boosts[i + 1] for i in range(len(boosts) - 1))
    assert boosts[0] > 0 and boosts[-1] == 0


def test_adjust_qp_snaps_to_res():
    rng = np.random.default_rng(1)
    variances = rng.integers(0, 500, (3, 4, 64)).astype(np.uint16)
    base, qmap = variance_adjust_qp(140, variances, strength=2)
    assert qmap.shape == (3, 4)
    assert np.all((qmap - base) % 4 == 0)
    assert np.all(qmap >= 1) and np.all(qmap <= 255)


@requires_dav1d
def test_delta_q_stream_conformant():
    """Mixed-variance frame with variance boost: decodes + recon matches."""
    rng = np.random.default_rng(2)
    W = H = 128
    y = np.full((H, W), 60, np.uint8)
    y[:, :64] = rng.integers(0, 256, (H, 64)).astype(np.uint8)   # noisy left half
    y[64:, 64:] = 60 + (np.arange(64) // 8).astype(np.uint8)      # gentle gradient
    u = np.full((64, 64), 128, np.uint8)
    cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, recon_enabled=True,
                        enable_variance_boost=True, variance_boost_strength=3)
    cfg.qp = 40  # crf 40 -> qindex 160
    enc = Encoder(cfg).init()
    enc.send_picture(y, u, u.copy())
    pkt = enc.get_packet()
    dy, du, dv = dav1d.decode(pkt.data, W, H)
    ry, ru, rv = enc.get_recon()
    assert np.array_equal(dy, ry) and np.array_equal(du, ru)


@requires_dav1d
def test_variance_boost_improves_flat_regions():
    """With boost on, the low-variance half should be coded at lower q
    (better fidelity) than with boost off, at similar total rate."""
    rng = np.random.default_rng(3)
    W = H = 128
    grad = np.clip(np.add.outer(np.arange(H) * 0.2, np.arange(W) * 0.15) + 40, 0, 255)
    y = grad.astype(np.uint8)
    y[:, :64] = rng.integers(0, 256, (H, 64)).astype(np.uint8)
    u = np.full((64, 64), 128, np.uint8)

    def run(boost):
        cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, enable_variance_boost=boost)
        cfg.qp = 45
        e = Encoder(cfg).init()
        e.send_picture(y, u, u.copy())
        pkt = e.get_packet()
        dy, _, _ = dav1d.decode(pkt.data, W, H)
        mse_flat = np.mean((dy[:, 64:].astype(float) - y[:, 64:]) ** 2)
        return mse_flat, len(pkt.data)

    mse_on, sz_on = run(True)
    mse_off, sz_off = run(False)
    assert mse_on < mse_off
