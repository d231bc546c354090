"""Deblocking loop filter conformance + behavior tests."""

import numpy as np
import pytest

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.codec.deblock import pick_filter_level, thresholds
from svt_av1_psy_tpu.config import EncoderConfig
from svt_av1_psy_tpu.io import dav1d

requires_dav1d = pytest.mark.skipif(not dav1d.available(), reason="dav1d shim unavailable")


def test_level_mapping_monotone():
    lv = [pick_filter_level(q) for q in range(0, 256, 16)]
    assert all(b >= a for a, b in zip(lv, lv[1:]))
    assert lv[-1] > 10


def test_thresholds_sharpness():
    b0, l0, t0 = thresholds(32, 0)
    b7, l7, t7 = thresholds(32, 7)
    assert l7 < l0  # PSY sharpness tightens the inside limit
    assert b7 < b0


@requires_dav1d
@pytest.mark.parametrize("dims,q,bd,tiles", [
    ((128, 128), 55, 8, (0, 0)),
    ((192, 96), 60, 8, (1, 1)),
    ((100, 80), 45, 8, (0, 0)),
    ((128, 96), 40, 10, (0, 0)),
])
def test_deblocked_recon_matches_dav1d(dims, q, bd, tiles):
    W, H = dims
    rng = np.random.default_rng(W + H + q)
    peak = (1 << bd) - 1
    dt = np.uint8 if bd == 8 else np.uint16
    y = (np.cumsum(rng.normal(0, peak / 40, (H, W)), axis=1) + peak // 2).clip(0, peak).astype(dt)
    u = rng.integers(peak // 3, peak // 2, ((H + 1) // 2, (W + 1) // 2)).astype(dt)
    cfg = EncoderConfig(width=W, height=H, input_depth=bd, recon_enabled=True,
                        tile_columns=tiles[0], tile_rows=tiles[1],
                        enable_variance_boost=False, enable_dlf_flag=1)
    cfg.qp = q
    enc = Encoder(cfg).init()
    enc.send_picture(y, u, u.copy())
    pkt = enc.get_packet()
    dy, du, dv = dav1d.decode(pkt.data, W, H)
    ry, ru, rv = enc.get_recon()
    assert np.array_equal(dy, ry)
    assert np.array_equal(du, ru) and np.array_equal(dv, rv)
