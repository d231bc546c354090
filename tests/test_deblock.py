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
    cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, input_depth=bd, recon_enabled=True,
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


def test_native_deblock_matches_numpy():
    """The C loop filter (mc_native.deblock_plane) must be bit-identical to
    the vectorized numpy path across filter sizes, levels and bit depths."""
    from svt_av1_psy_tpu.codec import deblock as db, mc_native
    if not mc_native.available():
        pytest.skip("native kernels unavailable")
    rng = np.random.default_rng(0)
    for trial, (H, W, bd, plane) in enumerate(
            [(128, 128, 8, 0), (100, 76, 8, 0), (64, 64, 10, 0),
             (64, 52, 8, 1), (96, 128, 10, 1)]):
        peak = (1 << bd) - 1
        rec = rng.integers(0, peak + 1,
                           ((H + 3) & ~3, (W + 3) & ~3)).astype(np.uint16)
        hu, wu = rec.shape[0] >> 2, rec.shape[1] >> 2
        maps = db.DeblockMaps(hu, wu)
        maps.txw[:] = rng.choice([4, 8, 16, 32], (hu, wu))
        maps.txh[:] = rng.choice([4, 8, 16, 32], (hu, wu))
        maps.bedge_v[:] = rng.random((hu, wu)) < 0.6
        maps.bedge_h[:] = rng.random((hu, wu)) < 0.6
        lv = int(rng.integers(1, 64))
        lh = int(rng.integers(1, 64))
        sh = int(rng.integers(0, 8))
        a, b = rec.copy(), rec.copy()
        db.deblock_plane(a, maps, plane, lv, lh, sh, bd, W, H)
        orig = mc_native.deblock_plane
        mc_native.deblock_plane = lambda *args, **kw: None
        try:
            db.deblock_plane(b, maps, plane, lv, lh, sh, bd, W, H)
        finally:
            mc_native.deblock_plane = orig
        assert np.array_equal(a, b), trial
