"""Filter intra (recursive 7-tap modes) + above-right availability fix."""

import numpy as np
import pytest

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.codec.intra import filter_intra_predict
from svt_av1_psy_tpu.config import EncoderConfig
from svt_av1_psy_tpu.io import dav1d

requires_dav1d = pytest.mark.skipif(not dav1d.available(), reason="dav1d shim unavailable")


def _sawtooth(W, H, seed=8):
    """Modulo-ramp content: exercises D45/D67 + filter intra heavily."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    return ((xx * 0.9 + yy * 1.7) % 256
            + rng.normal(0, 3, (H, W))).clip(0, 255).astype(np.uint8)


def test_filter_intra_predict_flat():
    above = np.full(65, 100, np.uint16)
    left = np.full(65, 100, np.uint16)
    for mode in range(5):
        out = filter_intra_predict(above, left, 16, 16, mode)
        assert np.all(out == 100), mode   # DC gain is exactly 1


def test_filter_intra_predict_matches_oracle():
    import tests.oracle as O
    import ctypes

    if not O.available:
        pytest.skip("oracle library unavailable")
    lib = O._lib
    fn = lib.svt_aom_highbd_filter_intra_predictor
    fn.argtypes = [ctypes.POINTER(ctypes.c_uint16), ctypes.c_ssize_t,
                   ctypes.c_int, ctypes.POINTER(ctypes.c_uint16),
                   ctypes.POINTER(ctypes.c_uint16), ctypes.c_int, ctypes.c_int]
    rng = np.random.default_rng(0)
    for tx, w, h in ((1, 8, 8), (3, 32, 32), (8, 16, 8)):
        for mode in range(5):
            corner_row = rng.integers(0, 256, w + 1).astype(np.uint16)
            left = rng.integers(0, 256, h).astype(np.uint16)
            dst = np.zeros((h, w), np.uint16)
            fn(dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), w, tx,
               corner_row[1:].ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
               left.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), mode, 8)
            mine = filter_intra_predict(
                corner_row.astype(np.uint16),
                np.concatenate(([corner_row[0]], left)).astype(np.uint16),
                w, h, mode, 8)
            assert np.array_equal(dst, mine), (tx, mode)


@requires_dav1d
@pytest.mark.parametrize("dims", [(128, 96), (128, 128), (96, 64), (106, 74)])
def test_filter_intra_stream_conformant(dims):
    W, H = dims
    y = _sawtooth(W, H)
    u = np.full(((H + 1) // 2, (W + 1) // 2), 118, np.uint8)
    cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, recon_enabled=True)
    cfg.qp = 35
    enc = Encoder(cfg).init()
    enc.send_picture(y, u, u.copy())
    pkt = enc.get_packet()
    dy, du, dv = dav1d.decode(pkt.data, W, H)
    assert np.array_equal(dy, pkt.recon[0])
    assert np.array_equal(du, pkt.recon[1])


@requires_dav1d
def test_above_right_at_sb_top_regression():
    """64-wide edge blocks at an SB top picking D45/D67 must use the decoded
    above-right row of the previous SB row (fixed availability rule)."""
    W, H = 128, 96    # bottom SB row forces 64x32 blocks
    y = _sawtooth(W, H)
    u = np.full((H // 2, W // 2), 118, np.uint8)
    cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, recon_enabled=True,
                        enable_dlf_flag=False, cdef_level=0,
                        enable_variance_boost=False)
    cfg.qp = 35
    enc = Encoder(cfg).init()
    enc.send_picture(y, u, u.copy())
    pkt = enc.get_packet()
    dy, _, _ = dav1d.decode(pkt.data, W, H)
    assert np.array_equal(dy, pkt.recon[0])


@requires_dav1d
def test_filter_intra_ipp_with_fallback():
    W, H = 128, 96
    y = _sawtooth(W, H)
    u = np.full((H // 2, W // 2), 118, np.uint8)
    rng = np.random.default_rng(1)
    cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, recon_enabled=True)
    cfg.qp = 40
    enc = Encoder(cfg).init()
    for i in range(3):
        f = np.roll(y, 5 * i, axis=0) if i < 2 else \
            rng.integers(0, 256, (H, W)).astype(np.uint8)
        enc.send_picture(f, u, u.copy(), pts=i)
    enc.flush()
    stream = b""
    recons = []
    while (pkt := enc.get_packet()) is not None:
        stream += pkt.data
        if pkt.recon is not None:
            recons.append(pkt.recon)
    for i in range(3):
        dy, _, _ = dav1d.decode_nth(stream, i, W, H)
        assert np.array_equal(dy, recons[i][0]), f"frame {i}"
