"""Rate control (VBR/CBR), qp-scale-compress, scene change detection."""

import numpy as np
import pytest

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.codec.scene_change import detect_scene_change
from svt_av1_psy_tpu.config import EncoderConfig, RateControlMode
from svt_av1_psy_tpu.io import dav1d
from svt_av1_psy_tpu.rc.rate_control import (RateControl, bits_per_mb,
                                             convert_qindex_to_q,
                                             find_qindex_by_rate,
                                             qp_scale_compress_qindex)

requires_dav1d = pytest.mark.skipif(not dav1d.available(), reason="dav1d shim unavailable")


def test_convert_qindex_to_q():
    # rc_process.c:211 -- ac_q(255, 8-bit) == 1828 -> 457.0
    assert convert_qindex_to_q(255, 8) == 1828 / 4.0
    assert convert_qindex_to_q(0, 8) == 4 / 4.0


def test_bits_per_mb_monotone():
    prev = None
    for q in range(1, 256, 16):
        b = bits_per_mb(False, q, 1.0, 8)
        if prev is not None:
            assert b <= prev
        prev = b
    assert bits_per_mb(True, 100, 1.0, 8) > bits_per_mb(False, 100, 1.0, 8)


def test_find_qindex_by_rate_inverts_model():
    for target_q in (40, 120, 200):
        b = bits_per_mb(False, target_q, 1.0, 8)
        q = find_qindex_by_rate(b, 8, False)
        assert abs(q - target_q) <= 1


def test_qp_scale_compress_lowers_keyframe_q():
    assert qp_scale_compress_qindex(160, 1, 8, True) < 160
    assert qp_scale_compress_qindex(160, 0, 8, True) == 160
    assert qp_scale_compress_qindex(160, 1, 8, False) == 160
    # stronger compression -> lower q
    assert (qp_scale_compress_qindex(160, 3, 8, True)
            >= qp_scale_compress_qindex(160, 1, 8, True) - 160)  # sanity bound


def test_rc_feedback_converges():
    rc = RateControl(target_bit_rate=400_000, fps=30, width=320, height=192)
    # fake an encoder that always spends half of what the model projects
    for _ in range(20):
        q = rc.frame_qindex(False)
        projected = bits_per_mb(False, q, rc.correction[False], 8) * rc.mbs >> 9
        rc.update(False, q, projected // 2 // 8)
    q_late = rc.frame_qindex(False)
    assert rc.correction[False] < 0.7  # adapted downward
    assert 1 <= q_late <= 255


def test_scene_change_detector():
    rng = np.random.default_rng(0)
    # structured scenes (uniform noise would decimate to flat gray)
    yy, xx = np.mgrid[0:192, 0:320]
    a = ((xx * 255) // 320).astype(np.uint8)          # horizontal ramp
    b = (255 - (yy * 255) // 192).astype(np.uint8)    # inverted vertical ramp
    assert detect_scene_change(a, b)
    assert not detect_scene_change(a, a)
    # pure pan must NOT be a cut (motion-compensated MAD)
    big = (np.cumsum(rng.normal(0, 3, (260, 420)), axis=1)
           + np.cumsum(rng.normal(0, 3, (260, 420)), axis=0) + 128
           ).clip(0, 255).astype(np.uint8)
    assert not detect_scene_change(big[10:202, 10:330], big[18:210, 26:346])
    assert not detect_scene_change(None, a)


@requires_dav1d
def test_vbr_stream_hits_rate_and_decodes():
    W, H, FPS, N = 160, 96, 30, 20
    rng = np.random.default_rng(5)
    base = (np.cumsum(rng.normal(0, 5, (H + 96, W + 96)), axis=1) + 128).clip(0, 255).astype(np.uint8)
    cfg = EncoderConfig(width=W, height=H, rate_control_mode=RateControlMode.VBR,
                        target_bit_rate=200_000, fps_num=FPS, fps_denom=1,
                        recon_enabled=True, intra_period_length=60)
    enc = Encoder(cfg).init()
    for i in range(N):
        y = base[(2 * i) % 90 : (2 * i) % 90 + H, (3 * i) % 90 : (3 * i) % 90 + W].copy()
        u = np.full((H // 2, W // 2), 118, np.uint8)
        enc.send_picture(y, u, u.copy())
    enc.flush()
    stream = b""
    recons = []
    total = 0
    while (pkt := enc.get_packet()) is not None:
        stream += pkt.data
        total += len(pkt.data)
        if pkt.recon is not None:
            recons.append(pkt.recon)
    achieved = total * 8 * FPS / N
    assert 0.5 * 200_000 < achieved < 2.0 * 200_000, achieved
    for i in (0, N // 2, N - 1):
        dy, du, dv = dav1d.decode_nth(stream, i, W, H)
        assert np.array_equal(dy, recons[i][0])
