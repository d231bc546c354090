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


def test_section_pct_clamps_target():
    from svt_av1_psy_tpu.rc.rate_control import RateControl

    rc = RateControl(target_bit_rate=300_000, fps=30, width=640, height=360,
                     min_section_pct=50, max_section_pct=150)
    bpf = rc.bits_per_frame
    rc.buffer_level = -rc.buffer_cap          # huge surplus -> big target
    assert rc._target_bits(False) <= bpf * 1.5 + 1e-6
    rc.buffer_level = rc.buffer_cap           # huge deficit -> small target
    assert rc._target_bits(False) >= bpf * 0.5 - 1e-6
    # key frames are exempt (kf boost must survive)
    assert rc._target_bits(True) > bpf * 1.5


def test_cbr_buffer_model_knobs():
    from svt_av1_psy_tpu.rc.rate_control import RateControl

    rc = RateControl(target_bit_rate=240_000, fps=30, width=320, height=180,
                     cbr=True, buf_initial_ms=8000, buf_optimal_ms=4000,
                     vbv_bufsize=100_000)
    assert rc.buffer_cap == 100_000.0         # vbv override (bits)
    assert rc.buffer_level < 0                # initial > optimal = slack
    # slack grows the early-frame allowance vs a neutral start
    neutral = RateControl(target_bit_rate=240_000, fps=30, width=320,
                          height=180, cbr=True)
    assert rc._target_bits(False) > neutral._target_bits(False)


def test_adaptive_quantization_alias_sets_aq_mode():
    from svt_av1_psy_tpu.config import EncoderConfig, verify_settings

    cfg = EncoderConfig(width=64, height=64, look_ahead_distance=0)
    cfg.enable_adaptive_quantization = 0
    cfg = verify_settings(cfg)
    assert cfg.aq_mode == 0


def test_capped_crf_reduces_rate_and_decodes():
    """--mbr with CRF: the leaky bucket raises qindex on overshoot, the
    stream shrinks, and it still decodes bit-exactly."""
    from pathlib import Path

    import pytest

    from svt_av1_psy_tpu.api import Encoder
    from svt_av1_psy_tpu.config import EncoderConfig

    rng = np.random.default_rng(3)
    W, H, N = 160, 96, 8
    ys = [np.clip(np.cumsum(rng.normal(0, 6, (H, W)), axis=1) + 120, 0,
                  255).astype(np.uint8) for _ in range(N)]
    u = np.full((H // 2, W // 2), 120, np.uint8)

    def run(mbr):
        cfg = EncoderConfig(width=W, height=H, look_ahead_distance=0,
                            preset=10, recon_enabled=True)
        cfg.qp = 20
        cfg.max_bit_rate = mbr
        enc = Encoder(cfg).init()
        total, pkts = 0, []
        for i, y in enumerate(ys):
            enc.send_picture(y, u, u.copy(), pts=i)
            while (p := enc.get_packet()) is not None:
                pkts.append(p)
        enc.flush()
        while (p := enc.get_packet()) is not None:
            pkts.append(p)
        return pkts

    free = run(0)
    capped = run(40_000)    # ~1.3 kbit/frame at 30fps: far below free rate
    nb_free = sum(len(p.data) for p in free)
    nb_capped = sum(len(p.data) for p in capped)
    assert nb_capped < nb_free
    if not Path("/usr/lib/x86_64-linux-gnu/libdav1d.so.6").exists():
        pytest.skip("dav1d unavailable")
    from svt_av1_psy_tpu.io import dav1d

    stream = b"".join(p.data for p in capped)
    disp = [p for p in capped if p.recon is not None]
    for i, p in enumerate(disp):
        d = dav1d.decode_nth(stream, i, W, H)
        assert all(np.array_equal(a, b) for a, b in zip(d, p.recon)), i


def test_rc_stats_buffer_drives_second_pass():
    """pass 2 accepts the first-pass stats via rc_stats_buffer (no file)."""
    from svt_av1_psy_tpu.api import Encoder
    from svt_av1_psy_tpu.config import EncoderConfig

    rng = np.random.default_rng(11)
    W, H, N = 128, 96, 6
    ys = [np.clip(np.cumsum(rng.normal(0, 5, (H, W)), axis=1) + 110, 0,
                  255).astype(np.uint8) for _ in range(N)]
    u = np.full((H // 2, W // 2), 125, np.uint8)
    cfg1 = EncoderConfig(width=W, height=H, pass_num=1, rate_control_mode=1,
                         target_bit_rate=200_000, look_ahead_distance=0)
    e1 = Encoder(cfg1).init()
    for i, y in enumerate(ys):
        e1.send_picture(y, u, u.copy(), pts=i)
    e1.flush()
    buf = e1.first_pass_data()
    cfg2 = EncoderConfig(width=W, height=H, pass_num=2, rate_control_mode=1,
                         target_bit_rate=200_000, rc_stats_buffer=buf,
                         look_ahead_distance=0)
    e2 = Encoder(cfg2).init()
    assert e2._budgets is not None and len(e2._budgets) == N
