"""Two-pass rate control: stats format, budgeting, end-to-end behavior."""

import numpy as np
import pytest

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.config import EncoderConfig, RateControlMode
from svt_av1_psy_tpu.io import dav1d
from svt_av1_psy_tpu.rc.firstpass import (FirstPassWriter, parse_stats,
                                          second_pass_budgets)

requires_dav1d = pytest.mark.skipif(not dav1d.available(), reason="dav1d shim unavailable")


def _two_section_clip(n1=6, n2=6, W=160, H=96, seed=31):
    rng = np.random.default_rng(seed)
    base = (np.cumsum(rng.normal(0, 5, (H + 160, W + 160)), axis=1) + 128).clip(0, 255).astype(np.uint8)
    frames = [base[:H, :W].copy() for _ in range(n1)]           # static
    frames += [base[12 * i : 12 * i + H, 17 * i : 17 * i + W].copy()
               for i in range(n2)]                              # fast pan
    return frames


def test_stats_roundtrip():
    fp = FirstPassWriter()
    for f in _two_section_clip(3, 3):
        fp.push(f)
    stats = parse_stats(fp.serialize())
    assert len(stats) == 6
    assert all(s["inter"] <= s["intra"] for s in stats)
    # static frames have near-zero inter cost; pan frames do not
    assert stats[2]["inter"] < stats[5]["inter"]


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        parse_stats(b"not a stats file")


def test_budgets_follow_complexity():
    stats = [{"intra": 100.0, "inter": 100.0},
             {"intra": 100.0, "inter": 1.0},     # easy
             {"intra": 100.0, "inter": 90.0}]    # hard
    b = second_pass_budgets(stats, 300_000, 30)
    assert abs(sum(b) - 300_000 * 3 / 30) < 1e-6
    assert b[1] < b[2]
    assert b[0] > b[2]      # keyframe boost


@requires_dav1d
def test_two_pass_end_to_end(tmp_path):
    frames = _two_section_clip()
    W, H = 160, 96
    u = np.full((H // 2, W // 2), 118, np.uint8)

    cfg1 = EncoderConfig(width=W, height=H, pass_num=1)
    enc1 = Encoder(cfg1).init()
    for i, f in enumerate(frames):
        assert enc1.send_picture(f, u, u.copy(), pts=i) is None
    assert enc1.get_packet() is None           # pass 1 emits no packets
    stats = tmp_path / "st.bin"
    stats.write_bytes(enc1.first_pass_data())

    from svt_av1_psy_tpu.config import PredStructure

    cfg2 = EncoderConfig(width=W, height=H, pass_num=2, stats_file=str(stats),
                         rate_control_mode=RateControlMode.VBR,
                         target_bit_rate=200_000, fps_num=30, fps_denom=1,
                         recon_enabled=True,
                         pred_structure=PredStructure.LOW_DELAY)
    enc2 = Encoder(cfg2).init()
    stream = b""
    recons = []
    sizes = []
    for i, f in enumerate(frames):
        enc2.send_picture(f, u, u.copy(), pts=i)
        pkt = enc2.get_packet()
        stream += pkt.data
        recons.append(pkt.recon)
        sizes.append(len(pkt.data))
    # bits shifted to the hard section (excluding the keyframe)
    assert np.mean(sizes[1:6]) < np.mean(sizes[7:])
    achieved = sum(sizes) * 8 * 30 / len(frames)
    assert achieved < 2.0 * 200_000
    for i in (0, 5, 11):
        dy, _, _ = dav1d.decode_nth(stream, i, W, H)
        assert np.array_equal(dy, recons[i][0])
