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


def test_grouped_budgets_scene_cut():
    """pass2_strategy-style grouping: a scene cut starts a new group whose
    leader gets an intra-cost budget; correlated groups boost the leader."""
    # frames 0-3 correlated group, frame 4 = scene cut (inter ~ intra)
    stats = ([{"intra": 100.0, "inter": 100.0}]
             + [{"intra": 100.0, "inter": 5.0}] * 3
             + [{"intra": 200.0, "inter": 195.0}]
             + [{"intra": 200.0, "inter": 10.0}] * 3)
    from svt_av1_psy_tpu.rc.firstpass import group_boundaries

    assert group_boundaries(stats) == [0, 4]
    b = second_pass_budgets(stats, 240_000, 30)
    assert abs(sum(b) - 240_000 * 8 / 30) < 1e-6
    # both group leaders outweigh their followers
    assert b[0] > b[1] and b[4] > b[5]


@requires_dav1d
def test_recode_loop_caps_overshoot():
    """A CBR stream with a hard scene cut mid-sequence: the recode loop
    (recode_loop=3, all frames) re-encodes the overshooting cut frame at
    a higher q, capping its size vs the recode-disabled encode."""
    rng = np.random.default_rng(7)
    W, H, N = 160, 96, 8
    a = (np.cumsum(rng.normal(0, 5, (H, W + 60)), axis=1) + 128).clip(0, 255).astype(np.uint8)
    b2 = rng.integers(0, 255, (H, W + 60)).astype(np.uint8)  # noise scene
    frames = [a[:, i : i + W] for i in range(4)] + \
             [b2[:, i : i + W] for i in range(N - 4)]
    u = np.full((H // 2, W // 2), 118, np.uint8)

    def run(recode):
        from svt_av1_psy_tpu.config import PredStructure

        cfg = EncoderConfig(width=W, height=H,
                            rate_control_mode=RateControlMode.CBR,
                            target_bit_rate=100_000, fps_num=30, fps_denom=1,
                            recon_enabled=True, scene_change_detection=False,
                            pred_structure=PredStructure.LOW_DELAY)
        cfg.recode_loop = recode
        enc = Encoder(cfg).init()
        sizes = []
        stream = b""
        recons = []
        for f in frames:
            enc.send_picture(f, u, u.copy())
            pkt = enc.get_packet()
            sizes.append(len(pkt.data))
            stream += pkt.data
            recons.append(pkt.recon)
        # conformance unaffected by the recode
        for i in (0, 4, N - 1):
            dy, _, _ = dav1d.decode_nth(stream, i, W, H)
            assert np.array_equal(dy, recons[i][0])
        return sizes

    s_off = run(0)
    s_on = run(3)
    # the scene-cut frame (4) overshoots; recode must shrink it
    assert s_on[4] < s_off[4]


def test_dynamic_minigop_splits_on_motion():
    """--enable-dg: a high-motion span halves its mini-GoP recursively
    (pd_process.c:724 analog); a calm span keeps the full pyramid."""
    rng = np.random.default_rng(9)
    W, H = 160, 96
    base = (np.cumsum(rng.normal(0, 5, (H + 200, W + 300)), axis=1)
            + 128).clip(0, 255).astype(np.uint8)
    calm = [(base[0:H, i : i + W].copy(), None, None, i) for i in range(8)]
    fast = [(base[20 * i : 20 * i + H, 30 * i : 30 * i + W].copy(),
             None, None, i) for i in range(8)]
    cfg = EncoderConfig(width=W, height=H, enable_dg=True)
    enc = Encoder(cfg).init()
    assert len(enc._split_gop_dynamic(calm)) == 1
    assert len(enc._split_gop_dynamic(fast)) >= 2
    cfg2 = EncoderConfig(width=W, height=H, enable_dg=False)
    enc2 = Encoder(cfg2).init()
    assert len(enc2._split_gop_dynamic(fast)) == 1


@requires_dav1d
@pytest.mark.slow
def test_two_pass_vbr_accuracy_long():
    """2-pass VBR with the recode loop hits +/-5% of target on a longer
    mixed-content clip (pass2_strategy.c accuracy bar)."""
    from svt_av1_psy_tpu.config import PredStructure

    rng = np.random.default_rng(3)
    W, H, FPS, N = 160, 96, 30, 150
    base = (np.cumsum(rng.normal(0, 5, (H + 320, W + 480)), axis=1)
            + 128).clip(0, 255).astype(np.uint8)
    frames = [base[(2 * i) % 300 : (2 * i) % 300 + H,
                   (3 * i) % 440 : (3 * i) % 440 + W].copy()
              for i in range(N)]
    u = np.full((H // 2, W // 2), 118, np.uint8)

    cfg1 = EncoderConfig(width=W, height=H, pass_num=1)
    enc1 = Encoder(cfg1).init()
    for f in frames:
        enc1.send_picture(f, u, u.copy())
    stats = enc1.first_pass_data()

    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".bin") as tf:
        tf.write(stats)
        tf.flush()
        target = 150_000
        cfg2 = EncoderConfig(width=W, height=H, pass_num=2,
                             stats_file=tf.name,
                             rate_control_mode=RateControlMode.VBR,
                             target_bit_rate=target, fps_num=FPS,
                             fps_denom=1,
                             pred_structure=PredStructure.LOW_DELAY)
        enc2 = Encoder(cfg2).init()
        total = 0
        for f in frames:
            enc2.send_picture(f, u, u.copy())
            total += len(enc2.get_packet().data)
        achieved = total * 8 * FPS / N
        assert abs(achieved - target) / target < 0.05, achieved
