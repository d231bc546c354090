"""TPL propagation tests: r0 behavior, SB maps, end-to-end effect."""

import numpy as np
import pytest

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.config import EncoderConfig
from svt_av1_psy_tpu.io import dav1d
from svt_av1_psy_tpu.rc.tpl import tpl_analysis, tpl_qindex, tpl_sb_qindex_map

requires_dav1d = pytest.mark.skipif(not dav1d.available(), reason="dav1d shim unavailable")


def _frames(n, W, H, motion=(2, 3), seed=0, scramble=False):
    rng = np.random.default_rng(seed)
    base = (np.cumsum(rng.normal(0, 5, (H + 64, W + 64)), axis=1) + 128).clip(0, 255).astype(np.uint8)
    out = []
    for i in range(n):
        if scramble:
            out.append(rng.integers(0, 256, (H, W)).astype(np.uint8))
        else:
            out.append(base[motion[0] * i : motion[0] * i + H,
                            motion[1] * i : motion[1] * i + W].copy())
    return out

def test_r0_low_for_predictable_content():
    # motion in multiples of 4 so the 1/4-res HME sees the exact shift
    pred = _frames(4, 128, 96, motion=(4, 8))
    r0_pred, beta, _u = tpl_analysis(pred)
    r0_scram, _, _ = tpl_analysis(_frames(4, 128, 96, scramble=True))
    # predictable content propagates -> small r0; noise doesn't -> r0 ~ 1
    assert r0_pred < 0.6
    assert r0_scram > 0.9
    assert beta.shape == (96 // 16, 128 // 16)
    assert np.all(beta > 0)


def test_tpl_qindex_boosts_keyframe():
    q_lo = tpl_qindex(160, 0.1, 8)
    q_hi = tpl_qindex(160, 1.0, 8)
    assert q_lo < q_hi <= 160
    # qsc weight > 1 weakens the boost but stays clamped at the key weight
    assert tpl_qindex(160, 1.0, 8, qsc_weight=1.375) <= 160


def test_tpl_sb_map_shape_and_snapping():
    beta = np.ones((8, 8))
    beta[:4, :4] = 4.0     # un-propagated area -> coarser q
    q = tpl_sb_qindex_map(120, beta, 2, 2, 8)
    assert q.shape == (2, 2)
    assert q[0, 0] > 120               # beta > 1 raises q
    assert np.all((q - 120) % 4 == 0)  # snapped to delta_q_res


@requires_dav1d
def test_tpl_stream_conformant_and_saves_bits():
    W, H = 160, 128
    frames = _frames(6, W, H, seed=3)
    u = np.full((H // 2, W // 2), 118, np.uint8)

    def encode(tpl):
        from svt_av1_psy_tpu.config import PredStructure

        # low-delay: this test isolates the keyframe-boost right-sizing
        # preset <= 9: the preset ladder gates TPL off at faster presets
        cfg = EncoderConfig(width=W, height=H, recon_enabled=True, preset=6,
                            enable_tpl_la=tpl, enable_tf=0,
                            pred_structure=PredStructure.LOW_DELAY,
                            look_ahead_distance=3 if tpl else -1)
        cfg.qp = 45
        enc = Encoder(cfg).init()
        for i, y in enumerate(frames):
            enc.send_picture(y, u, u.copy(), pts=i)
        enc.flush()
        stream = b""
        recons = []
        while (pkt := enc.get_packet()) is not None:
            stream += pkt.data
            if pkt.recon is not None:
                recons.append(pkt.recon)
        return stream, recons

    s_t, r_t = encode(True)
    s_o, _ = encode(False)
    assert len(s_t) < len(s_o)   # TPL right-sizes the keyframe boost
    for i in (0, 2, 5):
        dy, du, dv = dav1d.decode_nth(s_t, i, W, H)
        assert np.array_equal(dy, r_t[i][0])


# ------------------------------------------------------- device TPL tier

def test_device_tpl_stats_track_host():
    """ops/tpl.tpl_group_stats vs the host per-block pass: identical intra
    costs (same SA8D of the mean-removed block), and inter costs that
    track the host's within a small relative envelope (the device MV can
    differ per unit, but its cost model is the same SA8D of the MC
    residual, clamped to intra)."""
    from svt_av1_psy_tpu.ops.tpl import tpl_group_stats
    from svt_av1_psy_tpu.rc.tpl import _satd16, _tiles16

    frames = [f.astype(np.uint16) for f in _frames(3, 192, 128, motion=(4, 8), seed=7)]
    dev = tpl_group_stats(frames)
    assert len(dev) == 3
    for i, f in enumerate(frames):
        tiles, bh, bw = _tiles16(f.astype(np.int64))
        mean = tiles.mean(axis=(1, 2), keepdims=True).astype(np.int64)
        intra_host = np.maximum(_satd16(tiles - mean), 1).reshape(bh, bw)
        # device floors the f32 mean; host truncates via int64 — identical
        # for non-negative sums, so intra costs must agree exactly
        assert np.array_equal(dev[i]["intra"], intra_host.astype(np.float64)), i
        if i:
            assert np.all(dev[i]["inter"] <= dev[i]["intra"])
            # translating content: the device search must find most units
            # cheap to predict (inter well under intra on average)
            assert dev[i]["inter"].mean() < 0.7 * dev[i]["intra"].mean()


def test_device_tpl_r0_matches_host():
    """End-to-end r0 from the device cost pass stays close to the host
    pass on both predictable and unpredictable content."""
    for scramble, seed in ((False, 1), (True, 2)):
        frames = _frames(4, 192, 128, motion=(4, 8), seed=seed, scramble=scramble)
        r0_h, _, _ = tpl_analysis(frames, backend="host")
        r0_d, _, _ = tpl_analysis(frames, backend="device")
        assert abs(r0_d - r0_h) < 0.12, (scramble, r0_h, r0_d)


def test_tpl_backend_default_is_host(monkeypatch):
    """The host pass is the decision-quality default: the default backend
    must not touch ops/tpl (round-4 regression guard)."""
    import svt_av1_psy_tpu.ops.tpl as ops_tpl

    def boom(*a, **k):
        raise AssertionError("device TPL dispatched under default backend")

    monkeypatch.setattr(ops_tpl, "tpl_group_stats", boom)
    frames = _frames(3, 128, 96)
    r0, beta, _ = tpl_analysis(frames)          # default: host
    assert 0.0 < r0 <= 1.0

    from svt_av1_psy_tpu.config import EncoderConfig

    assert EncoderConfig(width=64, height=64).tpl_backend == "host"
