"""Segmentation (SEG_LVL_ALT_Q): prediction math, assignment, conformance."""

import numpy as np
import pytest

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.codec.segmentation import (SegmentationParams,
                                                assign_segments_by_variance,
                                                neg_interleave,
                                                spatial_seg_pred)
from svt_av1_psy_tpu.config import EncoderConfig
from svt_av1_psy_tpu.io import dav1d

requires_dav1d = pytest.mark.skipif(not dav1d.available(), reason="dav1d shim unavailable")


def test_neg_interleave_roundtrip():
    # decoder inverse: scan coded symbols and invert; check bijectivity
    for mx in (2, 3, 5, 8):
        for ref in range(mx):
            seen = set()
            for x in range(mx):
                c = neg_interleave(x, ref, mx)
                assert 0 <= c < mx, (x, ref, mx, c)
                seen.add(c)
            assert len(seen) == mx  # bijection


def test_spatial_pred_contexts():
    m = np.zeros((8, 8), np.uint8)
    tile = (0, 8, 0, 8)
    assert spatial_seg_pred(m, 0, 0, tile) == (0, 0)     # no neighbors
    m[0, :] = 1
    m[:, 0] = 1
    assert spatial_seg_pred(m, 1, 1, tile) == (1, 2)     # all equal
    m[0, 0] = 2
    pred, ctx = spatial_seg_pred(m, 1, 1, tile)
    assert ctx == 1 and pred == 1                        # two of three match


def test_assignment_classes():
    rng = np.random.default_rng(0)
    v = rng.integers(0, 100, (4, 6, 64)).astype(np.uint16)
    v[0, 0] = 0          # quiet SB
    v[3, 5] = 60000      # busy SB
    params, seg = assign_segments_by_variance(v)
    assert params.enabled and seg.shape == (4, 6)
    assert seg[0, 0] == 0 and seg[3, 5] == 2
    assert params.alt_q(0) < 0 < params.alt_q(2)
    assert params.last_active_seg_id == 2
    assert params.seg_qindex(100, 0) == 100 + params.alt_q(0)


def _mixed_frame(W, H, seed=6):
    rng = np.random.default_rng(seed)
    y = (np.cumsum(rng.normal(0, 4, (H, W)), axis=1) + 128).clip(0, 255)
    y[:, W // 2 :] += rng.normal(0, 20, (H, W // 2))
    return y.clip(0, 255).astype(np.uint8)


@requires_dav1d
@pytest.mark.parametrize("n", [1, 4])
def test_segmentation_stream_conformant(n):
    W, H = 160, 128
    y = _mixed_frame(W, H)
    u = np.full((H // 2, W // 2), 118, np.uint8)
    cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, recon_enabled=True, aq_mode=1)
    cfg.qp = 40
    enc = Encoder(cfg).init()
    for i in range(n):
        enc.send_picture(np.roll(y, 2 * i, axis=1), u, u.copy(), pts=i)
    enc.flush()
    stream = b""
    recons = []
    while (pkt := enc.get_packet()) is not None:
        stream += pkt.data
        if pkt.recon is not None:
            recons.append(pkt.recon)
    for i in range(n):
        dy, du, dv = dav1d.decode_nth(stream, i, W, H)
        assert np.array_equal(dy, recons[i][0]), f"frame {i}"
        assert np.array_equal(du, recons[i][1])


@requires_dav1d
def test_segmentation_changes_quant():
    """Quiet/busy regions must actually get different effective q."""
    W, H = 160, 128
    y = _mixed_frame(W, H)
    u = np.full((H // 2, W // 2), 118, np.uint8)

    def encode(aq):
        cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, recon_enabled=True, aq_mode=aq,
                            enable_variance_boost=False)
        cfg.qp = 40
        enc = Encoder(cfg).init()
        enc.send_picture(y, u, u.copy())
        return enc.get_packet()

    seg = encode(1)
    flat = encode(0)
    assert seg.data != flat.data
    # quiet half coded finer with segmentation -> closer to source there
    quiet_src = y[:, : W // 2].astype(np.int64)
    e_seg = np.mean((seg.recon[0][:, : W // 2].astype(np.int64) - quiet_src) ** 2)
    e_flat = np.mean((flat.recon[0][:, : W // 2].astype(np.int64) - quiet_src) ** 2)
    assert e_seg < e_flat
