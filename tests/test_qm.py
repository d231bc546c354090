"""Quantizer-matrix tests: level curves, table layout, stream conformance."""

import numpy as np
import pytest

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.codec.qm import (AOM_QM_BITS, adjusted_tx_size, aom_get_qmlevel,
                                      frame_qm_levels, get_qm, psy_get_qmlevel)
from svt_av1_psy_tpu.config import EncoderConfig
from svt_av1_psy_tpu.io import dav1d

requires_dav1d = pytest.mark.skipif(not dav1d.available(), reason="dav1d shim unavailable")


def test_qm_level_curves():
    assert aom_get_qmlevel(0, 2, 15) == 2
    assert aom_get_qmlevel(255, 2, 15) == 15
    assert aom_get_qmlevel(140, 2, 15) == 9
    # psy sigmoid curve is monotone and clipped to [first, last]
    prev = 0
    for q in range(0, 256, 16):
        lv = psy_get_qmlevel(q, 2, 15)
        assert 2 <= lv <= 15 and lv >= prev
        prev = lv


def test_qm_table_layout():
    # DC weight of the flattest stored level (14) must be near 32 (=1.0)
    qm, iqm = get_qm(14, False, 0)
    assert qm.shape == (16,) and abs(int(qm[0]) - 32) <= 4
    # level 15 means flat / no matrix
    assert get_qm(15, False, 0) == (None, None)
    # steep level 0 must down-weight high frequencies strongly
    qm0, _ = get_qm(0, False, 2)          # 16x16
    assert qm0[0] > qm0[-1]
    # 64x* sizes fold onto their 32x* counterparts
    assert adjusted_tx_size(4) == 3 and adjusted_tx_size(11) == 3
    assert adjusted_tx_size(17) == 9 and adjusted_tx_size(18) == 10
    a, _ = get_qm(5, False, 4)
    b, _ = get_qm(5, False, 3)
    assert np.array_equal(a, b)
    # qm * iqm ~ 32*32 (fixed-point reciprocal pairs)
    qm8, iqm8 = get_qm(8, True, 1)
    prod = qm8.astype(np.int64) * iqm8.astype(np.int64)
    assert np.all(np.abs(prod - (1 << (2 * AOM_QM_BITS))) <= (1 << AOM_QM_BITS))


def _encode(W, H, n, enable_qm, q=40, tune=2):
    rng = np.random.default_rng(9)
    base = (np.cumsum(rng.normal(0, 5, (H + 32, W + 32)), axis=1) + 128).clip(0, 255).astype(np.uint8)
    cfg = EncoderConfig(width=W, height=H, recon_enabled=True, enable_qm=enable_qm,
                        tune=tune)
    cfg.qp = q
    enc = Encoder(cfg).init()
    for i in range(n):
        y = base[2 * i : 2 * i + H, 3 * i : 3 * i + W].copy()
        u = np.full(((H + 1) // 2, (W + 1) // 2), 115, np.uint8)
        enc.send_picture(y, u, u.copy())
    enc.flush()
    stream = b""
    recons = []
    while (pkt := enc.get_packet()) is not None:
        stream += pkt.data
        if pkt.recon is not None:
            recons.append(pkt.recon)
    return stream, recons


@requires_dav1d
@pytest.mark.parametrize("tune", [2, 3])
def test_qm_stream_conformant(tune):
    W, H = 120, 88
    stream, recons = _encode(W, H, 3, True, tune=tune)
    for i in range(3):
        dy, du, dv = dav1d.decode_nth(stream, i, W, H)
        assert np.array_equal(dy, recons[i][0]), f"frame {i} luma"
        assert np.array_equal(du, recons[i][1]), f"frame {i} U"


@requires_dav1d
def test_qm_changes_bitstream():
    s_on, _ = _encode(96, 64, 1, True)
    s_off, _ = _encode(96, 64, 1, False)
    assert s_on != s_off


def test_frame_qm_levels_disabled():
    cfg = EncoderConfig(width=64, height=64, enable_qm=False)
    assert frame_qm_levels(cfg, 120) is None


def test_chroma_qindex_delta_curves():
    from svt_av1_psy_tpu.api import _chroma_qindex_delta

    # tune 2 chroma boost ramps with qindex, capped at 16
    assert _chroma_qindex_delta(40, 2, 1) == 0       # below the 48 knee
    assert _chroma_qindex_delta(140, 2, 1) == -16
    assert _chroma_qindex_delta(255, 2, 1) == -16    # capped
    # tune 3: linear adj/8 boost
    assert _chroma_qindex_delta(140, 3, 1) == -18
    # tune 0: no boost, but BT.2020 primaries still get one
    assert _chroma_qindex_delta(140, 0, 1) == 0
    assert _chroma_qindex_delta(140, 0, 9) == -16
    # always within the coded delta range
    for q in range(1, 256, 17):
        for t in (0, 2, 3, 4):
            assert -64 <= _chroma_qindex_delta(q, t, 9) <= 63
