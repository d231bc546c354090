"""API lifecycle + CLI tests (analog of SvtAv1ApiTests)."""

import io

import numpy as np
import pytest

from svt_av1_psy_tpu.api import Encoder, _crf_to_qindex
from svt_av1_psy_tpu.config import EncoderConfig
from svt_av1_psy_tpu.errors import SvtAv1Error
from svt_av1_psy_tpu.io import dav1d

requires_dav1d = pytest.mark.skipif(not dav1d.available(), reason="dav1d shim unavailable")


def _frame(W, H, seed=0):
    rng = np.random.default_rng(seed)
    y = (np.cumsum(rng.normal(0, 4, (H, W)), axis=1) + 128).clip(0, 255).astype(np.uint8)
    u = np.full(((H + 1) // 2, (W + 1) // 2), 120, np.uint8)
    return y, u, u.copy()


def test_uninitialized_rejected():
    enc = Encoder(EncoderConfig(width=64, height=64))
    with pytest.raises(SvtAv1Error):
        enc.send_picture(*_frame(64, 64))


def test_avif_single_picture_guard():
    cfg = EncoderConfig(width=64, height=64, avif=True, intra_period_length=-1)
    enc = Encoder(cfg).init()
    enc.send_picture(*_frame(64, 64))
    with pytest.raises(SvtAv1Error):
        enc.send_picture(*_frame(64, 64))


def test_crf_mapping_range():
    assert _crf_to_qindex(0) == 0
    assert _crf_to_qindex(35) == 140
    assert _crf_to_qindex(70) == 255  # extended CRF clamps at max qindex


@requires_dav1d
def test_video_packets_decode():
    cfg = EncoderConfig(width=96, height=72)
    enc = Encoder(cfg).init()
    for i in range(3):
        enc.send_picture(*_frame(96, 72, seed=i), pts=i)
    enc.flush()
    stream = b""
    n = 0
    while (pkt := enc.get_packet()) is not None:
        stream += pkt.data
        n += 1
    assert n >= 3
    for i in range(3):
        y, u, v = dav1d.decode_nth(stream, i, 96, 72)
        assert y.shape == (72, 96)


@requires_dav1d
def test_recon_matches_decode_via_api():
    cfg = EncoderConfig(look_ahead_distance=0, width=64, height=64, recon_enabled=True)
    cfg.qp = 30
    enc = Encoder(cfg).init()
    enc.send_picture(*_frame(64, 64, 5))
    pkt = enc.get_packet()
    y, u, v = dav1d.decode(pkt.data, 64, 64)
    ry, ru, rv = enc.get_recon()
    assert np.array_equal(y, ry) and np.array_equal(u, ru) and np.array_equal(v, rv)


def test_cli_roundtrip(tmp_path):
    from svt_av1_psy_tpu.app.cli import main
    from svt_av1_psy_tpu.io.ivf import read_ivf
    from svt_av1_psy_tpu.io.y4m import Y4MHeader, Y4MWriter

    src = tmp_path / "in.y4m"
    out = tmp_path / "out.ivf"
    with open(src, "wb") as f:
        w = Y4MWriter(f, Y4MHeader(80, 48, 30, 1))
        for i in range(2):
            w.write_frame(*_frame(80, 48, i))
    rc = main(["-i", str(src), "-b", str(out), "--crf", "40", "--progress", "0"])
    assert rc == 0
    with open(out, "rb") as f:
        frames = list(read_ivf(f))
    assert len(frames) == 2 and all(len(d) > 0 for _, d in frames)
