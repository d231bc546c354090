"""Global motion (TRANSLATION): estimation, syntax round-trip, conformance."""

import numpy as np
import pytest

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.codec.global_motion import estimate_global_translation
from svt_av1_psy_tpu.config import EncoderConfig
from svt_av1_psy_tpu.io import dav1d

requires_dav1d = pytest.mark.skipif(not dav1d.available(), reason="dav1d shim unavailable")


def _pan_frames(n, W, H, motion=(4, 8), seed=17):
    rng = np.random.default_rng(seed)
    base = (np.cumsum(rng.normal(0, 5, (H + 160, W + 160)), axis=1) + 128).clip(0, 255).astype(np.uint8)
    return [base[motion[0] * i : motion[0] * i + H,
                 motion[1] * i : motion[1] * i + W].copy() for i in range(n)]


def test_estimate_finds_pan():
    f = _pan_frames(2, 192, 128)
    assert estimate_global_translation(f[0], f[1]) == (32, 64)  # (4, 8) px q3


def test_estimate_rejects_static_and_noise():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (128, 192)).astype(np.uint8)
    assert estimate_global_translation(a, a) == (0, 0)
    b = rng.integers(0, 256, (128, 192)).astype(np.uint8)
    assert estimate_global_translation(a, b) == (0, 0)


def test_estimate_tiny_frame_safe():
    a = np.zeros((40, 56), np.uint8)
    assert estimate_global_translation(a, a) == (0, 0)


@requires_dav1d
def test_gm_stream_conformant_and_saves_bits():
    W, H = 192, 128
    frames = _pan_frames(5, W, H)
    u = np.full((H // 2, W // 2), 118, np.uint8)

    def encode(gm):
        cfg = EncoderConfig(width=W, height=H, recon_enabled=True,
                            enable_global_motion=gm)
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

    s_g, r_g = encode(True)
    s_o, _ = encode(False)
    assert len(s_g) < len(s_o)   # GLOBALMV absorbs the pan
    for i in range(5):
        dy, du, dv = dav1d.decode_nth(s_g, i, W, H)
        assert np.array_equal(dy, r_g[i][0]), f"frame {i}"
        assert np.array_equal(du, r_g[i][1])


@requires_dav1d
def test_gm_negative_shift_conformant():
    W, H = 160, 128
    frames = list(reversed(_pan_frames(3, W, H, motion=(4, 4))))
    u = np.full((H // 2, W // 2), 118, np.uint8)
    cfg = EncoderConfig(width=W, height=H, recon_enabled=True)
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
    for i in range(3):
        dy, _, _ = dav1d.decode_nth(stream, i, W, H)
        assert np.array_equal(dy, recons[i][0])
