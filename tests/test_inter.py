"""Inter (P-frame) conformance tests: IPPP streams must decode bit-exactly."""

import numpy as np
import pytest

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.config import EncoderConfig
from svt_av1_psy_tpu.io import dav1d

requires_dav1d = pytest.mark.skipif(not dav1d.available(), reason="dav1d shim unavailable")


def _encode_seq(W, H, n, q, bd=8, tiles=(0, 0), vb=False, motion=(3, 5), keyint=-2, seed=0):
    rng = np.random.default_rng(seed)
    peak = (1 << bd) - 1
    dt = np.uint8 if bd == 8 else np.uint16
    base = (np.cumsum(rng.normal(0, peak / 50, (H + 64, W + 64)), axis=1)
            + np.cumsum(rng.normal(0, peak / 80, (H + 64, W + 64)), axis=0)
            + peak // 2).clip(0, peak).astype(dt)
    cfg = EncoderConfig(width=W, height=H, input_depth=bd, recon_enabled=True,
                        tile_columns=tiles[0], tile_rows=tiles[1],
                        enable_variance_boost=vb, intra_period_length=keyint)
    cfg.qp = q
    enc = Encoder(cfg).init()
    for i in range(n):
        y = base[16 + i * motion[0] : 16 + i * motion[0] + H,
                 16 + i * motion[1] : 16 + i * motion[1] + W].copy()
        u = (base[: (H + 1) // 2, : (W + 1) // 2] // 2 + peak // 4).astype(dt)
        enc.send_picture(y, u, u.copy(), pts=i)
    enc.flush()
    stream = b""
    recons = []
    while (pkt := enc.get_packet()) is not None:
        stream += pkt.data
        if pkt.recon is not None:      # display packets, in display order
            recons.append(pkt.recon)
    return stream, recons


def _check(stream, recons, W, H):
    for i in range(len(recons)):
        dy, du, dv = dav1d.decode_nth(stream, i, W, H)
        assert np.array_equal(dy, recons[i][0]), f"frame {i} luma"
        if recons[i][1] is not None:
            assert np.array_equal(du, recons[i][1]), f"frame {i} U"
            assert np.array_equal(dv, recons[i][2]), f"frame {i} V"


@requires_dav1d
@pytest.mark.parametrize("case", [
    dict(W=160, H=128, n=4, q=45),                      # basic IPPP with motion
    dict(W=128, H=96, n=3, q=40, bd=10),                 # 10-bit inter
    dict(W=192, H=128, n=3, q=45, tiles=(1, 0)),         # tiles
    dict(W=160, H=96, n=5, q=45, keyint=2),              # periodic key frames
    dict(W=102, H=74, n=3, q=45),                        # odd dims
    dict(W=128, H=128, n=3, q=50, vb=True),              # variance boost P-frames
    dict(W=160, H=128, n=3, q=45, motion=(0, 0)),        # static (skip-heavy)
])
def test_ipp_stream_conformant(case):
    W, H = case["W"], case["H"]
    kw = {k: v for k, v in case.items() if k not in ("W", "H")}
    stream, recons = _encode_seq(W, H, **kw)
    _check(stream, recons, W, H)


@requires_dav1d
def test_inter_beats_intra_rate():
    """P-frames of a panning scene must be much smaller than key frames."""
    stream, recons = _encode_seq(160, 128, 4, 45, seed=3)
    # extract per-TU sizes: re-encode tracking packet sizes
    rng = np.random.default_rng(3)
    base = (np.cumsum(rng.normal(0, 255 / 50, (128 + 64, 160 + 64)), axis=1)
            + np.cumsum(rng.normal(0, 255 / 80, (128 + 64, 160 + 64)), axis=0)
            + 127).clip(0, 255).astype(np.uint8)
    cfg = EncoderConfig(width=160, height=128, enable_variance_boost=False)
    cfg.qp = 45
    enc = Encoder(cfg).init()
    for i in range(4):
        y = base[16 + 3 * i : 144 + 3 * i, 16 + 5 * i : 176 + 5 * i].copy()
        u = np.full((64, 80), 120, np.uint8)
        enc.send_picture(y, u, u.copy())
    enc.flush()
    sizes = []
    while (pkt := enc.get_packet()) is not None:
        sizes.append(len(pkt.data))
    assert all(s < sizes[0] for s in sizes[1:]), sizes


@requires_dav1d
def test_device_inter_search_backend_conformant():
    """The device (ops/inter_search) decision backend must produce
    conformant streams with compression comparable to the native kernel."""
    import svt_av1_psy_tpu.codec.inter_encoder as ie

    ie.SEARCH_BACKEND = "device"
    try:
        stream, recons = _encode_seq(160, 128, 5, 45, seed=2)
    finally:
        ie.SEARCH_BACKEND = "native"
    _check(stream, recons, 160, 128)
    stream_n, _ = _encode_seq(160, 128, 5, 45, seed=2)
    assert len(stream) < len(stream_n) * 1.25, (len(stream), len(stream_n))
