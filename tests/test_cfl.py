"""CFL (chroma-from-luma) intra prediction: AC math + stream conformance."""

import numpy as np
import pytest

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.codec.intra_encoder import IntraFrameEncoder
from svt_av1_psy_tpu.config import EncoderConfig
from svt_av1_psy_tpu.io import dav1d

requires_dav1d = pytest.mark.skipif(not dav1d.available(), reason="dav1d shim unavailable")


def test_cfl_ac_zero_mean():
    rng = np.random.default_rng(0)
    luma = rng.integers(0, 256, (32, 32)).astype(np.uint16)
    ac = IntraFrameEncoder._cfl_ac(luma, 16, 16)
    assert ac.shape == (16, 16)
    assert abs(int(ac.sum())) <= 16 * 16  # mean removed up to rounding
    # q3 scale: flat luma -> exactly zero AC
    ac0 = IntraFrameEncoder._cfl_ac(np.full((32, 32), 99, np.uint16), 16, 16)
    assert np.all(ac0 == 0)


def _encode(y, u, v, bd=8, q=35, cfl=True):
    H, W = y.shape
    cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, input_depth=bd, recon_enabled=True)
    cfg.qp = q
    enc = Encoder(cfg).init()
    if not cfl:
        orig = IntraFrameEncoder.__init__

        def patched(self, *a, **k):
            orig(self, *a, **k)
            self.enable_cfl = False

        IntraFrameEncoder.__init__ = patched
        try:
            enc.send_picture(y, u, v)
        finally:
            IntraFrameEncoder.__init__ = orig
    else:
        enc.send_picture(y, u, v)
    return enc.get_packet()


def _correlated(W, H, bd=8, seed=2):
    rng = np.random.default_rng(seed)
    peak = (1 << bd) - 1
    dt = np.uint8 if bd == 8 else np.uint16
    y = (np.cumsum(rng.normal(0, peak / 40, (H, W)), axis=1) + peak // 2).clip(0, peak).astype(dt)
    ch, cw = (H + 1) // 2, (W + 1) // 2
    u = (y[::2, ::2][:ch, :cw] // 2 + peak // 5).astype(dt)
    v = (peak - y[::2, ::2][:ch, :cw] // 3).astype(dt)
    return y, u, v


@requires_dav1d
@pytest.mark.parametrize("case", [dict(W=128, H=96), dict(W=96, H=64, bd=10),
                                  dict(W=106, H=74), dict(W=48, H=48, q=20)])
def test_cfl_stream_conformant(case):
    W, H = case.pop("W"), case.pop("H")
    y, u, v = _correlated(W, H, case.get("bd", 8))
    pkt = _encode(y, u, v, **case)
    dy, du, dv = dav1d.decode(pkt.data, W, H)
    assert np.array_equal(dy, pkt.recon[0])
    assert np.array_equal(du, pkt.recon[1])
    assert np.array_equal(dv, pkt.recon[2])


@requires_dav1d
def test_cfl_improves_correlated_chroma():
    y, u, v = _correlated(128, 96)
    on = _encode(y, u, v, cfl=True)
    off = _encode(y, u, v, cfl=False)
    assert on.data != off.data, "CFL never selected"
    assert len(on.data) <= len(off.data) * 1.02  # not worse; usually smaller


@requires_dav1d
def test_cfl_video_ipp_conformant():
    """CFL key frame followed by P-frames referencing it."""
    W, H = 96, 64
    y, u, v = _correlated(W, H, seed=5)
    cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, recon_enabled=True)
    cfg.qp = 40
    enc = Encoder(cfg).init()
    for i in range(3):
        enc.send_picture(np.roll(y, i, axis=1), u, v, pts=i)
    enc.flush()
    stream = b""
    recons = []
    while (pkt := enc.get_packet()) is not None:
        stream += pkt.data
        if pkt.recon is not None:
            recons.append(pkt.recon)
    for i in range(3):
        dy, du, dv = dav1d.decode_nth(stream, i, W, H)
        assert np.array_equal(dy, recons[i][0]) and np.array_equal(du, recons[i][1])
