"""Lossless mode (--lossless, EbSvtAv1Enc.h:940): qindex-0 WHT-4x4
all-intra coding. CodedLossless streams must reconstruct the source
EXACTLY (encoder recon and oracle decode), across bit depths, odd
dimensions, and the forced rect edge leaves of partial superblocks."""

import numpy as np
import pytest

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.config import EncoderConfig, SvtAv1Error
from svt_av1_psy_tpu.io import dav1d

requires_dav1d = pytest.mark.skipif(not dav1d.available(),
                                    reason="dav1d shim unavailable")


def _planes(W, H, bd, seed=0):
    rng = np.random.default_rng(seed)
    pk = (1 << bd) - 1
    dt = np.uint16 if bd > 8 else np.uint8
    y = rng.integers(0, pk + 1, (H, W)).astype(dt)
    y[: H // 2] = (np.linspace(0, pk, W, dtype=np.int64)[None, :]
                   + rng.integers(-5, 6, (H // 2, W))).clip(0, pk).astype(dt)
    u = rng.integers(0, pk + 1, ((H + 1) // 2, (W + 1) // 2)).astype(dt)
    v = rng.integers(0, pk + 1, ((H + 1) // 2, (W + 1) // 2)).astype(dt)
    return y, u, v


def _encode(W, H, bd, y, u, v):
    cfg = EncoderConfig(width=W, height=H, recon_enabled=True,
                        intra_period_length=0, input_depth=bd)
    cfg.lossless = True
    enc = Encoder(cfg).init()
    enc.send_picture(y, u, v.copy())
    return enc.get_packet()


def test_wht_roundtrip_exact():
    from svt_av1_psy_tpu.codec.transforms import fwht4x4, iwht4x4_add

    rng = np.random.default_rng(0)
    for bd in (8, 10):
        pk = (1 << bd) - 1
        pred = rng.integers(0, pk + 1, (64, 4, 4)).astype(np.uint16)
        src = rng.integers(0, pk + 1, (64, 4, 4)).astype(np.uint16)
        co = fwht4x4(src.astype(np.int32) - pred.astype(np.int32))
        assert (co % 4 == 0).all()          # UNIT_QUANT_FACTOR scaling
        assert np.array_equal(iwht4x4_add(co, pred, bd), src)


@requires_dav1d
@pytest.mark.parametrize("W,H,bd", [
    (128, 96, 8),     # forced 64x32 HORZ leaves in the partial SB row
    (16, 32, 8),      # forced 16x32 VERT leaf (lossless CFL rule corner)
    (32, 16, 8),
    (130, 70, 8),     # odd dims; out-of-frame txbs skipped
    (128, 96, 10),
])
def test_lossless_exact_and_conformant(W, H, bd):
    y, u, v = _planes(W, H, bd)
    pkt = _encode(W, H, bd, y, u, v)
    rec = pkt.recon
    assert np.array_equal(rec[0][:H, :W], y)
    assert np.array_equal(rec[1], u) and np.array_equal(rec[2], v)
    dy, du, dv = dav1d.decode(pkt.data, W, H)
    assert np.array_equal(dy, y)
    assert np.array_equal(du, u) and np.array_equal(dv, v)


@requires_dav1d
def test_lossless_multiframe_all_intra():
    W, H, n = 96, 64, 3
    cfg = EncoderConfig(width=W, height=H, recon_enabled=True,
                        intra_period_length=0)
    cfg.lossless = True
    enc = Encoder(cfg).init()
    frames = [_planes(W, H, 8, seed=i) for i in range(n)]
    pkts = []
    for (y, u, v) in frames:
        enc.send_picture(y, u, v.copy())
        pkts.append(enc.get_packet())
    stream = b"".join(p.data for p in pkts)
    for i, (y, u, v) in enumerate(frames):
        d = dav1d.decode_nth(stream, i, W, H)
        assert np.array_equal(d[0], y), i


def test_lossless_rejects_incompatible_modes():
    cfg = EncoderConfig(width=64, height=64)
    cfg.lossless = True                      # default keyint is not intra-only
    with pytest.raises(SvtAv1Error):
        Encoder(cfg).init()
    cfg2 = EncoderConfig(width=64, height=64, intra_period_length=0)
    cfg2.lossless = True
    cfg2.film_grain_denoise_strength = 8
    with pytest.raises(SvtAv1Error):
        Encoder(cfg2).init()
