"""Third reference (7-ref roles increment, pd_process.c:1030-1055): the
GoP anchor rides as GOLDEN beside LAST+ALTREF; a post-decide rescue pass
flips poorly-predicted leaves to it. The win case is content visible at
the anchor but occluded at BOTH interval endpoints."""

import numpy as np
import pytest

import svt_av1_psy_tpu.codec.inter_encoder as IE
from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.config import EncoderConfig
from svt_av1_psy_tpu.io import dav1d

requires_dav1d = pytest.mark.skipif(not dav1d.available(),
                                    reason="dav1d shim unavailable")

W, H = 192, 128


def _occlusion_clip():
    rng = np.random.default_rng(9)
    bg = (np.cumsum(rng.normal(0, 5, (H, W)), axis=1)
          + 128).clip(0, 255).astype(np.uint8)
    occ = rng.integers(0, 256, (64, 96)).astype(np.uint8)
    frames = []
    for i in range(9):
        f = bg.copy()
        if i in (4, 8):        # occluder only at the mid/end anchors
            f[32:96, 48:144] = occ
        frames.append(f)
    u = np.full((H // 2, W // 2), 120, np.uint8)
    v = np.full((H // 2, W // 2), 132, np.uint8)
    return frames, u, v


def _encode(frames, u, v, rescue=True):
    rescued = [0]
    orig = IE.InterFrameEncoder._third_ref_rescue

    def spy(self, dec_map, costj):
        before = dict(dec_map)
        orig(self, dec_map, costj)
        rescued[0] += sum(1 for k in dec_map if dec_map[k] != before.get(k))

    IE.InterFrameEncoder._third_ref_rescue = (
        spy if rescue else (lambda self, a, b: None))
    try:
        cfg = EncoderConfig(width=W, height=H, preset=6, recon_enabled=True,
                            stat_report=True)
        cfg.qp = 35
        cfg.inter_me_backend = "native"
        enc = Encoder(cfg).init()
        pkts = []
        for f in frames:
            enc.send_picture(f, u, v.copy())
            while (p := enc.get_packet()) is not None:
                pkts.append(p)
        enc.flush()
        while (p := enc.get_packet()) is not None:
            pkts.append(p)
    finally:
        IE.InterFrameEncoder._third_ref_rescue = orig
    return pkts, rescued[0]


@requires_dav1d
def test_golden_rescue_conformant_and_wins():
    frames, u, v = _occlusion_clip()
    pkts, n_rescued = _encode(frames, u, v, rescue=True)
    assert n_rescued > 0, "anchor rescue never engaged; test is vacuous"
    stream = b"".join(p.data for p in pkts)
    disp = [p for p in pkts if p.recon is not None]
    for i, p in enumerate(disp):
        d = dav1d.decode_nth(stream, i, W, H)
        assert all(np.array_equal(a, b) for a, b in zip(d, p.recon)), i
    # the third reference must pay for itself on its win case
    pkts_off, _ = _encode(frames, u, v, rescue=False)
    bytes_on = sum(len(p.data) for p in pkts)
    bytes_off = sum(len(p.data) for p in pkts_off)
    psnr = np.mean([p.stats["psnr_y"] for p in pkts if p.stats])
    psnr_off = np.mean([p.stats["psnr_y"] for p in pkts_off if p.stats])
    assert bytes_on <= bytes_off
    assert psnr >= psnr_off - 0.01
