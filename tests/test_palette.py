"""Palette (screen content) coding: streams must decode bit-exactly and
palette must pay for itself on synthetic screen content."""

import numpy as np
import pytest

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.config import EncoderConfig
from svt_av1_psy_tpu.io import dav1d

requires_dav1d = pytest.mark.skipif(not dav1d.available(),
                                    reason="dav1d shim unavailable")


def _screen(W, H, bd=8, seed=4):
    peak = (1 << bd) - 1
    dt = np.uint8 if bd == 8 else np.uint16
    y = np.full((H, W), (200 * peak) // 255, dt)
    y[H // 6 : H // 3, W // 16 : W - W // 16] = (30 * peak) // 255
    y[H // 2 : H - H // 4, W // 8 : W // 2 - 5] = (120 * peak) // 255
    y[H // 2 : H - H // 4, W // 2 + 5 : W - W // 8] = (60 * peak) // 255
    for r in range(H // 6 + 2, H // 3 - 2, 4):        # text strokes
        y[r : r + 2, W // 16 + 2 : W - W // 16 - 2 : 7] = (220 * peak) // 255
    u = np.full(((H + 1) // 2, (W + 1) // 2), peak // 2, dt)
    return y, u


@requires_dav1d
@pytest.mark.parametrize("case", [
    dict(W=192, H=128, q=35),
    dict(W=130, H=94, q=40),            # odd dims (palette skips edge blocks)
    dict(W=128, H=128, q=35, bd=10),    # 10-bit colors
    dict(W=192, H=128, q=35, tiles=(1, 0)),
])
def test_palette_stream_conformant(case):
    W, H, bd = case["W"], case["H"], case.get("bd", 8)
    y, u = _screen(W, H, bd)
    cfg = EncoderConfig(width=W, height=H, input_depth=bd, recon_enabled=True,
                        screen_content_mode=1, palette_level=6,
                        tile_columns=case.get("tiles", (0, 0))[0],
                        tile_rows=case.get("tiles", (0, 0))[1])
    cfg.qp = case["q"]
    enc = Encoder(cfg).init()
    enc.send_picture(y, u, u.copy())
    pkt = enc.get_packet()
    dy, du, dv = dav1d.decode(pkt.data, W, H)
    ry, ru, rv = enc.get_recon()
    assert np.array_equal(dy, ry)
    assert np.array_equal(du, ru)
    assert np.array_equal(dv, rv)


@requires_dav1d
def test_palette_usage_and_gain():
    """Palette must actually be chosen on screen content and shrink the
    stream at equal qindex."""
    import svt_av1_psy_tpu.codec.intra_encoder as IEE

    W, H = 192, 128
    y, u = _screen(W, H)

    used = {}
    orig = IEE.IntraFrameEncoder._write_palette_info

    def spy(self, mi_row, mi_col, bsize, y_mode, uv_is_dc, pal_info):
        if pal_info is not None:
            used[(mi_row, mi_col)] = len(pal_info[0])
        return orig(self, mi_row, mi_col, bsize, y_mode, uv_is_dc, pal_info)

    def run(level):
        cfg = EncoderConfig(width=W, height=H, recon_enabled=True,
                            screen_content_mode=1, palette_level=level)
        cfg.qp = 35
        enc = Encoder(cfg).init()
        enc.send_picture(y.copy(), u, u.copy())
        return enc.get_packet()

    IEE.IntraFrameEncoder._write_palette_info = spy
    try:
        pkt_on = run(6)
    finally:
        IEE.IntraFrameEncoder._write_palette_info = orig
    pkt_off = run(0)
    assert len(used) >= 4
    assert len(pkt_on.data) < len(pkt_off.data) * 0.7
    # both streams decode bit-exactly
    dy, _, _ = dav1d.decode(pkt_on.data, W, H)
    assert np.array_equal(dy, pkt_on.recon[0])


@requires_dav1d
def test_palette_inter_sequence_conformant():
    """Key frame with palette followed by P frames (palette state must not
    leak into inter syntax)."""
    W, H = 160, 96
    y, u = _screen(W, H)
    cfg = EncoderConfig(width=W, height=H, recon_enabled=True,
                        screen_content_mode=1, palette_level=6)
    cfg.qp = 40
    enc = Encoder(cfg).init()
    for i in range(3):
        yi = np.roll(y, i * 2, axis=1)
        enc.send_picture(np.ascontiguousarray(yi), u, u.copy(), pts=i)
    enc.flush()
    stream = b""
    recons = []
    while (pkt := enc.get_packet()) is not None:
        stream += pkt.data
        if pkt.recon is not None:
            recons.append(pkt.recon)
    for i in range(len(recons)):
        dy, du, dv = dav1d.decode_nth(stream, i, W, H)
        assert np.array_equal(dy, recons[i][0]), f"frame {i}"
