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
    cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, input_depth=bd, recon_enabled=True,
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
        cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, recon_enabled=True,
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
    cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, recon_enabled=True,
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


def test_intrabc_conformant_and_effective():
    """IBC (use_intrabc) on screen-content key frames: tiled content codes
    mostly as block copies, the stream shrinks vs IBC-off, and dav1d decodes
    bit-exactly (write_intrabc_info, entropy_coding.c:4299; is_dv_valid,
    adaptive_mv_pred.c:1831)."""
    import svt_av1_psy_tpu.codec.intra_encoder as IE
    from svt_av1_psy_tpu.api import Encoder
    from svt_av1_psy_tpu.io import dav1d

    rng = np.random.default_rng(5)
    tile = (rng.integers(0, 2, (32, 32)) * 235 + 10).astype(np.uint8)
    W, H = 320, 128
    y = np.tile(tile, (H // 32, W // 32)).astype(np.uint8)
    u = np.full((H // 2, W // 2), 128, np.uint8)

    orig = IE.IntraFrameEncoder._write_dv
    n = [0]

    def spy(self, *a, **k):
        n[0] += 1
        return orig(self, *a, **k)

    IE.IntraFrameEncoder._write_dv = spy
    try:
        sizes = {}
        rec = None
        pkt = None
        for ibc in (-1, 0):
            cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, preset=4,
                                recon_enabled=True)
            cfg.qp = 40
            cfg.screen_content_mode = 1
            cfg.intrabc_mode = ibc
            enc = Encoder(cfg).init()
            enc.send_picture(y, u, u.copy())
            p = enc.get_packet()
            sizes[ibc] = len(p.data)
            if ibc == -1:
                pkt, rec = p, enc.get_recon()
    finally:
        IE.IntraFrameEncoder._write_dv = orig
    assert n[0] > 50, f"IBC should win on tiled content ({n[0]} blocks)"
    assert sizes[-1] < sizes[0] * 0.6, f"IBC should shrink the stream: {sizes}"
    if dav1d.available():
        dy, du, dv = dav1d.decode(pkt.data, W, H)
        assert np.array_equal(dy, rec[0])
        assert np.array_equal(du, rec[1])
        assert np.array_equal(dv, rec[2])
