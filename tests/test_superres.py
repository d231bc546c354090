"""Super-resolution: normative upscaler conformance + encoder pipeline."""

import numpy as np
import pytest

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.config import EncoderConfig, SuperResMode
from svt_av1_psy_tpu.io import dav1d

requires_dav1d = pytest.mark.skipif(not dav1d.available(),
                                    reason="dav1d shim unavailable")


def _clip(W, H, n=1, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    y = ((xx * 0.7 + yy * 0.4) % 210
         + rng.normal(0, 5, (H, W))).clip(0, 255).astype(np.uint8)
    u = np.full(((H + 1) // 2, (W + 1) // 2), 118, np.uint8)
    v = np.full(((H + 1) // 2, (W + 1) // 2), 137, np.uint8)
    return [np.ascontiguousarray(np.roll(y, 2 * i, axis=1)) for i in range(n)], u, v


def test_upscaler_matches_reference_oracle():
    """Normative upscale bit-exact vs the reference C kernel
    (upscale_normative_rect) across denominators and odd widths."""
    import ctypes

    import tests.oracle as O
    from svt_av1_psy_tpu.codec.superres import (_idiv, scaled_width,
                                                upscale_plane)

    if not O.available:
        pytest.skip("oracle unavailable")
    lib = O._lib
    fn = lib.upscale_normative_rect
    fn.argtypes = [ctypes.c_void_p] + [ctypes.c_int] * 3 + [ctypes.c_void_p] \
        + [ctypes.c_int] * 7
    rng = np.random.default_rng(0)
    for upw, H in ((130, 20), (854, 8), (161, 12)):
        for denom in range(9, 17):
            dw = scaled_width(upw, denom)
            pad = 16
            src = rng.integers(0, 256, (H, dw + 2 * pad)).astype(np.uint8)
            inner = np.ascontiguousarray(src[:, pad : pad + dw])
            step = ((dw << 14) + upw // 2) // upw
            err = upw * step - (dw << 14)
            x0 = (_idiv(-((upw - dw) << 13) + upw // 2, upw)
                  + 128 - _idiv(err, 2)) & 16383
            out = np.zeros((H, upw), np.uint8)
            buf = np.ascontiguousarray(src)
            fn(buf.ctypes.data + pad, H, dw, dw + 2 * pad, out.ctypes.data,
               H, upw, upw, step, x0, 1, 1)
            assert np.array_equal(out, upscale_plane(inner, upw, 8)), \
                (upw, denom)


@requires_dav1d
@pytest.mark.parametrize("case", [
    dict(W=320, H=192, denom=9),
    dict(W=320, H=192, denom=13),
    dict(W=322, H=150, denom=9),    # non-mi-aligned downscaled width
    dict(W=320, H=192, denom=10, n=4),   # key + inter referencing upscaled
    dict(W=256, H=128, denom=12, bd=10),
])
def test_superres_stream_conformant(case):
    W, H, n, bd = case["W"], case["H"], case.get("n", 1), case.get("bd", 8)
    frames, u, v = _clip(W, H, n)
    if bd == 10:
        frames = [(f.astype(np.uint16) << 2) for f in frames]
        u = (u.astype(np.uint16) << 2)
        v = (v.astype(np.uint16) << 2)
    cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, input_depth=bd, recon_enabled=True,
                        superres_mode=SuperResMode.FIXED,
                        superres_kf_denom=case["denom"])
    cfg.qp = 35
    enc = Encoder(cfg).init()
    for i, f in enumerate(frames):
        enc.send_picture(f, u, v.copy(), pts=i)
    enc.flush()
    stream = b""
    recons = []
    while (pkt := enc.get_packet()) is not None:
        stream += pkt.data
        if pkt.recon is not None:
            recons.append(pkt.recon)
    for i in range(len(recons)):
        dy, du, dv = dav1d.decode_nth(stream, i, W, H)
        assert np.array_equal(dy, recons[i][0]), f"frame {i} luma"
        assert np.array_equal(du, recons[i][1]), f"frame {i} U"
        assert np.array_equal(dv, recons[i][2]), f"frame {i} V"


@requires_dav1d
def test_superres_saves_bits_at_similar_quality():
    """The point of superres: fewer coded pixels on the key frame."""
    W, H = 480, 270
    frames, u, v = _clip(W, H, 1)

    def run(mode, denom):
        cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, recon_enabled=True,
                            stat_report=True, superres_mode=mode,
                            superres_kf_denom=denom)
        cfg.qp = 45
        enc = Encoder(cfg).init()
        enc.send_picture(frames[0].copy(), u, v.copy())
        pkt = enc.get_packet()
        return len(pkt.data), pkt.stats["psnr_y"]

    b_off, q_off = run(SuperResMode.NONE, 8)
    b_on, q_on = run(SuperResMode.FIXED, 12)
    assert b_on < b_off            # fewer bits
    assert q_on > q_off - 3.0      # bounded quality cost


@requires_dav1d
@pytest.mark.parametrize("mode", [2, 3, 4])
def test_superres_auto_modes_conformant(mode):
    """RANDOM / QTHRESH / AUTO denominator policies (super_res.c
    SUPERRES_{RANDOM,QTHRESH,AUTO}) ride the FIXED machinery and stay
    dav1d-bit-exact."""
    from svt_av1_psy_tpu.config import SuperResMode

    rng = np.random.default_rng(11)
    W, H, N = 160, 96, 4
    base = (np.cumsum(rng.normal(0, 5, (H + 32, W + 32)), axis=1)
            + 128).clip(0, 255).astype(np.uint8)
    frames = [base[i : i + H, 2 * i : 2 * i + W].copy() for i in range(N)]
    u = np.full((H // 2, W // 2), 118, np.uint8)
    cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, superres_mode=SuperResMode(mode),
                        recon_enabled=True, preset=10, superres_kf_qthres=43)
    cfg.qp = 55 if mode == 3 else 35
    enc = Encoder(cfg).init()
    pkts = []
    for f in frames:
        enc.send_picture(f, u, u.copy())
        while (p := enc.get_packet()) is not None:
            pkts.append(p)
    enc.flush()
    while (p := enc.get_packet()) is not None:
        pkts.append(p)
    stream = b"".join(p.data for p in pkts)
    disp = [p for p in pkts if p.recon is not None]
    assert len(disp) == N
    for i, p in enumerate(disp):
        d = dav1d.decode_nth(stream, i, W, H)
        assert all(np.array_equal(a, b) for a, b in zip(d, p.recon)), i
