"""Warped motion (ROTZOOM global motion): kernel + end-to-end conformance."""

import numpy as np
import pytest

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.config import EncoderConfig, PredStructure
from svt_av1_psy_tpu.io import dav1d

requires_dav1d = pytest.mark.skipif(not dav1d.available(),
                                    reason="dav1d shim unavailable")


def test_warp_filter_table_integrity():
    """Every phase's taps must sum to 128 (unity DC gain); guards the
    table extraction against sign-parsing regressions."""
    from svt_av1_psy_tpu.codec.warp import _tables

    wf, dl = _tables()
    assert wf.shape == (193, 8)
    assert (wf.sum(axis=1) == 128).all()
    assert dl.shape == (257,) and dl[0] == 16384


def test_warp_kernel_matches_reference_oracle():
    import ctypes

    import tests.oracle as O
    from svt_av1_psy_tpu.codec.warp import ROTZOOM, get_shear_params, warp_plane

    if not O.available:
        pytest.skip("oracle unavailable")

    class ConvParams(ctypes.Structure):
        _fields_ = [("ref", ctypes.c_int32), ("do_average", ctypes.c_int32),
                    ("dst", ctypes.c_void_p), ("dst_stride", ctypes.c_int32),
                    ("round_0", ctypes.c_int32), ("round_1", ctypes.c_int32),
                    ("plane", ctypes.c_int32), ("is_compound", ctypes.c_int32),
                    ("use_jnt_comp_avg", ctypes.c_int32),
                    ("fwd_offset", ctypes.c_int32),
                    ("bck_offset", ctypes.c_int32),
                    ("use_dist_wtd_comp_avg", ctypes.c_int32)]

    lib = O._lib
    fn = lib.svt_av1_warp_affine_c
    fn.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
                   ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
                   ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                   ctypes.c_int, ctypes.c_int, ctypes.POINTER(ConvParams),
                   ctypes.c_int16, ctypes.c_int16, ctypes.c_int16,
                   ctypes.c_int16]
    rng = np.random.default_rng(0)
    H, W = 96, 128
    ref = rng.integers(0, 256, (H, W)).astype(np.uint8)
    n = 0
    for _ in range(40):
        a = int(rng.integers(-900, 901))
        b = int(rng.integers(-900, 901))
        tx = int(rng.integers(-40, 41)) << 10
        ty = int(rng.integers(-40, 41)) << 10
        mat = [tx, ty, (1 << 16) + a, b, -b, (1 << 16) + a]
        shear = get_shear_params(mat)
        if shear is None:
            continue
        for (px, py, pw, ph, ssx, ssy) in ((16, 8, 32, 16, 0, 0),
                                           (8, 8, 8, 8, 1, 1),
                                           (0, 0, 64, 32, 0, 0)):
            cp = ConvParams(0, 0, None, 0, 3, 11, 0, 0, 0, 0, 0, 0)
            pred = np.zeros((ph, pw), np.uint8)
            m2 = np.array(mat, np.int32)
            m2[5] = m2[2]
            m2[4] = -m2[3]
            fn(m2.ctypes.data, ref.ctypes.data, W, H, W, pred.ctypes.data,
               px, py, pw, ph, pw, ssx, ssy, ctypes.byref(cp),
               *[int(v) for v in shear])
            mine = warp_plane(ROTZOOM, mat, shear, ref, px, py, pw, ph,
                              ssx, ssy, 8)
            assert np.array_equal(pred, mine.astype(np.uint8)), (mat, px, py)
            n += 1
    assert n >= 60


def _zoom_clip(W, H, n, step=0.012, seed=3):
    rng = np.random.default_rng(seed)
    base = np.clip(np.cumsum(rng.normal(0, 5, (H * 2, W * 2)), axis=1) + 128,
                   0, 255)
    yy, xx = np.mgrid[0:H, 0:W]
    out = []
    for i in range(n):
        s = 1.0 + step * i
        sx = (xx - W / 2) / s + W / 2 + W / 2
        sy = (yy - H / 2) / s + H / 2 + H / 2
        out.append(base[np.clip(np.round(sy).astype(int), 0, H * 2 - 1),
                        np.clip(np.round(sx).astype(int), 0, W * 2 - 1)]
                   .astype(np.uint8))
    return out


@requires_dav1d
def test_rotzoom_stream_conformant():
    """Zooming content: the encoder detects a ROTZOOM model, codes it, and
    GLOBALMV warp blocks must decode bit-exactly."""
    import svt_av1_psy_tpu.codec.inter_encoder as IE

    W, H = 320, 224
    frames = _zoom_clip(W, H, 4)
    u = np.full((H // 2, W // 2), 118, np.uint8)
    v = np.full((H // 2, W // 2), 137, np.uint8)
    warp_frames = [0]
    orig = IE.InterFrameEncoder._gm_warp_luma

    def spy(self):
        warp_frames[0] += 1
        return orig(self)

    IE.InterFrameEncoder._gm_warp_luma = spy
    try:
        cfg = EncoderConfig(width=W, height=H, recon_enabled=True, preset=4,
                            pred_structure=PredStructure.LOW_DELAY)
        cfg.qp = 40
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
    finally:
        IE.InterFrameEncoder._gm_warp_luma = orig
    assert warp_frames[0] > 0, "rotzoom model never engaged"
    for i in range(len(recons)):
        dy, du, dv = dav1d.decode_nth(stream, i, W, H)
        assert np.array_equal(dy, recons[i][0]), f"frame {i} luma"
        assert np.array_equal(du, recons[i][1]), f"frame {i} U"
        assert np.array_equal(dv, recons[i][2]), f"frame {i} V"


def test_rotzoom_estimation_recovers_zoom():
    from svt_av1_psy_tpu.codec.global_motion import estimate_global_rotzoom

    frames = _zoom_clip(320, 224, 2)
    wm = estimate_global_rotzoom(frames[0], frames[1])
    assert wm is not None
    # zoom-in by 1.2%: mat2 approx 65536/1.012
    assert abs(wm[2] - 65536 / 1.012) < 120
    assert wm[2] % 2 == 0 and wm[3] % 2 == 0      # header-codable precision
    assert wm[0] % 1024 == 0 and wm[1] % 1024 == 0
