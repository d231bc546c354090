"""SGR filter bit-exactness vs the reference oracle + search sanity."""

import ctypes
from pathlib import Path

import numpy as np
import pytest

from svt_av1_psy_tpu.codec import sgr

_ORACLE = Path("/tmp/refbin/liboracle.so")
requires_oracle = pytest.mark.skipif(not _ORACLE.is_file(),
                                     reason="reference oracle unavailable")


def _oracle_sgr(dat_ext: np.ndarray, w: int, h: int, ep: int, xqd, bd=8):
    lib = ctypes.CDLL(str(_ORACLE))
    fn = lib.svt_apply_selfguided_restoration_c
    fn.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
                   ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
                   ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
                   ctypes.c_int32, ctypes.c_int32]
    stride = dat_ext.shape[1]
    dat8 = np.ascontiguousarray(dat_ext, np.uint8)
    dst = np.zeros((h + 8, w + 8), np.uint8)
    tmp = np.zeros(2 * 1024 * 1024, np.int32)
    xqd_arr = (ctypes.c_int32 * 2)(*xqd)
    # dat pointer at the unit origin (3-pixel context around it is valid)
    fn(dat8.ctypes.data + 3 * stride + 3, w, h, stride, ep, xqd_arr,
       dst.ctypes.data, dst.shape[1], tmp.ctypes.data, bd, 0)
    return dst[:h, :w].astype(np.int64)


@requires_oracle
@pytest.mark.parametrize("ep", list(range(16)))
def test_sgr_filter_bit_exact(ep):
    rng = np.random.default_rng(ep)
    w, h = 40, 36
    dat_ext = rng.integers(0, 256, (h + 6, w + 6)).astype(np.uint8)
    r0, r1, _, _ = sgr.SGR_PARAMS[ep]
    xqd = [0, 0]
    if r0 > 0:
        xqd[0] = int(rng.integers(sgr.SGRPROJ_PRJ_MIN0, sgr.SGRPROJ_PRJ_MAX0 + 1))
    if r1 > 0:
        xqd[1] = int(rng.integers(sgr.SGRPROJ_PRJ_MIN1, sgr.SGRPROJ_PRJ_MAX1 + 1))
    elif r0 > 0:
        xqd[1] = int(np.clip(128 - xqd[0], sgr.SGRPROJ_PRJ_MIN1, sgr.SGRPROJ_PRJ_MAX1))
    ours = sgr.sgr_filter_block(dat_ext.astype(np.int64), w, h, ep, xqd, 8)
    ref = _oracle_sgr(dat_ext, w, h, ep, xqd, 8)
    assert np.array_equal(ours, ref), f"ep {ep}: max diff {np.abs(ours-ref).max()}"


@requires_oracle
def test_sgr_filter_bit_exact_odd_sizes():
    rng = np.random.default_rng(99)
    for (w, h) in ((64, 64), (17, 29), (64, 13)):
        dat_ext = rng.integers(0, 256, (h + 6, w + 6)).astype(np.uint8)
        xqd = (-32, 60)
        ours = sgr.sgr_filter_block(dat_ext.astype(np.int64), w, h, 4, xqd, 8)
        ref = _oracle_sgr(dat_ext, w, h, 4, xqd, 8)
        assert np.array_equal(ours, ref), (w, h)


def test_sgr_search_improves_noisy_unit():
    rng = np.random.default_rng(5)
    w = h = 64
    clean = (np.cumsum(rng.normal(0, 4, (h, w)), axis=1) + 128).clip(0, 255)
    noisy = np.clip(clean + rng.normal(0, 5, (h, w)), 0, 255).astype(np.int64)
    dat_ext = np.pad(noisy, 3, mode="edge")
    ep, xqd, sse = sgr.search_sgr_unit(clean.astype(np.int64), dat_ext, w, h)
    base_sse = int(((noisy - clean.astype(np.int64)) ** 2).sum())
    assert sse < base_sse, f"SGR should denoise: {sse} vs {base_sse}"


@pytest.mark.skipif(not Path("/usr/lib/x86_64-linux-gnu/libdav1d.so.6").exists(),
                    reason="dav1d unavailable")
def test_sgr_stream_conformant():
    """End-to-end: a stream whose LR search picks SGR/SWITCHABLE units must
    decode bit-exactly (dav1d applies the normative SGR in its loop)."""
    from svt_av1_psy_tpu.api import Encoder
    from svt_av1_psy_tpu.codec.restoration import (RESTORE_NONE,
                                                   RESTORE_SGRPROJ,
                                                   RESTORE_SWITCHABLE)
    from svt_av1_psy_tpu.config import EncoderConfig
    from svt_av1_psy_tpu.io import dav1d

    rng = np.random.default_rng(11)
    W = H = 128
    clean = (np.cumsum(rng.normal(0, 4, (H, W)), axis=1) + 128).clip(0, 255)
    y = np.clip(clean + rng.normal(0, 4, (H, W)), 0, 255).astype(np.uint8)
    u = np.full((64, 64), 128, np.uint8)
    cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, recon_enabled=True, preset=6,
                        enable_restoration_filtering=1)
    cfg.qp = 45
    enc = Encoder(cfg).init()
    enc.send_picture(y, u, u.copy())
    pkt = enc.get_packet()
    dy, du, dv = dav1d.decode(pkt.data, W, H)
    r = enc.get_recon()
    assert np.array_equal(dy, r[0]) and np.array_equal(du, r[1])


def test_native_selfguided_matches_numpy():
    """The C sgr core must be bit-identical to the numpy reference across
    all eps, odd sizes and bit depths."""
    from svt_av1_psy_tpu.codec import mc_native
    if not mc_native.available():
        pytest.skip("native kernels unavailable")
    rng = np.random.default_rng(1)
    for bd in (8, 10):
        peak = (1 << bd) - 1
        for (w, h) in ((64, 64), (17, 29), (64, 13)):
            d = rng.integers(0, peak + 1, (h + 6, w + 6)).astype(np.int64)
            d32 = np.ascontiguousarray(d, np.int32)
            for ep in range(16):
                r0, r1, _, _ = sgr.SGR_PARAMS[ep]
                a0, a1 = mc_native.sgr_selfguided(d32, w, h, ep, bd,
                                                  r0 > 0, r1 > 0)
                orig = mc_native.available
                mc_native.available = lambda: False
                try:
                    b0, b1 = sgr.selfguided_restoration(d, w, h, ep, bd)
                finally:
                    mc_native.available = orig
                if r0 > 0:
                    assert np.array_equal(a0, b0), (bd, w, h, ep)
                if r1 > 0:
                    assert np.array_equal(a1, b1), (bd, w, h, ep)
