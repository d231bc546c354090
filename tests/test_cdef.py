"""CDEF tests: oracle kernel equivalence + full-stream conformance."""

import ctypes

import numpy as np
import pytest

import oracle
from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.codec.cdef import (
    CDEF_VERY_LARGE,
    adjust_strength,
    filter_blocks,
    find_dir_blocks,
)
from svt_av1_psy_tpu.config import EncoderConfig
from svt_av1_psy_tpu.io import dav1d

requires_oracle = pytest.mark.skipif(not oracle.available, reason="oracle not built")
requires_dav1d = pytest.mark.skipif(not dav1d.available(), reason="dav1d shim unavailable")


@requires_oracle
def test_find_dir_bit_exact():
    lib = oracle._lib
    fn = lib.svt_aom_cdef_find_dir_c
    U16 = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    fn.argtypes = [U16, ctypes.c_int32, np.ctypeslib.ndpointer(np.int32), ctypes.c_int32]
    fn.restype = ctypes.c_uint8
    rng = np.random.default_rng(0)
    blocks = rng.integers(0, 256, (32, 8, 8)).astype(np.uint16)
    dirs, variances = find_dir_blocks(blocks)
    for i in range(32):
        var = np.zeros(1, np.int32)
        ref_dir = fn(np.ascontiguousarray(blocks[i]), 8, var, 0)
        assert dirs[i] == ref_dir, i
        assert variances[i] == var[0], i


@requires_oracle
def test_filter_block_bit_exact():
    lib = oracle._lib
    fn = lib.svt_cdef_filter_block_c
    U8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    U16 = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    fn.argtypes = [U8, ctypes.c_void_p, ctypes.c_int32, U16, ctypes.c_int32,
                   ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                   ctypes.c_int32, ctypes.c_int32, ctypes.c_uint8]
    fn.restype = None
    CDEF_BSTRIDE = 144  # ALIGN_POWER_OF_TWO(128 + 2*16, 3)
    BLOCK_8X8 = 3
    rng = np.random.default_rng(1)
    for trial in range(8):
        img = rng.integers(0, 256, (16, CDEF_BSTRIDE)).astype(np.uint16)
        pri, sec = int(rng.integers(0, 16)), int(rng.integers(0, 5))
        if sec == 3:
            sec = 4
        dirn = int(rng.integers(0, 8))
        damp = int(rng.integers(3, 7))
        dst = np.zeros((8, 8), np.uint8)
        # the C kernel reads in[-2*BSTRIDE-2 ..]; offset into the middle
        inbuf = np.ascontiguousarray(img)
        off = 4 * CDEF_BSTRIDE + 8
        fn(dst, None, 8, inbuf.reshape(-1)[off:], pri, sec, dirn, damp, damp,
           BLOCK_8X8, 0, 1)
        # our version: build (1, 12, 12) neighborhood around the same area
        flat = img.reshape(-1)
        nb = np.zeros((12, 12), np.int32)
        for r in range(12):
            nb[r] = flat[off + (r - 2) * CDEF_BSTRIDE - 2 : off + (r - 2) * CDEF_BSTRIDE + 10]
        got = filter_blocks(nb[None], np.array([dirn]), np.array([pri]), sec,
                            damp, damp, 8, 8, 8)[0]
        assert np.array_equal(got.astype(np.uint8), dst), (trial, pri, sec, dirn)


@requires_dav1d
@pytest.mark.parametrize("dims,q,bd", [((128, 128), 55, 8), ((224, 160), 60, 8),
                                       ((128, 96), 45, 10)])
def test_cdef_stream_conformant(dims, q, bd):
    W, H = dims
    rng = np.random.default_rng(W + q)
    peak = (1 << bd) - 1
    dt = np.uint8 if bd == 8 else np.uint16
    y = (np.cumsum(rng.normal(0, peak / 40, (H, W)), axis=1) + peak // 2).clip(0, peak)
    y = (y + rng.random((H, W)) * peak / 12).clip(0, peak).astype(dt)
    u = rng.integers(peak // 3, peak // 2, (H // 2, W // 2)).astype(dt)
    cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, input_depth=bd, recon_enabled=True)
    cfg.qp = q
    enc = Encoder(cfg).init()
    enc.send_picture(y, u, u.copy())
    pkt = enc.get_packet()
    dy, du, dv = dav1d.decode(pkt.data, W, H)
    ry, ru, rv = enc.get_recon()
    assert np.array_equal(dy, ry) and np.array_equal(du, ru) and np.array_equal(dv, rv)
