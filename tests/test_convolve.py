"""Subpel convolve bit-exactness vs reference C kernels."""

import ctypes

import numpy as np
import pytest

import oracle
from svt_av1_psy_tpu.codec.convolve import convolve_2d_sr, get_filter_kernel
from svt_av1_psy_tpu.codec.spec_tables import get_tables

requires_oracle = pytest.mark.skipif(not oracle.available, reason="oracle not built")

_U8P = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


class InterpFilterParams(ctypes.Structure):
    _fields_ = [("filter_ptr", ctypes.c_void_p), ("taps", ctypes.c_uint16),
                ("subpel_shifts", ctypes.c_uint16), ("interp_filter", ctypes.c_uint8)]


class ConvolveParams(ctypes.Structure):
    _fields_ = [("ref", ctypes.c_int32), ("do_average", ctypes.c_int32),
                ("dst", ctypes.c_void_p), ("dst_stride", ctypes.c_int32),
                ("round_0", ctypes.c_int32), ("round_1", ctypes.c_int32),
                ("plane", ctypes.c_int32), ("is_compound", ctypes.c_int32),
                ("use_jnt_comp_avg", ctypes.c_int32), ("fwd_offset", ctypes.c_int32),
                ("bck_offset", ctypes.c_int32), ("use_dist_wtd_comp_avg", ctypes.c_int32)]


def _make_params(interp_filter, w):
    t = get_tables()
    key = {0: "interp_sub_pel_filters_8", 1: "interp_sub_pel_filters_8smooth",
           2: "interp_sub_pel_filters_8sharp", 3: "interp_bilinear_filters"}[interp_filter]
    if w <= 4 and interp_filter in (0, 1):
        key = {0: "interp_sub_pel_filters_4", 1: "interp_sub_pel_filters_4smooth"}[interp_filter]
    arr = np.ascontiguousarray(t._raw[key], np.int16)
    p = InterpFilterParams()
    p.filter_ptr = arr.ctypes.data
    p.taps = 8
    p.subpel_shifts = 16
    p.interp_filter = interp_filter
    return p, arr  # keep arr alive


def _oracle_convolve(name, src, w, h, sx, sy, interp=0):
    lib = oracle._lib
    fn = getattr(lib, name)
    fn.argtypes = [_U8P, ctypes.c_int32, _U8P, ctypes.c_int32, ctypes.c_int32,
                   ctypes.c_int32, ctypes.POINTER(InterpFilterParams),
                   ctypes.POINTER(InterpFilterParams), ctypes.c_int32,
                   ctypes.c_int32, ctypes.POINTER(ConvolveParams)]
    fn.restype = None
    px, ax = _make_params(interp, w)
    py, ay = _make_params(interp, h)
    cp = ConvolveParams()
    cp.round_0, cp.round_1 = 3, 11
    dst = np.zeros((h, w), np.uint8)
    stride = src.shape[1]
    # pointer at the block's full-pel top-left (3 rows/cols into the patch)
    off = 3 * stride + 3
    fn(np.ascontiguousarray(src).reshape(-1)[off:], stride, dst, w, w, h,
       ctypes.byref(px), ctypes.byref(py), sx, sy, ctypes.byref(cp))
    return dst


@requires_oracle
@pytest.mark.parametrize("interp", [0, 1, 2])
def test_convolve_2d_bit_exact(interp):
    rng = np.random.default_rng(interp)
    for w, h in ((8, 8), (16, 8), (32, 32)):
        src = rng.integers(0, 256, (h + 8, w + 8)).astype(np.uint8)
        for sx, sy in ((5, 9), (1, 15), (8, 8), (3, 0), (0, 7)):
            got = convolve_2d_sr(src[None, : h + 7, : w + 7], w, h, sx, sy, interp, interp)[0]
            if sx and sy:
                ref = _oracle_convolve("svt_av1_convolve_2d_sr_c", src, w, h, sx, sy, interp)
            elif sx:
                ref = _oracle_convolve("svt_av1_convolve_x_sr_c", src, w, h, sx, sy, interp)
            else:
                ref = _oracle_convolve("svt_av1_convolve_y_sr_c", src, w, h, sx, sy, interp)
            assert np.array_equal(got.astype(np.uint8), ref), (interp, w, h, sx, sy)


def test_fullpel_copy():
    rng = np.random.default_rng(9)
    src = rng.integers(0, 256, (1, 15, 15)).astype(np.uint8)
    out = convolve_2d_sr(src, 8, 8, 0, 0)
    assert np.array_equal(out[0], src[0, 3:11, 3:11])
