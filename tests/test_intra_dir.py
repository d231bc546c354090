"""Directional intra prediction vs reference C kernels."""

import ctypes

import numpy as np
import pytest

import oracle
from svt_av1_psy_tpu.codec.intra_dir import _z1, _z2, _z3, get_dx, get_dy

requires_oracle = pytest.mark.skipif(not oracle.available, reason="oracle not built")

_U8P = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _oracle_z(which, W, H, above_full, left_full, dx, dy):
    lib = oracle._lib
    fn = getattr(lib, f"svt_av1_dr_prediction_z{which}_c")
    if which == 2:
        fn.argtypes = [_U8P, ctypes.c_ssize_t, ctypes.c_int32, ctypes.c_int32,
                       _U8P, _U8P, ctypes.c_int32, ctypes.c_int32,
                       ctypes.c_int32, ctypes.c_int32]
    else:
        fn.argtypes = [_U8P, ctypes.c_ssize_t, ctypes.c_int32, ctypes.c_int32,
                       _U8P, _U8P, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
    fn.restype = None
    dst = np.zeros((H, W), np.uint8)
    # C reads above[-1]/left[-1]: pass pointers offset past the corner
    a = np.ascontiguousarray(above_full, np.uint8)
    l = np.ascontiguousarray(left_full, np.uint8)
    if which == 2:
        fn(dst, W, W, H, a[1:], l[1:], 0, 0, dx, dy)
    else:
        fn(dst, W, W, H, a[1:], l[1:], 0, dx, dy)
    return dst


@requires_oracle
@pytest.mark.parametrize("size", [(4, 4), (8, 8), (16, 16), (8, 16), (32, 8)])
def test_dr_zones_bit_exact(size):
    W, H = size
    rng = np.random.default_rng(W * H)
    for trial in range(4):
        above = rng.integers(0, 256, 1 + W + H + 1).astype(np.uint16)
        left = rng.integers(0, 256, 1 + W + H + 1).astype(np.uint16)
        left[0] = above[0]  # shared corner
        for angle in (45, 67, 87, 3):  # zone 1
            ref = _oracle_z(1, W, H, above, left, get_dx(angle), 1)
            got = _z1(above, W, H, get_dx(angle), 8)
            assert np.array_equal(got, ref.astype(np.uint16)), ("z1", angle)
        for angle in (113, 135, 157, 93, 177):  # zone 2
            ref = _oracle_z(2, W, H, above, left, get_dx(angle), get_dy(angle))
            got = _z2(above, left, W, H, get_dx(angle), get_dy(angle), 8)
            assert np.array_equal(got, ref.astype(np.uint16)), ("z2", angle)
        for angle in (203, 219, 267, 183):  # zone 3
            ref = _oracle_z(3, W, H, above, left, 1, get_dy(angle))
            got = _z3(left, W, H, get_dy(angle), 8)
            assert np.array_equal(got, ref.astype(np.uint16)), ("z3", angle)
