"""Compound (jnt) convolve bit-exactness vs the reference oracle."""

import ctypes
from pathlib import Path

import numpy as np
import pytest

from svt_av1_psy_tpu.codec import compound
from svt_av1_psy_tpu.codec.convolve import get_filter_kernel

_ORACLE = Path("/tmp/refbin/liboracle.so")
requires_oracle = pytest.mark.skipif(not _ORACLE.is_file(),
                                     reason="reference oracle unavailable")


class _IFP(ctypes.Structure):
    _fields_ = [("filter_ptr", ctypes.c_void_p), ("taps", ctypes.c_uint16),
                ("subpel_shifts", ctypes.c_uint16),
                ("interp_filter", ctypes.c_uint8)]


class _CP(ctypes.Structure):
    _fields_ = [("ref", ctypes.c_int32), ("do_average", ctypes.c_int32),
                ("dst", ctypes.c_void_p), ("dst_stride", ctypes.c_int32),
                ("round_0", ctypes.c_int32), ("round_1", ctypes.c_int32),
                ("plane", ctypes.c_int32), ("is_compound", ctypes.c_int32),
                ("use_jnt_comp_avg", ctypes.c_int32),
                ("fwd_offset", ctypes.c_int32), ("bck_offset", ctypes.c_int32),
                ("use_dist_wtd_comp_avg", ctypes.c_int32)]


def _oracle_compound(ref0, ref1, w, h, sx0, sy0, sx1, sy1):
    """Run the oracle's jnt convolve pair (no-average then average)."""
    lib = ctypes.CDLL(str(_ORACLE))
    filt = np.zeros((16, 8), np.int16)
    for s in range(16):
        filt[s] = get_filter_kernel(0, s, 8)
    ifp = _IFP(filt.ctypes.data, 8, 16, 0)
    conv_buf = np.zeros((h, w), np.uint16)
    dst = np.zeros((h, w), np.uint8)

    def run(src, sx, sy, do_avg):
        cp = _CP(0, do_avg, conv_buf.ctypes.data, w, 3, 7, 0, 1, 0, 8, 8, 0)
        name = ("svt_av1_jnt_convolve_2d_c" if sx and sy else
                "svt_av1_jnt_convolve_x_c" if sx else
                "svt_av1_jnt_convolve_y_c" if sy else
                "svt_av1_jnt_convolve_2d_copy_c")
        fn = getattr(lib, name)
        fn.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
                       ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                       ctypes.POINTER(_IFP), ctypes.POINTER(_IFP),
                       ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(_CP)]
        s8 = np.ascontiguousarray(src, np.uint8)
        # src pointer at the block's full-pel top-left inside the patch
        fn(s8.ctypes.data + 3 * s8.shape[1] + 3, s8.shape[1],
           dst.ctypes.data, w, w, h, ctypes.byref(ifp), ctypes.byref(ifp),
           sx, sy, ctypes.byref(cp))

    run(ref0, sx0, sy0, 0)
    run(ref1, sx1, sy1, 1)
    return dst.astype(np.int64)


@requires_oracle
@pytest.mark.parametrize("subpels", [
    (6, 10, 3, 5), (0, 0, 0, 0), (6, 0, 0, 9), (0, 4, 7, 0), (15, 15, 1, 1),
])
def test_compound_average_bit_exact(subpels):
    sx0, sy0, sx1, sy1 = subpels
    rng = np.random.default_rng(sum(subpels) + 1)
    w, h = 32, 16
    ref0 = rng.integers(0, 256, (h + 7, w + 7)).astype(np.uint8)
    ref1 = rng.integers(0, 256, (h + 7, w + 7)).astype(np.uint8)
    ours0 = compound.jnt_conv(ref0, w, h, get_filter_kernel(0, sx0, w),
                              get_filter_kernel(0, sy0, h), sx0, sy0, 8)
    ours1 = compound.jnt_conv(ref1, w, h, get_filter_kernel(0, sx1, w),
                              get_filter_kernel(0, sy1, h), sx1, sy1, 8)
    ours = compound.compound_average(ours0, ours1, 8)
    ref = _oracle_compound(ref0, ref1, w, h, sx0, sy0, sx1, sy1)
    assert np.array_equal(ours.astype(np.int64), ref), \
        f"max diff {np.abs(ours.astype(np.int64) - ref).max()}"


# ---------------------------------------------------------- stream level
@pytest.mark.skipif(not Path("/usr/lib/x86_64-linux-gnu/libdav1d.so.6").exists(),
                    reason="dav1d unavailable")
def test_compound_stream_conformant_and_walks_match():
    """Forced mixed compound/single/intra decisions on B frames: the C and
    Python walks must emit byte-identical packets and every display frame
    must decode bit-exactly (dav1d)."""
    import svt_av1_psy_tpu.codec.inter_encoder as ie
    from svt_av1_psy_tpu.api import Encoder
    from svt_av1_psy_tpu.codec import walk_native
    from svt_av1_psy_tpu.config import EncoderConfig
    from svt_av1_psy_tpu.io import dav1d

    orig_prewalk = ie.InterFrameEncoder._pre_walk

    def make_forced(seed):
        frng = np.random.default_rng(seed)

        def forced(self):
            orig_prewalk(self)
            if self.inter_dec is None or self.ref2 != ie.ALTREF_FRAME:
                return
            for k in list(self.inter_dec):
                roll = frng.random()
                if roll < 0.5:
                    mv = tuple(int(x) for x in frng.integers(-40, 41, 4))
                    self.inter_dec[k] = (1, 7, 24, *mv)
                elif roll < 0.6:
                    self.inter_dec[k] = (0, 0, 0, 0, 0)
        return forced

    def run(force_python):
        ie.InterFrameEncoder._pre_walk = make_forced(11)
        orig_el = walk_native.eligible
        if force_python:
            walk_native.eligible = lambda e: False
        try:
            rng = np.random.default_rng(5)
            W, H = 176, 144
            base = (np.cumsum(rng.normal(0, 4, (H, W + 40)), axis=1)
                    + 128).clip(0, 255)
            ys = [np.clip(base[:, 2 * i : 2 * i + W]
                          + rng.normal(0, 3, (H, W)), 0, 255).astype(np.uint8)
                  for i in range(9)]
            u = np.full((H // 2, W // 2), 120, np.uint8)
            cfg = EncoderConfig(width=W, height=H, recon_enabled=True,
                                preset=8)
            cfg.qp = 40
            enc = Encoder(cfg).init()
            for i, y in enumerate(ys):
                enc.send_picture(y, u, u.copy(), pts=i)
            enc.flush()
            pkts = []
            while (p := enc.get_packet()) is not None:
                pkts.append(p)
            return pkts
        finally:
            walk_native.eligible = orig_el
            ie.InterFrameEncoder._pre_walk = orig_prewalk

    pk_c = run(False)
    pk_p = run(True)
    for i, (a, b) in enumerate(zip(pk_c, pk_p)):
        assert a.data == b.data, f"packet {i}: {len(a.data)} vs {len(b.data)}"
    stream = b"".join(p.data for p in pk_c)
    disp = [p for p in pk_c if p.recon is not None]
    for i, p in enumerate(disp):
        d = dav1d.decode_nth(stream, i, 176, 144)
        assert all(np.array_equal(a, b) for a, b in zip(d, p.recon)), i
