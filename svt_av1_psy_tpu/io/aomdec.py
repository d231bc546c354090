"""libaom decoder shim (second conformance oracle).

The reference's E2E tests decode with libaom (test/e2e_test/RefDecoder.cc,
libaom_dependency.cmake:18); this binds the system libaom.so.3 via ctypes so
our suite can cross-check dav1d and libaom against the encoder recon.

CAUTION: mixing many interleaved libaom + libdav1d decodes in one process
has shown rare crashes (allocator/TLS interplay between the two shared
libs); tests keep libaom cross-checks in dedicated cases.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_lib = None
for name in ("libaom.so.3", "libaom.so"):
    try:
        _lib = ctypes.CDLL(name)
        break
    except OSError:
        continue


class _AomCodecCtx(ctypes.Structure):
    _fields_ = [("name", ctypes.c_char_p), ("iface", ctypes.c_void_p),
                ("err", ctypes.c_int), ("err_detail", ctypes.c_char_p),
                ("init_flags", ctypes.c_long), ("config", ctypes.c_void_p),
                ("priv", ctypes.c_void_p)]


class _AomImage(ctypes.Structure):
    _fields_ = [("fmt", ctypes.c_int), ("cp", ctypes.c_int), ("tc", ctypes.c_int),
                ("mc", ctypes.c_int), ("monochrome", ctypes.c_int),
                ("csp", ctypes.c_int), ("range", ctypes.c_int),
                ("w", ctypes.c_uint), ("h", ctypes.c_uint),
                ("bit_depth", ctypes.c_uint),
                ("d_w", ctypes.c_uint), ("d_h", ctypes.c_uint),
                ("r_w", ctypes.c_uint), ("r_h", ctypes.c_uint),
                ("x_chroma_shift", ctypes.c_uint), ("y_chroma_shift", ctypes.c_uint),
                ("planes", ctypes.c_void_p * 3), ("stride", ctypes.c_int * 3),
                ("bps", ctypes.c_int),
                ("temporal_id", ctypes.c_int), ("spatial_id", ctypes.c_int),
                ("user_priv", ctypes.c_void_p), ("img_data", ctypes.c_void_p),
                ("img_data_owner", ctypes.c_int), ("self_allocd", ctypes.c_int),
                ("metadata", ctypes.c_void_p), ("fb_priv", ctypes.c_void_p)]


_abi = None
if _lib is not None:
    _lib.aom_codec_av1_dx.restype = ctypes.c_void_p
    _lib.aom_codec_dec_init_ver.argtypes = [ctypes.POINTER(_AomCodecCtx),
                                            ctypes.c_void_p, ctypes.c_void_p,
                                            ctypes.c_long, ctypes.c_int]
    _lib.aom_codec_decode.argtypes = [ctypes.POINTER(_AomCodecCtx),
                                      ctypes.c_char_p, ctypes.c_size_t,
                                      ctypes.c_void_p]
    _lib.aom_codec_get_frame.argtypes = [ctypes.POINTER(_AomCodecCtx),
                                         ctypes.POINTER(ctypes.c_void_p)]
    _lib.aom_codec_get_frame.restype = ctypes.POINTER(_AomImage)
    _lib.aom_codec_destroy.argtypes = [ctypes.POINTER(_AomCodecCtx)]
    # probe the decoder ABI version accepted by this build
    for v in range(3, 40):
        ctx = _AomCodecCtx()
        if _lib.aom_codec_dec_init_ver(ctypes.byref(ctx),
                                       _lib.aom_codec_av1_dx(), None, 0, v) == 0:
            _abi = v
            _lib.aom_codec_destroy(ctypes.byref(ctx))
            break


def available() -> bool:
    return _lib is not None and _abi is not None


def decode(stream: bytes, width: int, height: int):
    """Decode one temporal unit; returns (y, u, v) uint16 arrays (u/v None
    when monochrome)."""
    if not available():
        raise RuntimeError("libaom decoder unavailable")
    ctx = _AomCodecCtx()
    rc = _lib.aom_codec_dec_init_ver(ctypes.byref(ctx), _lib.aom_codec_av1_dx(),
                                     None, 0, _abi)
    if rc != 0:
        raise RuntimeError(f"aom init failed: {rc}")
    try:
        rc = _lib.aom_codec_decode(ctx, stream, len(stream), None)
        if rc != 0:
            detail = ctx.err_detail.decode() if ctx.err_detail else ""
            raise RuntimeError(f"aom decode failed: {rc} {detail}")
        it = ctypes.c_void_p(None)
        img = _lib.aom_codec_get_frame(ctypes.byref(ctx), ctypes.byref(it))
        if not img:
            raise RuntimeError("aom produced no frame")
        im = img.contents
        hbd = bool(im.fmt & 0x800)  # AOM_IMG_FMT_HIGHBITDEPTH

        def plane(i, w, h):
            if not im.planes[i]:
                return None
            stride = im.stride[i]
            if hbd:
                buf = (ctypes.c_uint16 * (stride // 2 * h)).from_address(im.planes[i])
                a = np.frombuffer(buf, np.uint16).reshape(h, stride // 2)
            else:
                buf = (ctypes.c_uint8 * (stride * h)).from_address(im.planes[i])
                a = np.frombuffer(buf, np.uint8).reshape(h, stride).astype(np.uint16)
            return a[:, :w].copy()

        y = plane(0, width, height)
        if im.monochrome:
            return y, None, None
        cw, ch = (width + 1) >> 1, (height + 1) >> 1
        return y, plane(1, cw, ch), plane(2, cw, ch)
    finally:
        _lib.aom_codec_destroy(ctypes.byref(ctx))
