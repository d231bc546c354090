"""Device-tier loop-filter and MC kernels (jax/XLA).

Bit-exact jnp ports of the host kernels, keeping the same batched-over-
blocks shapes (codec/cdef.filter_blocks, codec/convolve.convolve_2d_sr,
codec/restoration.wiener_filter_block). Everything is static-shaped and
branch-free so XLA can fuse and tile onto the VPU/MXU; gather indices for
the CDEF taps are precomputed per direction and selected with one-hot
masks instead of data-dependent indexing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..codec.cdef import _DIRS, _PRI_TAPS, _SEC_TAPS, CDEF_VERY_LARGE
from ..codec.restoration import FILTER_BITS as WFILT_BITS, ROUND0 as WROUND0


def _ilog2_i32(x):
    """floor(log2(max(x,1))) for int32 tensors (frexp-free)."""
    x = jnp.maximum(x, 1)
    return 31 - jnp.clz(x) if hasattr(jnp, "clz") else (
        jnp.floor(jnp.log2(x.astype(jnp.float32) + 0.5)).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("bw", "bh", "bd", "pri_damping",
                                             "sec_damping", "sec_strength"))
def cdef_filter_blocks(nb, dirs, pri_strength, sec_strength: int,
                       pri_damping: int, sec_damping: int, bw: int, bh: int,
                       bd: int):
    """Batched CDEF (mirror of codec/cdef.filter_blocks). nb: (N, bh+4,
    bw+4) int32 neighborhoods; dirs: (N,); pri_strength: (N,)."""
    N = nb.shape[0]
    x = nb[:, 2 : 2 + bh, 2 : 2 + bw]
    pri = jnp.broadcast_to(jnp.asarray(pri_strength, jnp.int32), (N,))
    tap_idx = (pri >> (bd - 8)) & 1
    dirs = jnp.asarray(dirs, jnp.int32)
    dirs_tab = jnp.asarray(_DIRS, jnp.int32)
    pri_taps = jnp.asarray(_PRI_TAPS, jnp.int32)
    sec_taps = jnp.asarray(_SEC_TAPS, jnp.int32)

    rows = jnp.arange(bh)[None, :, None] + 2
    cols = jnp.arange(bw)[None, None, :] + 2
    bi = jnp.arange(N)[:, None, None]

    def at(dy, dx):
        return nb[bi, rows + dy[:, None, None], cols + dx[:, None, None]]

    sum_ = jnp.zeros((N, bh, bw), jnp.int32)
    mx = x
    mn = x
    th_p = pri[:, None, None]
    msb_p = _ilog2_i32(th_p)
    shift_p = jnp.maximum(0, pri_damping - msb_p)
    if sec_strength:
        msb_s = max(int(sec_strength).bit_length() - 1, 0)
        shift_s = max(0, sec_damping - msb_s)
    for k in range(2):
        ptap = pri_taps[tap_idx, k][:, None, None]
        stap = sec_taps[tap_idx, k][:, None, None]
        dy = dirs_tab[dirs, k, 0]
        dx = dirs_tab[dirs, k, 1]
        for sgn in (1, -1):
            p = at(sgn * dy, sgn * dx)
            d = p - x
            ad = jnp.abs(d)
            con = jnp.sign(d) * jnp.minimum(ad, jnp.maximum(0, th_p - (ad >> shift_p)))
            con = jnp.where(th_p == 0, 0, con)
            sum_ = sum_ + ptap * con
            mx = jnp.maximum(mx, jnp.where(p == CDEF_VERY_LARGE, mx, p))
            mn = jnp.minimum(mn, p)
        for delta in (2, -2):
            d2 = (dirs + delta) & 7
            sdy = dirs_tab[d2, k, 0]
            sdx = dirs_tab[d2, k, 1]
            for sgn in (1, -1):
                s = at(sgn * sdy, sgn * sdx)
                if sec_strength:
                    d = s - x
                    ad = jnp.abs(d)
                    con = jnp.sign(d) * jnp.minimum(
                        ad, jnp.maximum(0, sec_strength - (ad >> shift_s)))
                    sum_ = sum_ + stap * con
                mx = jnp.maximum(mx, jnp.where(s == CDEF_VERY_LARGE, mx, s))
                mn = jnp.minimum(mn, s)
    y = x + ((8 + sum_ - (sum_ < 0).astype(jnp.int32)) >> 4)
    return jnp.clip(y, mn, mx)


@functools.partial(jax.jit, static_argnames=("w", "h", "sx_on", "sy_on", "bd"))
def _convolve_2d(patches, fx, fy, w: int, h: int, sx_on: bool, sy_on: bool,
                 bd: int):
    x = patches.astype(jnp.int32)
    round_0, round_1 = 3, 11
    peak = (1 << bd) - 1
    if not sx_on and not sy_on:
        return x[:, 3 : 3 + h, 3 : 3 + w].astype(jnp.uint16)
    if sx_on and sy_on:
        off = 1 << (bd + 7 - 1)
        im = jnp.zeros((x.shape[0], h + 7, w), jnp.int32)
        for k in range(8):
            im = im + fx[k] * x[:, :, k : k + w]
        im = (im + off + (1 << (round_0 - 1))) >> round_0
        offset_bits = bd + 14 - round_0
        out = jnp.zeros((x.shape[0], h, w), jnp.int32)
        for k in range(8):
            out = out + fy[k] * im[:, k : k + h, :]
        out = ((out + (1 << offset_bits) + (1 << (round_1 - 1))) >> round_1) - (
            (1 << (offset_bits - round_1)) + (1 << (offset_bits - round_1 - 1)))
        bits = 14 - round_0 - round_1
        if bits > 0:
            out = (out + (1 << (bits - 1))) >> bits
        return jnp.clip(out, 0, peak).astype(jnp.uint16)
    if sx_on:
        src = x[:, 3 : 3 + h, :]
        out = jnp.zeros((x.shape[0], h, w), jnp.int32)
        for k in range(8):
            out = out + fx[k] * src[:, :, k : k + w]
        bits = 7 - round_0
        out = (out + (1 << (round_0 - 1))) >> round_0
        out = (out + (1 << (bits - 1))) >> bits
        return jnp.clip(out, 0, peak).astype(jnp.uint16)
    src = x[:, :, 3 : 3 + w]
    out = jnp.zeros((x.shape[0], h, w), jnp.int32)
    for k in range(8):
        out = out + fy[k] * src[:, k : k + h, :]
    out = (out + (1 << 6)) >> 7
    return jnp.clip(out, 0, peak).astype(jnp.uint16)


def convolve_2d_sr(patches, w: int, h: int, subpel_x_q4: int, subpel_y_q4: int,
                   interp_x: int = 0, interp_y: int = 0, bd: int = 8):
    """Device MC convolve over (B, h+7, w+7) patches; same contract as
    codec/convolve.convolve_2d_sr."""
    from ..codec.convolve import get_filter_kernel

    fx = (get_filter_kernel(interp_x, subpel_x_q4, w) if subpel_x_q4
          else np.zeros(8, np.int32))
    fy = (get_filter_kernel(interp_y, subpel_y_q4, h) if subpel_y_q4
          else np.zeros(8, np.int32))
    return _convolve_2d(jnp.asarray(patches), jnp.asarray(fx, jnp.int32),
                        jnp.asarray(fy, jnp.int32), w, h,
                        bool(subpel_x_q4), bool(subpel_y_q4), bd)


@functools.partial(jax.jit, static_argnames=("w", "h", "bd"))
def _wiener_block(src_ext, kh, kv, w: int, h: int, bd: int):
    # int32 is provably sufficient (TPU has no int64 lanes): spec Wiener
    # taps have L1 norm <= ~380 (tap0/1/2 bounded per 5.9.15, center
    # 128 - 2*sum). H-pass: |acc| <= 380 * 4095 + 2^(bd+6) < 2^21 at
    # bd=12. V-pass: tmp < 2^(bd+5), |acc| <= 380 * 2^17 + 2^(bd+10)
    # < 2^27. No overflow.
    x = src_ext.astype(jnp.int32)
    lim = 1 << (bd + 1 + WFILT_BITS - WROUND0)
    acc = jnp.zeros((h + 6, w), jnp.int32)
    for k in range(7):
        acc = acc + kh[k] * x[:, k : k + w]
    acc = acc + (x[:, 3 : 3 + w] << WFILT_BITS) + (1 << (bd + WFILT_BITS - 1))
    tmp = jnp.clip((acc + (1 << (WROUND0 - 1))) >> WROUND0, 0, lim - 1)
    round1 = 2 * WFILT_BITS - WROUND0
    acc = jnp.zeros((h, w), jnp.int32)
    for k in range(7):
        acc = acc + kv[k] * tmp[k : k + h, :]
    acc = acc + (tmp[3 : 3 + h, :] << WFILT_BITS) - (1 << (bd + round1 - 1))
    out = (acc + (1 << (round1 - 1))) >> round1
    return jnp.clip(out, 0, (1 << bd) - 1)


def wiener_filter_block(src_ext, w: int, h: int, htaps, vtaps, bd: int = 8):
    """Device Wiener stripe block; same contract as
    codec/restoration.wiener_filter_block."""
    from ..codec.restoration import _kernel

    return _wiener_block(jnp.asarray(src_ext), jnp.asarray(_kernel(htaps)),
                         jnp.asarray(_kernel(vtaps)), w, h, bd)
