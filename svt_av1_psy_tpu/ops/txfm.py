"""Batched AV1 transforms on device (jnp; bit-exact int32 butterfly graphs).

Same dataflow graphs as codec/transforms.py (the numpy golden model), traced
to XLA: each butterfly stage is a few vector ops over the batch axis, which
maps onto the TPU VPU; per-stage multiplies are int32 (cospi weights fit
14 bits, lanes fit 18 bits -> products fit int32 for the inverse path; the
forward path uses the same ranges by construction of the stage shifts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# All stages compute in int32, mirroring the C reference's int32 transform
# buffers (transforms.c / inv_transforms.c use int32_t throughout): the AV1
# stage-shift design keeps every butterfly product and accumulation within
# int32 for valid inputs (bd<=10 on the inverse path, asserted below).
# int64/x64 is deliberately NOT used — int64 is emulated (slow) on TPU and
# flipping jax_enable_x64 globally breaks other modules.

from ..codec import transforms as T
from ..codec.constants import TX_HEIGHT, TX_WIDTH, TX_TYPE_1D, TxType, TxType1D


def _round_shift(x, bit: int):
    if bit == 0:
        return x
    if bit > 0:
        return (x + (1 << (bit - 1))) >> bit
    return x << (-bit)


def _clamp(x, bit):
    if bit is None:
        return x
    return jnp.clip(x, -(1 << (bit - 1)), (1 << (bit - 1)) - 1)


def _eval_graph_jnp(name: str, x, cos_bit: int, clamp_bit):
    """x: (batch, n) int. Returns (batch, n) int. Each stage is a handful of
    gathers + elementwise selects (VPU-friendly, small HLO)."""
    stages = T.compiled_stages(name, cos_bit)
    dt = x.dtype
    cur = x
    for A, B, wa, wb, is_btf, is_clamp in stages:
        va = jnp.take(cur, A, axis=1)
        vb = jnp.take(cur, B, axis=1)
        acc = jnp.asarray(wa, dt)[None, :] * va + jnp.asarray(wb, dt)[None, :] * vb
        shifted = _round_shift(acc, cos_bit)
        clamped = _clamp(acc, clamp_bit) if clamp_bit is not None else acc
        cur = jnp.where(is_btf[None, :], shifted, jnp.where(is_clamp[None, :], clamped, acc))
    return cur


def _adst4_jnp(x, cos_bit: int, inverse: bool):
    sinpi = np.asarray(T.sinpi_arr(cos_bit), np.int32)
    s1_, s2_, s3_, s4_ = (int(sinpi[i]) for i in range(1, 5))
    x0, x1, x2, x3 = (x[:, i] for i in range(4))
    if inverse:
        s0 = s1_ * x0 + s4_ * x2 + s2_ * x3
        s1 = s2_ * x0 - s1_ * x2 - s4_ * x3
        s3 = s3_ * x1
        s2 = s3_ * ((x0 - x2) + x3)
        o0 = s0 + s3
        o1 = s1 + s3
        o2 = s2
        o3 = (s0 + s1) - s3
    else:
        s7 = (x0 + x1) - x3
        a0 = s1_ * x0 + s2_ * x1 + s4_ * x3
        a1 = s3_ * s7
        a2 = s4_ * x0 - s1_ * x1 + s2_ * x3
        a3 = s3_ * x2
        o0 = a0 + a3
        o1 = a1
        o2 = a2 - a3
        o3 = (a2 - a0) + a3
    out = jnp.stack([o0, o1, o2, o3], axis=1)
    return _round_shift(out, cos_bit)


def _identity_jnp(x, n: int):
    if n == 4:
        return _round_shift(x * T.NEW_SQRT2, T.NEW_SQRT2_BITS)
    if n == 8:
        return x * 2
    if n == 16:
        return _round_shift(x * 2 * T.NEW_SQRT2, T.NEW_SQRT2_BITS)
    if n == 32:
        return x * 4
    return _round_shift(x * 4 * T.NEW_SQRT2, T.NEW_SQRT2_BITS)


def _txfm_1d_jnp(x, kind, n, cos_bit, inverse, clamp_bit):
    if kind == TxType1D.IDTX:
        return _identity_jnp(x, n)
    if kind in (TxType1D.ADST, TxType1D.FLIPADST):
        if n == 4:
            return _adst4_jnp(x, cos_bit, inverse)
        name = f"{'i' if inverse else 'f'}adst{n}"
    else:
        name = f"{'i' if inverse else 'f'}dct{n}"
    return _eval_graph_jnp(name, x, cos_bit, clamp_bit)


@functools.partial(jax.jit, static_argnums=(1, 2))
def forward_transform_2d(residual, tx_size: int, tx_type: int):
    """residual (B, H, W) int32 -> coeffs (B, H, W) int32 on device.

    Bit-exact to codec.transforms.forward_transform_2d (adst4 uses an
    algebraically-identical fused form of the staged reference)."""
    B, H, W = residual.shape
    w_idx = int(np.log2(W)) - 2
    h_idx = int(np.log2(H)) - 2
    shift = T.FWD_SHIFT[tx_size]
    cos_bit_col = T.FWD_COS_BIT_COL[w_idx][h_idx]
    cos_bit_row = T.FWD_COS_BIT_ROW[w_idx][h_idx]
    vtype, htype = TX_TYPE_1D[TxType(tx_type)]
    ud_flip, lr_flip = T._flips(tx_type)

    x = residual.astype(jnp.int32)
    if ud_flip:
        x = x[:, ::-1, :]
    x = _round_shift(x, -int(shift[0]))
    xc = jnp.transpose(x, (0, 2, 1)).reshape(B * W, H)
    xc = _txfm_1d_jnp(xc, vtype, H, cos_bit_col, False, None)
    xc = _round_shift(xc, -int(shift[1]))
    buf = jnp.transpose(xc.reshape(B, W, H), (0, 2, 1))
    if lr_flip:
        buf = buf[:, :, ::-1]
    xr = buf.reshape(B * H, W)
    xr = _txfm_1d_jnp(xr, htype, W, cos_bit_row, False, None)
    xr = _round_shift(xr, -int(shift[2]))
    out = xr.reshape(B, H, W)
    if abs(T._rect_log_ratio(W, H)) == 1:
        out = _round_shift(out * T.NEW_SQRT2, T.NEW_SQRT2_BITS)
    if W == 64:
        out = out.at[:, :, 32:].set(0)
    if H == 64:
        out = out.at[:, 32:, :].set(0)
    return out.astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def inverse_transform_add(coeffs, pred, tx_size: int, tx_type: int, bd: int = 8):
    """coeffs (B, H, W) int32 + pred (B, H, W) -> recon (B, H, W) int32."""
    B, H, W = coeffs.shape
    shift = T.INV_SHIFT[tx_size]
    vtype, htype = TX_TYPE_1D[TxType(tx_type)]
    ud_flip, lr_flip = T._flips(tx_type)
    if bd == 8:
        range_row, range_col = 16, 16
    elif bd == 10:
        range_row, range_col = 18, 16
    else:
        range_row, range_col = 20, 18

    assert bd <= 10, "int32 inverse path holds for bd<=10; use the numpy model for 12"
    x = coeffs.astype(jnp.int32)
    if W == 64:
        x = x.at[:, :, 32:].set(0)
    if H == 64:
        x = x.at[:, 32:, :].set(0)
    if abs(T._rect_log_ratio(W, H)) == 1:
        x = _round_shift(x * T.NEW_INV_SQRT2, T.NEW_SQRT2_BITS)
    x = _clamp(x, bd + 8)
    xr = x.reshape(B * H, W)
    xr = _txfm_1d_jnp(xr, htype, W, T.INV_COS_BIT, True, range_row)
    xr = _round_shift(xr, -int(shift[0]))
    buf = xr.reshape(B, H, W)
    if lr_flip:
        buf = buf[:, :, ::-1]
    buf = _clamp(buf, max(bd + 6, 16))
    xc = jnp.transpose(buf, (0, 2, 1)).reshape(B * W, H)
    xc = _txfm_1d_jnp(xc, vtype, H, T.INV_COS_BIT, True, range_col)
    xc = _round_shift(xc, -int(shift[1]))
    out = jnp.transpose(xc.reshape(B, W, H), (0, 2, 1))
    if ud_flip:
        out = out[:, ::-1, :]
    recon = pred.astype(jnp.int32) + out
    return jnp.clip(recon, 0, (1 << bd) - 1).astype(jnp.int32)
