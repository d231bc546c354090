"""AV1 forward/inverse integer transforms, batched over blocks.

Bit-exact to the normative AV1 transforms (behavior reference:
Source/Lib/Codec/transforms.c + inv_transforms.c; spec §7.13.3). The 1-D
butterfly networks are data (codec/tables/txfm_graphs.json, extracted by
tools/extract_txfm_graphs.py) evaluated as vectorized integer ops over a
batch axis — each stage is a handful of (B,) lane ops, which XLA/TPU maps
onto the VPU when run via the jnp backend.

This module is the numpy golden model; ops/txfm.py holds the JAX/device
version (same graphs, jnp ops).
"""

from __future__ import annotations

import functools
import json
import math
from pathlib import Path

import numpy as np

from .constants import TX_HEIGHT, TX_WIDTH, TX_TYPE_1D, TxType, TxType1D

_TABLE_DIR = Path(__file__).resolve().parent / "tables"

COS_BIT_MIN = 10
INV_COS_BIT = 12
NEW_SQRT2_BITS = 12
NEW_SQRT2 = 5793      # 2^12 * sqrt(2)
NEW_INV_SQRT2 = 2896  # 2^12 / sqrt(2)


@functools.lru_cache(maxsize=None)
def cospi_arr(bit: int) -> np.ndarray:
    """cospi[j] = round(cos(pi*j/128) * 2^bit) (normative constant)."""
    return np.array(
        [int(math.floor(math.cos(math.pi * j / 128) * (1 << bit) + 0.5)) for j in range(64)],
        dtype=np.int64,
    )


# sinpi[j] ~ round(sqrt(2)*sin(j*pi/9)*2/3 * 2^bit), but normatively ADJUSTED
# so that sinpi[1] + sinpi[2] == sinpi[4] (required by the ADST4 factorization;
# pure rounding differs at bits 11/13/15/16). Values are AV1 spec constants.
_SINPI = {
    10: (0, 330, 621, 836, 951),
    11: (0, 660, 1241, 1672, 1901),
    12: (0, 1321, 2482, 3344, 3803),
    13: (0, 2642, 4964, 6689, 7606),
    14: (0, 5283, 9929, 13377, 15212),
    15: (0, 10566, 19858, 26755, 30424),
    16: (0, 21133, 39716, 53510, 60849),
}


@functools.lru_cache(maxsize=None)
def sinpi_arr(bit: int) -> np.ndarray:
    return np.array(_SINPI[bit], dtype=np.int64)


@functools.lru_cache(maxsize=None)
def _graphs() -> dict:
    return json.loads((_TABLE_DIR / "txfm_graphs.json").read_text())


def round_shift(x, bit: int):
    """(x + (1 << (bit-1))) >> bit for bit>0; x << -bit for bit<=0."""
    if bit == 0:
        return x
    if bit > 0:
        return (x + (1 << (bit - 1))) >> bit
    return x << (-bit)


def _clamp(x, bit):
    if bit is None:
        return x
    lo = -(1 << (bit - 1))
    hi = (1 << (bit - 1)) - 1
    return np.clip(x, lo, hi)


@functools.lru_cache(maxsize=None)
def compiled_stages(name: str, cos_bit: int):
    """Canonicalize each butterfly stage to lane-parallel gather form:
       out[i] = sel(kind[i], wa[i]*cur[A[i]] + wb[i]*cur[B[i]])
    kind 0 = passthrough, 1 = clamped add/sub (inverse), 2 = btf round_shift."""
    g = _graphs()[name]
    cospi = cospi_arr(cos_bit)
    stages = []
    for stage in g["stages"]:
        n = len(stage)
        A = np.zeros(n, np.int32)
        B = np.zeros(n, np.int32)
        wa = np.zeros(n, np.int64)
        wb = np.zeros(n, np.int64)
        kind = np.zeros(n, np.int8)
        for i, op in enumerate(stage):
            k = op[0]
            if k in ("in", "cp"):
                A[i], wa[i] = op[1], 1
            elif k in ("inng", "ng"):
                A[i], wa[i] = op[1], -1
            elif k in ("addin", "add"):
                A[i], B[i], wa[i], wb[i] = op[1], op[2], 1, 1
                kind[i] = 1 if k == "add" else 0
            elif k in ("subin", "sub"):
                A[i], B[i], wa[i], wb[i] = op[1], op[2], 1, -1
                kind[i] = 1 if k == "sub" else 0
            else:
                _, sa, ca, a, sb, cb, b = op
                A[i], B[i] = a, b
                wa[i], wb[i] = sa * cospi[ca], sb * cospi[cb]
                kind[i] = 2
        stages.append((A, B, wa, wb, kind == 2, kind == 1))
    return stages


@functools.lru_cache(maxsize=None)
def _flat_stages(name: str, cos_bit: int):
    """Stage-major flattened arrays for the native evaluator."""
    stages = compiled_stages(name, cos_bit)
    A = np.ascontiguousarray(np.stack([s[0] for s in stages]), np.int32)
    B = np.ascontiguousarray(np.stack([s[1] for s in stages]), np.int32)
    wa = np.ascontiguousarray(np.stack([s[2] for s in stages]), np.int64)
    wb = np.ascontiguousarray(np.stack([s[3] for s in stages]), np.int64)
    kind = np.ascontiguousarray(
        np.stack([s[4].astype(np.int8) * 2 + s[5].astype(np.int8) for s in stages]), np.int8)
    # raw data pointers stay valid for the process lifetime (lru_cache holds
    # the arrays); passing them avoids per-call ndpointer marshalling
    ptrs = (A.ctypes.data, B.ctypes.data, wa.ctypes.data, wb.ctypes.data,
            kind.ctypes.data)
    return len(stages), A, B, wa, wb, kind, ptrs


def eval_graph(name: str, x: np.ndarray, cos_bit: int, clamp_bit):
    """Evaluate a butterfly graph over x of shape (batch, n) int64.

    clamp_bit: per-stage add/sub clamp (inverse path), or None (forward)."""
    from ..bitstream import ec_native

    lib = ec_native._load()
    if lib is not None:
        n_stages, A, B, wa, wb, kind, ptrs = _flat_stages(name, cos_bit)
        xin = np.ascontiguousarray(x, np.int64)
        batch, n = xin.shape
        out = np.empty_like(xin)
        lib.txfm_eval_graph(ptrs[0], ptrs[1], ptrs[2], ptrs[3], ptrs[4],
                            n_stages, n, xin.ctypes.data, batch, cos_bit,
                            clamp_bit if clamp_bit is not None else 0,
                            out.ctypes.data)
        return out
    cur = x
    rnd = 1 << (cos_bit - 1)
    for A, B, wa, wb, is_btf, is_clamp in compiled_stages(name, cos_bit):
        acc = wa * cur[:, A] + wb * cur[:, B]
        shifted = (acc + rnd) >> cos_bit
        out = np.where(is_btf, shifted, acc)
        if clamp_bit is not None:
            lo, hi = -(1 << (clamp_bit - 1)), (1 << (clamp_bit - 1)) - 1
            out = np.where(is_clamp, np.clip(acc, lo, hi), out)
        cur = out
    return cur


def _adst4(x: np.ndarray, cos_bit: int, inverse: bool) -> np.ndarray:
    """sinpi-based length-4 ADST (hand-coded; {i,f}adst4 in the reference)."""
    sinpi = sinpi_arr(cos_bit)
    x0, x1, x2, x3 = (x[:, i] for i in range(4))
    if inverse:
        s0 = sinpi[1] * x0
        s1 = sinpi[2] * x0
        s2 = sinpi[3] * x1
        s3 = sinpi[4] * x2
        s4 = sinpi[1] * x2
        s5 = sinpi[2] * x3
        s6 = sinpi[4] * x3
        s7 = (x0 - x2) + x3
        s0 = s0 + s3
        s1 = s1 - s4
        s3 = s2
        s2 = sinpi[3] * s7
        s0 = s0 + s5
        s1 = s1 - s6
        o0 = s0 + s3
        o1 = s1 + s3
        o2 = s2
        o3 = (s0 + s1) - s3
    else:
        s0 = sinpi[1] * x0
        s1 = sinpi[4] * x0
        s2 = sinpi[2] * x1
        s3 = sinpi[1] * x1
        s4 = sinpi[3] * x2
        s5 = sinpi[4] * x3
        s6 = sinpi[2] * x3
        s7 = (x0 + x1) - x3
        a0 = s0 + s2
        a1 = sinpi[3] * s7
        a2 = s1 - s3
        a3 = s4
        a0 = a0 + s5
        a2 = a2 + s6
        o0 = a0 + a3
        o1 = a1
        o2 = a2 - a3
        o3 = (a2 - a0) + a3
    out = np.stack([o0, o1, o2, o3], axis=1)
    return round_shift(out, cos_bit)


def _identity(x: np.ndarray, n: int) -> np.ndarray:
    """IDTX 1-D scaling ({i,f}identity{4,8,16,32,64})."""
    if n == 4:
        return round_shift(x * NEW_SQRT2, NEW_SQRT2_BITS)
    if n == 8:
        return x * 2
    if n == 16:
        return round_shift(x * 2 * NEW_SQRT2, NEW_SQRT2_BITS)
    if n == 32:
        return x * 4
    if n == 64:
        return round_shift(x * 4 * NEW_SQRT2, NEW_SQRT2_BITS)
    raise ValueError(n)


def _txfm_1d(x: np.ndarray, kind: TxType1D, n: int, cos_bit: int, inverse: bool, clamp_bit):
    if kind == TxType1D.IDTX:
        return _identity(x, n)
    if kind in (TxType1D.ADST, TxType1D.FLIPADST):
        if n == 4:
            return _adst4(x, cos_bit, inverse)
        name = f"{'i' if inverse else 'f'}adst{n}"
    else:
        name = f"{'i' if inverse else 'f'}dct{n}"
    return eval_graph(name, x, cos_bit, clamp_bit)


# shift tables (transforms.h:27-45, inv_transforms.c:17-36); index = TxSize
FWD_SHIFT = np.array(
    [
        (2, 0, 0), (2, -1, 0), (2, -2, 0), (2, -4, 0), (0, -2, -2),
        (2, -1, 0), (2, -1, 0), (2, -2, 0), (2, -2, 0), (2, -4, 0),
        (2, -4, 0), (0, -2, -2), (2, -4, -2), (2, -1, 0), (2, -1, 0),
        (2, -2, 0), (2, -2, 0), (0, -2, 0), (2, -4, 0),
    ],
    dtype=np.int8,
)
INV_SHIFT = np.array(
    [
        (0, -4), (-1, -4), (-2, -4), (-2, -4), (-2, -4),
        (0, -4), (0, -4), (-1, -4), (-1, -4), (-1, -4),
        (-1, -4), (-1, -4), (-1, -4), (-1, -4), (-1, -4),
        (-2, -4), (-2, -4), (-2, -4), (-2, -4),
    ],
    dtype=np.int8,
)
# fwd cos bits indexed [txw_idx][txh_idx] (transforms.h:47-50)
FWD_COS_BIT_COL = [
    [13, 13, 13, 0, 0], [13, 13, 13, 12, 0], [13, 13, 13, 12, 13],
    [0, 13, 13, 12, 13], [0, 0, 13, 12, 13],
]
FWD_COS_BIT_ROW = [
    [13, 13, 12, 0, 0], [13, 13, 13, 12, 0], [13, 13, 12, 13, 12],
    [0, 12, 13, 12, 11], [0, 0, 12, 11, 10],
]


@functools.lru_cache(maxsize=None)
def _tx1d_native_spec(kind: TxType1D, n: int, cos_bit: int, inverse: bool):
    """(kind1d, A, B, wa, wb, kindarr, nstages) raw pointers for the C 2-D
    drivers. kind1d: 0 graph, 1 fadst4, 2 iadst4, 3 identity. Pointers stay
    valid for the process lifetime (_flat_stages lru_cache)."""
    if kind == TxType1D.IDTX:
        return (3, None, None, None, None, None, 0)
    if kind in (TxType1D.ADST, TxType1D.FLIPADST) and n == 4:
        return (2 if inverse else 1, None, None, None, None, None, 0)
    is_adst = kind in (TxType1D.ADST, TxType1D.FLIPADST)
    name = f"{'i' if inverse else 'f'}{'adst' if is_adst else 'dct'}{n}"
    n_stages, A, B, wa, wb, kd, ptrs = _flat_stages(name, cos_bit)
    return (0, *ptrs, n_stages)


def _spec_ptrs(spec):
    """spec -> 7 int64 values (null pointers as 0)."""
    return [spec[0]] + [p if p is not None else 0 for p in spec[1:6]] + [spec[6]]


@functools.lru_cache(maxsize=None)
def _fwd_params(tx_size: int, tx_type: int) -> np.ndarray:
    """Preassembled int64 params for txfm2d_fwd_p (see ec_native.c layout).
    The stage-array pointers stay valid for the process lifetime."""
    tx_size = int(tx_size)
    W, H = int(TX_WIDTH[tx_size]), int(TX_HEIGHT[tx_size])
    w_idx, h_idx = int(math.log2(W)) - 2, int(math.log2(H)) - 2
    shift = FWD_SHIFT[tx_size]
    cbit = FWD_COS_BIT_COL[w_idx][h_idx]
    rbit = FWD_COS_BIT_ROW[w_idx][h_idx]
    vtype, htype = TX_TYPE_1D[TxType(tx_type)]
    ud, lr = _flips(tx_type)
    ck = _tx1d_native_spec(vtype, H, cbit, False)
    rk = _tx1d_native_spec(htype, W, rbit, False)
    rect = 1 if abs(_rect_log_ratio(W, H)) == 1 else 0
    vals = (_spec_ptrs(ck)[:7] + [cbit] + _spec_ptrs(rk)[:7] + [rbit]
            + [int(shift[0]), int(shift[1]), int(shift[2]),
               int(ud), int(lr), rect, H, W])
    return np.array(vals, np.int64)


@functools.lru_cache(maxsize=None)
def _inv_params(tx_size: int, tx_type: int, bd: int) -> np.ndarray:
    """Preassembled int64 params for txfm2d_inv_add_p."""
    tx_size = int(tx_size)
    W, H = int(TX_WIDTH[tx_size]), int(TX_HEIGHT[tx_size])
    shift = INV_SHIFT[tx_size]
    vtype, htype = TX_TYPE_1D[TxType(tx_type)]
    ud, lr = _flips(tx_type)
    if bd == 8:
        range_row, range_col = 16, 16
    elif bd == 10:
        range_row, range_col = 18, 16
    else:
        range_row, range_col = 20, 18
    rk = _tx1d_native_spec(htype, W, INV_COS_BIT, True)
    ck = _tx1d_native_spec(vtype, H, INV_COS_BIT, True)
    rect = 1 if abs(_rect_log_ratio(W, H)) == 1 else 0
    vals = (_spec_ptrs(rk)[:7] + [range_row] + _spec_ptrs(ck)[:7] + [range_col]
            + [int(shift[0]), int(shift[1]), bd + 8, max(bd + 6, 16),
               int(ud), int(lr), rect, bd, H, W])
    return np.array(vals, np.int64)


def _rect_log_ratio(w: int, h: int) -> int:
    if w > h:
        return int(math.log2(w // h))
    return -int(math.log2(h // w))


def _flips(tx_type: int):
    v, hz = TX_TYPE_1D[TxType(tx_type)]
    ud = v == TxType1D.FLIPADST
    lr = hz == TxType1D.FLIPADST
    return ud, lr


def forward_transform_2d(residual: np.ndarray, tx_size: int, tx_type: int, bd: int = 8) -> np.ndarray:
    """residual (B, H, W) int -> coefficients (B, H, W) int32, row-major.

    For 64-point dimensions the upper coefficients are zeroed per spec
    (only the top-left <=32x32 region is coded)."""
    del bd  # forward path range is bd-independent here
    B, H, W = residual.shape
    w_idx, h_idx = int(math.log2(W)) - 2, int(math.log2(H)) - 2
    tx_size = int(tx_size)
    assert TX_WIDTH[tx_size] == W and TX_HEIGHT[tx_size] == H
    shift = FWD_SHIFT[tx_size]
    cos_bit_col = FWD_COS_BIT_COL[w_idx][h_idx]
    cos_bit_row = FWD_COS_BIT_ROW[w_idx][h_idx]
    vtype, htype = TX_TYPE_1D[TxType(tx_type)]
    ud_flip, lr_flip = _flips(tx_type)

    from ..bitstream import ec_native

    lib = ec_native._load()
    if lib is not None:
        res32 = np.ascontiguousarray(residual, np.int32)
        out = np.empty((B, H, W), np.int32)
        params = _fwd_params(tx_size, tx_type)
        lib.txfm2d_fwd_p(params.ctypes.data, res32.ctypes.data, B,
                         out.ctypes.data)
        return out

    x = residual.astype(np.int64)
    if ud_flip:
        x = x[:, ::-1, :]
    x = round_shift(x, -int(shift[0]))
    # column transform: length H along axis 1
    xc = np.transpose(x, (0, 2, 1)).reshape(B * W, H)
    xc = _txfm_1d(xc, vtype, H, cos_bit_col, inverse=False, clamp_bit=None)
    xc = round_shift(xc, -int(shift[1]))
    buf = np.transpose(xc.reshape(B, W, H), (0, 2, 1))
    if lr_flip:
        buf = buf[:, :, ::-1]
    # row transform: length W along axis 2
    xr = buf.reshape(B * H, W)
    xr = _txfm_1d(xr, htype, W, cos_bit_row, inverse=False, clamp_bit=None)
    xr = round_shift(xr, -int(shift[2]))
    out = xr.reshape(B, H, W)
    if abs(_rect_log_ratio(W, H)) == 1:
        out = round_shift(out * NEW_SQRT2, NEW_SQRT2_BITS)
    # zero the never-coded region of 64-point transforms
    if W == 64:
        out[:, :, 32:] = 0
    if H == 64:
        out[:, 32:, :] = 0
    return out.astype(np.int32)


def inverse_transform_add(
    coeffs: np.ndarray, pred: np.ndarray, tx_size: int, tx_type: int, bd: int = 8
) -> np.ndarray:
    """coeffs (B, H, W) int32 (upper-64 region ignored), pred (B, H, W) uint16
    -> recon (B, H, W) uint16. Bit-exact normative inverse + add + clip."""
    B, H, W = coeffs.shape
    tx_size = int(tx_size)
    assert TX_WIDTH[tx_size] == W and TX_HEIGHT[tx_size] == H
    shift = INV_SHIFT[tx_size]
    vtype, htype = TX_TYPE_1D[TxType(tx_type)]
    ud_flip, lr_flip = _flips(tx_type)
    if bd == 8:
        range_row, range_col = 16, 16
    elif bd == 10:
        range_row, range_col = 18, 16
    else:
        range_row, range_col = 20, 18

    from ..bitstream import ec_native

    lib = ec_native._load()
    if lib is not None:
        c32 = np.ascontiguousarray(coeffs, np.int32)
        p16 = np.ascontiguousarray(pred, np.uint16)
        out = np.empty((B, H, W), np.uint16)
        params = _inv_params(tx_size, tx_type, bd)
        lib.txfm2d_inv_add_p(params.ctypes.data, c32.ctypes.data,
                             p16.ctypes.data, B, out.ctypes.data)
        return out

    x = coeffs.astype(np.int64)
    if W == 64:
        x = x.copy()
        x[:, :, 32:] = 0
    if H == 64:
        x = x.copy()
        x[:, 32:, :] = 0
    if abs(_rect_log_ratio(W, H)) == 1:
        x = round_shift(x * NEW_INV_SQRT2, NEW_SQRT2_BITS)
    x = _clamp(x, bd + 8)
    # row transform: length W along axis 2
    xr = x.reshape(B * H, W)
    xr = _txfm_1d(xr, htype, W, INV_COS_BIT, inverse=True, clamp_bit=range_row)
    xr = round_shift(xr, -int(shift[0]))
    buf = xr.reshape(B, H, W)
    if lr_flip:
        buf = buf[:, :, ::-1]
    # column transform: length H along axis 1
    buf = _clamp(buf, max(bd + 6, 16))
    xc = np.transpose(buf, (0, 2, 1)).reshape(B * W, H)
    xc = _txfm_1d(xc, vtype, H, INV_COS_BIT, inverse=True, clamp_bit=range_col)
    xc = round_shift(xc, -int(shift[1]))
    out = np.transpose(xc.reshape(B, W, H), (0, 2, 1))
    if ud_flip:
        out = out[:, ::-1, :]
    recon = pred.astype(np.int64) + out
    return np.clip(recon, 0, (1 << bd) - 1).astype(np.uint16)


def tx_types_for_size(tx_size: int, intra: bool = True):
    """Valid tx types given the 1-D length limits (ADST<=16, IDTX<=32, 64=DCT only)."""
    W, H = int(TX_WIDTH[tx_size]), int(TX_HEIGHT[tx_size])
    out = []
    for tt in range(16):
        v, hz = TX_TYPE_1D[TxType(tt)]
        ok = True
        for kind, n in ((v, H), (hz, W)):
            if kind in (TxType1D.ADST, TxType1D.FLIPADST) and n > 16:
                ok = False
            if kind == TxType1D.IDTX and n > 32:
                ok = False
            if kind == TxType1D.DCT and n > 64:
                ok = False
        if ok:
            out.append(TxType(tt))
    return out


# ------------------------------------------------- lossless WHT (4x4)

def _wht_lift(a, b, c, d):
    """Shared integer lifting butterfly (spec 7.13.3 inverse WHT body;
    the forward runs the same lifting on the residual, av1 fwht4x4)."""
    a = a + b
    d = d - c
    e = (a - d) >> 1
    b = e - b
    c = e - c
    a = a - c
    d = d + b
    return a, b, c, d


def fwht4x4(residual: np.ndarray) -> np.ndarray:
    """Forward Walsh-Hadamard 4x4 for lossless coding (av1 fwht4x4 /
    spec 7.13.3 inverse-WHT counterpart): residual (B, 4, 4) int ->
    coefficients (B, 4, 4) int32, scaled by 4 (UNIT_QUANT_FACTOR) so the
    qindex-0 quantizer step of 4 round-trips exactly."""
    x = residual.astype(np.int64)
    # pass 1: columns (in0..in3 = rows of the column)
    a, b, c, d = x[:, 0, :], x[:, 1, :], x[:, 2, :], x[:, 3, :]
    a, b, c, d = _wht_lift(a, b, c, d)
    # output order a, c, d, b (matches the inverse's a,c,d,b read order)
    y = np.stack([a, c, d, b], axis=1)
    # pass 2: rows
    a, b, c, d = y[:, :, 0], y[:, :, 1], y[:, :, 2], y[:, :, 3]
    a, b, c, d = _wht_lift(a, b, c, d)
    out = np.stack([a, c, d, b], axis=2)
    return (out << 2).astype(np.int32)


def iwht4x4_add(coeffs: np.ndarray, pred: np.ndarray, bd: int = 8) -> np.ndarray:
    """Inverse WHT + add + clip (spec 7.13.3, av1 iwht4x4_16_add):
    coeffs (B, 4, 4) int32 (quantizer output, multiples of 4),
    pred (B, 4, 4) uint16 -> recon (B, 4, 4) uint16."""
    x = coeffs.astype(np.int64) >> 2                  # UNIT_QUANT_SHIFT
    # pass 1: rows, reading [a, c, d, b]
    a, c, d, b = x[:, :, 0], x[:, :, 1], x[:, :, 2], x[:, :, 3]
    a = a + c
    d = d - b
    e = (a - d) >> 1
    b = e - b
    c = e - c
    a = a - b
    d = d + c
    y = np.stack([a, b, c, d], axis=2)
    # pass 2: columns
    a, c, d, b = y[:, 0, :], y[:, 1, :], y[:, 2, :], y[:, 3, :]
    a = a + c
    d = d - b
    e = (a - d) >> 1
    b = e - b
    c = e - c
    a = a - b
    d = d + c
    res = np.stack([a, b, c, d], axis=1)
    out = pred.astype(np.int64) + res
    return np.clip(out, 0, (1 << bd) - 1).astype(np.uint16)
