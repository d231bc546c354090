"""Batched open-loop intra RDO search on device (the MDS0/MDS1 analog).

This is the encoder's rate-distortion brain, restructured TPU-first instead
of the reference's per-block candidate loop (product_coding_loop.c:1786
md_stage_0 -> :9298 md_encode_block):

  * every block of one depth across the whole frame is scored in ONE device
    launch: prediction for all intra modes is a single (N, L) x (L, M*S*S)
    matmul (all AV1 intra predictors except PAETH are linear maps of the
    reference samples with power-of-2 rounding, so the matmul is exact in
    f32 for bd<=10);
  * residual transforms use orthonormalized versions of the real AV1 basis
    (probed from the bit-exact integer transforms), so transform-domain
    SSE equals pixel-domain SSE (Parseval) and the quantizer step maps
    through a single per-size gain;
  * rate is a CDF-derived cost model (codec/rd.py) evaluated with gathers
    and reductions -- the reference's md_rate_estimation tables, context
    averaged (its own fast stages approximate the same way);
  * mode decision is an argmin, TX-type search (full_loop.c:2280 analog)
    runs on the surviving mode only, mirroring the staged search.

The search is open loop (prediction references come from the *source*
picture, like the reference's open-loop ME/TPL stages); the conformant
encode pass re-predicts from recon with the decided modes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..codec import transforms as T
from ..codec.constants import PredictionMode, TxType, TxType1D, TX_TYPE_1D
from ..codec.intra_dir import MODE_TO_ANGLE, get_dx, get_dy

# linear modes in the matmul bank, in this order (PAETH appended separately)
LINEAR_MODES = (
    PredictionMode.DC_PRED, PredictionMode.V_PRED, PredictionMode.H_PRED,
    PredictionMode.D45_PRED, PredictionMode.D135_PRED, PredictionMode.D113_PRED,
    PredictionMode.D157_PRED, PredictionMode.D203_PRED, PredictionMode.D67_PRED,
    PredictionMode.SMOOTH_PRED, PredictionMode.SMOOTH_V_PRED,
    PredictionMode.SMOOTH_H_PRED,
)
ALL_MODES = LINEAR_MODES + (PredictionMode.PAETH_PRED,)
N_MODES = len(ALL_MODES)

# intra ext-tx search sets (definitions.h:1769 DTT4_IDTX_1DDCT / DTT4_IDTX).
# NOTE: the 1-D types (V_DCT/H_DCT) of eset 1 are deliberately NOT searched:
# streams coding them trip dav1d/libaom divergently (see tests/test_rdo.py
# xfail) even though our writer matches entropy_coding.c:556-615 element for
# element -- the reference's own intra search never emits them either. The
# signaling set remains DTT4_IDTX_1DDCT, only the candidates are restricted.
EXT_TX_SET_1 = (TxType.DCT_DCT, TxType.ADST_DCT, TxType.DCT_ADST,
                TxType.ADST_ADST, TxType.IDTX)
EXT_TX_SET_2 = (TxType.DCT_DCT, TxType.ADST_DCT, TxType.DCT_ADST,
                TxType.ADST_ADST, TxType.IDTX)

from ..codec.intra import _SM_WEIGHTS

_SM_W = {k: v.astype(np.float64) for k, v in _SM_WEIGHTS.items()}


# --------------------------------------------------------------- matrices
def _ref_len(S: int) -> int:
    # [corner, above(2S), left(2S)]
    return 1 + 4 * S


@functools.lru_cache(maxsize=16)
def mode_matrix_bank(S: int) -> np.ndarray:
    """(L, M_lin * S * S) f32: every linear intra predictor as one matrix.

    pred = floor(ref @ G + 0.5) reproduces the integer predictors exactly
    (all weights have power-of-2 denominators; see intra.py/intra_dir.py)."""
    L = _ref_len(S)
    A0 = 1              # ref index of above[0]
    L0 = 1 + 2 * S      # ref index of left[0]
    mats = []
    for mode in LINEAR_MODES:
        G = np.zeros((L, S, S), np.float64)
        if mode == PredictionMode.DC_PRED:
            G[A0:A0 + S] = 1.0 / (2 * S)
            G[L0:L0 + S] = 1.0 / (2 * S)
        elif mode == PredictionMode.V_PRED:
            for c in range(S):
                G[A0 + c, :, c] = 1.0
        elif mode == PredictionMode.H_PRED:
            for r in range(S):
                G[L0 + r, r, :] = 1.0
        elif mode == PredictionMode.SMOOTH_PRED:
            ww = _SM_W[S]
            for r in range(S):
                for c in range(S):
                    G[A0 + c, r, c] += ww[r] / 512.0
                    G[L0 + S - 1, r, c] += (256.0 - ww[r]) / 512.0
                    G[L0 + r, r, c] += ww[c] / 512.0
                    G[A0 + S - 1, r, c] += (256.0 - ww[c]) / 512.0
        elif mode == PredictionMode.SMOOTH_V_PRED:
            ww = _SM_W[S]
            for r in range(S):
                G[A0:A0 + S, r, :] += np.eye(S) * (ww[r] / 256.0)
                G[L0 + S - 1, r, :] += (256.0 - ww[r]) / 256.0
        elif mode == PredictionMode.SMOOTH_H_PRED:
            ww = _SM_W[S]
            for c in range(S):
                G[L0:L0 + S, :, c] += np.eye(S) * (ww[c] / 256.0)
                G[A0 + S - 1, :, c] += (256.0 - ww[c]) / 256.0
        else:  # directional
            _fill_directional(G, int(MODE_TO_ANGLE[mode]), S, A0, L0)
        mats.append(G.reshape(L, S * S))
    return np.stack(mats, axis=1).reshape(L, -1).astype(np.float32)


def _fill_directional(G, angle: int, S: int, A0: int, L0: int):
    """Weights for dr_pred z1/z2/z3 (intra_dir.py) -- static per (r, c)."""
    dx, dy = get_dx(angle), get_dy(angle)
    mb = 2 * S - 1  # max_base in the above/left ray
    if angle < 90:  # z1: above ray only
        for r in range(S):
            for c in range(S):
                x = (r + 1) * dx
                base = (x >> 6) + c
                shift = (x & 0x3F) >> 1
                if base >= mb:
                    G[A0 + mb, r, c] = 1.0
                else:
                    G[A0 + base, r, c] += (32 - shift) / 32.0
                    G[A0 + min(base + 1, mb), r, c] += shift / 32.0
    elif angle > 180:  # z3: left ray only
        for r in range(S):
            for c in range(S):
                y = (c + 1) * dy
                base = (y >> 6) + r
                shift = (y & 0x3F) >> 1
                if base >= mb:
                    G[L0 + mb, r, c] = 1.0
                else:
                    G[L0 + base, r, c] += (32 - shift) / 32.0
                    G[L0 + min(base + 1, mb), r, c] += shift / 32.0
    else:  # z2: both rays through the corner
        # buffers with corner at [0]: a[j] = ref[j] (j<=2S), l[0]=corner,
        # l[j>=1] = ref[2S + j]
        la = 1 + 2 * S

        def a_idx(j):
            return j  # 0 -> corner, j -> above[j-1]

        def l_idx(j):
            return 0 if j == 0 else 2 * S + j

        for r in range(S):
            for c in range(S):
                x = -(r + 1) * dx + (c << 6)
                base1 = x >> 6
                if base1 >= -1:
                    shift1 = (x & 0x3F) >> 1
                    i1 = int(np.clip(base1 + 1, 0, la - 2))
                    G[a_idx(i1), r, c] += (32 - shift1) / 32.0
                    G[a_idx(i1 + 1), r, c] += shift1 / 32.0
                else:
                    y = (r << 6) - (c + 1) * dy
                    base2 = y >> 6
                    shift2 = (y & 0x3F) >> 1
                    i2 = int(np.clip(base2 + 1, 0, la - 2))
                    G[l_idx(i2), r, c] += (32 - shift2) / 32.0
                    G[l_idx(i2 + 1), r, c] += shift2 / 32.0


# ------------------------------------------------------------- transforms
@functools.lru_cache(maxsize=64)
def orth_1d(kind: int, n: int, inverse: bool = False) -> np.ndarray:
    """Orthonormalized AV1 1-D transform basis (n, n) f32, probed from the
    bit-exact integer kernels so the search scores the real AV1 basis
    (including FLIPADST direction and the identity)."""
    kind = TxType1D(kind)
    if kind == TxType1D.IDTX:
        return np.eye(n, dtype=np.float32)
    scale = 1 << 14
    x = (np.eye(n) * scale).astype(np.int64)
    cos_bit = 12 if n >= 8 else 13
    y = T._txfm_1d(x, kind, n, cos_bit, False, None).astype(np.float64)
    M = y.T / scale  # y rows are T @ (scale e_i) => columns of T
    # rows of the integer basis share one gain by construction; normalize
    # per-row to be exact
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    return (M / norms).astype(np.float32)


@functools.lru_cache(maxsize=64)
def coeff_gain(S: int) -> float:
    """Scalar k with c_av1 = k * c_orth for an SxS AV1 forward transform
    (including the quantizer's tx_scale shift), measured against the numpy
    golden model. Used to map the AV1 quantizer step into the orthonormal
    search domain."""
    from ..codec.quant import TX_SCALE
    from ..codec.transforms import forward_transform_2d

    tx_size = {4: 0, 8: 1, 16: 2, 32: 3, 64: 4}[S]
    rng = np.random.default_rng(7)
    r = rng.integers(-255, 256, (4, S, S)).astype(np.int32)
    c_av1 = forward_transform_2d(r, tx_size, 0).astype(np.float64)
    d = orth_1d(int(TxType1D.DCT), S)
    c_orth = np.einsum("ab,nbc,dc->nad", d, r.astype(np.float64), d)
    keep = min(S, 32)
    num = (c_av1[:, :keep, :keep] * c_orth[:, :keep, :keep]).sum()
    den = (c_orth[:, :keep, :keep] ** 2).sum()
    k = num / den
    # fold the quantizer-side tx_scale: level = c_av1 * 2^log_scale / dequant
    # = c_orth * (k * 2^log_scale) / dequant -> step_orth = dequant / gain.
    # Lands at gain == 8 for every size (the Q3 quantizer convention).
    return float(k * (1 << int(TX_SCALE[tx_size])))


def tx_pair(tx_type: TxType, S: int):
    """(Tv, Th) orthonormal matrices for a 2-D tx type (flip folded in)."""
    vk, hk = TX_TYPE_1D[TxType(tx_type)]

    def mat(kind):
        if kind == TxType1D.FLIPADST:
            return orth_1d(int(TxType1D.ADST), S)[:, ::-1].copy()
        return orth_1d(int(kind), S)

    return mat(vk), mat(hk)


# ------------------------------------------------------------ device kernel
def _paeth_jnp(above, left, corner):
    """above (N,S), left (N,S), corner (N,) -> (N,S,S) f32."""
    t = above[:, None, :]
    l = left[:, :, None]
    tl = corner[:, None, None]
    base = t + l - tl
    p_l = jnp.abs(base - l)
    p_t = jnp.abs(base - t)
    p_tl = jnp.abs(base - tl)
    return jnp.where((p_l <= p_t) & (p_l <= p_tl), jnp.broadcast_to(l, base.shape),
                     jnp.where(p_t <= p_tl, jnp.broadcast_to(t, base.shape),
                               jnp.broadcast_to(tl, base.shape)))


def _txb_rd(coeff, qstep, scan, level_bits, eob_bits, txb_skip, keep=None):
    """RD of one transform-block batch in the orthonormal domain.

    coeff: (..., n) f32 scan-ordered? NO: raster (..., n); scan: (n,) raster
    positions in scan order. qstep: (..., n) per-position step (dc/ac + QM).
    Returns (dist (...,), rate_bits (...,)).
    """
    lvl = jnp.floor(jnp.abs(coeff) / qstep + 0.375)
    lvl = jnp.clip(lvl, 0.0, 63.0)
    err = jnp.abs(coeff) - lvl * qstep
    dist = jnp.sum(err * err, axis=-1)
    lvl_scan = jnp.take(lvl, scan, axis=-1)
    n = scan.shape[0]
    idx = jnp.arange(n, dtype=jnp.float32)
    nz = lvl_scan > 0
    eob = jnp.max(jnp.where(nz, idx + 1.0, 0.0), axis=-1)
    include = idx < eob[..., None]
    lv_bits = jnp.take(level_bits, lvl_scan.astype(jnp.int32), axis=0)
    rate = jnp.sum(jnp.where(include, lv_bits, 0.0), axis=-1)
    rate = rate + jnp.take(eob_bits, eob.astype(jnp.int32), axis=0)
    rate = jnp.where(eob > 0, rate + txb_skip[0], txb_skip[1])
    return dist, rate


def search_block_batch_np(src, refs, qstep_dc, qstep_ac, lam, G, scan2d,
                          scans_tx, tvs, ths, level_bits, eob_bits, txb_skip,
                          y_mode_bits, ext_tx_bits, qm_w, dist_w=None,
                          tx_lam_scale=1.0, S: int = 8, n_tx: int = 1):
    if dist_w is None:
        dist_w = np.ones(N_MODES, np.float32)
    """Numpy mirror of search_block_batch — the host golden model, and the
    fast path for tiny frames where an XLA compile costs more than it buys
    (N below ~512 blocks). Bit-identical math modulo float accumulation
    order."""
    N = src.shape[0]
    M = N_MODES
    keep = min(S, 32)
    nk = keep * keep

    refs = refs.astype(np.float32)
    preds = np.floor(refs @ G.astype(np.float32) + np.float32(0.5))
    preds = preds.reshape(N, M - 1, S, S)
    corner = refs[:, 0]
    above = refs[:, 1:1 + S]
    left = refs[:, 1 + 2 * S:1 + 3 * S]
    t = above[:, None, :]
    l = left[:, :, None]
    tl = corner[:, None, None]
    base = t + l - tl
    p_l, p_t, p_tl = np.abs(base - l), np.abs(base - t), np.abs(base - tl)
    paeth = np.where((p_l <= p_t) & (p_l <= p_tl), np.broadcast_to(l, base.shape),
                     np.where(p_t <= p_tl, np.broadcast_to(t, base.shape),
                              np.broadcast_to(tl, base.shape)))
    preds = np.concatenate([preds, paeth[:, None].astype(np.float32)], axis=1)

    resid = src[:, None].astype(np.float32) - preds.astype(np.float32)
    d = tvs[0].astype(np.float32)
    coeff = np.einsum("ab,nmbc,dc->nmad", d, resid, d, optimize=True)
    if keep < S:
        lost = (coeff ** 2).sum((-1, -2)) - (coeff[..., :keep, :keep] ** 2).sum((-1, -2))
        coeff = coeff[..., :keep, :keep]
    else:
        lost = np.zeros((N, M))
    cf = coeff.reshape(N, M, nk)

    idx_n = np.arange(nk, dtype=np.float32)

    def txb_rd(cfx, qsx, scan):
        acf = np.abs(cfx, dtype=np.float32)
        lvl = np.clip(np.floor(acf / qsx + np.float32(0.375)), 0, 63)
        err = acf - lvl * qsx
        dist = (err * err).sum(-1)
        lvl_scan = np.take_along_axis(
            lvl, np.broadcast_to(scan, lvl.shape[:-1] + (nk,)), axis=-1)
        eob = np.max(np.where(lvl_scan > 0, idx_n + 1, 0), axis=-1)
        include = idx_n < eob[..., None]
        rate = np.where(include, level_bits[lvl_scan.astype(np.int32)], 0).sum(-1)
        rate = rate + eob_bits[eob.astype(np.int32)]
        return dist, np.where(eob > 0, rate + txb_skip[0], txb_skip[1])

    qs = (np.broadcast_to(qstep_ac[:, None, None], (N, M, nk)) * qm_w).astype(np.float32)
    qs[:, :, 0] = qstep_dc[:, None] * qm_w[0]
    dist, rate = txb_rd(cf, qs, scan2d)
    cost = (dist + lost) * np.asarray(dist_w, np.float32)[None, :] \
        + lam * (rate + y_mode_bits[None, :])
    best_mode = np.argmin(cost, axis=1).astype(np.int32)
    mode_cost0 = np.min(cost, axis=1)
    if n_tx <= 1:
        return best_mode, np.zeros(N, np.int32), mode_cost0, mode_cost0

    br = np.take_along_axis(resid, best_mode[:, None, None, None], axis=1)[:, 0]
    ctx = np.einsum("tab,nbc,tdc->ntad", tvs.astype(np.float32), br,
                    ths.astype(np.float32), optimize=True)
    cft = ctx.reshape(N, n_tx, nk)
    qst = (np.broadcast_to(qstep_ac[:, None, None], (N, n_tx, nk)) * qm_w).astype(np.float32)
    qst[:, :, 0] = qstep_dc[:, None] * qm_w[0]
    acf = np.abs(cft, dtype=np.float32)
    lvl = np.clip(np.floor(acf / qst + np.float32(0.375)), 0, 63)
    err = acf - lvl * qst
    dist_t = (err * err).sum(-1)
    lvl_scan = np.take_along_axis(
        lvl, np.broadcast_to(scans_tx[None], (N, n_tx, nk)), axis=-1)
    eob = np.max(np.where(lvl_scan > 0, idx_n + 1, 0), axis=-1)
    include = idx_n < eob[..., None]
    rate_t = np.where(include, level_bits[lvl_scan.astype(np.int32)], 0).sum(-1)
    rate_t = rate_t + eob_bits[eob.astype(np.int32)]
    rate_t = np.where(eob > 0, rate_t + txb_skip[0], txb_skip[1])
    cost_t = dist_t + lam * np.float32(tx_lam_scale) * (rate_t + ext_tx_bits[None, :])
    best_tx = np.argmin(cost_t, axis=1).astype(np.int32)
    best_cost = np.min(cost_t, axis=1) + lam * y_mode_bits[best_mode]
    return best_mode, best_tx, best_cost, mode_cost0


@functools.partial(jax.jit, static_argnames=("S", "n_tx"))
def search_block_batch(src, refs, qstep_dc, qstep_ac, lam, G, scan2d, scans_tx,
                       tvs, ths, level_bits, eob_bits, txb_skip, y_mode_bits,
                       ext_tx_bits, qm_w, dist_w, tx_lam_scale,
                       S: int, n_tx: int):
    """One depth's full-frame intra mode + tx-type search.

    src:       (N, S, S) f32 source blocks
    refs:      (N, L) f32 reference sample vectors
    qstep_*:   (N,) per-block quantizer steps (orthonormal domain)
    lam:       scalar f32, SSE per bit
    G:         (L, M_lin*S*S) prediction matrix bank
    scan2d:    (n,) int32 zigzag scan (DCT class)
    scans_tx:  (n_tx, n) int32 per-candidate-tx scans
    tvs/ths:   (n_tx, S, S) f32 orthonormal 1-D bases per candidate tx
    level_bits (64,), eob_bits (n+1,), txb_skip (2,), y_mode_bits (M,),
    ext_tx_bits (n_tx,), qm_w (n,) f32 per-position QM step scale.

    Returns (best_mode (N,), best_tx (N,), best_cost (N,), mode_cost0 (N,)).
    """
    N = src.shape[0]
    M = N_MODES
    n = S * S
    keep = min(S, 32)

    preds = jnp.floor(
        jnp.dot(refs, G, precision=jax.lax.Precision.HIGHEST) + 0.5)
    preds = preds.reshape(N, M - 1, S, S)
    corner = refs[:, 0]
    above = refs[:, 1:1 + S]
    left = refs[:, 1 + 2 * S:1 + 3 * S]
    paeth = _paeth_jnp(above, left, corner)
    preds = jnp.concatenate([preds, paeth[:, None]], axis=1)

    resid = src[:, None] - preds                      # (N, M, S, S)
    d = tvs[0]                                        # DCT basis
    tmp = jnp.einsum("ab,nmbc->nmac", d, resid, precision=jax.lax.Precision.HIGHEST)
    coeff = jnp.einsum("nmac,dc->nmad", tmp, d, precision=jax.lax.Precision.HIGHEST)
    if keep < S:
        # TX_64: only the low 32x32 region is coded; the rest is distortion
        lost = (jnp.sum(coeff * coeff, axis=(-1, -2))
                - jnp.sum(coeff[..., :keep, :keep] ** 2, axis=(-1, -2)))
        coeff = coeff[..., :keep, :keep]
    else:
        lost = jnp.zeros((N, M), jnp.float32)
    nk = keep * keep
    cf = coeff.reshape(N, M, nk)
    qs = jnp.broadcast_to(qstep_ac[:, None, None], (N, M, nk)) * qm_w[None, None, :]
    qs = qs.at[:, :, 0].set(qstep_dc[:, None] * qm_w[0])
    dist, rate = _txb_rd(cf, qs, scan2d, level_bits, eob_bits, txb_skip)
    dist = (dist + lost) * dist_w[None, :]   # spy-rd per-mode dist weights
    cost = dist + lam * (rate + y_mode_bits[None, :])  # (N, M)
    best_mode = jnp.argmin(cost, axis=1)
    mode_cost0 = jnp.min(cost, axis=1)

    if n_tx <= 1:
        return (best_mode.astype(jnp.int32),
                jnp.zeros(N, jnp.int32), mode_cost0, mode_cost0)

    # --- stage 2: tx-type search on the surviving mode
    br = jnp.take_along_axis(resid, best_mode[:, None, None, None]
                             .astype(jnp.int32), axis=1)[:, 0]  # (N, S, S)
    tmp2 = jnp.einsum("tab,nbc->ntac", tvs, br, precision=jax.lax.Precision.HIGHEST)
    ctx = jnp.einsum("ntac,tdc->ntad", tmp2, ths, precision=jax.lax.Precision.HIGHEST)
    cft = ctx.reshape(N, n_tx, nk)
    qst = jnp.broadcast_to(qstep_ac[:, None, None], (N, n_tx, nk)) * qm_w[None, None, :]
    qst = qst.at[:, :, 0].set(qstep_dc[:, None] * qm_w[0])
    # gather per-tx scan: levels (N, n_tx, n) -> take along last with scans_tx
    lvl = jnp.clip(jnp.floor(jnp.abs(cft) / qst + 0.375), 0.0, 63.0)
    err = jnp.abs(cft) - lvl * qst
    dist_t = jnp.sum(err * err, axis=-1)
    lvl_scan = jnp.take_along_axis(lvl, jnp.broadcast_to(
        scans_tx[None], (N, n_tx, nk)), axis=-1)
    idx = jnp.arange(nk, dtype=jnp.float32)
    eob = jnp.max(jnp.where(lvl_scan > 0, idx + 1.0, 0.0), axis=-1)
    include = idx[None, None, :] < eob[..., None]
    lv_bits = jnp.take(level_bits, lvl_scan.astype(jnp.int32), axis=0)
    rate_t = jnp.sum(jnp.where(include, lv_bits, 0.0), axis=-1)
    rate_t = rate_t + jnp.take(eob_bits, eob.astype(jnp.int32), axis=0)
    rate_t = jnp.where(eob > 0, rate_t + txb_skip[0], txb_skip[1])
    # sharp-tx: the RDOQ rweight-kill analog (full_loop.c:1176) — shrink the
    # rate weight in the TX decision so sharper transforms keep energy
    cost_t = dist_t + lam * tx_lam_scale * (rate_t + ext_tx_bits[None, :])
    best_tx = jnp.argmin(cost_t, axis=1)
    best_cost = jnp.min(cost_t, axis=1) + lam * jnp.take(y_mode_bits, best_mode)
    return (best_mode.astype(jnp.int32), best_tx.astype(jnp.int32),
            best_cost, mode_cost0)


@functools.partial(jax.jit, static_argnames=("cfgs",))
def search_multi_depth_flat(flat, lam, tables, cfgs):
    """Like search_multi_depth, but every per-frame input arrives in ONE
    flat f32 vector ([blocks, refs, qdc, qac] per depth, concatenated) and
    the constant tables are pre-uploaded device arrays — one upload + one
    download per frame total. cfgs: ((S, n_tx, Npad, L), ...)."""
    parts = []
    off = 0
    for dtb, (S, n_tx, N, L) in zip(tables, cfgs):
        blocks = flat[off:off + N * S * S].reshape(N, S, S); off += N * S * S
        refs = flat[off:off + N * L].reshape(N, L); off += N * L
        qdc = flat[off:off + N]; off += N
        qac = flat[off:off + N]; off += N
        bm, bt, bc, _ = search_block_batch(
            blocks, refs, qdc, qac, lam, dtb["G"], dtb["scan2d"],
            dtb["scans_tx"], dtb["tvs"], dtb["ths"], dtb["level_bits"],
            dtb["eob_bits"], dtb["txb_skip"], dtb["y_mode_bits"],
            dtb["ext_tx_bits"], dtb["qm_w"], dtb["dist_w"],
            dtb["tx_lam_scale"], S=S, n_tx=n_tx)
        parts += [bm.astype(jnp.float32), bt.astype(jnp.float32), bc]
    return jnp.concatenate(parts)


@functools.partial(jax.jit, static_argnames=("cfgs",))
def search_multi_depth(args, lam, cfgs):
    """All partition depths of one frame in a single device dispatch AND a
    single packed output (host<->device round trips cost ~60 ms each over
    the tunneled chip, dwarfing the ~1 ms of compute). args: tuple of
    per-depth argument tuples matching search_block_batch's array signature;
    cfgs: ((S, n_tx), ...). Returns one f32 vector: per depth
    [modes, tx, cost] concatenated (mode/tx values are small ints, exact in
    f32); unpack with unpack_multi_depth."""
    parts = []
    for a, (S, n_tx) in zip(args, cfgs):
        blocks, refs, qdc, qac, dtb = a
        bm, bt, bc, _ = search_block_batch(
            blocks, refs, qdc, qac, lam, dtb["G"], dtb["scan2d"],
            dtb["scans_tx"], dtb["tvs"], dtb["ths"], dtb["level_bits"],
            dtb["eob_bits"], dtb["txb_skip"], dtb["y_mode_bits"],
            dtb["ext_tx_bits"], dtb["qm_w"], dtb["dist_w"],
            dtb["tx_lam_scale"], S=S, n_tx=n_tx)
        parts += [bm.astype(jnp.float32), bt.astype(jnp.float32), bc]
    return jnp.concatenate(parts)


def unpack_multi_depth(packed: np.ndarray, ns):
    """Split the packed search_multi_depth output back into per-depth
    (modes int32, tx int32, cost f32) given the per-depth padded N list."""
    out = []
    off = 0
    for n in ns:
        bm = packed[off:off + n].astype(np.int32); off += n
        bt = packed[off:off + n].astype(np.int32); off += n
        bc = packed[off:off + n]; off += n
        out.append((bm, bt, bc))
    return out
