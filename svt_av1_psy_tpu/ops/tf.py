"""Device (TPU) temporal filtering: whole-frame alt-ref denoising in a few
jitted programs per neighbor.

Behavior reference: temporal_filtering.c (svt_av1_init_temporal_filtering —
per-32x32 TF-ME with 16x16 sub-block refinement when the block error is
high, apply_filtering_c's per-pixel windowed-error weight modifiers) —
re-expressed TPU-first instead of the reference's per-block C loop: the
center/neighbor planes upload once, TF-ME reuses the inter-search HME +
MXU im2col SSD-grid machinery (ops/inter_search.grids_stage), and the
32-vs-16 refinement choice, prediction assembly, 5x5 windowed error and
exp-decay weights are dense elementwise stages over the whole plane.
Per-neighbor predictions/weights stay in HBM; one weighted-average
finalize program per plane brings back exactly three filtered planes.

The filter is encoder-side only (no conformance impact), so the device
path matches the host path's *shape* (same thresholds, same weight
formula, same refinement rule) but not bit-for-bit (its TF-ME is the
HME+grid search rather than the host diamond search).
"""

from __future__ import annotations

import functools

import numpy as np

from .inter_search import (G, R, _gather_blocks, _jnp, _sb_to_grid,
                           grids_stage, pad_dims, prep_frame, prep_ref)

_CENTER_W = 16.0


def _jax():
    import jax
    return jax


def _box5(d2):
    """5x5 windowed mean of per-pixel squared error, edge-padded (the host
    kernel's integral-image box mean, as a reduce_window sum — f32 window
    adds are near-exact here; any rounding is negligible against the
    exp-decay weighting this feeds)."""
    import jax.lax as lax
    jnp = _jnp()
    p = jnp.pad(d2, 2, mode="edge")
    s = lax.reduce_window(p, 0.0, lax.add, (5, 5), (1, 1), "VALID")
    return s * (1.0 / 25.0)


def _best_mv(ssd8, cy2, cx2, nsr, nsc, kh, B, Hr, Wr):
    """Best full-pel MV per (64/kh)-sized unit from the per-8x8-child SSD
    grids: aggregate children into kh x kh units per SB, argmin over both
    HME-center windows, clip to the frame interior."""
    jnp = _jnp()
    n = nsr * nsc
    c = 8 // kh                                    # children per unit side
    agg = ssd8.reshape(2, n, kh, c, kh, c, G, G).sum(axis=(3, 5))
    grid = jnp.stack([_sb_to_grid(agg[ci], nsr, nsc, kh, kh)
                      for ci in range(2)], axis=2)  # (gr, gc, 2, G, G)
    gr, gc = grid.shape[:2]
    flat = grid.reshape(gr, gc, 2 * G * G)
    idx = jnp.argmin(flat, axis=-1)
    sel = idx // (G * G)
    off = idx % (G * G)
    dy = (off // G - R).astype(jnp.int32)
    dx = (off % G - R).astype(jnp.int32)

    def ctr_grid(v):
        per = [_sb_to_grid(jnp.broadcast_to(v[ci].reshape(n, 1, 1),
                                            (n, kh, kh)), nsr, nsc, kh, kh)
               for ci in range(2)]
        return jnp.stack(per, axis=-1)

    ctr_y = jnp.take_along_axis(ctr_grid(cy2), sel[..., None], axis=-1)[..., 0]
    ctr_x = jnp.take_along_axis(ctr_grid(cx2), sel[..., None], axis=-1)[..., 0]
    by = jnp.arange(gr, dtype=jnp.int32)[:, None] * B
    bx = jnp.arange(gc, dtype=jnp.int32)[None, :] * B
    mv_y = jnp.clip(ctr_y + dy, -by, (Hr - B) - by)
    mv_x = jnp.clip(ctr_x + dx, -bx, (Wr - B) - bx)
    return mv_y, mv_x


def _blocks_to_plane(blk, B):
    """(Gr, Gc, B, B) -> (Gr*B, Gc*B)."""
    gr, gc = blk.shape[:2]
    return blk.swapaxes(1, 2).reshape(gr * B, gc * B)


def _rep(x, B):
    """(gr, gc) per-block value -> full plane by pixel replication."""
    jnp = _jnp()
    return jnp.repeat(jnp.repeat(x, B, axis=0), B, axis=1)


@functools.partial(__import__("jax").jit, static_argnames=("Hr", "Wr"))
def tf_pair_stage(src, ref, cy2, cx2, ssd8, thresh, Hr: int, Wr: int):
    """One neighbor's TF contribution for the luma plane.

    Consumes grids_stage outputs. Implements the host kernel's rules:
    32x32 TF-ME, 16x16 sub-block refinement where the 32x32 MSE exceeds
    `thresh` and the sub-blocks do better, block acceptance weight
    round(16*exp(-mse/thresh)) zeroed above 8*thresh, and the per-pixel
    weight from 0.5 * box5(d^2) + 0.5 * block MSE. Returns
    (pred (Hp, Wp) f32, w (Hp, Wp) f32, mv32_y, mv32_x (gr32, gc32) i32)
    — all left on the device for the finalize/chroma stages."""
    jnp = _jnp()
    Hp, Wp = src.shape
    nsr, nsc = Hp // 64, Wp // 64

    mv32y, mv32x = _best_mv(ssd8, cy2, cx2, nsr, nsc, 2, 32, Hr, Wr)
    mv16y, mv16x = _best_mv(ssd8, cy2, cx2, nsr, nsc, 4, 16, Hr, Wr)

    p32 = _gather_blocks(ref, mv32y, mv32x, 32, 32)
    p16 = _gather_blocks(ref, mv16y, mv16x, 16, 16)
    blk32 = src.reshape(Hp // 32, 32, Wp // 32, 32).swapaxes(1, 2)
    blk16 = src.reshape(Hp // 16, 16, Wp // 16, 16).swapaxes(1, 2)
    mse32 = ((p32 - blk32) ** 2).mean(axis=(-1, -2))
    err16 = ((p16 - blk16) ** 2).mean(axis=(-1, -2))
    gr32, gc32 = mse32.shape
    mse16 = (err16.reshape(gr32, 2, gc32, 2).swapaxes(1, 2)
             .mean(axis=(-1, -2)))

    use_sub = (mse32 > thresh) & (mse16 < mse32)
    mse = jnp.where(use_sub, mse16, mse32)
    pred = jnp.where(_rep(use_sub, 32),
                     _blocks_to_plane(p16, 16), _blocks_to_plane(p32, 32))

    wgt = jnp.where(mse < 8.0 * thresh,
                    jnp.round(_CENTER_W * jnp.exp(-mse / thresh)), 0.0)
    d2 = (pred - src) ** 2
    err = 0.5 * _box5(d2) + 0.5 * _rep(mse, 32)
    w = jnp.round(_CENTER_W * jnp.exp(-err / thresh))
    w = jnp.where(_rep(wgt, 32) > 0.0, w, 0.0)
    return pred, w, mv32y, mv32x


@functools.partial(__import__("jax").jit, static_argnames=("Hc", "Wc"))
def tf_chroma_stage(cu, cv, ru, rv, mv32y, mv32x, wy, thresh_uv,
                    Hc: int, Wc: int):
    """One neighbor's chroma contribution (4:2:0). The luma 32x32 MVs
    transfer down halved (the host kernel's dy>>1 mapping), the luma gate
    transfers by 2x decimation, and the per-pixel error term comes from
    the chroma plane itself against its own noise-adapted threshold."""
    jnp = _jnp()
    grc, gcc = mv32y.shape                     # one 16x16 chroma block per
    by = jnp.arange(grc, dtype=jnp.int32)[:, None] * 16   # 32x32 luma block
    bx = jnp.arange(gcc, dtype=jnp.int32)[None, :] * 16
    mvy = jnp.clip(jnp.right_shift(mv32y, 1), -by, (Hc - 16) - by)
    mvx = jnp.clip(jnp.right_shift(mv32x, 1), -bx, (Wc - 16) - bx)
    gate = wy[::2, ::2] > 0.0
    outs = []
    for csrc, cref in ((cu, ru), (cv, rv)):
        pred = _blocks_to_plane(_gather_blocks(cref, mvy, mvx, 16, 16), 16)
        d2 = (pred - csrc) ** 2
        w = jnp.round(_CENTER_W * jnp.exp(-_box5(d2) / thresh_uv))
        w = jnp.where(gate, w, 0.0)
        outs += [pred, w]
    return tuple(outs)


@functools.partial(__import__("jax").jit, static_argnames=("Hr", "Wr"))
def tf_finalize_stage(src, preds, ws, Hr: int, Wr: int):
    """Weighted average over the neighbor stack (center weight 16), with
    the host kernel's round-half-up integer division; crops the SB padding
    and returns the (Hr, Wr) filtered plane."""
    jnp = _jnp()
    acc = src * _CENTER_W + (preds * ws).sum(axis=0)
    den = _CENTER_W + ws.sum(axis=0)
    out = jnp.floor((acc + jnp.floor(den * 0.5)) / den)
    return out[:Hr, :Wr]


# HBM budget: the TF pair program's live im2col/grid temps scale with the
# SB count (~1.7 MB/SB at peak: the 81x81 correlation surface + its
# patches). A whole 4K frame (2040 SBs) peaks ~7 GB — fine on a 16 GB
# chip since the per-SB band-materialization bug in _sb_windows was fixed
# — so only beyond-4K frames band-split. Bands process independently:
# TF-ME MVs are clipped band-internal by the grid machinery anyway, and
# the filter is non-normative, so the only effect is that motion crossing
# a band boundary earns weight ~0 (no filtering there) instead of a match.
_SB_BUDGET = 2048


def temporal_filter_device(center, neighbors, strength: int, bd: int = 8):
    """Device analog of codec.temporal_filter.temporal_filter: same
    signature, same thresholds (host-side noise estimation is one cheap
    vectorized pass), whole-frame device TF-ME + filtering. All programs
    for all neighbors dispatch before the first fetch; exactly three
    device->host transfers (the filtered planes). Frames above _SB_BUDGET
    superblocks band-split to bound HBM."""
    cy0 = np.asarray(center[0])
    H, W = cy0.shape
    nsc = -(-W // 64)
    if -(-H // 64) * nsc > _SB_BUDGET:
        rows = max(1, _SB_BUDGET // nsc) * 64
        outs = []
        y0 = 0
        while y0 < H:
            y1 = min(y0 + rows, H)
            if H - y1 < 64:      # fold a short tail into the last band
                y1 = H

            def cut(t, lo, hi):
                return tuple(
                    None if p is None
                    else np.asarray(p)[lo >> s: (hi + s) >> s]
                    for p, s in zip(t, (0, 1, 1)))

            outs.append(_tf_device_frame(cut(center, y0, y1),
                                         [cut(nb, y0, y1)
                                          for nb in neighbors],
                                         strength, bd))
            y0 = y1
        fy = np.concatenate([o[0] for o in outs], axis=0)
        if outs[0][1] is None:
            return fy, None, None
        return (fy, np.concatenate([o[1] for o in outs], axis=0),
                np.concatenate([o[2] for o in outs], axis=0))
    return _tf_device_frame(center, neighbors, strength, bd)


def _tf_device_frame(center, neighbors, strength: int, bd: int = 8):
    import jax

    from ..codec.temporal_filter import _noise_decay, estimate_plane_noise

    cy, cu, cv = center
    if strength <= 0 or not neighbors:
        return cy, cu, cv
    cy = np.asarray(cy)
    H, W = cy.shape
    Hp, Wp = pad_dims(H, W)
    base = 24.0 * (2.0 ** (strength - 1)) * (1 << (2 * (bd - 8)))
    thresh = base * _noise_decay(estimate_plane_noise(cy, bd))
    mono = cu is None
    if not mono:
        cu = np.asarray(cu)
        cv = np.asarray(cv)
        thresh_uv = base * _noise_decay(estimate_plane_noise(cu, bd))
        Hc, Wc = cu.shape
        Hp2, Wp2 = Hp // 2, Wp // 2

    def up(p, hp, wp):
        return prep_frame(jax.device_put(
            np.ascontiguousarray(p, np.uint16)), Hp=hp, Wp=wp)

    def up_ref(p, hp, wp):
        return prep_ref(jax.device_put(
            np.ascontiguousarray(p, np.uint16)), Hp=hp, Wp=wp)

    src, _ = up(cy, Hp, Wp)
    if not mono:
        csrc_u, _ = up(cu, Hp2, Wp2)
        csrc_v, _ = up(cv, Hp2, Wp2)
    preds_y, ws_y = [], []
    preds_u, ws_u, preds_v, ws_v = [], [], [], []
    for ny, nu, nv in neighbors:
        nref = up_ref(np.asarray(ny), Hp, Wp)
        g = grids_stage(src, nref)
        pred, w, mv32y, mv32x = tf_pair_stage(src, nref, *g,
                                              np.float32(thresh),
                                              Hr=H, Wr=W)
        preds_y.append(pred)
        ws_y.append(w)
        if not mono:
            ru = up_ref(np.asarray(nu), Hp2, Wp2)
            rv = up_ref(np.asarray(nv), Hp2, Wp2)
            pu, wu, pv, wv = tf_chroma_stage(
                csrc_u, csrc_v, ru, rv, mv32y, mv32x, w,
                np.float32(thresh_uv), Hc=Hc, Wc=Wc)
            preds_u.append(pu)
            ws_u.append(wu)
            preds_v.append(pv)
            ws_v.append(wv)

    import jax.numpy as jnp

    fy = tf_finalize_stage(src, jnp.stack(preds_y), jnp.stack(ws_y),
                           Hr=H, Wr=W)
    if mono:
        return np.asarray(fy).astype(cy.dtype), None, None
    fu = tf_finalize_stage(csrc_u, jnp.stack(preds_u), jnp.stack(ws_u),
                           Hr=Hc, Wr=Wc)
    fv = tf_finalize_stage(csrc_v, jnp.stack(preds_v), jnp.stack(ws_v),
                           Hr=Hc, Wr=Wc)
    return (np.asarray(fy).astype(cy.dtype),
            np.asarray(fu).astype(cu.dtype),
            np.asarray(fv).astype(cv.dtype))
