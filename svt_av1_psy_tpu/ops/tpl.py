"""Device (TPU) TPL cost pass: per-16x16 motion search + SA8D inter/intra
costs for a whole lookahead group in a few jitted programs per frame pair.

Behavior reference: src_ops_process.c:2289 (tpl_mc_flow group propagation
fed by per-16x16 intra SATD and motion-compensated inter SATD costs) —
re-expressed TPU-first: the group's planes upload once, each consecutive
pair reuses the inter-search HME + MXU im2col SSD-grid machinery
(ops/inter_search.grids_stage), a small aggregation stage reduces the
8x8-child grids to 16x16 TPL units and scores the mean-removed source /
MC residual with Hadamard (SA8D) matmuls. The host keeps only the
backward dependency propagation (rc/tpl.py), which is serial by nature
and tiny.

All programs for a group dispatch asynchronously back-to-back; the host
fetches one packed f32 vector per frame (a single tunnel round trip).
"""

from __future__ import annotations

import functools

import numpy as np

from .inter_search import (G, R, _gather_blocks, _jnp, _sb_to_grid,
                           grids_stage, pad_dims, prep_frame)

BLK = 16


def _jax():
    import jax
    return jax


def _sa8d16(blocks):
    """(Gr, Gc, 16, 16) f32 -> (Gr, Gc) SA8D summed over the four 8x8
    quadrants: floor((sum|H8 q H8^T| + 2) / 4) per quadrant
    (psy_rd.c:65 / psy.psy_rd.sa8d_blocks semantics)."""
    jnp = _jnp()
    from .inter_search import _HAD8

    h = jnp.asarray(_HAD8)
    gr, gc = blocks.shape[:2]
    q = (blocks.reshape(gr, gc, 2, 8, 2, 8).transpose(0, 1, 2, 4, 3, 5)
         .reshape(gr, gc, 4, 8, 8))
    t = jnp.einsum("ij,...jk->...ik", h, q)
    t = jnp.einsum("...ik,lk->...il", t, h)
    per_q = jnp.floor((jnp.abs(t).sum(axis=(-1, -2)) + 2.0) * 0.25)
    return per_q.sum(axis=-1)


@functools.partial(__import__("jax").jit, static_argnames=("Hr", "Wr"))
def tpl_intra_stage(src, Hr: int, Wr: int):
    """Per-16x16 intra cost of one plane: SA8D of the mean-removed block
    (the elementary encoder's best-intra proxy). Returns (Gr*Gc,) f32."""
    jnp = _jnp()
    Hp, Wp = src.shape
    gr, gc = Hp // BLK, Wp // BLK
    blk = src.reshape(gr, BLK, gc, BLK).swapaxes(1, 2)
    mean = jnp.floor(blk.mean(axis=(-1, -2), keepdims=True))
    intra = jnp.maximum(_sa8d16(blk - mean), 1.0)
    return intra.reshape(gr * gc)


@functools.partial(__import__("jax").jit, static_argnames=("Hr", "Wr"))
def tpl_pair_stage(src, ref, cy2, cx2, ssd8, Hr: int, Wr: int):
    """TPL costs of one frame against its display predecessor.

    Consumes grids_stage outputs (two HME centers + 8x8-child SSD grids
    per 64x64 SB); aggregates children 2x2 -> 16x16 TPL-unit grids, picks
    the best full-pel MV over both center windows, gathers the prediction
    and scores SA8D(residual) — the reference's tpl_mc_flow inter cost.
    MVs clip to the frame interior like the host kernel clamps its
    search. Returns one packed f32 vector [mv_y, mv_x, inter, intra],
    each (Gr*Gc,) in raster order."""
    jnp = _jnp()
    Hp, Wp = src.shape
    nsr, nsc = Hp // 64, Wp // 64
    n = nsr * nsc
    gr, gc = Hp // BLK, Wp // BLK

    agg = ssd8.reshape(2, n, 4, 2, 4, 2, G, G).sum(axis=(3, 5))
    grid = jnp.stack([_sb_to_grid(agg[ci], nsr, nsc, 4, 4)
                      for ci in range(2)], axis=2)       # (Gr, Gc, 2, G, G)
    flat = grid.reshape(gr, gc, 2 * G * G)
    idx = jnp.argmin(flat, axis=-1)
    sel = idx // (G * G)
    off = idx % (G * G)
    dy = (off // G - R).astype(jnp.int32)
    dx = (off % G - R).astype(jnp.int32)

    def ctr_grid(v):
        per = [_sb_to_grid(jnp.broadcast_to(v[ci].reshape(n, 1, 1),
                                            (n, 4, 4)), nsr, nsc, 4, 4)
               for ci in range(2)]
        return jnp.stack(per, axis=-1)

    ctr_y = jnp.take_along_axis(ctr_grid(cy2), sel[..., None], axis=-1)[..., 0]
    ctr_x = jnp.take_along_axis(ctr_grid(cx2), sel[..., None], axis=-1)[..., 0]
    by = jnp.arange(gr, dtype=jnp.int32)[:, None] * BLK
    bx = jnp.arange(gc, dtype=jnp.int32)[None, :] * BLK
    mv_y = jnp.clip(ctr_y + dy, -by, (Hr - BLK) - by)
    mv_x = jnp.clip(ctr_x + dx, -bx, (Wr - BLK) - bx)

    pred = _gather_blocks(ref, mv_y, mv_x, BLK, BLK)
    blk = src.reshape(gr, BLK, gc, BLK).swapaxes(1, 2)
    inter = jnp.maximum(_sa8d16(blk - pred), 1.0)
    mean = jnp.floor(blk.mean(axis=(-1, -2), keepdims=True))
    intra = jnp.maximum(_sa8d16(blk - mean), 1.0)
    inter = jnp.minimum(inter, intra)
    return jnp.concatenate([mv_y.astype(jnp.float32).reshape(-1),
                            mv_x.astype(jnp.float32).reshape(-1),
                            inter.reshape(-1), intra.reshape(-1)])


def tpl_group_stats(luma: list, bd_shifted: bool = True):
    """Device TPL cost pass for a display-order group of (already
    8-bit-shifted, possibly decimated) luma planes. Returns the same
    per-frame stats dicts rc/tpl.tpl_analysis builds on the host:
    {intra (bh, bw) f64, inter (bh, bw) f64, mv (bh, bw, 2) i32, bh, bw}.

    frames[0] gets intra-only stats (it is the rated picture); frame i>=1
    searches frame i-1, mirroring the host kernel. All device programs
    for the group dispatch before the first fetch."""
    import jax

    H, W = luma[0].shape
    Hp, Wp = pad_dims(H, W)
    bh, bw = H // BLK, W // BLK
    gr, gc = Hp // BLK, Wp // BLK
    preps = [prep_frame(jax.device_put(
        np.ascontiguousarray(p, np.uint16)), Hp=Hp, Wp=Wp) for p in luma]
    vec0 = tpl_intra_stage(preps[0][0], Hr=H, Wr=W)
    vecs = [vec0]
    for i in range(1, len(luma)):
        cy2, cx2, g = grids_stage(preps[i][0], preps[i - 1][1])
        vecs.append(tpl_pair_stage(preps[i][0], preps[i - 1][1],
                                   cy2, cx2, g, Hr=H, Wr=W))
    stats = []
    for i, v in enumerate(vecs):
        a = np.asarray(v)
        if i == 0:
            intra = a.reshape(gr, gc)[:bh, :bw].astype(np.float64)
            stats.append(dict(intra=intra, inter=intra.copy(),
                              mv=np.zeros((bh, bw, 2), np.int32),
                              bh=bh, bw=bw))
            continue
        n = gr * gc
        mv_y = a[0:n].reshape(gr, gc)[:bh, :bw].astype(np.int32)
        mv_x = a[n:2 * n].reshape(gr, gc)[:bh, :bw].astype(np.int32)
        inter = a[2 * n:3 * n].reshape(gr, gc)[:bh, :bw].astype(np.float64)
        intra = a[3 * n:4 * n].reshape(gr, gc)[:bh, :bw].astype(np.float64)
        stats.append(dict(intra=intra, inter=inter,
                          mv=np.stack([mv_y, mv_x], axis=-1),
                          bh=bh, bw=bw))
    return stats
