"""Device (TPU) open-loop inter mode decision: batched full-pel motion
search + candidate costing for every block of a P/B frame in ONE jitted
program.

The design is MXU-first: the full-pel motion metric is SSD, decomposed as
sum(ref^2) - 2*corr(ref, blk) + sum(blk^2); the cross term is a batched
depthwise correlation (`lax.conv_general_dilated` with
feature_group_count = N), which XLA tiles onto the systolic array. The
zero-MV / global-MV candidates fall out of the same SSD grid for free, and
the intra fallback reuses the intra-search mode-matrix bank (matmuls).
Sub-pel refinement of the winning MV is a tiny host step on the chosen
reference only (codec/mc_native.me_subpel_refine).

Behavioral analog: the native decide kernel (mc_native.inter_decide_frame),
which mirrors the reference's open-loop MD candidate ladder
(product_coding_loop.c). The two backends make independent (but equally
conformant) decisions: the device path optimizes SSD at full pel, the host
path SAD+subpel; the commit walk executes either decision map exactly.

Sharding: all arrays are (N, ...) block batches -> shard over the
("frame", "tile") mesh with parallel/mesh.shard_blocks; results are
value-identical regardless of mesh size (argmin over per-block data only).
"""

from __future__ import annotations

import functools

import numpy as np

R_PAD = 24          # full-pel search radius (device grid)


def gather_windows(plane_pad: np.ndarray, pad: int, blocks: np.ndarray,
                   S: int) -> np.ndarray:
    """(N, S + 2R, S + 2R) int32 search windows centered on each block.
    plane_pad: reference plane padded by `pad` >= R_PAD on every side;
    blocks: (N, 4) of (x0, y0, W, H) with W == H == S."""
    n = blocks.shape[0]
    win = S + 2 * R_PAD
    out = np.empty((n, win, win), np.int32)
    for i, (x0, y0, _w, _h) in enumerate(blocks):
        yy = y0 + pad - R_PAD
        xx = x0 + pad - R_PAD
        out[i] = plane_pad[yy : yy + win, xx : xx + win]
    return out


@functools.partial(__import__("jax").jit, static_argnames=("S",))
def _ssd_grid(blocks, windows, S: int):
    """(N, 2R+1, 2R+1) SSD of each block against every full-pel offset of
    its window. blocks (N, S, S) f32; windows (N, S+2R, S+2R) f32."""
    import jax.lax as lax
    import jax.numpy as jnp

    n = blocks.shape[0]
    # cross-correlation via depthwise conv: lhs (1, N, H, W), rhs (N, 1, S, S)
    corr = lax.conv_general_dilated(
        windows[None], blocks[:, None], window_strides=(1, 1),
        padding="VALID", feature_group_count=n,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]   # (N, 2R+1, 2R+1)
    # sum of squares over each window position via depthwise box conv
    ref2 = lax.conv_general_dilated(
        (windows * windows)[None], jnp.ones((n, 1, S, S), blocks.dtype),
        window_strides=(1, 1), padding="VALID", feature_group_count=n,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]
    blk2 = jnp.sum(blocks * blocks, axis=(1, 2))[:, None, None]
    return ref2 - 2.0 * corr + blk2


@functools.partial(__import__("jax").jit,
                   static_argnames=("S", "two_ref", "n_imodes"))
def decide_blocks(blocks, win_last, win_alt, gm_dy, gm_dx, refs, G,
                  S: int, two_ref: bool, n_imodes: int):
    """Device decision for N blocks of one inter frame.

    blocks: (N, S, S) f32 source; win_last/win_alt: (N, S+2R, S+2R) f32
    reference windows (win_alt ignored when two_ref is False); gm_dy/gm_dx:
    full-pel global-motion offset (LAST); refs: (N, L) f32 intra reference
    lines (intra_search layout); G: (L, n_imodes * S * S) mode matrices.

    Returns (use_inter, ref_sel, mode, mv_row, mv_col, intra_mode) int32
    arrays; MVs in 1/8-pel units (full-pel resolution).
    """
    import jax.numpy as jnp

    n, _, _ = blocks.shape
    g1 = _ssd_grid(blocks, win_last, S)
    side = 2 * R_PAD + 1

    def best_of(grid):
        flat = grid.reshape(n, -1)
        idx = jnp.argmin(flat, axis=1)
        return (idx // side - R_PAD, idx % side - R_PAD,
                jnp.take_along_axis(flat, idx[:, None], 1)[:, 0])

    dy1, dx1, ssd1 = best_of(g1)
    # zero / global candidates read from the same grid
    zero1 = g1[:, R_PAD + gm_dy, R_PAD + gm_dx]
    if two_ref:
        g2 = _ssd_grid(blocks, win_alt, S)
        dy2, dx2, ssd2 = best_of(g2)
        zero2 = g2[:, R_PAD, R_PAD]
    else:
        dy2 = dx2 = jnp.zeros_like(dy1)
        ssd2 = jnp.full_like(ssd1, jnp.inf)
        zero2 = jnp.full_like(zero1, jnp.inf)

    # intra fallback: the first n_imodes columns of the mode-matrix bank
    preds = jnp.einsum("nl,lm->nm", refs, G[:, : n_imodes * S * S])
    preds = jnp.floor(preds + 0.5).reshape(n, n_imodes, S, S)
    isse = jnp.sum((preds - blocks[:, None]) ** 2, axis=(2, 3))
    best_im = jnp.argmin(isse, axis=1)
    icost = jnp.min(isse, axis=1)

    # candidate ladder (mirrors the native kernel's ordering): zero/global
    # first, NEWMV per ref, intra last
    cands = jnp.stack([zero1, zero2, ssd1, ssd2, icost], axis=1)
    pick = jnp.argmin(cands, axis=1)
    use_inter = (pick != 4).astype(jnp.int32)
    ref_sel = jnp.where((pick == 1) | (pick == 3), 4, 1).astype(jnp.int32)
    mode = jnp.where(pick >= 2, 16, 15).astype(jnp.int32)   # NEWMV / GLOBALMV
    mv_r = jnp.where(pick == 0, gm_dy * 8,
                     jnp.where(pick == 1, 0,
                               jnp.where(pick == 2, dy1 * 8, dy2 * 8)))
    mv_c = jnp.where(pick == 0, gm_dx * 8,
                     jnp.where(pick == 1, 0,
                               jnp.where(pick == 2, dx1 * 8, dx2 * 8)))
    mv_r = jnp.where(use_inter == 1, mv_r, 0).astype(jnp.int32)
    mv_c = jnp.where(use_inter == 1, mv_c, 0).astype(jnp.int32)
    ref_sel = ref_sel * use_inter
    return use_inter, ref_sel, mode * use_inter, mv_r, mv_c, \
        best_im.astype(jnp.int32)
