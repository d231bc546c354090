"""Picture-analysis device kernels: block mean/variance, pyramids, SAD, SATD.

Reference analogs: pic_analysis_process.c:303/:1109 (8x8 mean/variance),
:126 (1/4 + 1/16 decimation pyramids), compute_sad_c.c / sad_av1.c (ME SAD),
svt_aom_satd_c (Hadamard). All batched over whole frames / SB grids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(1,))
def block_variance(plane, blk: int = 8):
    """plane (H, W) -> (H/blk, W/blk) mean and variance (float32).

    Reference: compute_variance at pic_analysis_process.c:1109 (used by the
    PSY variance-boost qindex derivation, rc_process.c:1403)."""
    H, W = plane.shape
    x = plane.astype(jnp.float32).reshape(H // blk, blk, W // blk, blk)
    mean = x.mean(axis=(1, 3))
    var = (x * x).mean(axis=(1, 3)) - mean * mean
    return mean, var


@jax.jit
def decimate_pyramid(plane):
    """(H, W) -> (H/2,W/2), (H/4,W/4), (H/8,W/8), (H/16,W/16) averages.

    Reference: downsample_decimation / filtering at pic_analysis_process.c:126
    (quarter/sixteenth pictures feed the HME pyramid)."""
    outs = []
    x = plane.astype(jnp.float32)
    for _ in range(4):
        H, W = x.shape
        x = x.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
        outs.append(x.astype(jnp.uint8) if False else x)
    return tuple(outs)


@jax.jit
def sad_grid(blocks, refs):
    """blocks (B, h, w) vs refs (B, N, h, w) -> SAD (B, N) int32.

    The ME full-pel grid primitive (svt_nxm_sad_kernel, integer_search_b64):
    N candidate positions per block, batched over all blocks of a frame."""
    d = jnp.abs(blocks[:, None].astype(jnp.int32) - refs.astype(jnp.int32))
    return d.sum(axis=(2, 3))


def _hadamard_matrix(n: int) -> np.ndarray:
    h = np.array([[1]], np.int32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


@functools.partial(jax.jit, static_argnums=())
def satd8x8(resid):
    """resid (B, 8, 8) int -> SATD (B,) int32 via 8x8 Hadamard on the MXU.

    Used by MD fast cost (MDS0) and the psy-rd SA8D energy term
    (psy_rd.c:135 svt_psy_distortion)."""
    h8 = jnp.asarray(_hadamard_matrix(8), jnp.float32)
    x = resid.astype(jnp.float32)
    t = jnp.einsum("ij,bjk,kl->bil", h8, x, h8, preferred_element_type=jnp.float32)
    return (jnp.abs(t).sum(axis=(1, 2)) / 8.0).astype(jnp.int32)


@jax.jit
def sse_blocks(a, b):
    """Sum of squared error per block: (B, h, w) x (B, h, w) -> (B,)."""
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    return (d * d).sum(axis=(1, 2))
