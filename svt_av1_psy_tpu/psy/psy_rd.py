"""psy-rd: psychovisual distortion metric (PSY fork's psy_rd.c:135-293).

Energy of a block = SA8D(block) - SAD(block)/4 (texture minus flat energy);
psy distortion = sum over 8x8 (or 4x4 for thin blocks) tiles of
|energy(source) - energy(recon)|, scaled by the psy-rd strength. Steers mode
decision toward candidates that preserve source energy instead of blurring
it. Batched over tiles (device analog: ops/inter_search._tile_energy's
Hadamard-matmul SA8D).
"""

from __future__ import annotations

import numpy as np


def _hadamard(n: int) -> np.ndarray:
    h = np.array([[1]], np.int64)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


_H8 = _hadamard(8)
_H4 = _hadamard(4)


def sa8d_blocks(blocks: np.ndarray) -> np.ndarray:
    """SA8D of (N, 8, 8) int blocks: (sum|H8 b H8^T| + 2) >> 2 (psy_rd.c:65)."""
    b = blocks.astype(np.int64)
    t = _H8 @ b @ _H8.T
    return (np.abs(t).sum(axis=(1, 2)) + 2) >> 2


def satd4_blocks(blocks: np.ndarray) -> np.ndarray:
    """4x4 SATD of (N, 4, 4) int blocks: sum|H4 b H4^T| >> 1 (psy_rd.c:99)."""
    b = blocks.astype(np.int64)
    t = _H4 @ b @ _H4.T
    return np.abs(t).sum(axis=(1, 2)) >> 1


def _tiles(x: np.ndarray, t: int) -> np.ndarray:
    h, w = x.shape
    return (x[: h - h % t, : w - w % t]
            .reshape(h // t, t, w // t, t).transpose(0, 2, 1, 3).reshape(-1, t, t))


def _energy(x: np.ndarray, t: int) -> np.ndarray:
    tiles = _tiles(x, t).astype(np.int64)
    sad = np.abs(tiles).sum(axis=(1, 2))
    txd = sa8d_blocks(tiles) if t == 8 else satd4_blocks(tiles)
    return txd - (sad >> 2)


def block_energy(x: np.ndarray) -> np.ndarray:
    """Per-tile energy vector of a block (cacheable across candidates)."""
    h, w = x.shape
    t = 8 if (w >= 8 and h >= 8) else 4
    from ..codec import mc_native

    out = mc_native.psy_block_energy(x, t)
    return _energy(x, t) if out is None else out


def psy_distortion(src: np.ndarray, recon: np.ndarray, bd: int = 8,
                   src_energy: np.ndarray | None = None) -> int:
    """svt_psy_distortion(_hbd): energy-difference distortion for one block.
    src/recon: (h, w) pixel arrays (any uint dtype). src_energy: optional
    precomputed block_energy(src) (the source side is candidate-invariant)."""
    h, w = src.shape
    t = 8 if (w >= 8 and h >= 8) else 4
    from ..codec import mc_native

    if src_energy is None:
        src_energy = block_energy(src)
    d = mc_native.psy_distortion_sum(recon, t, src_energy)
    if d is None:
        d = int(np.abs(src_energy - _energy(recon, t)).sum())
    # 8-bit scaled to 1/8th of HBD scaling so strengths are comparable
    return (d >> 1) if bd == 8 else (d << 2)


def psy_full_dist(src: np.ndarray, recon: np.ndarray, psy_rd: float,
                  bd: int = 8, src_energy: np.ndarray | None = None) -> int:
    """get_svt_psy_full_dist (psy_rd.c:277): strength-scaled psy distortion."""
    if psy_rd <= 0:
        return 0
    return int(psy_distortion(src, recon, bd, src_energy) * psy_rd)
