"""AV1 quantizer matrices (spec §9.5) + the PSY qm-level curves.

Behavior reference: svt_av1_qm_init / aom_get_qmlevel / psy_get_qmlevel /
psy_still_get_qmlevel (md_config_process.c:189-295); the table values are
normative spec constants extracted by tools/extract_qm_tables.py. A QM
reweights quant/dequant per coefficient position (AOM_QM_BITS=5 fixed
point); level 15 (NUM_QM_LEVELS-1) means flat / no matrix.
"""

from __future__ import annotations

import math
from functools import lru_cache
from pathlib import Path

import numpy as np

NUM_QM_LEVELS = 16
QM_LEVEL_BITS = 4
AOM_QM_BITS = 5

# TX_SIZES_ALL: width/height per tx_size index (constants.py order)
_TX_W = (4, 8, 16, 32, 64, 4, 8, 8, 16, 16, 32, 32, 64, 4, 16, 8, 32, 16, 64)
_TX_H = (4, 8, 16, 32, 64, 8, 4, 16, 8, 32, 16, 64, 32, 16, 4, 32, 8, 64, 16)

# av1_get_adjusted_tx_size (definitions.h:920): 64x64/64x32/32x64 -> 32x32,
# 64x16 -> 32x16, 16x64 -> 16x32
_ADJUSTED = {4: 3, 11: 3, 12: 3, 17: 9, 18: 10}


def adjusted_tx_size(tx_size: int) -> int:
    return _ADJUSTED.get(int(tx_size), int(tx_size))


@lru_cache(maxsize=1)
def _load():
    path = Path(__file__).resolve().parent / "tables" / "av1_qm_tables.npz"
    z = np.load(path)
    wt, iwt = z["qm_wt"], z["qm_iwt"]
    # per-tx-size offsets into the flat 3344-entry store (svt_av1_qm_init)
    offsets = {}
    current = 0
    for t in range(len(_TX_W)):
        if adjusted_tx_size(t) != t:
            continue
        offsets[t] = current
        current += _TX_W[t] * _TX_H[t]
    assert current == wt.shape[2]
    return wt, iwt, offsets


def get_qm(level: int, is_chroma: bool, tx_size: int):
    """(qm, iqm) int32 flat arrays for the adjusted tx size, or (None, None)
    for level 15 (flat)."""
    if level >= NUM_QM_LEVELS - 1:
        return None, None
    wt, iwt, offsets = _load()
    t = adjusted_tx_size(tx_size)
    off = offsets[t]
    n = _TX_W[t] * _TX_H[t]
    c = 1 if is_chroma else 0
    return (wt[level, c, off : off + n].astype(np.int32),
            iwt[level, c, off : off + n].astype(np.int32))


def aom_get_qmlevel(qindex: int, first: int, last: int) -> int:
    """Stock level mapping (md_config_process.c:189)."""
    return first + (qindex * (last + 1 - first)) // 256


def _sigmoid_qm(qindex: int) -> float:
    return 2 / (1 + math.exp(0.01 * qindex))


def psy_get_qmlevel(qindex: int, first: int, last: int) -> int:
    """PSY sigmoidal curve (md_config_process.c:198, tune 3)."""
    e = _sigmoid_qm(qindex)
    v = first + (math.pow(qindex, e) * (last + 1 - first)) / math.pow(256, e)
    return int(np.clip(round(v), first, last))


def psy_still_get_qmlevel(qindex: int, lo: int, hi: int) -> int:
    """Still-picture variant (md_config_process.c:204, tune 4): linear but
    re-centered on the still-picture qindex sweet spot."""
    return int(np.clip(lo + (qindex * (hi + 1 - lo)) // 256, lo, hi))


def frame_qm_levels(cfg, base_q_idx: int, delta_q_u: int = 0, delta_q_v: int = 0):
    """Per-frame (qm_y, qm_u, qm_v) from the config (svt_av1_qm_init)."""
    if not getattr(cfg, "enable_qm", False):
        return None
    fn = {3: psy_get_qmlevel, 4: psy_still_get_qmlevel}.get(
        getattr(cfg, "tune", 2), aom_get_qmlevel)
    qm_y = fn(base_q_idx, cfg.min_qm_level, cfg.max_qm_level)
    qm_u = fn(base_q_idx + delta_q_u, cfg.min_chroma_qm_level, cfg.max_chroma_qm_level)
    qm_v = fn(base_q_idx + delta_q_v, cfg.min_chroma_qm_level, cfg.max_chroma_qm_level)
    # levels are coded in 4 bits; out-of-range configs are rejected upstream
    # (verify_settings) but clamp here too so the header can never desync
    return tuple(int(np.clip(v, 0, NUM_QM_LEVELS - 1)) for v in (qm_y, qm_u, qm_v))
