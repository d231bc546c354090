"""Two-pass rate control: first-pass statistics + second-pass budgeting.

Behavior reference: firstpass.c (:66-75 per-frame stats buffers) and
pass2_strategy.c (GOP bit budgeting from first-pass complexity). Round-1
scope: pass 1 collects per-frame intra/inter SA8D costs on the 1/4-res
pyramid (an IPP complexity profile); pass 2 distributes the total VBR
budget proportionally to complexity and drives the per-frame qindex
through the bits-per-MB model. Stats files are one JSON line per frame
(versioned header), CLI flags --pass 1/2 + --stats <file>.
"""

from __future__ import annotations

import json

import numpy as np

from ..codec.me import decimate
from ..psy.psy_rd import sa8d_blocks

STATS_MAGIC = "svt-av1-psy-tpu-stats-v1"


def frame_stats(prev_y, cur_y, bd: int = 8) -> dict:
    """First-pass stats for one frame: 8x8 SA8D intra energy and the
    zero-motion inter error on the 1/4 pyramid (firstpass.c analog)."""
    cur8 = (np.asarray(cur_y) >> (bd - 8)).astype(np.uint8)
    cq = decimate(cur8, 2).astype(np.int64)
    h, w = cq.shape
    bh, bw = h // 8, w // 8
    if bh == 0 or bw == 0:
        return {"intra": 1.0, "inter": 1.0}
    tiles = (cq[: bh * 8, : bw * 8]
             .reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8))
    mean = tiles.mean(axis=(1, 2), keepdims=True).astype(np.int64)
    intra = float(np.maximum(sa8d_blocks(tiles - mean), 1).sum())
    if prev_y is None:
        inter = intra
    else:
        prev8 = (np.asarray(prev_y) >> (bd - 8)).astype(np.uint8)
        pq = decimate(prev8, 2).astype(np.int64)
        d = cq[: bh * 8, : bw * 8] - pq[: bh * 8, : bw * 8]
        dt = d.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        inter = float(np.maximum(sa8d_blocks(dt), 1).sum())
        inter = min(inter, intra)
    return {"intra": intra, "inter": inter}


class FirstPassWriter:
    def __init__(self):
        self.frames = []
        self._prev = None

    def push(self, y, bd: int = 8):
        self.frames.append(frame_stats(self._prev, y, bd))
        self._prev = np.asarray(y).copy()

    def serialize(self) -> bytes:
        lines = [STATS_MAGIC] + [json.dumps(f) for f in self.frames]
        return ("\n".join(lines) + "\n").encode()


def parse_stats(data: bytes) -> list:
    lines = data.decode().strip().split("\n")
    if not lines or lines[0] != STATS_MAGIC:
        raise ValueError("invalid first-pass stats file")
    return [json.loads(l) for l in lines[1:]]


def group_boundaries(stats: list) -> list:
    """Scene-cut group starts from first-pass stats: a frame whose inter
    error approaches its intra energy has no temporal correlation
    (pass2_strategy.c test_candidate_kf's intra/inter ratio test)."""
    bounds = [0]
    for i in range(1, len(stats)):
        s = stats[i]
        if s["inter"] > 0.90 * s["intra"]:
            bounds.append(i)
    return bounds


def second_pass_budgets(stats: list, target_bit_rate: int, fps: float,
                        kf_boost: float = 3.0) -> list:
    """Per-frame bit targets: GOP-aware allocation (pass2_strategy.c).

    Frames group at detected scene boundaries; the sequence budget splits
    across groups by summed complexity, and each group's leading frame
    (the key/GF every other member predicts from) gets a boost scaled by
    group length and the group's temporal correlation — strongly
    correlated groups repay a high-quality leader with cheap followers
    (calculate_total_gf_group_bits / kf boost, pass2_strategy.c), while
    noisy groups keep a flat split."""
    n = len(stats)
    if n == 0:
        return []
    total = target_bit_rate * n / max(fps, 1e-6)
    bounds = group_boundaries(stats) + [n]
    costs = [0.0] * n
    for g in range(len(bounds) - 1):
        i0, i1 = bounds[g], bounds[g + 1]
        glen = i1 - i0
        # group temporal correlation: mean inter/intra of the followers
        # (0 = perfectly predicted, 1 = uncorrelated)
        if glen > 1:
            corr = float(np.mean([stats[j]["inter"]
                                  / max(stats[j]["intra"], 1.0)
                                  for j in range(i0 + 1, i1)]))
        else:
            corr = 1.0
        boost = 1.0 + (kf_boost - 1.0) * (1.0 - corr) \
            * min(glen, 16) / 16.0 * 2.0
        boost = min(boost, kf_boost * 2.0)
        costs[i0] = max(float(stats[i0]["intra"]) * boost, 1.0)
        for j in range(i0 + 1, i1):
            costs[j] = max(float(stats[j]["inter"]), 1.0)
    csum = sum(costs)
    floor = total / n * 0.1
    out = [max(total * c / csum, floor) for c in costs]
    scale = total / sum(out)
    return [b * scale for b in out]
