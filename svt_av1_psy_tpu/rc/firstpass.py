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


def second_pass_budgets(stats: list, target_bit_rate: int, fps: float,
                        kf_boost: float = 3.0) -> list:
    """Per-frame bit targets: the total budget split by complexity
    (pass2_strategy GOP allocation, flattened to the IPP structure).
    Frames with inter << intra are cheap; scene cuts get the intra cost."""
    n = len(stats)
    if n == 0:
        return []
    total = target_bit_rate * n / max(fps, 1e-6)
    costs = []
    for i, s in enumerate(stats):
        c = s["inter"] if i > 0 else s["intra"] * kf_boost
        costs.append(max(float(c), 1.0))
    csum = sum(costs)
    return [total * c / csum for c in costs]
