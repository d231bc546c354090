"""1-pass rate control: VBR / CBR frame-qindex regulation + PSY CRF shaping.

Behavior reference: rc_process.c — the bits-per-MB model and qindex binary
search (svt_av1_rc_bits_per_mb :601, find_qindex_by_rate :617), correction
factor feedback (libaom-lineage one-pass regulation), keyframe boost, and
the PSY qp-scale-compress keyframe/inter qstep shaping (:776-873, :976).
Lookahead/TPL-driven boosts (r0) are not modeled yet; the qindex regulation
itself follows the reference formulas exactly.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from ..codec.quant import ac_quant_qtx

MAXQ = 255
MIN_BPB_FACTOR = 0.005
MAX_BPB_FACTOR = 50.0

# rc_process.c:776 — multiplies the compress qstep ratio per strength level
QP_SCALE_COMPRESS_WEIGHT = (1.0, 1.125, 1.25, 1.375)


def convert_qindex_to_q(qindex: int, bd: int) -> float:
    """svt_av1_convert_qindex_to_q (rc_process.c:211)."""
    return ac_quant_qtx(qindex, 0, bd) / float({8: 4, 10: 16, 12: 64}[bd])


def bits_per_mb(frame_type_key: bool, qindex: int, correction_factor: float,
                bd: int, screen_content: bool = False, cbr: bool = False) -> int:
    """svt_av1_rc_bits_per_mb (rc_process.c:601)."""
    q = convert_qindex_to_q(qindex, bd)
    if screen_content:
        enumerator = 1_000_000 if frame_type_key else 750_000
    elif cbr:
        enumerator = 1_500_000 if frame_type_key else 1_300_000
    else:
        enumerator = 1_400_000 if frame_type_key else 1_000_000
    cf = min(max(correction_factor, MIN_BPB_FACTOR), MAX_BPB_FACTOR)
    return int(enumerator * cf / q)


def find_qindex_by_rate(desired_bits_per_mb: int, bd: int, frame_type_key: bool,
                        correction_factor: float = 1.0, screen_content: bool = False,
                        cbr: bool = False, best_q: int = 1,
                        worst_q: int = MAXQ) -> int:
    """Binary search the monotone bits-per-MB model (rc_process.c:617)."""
    low, high = best_q, worst_q
    while low < high:
        mid = (low + high) >> 1
        if bits_per_mb(frame_type_key, mid, correction_factor, bd,
                       screen_content, cbr) > desired_bits_per_mb:
            low = mid + 1
        else:
            high = mid
    return low


def qp_scale_compress_qindex(crf_qindex: int, strength: float, bd: int,
                             is_key: bool) -> int:
    """PSY qp-scale-compress (rc_process.c:976 path, no-TPL variant): pull
    keyframe qindex down along a qstep-ratio curve so the CRF scale is
    'compressed' toward higher quality at high CRFs. strength 0 = off."""
    s = int(min(max(strength, 0), 3))
    if s == 0 or not is_key:
        return crf_qindex
    qratio_grad = 0.3
    qstep_ratio = ((0.2 + (1.0 - crf_qindex / MAXQ) * qratio_grad)
                   * QP_SCALE_COMPRESS_WEIGHT[s])
    qstep_ratio = min(qstep_ratio, 1.0)
    target_q = convert_qindex_to_q(crf_qindex, bd) * qstep_ratio
    lo, hi = 1, crf_qindex
    while lo < hi:
        mid = (lo + hi) >> 1
        if convert_qindex_to_q(mid, bd) < target_q:
            lo = mid + 1
        else:
            hi = mid
    return lo


@dataclass
class RateControl:
    """Per-stream 1-pass VBR/CBR state machine."""

    target_bit_rate: int          # bits/sec
    fps: float
    width: int
    height: int
    bd: int = 8
    cbr: bool = False
    kf_boost: float = 4.0         # keyframe bit-budget multiplier
    undershoot_pct: int = 25
    overshoot_pct: int = 25
    buf_sz_ms: int = 6000
    buf_initial_ms: int = 6000    # CBR decoder-buffer start (buf-initial-sz)
    buf_optimal_ms: int = 5000    # CBR steering target (buf-optimal-sz)
    vbv_bufsize: int = 0          # bits; overrides the ms-derived cap (>0)
    min_section_pct: int = 0      # per-frame target floor, % of average
    max_section_pct: int = 2000   # per-frame target ceiling, % of average
    min_q: int = 1
    max_q: int = MAXQ
    # feedback state (av1_rc_init: 1.0 for KF, 0.7 otherwise)
    correction: dict = field(default_factory=lambda: {True: 1.0, False: 0.7})
    buffer_level: float = 0.0     # bits above/below the target schedule

    def __post_init__(self):
        self.mbs = max(1, ((self.width + 15) // 16) * ((self.height + 15) // 16))
        self.bits_per_frame = self.target_bit_rate / max(self.fps, 1e-6)
        # --vbv-bufsize (bits) overrides the millisecond-derived cap
        self.buffer_cap = (float(self.vbv_bufsize) if self.vbv_bufsize > 0
                           else self.target_bit_rate * self.buf_sz_ms / 1000.0)
        if self.cbr and self.buf_initial_ms != self.buf_optimal_ms:
            # CBR decoder-buffer model: start at buf-initial-sz and steer
            # toward buf-optimal-sz (rc_process.c starting/optimal buffer
            # level). A fuller-than-optimal start appears here as schedule
            # slack (negative level -> early frames may spend more).
            self.buffer_level = (-(self.buf_initial_ms - self.buf_optimal_ms)
                                 / 1000.0 * self.target_bit_rate)

    def _target_bits(self, is_key: bool) -> float:
        target = self.bits_per_frame * (self.kf_boost if is_key else 1.0)
        if self.cbr:
            # steer the buffer back toward neutral within ~1s
            target -= self.buffer_level * min(self.fps, 30) / 30.0 / 30.0
        else:
            # VBR redistributes surplus/deficit more gently
            target -= self.buffer_level / (4.0 * max(self.fps, 1.0))
        if not is_key:
            # --minsection-pct/--maxsection-pct clamp the per-frame target
            # as a percentage of the average (av1_rc_clamp_pframe_target
            # vbrmin/vbrmax_section semantics)
            if self.min_section_pct > 0:
                target = max(target,
                             self.bits_per_frame * self.min_section_pct / 100.0)
            if self.max_section_pct > 0:
                target = min(target,
                             self.bits_per_frame * self.max_section_pct / 100.0)
        return max(target, self.bits_per_frame * 0.1)

    BPER_MB_NORMBITS = 9  # rc_process.c:1753

    def frame_qindex(self, is_key: bool, target_bits: float | None = None) -> int:
        """target_bits: explicit per-frame budget (two-pass), else the
        1-pass schedule."""
        if target_bits is None:
            target_bits = self._target_bits(is_key)
        else:
            target_bits = max(target_bits, self.bits_per_frame * 0.1)
        desired_bpmb = (int(target_bits) << self.BPER_MB_NORMBITS) // self.mbs
        q = find_qindex_by_rate(max(desired_bpmb, 1), self.bd, is_key,
                                self.correction[is_key], cbr=self.cbr,
                                best_q=self.min_q, worst_q=self.max_q)
        return q

    def update(self, is_key: bool, qindex: int, bytes_out: int):
        """Post-encode feedback (correction factor + buffer bookkeeping)."""
        actual_bits = bytes_out * 8
        projected = (bits_per_mb(is_key, qindex, self.correction[is_key],
                                 self.bd, cbr=self.cbr)
                     * self.mbs) >> self.BPER_MB_NORMBITS
        if projected > 0:
            # solve the correction factor that would have matched this frame,
            # step-limited to 2x per frame (rate-correction-factor regulation)
            ratio = min(max(actual_bits / projected, 0.5), 2.0)
            self.correction[is_key] = min(max(self.correction[is_key] * ratio,
                                              MIN_BPB_FACTOR), MAX_BPB_FACTOR)
        self.buffer_level += actual_bits - self.bits_per_frame
        cap = self.buffer_cap
        self.buffer_level = min(max(self.buffer_level, -cap), cap)
