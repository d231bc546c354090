#!/usr/bin/env python
"""Benchmark: end-to-end 480p video encode throughput (IPPP, CRF, variance
boost + DLF + CDEF on) — the round-1 slice of the BASELINE.json protocol.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

vs_baseline compares against SVT-AV1-PSY built C-only (COMPILE_C_ONLY=ON,
no SIMD — the same "portable" tier as our current host path), preset 12
CRF 35 default GoP on this host class (single core): 5.77 fps
(re-measure: tools/build_oracle.sh + SvtAv1EncApp on /tmp/test480.y4m).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

REF_C_ONLY_480P_FPS = 5.77


def main():
    from svt_av1_psy_tpu.api import Encoder
    from svt_av1_psy_tpu.config import EncoderConfig

    W, H = 854, 480
    rng = np.random.default_rng(0)
    base = (np.cumsum(rng.normal(0, 5, (H + 64, W + 64)), axis=1) + 128).clip(0, 255).astype(np.uint8)
    u = np.full((H // 2, (W + 1) // 2), 128, np.uint8)

    cfg = EncoderConfig(width=W, height=H)
    cfg.qp = 35
    enc = Encoder(cfg).init()
    # warm-up frame (table loads, native builds)
    enc.send_picture(base[:H, :W].copy(), u, u.copy())
    enc.get_packet()

    n_frames = 4
    t0 = time.perf_counter()
    for i in range(1, n_frames + 1):
        y = base[i * 2 : i * 2 + H, i * 3 : i * 3 + W].copy()
        enc.send_picture(y, u, u.copy())
        enc.get_packet()
    dt = time.perf_counter() - t0
    fps = n_frames / dt

    print(json.dumps({
        "metric": "video_480p_encode_fps",
        "value": round(fps, 4),
        "unit": "fps",
        "vs_baseline": round(fps / REF_C_ONLY_480P_FPS, 4),
    }))


if __name__ == "__main__":
    main()
