#!/usr/bin/env python
"""Benchmark: end-to-end all-intra encode throughput (480p), the round-1 slice
of the BASELINE.json protocol (config 1: 480p intra CPU-parity reference).

Prints one JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

vs_baseline compares against SVT-AV1-PSY built C-only (COMPILE_C_ONLY=ON,
no SIMD — the same "portable C" tier as our current host path) running
all-intra preset 12 CRF 35 on this host class (single core): 3.5 fps
(re-measure with tools/measure_baseline.sh when the binary is available).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

REF_C_ONLY_480P_INTRA_FPS = 3.5


def main():
    from svt_av1_psy_tpu.codec.intra_encoder import IntraFrameEncoder

    W, H = 854, 480
    rng = np.random.default_rng(0)
    y = (np.cumsum(rng.normal(0, 5, (H, W)), axis=1) + 128).clip(0, 255).astype(np.uint8)
    u = np.full((H // 2, (W + 1) // 2), 128, np.uint8)
    v = u.copy()

    # warm-up (table loads)
    IntraFrameEncoder(64, 64, 110).encode_frame(y[:64, :64], u[:32, :32], v[:32, :32])

    n_frames = 2
    t0 = time.perf_counter()
    total_bytes = 0
    for i in range(n_frames):
        enc = IntraFrameEncoder(W, H, 110)
        total_bytes += len(enc.encode_frame(y, u, v))
    dt = time.perf_counter() - t0
    fps = n_frames / dt

    print(json.dumps({
        "metric": "intra_480p_encode_fps",
        "value": round(fps, 4),
        "unit": "fps",
        "vs_baseline": round(fps / REF_C_ONLY_480P_INTRA_FPS, 4),
    }))


if __name__ == "__main__":
    main()
