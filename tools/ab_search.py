#!/usr/bin/env python
"""A/B harness: native seeded inter search vs the device (TPU) ladder.

Encodes the same clips with inter-me-backend=native and =device at a
given preset and reports bytes / PSNR per config — the measurement that
gates flipping `auto` to the device path at quality presets
(api.py backend policy). Run on the attached TPU.

Usage: python tools/ab_search.py [preset] [n_frames]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def clip(W, H, n, seed=0, bd=8):
    rng = np.random.default_rng(seed)
    H2, W2 = H + 160, W + 160
    bg = (np.cumsum(rng.normal(0, 4, (H2, W2)), axis=1)
          + np.cumsum(rng.normal(0, 2, (H2, W2)), axis=0) + 128)
    bg = np.clip(bg, 0, 255).astype(np.uint8)
    yy, xx = np.mgrid[0:H, 0:W]
    frames = []
    for i in range(n):
        # pan + slow zoomy disc + secondary mover: cross-GoP motion
        y = bg[i * 2 : i * 2 + H, i * 3 : i * 3 + W].copy()
        cx, cy = W // 3 + i * 4, H // 2 + i * 2
        disc = ((xx - cx) ** 2 + (yy - cy) ** 2) < (H // 6) ** 2
        y[disc] = np.clip(180 + ((xx[disc] - cx) // 2), 0, 255).astype(np.uint8)
        cx2, cy2 = W - W // 4 - i * 6, H // 3 + i
        d2 = ((xx - cx2) ** 2 + (yy - cy2) ** 2) < (H // 10) ** 2
        y[d2] = np.clip(60 + ((yy[d2] - cy2) // 2), 0, 255).astype(np.uint8)
        if bd > 8:
            frames.append(y.astype(np.uint16) << (bd - 8))
        else:
            frames.append(y)
    u = np.full((H // 2, (W + 1) // 2), 118 << (bd - 8),
                np.uint16 if bd > 8 else np.uint8)
    v = np.full((H // 2, (W + 1) // 2), 138 << (bd - 8),
                np.uint16 if bd > 8 else np.uint8)
    return frames, u, v


def run(W, H, n, preset, backend, bd=8, seed=0, crf=35):
    from svt_av1_psy_tpu.api import Encoder
    from svt_av1_psy_tpu.config import EncoderConfig

    frames, u, v = clip(W, H, n, seed=seed, bd=bd)
    cfg = EncoderConfig(width=W, height=H, preset=preset, stat_report=True,
                        input_depth=bd)
    cfg.qp = crf
    cfg.inter_me_backend = backend
    enc = Encoder(cfg).init()
    t0 = time.perf_counter()
    nbytes, psnrs = 0, []
    for f in frames:
        enc.send_picture(f, u, v.copy())
        while (pk := enc.get_packet()) is not None:
            nbytes += len(pk.data)
            if pk.stats:
                psnrs.append(pk.stats["psnr_y"])
    enc.flush()
    while (pk := enc.get_packet()) is not None:
        nbytes += len(pk.data)
        if pk.stats:
            psnrs.append(pk.stats["psnr_y"])
    dt = time.perf_counter() - t0
    if getattr(enc, "_me_pipe", None) is not None:
        enc._me_pipe.drain()
    return dict(bytes=nbytes, psnr=round(float(np.mean(psnrs)), 3),
                fps=round(n / dt, 2))


def main():
    preset = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 33
    configs = [
        ("480p", 854, 480, 8),
        ("1080p", 1920, 1080, 8),
    ]
    for name, W, H, bd in configs:
        for backend in ("native", "device"):
            r = run(W, H, n, preset, backend, bd=bd)
            print(f"{name} p{preset} n{n} {backend:7s} "
                  f"bytes={r['bytes']:8d} psnr={r['psnr']:7.3f} "
                  f"fps={r['fps']}", flush=True)


if __name__ == "__main__":
    main()
