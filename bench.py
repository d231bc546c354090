#!/usr/bin/env python
"""Benchmark: end-to-end encode throughput + quality on the BASELINE.md
configs that the framework currently covers.

Prints ONE JSON line on stdout (driver contract):
  {"metric": "video_480p_encode_fps", "value": N, "unit": "fps",
   "vs_baseline": N, "notes": {...}}

vs_baseline compares the IPPP 480p run against SVT-AV1-PSY built C-only
(COMPILE_C_ONLY=ON, no SIMD — the same "portable" tier as our host path),
preset 12 CRF 35 default GoP, single core on this host class: 5.77 fps
(re-measure: tools/build_oracle.sh + SvtAv1EncApp on /tmp/test480.y4m).
The honest 64-core AVX2 "--native --release" 1080p preset-6 target from
BASELINE.md is far beyond this round; notes record the current gap inputs
(fps, bytes, PSNR, device-time fraction) per config instead of hiding them.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

REF_C_ONLY_480P_FPS = 5.77


def _video(W, H, n_frames, seed=0):
    """Structured synthetic clip: textured background + moving gradient
    objects + a panning window (more codec-realistic than iid noise)."""
    rng = np.random.default_rng(seed)
    bg = (np.cumsum(rng.normal(0, 4, (H + 96, W + 96)), axis=1)
          + np.cumsum(rng.normal(0, 2, (H + 96, W + 96)), axis=0) + 128)
    bg = np.clip(bg, 0, 255).astype(np.uint8)
    yy, xx = np.mgrid[0:H, 0:W]
    frames = []
    for i in range(n_frames):
        y = bg[i * 2 : i * 2 + H, i * 3 : i * 3 + W].copy()
        cx, cy = W // 3 + i * 4, H // 2 + i * 2
        disc = ((xx - cx) ** 2 + (yy - cy) ** 2) < (H // 6) ** 2
        y[disc] = np.clip(180 + ((xx[disc] - cx) // 2), 0, 255).astype(np.uint8)
        frames.append(y)
    u = np.full((H // 2, (W + 1) // 2), 118, np.uint8)
    v = np.full((H // 2, (W + 1) // 2), 138, np.uint8)
    return frames, u, v


def _run(W, H, preset, crf, n_frames, intra_only=False, seed=0, bd=8,
         hdr_grain=False, sc=False, warm_frames=8):
    """Steady-state measurement: a sacrificial encoder first runs
    `warm_frames` frames of the SAME config end-to-end (flush included),
    compiling every device program (search, commit, TF, filters) off the
    clock; the measured encoder then clocks the WHOLE clip — keyframe,
    TF/TPL lookahead, GoP drains — so fps is the number a user would see,
    not a keyframe-excluded best case."""
    from svt_av1_psy_tpu import profiling
    from svt_av1_psy_tpu.api import Encoder
    from svt_av1_psy_tpu.config import EncoderConfig

    if sc:
        frames, u, v = _sc_video(W, H, n_frames)
    else:
        frames, u, v = _video(W, H, n_frames)
    if bd > 8:
        frames = [f.astype(np.uint16) << (bd - 8) for f in frames]
        u = (u.astype(np.uint16) << (bd - 8))
        v = (v.astype(np.uint16) << (bd - 8))
    cfg = EncoderConfig(width=W, height=H, preset=preset, stat_report=True,
                        input_depth=bd)
    cfg.qp = crf
    if sc:
        cfg.screen_content_mode = 1
    if hdr_grain:
        # HDR metadata + photon-noise grain table + alt-ref TF
        cfg.mastering_display = ("G(0.265,0.690)B(0.150,0.060)R(0.680,0.320)"
                                 "WP(0.3127,0.3290)L(1000,0.005)")
        cfg.content_light = "1000,400"
        cfg.film_grain_denoise_strength = 8
        cfg.enable_tf = True
        cfg.color_primaries = 9          # BT.2020
    if intra_only:
        cfg.intra_period_length = 0
    # warm run: same config, every code path (keyframe, TF, TPL, GoP
    # assembly + flush) so all jit programs compile off the clock (jit
    # caches are process-global; the XLA compile cache persists on disk)
    wenc = Encoder(cfg).init()
    for i in range(min(warm_frames, len(frames))):
        wenc.send_picture(frames[i], u, v.copy())
        wenc.get_packet()
    wenc.flush()
    while wenc.get_packet() is not None:
        pass
    if getattr(wenc, "_me_pipe", None) is not None:
        wenc._me_pipe.drain()

    enc = Encoder(cfg).init()
    profiling.reset()
    t0 = time.perf_counter()
    nbytes = 0
    psnrs = []
    for i in range(n_frames):
        enc.send_picture(frames[i], u, v.copy())
        while (pkt := enc.get_packet()) is not None:
            nbytes += len(pkt.data)
            if pkt.stats:
                psnrs.append(pkt.stats["psnr_y"])
    enc.flush()   # drain any buffered mini-GoP (hierarchical structure)
    while (pkt := enc.get_packet()) is not None:
        nbytes += len(pkt.data)
        if pkt.stats:
            psnrs.append(pkt.stats["psnr_y"])
    dt = time.perf_counter() - t0
    prof = profiling.snapshot()
    dev_s = sum(x["s"] for k, x in prof.items() if k.startswith("device:"))
    return {
        "fps": round(n_frames / dt, 4),
        "kbps": round(nbytes * 8 * 25 / n_frames / 1000, 1),
        "psnr_y": round(float(np.mean(psnrs)), 2) if psnrs else None,
        "device_frac": round(dev_s / dt, 3),
        "stages": {k: round(x["s"], 3) for k, x in sorted(prof.items())},
    }


def _sc_video(W, H, n_frames):
    """Screen-content clip: flat background, sharp text-like glyph grid,
    a scrolling region (palette / IBC / identity-TX territory)."""
    rng = np.random.default_rng(3)
    glyphs = rng.integers(0, 2, (16, 8, 6)).astype(np.uint8) * 200 + 20
    page = np.full((H + 64, W), 240, np.uint8)
    for r in range(8, H + 48, 14):
        for c in range(8, W - 8, 9):
            g = glyphs[(r * 7 + c) % 16]
            page[r : r + 8, c : c + 6] = g
    frames = []
    for i in range(n_frames):
        f = page[i * 4 : i * 4 + H].copy()     # vertical scroll
        f[: H // 8, :] = page[:H // 8, :]      # fixed header bar
        frames.append(f)
    u = np.full((H // 2, (W + 1) // 2), 128, np.uint8)
    v = np.full((H // 2, (W + 1) // 2), 128, np.uint8)
    return frames, u, v


def _run_avif_sc():
    """BASELINE config 5: screen content + AVIF still-image path."""
    from svt_av1_psy_tpu.api import Encoder
    from svt_av1_psy_tpu.config import EncoderConfig

    frames, u, v = _sc_video(1280, 720, 1)
    cfg = EncoderConfig(width=1280, height=720, preset=6, avif=True,
                        screen_content_mode=1)
    cfg.qp = 35
    enc = Encoder(cfg).init()
    t0 = time.perf_counter()
    data = enc.encode_avif(frames[0], u, v)
    return {"avif_s": round(time.perf_counter() - t0, 3),
            "avif_bytes": len(data)}


def _ref_cfg1_fps():
    """Measured reference throughput at BENCH config 1 on this host.

    The reference's SIMD tiers (AVX2 + 20 yasm files) cannot be built
    here — no nasm/yasm in the image and installs are barred — so the
    only buildable reference is COMPILE_C_ONLY (scalar kernels). This
    host also has ONE core, so the reference's 13-process pipeline gets
    no thread-level speedup. The measured figure is therefore the C-only
    single-core reference; BASELINE.md's 64-core AVX2 target remains the
    honest long-range bar (1.5-2 orders of magnitude above C-only)."""
    import os
    import subprocess

    app = "/tmp/refbin/SvtAv1EncApp"
    if not os.path.isfile(app):
        return None
    y4m = "/tmp/bench480.y4m"
    if not os.path.isfile(y4m):
        frames, u, v = _video(854, 480, 25)
        with open(y4m, "wb") as f:
            f.write(b"YUV4MPEG2 W854 H480 F25:1 Ip A1:1 C420jpeg\n")
            for y in frames:
                f.write(b"FRAME\n")
                f.write(y.tobytes())
                f.write(u.tobytes())
                f.write(v.tobytes())
    env = dict(os.environ, LD_LIBRARY_PATH="/tmp/refbin")
    t0 = time.perf_counter()
    r = subprocess.run([app, "-i", y4m, "-b", "/tmp/ref480.ivf",
                        "--preset", "12", "--crf", "35", "--lp", "1"],
                       capture_output=True, timeout=600, env=env)
    dt = time.perf_counter() - t0
    if r.returncode != 0:
        return None
    return round(25 / dt, 3)


def main():
    notes = {}
    # BASELINE.md config 1 analog: 480p, fast preset, IPPP (primary
    # metric). Median of 3 steady-state runs (the host shows heavy
    # wall-clock noise on this shared 1-core machine).
    runs = [_run(854, 480, 10, 35, 24) for _ in range(3)]
    runs.sort(key=lambda r: r["fps"])
    ippp = runs[1]
    notes["480p_p10_ippp"] = ippp
    # all-intra 480p at an RDO preset: the device-search path every frame
    notes["480p_p6_intra"] = _run(854, 480, 6, 35, 4, intra_only=True,
                                  warm_frames=2)
    # 1080p preset 8 (BASELINE config 2 analog): 24 frames = key + TF/TPL
    # lookahead + 3 mini-GoP drains — a steady-state figure, not one GoP
    notes["1080p_p8"] = _run(1920, 1080, 8, 35, 24)
    # BASELINE config 3: 1080p 10-bit preset 6 with the full loop-filter
    # pipeline (DLF + CDEF + Wiener/SGR)
    try:
        notes["1080p10_p6_filters"] = _run(1920, 1080, 6, 35, 24, bd=10)
    except Exception as e:
        notes["1080p10_p6_filters"] = {"error": str(e)[:200]}
    # BASELINE config 4: 4K 10-bit HDR with film grain + temporal
    # filtering ON THE CLOCK (lookahead auto now resolves, so enable_tf=1
    # actually filters — the r04 config silently skipped TF)
    try:
        notes["4k10_hdr_tf_grain"] = _run(3840, 2160, 8, 35, 8, bd=10,
                                          hdr_grain=True, warm_frames=6)
    except Exception as e:
        notes["4k10_hdr_tf_grain"] = {"error": str(e)[:200]}
    # BASELINE config 5: screen content (palette/IBC) + AVIF still
    try:
        sc = _run(1280, 720, 8, 35, 8, sc=True)
        sc.update(_run_avif_sc())
        notes["screen_content_avif"] = sc
    except Exception as e:
        notes["screen_content_avif"] = {"error": str(e)[:200]}
    ref_fps = None
    try:
        ref_fps = _ref_cfg1_fps()
    except Exception:
        pass
    notes["ref_c_only_1core_fps"] = ref_fps or REF_C_ONLY_480P_FPS
    notes["ref_native_note"] = (
        "SIMD reference unbuildable here (no nasm; 1-core host); "
        "vs_baseline compares the C-only single-core reference build. "
        "BASELINE.md 64-core AVX2 target = the long-range bar.")
    notes["backend_note"] = (
        "auto inter-search backend: device at presets >= 9 (beats the "
        "native kernel there: -7.7% bytes +0.08dB at 480p p10), native "
        "seeded kernel below (still +0.4-1.6dB ahead on deep GoPs) — so "
        "the p6/p8 rows run host-side by measured quality, not by "
        "capability (inter-me-backend=device overrides).")

    print(json.dumps({
        "metric": "video_480p_encode_fps",
        "value": ippp["fps"],
        "unit": "fps",
        "vs_baseline": round(ippp["fps"]
                             / (ref_fps or REF_C_ONLY_480P_FPS), 4),
        "notes": notes,
    }))


if __name__ == "__main__":
    main()
