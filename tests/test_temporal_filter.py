"""Temporal filtering: denoising effect, lookahead API, conformance."""

import numpy as np
import pytest

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.codec.temporal_filter import temporal_filter
from svt_av1_psy_tpu.config import EncoderConfig
from svt_av1_psy_tpu.io import dav1d

requires_dav1d = pytest.mark.skipif(not dav1d.available(), reason="dav1d shim unavailable")


def _noisy_scene(n, W, H, sigma=6, seed=0):
    rng = np.random.default_rng(seed)
    clean = (np.cumsum(rng.normal(0, 4, (H, W)), axis=1) + 128).clip(20, 235).astype(np.float64)
    frames = []
    for _ in range(n):
        noisy = (clean + rng.normal(0, sigma, (H, W))).clip(0, 255).astype(np.uint8)
        frames.append(noisy)
    return clean, frames


def test_tf_denoises_static_scene():
    clean, frames = _noisy_scene(5, 128, 96)
    u = np.full((48, 64), 120, np.uint8)
    center = (frames[2], u, u.copy())
    neighbors = [(f, u, u.copy()) for f in (frames[0], frames[1], frames[3], frames[4])]
    fy, fu, fv = temporal_filter(center, neighbors, strength=3)
    err_before = float(np.mean((frames[2].astype(np.float64) - clean) ** 2))
    err_after = float(np.mean((fy.astype(np.float64) - clean) ** 2))
    assert err_after < err_before * 0.6, (err_before, err_after)


def test_tf_strength_zero_is_identity():
    _, frames = _noisy_scene(3, 64, 64)
    out = temporal_filter((frames[1], None, None),
                          [(frames[0], None, None)], strength=0)
    assert np.array_equal(out[0], frames[1])


def test_tf_rejects_mismatched_scene():
    """Blocks that do not match anywhere in the neighbor must keep ~center."""
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    b = rng.integers(0, 256, (64, 64)).astype(np.uint8)  # unrelated noise
    fy, _, _ = temporal_filter((a, None, None), [(b, None, None)], strength=1)
    # weight ~0 -> output equals center
    assert float(np.mean(np.abs(fy.astype(int) - a.astype(int)))) < 1.0


@requires_dav1d
def test_tf_lookahead_stream_conformant():
    W, H = 96, 64
    _, frames = _noisy_scene(6, W, H, seed=3)
    u = np.full((H // 2, W // 2), 118, np.uint8)
    cfg = EncoderConfig(width=W, height=H, recon_enabled=True,
                        enable_tf=1, look_ahead_distance=2, tf_strength=2,
                        kf_tf_strength=2)
    cfg.qp = 40
    enc = Encoder(cfg).init()
    for i, f in enumerate(frames):
        enc.send_picture(f, u, u.copy(), pts=i)
    enc.flush()
    stream = b""
    recons = []
    pts = []
    while (pkt := enc.get_packet()) is not None:
        stream += pkt.data
        if pkt.recon is not None:     # display packets, in display order
            recons.append(pkt.recon)
            pts.append(pkt.pts)
    assert pts == list(range(6))
    for i in (0, 3, 5):
        dy, du, dv = dav1d.decode_nth(stream, i, W, H)
        assert np.array_equal(dy, recons[i][0]), f"frame {i}"


def test_tf_queue_buffers_until_window():
    from svt_av1_psy_tpu.config import PredStructure

    cfg = EncoderConfig(width=64, height=64, enable_tf=1, look_ahead_distance=3,
                        pred_structure=PredStructure.LOW_DELAY)
    enc = Encoder(cfg).init()
    u = np.full((32, 32), 120, np.uint8)
    y = np.full((64, 64), 100, np.uint8)
    enc.send_picture(y, u, u.copy())
    assert enc.get_packet() is None          # buffered, window not filled
    for _ in range(3):
        enc.send_picture(y, u, u.copy())
    assert enc.get_packet() is not None      # head encoded once window full
    enc.flush()
    n = 0
    while enc.get_packet() is not None:
        n += 1
    assert n == 3


def test_noise_estimate_and_adaptive_decay():
    """Noise-adaptive TF strengths (temporal_filtering.c noise_levels ->
    decay_control): the Laplacian estimator tracks injected noise, and a
    noisy source earns higher filter weights than a clean one."""
    from svt_av1_psy_tpu.codec.temporal_filter import (_noise_decay,
                                                       estimate_plane_noise,
                                                       temporal_filter)

    rng = np.random.default_rng(2)
    H, W = 96, 128
    smooth = (np.cumsum(rng.normal(0, 2, (H, W)), axis=1) + 128).clip(
        20, 235).astype(np.uint8)
    clean = smooth.copy()
    noisy = np.clip(smooth.astype(np.int32)
                    + rng.normal(0, 8, (H, W)).round().astype(np.int32),
                    0, 255).astype(np.uint8)
    s_clean = estimate_plane_noise(clean)
    s_noisy = estimate_plane_noise(noisy)
    assert s_noisy > s_clean + 2.0
    assert _noise_decay(s_noisy) > _noise_decay(s_clean)

    u = np.full((H // 2, W // 2), 118, np.uint8)
    mk = lambda y: (y, u.copy(), u.copy())
    n_clean = [mk(np.clip(clean.astype(np.int32) + 1, 0, 255).astype(np.uint8))]
    fy_clean, fu, _ = temporal_filter(mk(clean), n_clean, 2)
    n2 = np.clip(noisy.astype(np.int32)
                 + rng.normal(0, 8, (H, W)).round().astype(np.int32),
                 0, 255).astype(np.uint8)
    fy_noisy, _, _ = temporal_filter(mk(noisy), [mk(n2)], 2)
    assert fu is not None and fy_clean.shape == clean.shape
    # the noisy pair must actually mix (filtered != center), i.e. the
    # adaptive threshold keeps real-noise differences inside the window
    assert np.abs(fy_noisy.astype(int) - noisy.astype(int)).mean() > 0.2


def test_tf_runs_by_default():
    """Round-4 regression guard: enable_tf=1 (the default) must actually
    execute TF — lookahead auto resolves to a real window, the keyframe
    filters at the queue head, and the mini-GoP ALTREF filters at GoP
    assembly."""
    import svt_av1_psy_tpu.codec.temporal_filter as tfmod

    cfg = EncoderConfig(width=64, height=64)
    assert cfg.look_ahead_distance == -1
    from svt_av1_psy_tpu.config import verify_settings

    assert verify_settings(cfg).look_ahead_distance > 0

    calls = []
    orig = tfmod.temporal_filter

    def spy(center, neighbors, strength, bd=8, backend="auto"):
        calls.append((strength, len(neighbors)))
        return orig(center, neighbors, strength, bd, backend="host")

    tfmod.temporal_filter = spy
    try:
        _, frames = _noisy_scene(6, 64, 64, seed=9)
        u = np.full((32, 32), 120, np.uint8)
        enc = Encoder(EncoderConfig(width=64, height=64)).init()
        for f in frames:
            enc.send_picture(f, u, u.copy())
        enc.flush()
        n = 0
        while enc.get_packet() is not None:
            n += 1
        assert n >= 6
    finally:
        tfmod.temporal_filter = orig
    filtered = [c for c in calls if c[0] > 0 and c[1] > 0]
    assert filtered, "no TF executed under the default config"
