"""Device temporal filter (ops/tf) vs the host per-block kernel.

TF is non-normative, so the backends need not be bit-exact — the tests
check that the device path (a) actually denoises, (b) tracks the host
kernel closely in output and (c) handles mono / 10-bit / odd sizes.
"""

import numpy as np
import pytest

from svt_av1_psy_tpu.codec.temporal_filter import temporal_filter


def _yuv(rng, H, W, noise, base=None, shift=0, bd=8):
    mx = (1 << bd) - 1
    dt = np.uint8 if bd == 8 else np.uint16
    if base is None:
        base = (np.linspace(0, mx, W)[None, :]
                + np.linspace(0, mx // 6, H)[:, None])
    y = np.clip(np.roll(base, shift, axis=1)
                + rng.normal(0, noise, (H, W)), 0, mx).astype(dt)
    u = np.clip(mx // 2 + rng.normal(0, noise, (H // 2, W // 2)),
                0, mx).astype(dt)
    v = np.clip(mx // 2 - 8 + rng.normal(0, noise, (H // 2, W // 2)),
                0, mx).astype(dt)
    return y, u, v


def test_device_tf_denoises_and_tracks_host():
    rng = np.random.default_rng(7)
    H, W = 96, 160
    clean = (np.linspace(0, 255, W)[None, :]
             + np.linspace(0, 40, H)[:, None])
    c = _yuv(rng, H, W, 6.0, base=clean)
    nbrs = [_yuv(rng, H, W, 6.0, base=clean, shift=-1),
            _yuv(rng, H, W, 6.0, base=clean, shift=1)]
    fy_h, fu_h, fv_h = temporal_filter(c, nbrs, 2, 8, backend="host")
    fy_d, fu_d, fv_d = temporal_filter(c, nbrs, 2, 8, backend="device")
    assert fy_d.shape == fy_h.shape and fy_d.dtype == fy_h.dtype
    ref = np.clip(clean, 0, 255)

    def mse(a):
        return float(np.mean((a.astype(np.float64) - ref) ** 2))

    assert mse(fy_d) < 0.6 * mse(c[0])          # it denoises
    # host TF-ME now refines to subpel (temporal_filtering.c:1557 parity);
    # the device pass is still full-pel, so allow it a wider band
    assert mse(fy_d) < 1.4 * mse(fy_h)
    for d, h in ((fy_d, fy_h), (fu_d, fu_h), (fv_d, fv_h)):
        assert float(np.mean(np.abs(d.astype(int) - h.astype(int)))) < 4.0


def test_device_tf_mono_10bit():
    rng = np.random.default_rng(3)
    H, W = 96, 160
    mk = lambda: (np.clip(512 + rng.normal(0, 20, (H, W)), 0, 1023)
                  .astype(np.uint16), None, None)
    c = mk()
    nbrs = [mk(), mk()]
    fy_h, u, v = temporal_filter(c, nbrs, 3, 10, backend="host")
    fy_d, ud, vd = temporal_filter(c, nbrs, 3, 10, backend="device")
    assert ud is None and vd is None
    assert fy_d.dtype == np.uint16 and fy_d.shape == (H, W)
    assert fy_d.std() < 0.8 * c[0].std()        # flat field: noise drops
    assert float(np.mean(np.abs(fy_d.astype(int) - fy_h.astype(int)))) < 16


def test_device_tf_odd_dims():
    rng = np.random.default_rng(11)
    H, W = 70, 130                               # not SB-aligned
    c = _yuv(rng, H, W, 5.0)
    nbrs = [_yuv(rng, H, W, 5.0)]
    fy, fu, fv = temporal_filter(c, nbrs, 2, 8, backend="device")
    assert fy.shape == (H, W) and fu.shape == (H // 2, W // 2)
    assert fy.dtype == np.uint8


def test_small_frames_fall_back_to_host():
    rng = np.random.default_rng(1)
    c = _yuv(rng, 48, 48, 4.0)
    nbrs = [_yuv(rng, 48, 48, 4.0)]
    out_auto = temporal_filter(c, nbrs, 2, 8, backend="auto")
    out_host = temporal_filter(c, nbrs, 2, 8, backend="host")
    for a, b in zip(out_auto, out_host):
        assert np.array_equal(a, b)


def test_device_tf_banding_matches_whole_frame(monkeypatch):
    """Frames above the HBM SB budget split into horizontal bands; with
    horizontal-only motion (no MVs across band boundaries) the banded
    output is identical to the whole-frame program."""
    import svt_av1_psy_tpu.ops.tf as ops_tf

    rng = np.random.default_rng(5)
    H, W = 256, 192
    base = (np.cumsum(rng.normal(0, 3, (H, W + 32)), axis=1) + 400).clip(0, 1023)
    cy = base[:, 8:8 + W].astype(np.uint16)
    ny = base[:, 0:W].astype(np.uint16)
    cu = (base[::2, 8:8 + W:2] // 2).astype(np.uint16)
    nu = (base[::2, 0:W:2] // 2).astype(np.uint16)
    whole = ops_tf.temporal_filter_device(
        (cy, cu, cu.copy()), [(ny, nu, nu.copy())], strength=2, bd=10)
    monkeypatch.setattr(ops_tf, "_SB_BUDGET", 6)   # forces 2+ bands
    banded = ops_tf.temporal_filter_device(
        (cy, cu, cu.copy()), [(ny, nu, nu.copy())], strength=2, bd=10)
    # band edges see a replicated 5x5 window and a per-band noise
    # estimate, so tiny differences are expected there; the filter as a
    # whole must match (non-normative path)
    for w, b in ((whole[0], banded[0]), (whole[1], banded[1])):
        d = np.abs(w.astype(np.int64) - b.astype(np.int64))
        assert float((d == 0).mean()) > 0.98, float((d == 0).mean())
        assert float(d.mean()) < 0.5 and int(d.max()) <= 16, \
            (float(d.mean()), int(d.max()))
