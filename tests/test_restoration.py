"""Loop restoration (Wiener): filter math, stripe boundaries, conformance."""

import numpy as np
import pytest

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.codec.restoration import (DEFAULT_TAPS, PlaneRestoration,
                                               _kernel, pick_wiener,
                                               wiener_filter_block)
from svt_av1_psy_tpu.config import EncoderConfig
from svt_av1_psy_tpu.io import dav1d

requires_dav1d = pytest.mark.skipif(not dav1d.available(), reason="dav1d shim unavailable")


def test_wiener_kernel_dc_gain():
    k = _kernel(DEFAULT_TAPS)
    # add-src form: taps sum to 0, the convolve adds the 128-weighted center
    assert int(k.sum()) == 0
    # flat input must pass through unchanged for any legal taps
    flat = np.full((22, 22), 173, np.int64)
    out = wiener_filter_block(flat, 16, 16, (5, -20, 30), (-4, 8, 40))
    assert np.all(out == 173)


def test_unit_limits_offset_and_merge():
    # 160 wide: 64 + 64 + 32 (tail shorter than ext_size stays separate);
    # 96 high: stripes [0,56) + [56,96)
    pr = PlaneRestoration(160, 96, 0, 64)
    assert (pr.hunits, pr.vunits) == (3, 2)
    assert pr.unit_limits(0, 0) == (0, 56, 0, 64)
    assert pr.unit_limits(0, 2)[2:] == (128, 160)
    # 88 wide merges the 24-px tail into one 88-px unit (rem < 96)
    pr3 = PlaneRestoration(88, 64, 0, 64)
    assert pr3.hunits == 1 and pr3.unit_limits(0, 0)[2:] == (0, 88)
    # vertical offset: 192-high plane has units at [0,56), [56,120), [120,192)
    pr2 = PlaneRestoration(64, 192, 0, 64)
    assert pr2.vunits == 3
    assert pr2.unit_limits(0, 0)[:2] == (0, 56)
    assert pr2.unit_limits(1, 0)[:2] == (56, 120)
    assert pr2.unit_limits(2, 0)[:2] == (120, 192)


def _encode_lr(W, H, n=1, bd=8, q=45, seed=5, **cfg_kw):
    rng = np.random.default_rng(seed)
    peak = (1 << bd) - 1
    dt = np.uint8 if bd == 8 else np.uint16
    clean = (np.cumsum(rng.normal(0, peak / 50, (H + 32, W + 32)), axis=1) + peak // 2).clip(0, peak)
    base = (clean + rng.normal(0, peak / 50, clean.shape)).clip(0, peak).astype(dt)
    cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, input_depth=bd, recon_enabled=True,
                        enable_restoration_filtering=1, **cfg_kw)
    cfg.qp = q
    enc = Encoder(cfg).init()
    for i in range(n):
        y = base[2 * i : 2 * i + H, 3 * i : 3 * i + W].copy()
        u = np.full(((H + 1) // 2, (W + 1) // 2), peak // 2 - 8, dt)
        enc.send_picture(y, u, u.copy())
    enc.flush()
    stream = b""
    recons = []
    while (pkt := enc.get_packet()) is not None:
        stream += pkt.data
        if pkt.recon is not None:
            recons.append(pkt.recon)
    return stream, recons


def _check(stream, recons, W, H):
    for i in range(len(recons)):
        dy, du, dv = dav1d.decode_nth(stream, i, W, H)
        assert np.array_equal(dy, recons[i][0]), f"frame {i} luma"
        assert np.array_equal(du, recons[i][1]), f"frame {i} U"


@requires_dav1d
@pytest.mark.parametrize("case", [
    dict(W=192, H=192),                       # multiple stripes + units
    dict(W=96, H=256),                        # 4 stripe boundaries
    dict(W=160, H=96),                        # horizontal unit merge
    dict(W=106, H=150),                       # odd dims
    dict(W=128, H=128, bd=10),                # 10-bit
    dict(W=128, H=128, cdef_level=0),         # deblock-only boundary rows
    dict(W=160, H=128, n=4),                  # LR recon as inter reference
])
def test_lr_stream_conformant(case):
    W, H = case.pop("W"), case.pop("H")
    n = case.pop("n", 1)
    stream, recons = _encode_lr(W, H, n=n, **case)
    _check(stream, recons, W, H)


@requires_dav1d
def test_lr_improves_noisy_recon():
    """On noisy content at high q, Wiener should move recon toward source."""
    rng = np.random.default_rng(9)
    W, H = 128, 128
    y = (np.cumsum(rng.normal(0, 5, (H, W)), axis=1) + 128
         + rng.normal(0, 6, (H, W))).clip(0, 255).astype(np.uint8)
    u = np.full((64, 64), 115, np.uint8)

    def mse(enable):
        cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, recon_enabled=True,
                            enable_restoration_filtering=enable)
        cfg.qp = 50
        enc = Encoder(cfg).init()
        enc.send_picture(y, u, u.copy())
        r = enc.get_packet().recon[0]
        return float(np.mean((r.astype(np.int64) - y) ** 2))

    assert mse(1) < mse(0)


def test_pick_wiener_skips_clean_unit():
    """A unit where CDEF output already equals the source must stay NONE."""
    rng = np.random.default_rng(1)
    src = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    pr = pick_wiener(src, src, src, 64, 64, 0)
    assert pr.frame_type == 0


@requires_dav1d
def test_chroma_lr_conformant():
    """5-tap chroma Wiener units (tap0 fixed 0) on noisy chroma."""
    rng = np.random.default_rng(5)
    W, H = 128, 96
    y = (np.cumsum(rng.normal(0, 5, (H, W)), axis=1) + 128
         + rng.normal(0, 5, (H, W))).clip(0, 255).astype(np.uint8)
    u = ((np.cumsum(rng.normal(0, 6, (48, 64)), axis=0) + 128)
         + rng.normal(0, 6, (48, 64))).clip(0, 255).astype(np.uint8)
    v = u[::-1].copy()
    cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, recon_enabled=True,
                        enable_restoration_filtering=1)
    cfg.qp = 48
    enc = Encoder(cfg).init()
    enc.send_picture(y, u, v)
    pkt = enc.get_packet()
    dy, du, dv = dav1d.decode(pkt.data, W, H)
    assert np.array_equal(dy, pkt.recon[0])
    assert np.array_equal(du, pkt.recon[1])
    assert np.array_equal(dv, pkt.recon[2])


def test_pick_lr_device_backend_matches_host():
    """The device SGR sweep (ops/lr_search wired via pick_lr
    backend="device") must pick parameters whose EXACT committed SSE is
    within noise of the host's exhaustive per-unit search — the device
    pass only selects the ep; the committed filter is the exact one."""
    from svt_av1_psy_tpu.codec.restoration import RESTORE_NONE, pick_lr

    rng = np.random.default_rng(3)
    W = H = 160
    src = (np.cumsum(rng.normal(0, 5, (H, W)), axis=1) + 128).clip(0, 255)
    src = src.astype(np.uint8)
    dgd = np.clip(src.astype(np.int32)
                  + rng.integers(-9, 10, (H, W)), 0, 255).astype(np.uint8)

    def total_sse(pr):
        from svt_av1_psy_tpu.codec.restoration import (apply_restoration)
        rec = [dgd.astype(np.uint8).copy()]
        apply_restoration(rec, [dgd.copy()], [pr], 8)
        return float(((rec[0].astype(np.int64) - src) ** 2).sum())

    host = pick_lr(src, dgd, dgd, W, H, 0, 8, unit_size=64,
                   backend="host")
    dev = pick_lr(src, dgd, dgd, W, H, 0, 8, unit_size=64,
                  backend="device")
    assert host.frame_type != RESTORE_NONE
    assert dev.frame_type != RESTORE_NONE
    sse_h, sse_d = total_sse(host), total_sse(dev)
    base = float(((dgd.astype(np.int64) - src) ** 2).sum())
    # both must improve on the unrestored plane, and the device pick must
    # recover >= 90% of the host search's SSE reduction
    assert sse_h < base and sse_d < base
    assert (base - sse_d) >= 0.90 * (base - sse_h)
