"""Native tile walk vs Python walk: byte-identical tiles + identical state.

The C driver (native/walk_native.c) must reproduce the Python walk exactly:
same tile payload bytes, same recon, same CDF adaptation state. Matrix over
the features it supports (partitions, TX types, CFL, QM, delta-q, tiles,
odd dims, screen-content flags, 10-bit)."""

import numpy as np
import pytest

from svt_av1_psy_tpu.codec import walk_native
from svt_av1_psy_tpu.codec.intra_encoder import IntraFrameEncoder
from svt_av1_psy_tpu.codec.intra_rdo import search_intra_decisions

pytestmark = pytest.mark.skipif(not walk_native.available(),
                                reason="native walk unavailable")


def _content(rng, W, H, bd=8):
    peak = (1 << bd) - 1
    y = (np.cumsum(rng.normal(0, 5 * (peak / 255), (H, W)), axis=1)
         + peak / 2).clip(0, peak).astype(np.uint16)
    y[: H // 4, : W // 4] = peak // 6
    ch, cw = (H + 1) // 2, (W + 1) // 2
    u = (np.cumsum(rng.normal(0, 3, (ch, cw)), axis=0) + peak / 2).clip(0, peak).astype(np.uint16)
    v = np.full((ch, cw), peak // 2 + 7, np.uint16)
    return y, u, v


def _pad64(y, W, H):
    ph, pw = -(-H // 64) * 64, -(-W // 64) * 64
    p = np.zeros((ph, pw), np.uint16)
    p[:H, :W] = y
    p[:H, W:] = p[:H, W - 1: W]
    p[H:, :] = p[H - 1: H, :]
    return p


def _encode_both(W, H, q, seed, mono=False, bd=8, qm_levels=None,
                 sb_qindex_map=None, tiles=(0, 0), allow_sct=False,
                 depths=(8, 16, 32), tx_depths=(8, 16)):
    rng = np.random.default_rng(seed)
    y, u, v = _content(rng, W, H, bd)
    dec = search_intra_decisions(_pad64(y, W, H), q, bd,
                                 sb_qindex_map=sb_qindex_map,
                                 qm_levels=qm_levels, depths=depths,
                                 tx_search_depths=tx_depths)
    outs = []
    for force_python in (False, True):
        enc = IntraFrameEncoder(W, H, q, bd=bd, monochrome=mono,
                                decisions=dec, qm_levels=qm_levels,
                                sb_qindex_map=sb_qindex_map,
                                allow_sct=allow_sct, enable_filter_intra=True,
                                filter_intra_search=False)
        if force_python:
            enc.seg_params = None
            orig = walk_native.eligible
            walk_native.eligible = lambda e: False
        try:
            tiles_out = enc.encode_tiles(y, None if mono else u,
                                         None if mono else v, *tiles)
        finally:
            if force_python:
                walk_native.eligible = orig
        outs.append((tiles_out, [ps.recon.copy() for ps in enc.planes], enc))
    return outs


@pytest.mark.parametrize("kw", [
    dict(W=128, H=128, q=100, seed=1),
    dict(W=192, H=128, q=60, seed=2, qm_levels=(8, 10, 10)),
    dict(W=100, H=76, q=120, seed=3),                 # edge partitions
    dict(W=128, H=128, q=200, seed=4, mono=True),     # high q / skips
    dict(W=128, H=128, q=80, seed=5, allow_sct=True),
    dict(W=192, H=192, q=90, seed=6, tiles=(1, 1)),   # 4 tiles
    dict(W=128, H=128, q=140, seed=7, bd=10),
    dict(W=128, H=64, q=150, seed=8, depths=(16, 32, 64), tx_depths=(16,)),
])
def test_native_walk_matches_python(kw):
    sbmap = None
    if kw.pop("delta_q", False):
        H, W = kw["H"], kw["W"]
        rng = np.random.default_rng(99)
        sbmap = kw["q"] + 4 * rng.integers(-3, 4, (-(-H // 64), -(-W // 64)))
        sbmap = np.clip(sbmap, 1, 255).astype(np.int32)
    (t_c, rec_c, enc_c), (t_p, rec_p, enc_p) = _encode_both(
        sb_qindex_map=sbmap, **kw)
    assert len(t_c) == len(t_p)
    for i, (a, b) in enumerate(zip(t_c, t_p)):
        assert a == b, f"tile {i} differs: {len(a)} vs {len(b)} bytes"
    for a, b in zip(rec_c, rec_p):
        assert np.array_equal(a, b), "recon differs"
    assert np.array_equal(enc_c.mi_mode, enc_p.mi_mode)
    assert np.array_equal(enc_c.mi_skip, enc_p.mi_skip)


def test_native_walk_delta_q():
    W = H = 128
    rng = np.random.default_rng(99)
    sbmap = 100 + 4 * rng.integers(-3, 4, (2, 2))
    sbmap = np.clip(sbmap, 1, 255).astype(np.int32)
    (t_c, rec_c, _), (t_p, rec_p, _) = _encode_both(
        W, H, 100, 10, sb_qindex_map=sbmap)
    assert t_c == t_p
    for a, b in zip(rec_c, rec_p):
        assert np.array_equal(a, b)


# ---------------------------------------------------------------- inter walk
def _encode_seq(kw, nframes, seed, force_python, motion=2):
    """Encode an IPPP sequence through the full API with/without the C walk."""
    from svt_av1_psy_tpu.api import Encoder
    from svt_av1_psy_tpu.config import EncoderConfig

    W, H = kw.pop("W", 176), kw.pop("H", 144)
    bd = kw.pop("input_depth", 8)
    rng = np.random.default_rng(seed)
    peak = (1 << bd) - 1
    base = (np.cumsum(rng.normal(0, 4 * (peak / 255), (H, W)), axis=1)
            + peak / 2).clip(0, peak)
    ys = [np.clip(np.roll(base, f * motion, axis=1)
                  + rng.normal(0, 3 * (peak / 255), (H, W)), 0, peak)
          .astype(np.uint16 if bd > 8 else np.uint8) for f in range(nframes)]
    ch, cw = (H + 1) // 2, (W + 1) // 2
    u = np.full((ch, cw), peak // 2 - 4, np.uint16 if bd > 8 else np.uint8)
    cfg = EncoderConfig(width=W, height=H, recon_enabled=True,
                        input_depth=bd, **kw)
    cfg.qp = kw.get("qp", 40)
    orig = walk_native.eligible
    if force_python:
        walk_native.eligible = lambda e: False
    try:
        enc = Encoder(cfg).init()
        pkts, recons = [], []
        for y in ys:
            enc.send_picture(y, u, u.copy())
        enc.flush()
        while (p := enc.get_packet()) is not None:
            pkts.append(p.data)
            if p.recon is not None:
                recons.append(p.recon)
    finally:
        walk_native.eligible = orig
    return pkts, recons


@pytest.mark.parametrize("kw,nframes,seed", [
    (dict(preset=8), 4, 3),
    (dict(preset=10, W=200, H=116), 3, 4),          # odd dims, edge blocks
    (dict(preset=8, input_depth=10), 3, 5),         # 10-bit
    (dict(preset=6), 3, 6),                          # variance boost delta-q
    (dict(preset=8, enable_variance_boost=0, qp=55), 4, 7),  # high q skips
])
def test_native_walk_inter_matches_python(kw, nframes, seed):
    pk_c, rc_c = _encode_seq(dict(kw), nframes, seed, force_python=False)
    pk_p, rc_p = _encode_seq(dict(kw), nframes, seed, force_python=True)
    for i, (a, b) in enumerate(zip(pk_c, pk_p)):
        assert a == b, f"frame {i} differs: {len(a)} vs {len(b)} bytes"
    for a, b in zip(rc_c, rc_p):
        for x, y in zip(a, b):
            assert np.array_equal(x, y)


def test_native_walk_inter_conformant():
    from pathlib import Path
    if not Path("/usr/lib/x86_64-linux-gnu/libdav1d.so.6").exists():
        pytest.skip("dav1d unavailable")
    from svt_av1_psy_tpu.io import dav1d

    pk, rc = _encode_seq(dict(preset=8, W=176, H=144), 5, 11,
                         force_python=False, motion=3)
    stream = b"".join(pk)
    for i, r in enumerate(rc):
        d = dav1d.decode_nth(stream, i, 176, 144)
        assert all(np.array_equal(x, y) for x, y in zip(d, r)), f"frame {i}"
