"""AB partitions (PARTITION_HORZ_A/B, VERT_A/B): 3-leaf splits priced
from costs the inter DP's job set already computes (two quarter squares
+ one rect half). Reference ladder: product_coding_loop.c:9791-9895.

The forced test biases the DP's rate model so every eligible node picks
an AB shape — exercising the partition symbols, the two-span ctx
updates, and the 3-leaf geometry in the C walk far beyond what the
natural search selects; streams must be dav1d-bit-exact."""

import numpy as np
import pytest

import svt_av1_psy_tpu.codec.inter_encoder as IE
import svt_av1_psy_tpu.codec.rd as RD
from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.config import EncoderConfig
from svt_av1_psy_tpu.io import dav1d

requires_dav1d = pytest.mark.skipif(not dav1d.available(),
                                    reason="dav1d shim unavailable")


def _clip(W, H, n, seed=7):
    rng = np.random.default_rng(seed)
    base = (np.cumsum(rng.normal(0, 5, (H + 64, W + 64)), axis=1)
            + 128).clip(0, 255).astype(np.uint8)
    fs = [base[i * 2 : i * 2 + H, i * 3 : i * 3 + W].copy()
          for i in range(n)]
    u = np.full((H // 2, W // 2), 120, np.uint8)
    v = np.full((H // 2, W // 2), 132, np.uint8)
    return fs, u, v


class _BiasedRM:
    """Rate model where NONE/HORZ/VERT/SPLIT are absurdly expensive but
    AB (priced with part_split_bits) stays cheap, forcing AB shapes."""

    def __init__(self, rm):
        self.part_none_bits = [1e7] * len(rm.part_none_bits)
        self.part_horz_bits = [1e7] * len(rm.part_horz_bits)
        self.part_vert_bits = [1e7] * len(rm.part_vert_bits)
        self.part_split_bits = [0.0] * len(rm.part_split_bits)
        for a in dir(rm):
            if not a.startswith("_") and not hasattr(self, a):
                setattr(self, a, getattr(rm, a))


def _encode(frames, u, v, W, H, force=False, preset=4):
    counts = []
    if force:
        orig_rm = RD.intra_rate_model
        RD.intra_rate_model = lambda q: _BiasedRM(orig_rm(q))
    orig_multi = IE.InterFrameEncoder._pre_walk_multi

    def spy(self):
        got = orig_multi(self)
        if got and self.decisions is not None and self.decisions.rect:
            counts.append(int(sum((m >= 4).sum()
                                  for m in self.decisions.rect.values())))
        return got

    IE.InterFrameEncoder._pre_walk_multi = spy
    try:
        cfg = EncoderConfig(width=W, height=H, preset=preset,
                            recon_enabled=True)
        cfg.qp = 30
        cfg.inter_me_backend = "native"
        enc = Encoder(cfg).init()
        pkts = []
        for f in frames:
            enc.send_picture(f, u, v.copy())
            while (p := enc.get_packet()) is not None:
                pkts.append(p)
        enc.flush()
        while (p := enc.get_packet()) is not None:
            pkts.append(p)
    finally:
        IE.InterFrameEncoder._pre_walk_multi = orig_multi
        if force:
            RD.intra_rate_model = orig_rm
    return pkts, sum(counts)


@requires_dav1d
def test_forced_ab_partitions_conformant():
    W, H = 192, 128
    frames, u, v = _clip(W, H, 5)
    pkts, n_ab = _encode(frames, u, v, W, H, force=True)
    assert n_ab > 0, "no AB partitions chosen; test is vacuous"
    stream = b"".join(p.data for p in pkts)
    disp = [p for p in pkts if p.recon is not None]
    for i, p in enumerate(disp):
        d = dav1d.decode_nth(stream, i, W, H)
        assert all(np.array_equal(a, b) for a, b in zip(d, p.recon)), i


@requires_dav1d
def test_natural_ab_search_conformant():
    W, H = 192, 128
    frames, u, v = _clip(W, H, 5, seed=2)
    pkts, n_ab = _encode(frames, u, v, W, H, force=False)
    stream = b"".join(p.data for p in pkts)
    disp = [p for p in pkts if p.recon is not None]
    for i, p in enumerate(disp):
        d = dav1d.decode_nth(stream, i, W, H)
        assert all(np.array_equal(a, b) for a, b in zip(d, p.recon)), i


@requires_dav1d
def test_forced_h4_v4_partitions_conformant():
    """HORZ_4/VERT_4 strip partitions (research presets): bias the rate
    model AND the AB combos so the 4-strip shapes win, then require
    dav1d bit-exactness."""
    W, H = 192, 128
    # horizontal 8px bands with vertical motion: 32x8 strips align with
    # the band boundaries, so HORZ_4 dominates the AB/half shapes
    rng = np.random.default_rng(5)
    bands = rng.integers(30, 226, (64,)).astype(np.uint8)
    frames = []
    for i in range(5):
        rows = np.repeat(bands, 8)
        y = np.tile(np.roll(rows, i * 3)[:H, None], (1, W))
        y = np.clip(y.astype(np.int16)
                    + rng.integers(-2, 3, (H, W)), 0, 255).astype(np.uint8)
        frames.append(y)
    u = np.full((H // 2, W // 2), 120, np.uint8)
    v = np.full((H // 2, W // 2), 132, np.uint8)
    counts = []
    orig_rm = RD.intra_rate_model
    RD.intra_rate_model = lambda q: _BiasedRM(orig_rm(q))
    orig_multi = IE.InterFrameEncoder._pre_walk_multi
    orig_cost = None

    def spy(self):
        # also make AB expensive so 4-way wins where available
        got = orig_multi(self)
        if got and self.decisions is not None and self.decisions.rect:
            counts.append(int(sum((m >= 8).sum()
                                  for m in self.decisions.rect.values())))
        return got

    IE.InterFrameEncoder._pre_walk_multi = spy
    # preset 2: research ladder (inter_part4 on)
    try:
        cfg = EncoderConfig(width=W, height=H, preset=2, recon_enabled=True)
        cfg.qp = 30
        cfg.inter_me_backend = "native"
        enc = Encoder(cfg).init()
        pkts = []
        for f in frames:
            enc.send_picture(f, u, v.copy())
            while (p := enc.get_packet()) is not None:
                pkts.append(p)
        enc.flush()
        while (p := enc.get_packet()) is not None:
            pkts.append(p)
    finally:
        IE.InterFrameEncoder._pre_walk_multi = orig_multi
        RD.intra_rate_model = orig_rm
    stream = b"".join(p.data for p in pkts)
    disp = [p for p in pkts if p.recon is not None]
    for i, p in enumerate(disp):
        d = dav1d.decode_nth(stream, i, W, H)
        assert all(np.array_equal(a, b) for a, b in zip(d, p.recon)), i
    assert sum(counts) > 0, "no 4-way partitions chosen; test is vacuous"
