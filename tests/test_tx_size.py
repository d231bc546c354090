"""Inter TX-size search (var-tx, TX_MODE_SELECT): one-depth luma splits
on inter leaves. Reference: perform_tx_partitioning
(product_coding_loop.c:5307), Docs/Appendix-TX-Search.md.

Conformance is the contract: frames that code txfm_partition trees,
intra tx-depth symbols, and per-child coefficients must reconstruct
bit-exactly in dav1d (including forced splits on every eligible leaf,
which exercises the ctx spans far beyond what the search picks)."""

import numpy as np
import pytest

import svt_av1_psy_tpu.codec.inter_encoder as IE
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


def _encode(frames, u, v, W, H, force_splits=False, **cfg_kw):
    counts = []
    orig = IE.InterFrameEncoder._inter_tx_search_timed

    def forced(self):
        orig(self)
        if force_splits:
            for (r, c), d in self.inter_dec.items():
                if not d[0]:
                    continue
                g = self.leaf_geom.get((r, c))
                if g:
                    self.inter_txsplit[(r, c)] = True
                    if g[0] == g[1] and g[0] <= 32:
                        # child-type leak repro (what the search stores)
                        self.inter_txt[(r, c)] = 3  # ADST_ADST

            self.tx_mode_select = bool(self.inter_txsplit)
            self.shared["inter_txsplit"] = self.inter_txsplit
            self.shared["tx_mode_select"] = self.tx_mode_select
        counts.append(len(self.inter_txsplit))

    IE.InterFrameEncoder._inter_tx_search_timed = forced
    try:
        cfg = EncoderConfig(width=W, height=H, preset=6, recon_enabled=True,
                            **cfg_kw)
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
        IE.InterFrameEncoder._inter_tx_search_timed = orig
    return pkts, counts


@requires_dav1d
def test_forced_vartx_splits_conformant_ipp():
    W, H = 128, 64
    frames, u, v = _clip(W, H, 4)
    pkts, counts = _encode(frames, u, v, W, H, force_splits=True,
                           hierarchical_levels=0, look_ahead_distance=0)
    assert sum(counts) > 0, "no splits engaged; test is vacuous"
    stream = b"".join(p.data for p in pkts)
    disp = [p for p in pkts if p.recon is not None]
    for i, p in enumerate(disp):
        d = dav1d.decode_nth(stream, i, W, H)
        assert all(np.array_equal(a, b) for a, b in zip(d, p.recon)), i


@requires_dav1d
def test_forced_vartx_splits_conformant_pyramid():
    """Hierarchical GoP: splits + compound modes + skip-mode in one
    stream; every display frame must match dav1d."""
    W, H = 128, 96
    frames, u, v = _clip(W, H, 5, seed=3)
    pkts, counts = _encode(frames, u, v, W, H, force_splits=True)
    assert sum(counts) > 0
    stream = b"".join(p.data for p in pkts)
    disp = [p for p in pkts if p.recon is not None]
    for i, p in enumerate(disp):
        d = dav1d.decode_nth(stream, i, W, H)
        assert all(np.array_equal(a, b) for a, b in zip(d, p.recon)), i


@requires_dav1d
def test_natural_tx_search_conformant():
    """The un-forced search path (whatever it decides) stays conformant
    and the header bit tracks whether any split was chosen."""
    W, H = 128, 64
    frames, u, v = _clip(W, H, 4, seed=11)
    pkts, counts = _encode(frames, u, v, W, H,
                           hierarchical_levels=0, look_ahead_distance=0)
    stream = b"".join(p.data for p in pkts)
    disp = [p for p in pkts if p.recon is not None]
    for i, p in enumerate(disp):
        d = dav1d.decode_nth(stream, i, W, H)
        assert all(np.array_equal(a, b) for a, b in zip(d, p.recon)), i


@requires_dav1d
def test_forced_splits_with_zero_children_revert():
    """A split leaf whose children ALL quantize to zero reverts to a
    depth-0 skip block; the revert must also reset the stored (child) tx
    type — an ADST child type at a 32x32 parent has no transform table
    and crashed the walk (caught on the 480p A/B clip at crf 25)."""
    W, H = 128, 64
    rng = np.random.default_rng(2)
    base = (np.cumsum(rng.normal(0, 5, (H, W)), axis=1)
            + 128).clip(0, 255).astype(np.uint8)
    # near-static: children quantize to zero at high qp
    frames = [np.clip(base.astype(np.int16) + i, 0, 255).astype(np.uint8)
              for i in range(4)]
    u = np.full((H // 2, W // 2), 120, np.uint8)
    v = np.full((H // 2, W // 2), 132, np.uint8)
    pkts, counts = _encode(frames, u, v, W, H, force_splits=True,
                           hierarchical_levels=0, look_ahead_distance=0)
    assert sum(counts) > 0
    stream = b"".join(p.data for p in pkts)
    disp = [p for p in pkts if p.recon is not None]
    for i, p in enumerate(disp):
        d = dav1d.decode_nth(stream, i, W, H)
        assert all(np.array_equal(a, b) for a, b in zip(d, p.recon)), i
