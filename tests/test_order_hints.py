"""Order hints + skip mode (spec 5.9.2/5.9.22/5.11.27).

The sequence header enables order hints (no jnt-comp / ref-frame-mvs
yet); hierarchical B frames derive a skip-mode pair (LAST, ALTREF) and
eligible zero-residual NEAREST_NEARESTMV compound blocks code one
skip_mode bit instead of the whole mode-info syntax.  Behavior
references: svt_av1_setup_skip_mode_allowed (pd_process.c:99-145),
write_skip_mode (entropy_coding.c).
"""

import numpy as np
import pytest

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.config import EncoderConfig
from svt_av1_psy_tpu.io import dav1d


def _clip(n=9, W=176, H=144, seed=5):
    rng = np.random.default_rng(seed)
    base = (np.cumsum(rng.normal(0, 4, (H, W + 64)), axis=1) + 128).clip(0, 255)
    ys = [np.clip(base[:, 2 * i : 2 * i + W]
                  + rng.normal(0, 3, (H, W)), 0, 255).astype(np.uint8)
          for i in range(n)]
    u = np.full((H // 2, W // 2), 120, np.uint8)
    v = np.full((H // 2, W // 2), 136, np.uint8)
    return ys, u, v


def _encode(ys, u, v, skip_mode=True, **cfg_kw):
    import svt_av1_psy_tpu.codec.inter_encoder as ie

    cfg = EncoderConfig(recon_enabled=True, **cfg_kw)
    cfg.qp = 40
    enc = Encoder(cfg).init()
    sm_counts = []
    orig_init = ie.InterFrameEncoder.__init__

    def patched(self, *a, **kw):
        if not skip_mode:
            kw["skip_mode_present"] = False
        orig_init(self, *a, **kw)
        sm_counts.append(self)

    ie.InterFrameEncoder.__init__ = patched
    try:
        for i, y in enumerate(ys):
            enc.send_picture(y, u, v.copy(), pts=i)
        enc.flush()
        pkts = []
        while (p := enc.get_packet()) is not None:
            pkts.append(p)
    finally:
        ie.InterFrameEncoder.__init__ = orig_init
    nbits = sum(len(p.data) for p in pkts)
    nsm = sum(int(e.mi_skip_mode.sum() > 0) for e in sm_counts)
    return pkts, nbits, nsm


def test_skip_mode_codes_blocks_and_saves_bytes():
    # mostly-static clip with one moving disc: most B-frame blocks are
    # zero-residual NEAREST_NEARESTMV -> one skip_mode bit each
    rng = np.random.default_rng(3)
    W, H = 176, 144
    bg = (np.cumsum(rng.normal(0, 5, (H, W)), axis=1) + 128).clip(0, 255)
    yy, xx = np.mgrid[0:H, 0:W]
    ys = []
    for i in range(9):
        y = bg.copy()
        m = ((xx - 30 - 4 * i) ** 2 + (yy - 60) ** 2) < 150
        y[m] = 200
        ys.append(y.astype(np.uint8))
    u = np.full((H // 2, W // 2), 120, np.uint8)
    v = np.full((H // 2, W // 2), 136, np.uint8)
    pk_on, bytes_on, frames_with_sm = _encode(ys, u, v, skip_mode=True,
                                              width=W, height=H, preset=8)
    pk_off, bytes_off, _ = _encode(ys, u, v, skip_mode=False,
                                   width=W, height=H, preset=8)
    assert frames_with_sm > 0, "no frame converted any block to skip_mode"
    # rate is ~neutral (adapted CDFs make the replaced syntax cheap); the
    # win is the distortion side: the trial may pick a better prediction
    # at the same (1-bit) rate.  Guard against regressions only.
    assert bytes_on <= bytes_off * 1.003, (bytes_on, bytes_off)


def test_skip_mode_stream_dav1d_bit_exact():
    if not dav1d.available():
        pytest.skip("dav1d not available")
    ys, u, v = _clip()
    W, H = 176, 144
    pkts, _, frames_with_sm = _encode(ys, u, v, skip_mode=True,
                                      width=W, height=H, preset=8)
    assert frames_with_sm > 0
    stream = b"".join(p.data for p in pkts)
    disp = [p for p in pkts if p.recon is not None]
    for i, p in enumerate(disp):
        dy, du, dv = dav1d.decode_nth(stream, i, W, H)
        assert np.array_equal(dy, p.recon[0]), f"frame {i} Y mismatch"
        assert np.array_equal(du, p.recon[1]), f"frame {i} U mismatch"
        assert np.array_equal(dv, p.recon[2]), f"frame {i} V mismatch"


def test_ippp_order_hints_conformant():
    """LOW_DELAY path: order hints coded, no skip mode (reference_select
    off), streams stay dav1d-bit-exact."""
    if not dav1d.available():
        pytest.skip("dav1d not available")
    from svt_av1_psy_tpu.config import PredStructure

    ys, u, v = _clip(n=5)
    W, H = 176, 144
    cfg = EncoderConfig(width=W, height=H, recon_enabled=True, preset=10,
                        pred_structure=PredStructure.LOW_DELAY)
    cfg.qp = 40
    enc = Encoder(cfg).init()
    pkts = []
    for i, y in enumerate(ys):
        enc.send_picture(y, u, v.copy(), pts=i)
        while (p := enc.get_packet()) is not None:
            pkts.append(p)
    enc.flush()
    while (p := enc.get_packet()) is not None:
        pkts.append(p)
    stream = b"".join(p.data for p in pkts)
    disp = [p for p in pkts if p.recon is not None]
    assert len(disp) == len(ys)
    for i, p in enumerate(disp):
        dy, du, dv = dav1d.decode_nth(stream, i, W, H)
        assert np.array_equal(dy, p.recon[0]), f"frame {i} Y mismatch"
