"""Intra predictor bit-exactness vs reference C kernels."""

import numpy as np
import pytest

import oracle
from svt_av1_psy_tpu.codec import intra

requires_oracle = pytest.mark.skipif(not oracle.available, reason="oracle not built")

SIZES = [(4, 4), (8, 8), (16, 16), (32, 32), (64, 64), (4, 8), (8, 4),
         (8, 16), (16, 8), (16, 32), (32, 16), (4, 16), (16, 4), (8, 32),
         (32, 8), (16, 64), (64, 16), (32, 64), (64, 32)]

ORACLE_NAMES = {
    "dc": lambda a, l, al: intra.dc_pred(a, l, True, True),
    "v": lambda a, l, al: intra.v_pred(a, l),
    "h": lambda a, l, al: intra.h_pred(a, l),
    "smooth": lambda a, l, al: intra.smooth_pred(a, l),
    "smooth_v": lambda a, l, al: intra.smooth_v_pred(a, l),
    "smooth_h": lambda a, l, al: intra.smooth_h_pred(a, l),
    "paeth": lambda a, l, al: intra.paeth_pred(a, l, al),
}


@requires_oracle
@pytest.mark.parametrize("size", SIZES, ids=lambda s: f"{s[0]}x{s[1]}")
def test_intra_predictors_bit_exact(size):
    W, H = size
    rng = np.random.default_rng(W * 64 + H)
    for name, fn in ORACLE_NAMES.items():
        for _ in range(4):
            row = rng.integers(0, 256, W + 1, dtype=np.uint8)  # [top_left, above...]
            left8 = rng.integers(0, 256, H, dtype=np.uint8)
            above8 = row[1:]
            ref = oracle.intra_pred(name, row, left8, (W, H))
            got = fn(above8[None].astype(np.uint16), left8[None].astype(np.uint16),
                     row[:1].astype(np.uint16))
            assert np.array_equal(got[0], ref.astype(np.uint16)), (name, size)


@requires_oracle
@pytest.mark.parametrize("variant", ["dc_128", "dc_left", "dc_top"])
def test_dc_variants(variant):
    W = H = 16
    rng = np.random.default_rng(1)
    above = rng.integers(0, 256, W, dtype=np.uint8)
    left = rng.integers(0, 256, H, dtype=np.uint8)
    ref = oracle.intra_pred(variant, np.concatenate([[0], above]).astype(np.uint8), left, (W, H))
    have_above = variant == "dc_top"
    have_left = variant == "dc_left"
    got = intra.dc_pred(above[None].astype(np.uint16), left[None].astype(np.uint16),
                        have_above, have_left, 8)
    assert np.array_equal(got[0], ref.astype(np.uint16))
