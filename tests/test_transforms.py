"""Transform bit-exactness tests vs the reference C kernels (golden oracle).

Analog of test/FwdTxfm2dAsmTest.cc / InvTxfm2dAsmTest.cc: random inputs,
C reference vs our implementation, bit-exact compare.
"""

import numpy as np
import pytest

import oracle
from svt_av1_psy_tpu.codec.constants import TX_HEIGHT, TX_WIDTH, TxSize
from svt_av1_psy_tpu.codec.transforms import (
    forward_transform_2d,
    inverse_transform_add,
    tx_types_for_size,
)

requires_oracle = pytest.mark.skipif(not oracle.available, reason="reference oracle not built")

ALL_TX_SIZES = list(range(19))


def _rand_residual(rng, H, W, bd):
    lim = (1 << bd) - 1
    return rng.integers(-lim, lim + 1, (H, W)).astype(np.int16)


@requires_oracle
@pytest.mark.parametrize("tx_size", ALL_TX_SIZES, ids=lambda s: TxSize(s).name)
def test_forward_bit_exact(tx_size):
    rng = np.random.default_rng(tx_size)
    H, W = int(TX_HEIGHT[tx_size]), int(TX_WIDTH[tx_size])
    for tx_type in tx_types_for_size(tx_size):
        for bd in (8, 10):
            res = _rand_residual(rng, H, W, bd)
            ref = oracle.fwd_txfm2d(res, int(tx_type), bd)
            got = forward_transform_2d(res[None], tx_size, int(tx_type), bd)[0]
            cw, ch = min(W, 32), min(H, 32)
            assert np.array_equal(got[:ch, :cw], ref[:ch, :cw]), (
                TxSize(tx_size).name, tx_type.name, bd)


@requires_oracle
@pytest.mark.parametrize("tx_size", ALL_TX_SIZES, ids=lambda s: TxSize(s).name)
def test_inverse_bit_exact(tx_size):
    rng = np.random.default_rng(100 + tx_size)
    H, W = int(TX_HEIGHT[tx_size]), int(TX_WIDTH[tx_size])
    for tx_type in tx_types_for_size(tx_size):
        for bd in (8, 10):
            # realistic coefficients: forward transform of a random residual
            res = _rand_residual(rng, H, W, bd)
            coeffs = forward_transform_2d(res[None], tx_size, int(tx_type), bd)[0]
            pred = rng.integers(0, 1 << bd, (H, W)).astype(np.uint16)
            ref = oracle.inv_txfm2d_add(coeffs, pred, int(tx_type), bd)
            got = inverse_transform_add(coeffs[None], pred[None], tx_size, int(tx_type), bd)[0]
            assert np.array_equal(got, ref), (TxSize(tx_size).name, tx_type.name, bd)


@requires_oracle
def test_inverse_extreme_coefficients():
    """Clamp-path coverage: max-magnitude coefficients must still match."""
    rng = np.random.default_rng(7)
    for tx_size in (TxSize.TX_4X4, TxSize.TX_16X16, TxSize.TX_32X32, TxSize.TX_8X16):
        H, W = int(TX_HEIGHT[tx_size]), int(TX_WIDTH[tx_size])
        coeffs = rng.choice([-(1 << 15), (1 << 15) - 1, 0], size=(H, W)).astype(np.int32)
        pred = rng.integers(0, 256, (H, W)).astype(np.uint16)
        ref = oracle.inv_txfm2d_add(coeffs, pred, 0, 8)
        got = inverse_transform_add(coeffs[None], pred[None], int(tx_size), 0, 8)[0]
        assert np.array_equal(got, ref), TxSize(tx_size).name


def test_roundtrip_energy():
    """Oracle-free sanity: fwd->inv reproduces the residual to quant noise."""
    rng = np.random.default_rng(3)
    for tx_size in (TxSize.TX_4X4, TxSize.TX_8X8, TxSize.TX_16X16):
        H, W = int(TX_HEIGHT[tx_size]), int(TX_WIDTH[tx_size])
        res = rng.integers(-100, 100, (1, H, W)).astype(np.int16)
        coeffs = forward_transform_2d(res, int(tx_size), 0, 8)
        pred = np.full((1, H, W), 128, dtype=np.uint16)
        recon = inverse_transform_add(coeffs, pred, int(tx_size), 0, 8)
        err = recon.astype(int) - 128 - res
        assert np.abs(err).max() <= 2, (tx_size, np.abs(err).max())
