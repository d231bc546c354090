"""Device (jnp) transform kernels vs the numpy golden model (bit-exact).

Kept small: each (size, type) pair is a separate XLA compile and this host
has one core. The numpy model is itself oracle-verified across the full
matrix (test_transforms.py), so a sample here suffices; run the full sweep
with -m slow.
"""

import numpy as np
import pytest

from svt_av1_psy_tpu.codec.constants import TX_HEIGHT, TX_WIDTH, TxSize
from svt_av1_psy_tpu.codec.transforms import (
    forward_transform_2d as fwd_np,
    inverse_transform_add as inv_np,
    tx_types_for_size,
)
from svt_av1_psy_tpu.ops.txfm import (
    forward_transform_2d as fwd_jax,
    inverse_transform_add as inv_jax,
)

FAST = [(0, 0), (0, 3), (1, 9), (3, 0), (5, 1)]  # (tx_size, tx_type)
SLOW = [(ts, int(tt)) for ts in range(19) for tt in tx_types_for_size(ts)]


def _roundtrip(tx_size, tt, bd=8):
    rng = np.random.default_rng(tx_size * 16 + tt)
    H, W = int(TX_HEIGHT[tx_size]), int(TX_WIDTH[tx_size])
    res = rng.integers(-255, 256, (4, H, W)).astype(np.int32)
    ref_f = fwd_np(res, tx_size, tt, bd)
    got_f = np.asarray(fwd_jax(res, tx_size, tt))
    assert np.array_equal(ref_f, got_f), ("fwd", TxSize(tx_size).name, tt)
    pred = rng.integers(0, 256, (4, H, W)).astype(np.uint16)
    ref_i = inv_np(ref_f, pred, tx_size, tt, bd)
    got_i = np.asarray(inv_jax(ref_f, pred.astype(np.int32), tx_size, tt, bd))
    assert np.array_equal(ref_i.astype(np.int32), got_i), ("inv", TxSize(tx_size).name, tt)


@pytest.mark.parametrize("tx_size,tt", FAST,
                         ids=lambda p: str(p))
def test_device_matches_numpy_sample(tx_size, tt):
    _roundtrip(tx_size, tt)


@pytest.mark.slow
@pytest.mark.parametrize("tx_size,tt", SLOW)
def test_device_matches_numpy_full(tx_size, tt):
    _roundtrip(tx_size, tt)
