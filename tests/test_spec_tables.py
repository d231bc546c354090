"""Spec-constant table integrity tests."""

import numpy as np

from svt_av1_psy_tpu.codec.spec_tables import get_tables
from svt_av1_psy_tpu.codec.constants import TxSize, TxType


def test_quant_lookup_known_values():
    t = get_tables()
    # AV1 spec dc_q/ac_q anchor values
    assert t.dc_q(0, 8) == 4 and t.ac_q(0, 8) == 4
    assert t.dc_q(255, 8) == 1336 and t.ac_q(255, 8) == 1828
    assert t.dc_q(0, 10) == 4 and t.ac_q(255, 10) == 7312
    # monotone non-decreasing
    for bd in (8, 10, 12):
        q = np.array([t.ac_q(i, bd) for i in range(256)])
        assert np.all(np.diff(q) >= 0)


def test_default_scan_4x4_is_zigzag():
    t = get_tables()
    s = t.scan(TxSize.TX_4X4, TxType.DCT_DCT)
    assert list(s) == [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]
    iscan = t.iscan(TxSize.TX_4X4, TxType.DCT_DCT)
    assert np.array_equal(np.sort(s), np.arange(16))
    assert np.array_equal(s[iscan], np.arange(16))


def test_scan_shapes_and_permutation():
    t = get_tables()
    from svt_av1_psy_tpu.codec.constants import TX_WIDTH, TX_HEIGHT

    for ts in range(19):
        for tt in range(16):
            s = t.scan(ts, tt)
            w, h = min(TX_WIDTH[ts], 32), min(TX_HEIGHT[ts], 32)
            assert len(s) == w * h, (ts, tt, len(s))
            assert np.array_equal(np.sort(s), np.arange(w * h))


def test_cdf_tables_well_formed():
    t = get_tables()
    # every cdf row: strictly decreasing icdf values ending at 0, counter 0
    for name in ["cdf_txb_skip", "cdf_coeff_base_multi", "cdf_coeff_base_eob_multi",
                 "cdf_coeff_lps_multi", "cdf_dc_sign", "cdf_kf_y_mode", "cdf_partition",
                 "cdf_uv_mode", "cdf_eob_multi16", "cdf_eob_multi1024"]:
        arr = getattr(t, name)
        flatrows = arr.reshape(-1, arr.shape[-1])
        for row in flatrows[:64]:
            vals = [v for v in row if v != 0]
            # icdf strictly decreasing until it hits the 0 terminator
            assert all(vals[i] > vals[i + 1] for i in range(len(vals) - 1)), (name, row)
            assert row[0] < 32768 or len(vals) == 0


def test_partition_cdf_symbol_counts():
    t = get_tables()
    p = t.cdf_partition
    assert p.shape == (20, 11)
    # icdf rows have nsym-1 nonzero entries (last symbol's icdf is 0 by defn)
    # 8x8 contexts: 4 symbols
    assert p[0, 2] > 0 and p[0, 3] == 0
    # mid contexts: 10 symbols
    assert p[4, 8] > 0 and p[4, 9] == 0
    # 128x128 contexts: 8 symbols
    assert p[16, 6] > 0 and p[16, 7] == 0
