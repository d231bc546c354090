"""Native MC/ME kernels must be bit-identical to the numpy reference path."""

import numpy as np
import pytest

from svt_av1_psy_tpu.codec import mc_native
from svt_av1_psy_tpu.codec.convolve import convolve_2d_sr

requires_native = pytest.mark.skipif(not mc_native.available(), reason="no C toolchain")


@requires_native
@pytest.mark.parametrize("bd", [8, 10])
@pytest.mark.parametrize("w,h", [(4, 4), (8, 16), (32, 32), (64, 32)])
def test_convolve_block_matches_numpy(w, h, bd):
    rng = np.random.default_rng(w * h + bd)
    peak = (1 << bd) - 1
    patch = rng.integers(0, peak + 1, (h + 7, w + 7)).astype(np.int32)
    for sx, sy in [(0, 0), (6, 0), (0, 10), (6, 10), (8, 8), (15, 1)]:
        ref = convolve_2d_sr(patch[None], w, h, sx, sy, bd=bd)[0]
        got = mc_native.convolve_block(patch, w, h, sx, sy, bd=bd)
        assert np.array_equal(ref, got), (w, h, sx, sy, bd)


@requires_native
def test_subpel_sad_matches():
    rng = np.random.default_rng(3)
    w, h = 16, 16
    patch = rng.integers(0, 256, (h + 7, w + 7)).astype(np.int32)
    cur = rng.integers(0, 256, (h, w)).astype(np.int32)
    for sx, sy in [(0, 0), (4, 0), (0, 12), (7, 9)]:
        pred = convolve_2d_sr(patch[None], w, h, sx, sy)[0].astype(np.int32)
        want = int(np.abs(cur - pred).sum())
        assert mc_native.subpel_sad(patch, cur, w, h, sx, sy) == want


@requires_native
def test_sad_grid_matches_bruteforce():
    rng = np.random.default_rng(5)
    ref = rng.integers(0, 256, (64, 80)).astype(np.int32)
    cur = ref[20:36, 30:46] + rng.integers(-2, 3, (16, 16))
    dy, dx, sad = mc_native.sad_grid(cur.astype(np.int32), ref, 10, 40, 20, 60)
    best = (None, None, 1 << 62)
    for yy in range(10, 40):
        for xx in range(20, 60):
            s = int(np.abs(ref[yy : yy + 16, xx : xx + 16] - cur).sum())
            if s < best[2]:
                best = (yy, xx, s)
    assert (dy, dx, sad) == best


@requires_native
def test_quantize_txb_matches_python():
    from svt_av1_psy_tpu.codec import quant as Q
    from svt_av1_psy_tpu.codec.qm import get_qm
    from svt_av1_psy_tpu.codec.spec_tables import get_tables

    t = get_tables()
    rng = np.random.default_rng(0)
    for trial in range(60):
        tx = int(rng.integers(0, 19))
        n = min(int(Q.TX_WIDTH[tx]), 32) * min(int(Q.TX_HEIGHT[tx]), 32)
        scan = t.scan(tx, 0)
        q = int(rng.integers(1, 256))
        pq = Q.build_plane_quant(q, int(rng.integers(-10, 10)),
                                 int(rng.integers(-10, 10)), 8,
                                 int(rng.integers(-7, 8)), q)
        coeffs = rng.normal(0, 3000, (1, n)).astype(np.int64)
        qm = iqm = None
        if trial % 3 == 0:
            qm, iqm = get_qm(int(rng.integers(0, 15)), trial % 2 == 0, tx)
        # batch of 2 bypasses the single-txb C fast path -> pure python ref
        c2 = np.vstack([coeffs, coeffs])
        qc_py, dqc_py, eob_py = Q.quantize_b(c2, scan, pq, tx, qm=qm, iqm=iqm)
        r = mc_native.quantize_txb(coeffs[0], scan, pq, int(Q.TX_SCALE[tx]),
                                   qm, iqm)
        qc_c, dqc_c, eob_c = r
        assert np.array_equal(qc_py[0], qc_c), (trial, tx)
        assert np.array_equal(dqc_py[0], dqc_c)
        assert int(eob_py[0]) == eob_c
