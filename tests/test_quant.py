"""Quantizer bit-exactness vs the reference C kernel (QuantAsmTest analog)."""

import ctypes

import numpy as np
import pytest

import oracle
from svt_av1_psy_tpu.codec.constants import TX_HEIGHT, TX_WIDTH, TxSize
from svt_av1_psy_tpu.codec.quant import TX_SCALE, build_plane_quant, quantize_b
from svt_av1_psy_tpu.codec.spec_tables import get_tables

requires_oracle = pytest.mark.skipif(not oracle.available, reason="oracle not built")

_I16P = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
_I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_U16P = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")


def oracle_quantize(coeffs, scan, iscan, pq, log_scale):
    lib = oracle._lib
    fn = lib.svt_aom_highbd_quantize_b_c
    fn.argtypes = [_I32P, ctypes.c_ssize_t, _I16P, _I16P, _I16P, _I16P, _I32P,
                   _I32P, _I16P, np.ctypeslib.ndpointer(np.uint16), _I16P, _I16P,
                   ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32]
    fn.restype = None
    n = len(coeffs)
    mk = lambda pair: np.array(list(pair) + [pair[1]] * 6, dtype=np.int16)
    qcoeff = np.zeros(n, np.int32)
    dqcoeff = np.zeros(n, np.int32)
    eob = np.zeros(1, np.uint16)
    fn(np.ascontiguousarray(coeffs, np.int32), n, mk(pq.zbin), mk(pq.round),
       mk(pq.quant), mk(pq.quant_shift), qcoeff, dqcoeff, mk(pq.dequant), eob,
       np.ascontiguousarray(scan, np.int16), np.ascontiguousarray(iscan, np.int16),
       None, None, log_scale)
    return qcoeff, dqcoeff, int(eob[0])


@requires_oracle
@pytest.mark.parametrize("tx_size", [0, 1, 2, 3, 4, 5, 8, 9, 12, 13, 16],
                         ids=lambda s: TxSize(s).name)
@pytest.mark.parametrize("qindex", [1, 20, 60, 120, 200, 255])
def test_quantize_bit_exact(tx_size, qindex):
    t = get_tables()
    rng = np.random.default_rng(qindex * 19 + tx_size)
    W, H = int(TX_WIDTH[tx_size]), int(TX_HEIGHT[tx_size])
    cw, ch = min(W, 32), min(H, 32)
    n = cw * ch
    scan = t.scan(tx_size, 0)
    iscan = t.iscan(tx_size, 0)
    pq = build_plane_quant(qindex, 0, 0, 8)
    log_scale = int(TX_SCALE[tx_size])
    for scale in (50, 2000, 60000):
        coeffs = rng.integers(-scale, scale, n).astype(np.int32)
        ref_q, ref_dq, ref_eob = oracle_quantize(coeffs, scan, iscan, pq, log_scale)
        got_q, got_dq, got_eob = quantize_b(coeffs[None], scan, pq, tx_size)
        assert np.array_equal(got_q[0], ref_q)
        assert np.array_equal(got_dq[0], ref_dq)
        assert got_eob[0] == ref_eob


@requires_oracle
def test_quantize_sharpness_changes_deadzone():
    """PSY sharpness narrows the zbin (more coeffs survive) for qindex<base."""
    pq0 = build_plane_quant(100, 0, 0, 8, sharpness=0, base_qindex=150)
    pq7 = build_plane_quant(100, 0, 0, 8, sharpness=7, base_qindex=150)
    assert pq7.zbin[1] < pq0.zbin[1]
    assert pq7.round[1] > pq0.round[1]


def test_dequant_matches_quantize_output():
    from svt_av1_psy_tpu.codec.quant import dequant_coeffs

    t = get_tables()
    rng = np.random.default_rng(5)
    pq = build_plane_quant(120, 0, 0, 8)
    coeffs = rng.integers(-5000, 5000, (4, 256)).astype(np.int32)
    qc, dqc, eob = quantize_b(coeffs, t.scan(2, 0), pq, 2)
    assert np.array_equal(dequant_coeffs(qc, pq, 2), dqc)
