"""Device residual commit (ops/commit.py) parity tests.

The device commit must be bit-exact against the host C walk: same packed
quantized coefficients (hence byte-identical bitstreams) and the same
reconstruction. Kernel-level parity (convolve / jnt / quantize / RDOQ) is
checked against the numpy golden models that are themselves oracle-tested
against the reference C (SURVEY §4 pattern: golden vectors, bit-exact
compare).
"""

import numpy as np
import pytest

from svt_av1_psy_tpu.codec.coeff_coding import TX_TYPE_CLASS, _scan_and_off2d
from svt_av1_psy_tpu.codec.convolve import convolve_2d_sr
from svt_av1_psy_tpu.codec.quant import (TX_SCALE, build_plane_quant,
                                         eob_fast_trim, quantize_b)
from svt_av1_psy_tpu.codec.spec_tables import get_tables
from svt_av1_psy_tpu.ops import commit as dc


def _f8():
    return np.asarray(get_tables()._raw["interp_sub_pel_filters_8"], np.int32)


def _qp_row(pq):
    return [pq.zbin[0], pq.zbin[1], pq.round[0], pq.round[1], pq.quant[0],
            pq.quant[1], pq.quant_shift[0], pq.quant_shift[1],
            pq.dequant[0], pq.dequant[1]]


@pytest.mark.parametrize("bd", [8, 10])
def test_conv2d_batched_all_phases(bd):
    """The unified 2D kernel must match the 4-path numpy convolve for all
    (x, y) phase combinations, including the integer-MV copy path."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    peak = (1 << bd) - 1
    W = H = 8
    phx = np.repeat(np.arange(8) * 2, 8)
    phy = np.tile(np.arange(8) * 2, 8)
    B = len(phx)
    patches = rng.integers(0, peak, (B, H + 7, W + 7)).astype(np.int32)
    f8 = _f8()
    out = np.asarray(dc._conv2d_batched(jnp.asarray(patches),
                                        jnp.asarray(f8[phx]),
                                        jnp.asarray(f8[phy]), W, H, bd))
    for i in range(B):
        ref = convolve_2d_sr(patches[i][None], W, H, int(phx[i]),
                             int(phy[i]), bd=bd)[0]
        assert np.array_equal(ref.astype(np.int64), out[i].astype(np.int64)), \
            (phx[i], phy[i])


def test_jnt_compound_parity():
    """jnt convolve + COMPOUND_AVERAGE vs the numpy compound model."""
    import jax.numpy as jnp

    from svt_av1_psy_tpu.codec import compound as cmp

    rng = np.random.default_rng(1)
    bd, W, H, B = 8, 16, 8, 16
    f8 = _f8()
    p0 = rng.integers(0, 255, (B, H + 7, W + 7)).astype(np.int32)
    phx = rng.integers(0, 8, B) * 2
    phy = rng.integers(0, 8, B) * 2
    b0 = np.asarray(dc._jnt_conv_batched(jnp.asarray(p0), jnp.asarray(f8[phx]),
                                         jnp.asarray(f8[phy]), W, H, bd))
    for i in range(B):
        ref = cmp.jnt_conv(p0[i], W, H, f8[phx[i]], f8[phy[i]],
                           int(phx[i]), int(phy[i]), bd)
        assert np.array_equal(ref, b0[i].astype(np.int64))
    avg = np.asarray(dc._compound_avg(jnp.asarray(b0), jnp.asarray(b0[::-1]),
                                      bd))
    R0, R1, FB = 3, 7, 7
    offset_bits = bd + 2 * FB - R0
    round_offset = (1 << (offset_bits - R1)) + (1 << (offset_bits - R1 - 1))
    tmp = ((b0.astype(np.int64) + b0[::-1]) >> 1) - round_offset
    tmp = (tmp + (1 << (2 * FB - R0 - R1 - 1))) >> (2 * FB - R0 - R1)
    assert np.array_equal(np.clip(tmp, 0, 255), avg.astype(np.int64))


@pytest.mark.parametrize("ts,qml", [(1, 8), (3, 5), (4, None)])
def test_quantize_rdoq_parity(ts, qml):
    """uint32 device quantizer + RDOQ trim vs the int64 numpy oracle,
    covering log_scale 0/1/2 and QM weighting."""
    import jax.numpy as jnp

    from svt_av1_psy_tpu.codec.constants import TX_HEIGHT, TX_WIDTH
    from svt_av1_psy_tpu.codec.qm import get_qm

    rng = np.random.default_rng(2)
    w, h = int(TX_WIDTH[ts]), int(TX_HEIGHT[ts])
    n = min(w, 32) * min(h, 32)
    B = 16
    flat = rng.normal(0, 3000, (B, n)).astype(np.int32)
    flat[rng.random((B, n)) < 0.6] = 0
    scan, _ = _scan_and_off2d(ts, 0, int(TX_TYPE_CLASS[0]))
    scan = np.asarray(scan, np.int32)
    qm = iqm = None
    if qml is not None:
        qm, iqm = get_qm(qml, 0, ts)
    log_scale = int(TX_SCALE[ts])
    qp = np.zeros((B, 10), np.int32)
    pqs = []
    for i in range(B):
        pq = build_plane_quant(int(rng.integers(1, 250)), 0, 0, 8, 1, 100)
        pqs.append(pq)
        qp[i] = _qp_row(pq)
    qmj = None if qm is None else jnp.asarray(np.asarray(qm, np.int32))
    iqmj = None if iqm is None else jnp.asarray(np.asarray(iqm, np.int32))
    qc_d, dqc_d = dc._quantize_batched(jnp.asarray(flat), jnp.asarray(qp),
                                       qmj, iqmj, log_scale, n)
    eob_d = dc._eob_batched(qc_d, jnp.asarray(scan))
    tr = dc._rdoq_trim(jnp.asarray(flat), qc_d, dqc_d, eob_d,
                       jnp.asarray(qp), jnp.asarray(scan), log_scale)
    qc_d, dqc_d, eob_d = np.asarray(qc_d), np.asarray(dqc_d), np.asarray(eob_d)
    qc_t, dqc_t, eob_t = (np.asarray(x) for x in tr)
    for i in range(B):
        qc_r, dqc_r, eob_r = quantize_b(
            flat[i : i + 1].astype(np.int64), scan, pqs[i], ts,
            qm=None if qm is None else np.asarray(qm),
            iqm=None if iqm is None else np.asarray(iqm))
        assert np.array_equal(qc_r[0], qc_d[i])
        assert np.array_equal(dqc_r[0], dqc_d[i])
        assert eob_r[0] == eob_d[i]
        qq, dd = qc_r[0].copy(), dqc_r[0].copy()
        e2 = eob_fast_trim(flat[i], qq, dd, int(eob_r[0]), scan, pqs[i], ts)
        assert np.array_equal(qq, qc_t[i])
        assert np.array_equal(dd, dqc_t[i])
        assert e2 == eob_t[i]


def _encode(commit, W=176, H=144, n=4, preset=10, bd=8, seed=3, **kw):
    from svt_av1_psy_tpu.api import Encoder
    from svt_av1_psy_tpu.config import EncoderConfig

    rng = np.random.default_rng(seed)
    peak = (1 << bd) - 1
    dt = np.uint8 if bd == 8 else np.uint16
    base = (np.cumsum(rng.normal(0, 4 * peak / 255, (H, W + 4 * n)), axis=1)
            + peak / 2).clip(0, peak)
    frames = [np.clip(base[:, i * 2 : i * 2 + W]
                      + rng.normal(0, 3 * peak / 255, (H, W)), 0, peak)
              .astype(dt) for i in range(n)]
    ch, cw = (H + 1) // 2, (W + 1) // 2
    u = np.full((ch, cw), (1 << bd) // 2 - 6, dt)
    cfg = EncoderConfig(width=W, height=H, input_depth=bd, preset=preset,
                        recon_enabled=True, commit_backend=commit, **kw)
    cfg.qp = 40
    enc = Encoder(cfg).init()
    for i, y in enumerate(frames):
        enc.send_picture(y, u, u.copy(), pts=i)
    enc.flush()
    pkts = []
    while (p := enc.get_packet()) is not None:
        pkts.append(p)
    return pkts


def _assert_identical(a, b):
    assert b"".join(p.data for p in a) == b"".join(p.data for p in b)
    for pa, pb in zip(a, b):
        assert (pa.recon is None) == (pb.recon is None)
        if pa.recon is not None:
            for x, y in zip(pa.recon, pb.recon):
                assert np.array_equal(x, y)


def test_e2e_device_commit_identical():
    """Full encode: device-commit stream + recon byte-identical to host."""
    _assert_identical(_encode("host"), _encode("device"))


@pytest.mark.slow
@pytest.mark.parametrize("kw", [dict(preset=8), dict(bd=10),
                                dict(W=100, H=82), dict(preset=6)])
def test_e2e_device_commit_identical_matrix(kw):
    _assert_identical(_encode("host", **kw), _encode("device", **kw))
