"""RD-brain tests: device-search decisions drive a conformant encode
(dav1d bit-exact), device and numpy search backends agree, and the RDO
actually pays (smaller streams at comparable quality than fixed 32x32
SSE-only decisions)."""

import numpy as np
import pytest

from svt_av1_psy_tpu.bitstream.obu import (
    FrameParams,
    SequenceParams,
    frame_obu,
    sequence_header_obu,
    temporal_delimiter_obu,
)
from svt_av1_psy_tpu.codec.intra_encoder import IntraFrameEncoder
from svt_av1_psy_tpu.codec.intra_rdo import search_intra_decisions
from svt_av1_psy_tpu.io import dav1d

requires_dav1d = pytest.mark.skipif(not dav1d.available(), reason="dav1d shim unavailable")


def _content(rng, W, H):
    y = (np.cumsum(rng.normal(0, 5, (H, W)), axis=1)
         + np.cumsum(rng.normal(0, 3, (H, W)), axis=0) + 128).clip(0, 255).astype(np.uint8)
    # structured areas: flat gradient + edges + texture
    y[: H // 4, : W // 4] = np.add.outer(np.linspace(30, 90, H // 4),
                                         np.linspace(0, 50, W // 4)).astype(np.uint8)
    y[:: 8, :] = 200
    ch, cw = (H + 1) // 2, (W + 1) // 2
    u = (np.cumsum(rng.normal(0, 4, (ch, cw)), axis=1) + 128).clip(0, 255).astype(np.uint8)
    v = np.full((ch, cw), 128, np.uint8)
    return y, u, v


def _pad64(y, W, H):
    ph, pw = -(-H // 64) * 64, -(-W // 64) * 64
    p = np.zeros((ph, pw), np.uint16)
    p[:H, :W] = y
    p[:H, W:] = p[:H, W - 1: W]
    p[H:, :] = p[H - 1: H, :]
    return p


def _encode_decode_rdo(W, H, q, mono, seed, depths=(8, 16, 32),
                       tx_depths=(8, 16)):
    rng = np.random.default_rng(seed)
    y, u, v = _content(rng, W, H)
    dec = search_intra_decisions(_pad64(y, W, H), q, 8, depths=depths,
                                 tx_search_depths=tx_depths)
    sp = SequenceParams(W, H, still_picture=True, reduced_still_picture_header=True,
                        monochrome=mono, color_range=1)
    enc = IntraFrameEncoder(W, H, q, monochrome=mono, decisions=dec)
    tile = enc.encode_frame(y, None if mono else u, None if mono else v)
    stream = (temporal_delimiter_obu() + sequence_header_obu(sp)
              + frame_obu(sp, FrameParams(base_q_idx=q), [tile]))
    out = dav1d.decode(stream, W, H)
    return enc, out, (y, u, v), len(stream)


@requires_dav1d
@pytest.mark.parametrize("dims,q,mono,seed", [
    ((128, 128), 100, True, 1),
    ((192, 128), 60, False, 2),     # 4:2:0 with CFL on RDO partitions
    ((100, 80), 120, True, 3),      # forced edge partitions + RDO interior
    ((128, 64), 200, True, 4),      # high q -> mostly skip, large leaves
])
def test_rdo_recon_matches_dav1d(dims, q, mono, seed):
    W, H = dims
    enc, dec, _src, _size = _encode_decode_rdo(W, H, q, mono, seed)
    assert np.array_equal(dec[0], enc.recon_y), "luma recon mismatch"
    if not mono:
        assert np.array_equal(dec[1], enc.recon_plane(1)), "U recon mismatch"
        assert np.array_equal(dec[2], enc.recon_plane(2)), "V recon mismatch"


@requires_dav1d
def test_rdo_64_leaf_conformant():
    enc, dec, _src, _size = _encode_decode_rdo(
        128, 128, 180, True, 5, depths=(16, 32, 64), tx_depths=(16,))
    assert np.array_equal(dec[0], enc.recon_y)


@requires_dav1d
def test_rdo_improves_rd_tradeoff():
    """The whole point: RDO streams must beat fixed-32x32 SSE decisions on
    the rate-distortion tradeoff (smaller at equal-or-better PSNR, or much
    smaller at slightly lower PSNR -> compare RD cost at the search lambda)."""
    from svt_av1_psy_tpu.codec.rd import lambda_sse_per_bit

    W, H, q = 192, 192, 100
    rng = np.random.default_rng(9)
    y, _, _ = _content(rng, W, H)
    sp = SequenceParams(W, H, still_picture=True, reduced_still_picture_header=True,
                        monochrome=True, color_range=1)

    def rd_point(decisions):
        enc = IntraFrameEncoder(W, H, q, monochrome=True, decisions=decisions)
        tile = enc.encode_frame(y)
        stream = (temporal_delimiter_obu() + sequence_header_obu(sp)
                  + frame_obu(sp, FrameParams(base_q_idx=q), [tile]))
        dy, _, _ = dav1d.decode(stream, W, H)
        sse = float(((dy.astype(np.int64) - y) ** 2).sum())
        return sse, len(stream) * 8

    dec = search_intra_decisions(_pad64(y, W, H), q, 8)
    sse_rdo, bits_rdo = rd_point(dec)
    sse_fix, bits_fix = rd_point(None)
    lam = lambda_sse_per_bit(q, 8, "kf")
    assert sse_rdo + lam * bits_rdo < sse_fix + lam * bits_fix, (
        f"RDO cost {sse_rdo + lam * bits_rdo:.0f} not better than fixed "
        f"{sse_fix + lam * bits_fix:.0f} (sse {sse_rdo:.0f} vs {sse_fix:.0f}, "
        f"bits {bits_rdo} vs {bits_fix})")


def test_search_backends_agree():
    """XLA and numpy search paths must produce identical decisions."""
    rng = np.random.default_rng(11)
    y = (np.cumsum(rng.normal(0, 6, (128, 128)), axis=1) + 128).clip(0, 255).astype(np.uint16)
    a = search_intra_decisions(y, 90, 8, backend="numpy")
    b = search_intra_decisions(y, 90, 8, backend="device_all")
    for S in a.modes:
        assert np.array_equal(a.modes[S], b.modes[S]), f"modes differ at {S}"
        assert np.array_equal(a.tx_types[S], b.tx_types[S]), f"tx differ at {S}"
    for S in a.parts:
        assert np.array_equal(a.parts[S], b.parts[S]), f"parts differ at {S}"


def test_lambda_monotone():
    from svt_av1_psy_tpu.codec.rd import lambda_sse_per_bit, rd_mult

    lams = [lambda_sse_per_bit(q, 8, "kf") for q in (20, 60, 120, 200, 255)]
    assert all(b > a for a, b in zip(lams, lams[1:]))
    assert rd_mult(100, 10) > 0 and rd_mult(100, 12) > 0


@requires_dav1d
@pytest.mark.xfail(reason="1-D tx (V_/H_*): POSITIVE coefficients decode "
                   "bit-exactly, NEGATIVE ones sign-flip in both dav1d and "
                   "libaom while the reference's own scalar inverse kernel "
                   "agrees with ours; excluded from search sets until the "
                   "sign-path corner is found", strict=False)
def test_1d_tx_types_conformant():
    from svt_av1_psy_tpu.codec.constants import TxType
    from svt_av1_psy_tpu.codec.intra_rdo import IntraDecisions
    from svt_av1_psy_tpu.codec.transforms import inverse_transform_add

    pred = np.full((8, 8), 128, np.uint16)
    c = np.zeros((1, 8, 8), np.int32)
    c[0][3, 0] = -400
    target = inverse_transform_add(c, pred[None], 1, int(TxType.V_DCT), 8)[0]
    y = np.asarray(target).astype(np.uint8)
    dec = IntraDecisions(max_leaf=8)
    dec.modes[8] = np.zeros((1, 1), np.int32)
    dec.tx_types[8] = np.full((1, 1), int(TxType.V_DCT), np.int32)
    sp = SequenceParams(8, 8, still_picture=True, reduced_still_picture_header=True,
                        monochrome=True, color_range=1)
    enc = IntraFrameEncoder(8, 8, 40, monochrome=True, decisions=dec)
    tile = enc.encode_frame(y)
    stream = (temporal_delimiter_obu() + sequence_header_obu(sp)
              + frame_obu(sp, FrameParams(base_q_idx=40), [tile]))
    dy, _, _ = dav1d.decode(stream, 8, 8)
    assert np.array_equal(dy, enc.recon_y)


@requires_dav1d
def test_fi_search_conformant():
    # regression: FIMODE_TO_INTRADIR[FILTER_D157] must map to D157_PRED(6),
    # not D203(7) — the wrong intra_ext_tx cdf row desynced dav1d on the
    # first D157 filter-intra win (fimode_to_intradir, common_utils.h:108)
    rng = np.random.default_rng(5)
    W = H = 128
    y = (np.cumsum(rng.normal(0, 4, (H, W)), axis=1) + 120).clip(0, 255).astype(np.uint8)
    dec = search_intra_decisions(_pad64(y, W, H), 140, 8, depths=(8, 16, 32),
                                 tx_search_depths=())
    sp = SequenceParams(W, H, still_picture=True, reduced_still_picture_header=True,
                        monochrome=True, color_range=1, enable_filter_intra=True)
    enc = IntraFrameEncoder(W, H, 140, monochrome=True, decisions=dec,
                            enable_filter_intra=True, filter_intra_search=True)
    tile = enc.encode_frame(y)
    stream = (temporal_delimiter_obu() + sequence_header_obu(sp)
              + frame_obu(sp, FrameParams(base_q_idx=140), [tile]))
    dy, _, _ = dav1d.decode(stream, W, H)
    assert np.array_equal(dy, enc.recon_y)


def test_rdo_libaom_crosscheck():
    """Second conformance oracle: libaom (the reference's own E2E decoder)
    must also reproduce the encoder recon on an RDO stream."""
    from svt_av1_psy_tpu.io import aomdec

    if not aomdec.available():
        pytest.skip("libaom unavailable")
    enc, _dec, _src, _size = _encode_decode_rdo(128, 128, 90, True, 21)
    # rebuild the stream exactly as _encode_decode_rdo does
    rng = np.random.default_rng(21)
    y, u, v = _content(rng, 128, 128)
    d = search_intra_decisions(_pad64(y, 128, 128), 90, 8)
    sp = SequenceParams(128, 128, still_picture=True,
                        reduced_still_picture_header=True, monochrome=True,
                        color_range=1)
    e = IntraFrameEncoder(128, 128, 90, monochrome=True, decisions=d)
    tile = e.encode_frame(y)
    stream = (temporal_delimiter_obu() + sequence_header_obu(sp)
              + frame_obu(sp, FrameParams(base_q_idx=90), [tile]))
    ay, _, _ = aomdec.decode(stream, 128, 128)
    assert np.array_equal(ay, e.recon_y)
