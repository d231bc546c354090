"""MFMV / use_ref_frame_mvs (spec 7.9, 7.10.2.5, 7.20).

Temporal MV projection: coded frames save an 8x8 motion field
(av1_copy_frame_mvs, coding_loop.c:1209); later frames project up to 3
reference fields onto their own grid (av1_setup_motion_field,
md_config_process.c:513) and the MV-stack temporal scan consumes the
result (add_tpl_ref_mv, adaptive_mv_pred.c:337).  The decoder runs the
identical process, so streams must stay dav1d bit-exact with the scan
active in search and walks.
"""

import numpy as np
import pytest

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.codec import mfmv
from svt_av1_psy_tpu.codec.mv_pred import MiGrid
from svt_av1_psy_tpu.config import EncoderConfig
from svt_av1_psy_tpu.io import dav1d


# ------------------------------------------------------------ unit: math
def test_mv_projection_known_values():
    # num/den scaling in Q14: mv * num * div_mult[den] >> 14, sym rounding
    r, c = mfmv.mv_projection(64, -64, 1, 2)      # half distance
    assert (int(r), int(c)) == (32, -32)
    r, c = mfmv.mv_projection(7, -7, 1, 3)        # 7/3 rounds to 2
    assert (int(r), int(c)) == (2, -2)
    r, c = mfmv.mv_projection(100, 100, -1, 4)    # negative num flips sign
    assert (int(r), int(c)) == (-25, -25)
    # clamp at +/- (1<<14)-1
    r, c = mfmv.mv_projection(4000, 4000, 31, 1)
    assert int(r) == mfmv.MV_CLAMP and int(c) == mfmv.MV_CLAMP


def test_lower_mv_precision():
    assert mfmv.lower_mv_precision(5, -5, False, False) == (4, -4)
    assert mfmv.lower_mv_precision(5, -5, True, False) == (5, -5)
    assert mfmv.lower_mv_precision(4, -4, False, False) == (4, -4)
    # force integer: round to full pel, away from zero when |mod| > 4
    assert mfmv.lower_mv_precision(11, -11, True, True) == (8, -8)
    assert mfmv.lower_mv_precision(13, -13, True, True) == (16, -16)
    assert mfmv.lower_mv_precision(12, -12, True, True) == (8, -8)


def test_rel_dist_wraps():
    bits = 7
    assert mfmv.rel_dist(3, 1, bits) == 2
    assert mfmv.rel_dist(1, 3, bits) == -2
    assert mfmv.rel_dist(0, 127, bits) == 1     # wrap-around
    assert mfmv.rel_dist(127, 0, bits) == -1


# ------------------------------------------------------ unit: storage
def test_save_motion_field_samples_bottom_right_and_filters():
    g = MiGrid(6, 6)
    # 8x8 block at mi (0,0) pointing at LAST (past ref): stored
    g.set_block(0, 0, 2, 2, 1, (40, -40), 16)
    # block at (0,2) pointing at ALTREF (future, side=1): NOT stored
    g.set_block(0, 2, 2, 2, 7, (8, 8), 16)
    # block at (2,0) with |mv| over REFMVS_LIMIT: NOT stored
    g.set_block(2, 0, 2, 2, 1, (4096, 0), 16)
    # compound at (2,2): ref2 past -> idx 1 wins
    g.set_block(2, 2, 2, 2, 7, (1, 1), 24, ref_frame2=4, mv2=(-24, 24))
    side = np.zeros(8, np.int8)
    side[7] = 1   # ALTREF is future
    mf_ref, mf_row, mf_col = mfmv.save_motion_field(g, side, 6, 6)
    assert mf_ref.shape == (3, 3)
    assert (int(mf_ref[0, 0]), int(mf_row[0, 0]), int(mf_col[0, 0])) \
        == (1, 40, -40)
    assert int(mf_ref[0, 1]) == 0          # future ref filtered
    assert int(mf_ref[1, 0]) == 0          # REFMVS_LIMIT filtered
    assert (int(mf_ref[1, 1]), int(mf_row[1, 1]), int(mf_col[1, 1])) \
        == (4, -24, 24)                    # second ref wins


def test_projection_scatters_colocated_zero_mv():
    # a LAST frame one hint behind, whose field points one further back
    # with zero MVs: every unit projects onto itself with offset 1
    rows8 = cols8 = 4
    mf = (np.full((rows8, cols8), 1, np.int8),
          np.zeros((rows8, cols8), np.int16),
          np.zeros((rows8, cols8), np.int16))
    # saved ALTREF hint (3) != GOLDEN's hint (0) so the is_lst_overlay
    # rule (spec 7.9.2) does not suppress the LAST projection
    entry = dict(hint=1, ref_hints=(0, 0, 0, 0, 0, 0, 3), is_intra=False,
                 mi_rows=8, mi_cols=8, mf=mf)
    refs = {r: dict(hint=0, ref_hints=(0,) * 7, is_intra=True,
                    mi_rows=0, mi_cols=0, mf=None) for r in range(1, 8)}
    refs[1] = entry
    tr, tc, to = mfmv.setup_motion_field(8, 8, 2, 7, refs)
    assert (to == 1).all()
    assert (tr == 0).all() and (tc == 0).all()


# --------------------------------------------------------------- e2e
def _clip(n=9, W=176, H=144, seed=7, amp=4):
    rng = np.random.default_rng(seed)
    base = (np.cumsum(rng.normal(0, amp, (H, W + 3 * n)), axis=1)
            + 128).clip(0, 255)
    ys = [np.clip(base[:, 3 * i:3 * i + W] + rng.normal(0, 2, (H, W)),
                  0, 255).astype(np.uint8) for i in range(n)]
    u = np.full((H // 2, W // 2), 120, np.uint8)
    v = np.full((H // 2, W // 2), 136, np.uint8)
    return ys, u, v


def _encode(ys, u, v, W, H, mfmv_knob=-1, preset=8, bits=8, **kw):
    cfg = EncoderConfig(width=W, height=H, preset=preset,
                        recon_enabled=True, **kw)
    cfg.qp = 40
    cfg.enable_mfmv = mfmv_knob
    if bits == 10:
        cfg.input_depth = 10
    enc = Encoder(cfg).init()
    for i, y in enumerate(ys):
        enc.send_picture(y, u.copy(), v.copy(), pts=i)
    enc.flush()
    pkts = []
    while (p := enc.get_packet()) is not None:
        pkts.append(p)
    return pkts


def _assert_dav1d_exact(pkts, W, H):
    stream = b"".join(p.data for p in pkts)
    disp = [p for p in pkts if p.recon is not None]
    assert disp
    for i, p in enumerate(disp):
        d = dav1d.decode_nth(stream, i, W, H)
        for j in range(3):
            assert np.array_equal(d[j], p.recon[j]), \
                f"frame {i} plane {j} mismatch"
    return stream


@pytest.mark.parametrize("preset", [6, 8])
def test_mfmv_hierarchical_dav1d_bit_exact(preset):
    if not dav1d.available():
        pytest.skip("dav1d not available")
    from svt_av1_psy_tpu.codec import mfmv as mf

    W, H = 176, 144
    ys, u, v = _clip()
    # instrument at the projection level (backend-independent: the
    # temporal scan itself may run in the Python stacks or the C walk)
    projected = [0]
    orig = mf.setup_motion_field

    def counted(*a, **k):
        out = orig(*a, **k)
        projected[0] += int((out[2] > 0).sum())
        return out

    mf.setup_motion_field = counted
    try:
        pkts = _encode(ys, u, v, W, H, mfmv_knob=-1, preset=preset)
    finally:
        mf.setup_motion_field = orig
    assert projected[0] > 0, "no temporal MVs were ever projected"
    _assert_dav1d_exact(pkts, W, H)


def test_mfmv_low_delay_dav1d_bit_exact():
    if not dav1d.available():
        pytest.skip("dav1d not available")
    from svt_av1_psy_tpu.config import PredStructure

    W, H = 176, 144
    ys, u, v = _clip(n=6)
    pkts = _encode(ys, u, v, W, H, mfmv_knob=-1,
                   pred_structure=PredStructure.LOW_DELAY)
    _assert_dav1d_exact(pkts, W, H)


def test_mfmv_10bit_dav1d_bit_exact():
    if not dav1d.available():
        pytest.skip("dav1d not available")
    W, H = 176, 144
    ys8, _, _ = _clip(n=6)
    ys = [(y.astype(np.uint16) << 2) for y in ys8]
    u = np.full((H // 2, W // 2), 480, np.uint16)
    v = np.full((H // 2, W // 2), 544, np.uint16)
    pkts = _encode(ys, u, v, W, H, mfmv_knob=-1, bits=10)
    _assert_dav1d_exact(pkts, W, H)


def test_mfmv_off_knob_disables_header_bit():
    W, H = 176, 144
    ys, u, v = _clip(n=5)
    from svt_av1_psy_tpu.bitstream.obu_parser import parse_sequence_header

    pkts_off = _encode(ys, u, v, W, H, mfmv_knob=0)
    stream = b"".join(p.data for p in pkts_off)
    # sequence header: enable_ref_frame_mvs must be 0 when the knob is off
    seq = parse_sequence_header(stream)
    assert seq.get("enable_ref_frame_mvs", 0) == 0
    if dav1d.available():
        _assert_dav1d_exact(pkts_off, W, H)


def test_mfmv_odd_dims_dav1d_bit_exact():
    # odd mi rounding: (mi_rows+1)>>1 vs mi_rows>>1 paths in projection
    if not dav1d.available():
        pytest.skip("dav1d not available")
    W, H = 154, 98
    ys, _, _ = _clip(n=6, W=W, H=H)
    u = np.full(((H + 1) // 2, (W + 1) // 2), 120, np.uint8)
    v = np.full(((H + 1) // 2, (W + 1) // 2), 136, np.uint8)
    pkts = _encode(ys, u, v, W, H, mfmv_knob=-1)
    _assert_dav1d_exact(pkts, W, H)
