"""Inter (P-frame) conformance tests: IPPP streams must decode bit-exactly."""

import numpy as np
import pytest

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.config import EncoderConfig
from svt_av1_psy_tpu.io import dav1d

requires_dav1d = pytest.mark.skipif(not dav1d.available(), reason="dav1d shim unavailable")


def _encode_seq(W, H, n, q, bd=8, tiles=(0, 0), vb=False, motion=(3, 5), keyint=-2, seed=0,
                me_backend="native"):
    rng = np.random.default_rng(seed)
    peak = (1 << bd) - 1
    dt = np.uint8 if bd == 8 else np.uint16
    base = (np.cumsum(rng.normal(0, peak / 50, (H + 64, W + 64)), axis=1)
            + np.cumsum(rng.normal(0, peak / 80, (H + 64, W + 64)), axis=0)
            + peak // 2).clip(0, peak).astype(dt)
    cfg = EncoderConfig(width=W, height=H, input_depth=bd, recon_enabled=True,
                        tile_columns=tiles[0], tile_rows=tiles[1],
                        enable_variance_boost=vb, intra_period_length=keyint,
                        inter_me_backend=me_backend)
    cfg.qp = q
    enc = Encoder(cfg).init()
    for i in range(n):
        y = base[16 + i * motion[0] : 16 + i * motion[0] + H,
                 16 + i * motion[1] : 16 + i * motion[1] + W].copy()
        u = (base[: (H + 1) // 2, : (W + 1) // 2] // 2 + peak // 4).astype(dt)
        enc.send_picture(y, u, u.copy(), pts=i)
    enc.flush()
    stream = b""
    recons = []
    while (pkt := enc.get_packet()) is not None:
        stream += pkt.data
        if pkt.recon is not None:      # display packets, in display order
            recons.append(pkt.recon)
    return stream, recons


def _check(stream, recons, W, H):
    for i in range(len(recons)):
        dy, du, dv = dav1d.decode_nth(stream, i, W, H)
        assert np.array_equal(dy, recons[i][0]), f"frame {i} luma"
        if recons[i][1] is not None:
            assert np.array_equal(du, recons[i][1]), f"frame {i} U"
            assert np.array_equal(dv, recons[i][2]), f"frame {i} V"


@requires_dav1d
@pytest.mark.parametrize("case", [
    dict(W=160, H=128, n=4, q=45),                      # basic IPPP with motion
    dict(W=128, H=96, n=3, q=40, bd=10),                 # 10-bit inter
    dict(W=192, H=128, n=3, q=45, tiles=(1, 0)),         # tiles
    dict(W=160, H=96, n=5, q=45, keyint=2),              # periodic key frames
    dict(W=102, H=74, n=3, q=45),                        # odd dims
    dict(W=128, H=128, n=3, q=50, vb=True),              # variance boost P-frames
    dict(W=160, H=128, n=3, q=45, motion=(0, 0)),        # static (skip-heavy)
])
def test_ipp_stream_conformant(case):
    W, H = case["W"], case["H"]
    kw = {k: v for k, v in case.items() if k not in ("W", "H")}
    stream, recons = _encode_seq(W, H, **kw)
    _check(stream, recons, W, H)


@requires_dav1d
def test_inter_beats_intra_rate():
    """P-frames of a panning scene must be much smaller than key frames."""
    stream, recons = _encode_seq(160, 128, 4, 45, seed=3)
    # extract per-TU sizes: re-encode tracking packet sizes
    rng = np.random.default_rng(3)
    base = (np.cumsum(rng.normal(0, 255 / 50, (128 + 64, 160 + 64)), axis=1)
            + np.cumsum(rng.normal(0, 255 / 80, (128 + 64, 160 + 64)), axis=0)
            + 127).clip(0, 255).astype(np.uint8)
    cfg = EncoderConfig(width=160, height=128, enable_variance_boost=False)
    cfg.qp = 45
    enc = Encoder(cfg).init()
    for i in range(4):
        y = base[16 + 3 * i : 144 + 3 * i, 16 + 5 * i : 176 + 5 * i].copy()
        u = np.full((64, 80), 120, np.uint8)
        enc.send_picture(y, u, u.copy())
    enc.flush()
    sizes = []
    while (pkt := enc.get_packet()) is not None:
        sizes.append(len(pkt.data))
    assert all(s < sizes[0] for s in sizes[1:]), sizes


@requires_dav1d
def test_device_inter_search_backend_conformant():
    """The device (ops/inter_search) decision backend — prefetched rows
    through the api pipeline + host subpel refine — must produce
    conformant streams with compression comparable to the native kernel."""
    stream, recons = _encode_seq(160, 128, 5, 45, seed=2,
                                 me_backend="device")
    _check(stream, recons, 160, 128)
    stream_n, _ = _encode_seq(160, 128, 5, 45, seed=2)
    assert len(stream) < len(stream_n) * 1.35, (len(stream), len(stream_n))


@requires_dav1d
@pytest.mark.parametrize("case", [
    # multi-depth partition RDO: preset <= 5 searches 16/32/64,
    # presets 6..9 search 32/64 (hierarchical GoP default structure)
    dict(W=192, H=128, n=5, q=40, preset=4),
    dict(W=160, H=96, n=4, q=45, preset=8),
    dict(W=130, H=94, n=4, q=45, preset=4),          # odd dims, forced edges
    dict(W=128, H=96, n=3, q=40, preset=4, bd=10),   # 10-bit
])
def test_inter_partition_rdo_conformant(case):
    rng = np.random.default_rng(11)
    W, H, n, bd = case["W"], case["H"], case["n"], case.get("bd", 8)
    peak = (1 << bd) - 1
    dt = np.uint8 if bd == 8 else np.uint16
    base = (np.cumsum(rng.normal(0, peak / 60, (H + 64, W + 64)), axis=1)
            + peak // 2).clip(0, peak).astype(dt)
    cfg = EncoderConfig(width=W, height=H, input_depth=bd,
                        recon_enabled=True, preset=case["preset"])
    cfg.qp = case["q"]
    enc = Encoder(cfg).init()
    yy, xx = np.mgrid[0:H, 0:W]
    for i in range(n):
        y = base[8 + i * 2 : 8 + i * 2 + H, 8 + i * 3 : 8 + i * 3 + W].copy()
        disc = ((xx - W // 3 - 9 * i) ** 2 + (yy - H // 2 - 4 * i) ** 2) < (H // 5) ** 2
        y[disc] = np.clip(3 * peak // 4 + xx[disc] - W // 3, 0, peak).astype(dt)
        u = (base[: (H + 1) // 2, : (W + 1) // 2] // 2 + peak // 4).astype(dt)
        enc.send_picture(y, u, u.copy(), pts=i)
    enc.flush()
    stream = b""
    recons = []
    while (pkt := enc.get_packet()) is not None:
        stream += pkt.data
        if pkt.recon is not None:
            recons.append(pkt.recon)
    _check(stream, recons, W, H)


def test_inter_partition_dp_mixes_sizes():
    """The DP must actually choose a mixed tree on mixed content (and the
    chosen leaves must tile the frame exactly)."""
    from svt_av1_psy_tpu.codec import inter_encoder as IE

    rng = np.random.default_rng(5)
    W, H = 256, 192
    flat = np.full((H + 32, W + 32), 120, np.uint8)
    cfg = EncoderConfig(width=W, height=H, preset=4, recon_enabled=True)
    cfg.qp = 35
    enc = Encoder(cfg).init()
    captured = {}
    orig = IE.InterFrameEncoder._pre_walk_multi

    def spy(self):
        ok = orig(self)
        if ok and "dec" not in captured:
            captured["dec"] = dict(self.inter_dec)
            captured["parts"] = {k: v.copy()
                                 for k, v in self.decisions.parts.items()}
        return ok

    IE.InterFrameEncoder._pre_walk_multi = spy
    try:
        yy, xx = np.mgrid[0:H, 0:W]
        u = np.full((H // 2, W // 2), 118, np.uint8)
        for i in range(3):
            y = flat[i : i + H, i : i + W].copy()
            # busy textured corner forces small partitions there
            y[:64, :64] = rng.integers(0, 255, (64, 64))
            y[(xx + yy + 5 * i) % 97 == 0] = 240
            enc.send_picture(np.ascontiguousarray(y), u, u.copy(), pts=i)
        enc.flush()
        while enc.get_packet() is not None:
            pass
    finally:
        IE.InterFrameEncoder._pre_walk_multi = orig
    assert captured, "multi-depth pre-pass never ran"
    split64 = int(captured["parts"][64].sum())
    assert 0 < split64 < captured["parts"][64].size  # mixed tree
    assert len(captured["dec"]) > (W // 64) * (H // 64)


@requires_dav1d
def test_inter_tx_type_search():
    """Presets with TX search must choose non-DCT inter types on sharp
    content, improve RD, and stay dav1d-bit-exact (incl. the chroma
    inherit rule gated on luma eob)."""
    import svt_av1_psy_tpu.codec.inter_encoder as IE
    from svt_av1_psy_tpu.config import PredStructure

    rng = np.random.default_rng(5)
    W, H = 256, 160
    yy, xx = np.mgrid[0:H + 32, 0:W + 32]
    base = ((xx * 0.9 + yy * 0.5) % 200
            + rng.normal(0, 6, (H + 32, W + 32))).clip(0, 255).astype(np.uint8)
    u = np.full((H // 2, W // 2), 118, np.uint8)
    v = np.full((H // 2, W // 2), 137, np.uint8)

    picked = [0]
    orig = IE.InterFrameEncoder._inter_tx_search

    def spy(self):
        orig(self)
        picked[0] += len(self.inter_txt)

    def run(search_on):
        cfg = EncoderConfig(width=W, height=H, recon_enabled=True, preset=6,
                            pred_structure=PredStructure.LOW_DELAY)
        cfg.qp = 40
        enc = Encoder(cfg).init()
        if not search_on:
            enc._pc = enc._pc.__class__(**{**enc._pc.__dict__,
                                           "tx_search_depths": ()})
        for i in range(4):
            y = base[i * 2 : i * 2 + H, i * 3 : i * 3 + W].copy()
            y[(xx[:H, :W] + yy[:H, :W] + 7 * i) % 61 == 0] = 230
            enc.send_picture(np.ascontiguousarray(y), u, v.copy(), pts=i)
        enc.flush()
        stream = b""
        recons = []
        while (pkt := enc.get_packet()) is not None:
            stream += pkt.data
            if pkt.recon is not None:
                recons.append(pkt.recon)
        return stream, recons

    IE.InterFrameEncoder._inter_tx_search = spy
    try:
        s_on, recons = run(True)
    finally:
        IE.InterFrameEncoder._inter_tx_search = orig
    assert picked[0] > 0, "search never chose a non-DCT type"
    _check(s_on, recons, W, H)


@requires_dav1d
def test_last2_reference_conformant():
    """IPP multi-ref: LAST alternates DPB slots 0/2 so LAST2 stays
    addressable; a flickering occluder makes LAST2 the better second ref
    (pick over GOLDEN by decimated SAD). Stream must stay bit-exact."""
    import svt_av1_psy_tpu.codec.inter_encoder as IE
    from svt_av1_psy_tpu.config import PredStructure

    rng = np.random.default_rng(8)
    W, H = 192, 128
    bg = (np.cumsum(rng.normal(0, 5, (H, W + 64)), axis=1) + 128
          ).clip(0, 255).astype(np.uint8)
    u = np.full((H // 2, W // 2), 118, np.uint8)
    v = np.full((H // 2, W // 2), 137, np.uint8)
    used = {"l2": 0}
    orig = IE.InterFrameEncoder.__init__

    def spy(self, *a, **k):
        orig(self, *a, **k)
        if self.ref2 == 2:
            used["l2"] += 1

    IE.InterFrameEncoder.__init__ = spy
    try:
        cfg = EncoderConfig(width=W, height=H, recon_enabled=True, preset=6,
                            pred_structure=PredStructure.LOW_DELAY)
        cfg.qp = 40
        enc = Encoder(cfg).init()
        for i in range(6):
            y = bg[:, i : i + W].copy()
            if i % 2 == 1:
                y[40:90, 60:130] = 30
            enc.send_picture(np.ascontiguousarray(y), u, v.copy(), pts=i)
        enc.flush()
        stream = b""
        recons = []
        while (pkt := enc.get_packet()) is not None:
            stream += pkt.data
            if pkt.recon is not None:
                recons.append(pkt.recon)
    finally:
        IE.InterFrameEncoder.__init__ = orig
    assert used["l2"] > 0, "LAST2 never selected"
    _check(stream, recons, W, H)


@requires_dav1d

def _spy_feature_maps(counts):
    """Wrap walk_native.feature_search to accumulate per-map nonzero counts
    (the C walk codes feature symbols natively, so FrameContext spies no
    longer see them; the decision maps carry the same information)."""
    from svt_av1_psy_tpu.codec import walk_native as _wn

    orig = _wn.feature_search

    def spy(enc):
        r = orig(enc)
        if r:
            for k, arr in enc.feat.items():
                counts[k] = counts.get(k, 0) + int(np.count_nonzero(arr))
        return r

    _wn.feature_search = spy
    return _wn, orig


def test_obmc_conformant_and_used():
    """OBMC (motion_mode OBMC_CAUSAL) at preset <= 6: eligible blocks code
    the obmc flag, some choose overlapped prediction, and the stream stays
    dav1d-bit-exact (the blend is normative)."""
    import svt_av1_psy_tpu.bitstream.frame_context as FC
    from svt_av1_psy_tpu.config import PredStructure

    rng = np.random.default_rng(5)
    W, H = 256, 160
    yy, xx = np.mgrid[0:H + 32, 0:W + 32]
    base = ((xx * 0.9 + yy * 0.5) % 200
            + rng.normal(0, 6, (H + 32, W + 32))).clip(0, 255).astype(np.uint8)
    u = np.full((H // 2, W // 2), 118, np.uint8)
    v = np.full((H // 2, W // 2), 137, np.uint8)
    used = [0, 0]
    orig = FC.FrameContext.write

    def spy(self, enc, name, idx, val, n):
        if name == "obmc":
            used[int(bool(val))] += 1
        return orig(self, enc, name, idx, val, n)

    FC.FrameContext.write = spy
    fcounts = {}
    _wn, _orig_fs = _spy_feature_maps(fcounts)
    try:
        cfg = EncoderConfig(width=W, height=H, recon_enabled=True, preset=6,
                            pred_structure=PredStructure.LOW_DELAY)
        cfg.qp = 40
        enc = Encoder(cfg).init()
        yy2, xx2 = np.mgrid[0:H, 0:W]
        for i in range(4):
            y = base[i * 2 : i * 2 + H, i * 3 : i * 3 + W].copy()
            dd = ((xx2 - 80 - 6 * i) ** 2 + (yy2 - 70 - 3 * i) ** 2) < 28 ** 2
            y[dd] = np.clip(180 + (xx2[dd] - 80) // 2, 0, 255)
            enc.send_picture(np.ascontiguousarray(y), u, v.copy(), pts=i)
        enc.flush()
        stream = b""
        recons = []
        while (pkt := enc.get_packet()) is not None:
            stream += pkt.data
            if pkt.recon is not None:
                recons.append(pkt.recon)
    finally:
        FC.FrameContext.write = orig
        _wn.feature_search = _orig_fs
    assert used[1] + fcounts.get("mm", 0) > 0, "OBMC never chosen"
    _check(stream, recons, W, H)


def test_interintra_conformant_and_used():
    """Inter-intra compound (combine_interintra, inter_prediction.c:2140):
    the smooth-mask II blend must be chosen on gradient+motion content and
    stay dav1d-bit-exact (seq enable_interintra_compound gating)."""
    import svt_av1_psy_tpu.bitstream.frame_context as FCM
    from svt_av1_psy_tpu.config import PredStructure

    if not dav1d.available():
        pytest.skip("dav1d shim unavailable")
    rng = np.random.default_rng(21)
    W, H = 256, 160
    grad = np.clip(np.arange(H)[:, None] * 1.5
                   + np.arange(W)[None, :] * 0.3 + 40, 0, 255)
    tex = np.cumsum(rng.normal(0, 5, (H + 64, W + 64)), axis=1)
    u = np.full((H // 2, W // 2), 128, np.uint8)

    n_ii = [0]
    origw = FCM.FrameContext.write

    def spyw(self, enc, name, idx, symbol, nsyms):
        if name == "interintra" and symbol == 1:
            n_ii[0] += 1
        return origw(self, enc, name, idx, symbol, nsyms)

    FCM.FrameContext.write = spyw
    fcounts = {}
    _wn, _orig_fs = _spy_feature_maps(fcounts)
    try:
        cfg = EncoderConfig(width=W, height=H, preset=5, recon_enabled=True,
                            pred_structure=PredStructure.LOW_DELAY)
        cfg.qp = 40
        enc = Encoder(cfg).init()
        stream = b""
        rec = []
        for i in range(4):
            yi = np.clip(grad + tex[i * 5 : i * 5 + H, i * 9 : i * 9 + W]
                         * (0.5 + 0.2 * i), 0, 255).astype(np.uint8)
            enc.send_picture(np.ascontiguousarray(yi), u, u.copy(), pts=i)
            while (pk := enc.get_packet()) is not None:
                stream += pk.data
                rec.append(pk.recon)
    finally:
        FCM.FrameContext.write = origw
        _wn.feature_search = _orig_fs
    n_ii_total = n_ii[0] + fcounts.get("ii", 0)
    assert n_ii_total > 10, f"interintra should be used ({n_ii_total} blocks)"
    for i in range(4):
        dy, du, dv = dav1d.decode_nth(stream, i, W, H)
        assert np.array_equal(dy, rec[i][0]), f"frame {i} luma"
        assert np.array_equal(du, rec[i][1]), f"frame {i} chroma"


def test_wedge_compound_and_interintra_wedge_conformant():
    """COMPOUND_WEDGE (read_compound_type; blend_a64_mask.c d16 blend) and
    wedge inter-intra: masks rebuilt from the spec primary rows must decode
    bit-exactly and actually be chosen on oblique-edge content."""
    import svt_av1_psy_tpu.bitstream.frame_context as FCM

    if not dav1d.available():
        pytest.skip("dav1d shim unavailable")
    n = {"wedge": 0, "iiwedge": 0}
    origw = FCM.FrameContext.write

    def spyw(self, enc, name, idx, symbol, nsyms):
        if name == "comp_group_idx" and symbol == 1:
            n["wedge"] += 1
        if name == "wedge_interintra" and symbol == 1:
            n["iiwedge"] += 1
        return origw(self, enc, name, idx, symbol, nsyms)

    rng = np.random.default_rng(31)
    W, H = 256, 160
    base = (np.cumsum(rng.normal(0, 4, (H + 96, W + 96)), axis=1) + 128
            ).clip(0, 255).astype(np.uint8)
    u = np.full((H // 2, W // 2), 128, np.uint8)
    yy, xx = np.mgrid[0:H, 0:W]
    FCM.FrameContext.write = spyw
    fcounts = {}
    _wn, _orig_fs = _spy_feature_maps(fcounts)
    try:
        cfg = EncoderConfig(width=W, height=H, preset=5, recon_enabled=True)
        cfg.qp = 40
        enc = Encoder(cfg).init()
        stream = b""
        rec = []

        def drain():
            nonlocal stream
            while (pk := enc.get_packet()) is not None:
                stream += pk.data
                if pk.recon is not None:
                    rec.append(pk.recon)

        for i in range(9):
            yi = base[i * 3 : i * 3 + H, i * 5 : i * 5 + W].copy()
            m = (yy - 2 * i) * 2 + (xx - 4 * i) < 160
            yi[m] = np.clip(200 - (xx[m] // 3), 0, 255)
            enc.send_picture(np.ascontiguousarray(yi), u, u.copy(), pts=i)
            drain()
        enc.flush()
        drain()
    finally:
        FCM.FrameContext.write = origw
        _wn.feature_search = _orig_fs
    n["wedge"] += fcounts.get("ctype", 0)
    # the C feature-search pre-pass decides from open-loop preds, so its
    # wedge picks drift slightly vs the old inline search; usage (not an
    # exact count) is the invariant
    assert n["wedge"] > 2, f"wedge compound should be used: {n}"
    for i in range(len(rec)):
        dy, du, dv = dav1d.decode_nth(stream, i, W, H)
        assert np.array_equal(dy, rec[i][0]), f"frame {i} luma"
        assert np.array_equal(du, rec[i][1]), f"frame {i} chroma"


def test_switchable_interp_filters_conformant_and_used():
    """Per-block switchable interpolation filters (read_interpolation_filter,
    dual off): SMOOTH/SHARP must be chosen on subpel motion and the streams
    decode bit-exactly (incl. the w<=4 SHARP->4-tap-regular rule)."""
    import svt_av1_psy_tpu.bitstream.frame_context as FCM

    if not dav1d.available():
        pytest.skip("dav1d shim unavailable")
    n = {0: 0, 1: 0, 2: 0}
    origw = FCM.FrameContext.write

    def spyw(self, enc, name, idx, symbol, nsyms):
        if name == "switchable_interp":
            n[symbol] += 1
        return origw(self, enc, name, idx, symbol, nsyms)

    import bench

    frames, u, v = bench._video(320, 192, 8)
    FCM.FrameContext.write = spyw
    fcounts = {}
    _wn, _orig_fs = _spy_feature_maps(fcounts)
    try:
        cfg = EncoderConfig(width=320, height=192, preset=5,
                            recon_enabled=True)
        cfg.qp = 38
        enc = Encoder(cfg).init()
        stream = b""
        rec = []

        def drain():
            nonlocal stream
            while (p := enc.get_packet()) is not None:
                stream += p.data
                if p.recon is not None:
                    rec.append(p.recon)

        for i in range(8):
            enc.send_picture(frames[i], u, v.copy(), pts=i)
            drain()
        enc.flush()
        drain()
    finally:
        FCM.FrameContext.write = origw
        _wn.feature_search = _orig_fs
    n[1] += fcounts.get("filt", 0)
    assert n[1] + n[2] > 5, f"SMOOTH/SHARP should be used: {n}"
    for i in range(len(rec)):
        dy, du, dv = dav1d.decode_nth(stream, i, 320, 192)
        assert np.array_equal(dy, rec[i][0]), f"frame {i} luma"
        assert np.array_equal(du, rec[i][1]), f"frame {i} chroma"
