"""End-to-end intra conformance tests (analog of SvtAv1E2ETests):
encode -> decode with dav1d -> recon must match the decoder bit-exactly.
"""

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
from svt_av1_psy_tpu.io import dav1d

requires_dav1d = pytest.mark.skipif(not dav1d.available(), reason="dav1d shim unavailable")


def _content(rng, W, H):
    y = (np.cumsum(rng.normal(0, 5, (H, W)), axis=1)
         + np.cumsum(rng.normal(0, 3, (H, W)), axis=0) + 128).clip(0, 255).astype(np.uint8)
    ch, cw = (H + 1) // 2, (W + 1) // 2
    u = (np.cumsum(rng.normal(0, 4, (ch, cw)), axis=1) + 128).clip(0, 255).astype(np.uint8)
    v = (np.cumsum(rng.normal(0, 4, (ch, cw)), axis=0) + 128).clip(0, 255).astype(np.uint8)
    return y, u, v


def _encode_decode(W, H, q, mono, seed):
    rng = np.random.default_rng(seed)
    y, u, v = _content(rng, W, H)
    sp = SequenceParams(W, H, still_picture=True, reduced_still_picture_header=True,
                        monochrome=mono, color_range=1)
    enc = IntraFrameEncoder(W, H, q, monochrome=mono)
    tile = enc.encode_frame(y, None if mono else u, None if mono else v)
    stream = (temporal_delimiter_obu() + sequence_header_obu(sp)
              + frame_obu(sp, FrameParams(base_q_idx=q), [tile]))
    dy, du, dv = dav1d.decode(stream, W, H)
    return enc, (dy, du, dv), (y, u, v)


@requires_dav1d
@pytest.mark.parametrize("dims,q,mono,seed", [
    ((64, 64), 100, True, 1),
    ((192, 128), 80, True, 2),       # multiple superblocks
    ((100, 80), 100, True, 3),       # forced edge partitions
    ((128, 128), 50, False, 4),      # 4:2:0
    ((210, 150), 140, False, 5),     # 4:2:0 non-aligned
    ((13, 7), 90, True, 7),          # tiny odd dims (PSY small-frame support)
    ((64, 64), 1, False, 8),         # near-lossless qindex
    ((64, 64), 255, False, 9),       # max qindex
])
def test_recon_matches_dav1d(dims, q, mono, seed):
    W, H = dims
    enc, dec, _src = _encode_decode(W, H, q, mono, seed)
    assert np.array_equal(dec[0], enc.recon_y), "luma recon mismatch"
    if not mono:
        assert np.array_equal(dec[1], enc.recon_plane(1)), "U recon mismatch"
        assert np.array_equal(dec[2], enc.recon_plane(2)), "V recon mismatch"


@requires_dav1d
def test_quality_improves_with_lower_q():
    rng = np.random.default_rng(0)
    y, u, v = _content(rng, 128, 128)
    psnrs = []
    for q in (40, 120, 220):
        enc, dec, src = _encode_decode(128, 128, q, True, 0)
        mse = np.mean((dec[0].astype(float) - src[0]) ** 2)
        psnrs.append(10 * np.log10(255 ** 2 / max(mse, 1e-9)))
    assert psnrs[0] > psnrs[1] > psnrs[2]


@requires_dav1d
def test_avif_container_path():
    """Full AVIF output decodes via PIL (the reference's --avif analog)."""
    import io

    from PIL import Image

    from svt_av1_psy_tpu.io.avif import write_avif

    W, H = 96, 64
    rng = np.random.default_rng(11)
    y, u, v = _content(rng, W, H)
    sp = SequenceParams(W, H, still_picture=True, reduced_still_picture_header=True,
                        monochrome=True, color_range=1)
    enc = IntraFrameEncoder(W, H, 90, monochrome=True)
    tile = enc.encode_frame(y)
    seq = sequence_header_obu(sp)
    stream = seq + frame_obu(sp, FrameParams(base_q_idx=90), [tile])
    avif = write_avif(stream, W, H, seq, monochrome=True)
    img = Image.open(io.BytesIO(avif))
    assert img.size == (W, H)
    dec = np.asarray(img.convert("L"))
    # PIL may apply range conversion; dav1d shim gives the exact pixels
    dy, _, _ = dav1d.decode(stream, W, H)
    assert np.array_equal(dy, enc.recon_y)
    assert dec.shape == (H, W)
