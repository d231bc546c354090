"""I/O layer tests: y4m, IVF, AVIF mux/demux."""

import io

import numpy as np
import pytest

from svt_av1_psy_tpu.io.ivf import IVFWriter, read_ivf
from svt_av1_psy_tpu.io.y4m import Y4MHeader, Y4MReader, Y4MWriter


def test_y4m_roundtrip_420():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    u = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    v = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    buf = io.BytesIO()
    w = Y4MWriter(buf, Y4MHeader(64, 48, 30, 1, colorspace="420mpeg2"))
    w.write_frame(y, u, v)
    w.write_frame(y, u, v)
    buf.seek(0)
    r = Y4MReader(buf)
    assert (r.header.width, r.header.height) == (64, 48)
    frames = list(r.frames())
    assert len(frames) == 2
    for fy, fu, fv in frames:
        assert np.array_equal(fy, y) and np.array_equal(fu, u) and np.array_equal(fv, v)


def test_y4m_10bit():
    y = np.arange(32 * 16, dtype="<u2").reshape(16, 32) % 1024
    u = np.zeros((8, 16), dtype="<u2")
    v = np.ones((8, 16), dtype="<u2")
    buf = io.BytesIO()
    Y4MWriter(buf, Y4MHeader(32, 16, 24, 1, colorspace="420p10")).write_frame(y, u, v)
    buf.seek(0)
    r = Y4MReader(buf)
    assert r.header.bit_depth == 10
    fy, fu, fv = next(r.frames())
    assert np.array_equal(fy, y)


def test_y4m_odd_dimensions():
    # PSY supports odd dims; chroma planes are ceil(dim/2)
    y = np.zeros((7, 5), dtype=np.uint8)
    u = np.zeros((4, 3), dtype=np.uint8)
    v = np.zeros((4, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Y4MWriter(buf, Y4MHeader(5, 7)).write_frame(y, u, v)
    buf.seek(0)
    fy, fu, fv = next(Y4MReader(buf).frames())
    assert fy.shape == (7, 5) and fu.shape == (4, 3)


def test_ivf_roundtrip():
    buf = io.BytesIO()
    w = IVFWriter(buf, 640, 480, 30000, 1001)
    w.write_frame(b"frame-zero", 0)
    w.write_frame(b"frame-one!!", 1)
    w.finalize()
    buf.seek(0)
    frames = list(read_ivf(buf))
    assert frames == [(0, b"frame-zero"), (1, b"frame-one!!")]


@pytest.mark.skipif(
    not __import__("PIL.features", fromlist=["check"]).check("avif"),
    reason="PIL avif missing",
)
def test_avif_mux_demux_oracle():
    from PIL import Image

    from svt_av1_psy_tpu.io.avif import extract_av1_item, write_avif

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    src = io.BytesIO()
    Image.fromarray(img).save(src, format="AVIF", quality=85)
    payload = extract_av1_item(src.getvalue())
    # locate sequence header OBU (type 1)
    pos, seq = 0, None
    while pos < len(payload):
        b0 = payload[pos]
        obu_type = (b0 >> 3) & 0xF
        ext = (b0 >> 2) & 1
        i = pos + 1 + ext
        sz, shift = 0, 0
        while True:
            byte = payload[i]
            sz |= (byte & 0x7F) << shift
            i += 1
            shift += 7
            if not byte & 0x80:
                break
        if obu_type == 1:
            seq = payload[pos : i + sz]
        pos = i + sz
    assert seq is not None
    rewrapped = write_avif(payload, 64, 64, seq)
    got = np.asarray(Image.open(io.BytesIO(rewrapped)).convert("RGB"))
    ref = np.asarray(Image.open(src).convert("RGB"))
    assert np.array_equal(got, ref)
