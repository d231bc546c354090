"""Native EC bit-exactness vs the Python reference implementation."""

import numpy as np
import pytest

from svt_av1_psy_tpu.bitstream import ec_native
from svt_av1_psy_tpu.bitstream.range_coder import RangeDecoder, RangeEncoder

requires_native = pytest.mark.skipif(not ec_native.available(), reason="native EC unavailable")


@requires_native
def test_symbol_stream_bit_identical():
    rng = np.random.default_rng(0)
    icdf_py = np.array([20000, 12000, 5000, 0, 0], np.uint16)
    icdf_c = icdf_py.copy()
    py = RangeEncoder()
    ce = ec_native.NativeRangeEncoder()
    for _ in range(3000):
        s = int(rng.integers(0, 4))
        py.encode_symbol_adapt(s, icdf_py, 4)
        ce.encode_symbol_adapt(s, icdf_c, 4)
        b = int(rng.integers(0, 2))
        py.encode_bool(b, 9000)
        ce.encode_bool(b, 9000)
    assert np.array_equal(icdf_py, icdf_c)
    assert py.done() == ce.done()


@requires_native
def test_full_frame_bit_identical():
    """Whole intra frame encoded with native vs python EC: identical bytes."""
    from svt_av1_psy_tpu.codec.intra_encoder import IntraFrameEncoder

    rng = np.random.default_rng(3)
    y = (np.cumsum(rng.normal(0, 5, (96, 128)), axis=1) + 128).clip(0, 255).astype(np.uint8)
    u = rng.integers(100, 150, (48, 64)).astype(np.uint8)
    v = rng.integers(100, 150, (48, 64)).astype(np.uint8)

    enc_n = IntraFrameEncoder(128, 96, 90)
    assert enc_n.use_native_ec
    tile_n = enc_n.encode_frame(y, u, v)

    enc_p = IntraFrameEncoder(128, 96, 90)
    from svt_av1_psy_tpu.bitstream.range_coder import RangeEncoder as PyEnc

    enc_p.use_native_ec = False
    enc_p.enc = PyEnc()
    tile_p = enc_p.encode_frame(y, u, v)

    assert tile_n == tile_p
    assert np.array_equal(enc_n.recon_y, enc_p.recon_y)


@requires_native
def test_native_decodable():
    ce = ec_native.NativeRangeEncoder()
    icdf = np.array([26000, 14000, 6000, 0, 0], np.uint16)
    work = icdf.copy()
    syms = [0, 3, 1, 2, 2, 0, 3, 3, 1, 0]
    for s in syms:
        ce.encode_symbol_adapt(s, work, 4)
    data = ce.done()
    from svt_av1_psy_tpu.bitstream.range_coder import update_cdf

    dec = RangeDecoder(data)
    work = icdf.copy()
    for s in syms:
        got = dec.decode_symbol(work, 4)
        assert got == s
        update_cdf(work, got, 4)
