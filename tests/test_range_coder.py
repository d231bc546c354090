"""Range coder round-trip tests (analog of test/BitstreamWriterTest.cc)."""

import numpy as np
import pytest

from svt_av1_psy_tpu.bitstream.range_coder import (
    CDF_PROB_TOP,
    RangeDecoder,
    RangeEncoder,
    update_cdf,
)
from svt_av1_psy_tpu.bitstream.bitwriter import BitReader, BitWriter, leb128, read_leb128


def _random_icdf(rng, nsyms):
    """Random valid inverted CDF with nsyms symbols + counter element."""
    cuts = np.sort(rng.choice(np.arange(1, CDF_PROB_TOP), size=nsyms - 1, replace=False))
    icdf = np.zeros(nsyms + 1, dtype=np.uint16)
    icdf[: nsyms - 1] = (CDF_PROB_TOP - cuts)[::-1] if False else CDF_PROB_TOP - cuts
    icdf[nsyms - 1] = 0
    return icdf


def test_bool_roundtrip():
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 2, 1000)
    probs = rng.integers(1, 32767, 1000)
    enc = RangeEncoder()
    for v, f in zip(vals, probs):
        enc.encode_bool(int(v), int(f))
    data = enc.done()
    dec = RangeDecoder(data)
    got = [dec.decode_bool(int(f)) for f in probs]
    assert got == list(vals)


@pytest.mark.parametrize("nsyms", [2, 3, 4, 5, 8, 11, 13, 16])
def test_symbol_roundtrip_static_cdf(nsyms):
    rng = np.random.default_rng(nsyms)
    icdf = _random_icdf(rng, nsyms)
    syms = rng.integers(0, nsyms, 500)
    enc = RangeEncoder()
    for s in syms:
        enc.encode_symbol(int(s), icdf, nsyms)
    data = enc.done()
    dec = RangeDecoder(data)
    got = [dec.decode_symbol(icdf, nsyms) for _ in syms]
    assert got == list(syms)


def test_symbol_roundtrip_adaptive_cdf():
    """Both sides adapt CDFs after each symbol — must remain in lockstep."""
    rng = np.random.default_rng(7)
    nsyms = 6
    enc_icdf = _random_icdf(rng, nsyms)
    dec_icdf = enc_icdf.copy()
    syms = rng.integers(0, nsyms, 2000)
    enc = RangeEncoder()
    for s in syms:
        enc.encode_symbol(int(s), enc_icdf, nsyms)
        update_cdf(enc_icdf, int(s), nsyms)
    data = enc.done()
    dec = RangeDecoder(data)
    for s in syms:
        got = dec.decode_symbol(dec_icdf, nsyms)
        assert got == s
        update_cdf(dec_icdf, got, nsyms)
    assert np.array_equal(enc_icdf, dec_icdf)


def test_mixed_stream_roundtrip():
    rng = np.random.default_rng(42)
    enc = RangeEncoder()
    ops = []
    icdf = _random_icdf(rng, 9)
    for _ in range(800):
        kind = rng.integers(0, 3)
        if kind == 0:
            v, f = int(rng.integers(0, 2)), int(rng.integers(1, 32767))
            enc.encode_bool(v, f)
            ops.append(("bool", v, f))
        elif kind == 1:
            s = int(rng.integers(0, 9))
            enc.encode_symbol(s, icdf, 9)
            ops.append(("sym", s, None))
        else:
            v, n = int(rng.integers(0, 256)), 8
            enc.encode_literal(v, n)
            ops.append(("lit", v, n))
    data = enc.done()
    dec = RangeDecoder(data)
    for kind, v, f in ops:
        if kind == "bool":
            assert dec.decode_bool(f) == v
        elif kind == "sym":
            assert dec.decode_symbol(icdf, 9) == v
        else:
            assert dec.decode_literal(f) == v


def test_tell_monotone_and_sane():
    enc = RangeEncoder()
    prev = enc.tell()
    for i in range(100):
        enc.encode_bool(i & 1, 16384)
        t = enc.tell()
        assert t >= prev
        prev = t
    # ~1 bit per equiprobable bool
    assert 90 <= enc.tell() <= 130


def test_empty_and_single_symbol():
    enc = RangeEncoder()
    enc.encode_bool(1, 16384)
    data = enc.done()
    assert len(data) >= 1
    assert RangeDecoder(data).decode_bool(16384) == 1


def test_update_cdf_counter_caps_at_32():
    icdf = np.array([20000, 10000, 0, 0], dtype=np.uint16)
    for _ in range(40):
        update_cdf(icdf, 1, 3)
    assert icdf[3] == 32


# --------------------------------------------------------------------- bits
def test_bitwriter_roundtrip():
    w = BitWriter()
    w.f(5, 3).f(1, 1).uvlc(0).uvlc(7).uvlc(127).ns(3, 5).ns(0, 5).ns(4, 5)
    w.su(-3, 6)
    w.trailing_bits()
    r = BitReader(w.data())
    assert r.f(3) == 5
    assert r.f(1) == 1
    assert r.uvlc() == 0
    assert r.uvlc() == 7
    assert r.uvlc() == 127
    assert r.ns(5) == 3
    assert r.ns(5) == 0
    assert r.ns(5) == 4
    v = r.f(6)
    assert v - (1 << 6) == -3 or v == -3  # su() sign-extends on read side


def test_leb128_roundtrip():
    for v in [0, 1, 127, 128, 300, 2**32 - 1, 2**40]:
        data = leb128(v)
        got, end = read_leb128(data)
        assert got == v and end == len(data)
