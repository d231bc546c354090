"""Raw bit writer/reader for AV1 uncompressed headers (spec f(n), uvlc, leb128).

Reference analog: the aom_wb_write_* helpers used by the OBU writers in
Source/Lib/Codec/entropy_coding.c:3566+.
"""

from __future__ import annotations


class BitWriter:
    __slots__ = ("_bytes", "_bitpos")

    def __init__(self):
        self._bytes = bytearray()
        self._bitpos = 0

    def write_bit(self, bit: int):
        if self._bitpos == 0:
            self._bytes.append(0)
        if bit:
            self._bytes[-1] |= 0x80 >> self._bitpos
        self._bitpos = (self._bitpos + 1) & 7

    def f(self, value: int, n: int):
        """n-bit unsigned, MSB first (spec f(n))."""
        assert 0 <= value < (1 << n), (value, n)
        for i in range(n - 1, -1, -1):
            self.write_bit((value >> i) & 1)
        return self

    def su(self, value: int, n: int):
        """signed integer as n+1 bits (spec su(1+n)): sign handled via masking."""
        self.f(value & ((1 << n) - 1), n)
        return self

    def uvlc(self, value: int):
        """spec uvlc(): leading zeros + value+1."""
        shifted = value + 1
        leading = shifted.bit_length() - 1
        for _ in range(leading):
            self.write_bit(0)
        self.f(shifted, leading + 1)
        return self

    def ns(self, value: int, n: int):
        """spec ns(n): non-symmetric encoding of value in [0, n)."""
        w = n.bit_length()
        m = (1 << w) - n
        if value < m:
            self.f(value, w - 1)
        else:
            extra = value - m
            self.f(m + (extra >> 1), w - 1)
            self.write_bit(extra & 1)
        return self

    def le(self, value: int, nbytes: int):
        """little-endian byte-aligned (spec le(n)); must be byte-aligned."""
        assert self._bitpos == 0
        for i in range(nbytes):
            self._bytes.append((value >> (8 * i)) & 0xFF)
        return self

    def byte_align(self, bit: int = 0):
        while self._bitpos != 0:
            self.write_bit(bit)
        return self

    def trailing_bits(self):
        """spec trailing_bits(): a 1 then 0s to byte boundary."""
        self.write_bit(1)
        self.byte_align()
        return self

    @property
    def bit_count(self) -> int:
        return len(self._bytes) * 8 - ((8 - self._bitpos) & 7)

    def data(self) -> bytes:
        assert self._bitpos == 0, "not byte aligned"
        return bytes(self._bytes)


def leb128(value: int) -> bytes:
    """spec leb128() encoding (used for OBU payload sizes)."""
    out = bytearray()
    while True:
        byte = value & 0x7F
        value >>= 7
        if value:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


class BitReader:
    """Mirror reader for tests."""

    __slots__ = ("_data", "_pos")

    def __init__(self, data: bytes):
        self._data = data
        self._pos = 0

    def read_bit(self) -> int:
        byte = self._data[self._pos >> 3]
        bit = (byte >> (7 - (self._pos & 7))) & 1
        self._pos += 1
        return bit

    def f(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def uvlc(self) -> int:
        leading = 0
        while self.read_bit() == 0:
            leading += 1
        if leading == 0:
            return 0
        return self.f(leading) + (1 << leading) - 1

    def ns(self, n: int) -> int:
        w = n.bit_length()
        m = (1 << w) - n
        v = self.f(w - 1)
        if v < m:
            return v
        return (v << 1) - m + self.read_bit()


def read_leb128(data: bytes, pos: int = 0):
    value = 0
    for i in range(8):
        byte = data[pos + i]
        value |= (byte & 0x7F) << (7 * i)
        if not (byte & 0x80):
            return value, pos + i + 1
    raise ValueError("leb128 too long")
