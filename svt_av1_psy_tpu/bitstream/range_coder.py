"""Daala/AV1 multi-symbol range coder (the AV1 spec's symbol decoder inverse).

Behavioral reference: Source/Lib/Codec/bitstream_unit.c:137-407 (svt_od_ec_*)
— the algorithm is normative (AV1 spec §8.2); this is an independent Python
implementation used as the correctness oracle for the C++ native fast path.

CDFs use the codec-internal inverted representation ("icdf"):
    icdf[i] = 32768 - cumulative_prob(symbols 0..i)
monotonically decreasing with icdf[nsyms-1] == 0, followed by one
adaptation-counter element (so arrays have nsyms+1 entries; the coder only
reads the first nsyms).
"""

from __future__ import annotations

import numpy as np

CDF_PROB_TOP = 1 << 15
EC_PROB_SHIFT = 6
EC_MIN_PROB = 4
_WIN_BITS = 32  # encoder low window (reference uses 32-bit OdEcWindow)
_WIN_MASK = (1 << _WIN_BITS) - 1


def _ilog_nz(x: int) -> int:
    return x.bit_length()


class RangeEncoder:
    """od_ec_enc equivalent. Produces the AV1 arithmetic-coded payload."""

    __slots__ = ("low", "rng", "cnt", "precarry")

    def __init__(self):
        self.reset()

    def reset(self):
        self.low = 0
        self.rng = 0x8000
        # crosses zero after one byte + one carry bit has accumulated
        self.cnt = -9
        self.precarry: list = []

    # ------------------------------------------------------------- internals
    def _normalize(self, low: int, rng: int):
        d = 16 - _ilog_nz(rng)
        s = self.cnt + d
        if s >= 0:
            c = self.cnt + 16
            m = (1 << c) - 1
            if s >= 8:
                self.precarry.append((low >> c) & 0xFFFF)
                low &= m
                c -= 8
                m >>= 8
            self.precarry.append((low >> c) & 0xFFFF)
            s = c + d - 24
            low &= m
        self.low = (low << d) & _WIN_MASK
        self.rng = (rng << d) & 0xFFFF
        self.cnt = s

    def _encode_q15(self, fl: int, fh: int, s: int, nsyms: int):
        l = self.low
        r = self.rng
        n = nsyms - 1
        if fl < CDF_PROB_TOP:
            u = ((r >> 8) * (fl >> EC_PROB_SHIFT) >> (7 - EC_PROB_SHIFT)) + EC_MIN_PROB * (
                n - (s - 1)
            )
            v = ((r >> 8) * (fh >> EC_PROB_SHIFT) >> (7 - EC_PROB_SHIFT)) + EC_MIN_PROB * (n - s)
            l += r - u
            r = u - v
        else:
            r -= ((r >> 8) * (fh >> EC_PROB_SHIFT) >> (7 - EC_PROB_SHIFT)) + EC_MIN_PROB * (n - s)
        self._normalize(l, r)

    # ------------------------------------------------------------------- API
    def encode_symbol(self, s: int, icdf, nsyms: int):
        """Encode symbol s with inverted CDF (first nsyms entries used)."""
        fl = CDF_PROB_TOP if s == 0 else int(icdf[s - 1])
        self._encode_q15(fl, int(icdf[s]), s, nsyms)

    def encode_symbol_adapt(self, s: int, icdf, nsyms: int):
        """Encode + apply the normative CDF adaptation in place."""
        self.encode_symbol(s, icdf, nsyms)
        update_cdf(icdf, s, nsyms)

    def encode_bool(self, val: int, f: int):
        """Encode one binary value; f = P(val==1) in Q15, 0 < f < 32768.

        Matches svt_od_ec_encode_bool_q15 (bitstream_unit.c:268)."""
        l = self.low
        r = self.rng
        v = ((r >> 8) * (f >> EC_PROB_SHIFT) >> (7 - EC_PROB_SHIFT)) + EC_MIN_PROB
        if val:
            l += r - v
            r = v
        else:
            r -= v
        self._normalize(l, r)

    def encode_literal(self, value: int, bits: int):
        """bits raw equiprobable bits, MSB first (aom_write_literal analog)."""
        for i in range(bits - 1, -1, -1):
            self.encode_bool((value >> i) & 1, 16384)

    def tell(self) -> int:
        """Bits used so far (always >= exact; +1 reserved terminator bit)."""
        return self.cnt + 10 + 8 * len(self.precarry)

    def tell_frac(self) -> int:
        """Bits used in 1/8th-bit units (od_ec_tell_frac), for RD decisions."""
        nbits = self.tell() << 3
        rng = self.rng
        l = 0
        for _ in range(3):
            rng = (rng * rng) >> 15
            b = rng >> 16
            l = (l << 1) | b
            rng >>= b
        return nbits - l

    def done(self) -> bytes:
        """Finalize: flush, propagate carries, return the coded payload."""
        l = self.low
        c = self.cnt
        s = 10
        m = 0x3FFF
        e = ((l + m) & ~m) | (m + 1)
        s += c
        buf = list(self.precarry)
        if s > 0:
            n = (1 << (c + 16)) - 1
            while True:
                buf.append((e >> (c + 16)) & 0xFFFF)
                e &= n
                s -= 8
                c -= 8
                n >>= 8
                if s <= 0:
                    break
        # carry propagation (precarry values can exceed 255)
        out = bytearray(len(buf))
        carry = 0
        for i in range(len(buf) - 1, -1, -1):
            carry += buf[i]
            out[i] = carry & 0xFF
            carry >>= 8
        return bytes(out)


_LOTS_OF_BITS = 0x4000
_DEC_WIN_BITS = 32


class RangeDecoder:
    """od_ec_dec equivalent — used for encoder self-verification and tests."""

    __slots__ = ("buf", "pos", "dif", "rng", "cnt")

    def __init__(self, data: bytes):
        self.buf = data
        self.pos = 0
        self.dif = (1 << (_DEC_WIN_BITS - 1)) - 1
        self.rng = 0x8000
        self.cnt = -15
        self._refill()

    def _refill(self):
        s = _DEC_WIN_BITS - 9 - (self.cnt + 15)
        while s >= 0 and self.pos < len(self.buf):
            self.dif ^= self.buf[self.pos] << s
            self.cnt += 8
            self.pos += 1
            s -= 8
        if self.pos >= len(self.buf):
            self.cnt = _LOTS_OF_BITS

    def _normalize(self, dif: int, rng: int):
        d = 16 - _ilog_nz(rng)
        self.cnt -= d
        self.dif = (((dif + 1) << d) - 1) & ((1 << _DEC_WIN_BITS) - 1)
        self.rng = (rng << d) & 0xFFFF
        if self.cnt < 0:
            self._refill()

    def decode_symbol(self, icdf, nsyms: int) -> int:
        dif = self.dif
        r = self.rng
        n = nsyms - 1
        c = dif >> (_DEC_WIN_BITS - 16)
        v = r
        ret = -1
        while True:
            u = v
            ret += 1
            v = ((r >> 8) * (int(icdf[ret]) >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)
            v += EC_MIN_PROB * (n - ret)
            if c >= v:
                break
        r = u - v
        dif -= v << (_DEC_WIN_BITS - 16)
        self._normalize(dif, r)
        return ret

    def decode_bool(self, f: int) -> int:
        dif = self.dif
        r = self.rng
        v = ((r >> 8) * (f >> EC_PROB_SHIFT) >> (7 - EC_PROB_SHIFT)) + EC_MIN_PROB
        vw = v << (_DEC_WIN_BITS - 16)
        if dif >= vw:
            self._normalize(dif - vw, r - v)
            return 0
        self._normalize(dif, v)
        return 1

    def decode_literal(self, bits: int) -> int:
        value = 0
        for _ in range(bits):
            value = (value << 1) | self.decode_bool(16384)
        return value


# ---------------------------------------------------------------------------
# CDF adaptation (spec §8.4 update_cdf; reference: cabac_context_model.h)
# ---------------------------------------------------------------------------

def update_cdf(icdf: np.ndarray, symbol: int, nsyms: int):
    """In-place per-symbol CDF adaptation, matching the normative update_cdf
    (cabac_context_model.h:390; AV1 spec §8.4 "CDF update process").

    icdf holds nsyms icdf values + 1 counter element (icdf[nsyms])."""
    count = int(icdf[nsyms])
    # nsymbs2speed[n] = 0,0,1,1,2,2,... == min(floor(log2(n)), 2) for n >= 2
    rate = 3 + (1 if count > 15 else 0) + (1 if count > 31 else 0) + min(_log2_floor(nsyms), 2)
    for i in range(nsyms - 1):
        v = int(icdf[i])
        if i < symbol:
            icdf[i] = v + ((CDF_PROB_TOP - v) >> rate)
        else:
            icdf[i] = v - (v >> rate)
    icdf[nsyms] = count + (1 if count < 32 else 0)


def _log2_floor(n: int) -> int:
    return n.bit_length() - 1
