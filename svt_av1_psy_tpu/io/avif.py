"""Minimal AVIF (ISOBMFF/HEIF) muxer + demuxer for still images.

Two uses (see .claude/skills/verify/SKILL.md):
 - the encoder's AVIF output mode (reference: --avif, EbSvtAv1Enc.h:946)
 - the conformance-oracle path: wrap our raw AV1 key-frame OBUs so PIL
   (libavif -> dav1d/aom) can decode them, mirroring the reference E2E
   tests' decode-compare strategy (test/e2e_test/RefDecoder.cc).
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full_box(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", (version << 24) | flags) + payload)


def build_av1c(
    seq_header_obu: bytes,
    seq_profile: int = 0,
    seq_level_idx: int = 0,
    seq_tier: int = 0,
    high_bitdepth: bool = False,
    twelve_bit: bool = False,
    monochrome: bool = False,
    chroma_subsampling_x: int = 1,
    chroma_subsampling_y: int = 1,
    chroma_sample_position: int = 0,
) -> bytes:
    """AV1CodecConfigurationBox payload (av1C)."""
    b0 = 0x80 | 1  # marker=1, version=1
    b1 = (seq_profile << 5) | seq_level_idx
    b2 = (
        (seq_tier << 7)
        | (int(high_bitdepth) << 6)
        | (int(twelve_bit) << 5)
        | (int(monochrome) << 4)
        | (chroma_subsampling_x << 3)
        | (chroma_subsampling_y << 2)
        | chroma_sample_position
    )
    b3 = 0
    return bytes([b0, b1, b2, b3]) + seq_header_obu


def write_avif(
    av1_payload: bytes,
    width: int,
    height: int,
    seq_header_obu: bytes,
    bit_depth: int = 8,
    monochrome: bool = False,
    seq_profile: int = 0,
    seq_level_idx: int = 0,
) -> bytes:
    """Wrap one AV1 temporal unit (seq hdr + frame OBUs) as an AVIF file.

    `av1_payload` is the item data: the full OBU stream for the image
    (sequence header + frame OBU(s)), as libavif expects.
    """
    ftyp = _box(b"ftyp", b"avif" + struct.pack(">I", 0) + b"avifmif1miaf")

    # hdlr payload: pre_defined(4) handler_type(4) reserved(12) name(utf8 nul)
    hdlr = _full_box(b"hdlr", 0, 0, b"\x00" * 4 + b"pict" + b"\x00" * 12 + b"\x00")
    pitm = _full_box(b"pitm", 0, 0, struct.pack(">H", 1))
    infe = _full_box(b"infe", 2, 0, struct.pack(">HH4s", 1, 0, b"av01") + b"\x00")
    iinf = _full_box(b"iinf", 0, 0, struct.pack(">H", 1) + infe)

    ispe = _full_box(b"ispe", 0, 0, struct.pack(">II", width, height))
    nch = 1 if monochrome else 3
    pixi = _full_box(b"pixi", 0, 0, bytes([nch] + [bit_depth] * nch))
    av1c = _box(b"av1C", build_av1c(
        seq_header_obu,
        seq_profile=seq_profile,
        seq_level_idx=seq_level_idx,
        high_bitdepth=bit_depth > 8,
        monochrome=monochrome,
        chroma_subsampling_x=1,
        chroma_subsampling_y=1,
    ))
    ipco = _box(b"ipco", ispe + pixi + av1c)
    # associations: item 1 -> properties 1 (ispe), 2 (pixi), 3 (av1C essential)
    ipma = _full_box(b"ipma", 0, 0, struct.pack(">I", 1) + struct.pack(">HB", 1, 3) + bytes([1, 2, 0x80 | 3]))
    iprp = _box(b"iprp", ipco + ipma)

    # iloc with one extent; offsets are absolute file offsets (construction 0)
    def make_iloc(offset: int) -> bytes:
        payload = bytes([0x44, 0x00])  # offset_size=4, length_size=4, base_offset_size=0
        payload += struct.pack(">H", 1)  # item_count
        payload += struct.pack(">HHH", 1, 0, 1)  # item_id, dref_idx, extent_count
        payload += struct.pack(">II", offset, len(av1_payload))
        return _full_box(b"iloc", 0, 0, payload)

    iloc = make_iloc(0)
    meta_payload = hdlr + pitm + iloc + iinf + iprp
    meta = _full_box(b"meta", 0, 0, meta_payload)
    mdat_offset = len(ftyp) + len(meta) + 8  # item starts after mdat header
    iloc = make_iloc(mdat_offset)
    meta = _full_box(b"meta", 0, 0, hdlr + pitm + iloc + iinf + iprp)
    mdat = _box(b"mdat", av1_payload)
    return ftyp + meta + mdat


# ---------------------------------------------------------------- demuxer

def _iter_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", data[pos : pos + 4])[0]
        fourcc = data[pos + 4 : pos + 8]
        body_start = pos + 8
        if size == 1:
            size = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
            body_start = pos + 16
        if size == 0:
            size = end - pos
        yield fourcc, body_start, pos + size
        pos += size


def extract_av1_item(avif_data: bytes) -> bytes:
    """Pull the primary av01 item payload out of an AVIF file (for tests:
    gives us golden AV1 bitstreams from PIL/rav1e encodes)."""
    meta_body = None
    for fourcc, s, e in _iter_boxes(avif_data, 0, len(avif_data)):
        if fourcc == b"meta":
            meta_body = (s + 4, e)  # skip fullbox header
    if meta_body is None:
        raise ValueError("no meta box")
    iloc = None
    for fourcc, s, e in _iter_boxes(avif_data, *meta_body):
        if fourcc == b"iloc":
            iloc = (s, e)
    if iloc is None:
        raise ValueError("no iloc box")
    s, e = iloc
    version = avif_data[s]
    pos = s + 4
    offset_size = avif_data[pos] >> 4
    length_size = avif_data[pos] & 0xF
    base_offset_size = avif_data[pos + 1] >> 4
    index_size = (avif_data[pos + 1] & 0xF) if version in (1, 2) else 0
    pos += 2
    if version < 2:
        item_count = struct.unpack(">H", avif_data[pos : pos + 2])[0]
        pos += 2
    else:
        item_count = struct.unpack(">I", avif_data[pos : pos + 4])[0]
        pos += 4

    def read_n(p, n):
        return int.from_bytes(avif_data[p : p + n], "big"), p + n

    for _ in range(item_count):
        if version < 2:
            item_id, pos = read_n(pos, 2)
        else:
            item_id, pos = read_n(pos, 4)
        if version in (1, 2):
            pos += 2  # construction_method
        pos += 2  # data_reference_index
        base_offset, pos = read_n(pos, base_offset_size)
        extent_count, pos = read_n(pos, 2)
        extents = []
        for _ in range(extent_count):
            if index_size:
                _, pos = read_n(pos, index_size)
            off, pos = read_n(pos, offset_size)
            ln, pos = read_n(pos, length_size)
            extents.append((base_offset + off, ln))
        if extents:
            return b"".join(avif_data[o : o + l] for o, l in extents)
    raise ValueError("no item extents")
