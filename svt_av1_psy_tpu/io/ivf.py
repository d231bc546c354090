"""IVF container writer/reader (reference: Source/App/app_output_ivf.c)."""

from __future__ import annotations

import struct
from typing import BinaryIO, Iterator, Tuple


class IVFWriter:
    def __init__(self, f: BinaryIO, width: int, height: int, fps_num: int, fps_denom: int):
        self.f = f
        self.count = 0
        self._header_pos = f.tell()
        f.write(
            struct.pack(
                "<4sHH4sHHIII4x",
                b"DKIF", 0, 32, b"AV01",
                width, height, fps_num, fps_denom, 0,
            )
        )

    def write_frame(self, payload: bytes, pts: int):
        self.f.write(struct.pack("<IQ", len(payload), pts))
        self.f.write(payload)
        self.count += 1

    def finalize(self):
        end = self.f.tell()
        self.f.seek(self._header_pos + 24)
        self.f.write(struct.pack("<I", self.count))
        self.f.seek(end)


def read_ivf(f: BinaryIO) -> Iterator[Tuple[int, bytes]]:
    hdr = f.read(32)
    magic, version, hdr_sz, fourcc = struct.unpack("<4sHH4s", hdr[:12])
    if magic != b"DKIF":
        raise ValueError("not an IVF file")
    f.seek(hdr_sz)
    while True:
        fh = f.read(12)
        if len(fh) < 12:
            return
        size, pts = struct.unpack("<IQ", fh)
        yield pts, f.read(size)
