"""Y4M (YUV4MPEG2) reader/writer (reference: Source/App/app_input_y4m.c)."""

from __future__ import annotations

import io
from dataclasses import dataclass
from typing import BinaryIO, Iterator, Optional, Tuple

import numpy as np


@dataclass
class Y4MHeader:
    width: int
    height: int
    fps_num: int = 30
    fps_denom: int = 1
    interlace: str = "p"
    aspect_num: int = 0
    aspect_denom: int = 0
    colorspace: str = "420mpeg2"  # default per spec

    @property
    def bit_depth(self) -> int:
        if self.colorspace.endswith("p10"):
            return 10
        if self.colorspace.endswith("p12"):
            return 12
        return 8

    @property
    def subsampling(self) -> Tuple[int, int]:
        cs = self.colorspace
        if cs.startswith("420") or cs.startswith("mono"):
            return (1, 1)
        if cs.startswith("422"):
            return (1, 0)
        if cs.startswith("444"):
            return (0, 0)
        raise ValueError(f"unsupported colorspace {cs}")

    @property
    def is_mono(self) -> bool:
        return self.colorspace.startswith("mono")


def _parse_ratio(tok: str) -> Tuple[int, int]:
    n, d = tok.split(":")
    return int(n), int(d)


class Y4MReader:
    def __init__(self, f: BinaryIO):
        self.f = f
        line = b""
        while not line.endswith(b"\n"):
            c = f.read(1)
            if not c:
                raise ValueError("truncated y4m header")
            line += c
        parts = line.decode("ascii").strip().split(" ")
        if parts[0] != "YUV4MPEG2":
            raise ValueError("not a y4m stream")
        h = Y4MHeader(0, 0)
        for tok in parts[1:]:
            if not tok:
                continue
            key, val = tok[0], tok[1:]
            if key == "W":
                h.width = int(val)
            elif key == "H":
                h.height = int(val)
            elif key == "F":
                h.fps_num, h.fps_denom = _parse_ratio(val)
            elif key == "I":
                h.interlace = val
            elif key == "A":
                h.aspect_num, h.aspect_denom = _parse_ratio(val)
            elif key == "C":
                h.colorspace = val
        if not (h.width and h.height):
            raise ValueError("y4m missing dimensions")
        self.header = h

    def frames(self) -> Iterator[Tuple[np.ndarray, Optional[np.ndarray], Optional[np.ndarray]]]:
        """Yield (y, u, v) planes; u/v are None for monochrome."""
        h = self.header
        dtype = np.uint8 if h.bit_depth == 8 else np.dtype("<u2")
        ss_x, ss_y = (0, 0) if h.is_mono else h.subsampling
        cw = 0 if h.is_mono else (h.width + ss_x) >> ss_x
        ch = 0 if h.is_mono else (h.height + ss_y) >> ss_y
        while True:
            line = self.f.readline()
            if not line:
                return
            if not line.startswith(b"FRAME"):
                raise ValueError(f"bad frame marker {line[:20]!r}")
            y = self._read_plane(h.width, h.height, dtype)
            if h.is_mono:
                yield y, None, None
            else:
                u = self._read_plane(cw, ch, dtype)
                v = self._read_plane(cw, ch, dtype)
                yield y, u, v

    def _read_plane(self, w: int, hgt: int, dtype) -> np.ndarray:
        nbytes = w * hgt * np.dtype(dtype).itemsize
        raw = self.f.read(nbytes)
        if len(raw) != nbytes:
            raise ValueError("truncated y4m frame")
        return np.frombuffer(raw, dtype=dtype).reshape(hgt, w)


class Y4MWriter:
    def __init__(self, f: BinaryIO, header: Y4MHeader):
        self.f = f
        self.header = header
        hdr = f"YUV4MPEG2 W{header.width} H{header.height} F{header.fps_num}:{header.fps_denom} I{header.interlace} A{header.aspect_num}:{header.aspect_denom} C{header.colorspace}\n"
        f.write(hdr.encode("ascii"))

    def write_frame(self, y: np.ndarray, u: Optional[np.ndarray], v: Optional[np.ndarray]):
        self.f.write(b"FRAME\n")
        self.f.write(np.ascontiguousarray(y).tobytes())
        if u is not None:
            self.f.write(np.ascontiguousarray(u).tobytes())
            self.f.write(np.ascontiguousarray(v).tobytes())


def read_y4m(path) -> Tuple[Y4MHeader, list]:
    with open(path, "rb") as f:
        r = Y4MReader(f)
        return r.header, list(r.frames())
