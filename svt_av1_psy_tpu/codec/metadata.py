"""HDR metadata: mastering display (MDCV) + content light level (CLL).

String formats and fixed-point scaling mirror svt_aom_parse_mastering_display
/ svt_aom_parse_content_light_level (metadata_handle.c:153/:210); payloads
are the big-endian structs the reference emits raw into METADATA OBUs
(spec 6.7.3 metadata_hdr_cll / 6.7.4 metadata_hdr_mdcv).
"""

from __future__ import annotations

import re
import struct

METADATA_TYPE_HDR_CLL = 1
METADATA_TYPE_HDR_MDCV = 2


def _clip16(x: float) -> int:
    return max(0, min(65535, int(round(x))))


def parse_mastering_display(md_str: str) -> bytes | None:
    """"G(x,y)B(x,y)R(x,y)WP(x,y)L(max,min)" -> 24-byte MDCV payload
    (r, g, b, white point as u16 BE 0.16 chromaticities; max luminance
    u32 BE 24.8; min luminance u32 BE 18.14)."""
    if not md_str:
        return None
    vals = {}
    for key, a, b in re.findall(r"([GgBbRr]|[Ww][Pp]?|[Ll])\(([^,]+),([^)]+)\)",
                                md_str):
        vals[key[0].upper()] = (float(a), float(b))
    if not all(k in vals for k in "GBRWL"):
        return None
    r, g, b, wp = vals["R"], vals["G"], vals["B"], vals["W"]
    max_l, min_l = vals["L"]
    return struct.pack(
        ">8H2I",
        _clip16(r[0] * 65536), _clip16(r[1] * 65536),
        _clip16(g[0] * 65536), _clip16(g[1] * 65536),
        _clip16(b[0] * 65536), _clip16(b[1] * 65536),
        _clip16(wp[0] * 65536), _clip16(wp[1] * 65536),
        int(round(max_l * 256)) & 0xFFFFFFFF,
        int(round(min_l * 16384)) & 0xFFFFFFFF)


def parse_content_light(cll_str: str) -> bytes | None:
    """"max_cll,max_fall" -> 4-byte CLL payload (two u16 BE)."""
    if not cll_str:
        return None
    m = re.match(r"\s*(\d+)\s*,\s*(\d+)\s*$", cll_str)
    if not m:
        return None
    return struct.pack(">2H", min(int(m.group(1)), 65535),
                       min(int(m.group(2)), 65535))
