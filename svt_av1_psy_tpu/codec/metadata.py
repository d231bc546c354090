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


METADATA_TYPE_ITUT_T35 = 4


def dv_rpu_t35(rpu: bytes) -> bytes:
    """Dolby Vision RPU -> ITU-T T.35 metadata payload ("Dolby Vision
    Streams Within the AV1 Format": country 0xB5, provider 0x003B,
    provider-oriented code 0x0800, then the emdf/RPU bytes). The
    reference attaches these per frame via libdovi
    (app_config.c:413-420, app_process_cmd.c)."""
    return b"\xb5\x00\x3b\x08\x00" + rpu


def parse_rpu_file(data: bytes) -> list:
    """Per-frame RPU list from a dovi_tool-style binary (Annex-B NAL
    units separated by 0x000001 / 0x00000001 start codes)."""
    out = []
    i = 0
    n = len(data)
    starts = []
    while i < n - 2:
        if data[i] == 0 and data[i + 1] == 0:
            if data[i + 2] == 1:
                starts.append((i, i + 3))
                i += 3
                continue
            if i < n - 3 and data[i + 2] == 0 and data[i + 3] == 1:
                starts.append((i, i + 4))
                i += 4
                continue
        i += 1
    for k, (s, body) in enumerate(starts):
        end = starts[k + 1][0] if k + 1 < len(starts) else n
        if end > body:
            out.append(data[body:end])
    if not out and data:
        out = [data]     # single raw RPU, no start codes
    return out


def encode_hdr10plus(m: dict) -> bytes:
    """hdr10plus_tool JSON frame object -> ST 2094-40 T.35 payload
    (single-window subset: country 0xB5, provider 0x003C,
    provider-oriented 0x0001, application_identifier 4). Field names
    follow hdr10plus_tool's "SceneInfo" entries."""
    bits = []

    def put(v, n):
        for b in range(n - 1, -1, -1):
            bits.append((int(v) >> b) & 1)

    put(4, 8)                                    # application_identifier
    put(m.get("ApplicationVersion", 1), 8)       # application_version
    put(1, 2)                                    # num_windows (1)
    put(m.get("TargetedSystemDisplayMaximumLuminance", 0), 27)
    put(0, 1)                                    # ..._actual_peak_flag
    for i in range(3):
        scl = m.get("LuminanceParameters", {}).get("MaxScl", [0, 0, 0])
        put(min(int(scl[i]), (1 << 17) - 1), 17)
    lp = m.get("LuminanceParameters", {})
    put(min(int(lp.get("AverageRGB", 0)), (1 << 17) - 1), 17)
    dist = lp.get("LuminanceDistributions", {})
    pcts = dist.get("DistributionIndex", [])
    vals = dist.get("DistributionValues", [])
    put(len(pcts), 4)                            # num_distribution...
    for p, v in zip(pcts, vals):
        put(int(p), 7)
        put(min(int(v), (1 << 17) - 1), 17)
    put(0, 10)                                   # fraction_bright_pixels
    put(0, 1)                                    # mastering_display_..._flag
    bc = m.get("BezierCurveData")
    if bc:
        put(1, 1)                                # tone_mapping_flag
        put(int(bc.get("KneePointX", 0)), 12)
        put(int(bc.get("KneePointY", 0)), 12)
        anchors = bc.get("Anchors", [])
        put(len(anchors), 4)
        for a in anchors:
            put(int(a), 10)
    else:
        put(0, 1)
    put(0, 1)                                    # color_saturation_..._flag
    while len(bits) % 8:
        bits.append(0)
    payload = bytes(int("".join(map(str, bits[i : i + 8])), 2)
                    for i in range(0, len(bits), 8))
    return b"\xb5\x00\x3c\x00\x01" + payload
