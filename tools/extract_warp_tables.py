#!/usr/bin/env python
"""Extract the warped-motion tables into codec/tables/av1_warp.npz:
- svt_aom_warped_filter (193 x 8 int16): the normative warp interpolation
  kernel (spec 7.11.3.3 constants; warped_motion.c)
- div_lut (257 uint16): the shear-parameter division LUT
  (resolve_divisor_*, warped_motion.c:298)
"""

import re
from pathlib import Path

import numpy as np

SRC = Path("/root/reference/Source/Lib/Codec/warped_motion.c")
OUT = Path(__file__).resolve().parent.parent / "svt_av1_psy_tpu" / "codec" / "tables"


def _nums(text, name, count):
    m = re.search(re.escape(name) + r"\[[^=]*=\s*\{(.*?)\n\};", text, re.S)
    body = m.group(1)
    # keep only the active preprocessor branch (WARPEDPIXEL_PREC_BITS == 6)
    for cut in ("#elif", "#else"):
        i = body.find(cut)
        if i >= 0:
            body = body[:i]
    body = "\n".join(l.split("//")[0] for l in body.splitlines()
                     if not l.strip().startswith("#"))
    # the reference writes some negatives as "- 1" (minus, space, digit)
    nums = [int(t.replace(" ", "")) for t in re.findall(r"-\s*\d+|\d+", body)]
    assert len(nums) == count, (name, len(nums))
    return nums


def main():
    text = SRC.read_text()
    wf = np.array(_nums(text, "svt_aom_warped_filter", 193 * 8),
                  np.int16).reshape(193, 8)
    dl = np.array(_nums(text, "div_lut", 257), np.uint16)
    np.savez_compressed(OUT / "av1_warp.npz", warped_filter=wf, div_lut=dl)
    print("warp tables extracted:", wf.shape, dl.shape)


if __name__ == "__main__":
    main()
