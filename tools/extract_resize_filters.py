#!/usr/bin/env python
"""Extract the resize/super-res filter tables into codec/tables/
av1_resize_filters.npz:

- av1_resize_filter_normative (64 phases x 8 taps): the NORMATIVE
  super-res upscaler kernel (spec 7.16; super_res.h:22)
- svt_aom_av1_filteredinterp_filters{500,625,750,875}: the reference's
  non-normative low-pass interpolators used for encoder-side downscaling
  (resize.c:34+, chosen by ratio in choose_interp_filter :262)
"""

import re
from pathlib import Path

import numpy as np

SUPER_RES_H = Path("/root/reference/Source/Lib/Codec/super_res.h")
RESIZE_C = Path("/root/reference/Source/Lib/Codec/resize.c")
OUT = Path(__file__).resolve().parent.parent / "svt_av1_psy_tpu" / "codec" / "tables"


def _table(text, name):
    m = re.search(re.escape(name) + r"\[[^=]*=\s*\{(.*?)\n\};", text, re.S)
    body = "\n".join(l for l in m.group(1).splitlines()
                     if not l.strip().startswith("#"))
    nums = [int(t) for t in re.findall(r"-?\d+", body)]
    arr = np.array(nums, np.int16).reshape(64, 8)
    return arr


def main():
    tables = {"normative": _table(SUPER_RES_H.read_text(),
                                  "av1_resize_filter_normative")}
    rc = RESIZE_C.read_text()
    for frac in (500, 625, 750, 875):
        tables[f"down{frac}"] = _table(
            rc, f"svt_aom_av1_filteredinterp_filters{frac}")
    np.savez_compressed(OUT / "av1_resize_filters.npz", **tables)
    print("resize filters extracted:", {k: v.shape for k, v in tables.items()})


if __name__ == "__main__":
    main()
