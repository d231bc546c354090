#!/usr/bin/env python
"""Extract the filter-intra 7-tap kernels (spec §7.11.2.3 constants,
5 modes x 8 positions) into codec/tables/av1_filter_intra.npz."""

import re
from pathlib import Path

import numpy as np

REF = Path("/root/reference/Source/Lib/C_DEFAULT/filterintra_c.c")
OUT = Path(__file__).resolve().parent.parent / "svt_av1_psy_tpu" / "codec" / "tables"


def main():
    text = REF.read_text()
    m = re.search(r"eb_av1_filter_intra_taps\[FILTER_INTRA_MODES\]\[8\]\[8\]\)"
                  r"\s*=\s*\{(.*?)\n\};", text, re.S)
    nums = [int(t) for t in re.findall(r"-?\d+", m.group(1))]
    arr = np.array(nums, np.int8).reshape(5, 8, 8)
    np.savez_compressed(OUT / "av1_filter_intra.npz", filter_intra_taps=arr)
    print("filter intra taps extracted", arr.shape)


if __name__ == "__main__":
    main()
