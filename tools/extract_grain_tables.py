#!/usr/bin/env python
"""Extract the normative film-grain gaussian sequence (spec §7.18.3.2 constant,
2048 entries) into codec/tables/av1_grain_tables.npz."""

import re
from pathlib import Path

import numpy as np

REF = Path("/root/reference/Source/Lib/Codec/grainSynthesis.c")
OUT = Path(__file__).resolve().parent.parent / "svt_av1_psy_tpu" / "codec" / "tables"


def main():
    text = REF.read_text()
    m = re.search(r"gaussian_sequence\[2048\]\s*=\s*\{(.*?)\};", text, re.S)
    nums = [int(t) for t in re.findall(r"-?\d+", m.group(1))]
    assert len(nums) == 2048
    np.savez_compressed(OUT / "av1_grain_tables.npz",
                        gaussian_sequence=np.array(nums, np.int16))
    print("gaussian_sequence extracted")


if __name__ == "__main__":
    main()
