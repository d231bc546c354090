#!/usr/bin/env python
"""Extract the AV1 default quantizer-matrix constants (spec §9.5) from the
reference's q_matrices.h into codec/tables/av1_qm_tables.npz.

Data-only extraction (the values are normative spec constants); layout is
wt/iwt[NUM_QM_LEVELS=16][2 planes][QM_TOTAL_SIZE=3344], stored per adjusted
tx size in TX_SIZES_ALL order (md_config_process.c:232 svt_av1_qm_init).
"""

import re
from pathlib import Path

import numpy as np

REF = Path("/root/reference/Source/Lib/Codec")
OUT = Path(__file__).resolve().parent.parent / "svt_av1_psy_tpu" / "codec" / "tables"

NUM_QM_LEVELS = 16
QM_TOTAL_SIZE = 3344


def extract(name: str, text: str) -> np.ndarray:
    m = re.search(rf"{name}\[NUM_QM_LEVELS\]\[2\]\[QM_TOTAL_SIZE\]\s*=\s*\{{", text)
    assert m, name
    depth, i = 1, m.end()
    start = m.end()
    while depth:
        c = text[i]
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
        i += 1
    nums = [int(t) for t in re.findall(r"-?\d+", text[start : i - 1])]
    arr = np.array(nums, np.int32).reshape(NUM_QM_LEVELS, 2, QM_TOTAL_SIZE)
    return arr


def main():
    text = (REF / "q_matrices.h").read_text()
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    text = re.sub(r"//[^\n]*", "", text)
    wt = extract("wt_matrix_ref", text)
    iwt = extract("iwt_matrix_ref", text)
    assert wt.min() >= 0 and wt.max() <= 255
    np.savez_compressed(OUT / "av1_qm_tables.npz",
                        qm_wt=wt.astype(np.uint8), qm_iwt=iwt.astype(np.uint16))
    print("wt", wt.shape, "iwt", iwt.shape, "iwt max", iwt.max())


if __name__ == "__main__":
    main()
