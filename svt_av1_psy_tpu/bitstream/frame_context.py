"""Per-frame adaptive CDF context (the reference's FRAME_CONTEXT analog).

Holds mutable copies of all default CDF tables, indexed by name; symbols are
written through `write()` which also applies the normative per-symbol
adaptation (unless disable_cdf_update).
"""

from __future__ import annotations

import numpy as np

from ..codec.spec_tables import get_tables
from .range_coder import RangeEncoder, update_cdf


class FrameContext:
    def __init__(self, base_qindex: int, disable_cdf_update: bool = False):
        t = get_tables()
        self.disable_update = disable_cdf_update
        self.tables = {}
        for name in t.names():
            if name.startswith("cdf_"):
                self.tables[name[4:]] = np.array(t._raw[name], dtype=np.uint16, copy=True)
        self._add_nmv_tables()
        self.qctx = _coeff_qctx(base_qindex)
        # pre-slice the quantizer-context dimension of the coefficient CDFs
        for name in ("txb_skip", "eob_extra", "dc_sign", "coeff_base_multi",
                     "coeff_base_eob_multi", "coeff_lps_multi", "eob_multi16",
                     "eob_multi32", "eob_multi64", "eob_multi128", "eob_multi256",
                     "eob_multi512", "eob_multi1024"):
            self.tables[name] = self.tables[name][self.qctx].copy()

    def _add_nmv_tables(self):
        """default_nmv_context (cabac_context_model.c:677) as icdf arrays.

        Keys are per-component where applicable (dim 0 = vertical/horizontal,
        identical defaults)."""

        def icdf(probs, n):
            row = np.zeros(n + 1, np.uint16)
            row[: n - 1] = 32768 - np.asarray(probs, np.uint32)
            return row

        t = self.tables
        t["nmv_joints"] = icdf((4096, 11264, 19328), 4)
        comp = {
            "nmv_classes": icdf((28672, 30976, 31858, 32320, 32551, 32656,
                                 32740, 32757, 32762, 32767), 11),
            "nmv_class0_fp0": icdf((16384, 24576, 26624), 4),
            "nmv_class0_fp1": icdf((12288, 21248, 24128), 4),
            "nmv_fp": icdf((8192, 17408, 21248), 4),
            "nmv_sign": icdf((128 * 128,), 2),
            "nmv_class0_hp": icdf((160 * 128,), 2),
            "nmv_hp": icdf((128 * 128,), 2),
            "nmv_class0": icdf((216 * 128,), 2),
            "nmv_bits": np.stack([icdf((128 * v,), 2) for v in
                                  (136, 140, 148, 160, 176, 192, 224, 234, 234, 240)]),
        }
        for key, arr in comp.items():
            t[key] = np.stack([arr.copy(), arr.copy()])
        # the DV coder (intrabc) adapts its own nmv instance (ndvc)
        t["ndv_joints"] = t["nmv_joints"].copy()
        for key in comp:
            t["ndv" + key[3:]] = t[key].copy()

    def write(self, enc, name: str, idx: tuple, symbol: int, nsyms: int):
        cdf = self.tables[name]
        row = cdf[idx] if idx else cdf
        if self.disable_update:
            enc.encode_symbol(symbol, row, nsyms)
        else:
            enc.encode_symbol_adapt(symbol, row, nsyms)

    def row(self, name: str, idx: tuple):
        cdf = self.tables[name]
        return cdf[idx] if idx else cdf


def _coeff_qctx(base_qindex: int) -> int:
    if base_qindex <= 20:
        return 0
    if base_qindex <= 60:
        return 1
    if base_qindex <= 120:
        return 2
    return 3
