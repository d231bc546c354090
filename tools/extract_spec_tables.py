#!/usr/bin/env python
"""Extract AV1 *specification constants* from the reference C sources as data.

These tables (default CDFs, quantizer lookup curves, coefficient scan orders)
are normative constants from the AV1 bitstream specification — identical in
every conformant codebase (libaom, dav1d, SVT-AV1, rav1e). We extract them as
.npz DATA, not code:

  - default symbol CDFs        Source/Lib/Codec/cabac_context_model.c
    (AV1 spec "Default CDF Tables"; stored in inverted AOM_ICDF form,
     icdf[i] = 32768 - cdf[i], with a trailing adaptation counter element)
  - dc/ac quantizer lookups    Source/Lib/Codec/inv_transforms.c:3263-3366
    (AV1 spec dc_q / ac_q tables, 8/10/12-bit)
  - coefficient scan orders    Source/Lib/Codec/coefficients.h
    (AV1 spec scan tables + the [tx_size][tx_type] -> scan mapping)

Output: svt_av1_psy_tpu/codec/tables/av1_spec_tables.npz
Run:    python tools/extract_spec_tables.py
"""

import json
import re
import sys
from pathlib import Path

import numpy as np

REF = Path("/root/reference/Source/Lib/Codec")
OUT_DIR = Path(__file__).resolve().parent.parent / "svt_av1_psy_tpu" / "codec" / "tables"

CDF_PROB_TOP = 1 << 15


def strip_comments(text: str) -> str:
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    text = re.sub(r"//[^\n]*", " ", text)
    return text


def expand_cdf_macros(body: str) -> str:
    """AOM_CDFn(a0..an-1) -> '32768-a0, ..., 0, 0' ; AOM_ICDF(x) -> 32768-x."""

    def repl_cdf(m):
        args = [int(eval(a, {"__builtins__": {}})) for a in m.group(2).replace("\n", " ").split(",")]
        n = int(m.group(1))
        assert len(args) == n - 1, (n, args)
        vals = [CDF_PROB_TOP - a for a in args] + [0, 0]
        return ", ".join(str(v) for v in vals)

    body = re.sub(r"AOM_CDF(\d+)\(([^()]*)\)", repl_cdf, body)
    body = re.sub(r"AOM_ICDF\(([^()]*)\)", lambda m: str(CDF_PROB_TOP - int(m.group(1))), body)
    return body


def parse_braced(body: str):
    """Parse a fully-braced C initializer into nested Python lists."""
    body = body.replace("{", "[").replace("}", "]")
    body = re.sub(r",\s*\]", "]", body)  # trailing commas
    import ast

    return ast.literal_eval(body)


def to_array(nested, name):
    try:
        arr = np.array(nested)
        if arr.dtype == object:
            raise ValueError("ragged")
        return arr
    except ValueError:
        # ragged bracing: flatten
        flat = []

        def rec(x):
            if isinstance(x, list):
                for y in x:
                    rec(y)
            else:
                flat.append(x)

        rec(nested)
        print(f"  [flat] {name}: ragged bracing, stored flat ({len(flat)})")
        return np.array(flat)


def grab_tables(text: str, decl_re: str):
    """Yield (name, dims_text, init_body) for each table declaration."""
    for m in re.finditer(decl_re, text):
        name = m.group("name")
        start = text.index("{", m.end() - 1)
        depth = 0
        for i in range(start, len(text)):
            if text[i] == "{":
                depth += 1
            elif text[i] == "}":
                depth -= 1
                if depth == 0:
                    yield name, m.group(0), text[start : i + 1]
                    break


def extract_cdfs(tables: dict):
    text = strip_comments((REF / "cabac_context_model.c").read_text())
    decl = r"(?:static\s+)?const\s+AomCdfProb\s+(?P<name>\w+)\s*(?:\[[^\]]*\])+\s*=\s*\{"
    count = 0
    for name, _, body in grab_tables(text, decl):
        arr = to_array(parse_braced(expand_cdf_macros(body)), name)
        key = name.replace("svt_aom_", "").replace("av1_default_", "").replace("default_", "")
        key = re.sub(r"_cdfs?$", "", key)
        tables[f"cdf_{key}"] = arr.astype(np.uint16)
        count += 1
    print(f"CDF tables: {count}")


def extract_qlookup(tables: dict):
    text = strip_comments((REF / "inv_transforms.c").read_text())
    decl = r"static\s+const\s+int16_t\s+(?P<name>[da]c_qlookup(?:_1[02])?_QTX)\s*\[[^\]]*\]\s*=\s*\{"
    count = 0
    for name, _, body in grab_tables(text, decl):
        arr = to_array(parse_braced(body), name)
        tables[name.lower().replace("_qtx", "")] = arr.astype(np.int16)
        count += 1
    assert count == 6, count
    print(f"Quant lookup tables: {count}")


def extract_scans(tables: dict):
    text = strip_comments((REF / "coefficients.h").read_text())
    decl = (
        r"DECLARE_ALIGNED\(\s*16\s*,\s*static\s+const\s+int16_t\s*,\s*"
        r"(?P<name>\w+)\s*\[\s*(?P<len>\d+)\s*\]\s*\)\s*=\s*\{"
    )
    count = 0
    for m in re.finditer(decl, text):
        name, length = m.group("name"), int(m.group("len"))
        start = text.index("{", m.end() - 1)
        end = text.index("}", start)
        vals = [int(v) for v in text[start + 1 : end].replace("\n", " ").split(",") if v.strip()]
        assert len(vals) == length, (name, len(vals), length)
        if "neighbors" in name:
            continue  # legacy VP9-style neighbor tables, unused by LV_MAP coding
        tables[f"scan_{name}"] = np.array(vals, dtype=np.int16)
        count += 1
    print(f"Scan tables: {count}")

    # the [tx_size][tx_type] -> scan-array-name mapping
    m = re.search(r"av1_scan_orders\[TX_SIZES_ALL\]\[TX_TYPES\]\s*=\s*\{", text)
    start = text.index("{", m.end() - 1)
    depth, i = 0, start
    for i in range(start, len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                break
    body = text[start : i + 1]
    rows = re.findall(r"\{\s*(\w+)\s*,\s*(\w+)\s*,\s*\w+\s*\}", body)
    assert len(rows) == 19 * 16, len(rows)
    mapping = [[rows[ts * 16 + tt][0] for tt in range(16)] for ts in range(19)]
    (OUT_DIR / "scan_order_map.json").write_text(json.dumps(mapping, indent=0))
    print(f"Scan order map: {len(rows)} entries")


def extract_nz_map_ctx_offsets(tables: dict):
    """Per-position coeff_base context offsets (spec get_nz_map_ctx tables)."""
    text = strip_comments((REF / "coefficients.h").read_text())
    arrays = {}
    decl = r"static\s+const\s+int8_t\s+(?P<name>eb_av1_nz_map_ctx_offset_\w+)\s*\[\s*(?P<len>\d+)\s*\]\s*=\s*\{"
    for m in re.finditer(decl, text):
        name, length = m.group("name"), int(m.group("len"))
        start = text.index("{", m.end() - 1)
        end = text.index("}", start)
        vals = [int(v) for v in text[start + 1 : end].split(",") if v.strip()]
        assert len(vals) == length, (name, len(vals), length)
        arrays[name] = np.array(vals, dtype=np.int8)
    m = re.search(r"eb_av1_nz_map_ctx_offset\[19\]\s*=\s*\{(.*?)\};", text, flags=re.S)
    names = re.findall(r"(eb_av1_nz_map_ctx_offset_\w+)", m.group(1))
    assert len(names) == 19, len(names)
    for ts, name in enumerate(names):
        tables[f"nzmap_ctx_offset_ts{ts}"] = arrays[name]
    print(f"nz_map ctx offset tables: 19 (from {len(arrays)} arrays)")


def extract_interp_filters(tables: dict):
    """Subpel interpolation kernels (spec §7.11.3.3 constants)."""
    text = strip_comments((REF / "inter_prediction.c").read_text())
    decl = r"DECLARE_ALIGNED\(256,\s*const\s+InterpKernel,\s*(?P<name>\w+)\[SUBPEL_SHIFTS\]\)\s*=\s*\{"
    count = 0
    for name, _, body in grab_tables(text, decl):
        arr = to_array(parse_braced(body), name)
        assert arr.shape == (16, 8), (name, arr.shape)
        tables[f"interp_{name}"] = arr.astype(np.int16)
        count += 1
    print(f"Interp filter kernels: {count}")


def main():
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    tables = {}
    extract_cdfs(tables)
    extract_qlookup(tables)
    extract_scans(tables)
    extract_nz_map_ctx_offsets(tables)
    extract_interp_filters(tables)
    out = OUT_DIR / "av1_spec_tables.npz"
    np.savez_compressed(out, **tables)
    print(f"wrote {out} ({out.stat().st_size} bytes, {len(tables)} arrays)")


if __name__ == "__main__":
    sys.exit(main())
