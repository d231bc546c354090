#!/usr/bin/env python
"""Extract the AV1 1-D transform butterfly dataflow graphs as data.

The AV1 forward/inverse integer transforms are normative butterfly networks
(AV1 spec §7.13.3 / the reference's inv_transforms.c + transforms.c). Each
stage assigns every lane one of a handful of ops. We parse the C bodies into
a JSON op-graph consumed by svt_av1_psy_tpu/codec/txfm_graphs.py, which
evaluates them as vectorized ops over batches of blocks (TPU-friendly).

Op encodings (per output lane, per stage):
  ["in", j]                input permutation (stage 1 only)
  ["cp", j]  / ["ng", j]   copy / negate lane j of previous stage
  ["add", a, b] / ["sub", a, b]   a+b / a-b, clamped on the inverse side
  ["btf", sa, ca, a, sb, cb, b]   round_shift(sa*cospi[ca]*x[a] +
                                              sb*cospi[cb]*x[b], cos_bit)
Run: python tools/extract_txfm_graphs.py
"""

import json
import re
import sys
from pathlib import Path

REF = Path("/root/reference/Source/Lib/Codec")
OUT = Path(__file__).resolve().parent.parent / "svt_av1_psy_tpu" / "codec" / "tables" / "txfm_graphs.json"

FUNCS = {
    # name in output : (file, c function name)
    "idct4": ("inv_transforms.c", "svt_av1_idct4_new"),
    "idct8": ("inv_transforms.c", "svt_av1_idct8_new"),
    "idct16": ("inv_transforms.c", "svt_av1_idct16_new"),
    "idct32": ("inv_transforms.c", "svt_av1_idct32_new"),
    "idct64": ("inv_transforms.c", "svt_av1_idct64_new"),
    "iadst8": ("inv_transforms.c", "svt_av1_iadst8_new"),
    "iadst16": ("inv_transforms.c", "svt_av1_iadst16_new"),
    "fdct4": ("transforms.c", "svt_av1_fdct4_new"),
    "fdct8": ("transforms.c", "svt_av1_fdct8_new"),
    "fdct16": ("transforms.c", "svt_av1_fdct16_new"),
    "fdct32": ("transforms.c", "svt_av1_fdct32_new"),
    "fdct64": ("transforms.c", "svt_av1_fdct64_new"),
    "fadst8": ("transforms.c", "svt_av1_fadst8_new"),
    "fadst16": ("transforms.c", "svt_av1_fadst16_new"),
}

LINE_RE = re.compile(r"bf1\[(\d+)\]\s*=\s*(.+?);")


def parse_rhs(rhs: str):
    rhs = rhs.strip()
    m = re.fullmatch(r"clamp_value\((.+),\s*stage_range\[stage\]\)", rhs)
    if m:
        rhs = m.group(1).strip()
    m = re.fullmatch(r"(-?)input\[(\d+)\]", rhs)
    if m:
        return ["in", int(m.group(2))] if not m.group(1) else ["inng", int(m.group(2))]
    m = re.fullmatch(r"(-?)input\[(\d+)\]\s*([+-])\s*input\[(\d+)\]", rhs)
    if m:
        neg0, a, op, b = m.group(1), int(m.group(2)), m.group(3), int(m.group(4))
        if not neg0:
            return ["addin", a, b] if op == "+" else ["subin", a, b]
        assert op == "+", rhs
        return ["subin", b, a]
    m = re.fullmatch(r"(-?)bf0\[(\d+)\]", rhs)
    if m:
        return ["ng" if m.group(1) else "cp", int(m.group(2))]
    m = re.fullmatch(r"(-?)bf0\[(\d+)\]\s*([+-])\s*bf0\[(\d+)\]", rhs)
    if m:
        neg0, a, op, b = m.group(1), int(m.group(2)), m.group(3), int(m.group(4))
        if not neg0:
            return ["add", a, b] if op == "+" else ["sub", a, b]
        # -a + b == sub(b, a); -a - b unused
        assert op == "+", rhs
        return ["sub", b, a]
    m = re.fullmatch(
        r"half_btf\((-?)cospi\[(\d+)\],\s*bf0\[(\d+)\],\s*(-?)cospi\[(\d+)\],\s*bf0\[(\d+)\],\s*cos_bit\)",
        rhs,
    )
    if m:
        sa = -1 if m.group(1) else 1
        sb = -1 if m.group(4) else 1
        return ["btf", sa, int(m.group(2)), int(m.group(3)), sb, int(m.group(5)), int(m.group(6))]
    raise ValueError(f"unparsed rhs: {rhs!r}")


def strip_comments(text: str) -> str:
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    text = re.sub(r"//[^\n]*", " ", text)
    return text


def extract_func(text: str, cname: str):
    m = re.search(rf"void {re.escape(cname)}\(", text)
    if not m:
        raise ValueError(f"function {cname} not found")
    start = text.index("{", m.end())
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                break
    body = text[start : i + 1]
    # split stages on '// stage N' markers, then strip comments per chunk
    chunks = re.split(r"//\s*stage \d+;?", body)[1:]
    stages = []
    for chunk in chunks:
        chunk = strip_comments(chunk)
        ops = {}
        for am in LINE_RE.finditer(chunk):
            ops[int(am.group(1))] = parse_rhs(am.group(2))
        if not ops:
            continue
        n = max(ops) + 1
        assert sorted(ops) == list(range(n)), (cname, sorted(ops))
        stages.append([ops[i] for i in range(n)])
    return stages


def main():
    graphs = {}
    for name, (fname, cname) in FUNCS.items():
        text = (REF / fname).read_text()
        stages = extract_func(text, cname)
        n = len(stages[0])
        # sanity: every stage same width, ops reference valid lanes
        for st in stages:
            assert len(st) == n, (name, len(st), n)
        graphs[name] = {"n": n, "stages": stages}
        nbtf = sum(1 for st in stages for op in st if op[0] == "btf")
        print(f"{name}: {len(stages)} stages, n={n}, {nbtf} btf ops")
    OUT.write_text(json.dumps(graphs))
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    sys.exit(main())
