"""Bitstream layer: daala range coder, raw bit writer, OBU assembly.

Host-side (entropy coding is inherently serial per tile — SURVEY.md §7).
Python reference implementation here; the C++ native module in
`svt_av1_psy_tpu/native` provides the production fast path and is tested
for bit-exact equivalence against this package.
"""
