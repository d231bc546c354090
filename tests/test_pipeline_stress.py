"""Concurrency stress: interleaved encoder sessions with different bit
depths and frame shapes share the process-global inter-search pipeline
(parallel/pipeline.get_pipeline swaps the singleton on parameter change
while the previous worker may still be mid-chunk). The reference's
analog is its TSan CMake config over the SRM thread graph
(CMakeLists.txt:209-216); here the invariant is determinism: bitstreams
produced under contention must equal the ones produced alone."""

import numpy as np

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.config import EncoderConfig


def _clip(W, H, n, bd, seed):
    rng = np.random.default_rng(seed)
    base = (np.cumsum(rng.normal(0, 4, (H + 64, W + 64)), axis=1) + 128)
    base = base.clip(0, 255).astype(np.uint8)
    fs = [base[i * 2 : i * 2 + H, i * 3 : i * 3 + W].copy() for i in range(n)]
    if bd > 8:
        fs = [f.astype(np.uint16) << (bd - 8) for f in fs]
    u = np.full((H // 2, W // 2), 118 << (bd - 8),
                np.uint16 if bd > 8 else np.uint8)
    v = np.full((H // 2, W // 2), 137 << (bd - 8),
                np.uint16 if bd > 8 else np.uint8)
    return fs, u, v


def _session(W, H, bd, seed):
    cfg = EncoderConfig(width=W, height=H, preset=8, input_depth=bd)
    cfg.qp = 40
    cfg.inter_me_backend = "device"     # force the shared pipeline path
    return Encoder(cfg).init(), _clip(W, H, 8, bd, seed)


def _drain(enc, out):
    while (p := enc.get_packet()) is not None:
        out.append(p.data)


def _encode_alone(W, H, bd, seed):
    enc, (fs, u, v) = _session(W, H, bd, seed)
    out = []
    for f in fs:
        enc.send_picture(f, u, v.copy())
        _drain(enc, out)
    enc.flush()
    _drain(enc, out)
    if getattr(enc, "_me_pipe", None) is not None:
        enc._me_pipe.drain()
    return b"".join(out)


def test_interleaved_sessions_deterministic():
    solo_a = _encode_alone(192, 128, 8, seed=1)
    solo_b = _encode_alone(128, 192, 10, seed=2)

    enc_a, (fa, ua, va) = _session(192, 128, 8, seed=1)
    enc_b, (fb, ub, vb) = _session(128, 192, 10, seed=2)
    out_a, out_b = [], []
    for i in range(8):
        enc_a.send_picture(fa[i], ua, va.copy())
        enc_b.send_picture(fb[i], ub, vb.copy())
        _drain(enc_a, out_a)
        _drain(enc_b, out_b)
    enc_a.flush()
    _drain(enc_a, out_a)
    enc_b.flush()
    _drain(enc_b, out_b)
    for enc in (enc_a, enc_b):
        if getattr(enc, "_me_pipe", None) is not None:
            enc._me_pipe.drain()

    assert b"".join(out_a) == solo_a
    assert b"".join(out_b) == solo_b
