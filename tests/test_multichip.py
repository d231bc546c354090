"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The critical property: the bitstream must not depend on the device count.
Blocks are independent in the open-loop search, so sharding the block axis
over any mesh is value-identical — asserted here both at the decision level
and end-to-end at the bitstream level (enc_handle.c:2254-2316's thread
arrays have the same invariant: thread count never changes the stream).
"""

import numpy as np
import pytest

import jax

from svt_av1_psy_tpu.parallel import (encode_mesh, set_encode_mesh,
                                      sharded_frame_step)

requires_8dev = pytest.mark.skipif(len(jax.devices()) < 8,
                                   reason="needs the virtual 8-device mesh")


def _frame(rng, W, H):
    y = (np.cumsum(rng.normal(0, 5, (H, W)), axis=1) + 128).clip(0, 255).astype(np.uint8)
    y[: H // 3, : W // 3] = np.add.outer(np.linspace(20, 200, H // 3),
                                         np.linspace(0, 30, W // 3)).astype(np.uint8)
    return y


@requires_8dev
def test_decisions_identical_across_meshes():
    from svt_av1_psy_tpu.codec.intra_rdo import search_intra_decisions

    rng = np.random.default_rng(3)
    y = _frame(rng, 192, 128).astype(np.uint16)
    results = {}
    for n in (1, 2, 8):
        set_encode_mesh(encode_mesh(n))
        try:
            results[n] = search_intra_decisions(y, 100, 8)
        finally:
            set_encode_mesh(None)
    base = results[1]
    for n in (2, 8):
        for S in base.modes:
            assert np.array_equal(base.modes[S], results[n].modes[S]), (n, S)
            assert np.array_equal(base.tx_types[S], results[n].tx_types[S]), (n, S)
        for S in base.parts:
            assert np.array_equal(base.parts[S], results[n].parts[S]), (n, S)


@requires_8dev
def test_bitstream_identical_across_meshes():
    """Full api encode: n_devices in {1, 2, 8} must emit identical bytes."""
    from svt_av1_psy_tpu.api import Encoder
    from svt_av1_psy_tpu.config import EncoderConfig

    rng = np.random.default_rng(4)
    W, H = 192, 128
    y = _frame(rng, W, H)
    u = np.full((H // 2, W // 2), 120, np.uint8)
    streams = {}
    for n in (1, 2, 8):
        set_encode_mesh(encode_mesh(n))
        try:
            cfg = EncoderConfig(look_ahead_distance=0, width=W, height=H, preset=6)
            cfg.qp = 35
            enc = Encoder(cfg).init()
            enc.send_picture(y, u, u.copy())
            streams[n] = enc.get_packet().data
        finally:
            set_encode_mesh(None)
    assert streams[1] == streams[2] == streams[8], (
        f"bitstreams differ across meshes: {len(streams[1])}/"
        f"{len(streams[2])}/{len(streams[8])} bytes")


@requires_8dev
def test_sharded_frame_step_runs():
    """The multi-chip step (DP x SP axes + RC reduction) executes and its
    per-block outputs match the single-device search."""
    from svt_av1_psy_tpu.codec.intra_rdo import (_block_refs,
                                                 _qsteps_for_blocks,
                                                 search_tables_for_depth)
    from svt_av1_psy_tpu.codec.rd import lambda_sse_per_bit
    from svt_av1_psy_tpu.ops.intra_search import search_block_batch_np

    mesh = encode_mesh(8)
    fp, tp = mesh.devices.shape
    S = 8
    rng = np.random.default_rng(7)
    ph, pw = 32, 64
    frames, refs, qdcs, qacs = [], [], [], []
    for _ in range(fp):
        plane = rng.integers(0, 255, (ph, pw)).astype(np.uint16)
        b = (plane.reshape(ph // S, S, pw // S, S).transpose(0, 2, 1, 3)
             .reshape(-1, S, S).astype(np.float32))
        r = _block_refs(plane, S, 8)
        qd, qa = _qsteps_for_blocks(ph // S, pw // S, S, 100, None, 0, 8)
        frames.append(b); refs.append(r); qdcs.append(qd); qacs.append(qa)
    tables, n_tx = search_tables_for_depth(S, 100, (S,), None)
    lam = np.float32(lambda_sse_per_bit(100, 8, "kf"))
    bm, bt, bc, fcost = sharded_frame_step(
        mesh, np.stack(frames), np.stack(refs), np.stack(qdcs),
        np.stack(qacs), lam, tables, S=S, n_tx=n_tx)
    bm = np.asarray(bm)
    assert np.isfinite(np.asarray(fcost)).all()
    # cross-check frame 0 against the host golden model
    g_bm, g_bt, g_bc, _ = search_block_batch_np(
        frames[0], refs[0], qdcs[0], qacs[0], float(lam), tables["G"],
        tables["scan2d"], tables["scans_tx"], tables["tvs"], tables["ths"],
        tables["level_bits"], tables["eob_bits"], tables["txb_skip"],
        tables["y_mode_bits"], tables["ext_tx_bits"], tables["qm_w"],
        S=S, n_tx=n_tx)
    assert np.array_equal(bm[0], g_bm)


@requires_8dev
def test_inter_device_search_identical_across_meshes():
    """The device inter search (ops/inter_search) must make identical
    decisions — and therefore produce identical bitstreams — on 1/2/8-device
    meshes."""
    from svt_av1_psy_tpu.api import Encoder
    from svt_av1_psy_tpu.config import EncoderConfig

    rng = np.random.default_rng(7)
    W, H = 192, 128
    base = (np.cumsum(rng.normal(0, 4, (H, W + 40)), axis=1) + 128).clip(0, 255)
    ys = [np.clip(base[:, 3 * i : 3 * i + W] + rng.normal(0, 3, (H, W)),
                  0, 255).astype(np.uint8) for i in range(6)]
    u = np.full((H // 2, W // 2), 120, np.uint8)

    def run():
        cfg = EncoderConfig(width=W, height=H, preset=8,
                            inter_me_backend="device")
        cfg.qp = 40
        enc = Encoder(cfg).init()
        for i, y in enumerate(ys):
            enc.send_picture(y, u, u.copy(), pts=i)
        enc.flush()
        out = b""
        while (p := enc.get_packet()) is not None:
            out += p.data
        return out

    streams = {}
    for n in (1, 2, 8):
        set_encode_mesh(encode_mesh(n))
        try:
            streams[n] = run()
        finally:
            set_encode_mesh(None)
    assert streams[1] == streams[2] == streams[8], \
        {k: len(v) for k, v in streams.items()}
