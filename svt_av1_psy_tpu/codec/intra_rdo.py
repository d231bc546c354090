"""Frame-level intra RDO: device search dispatch + partition DP.

The open-loop stage of the reference's EncDec hot loop, re-architected for
TPU (SURVEY §7 "decouple search from final encode"): the device scores every
block of every depth in a handful of big batched launches
(ops/intra_search.search_block_batch), then a bottom-up dynamic program
picks the partition tree per 64x64 superblock, exactly the NONE-vs-SPLIT
recursion of svt_aom_mode_decision_sb (product_coding_loop.c:10862) with
RD costs instead of its staged candidate loop.

The conformant encode pass (intra_encoder.py) consumes the resulting
IntraDecisions: partition map + per-block (y mode, tx type).
"""

from __future__ import annotations

import functools as _functools
from dataclasses import dataclass, field

import numpy as np

from .constants import PartitionType, PredictionMode, TxSize, TxType
from .quant import TX_SCALE
from .rd import intra_rate_model, lambda_sse_per_bit
from .spec_tables import get_tables
from ..ops.intra_search import ALL_MODES as _ALL_MODES_ORDER

_S_TO_TXSIZE = {4: int(TxSize.TX_4X4), 8: int(TxSize.TX_8X8),
                16: int(TxSize.TX_16X16), 32: int(TxSize.TX_32X32),
                64: int(TxSize.TX_64X64)}
_TXS_CTX = {8: 1, 16: 2, 32: 3, 64: 4}
_SIZE_LOG2M4 = {8: 2, 16: 4, 32: 6, 64: 6}
_BSL = {8: 0, 16: 1, 32: 2, 64: 3}


@dataclass
class IntraDecisions:
    """Per-frame search output consumed by the conformant encode pass.

    parts[S]: (rows, cols) bool grid, True = SPLIT at that square node
    modes[S]: (rows, cols) int grid of PredictionMode
    tx_types[S]: (rows, cols) int grid of TxType (DCT where not searched)
    """

    parts: dict = field(default_factory=dict)
    modes: dict = field(default_factory=dict)
    tx_types: dict = field(default_factory=dict)
    max_leaf: int = 32
    min_leaf: int = 8
    # rect[S]: (rows, cols) uint8 grid over SxS nodes: 0 = none/split (use
    # parts), 2 = PARTITION_HORZ, 3 = PARTITION_VERT
    # (product_coding_loop.c:9791 searches these shapes inline; here the
    # DP emits them as explicit per-node overrides)
    rect: dict = field(default_factory=dict)

    def rect_part(self, mi_row: int, mi_col: int, size: int) -> int:
        p = self.rect.get(size)
        if p is None:
            return 0
        r, c = (mi_row * 4) // size, (mi_col * 4) // size
        if r >= p.shape[0] or c >= p.shape[1]:
            return 0
        return int(p[r, c])

    def split(self, mi_row: int, mi_col: int, size: int) -> bool:
        p = self.parts.get(size)
        if p is None:
            return size > self.max_leaf
        r, c = (mi_row * 4) // size, (mi_col * 4) // size
        if r >= p.shape[0] or c >= p.shape[1]:
            return True
        return bool(p[r, c])

    def mode(self, mi_row: int, mi_col: int, W: int, H: int) -> int:
        s = min(W, H)
        while s not in self.modes and s > 4:
            s >>= 1
        m = self.modes.get(s)
        if m is None:
            return int(PredictionMode.DC_PRED)
        r = min((mi_row * 4) // s, m.shape[0] - 1)
        c = min((mi_col * 4) // s, m.shape[1] - 1)
        return int(m[r, c])

    def tx_type(self, mi_row: int, mi_col: int, W: int, H: int) -> int:
        if W != H:
            return int(TxType.DCT_DCT)
        t = self.tx_types.get(W)
        if t is None:
            return int(TxType.DCT_DCT)
        r = min((mi_row * 4) // W, t.shape[0] - 1)
        c = min((mi_col * 4) // W, t.shape[1] - 1)
        return int(t[r, c])


def _block_refs(src: np.ndarray, S: int, bd: int) -> np.ndarray:
    """(N, 1+4S) reference vectors for every SxS block of the padded plane,
    from *source* pixels (open loop), with the spec's unavailability
    substitutions at the frame edges (intra_encoder._gather_neighbors).
    Fully vectorized (sliding windows over the padded plane)."""
    from numpy.lib.stride_tricks import sliding_window_view

    ph, pw = src.shape
    rows, cols = ph // S, pw // S
    base = np.float32(1 << (bd - 1))
    s = src.astype(np.float32)
    L = 1 + 4 * S
    refs = np.empty((rows, cols, L), np.float32)

    # above: block (bi>0, bj) reads src[bi*S-1, bj*S : bj*S+2S], cols clipped
    ext_c = np.concatenate([s, np.repeat(s[:, -1:], 2 * S, axis=1)], axis=1)
    above_rows = ext_c[S - 1::S][: rows - 1]                    # (rows-1, pw+2S)
    aw = sliding_window_view(above_rows, 2 * S, axis=1)[:, ::S]  # (rows-1, cols, 2S)
    refs[1:, :, 1:1 + 2 * S] = aw[:, :cols]

    # left: block (bi, bj>0) reads src[bi*S : bi*S+2S, bj*S-1], rows clipped
    ext_r = np.concatenate([s, np.repeat(s[-1:, :], 2 * S, axis=0)], axis=0)
    left_cols = ext_r[:, S - 1::S][:, : cols - 1]                # (ph+2S, cols-1)
    lw = sliding_window_view(left_cols, 2 * S, axis=0)[::S]      # (rows, cols-1, 2S)
    refs[:, 1:, 1 + 2 * S:1 + 4 * S] = lw[:rows].transpose(0, 1, 2)

    # corners for interior blocks
    refs[1:, 1:, 0] = s[S - 1::S, S - 1::S][: rows - 1, : cols - 1]

    # frame-edge substitutions (spec 7.11.2 unavailable-reference rules):
    # no above -> above[:] = left[0] (or base-1); no left -> left[:] =
    # above[0] (or base+1); corner from the available side (or base)
    refs[0, 1:, 1:1 + 2 * S] = refs[0, 1:, 1 + 2 * S][:, None]
    refs[1:, 0, 1 + 2 * S:1 + 4 * S] = refs[1:, 0, 1][:, None]
    refs[0, 1:, 0] = refs[0, 1:, 1 + 2 * S]
    refs[1:, 0, 0] = refs[1:, 0, 1]
    refs[0, 0, 0] = base
    refs[0, 0, 1:1 + 2 * S] = base - 1
    refs[0, 0, 1 + 2 * S:] = base + 1
    return refs.reshape(rows * cols, L)


def _qsteps_for_blocks(rows, cols, S, qindex, sb_qindex_map, chroma_delta,
                       bd, seg_fn=None):
    """Per-block (dc_step, ac_step) in the orthonormal search domain."""
    t = get_tables()
    if sb_qindex_map is None:
        qmap = np.full((rows, cols), qindex, np.int32)
    else:
        rep = 64 // S
        qmap = np.repeat(np.repeat(sb_qindex_map, rep, 0), rep, 1)[:rows, :cols]
    qmap = np.clip(qmap, 1, 255)
    dc = np.array([t.dc_q(int(q), bd) for q in range(256)], np.float32)
    ac = np.array([t.ac_q(int(q), bd) for q in range(256)], np.float32)
    from ..ops.intra_search import coeff_gain

    g = coeff_gain(S)
    return (dc[qmap].reshape(-1) / g).astype(np.float32), \
        (ac[qmap].reshape(-1) / g).astype(np.float32)


@_functools.lru_cache(maxsize=64)
def _cached_tables(S: int, qctx_bucket: int, tx_search_depths, qm_levels,
                   psy_knobs=(0, 0.0, False)):
    tb, n_tx = _build_tables(S, {0: 10, 1: 40, 2: 90, 3: 160}[qctx_bucket],
                             tx_search_depths, qm_levels, *psy_knobs)
    return tb, n_tx


@_functools.lru_cache(maxsize=64)
def _device_tables(S: int, qctx_bucket: int, tx_search_depths, qm_levels,
                   psy_knobs=(0, 0.0, False)):
    """Device-resident copies of the per-depth search tables (uploaded once;
    each host->device transfer costs ~5 ms over the tunneled chip)."""
    import jax.numpy as jnp

    tb, n_tx = _cached_tables(S, qctx_bucket, tx_search_depths, qm_levels,
                              psy_knobs)
    dev = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
           for k, v in tb.items()}
    return dev, n_tx


def search_tables_for_depth(S: int, qindex: int, tx_search_depths=(8, 16),
                            qm_levels=None, psy_knobs=(0, 0.0, False)):
    from ..bitstream.frame_context import _coeff_qctx

    return _cached_tables(S, _coeff_qctx(int(qindex)),
                          tuple(tx_search_depths),
                          tuple(qm_levels) if qm_levels is not None else None,
                          tuple(psy_knobs))


def _build_tables(S: int, qindex: int, tx_search_depths=(8, 16),
                  qm_levels=None, spy_rd: int = 0, psy_rd: float = 0.0,
                  sharp_tx: bool = False):
    """All replicated table arrays one depth's search consumes, as a dict
    (the contract shared by search_intra_decisions and the multi-chip
    sharded_frame_step). Returns (tables, n_tx)."""
    from ..ops.intra_search import (EXT_TX_SET_1, EXT_TX_SET_2,
                                    mode_matrix_bank, tx_pair)
    from ..ops.intra_search import ALL_MODES

    t = get_tables()
    rm = intra_rate_model(int(qindex))
    y_mode_bits = np.array([rm.y_mode_bits[int(m)] for m in ALL_MODES],
                           np.float32)
    tx_size = _S_TO_TXSIZE[S]
    keep = min(S, 32)
    nk = keep * keep
    if qm_levels is not None:
        from .qm import get_qm

        _qm, iqm = get_qm(qm_levels[0], False, tx_size)
        qm_w = (iqm.astype(np.float32) / 32.0)
    else:
        qm_w = np.ones(nk, np.float32)
    ct = rm.coeff[_TXS_CTX[S]]
    eob_bits = rm.eob[_SIZE_LOG2M4[S]]
    scan2d = t.scan(tx_size, 0).astype(np.int32)
    do_tx = S in tx_search_depths
    if do_tx:
        from .intra_encoder import EXT_TX_IND_INTRA

        tx_set = EXT_TX_SET_1 if S == 8 else EXT_TX_SET_2
        eset = 1 if S == 8 else 2
        sqr = {8: 1, 16: 2}[S]
        tvs = np.stack([tx_pair(tt, S)[0] for tt in tx_set])
        ths = np.stack([tx_pair(tt, S)[1] for tt in tx_set])
        scans_tx = np.stack([t.scan(tx_size, int(tt)).astype(np.int32)
                             for tt in tx_set])
        ext_bits = np.array([rm.ext_tx_bits[(eset, sqr)][
            EXT_TX_IND_INTRA[eset][int(tt)]] for tt in tx_set], np.float32)
    else:
        from ..ops.intra_search import tx_pair as _tp
        from .constants import TxType as _TT

        tx_set = (TxType.DCT_DCT,)
        tvs = np.stack([tx_pair(TxType.DCT_DCT, S)[0]])
        ths = np.stack([tx_pair(TxType.DCT_DCT, S)[1]])
        scans_tx = scan2d[None]
        ext_bits = np.zeros(1, np.float32)
    from ..ops.intra_search import mode_matrix_bank

    # spy-rd per-mode distortion weights (pic_operators.c:247-258: bias
    # against blurry/neutral intra predictions; full spy-rd only)
    dist_w = np.ones(len(ALL_MODES), np.float32)
    if spy_rd == 1:
        for i, m in enumerate(ALL_MODES):
            mi = int(m)
            if mi in (0, 9, 10, 11) and psy_rd == 0.0:   # DC/SMOOTH family
                dist_w[i] = 1.25
            elif mi in (1, 2, 12):                        # V/H/PAETH
                dist_w[i] = 1.125
    tx_lam_scale = np.float32(0.25 if sharp_tx else 1.0)
    tables = {"G": mode_matrix_bank(S), "scan2d": scan2d, "scans_tx": scans_tx,
              "tvs": tvs, "ths": ths, "level_bits": ct["level_bits"],
              "eob_bits": eob_bits, "txb_skip": ct["txb_skip"],
              "y_mode_bits": y_mode_bits, "ext_tx_bits": ext_bits,
              "qm_w": qm_w, "tx_set": tx_set, "dist_w": dist_w,
              "tx_lam_scale": tx_lam_scale}
    return tables, len(tx_set)


def search_intra_decisions(
    src_padded: np.ndarray,       # (ph, pw) uint16, SB-aligned padded source
    qindex: int,
    bd: int = 8,
    sb_qindex_map=None,
    qm_levels=None,
    depths=(8, 16, 32),
    tx_search_depths=(8, 16),
    update_type: str = "kf",
    lambda_scale: float = 1.0,
    backend: str = "auto",
    psy_knobs=(0, 0.0, False),   # (spy_rd, psy_rd, sharp_tx)
) -> IntraDecisions:
    import jax.numpy as jnp

    from ..ops.intra_search import (EXT_TX_SET_1, EXT_TX_SET_2, coeff_gain,
                                    mode_matrix_bank, search_block_batch,
                                    tx_pair)

    t = get_tables()
    ph, pw = src_padded.shape
    lam = np.float32(lambda_sse_per_bit(qindex, bd, update_type) * lambda_scale)
    rm = intra_rate_model(int(qindex))
    y_mode_bits = np.zeros(len(_ALL_MODES_ORDER), np.float32)
    for i, m in enumerate(_ALL_MODES_ORDER):
        y_mode_bits[i] = rm.y_mode_bits[int(m)]

    dec = IntraDecisions(max_leaf=max(depths), min_leaf=min(depths))
    cost = {}
    # ---- host prep for every depth, then ONE fused device dispatch (each
    # launch pays a full host<->device round trip; fusing all depths into a
    # single jit cuts that to one per frame)
    payloads = []
    for S in depths:
        rows, cols = ph // S, pw // S
        if rows == 0 or cols == 0:
            continue
        refs = _block_refs(src_padded, S, bd)
        N = rows * cols
        blocks = (src_padded.reshape(rows, S, cols, S).transpose(0, 2, 1, 3)
                  .reshape(N, S, S).astype(np.float32))
        qdc, qac = _qsteps_for_blocks(rows, cols, S, qindex, sb_qindex_map,
                                      0, bd)
        tb, n_tx = search_tables_for_depth(S, qindex, tx_search_depths,
                                           qm_levels, psy_knobs)
        payloads.append(dict(S=S, rows=rows, cols=cols, N=N, blocks=blocks,
                             refs=refs, qdc=qdc, qac=qac, tb=tb, n_tx=n_tx))

    min_n = min(p["N"] for p in payloads)
    use_device = ((min_n >= 256 and backend != "numpy")
                  or backend == "device_all")
    if use_device:
        from ..bitstream.frame_context import _coeff_qctx
        from ..ops.intra_search import (mode_matrix_bank as _mmb,
                                        search_multi_depth,
                                        search_multi_depth_flat,
                                        unpack_multi_depth)
        from ..parallel import get_encode_mesh, shard_blocks
        from ..profiling import stage as _stage

        mesh = get_encode_mesh()
        bucket = _coeff_qctx(int(qindex))
        tx_key = tuple(tx_search_depths)
        qm_key = tuple(qm_levels) if qm_levels is not None else None
        args = []
        cfgs = []
        flats = []
        ns = []
        for p in payloads:
            N, S = p["N"], p["S"]
            npad = max(256, 1 << int(np.ceil(np.log2(N))))
            if mesh is not None:
                npad = -(-npad // mesh.devices.size) * mesh.devices.size
            blocks, refs, qdc, qac = p["blocks"], p["refs"], p["qdc"], p["qac"]
            if npad > N:
                pad = npad - N
                blocks = np.concatenate([blocks, np.zeros((pad, S, S), np.float32)])
                refs = np.concatenate([refs, np.zeros((pad, refs.shape[1]), np.float32)])
                qdc = np.concatenate([qdc, np.ones(pad, np.float32)])
                qac = np.concatenate([qac, np.ones(pad, np.float32)])
            ns.append(npad)
            dtb, n_tx = _device_tables(S, bucket, tx_key, qm_key,
                                       tuple(psy_knobs))
            cfgs.append((S, n_tx, npad, refs.shape[1]))
            if mesh is not None:
                # shard the block axis over every chip: blocks are
                # independent, so decisions (and the bitstream) are
                # identical for any mesh size
                blocks, refs, qdc, qac = shard_blocks(mesh, blocks, refs,
                                                      qdc, qac)
                args.append((blocks, refs, qdc, qac, dtb))
            else:
                flats += [blocks.ravel(), refs.ravel(), qdc, qac]
                args.append(dtb)
        with _stage("device:intra_search"):
            if mesh is not None:
                packed = search_multi_depth(tuple(args), lam,
                                            cfgs=tuple(c[:2] for c in cfgs))
            else:
                # one upload: every per-frame input in a single f32 vector
                flat = np.concatenate(flats)
                packed = search_multi_depth_flat(jnp.asarray(flat), lam,
                                                 tuple(args), cfgs=tuple(cfgs))
            outs = unpack_multi_depth(np.asarray(packed), ns)
    else:
        from ..ops.intra_search import search_block_batch_np

        outs = []
        for p in payloads:
            tb = p["tb"]
            bm, bt, bc, _ = search_block_batch_np(
                p["blocks"], p["refs"], p["qdc"], p["qac"], float(lam),
                mode_matrix_bank(p["S"]), tb["scan2d"], tb["scans_tx"],
                tb["tvs"], tb["ths"], tb["level_bits"], tb["eob_bits"],
                tb["txb_skip"], tb["y_mode_bits"], tb["ext_tx_bits"],
                tb["qm_w"], tb["dist_w"], float(tb["tx_lam_scale"]),
                S=p["S"], n_tx=p["n_tx"])
            outs.append((bm, bt, bc))

    for p, (bm, bt, bc) in zip(payloads, outs):
        S, N, rows, cols = p["S"], p["N"], p["rows"], p["cols"]
        bm = np.asarray(bm)[:N].reshape(rows, cols)
        bt = np.asarray(bt)[:N].reshape(rows, cols)
        cost[S] = np.asarray(bc)[:N].reshape(rows, cols).astype(np.float64)
        mode_lut = np.array([int(m) for m in _ALL_MODES_ORDER], np.int32)
        tx_lut = np.array([int(tt) for tt in p["tb"]["tx_set"]], np.int32)
        dec.modes[S] = mode_lut[bm]
        dec.tx_types[S] = tx_lut[bt]

    # ---- bottom-up partition DP (NONE vs SPLIT), costs include part bits
    sizes = sorted(cost.keys())
    best = cost[sizes[0]] + lam * rm.part_none_bits[_BSL[sizes[0]]]
    for S in sizes[1:]:
        r, c = cost[S].shape
        child = best
        ch = (child[0:2 * r:2, 0:2 * c:2] + child[0:2 * r:2, 1:2 * c:2]
              + child[1:2 * r:2, 0:2 * c:2] + child[1:2 * r:2, 1:2 * c:2])
        none_cost = cost[S] + lam * rm.part_none_bits[_BSL[S]]
        split_cost = ch + lam * rm.part_split_bits[_BSL[S]]
        dec.parts[S] = split_cost < none_cost
        best = np.minimum(none_cost, split_cost)
    return dec


