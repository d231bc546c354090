"""Device-mesh sharding for multi-chip encode (the SRM/thread-array analog).

The reference scales with thread arrays over pictures (DP), segments/tiles
(SP), and a pipeline of stage kernels (enc_handle.c:2254-2316; SURVEY §2.3).
On TPU the same taxonomy maps to a 2D `jax.sharding.Mesh`:

  axis "frame" — picture-level parallelism (frames batched per step)
  axis "tile"  — tile/segment/block parallelism inside a frame

The unit of sharded work is the encoder's REAL device compute: the batched
intra RDO search (ops/intra_search.search_block_batch). Blocks are
independent by construction (open-loop refs), so sharding the block axis is
value-identical for any device count — the bitstream cannot depend on the
mesh (tests/test_multichip.py asserts equality for 1/2/8 devices).
Cross-device reductions (frame cost totals for rate control) ride ICI via
the collectives XLA inserts for the unsharded outputs — no hand-written
NCCL analog, per the scaling-book recipe: pick a mesh, annotate shardings,
let XLA place collectives.
"""

from __future__ import annotations

import numpy as np

# encoder-wide mesh, installed by set_encode_mesh(); consulted by
# codec/intra_rdo.search_intra_decisions for its device dispatch
_ENCODE_MESH = None


def set_encode_mesh(mesh) -> None:
    """Install (or clear, with None) the mesh the encoder shards over."""
    global _ENCODE_MESH
    _ENCODE_MESH = mesh


def get_encode_mesh():
    return _ENCODE_MESH


def encode_mesh(n_devices: int | None = None, frame_parallel: int | None = None):
    """Build the 2D (frame, tile) mesh over the first n devices."""
    import jax
    from jax.sharding import Mesh

    devices = np.array(jax.devices() if n_devices is None else jax.devices()[:n_devices])
    n = devices.size
    if frame_parallel is None:
        frame_parallel = 2 if n % 2 == 0 and n > 1 else 1
    assert n % frame_parallel == 0
    return Mesh(devices.reshape(frame_parallel, n // frame_parallel),
                axis_names=("frame", "tile"))


def shard_frame_batches(mesh, *arrays):
    """Place (F, N, ...) arrays with F over "frame" and N over "tile"."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("frame", "tile"))
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out[0] if len(out) == 1 else out


def shard_blocks(mesh, *arrays):
    """Shard (N, ...) block-batch arrays over every device (frame x tile
    flattened into one data axis). Pads N to the mesh size multiple; the
    caller slices results back to N."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.devices.size
    sharding = NamedSharding(mesh, P(("frame", "tile")))
    out = []
    for a in arrays:
        n = a.shape[0]
        pad = (-n) % n_dev
        if pad:
            a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])
        out.append(jax.device_put(a, sharding))
    return tuple(out)


def sharded_frame_step(mesh, frames, refs, qdc, qac, lam, tables, S: int,
                       n_tx: int = 1):
    """One multi-chip step of the encoder's actual device compute: the
    per-depth intra RDO search batched over frames (DP axis) and blocks
    (SP/tile axis), plus the cross-device frame-cost reduction the rate
    controller consumes (one ICI collective per step).

    frames: (F, N, S, S) f32 source blocks, F over "frame", N over "tile"
    refs:   (F, N, L) f32 reference vectors
    qdc/qac: (F, N) f32 per-block quantizer steps
    tables: dict of replicated search tables (from intra_rdo table setup)

    Returns (modes (F,N), tx (F,N), cost (F,N), frame_cost (F,)).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops.intra_search import search_block_batch

    frames, refs = shard_frame_batches(mesh, frames, refs)
    qdc, qac = shard_frame_batches(mesh, qdc, qac)

    def one_frame(fb, rb, qd, qa):
        bm, bt, bc, _ = search_block_batch(
            fb, rb, qd, qa, lam, tables["G"], tables["scan2d"],
            tables["scans_tx"], tables["tvs"], tables["ths"],
            tables["level_bits"], tables["eob_bits"], tables["txb_skip"],
            tables["y_mode_bits"], tables["ext_tx_bits"], tables["qm_w"],
            tables["dist_w"], tables["tx_lam_scale"], S=S, n_tx=n_tx)
        return bm, bt, bc

    @jax.jit
    def step(frames, refs, qdc, qac):
        bm, bt, bc = jax.vmap(one_frame)(frames, refs, qdc, qac)
        # the IRC-stage analog: per-frame cost totals (psum over "tile")
        frame_cost = jnp.sum(bc, axis=1)
        return bm, bt, bc, frame_cost

    return step(frames, refs, qdc, qac)
