"""Device-mesh sharding for multi-chip encode (the SRM/thread-array analog).

The reference scales with thread arrays over pictures (DP), segments/tiles
(SP), and a pipeline of stage kernels (enc_handle.c:2254-2316; SURVEY §2.3).
On TPU the same taxonomy maps to a 2D `jax.sharding.Mesh`:

  axis "frame" — picture-level parallelism (frames batched per step)
  axis "tile"  — tile/segment parallelism inside a frame

Dense per-block compute shards trivially along both axes (tiles are
independent by construction; frames are independent in all-intra / keyframe
bursts and pipelined otherwise). Cross-device reductions (rate-control
statistics, distortion totals) ride ICI via the collectives XLA inserts for
the sharded reduction — no hand-written NCCL analog, per the scaling-book
recipe: pick a mesh, annotate shardings, let XLA place collectives.
"""

from __future__ import annotations

import numpy as np


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
    """Place (F, T, ...) arrays with F over "frame" and T over "tile"."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("frame", "tile"))
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out[0] if len(out) == 1 else out


def sharded_frame_step(frames, preds, qstep: int = 32):
    """One jitted device step over sharded (F, T, B, 32, 32) tile batches:
    transform -> quantize -> reconstruct, plus the cross-device RC reduction
    (one ICI collective per step, like the IRC stage's frame statistics).

    This is the multi-chip compute skeleton the encoder's device tier grows
    into; the host pipeline feeds it per-frame tile batches."""
    import jax
    import jax.numpy as jnp

    from ..ops.txfm import forward_transform_2d, inverse_transform_add

    @jax.jit
    def step(frames, preds):
        shp = frames.shape
        resid = (frames - preds).reshape(-1, 32, 32)
        coeffs = forward_transform_2d(resid, 3, 0)
        q = (jnp.abs(coeffs) // qstep) * qstep * jnp.sign(coeffs)
        recon = inverse_transform_add(q.astype(jnp.int32),
                                      preds.reshape(-1, 32, 32), 3, 0, 8)
        bits_proxy = jnp.log1p(jnp.abs(q).astype(jnp.float32)).sum()
        sse = ((recon.reshape(shp) - frames) ** 2).astype(jnp.float32).sum(
            axis=tuple(range(1, frames.ndim)))
        return recon.reshape(shp), bits_proxy, sse

    return step(frames, preds)
