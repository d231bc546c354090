"""Device-tier filter kernels must be bit-exact vs the host (numpy) tier."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from svt_av1_psy_tpu.codec.cdef import CDEF_VERY_LARGE, adjust_strength
from svt_av1_psy_tpu.codec.cdef import filter_blocks as cdef_host
from svt_av1_psy_tpu.codec.convolve import convolve_2d_sr as conv_host
from svt_av1_psy_tpu.codec.restoration import wiener_filter_block as wiener_host
from svt_av1_psy_tpu.ops.filters import (cdef_filter_blocks, convolve_2d_sr,
                                         wiener_filter_block)


def test_cdef_device_matches_host():
    rng = np.random.default_rng(0)
    N = 12
    nb = rng.integers(0, 256, (N, 12, 12)).astype(np.int32)
    nb[0, :2, :] = CDEF_VERY_LARGE          # unavailable border case
    dirs = rng.integers(0, 8, N).astype(np.int32)
    var = rng.integers(0, 4000, N).astype(np.int64)
    for pri, sec in ((4, 2), (2, 0), (0, 2)):
        pstr = adjust_strength(pri, var).astype(np.int32) if pri else np.zeros(N, np.int32)
        host = cdef_host(nb, dirs, pstr, sec, 5, 5, 8, 8, 8)
        dev = np.asarray(cdef_filter_blocks(nb, dirs, pstr, sec, 5, 5, 8, 8, 8))
        assert np.array_equal(host, dev), (pri, sec)


@pytest.mark.parametrize("bd", [8, 10])
def test_convolve_device_matches_host(bd):
    rng = np.random.default_rng(1)
    peak = (1 << bd) - 1
    B, w, h = 6, 16, 8
    patches = rng.integers(0, peak + 1, (B, h + 7, w + 7)).astype(np.int32)
    for sx, sy in ((0, 0), (6, 0), (0, 10), (6, 10), (15, 15)):
        host = conv_host(patches, w, h, sx, sy, bd=bd)
        dev = np.asarray(convolve_2d_sr(patches, w, h, sx, sy, bd=bd))
        assert np.array_equal(host, dev), (sx, sy, bd)


def test_wiener_device_matches_host():
    rng = np.random.default_rng(2)
    src = rng.integers(0, 256, (38, 70)).astype(np.int64)
    for taps in ((3, -7, 15), (-5, 8, 40), (10, -23, -17)):
        host = wiener_host(src, 64, 32, taps, (1, -2, 20))
        dev = np.asarray(wiener_filter_block(src, 64, 32, taps, (1, -2, 20)))
        assert np.array_equal(host, dev), taps


def test_device_kernels_shard_over_mesh():
    """The batched shapes shard over the tile axis without reshaping."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from svt_av1_psy_tpu.parallel import encode_mesh

    n = min(8, len(jax.devices()))
    mesh = encode_mesh(n, frame_parallel=1)
    rng = np.random.default_rng(3)
    N = mesh.devices.size * 4
    nb = rng.integers(0, 256, (N, 12, 12)).astype(np.int32)
    dirs = rng.integers(0, 8, N).astype(np.int32)
    pstr = rng.integers(0, 16, N).astype(np.int32)
    sharded = jax.device_put(jnp.asarray(nb), NamedSharding(mesh, P("tile")))
    out = cdef_filter_blocks(sharded, jnp.asarray(dirs), jnp.asarray(pstr),
                             2, 5, 5, 8, 8, 8)
    host = cdef_host(nb, dirs, pstr, 2, 5, 5, 8, 8, 8)
    assert np.array_equal(np.asarray(out), host)


def test_device_filters_backend_bit_exact_stream():
    """filters-backend=device routes the frame CDEF apply through
    ops/filters (cdef_process.c:446 as one batched kernel); the stream
    must be byte-identical to the host backend's."""
    import numpy as np

    from svt_av1_psy_tpu.api import Encoder
    from svt_av1_psy_tpu.config import EncoderConfig

    rng = np.random.default_rng(21)
    W, H, n = 160, 96, 4
    base = (np.cumsum(rng.normal(0, 5, (H + 32, W + 32)), axis=1)
            + 128).clip(0, 255).astype(np.uint8)
    frames = [base[i : i + H, 2 * i : 2 * i + W].copy() for i in range(n)]
    u = np.full((H // 2, W // 2), 118, np.uint8)

    def run(backend):
        cfg = EncoderConfig(width=W, height=H, preset=6)
        cfg.qp = 45
        cfg.filters_backend = backend
        enc = Encoder(cfg).init()
        stream = b""
        for f in frames:
            enc.send_picture(f, u, u.copy())
            while (p := enc.get_packet()) is not None:
                stream += p.data
        enc.flush()
        while (p := enc.get_packet()) is not None:
            stream += p.data
        return stream

    assert run("host") == run("device")
