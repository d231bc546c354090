"""psy-rd metric tests (psy_rd.c parity properties) + conformance with it on."""

import numpy as np
import pytest

from svt_av1_psy_tpu.psy.psy_rd import (psy_distortion, psy_full_dist,
                                        sa8d_blocks, satd4_blocks)


def test_sa8d_basics():
    z = np.zeros((1, 8, 8), np.int64)
    assert sa8d_blocks(z)[0] == 0
    # DC block: Hadamard puts all energy in coefficient (0,0) = 64*v
    dc = np.full((1, 8, 8), 3, np.int64)
    assert sa8d_blocks(dc)[0] == (64 * 3 + 2) >> 2
    # SA8D >= SAD/4-ish for any block (energy inequality on Hadamard basis)
    rng = np.random.default_rng(0)
    b = rng.integers(-100, 100, (32, 8, 8))
    assert (sa8d_blocks(b) * 4 + 2 >= np.abs(b).sum(axis=(1, 2))).all()


def test_satd4_basics():
    dc = np.full((1, 4, 4), 5, np.int64)
    assert satd4_blocks(dc)[0] == (16 * 5) >> 1


def test_psy_distortion_zero_for_identical():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    assert psy_distortion(x, x) == 0
    # blurred recon loses energy -> positive distortion
    blur = x.astype(np.int64)
    blur = (blur + np.roll(blur, 1, 0) + np.roll(blur, 1, 1) + np.roll(blur, 1, (0, 1))) // 4
    assert psy_distortion(x, blur.astype(np.uint8)) > 0


def test_psy_full_dist_scaling():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    b = np.full((16, 16), int(a.mean()), np.uint8)
    d1 = psy_full_dist(a, b, 1.0)
    d2 = psy_full_dist(a, b, 2.0)
    assert d2 == 2 * d1 > 0
    assert psy_full_dist(a, b, 0.0) == 0


def test_thin_blocks_use_satd4():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (4, 16)).astype(np.uint8)
    assert psy_distortion(a, np.zeros_like(a)) >= 0  # exercises the 4x4 path


@pytest.mark.skipif(
    not __import__("svt_av1_psy_tpu.io.dav1d", fromlist=["available"]).available(),
    reason="dav1d shim unavailable")
def test_psy_rd_stream_conformant_and_effective():
    from svt_av1_psy_tpu.api import Encoder
    from svt_av1_psy_tpu.config import EncoderConfig
    from svt_av1_psy_tpu.io import dav1d

    W, H = 120, 88
    rng = np.random.default_rng(7)
    base = (np.cumsum(rng.normal(0, 6, (H + 32, W + 32)), axis=1) + 128).clip(0, 255).astype(np.uint8)

    def encode(strength):
        cfg = EncoderConfig(width=W, height=H, recon_enabled=True, psy_rd=strength)
        cfg.qp = 45
        enc = Encoder(cfg).init()
        for i in range(2):
            y = base[2 * i : 2 * i + H, 3 * i : 3 * i + W].copy()
            u = np.full((H // 2, W // 2), 115, np.uint8)
            enc.send_picture(y, u, u.copy())
        enc.flush()
        stream = b""
        recons = []
        while (pkt := enc.get_packet()) is not None:
            stream += pkt.data
            if pkt.recon is not None:
                recons.append(pkt.recon)
        return stream, recons

    s_on, recons = encode(2.0)
    for i in range(2):
        dy, du, dv = dav1d.decode_nth(s_on, i, W, H)
        assert np.array_equal(dy, recons[i][0]) and np.array_equal(du, recons[i][1])


def test_psy_rd_flips_mode_decision():
    """A textured block where psy-rd must prefer the energy-preserving
    candidate over the lower-SSE flat one."""
    rng = np.random.default_rng(9)
    src = (128 + 8 * np.sign(rng.normal(size=(16, 16)))).astype(np.uint8)
    flat = np.full((16, 16), 128, np.uint8)            # lower SSE, zero energy
    textured = (src.astype(np.int64) + 9).astype(np.uint8)  # energy-exact, +SSE
    sse_flat = int(np.sum((src.astype(np.int64) - flat) ** 2))
    sse_tex = int(np.sum((src.astype(np.int64) - textured) ** 2))
    assert sse_flat < sse_tex  # plain SSE picks the blurry candidate
    s = 4.0
    cost_flat = sse_flat + psy_full_dist(src, flat, s)
    cost_tex = sse_tex + psy_full_dist(src, textured, s)
    assert cost_tex < cost_flat  # psy-rd flips the decision


def test_noise_normalize_revives_flat_block():
    from svt_av1_psy_tpu.codec.quant import (build_plane_quant, noise_normalize,
                                             quantize_b)
    from svt_av1_psy_tpu.codec.spec_tables import get_tables

    t = get_tables()
    pq = build_plane_quant(200, 0, 0, 8, 0, 200)
    scan = t.scan(1, 0)  # TX_8X8 DCT
    coeffs = np.zeros((1, 64), np.int64)
    coeffs[0, 0] = 4000
    coeffs[0, 1] = int(pq.dequant[1] * 0.6)  # quantizes to zero
    qc, dqc, eob = quantize_b(coeffs.copy(), scan, pq, 1)
    assert int(eob[0]) == 1 and qc[0, 1] == 0
    e2 = noise_normalize(coeffs[0], qc[0], dqc[0], int(eob[0]), scan, pq, 1, 4)
    assert e2 == 2 and qc[0, 1] == 1 and dqc[0, 1] > 0
    # strength 0 is a no-op
    qc2, dqc2, eob2 = quantize_b(coeffs.copy(), scan, pq, 1)
    assert noise_normalize(coeffs[0], qc2[0], dqc2[0], int(eob2[0]), scan,
                           pq, 1, 0) == 1
