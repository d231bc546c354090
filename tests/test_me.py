"""Motion estimation tests: recover synthetic translations."""

import numpy as np

from svt_av1_psy_tpu.codec.me import MotionEstimator


def _textured(H, W, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.normal(0, 30, (H // 8, W // 8))
    img = np.kron(base, np.ones((8, 8)))
    img += rng.normal(0, 6, (H, W))
    return (img + 128).clip(0, 255).astype(np.uint8)


def test_fullpel_shift_recovered():
    ref = _textured(256, 256)
    for (sy, sx) in ((3, -5), (-10, 7), (0, 12)):
        cur = np.roll(np.roll(ref, sy, axis=0), sx, axis=1)
        me = MotionEstimator(ref)
        r = me.search_block(cur, 96, 96, 64, 64, subpel=False)
        assert r.mv == (-sy * 8, -sx * 8), r.mv
        assert r.sad == 0


def test_subpel_shift_recovered():
    # construct a half-pel shifted current using the codec's own MC filter
    from svt_av1_psy_tpu.codec.convolve import convolve_2d_sr

    ref = _textured(256, 256, 1)
    me = MotionEstimator(ref)
    x0 = y0 = 96
    w = h = 32
    patch = ref[y0 - 3 : y0 + h + 4, x0 - 3 : x0 + w + 4].astype(np.int32)
    shifted = convolve_2d_sr(patch[None], w, h, 8, 8)[0]  # (+0.5, +0.5) pel
    cur = ref.copy()
    cur[y0 : y0 + h, x0 : x0 + w] = shifted.astype(np.uint8)
    r = me.search_block(cur, x0, y0, w, h, subpel=True)
    assert r.mv == (4, 4), r.mv  # 0.5 pel in 1/8-pel units
    assert r.sad == 0


def test_hme_long_range():
    ref = _textured(512, 512, 2)
    cur = np.roll(ref, 40, axis=1)  # 40-px horizontal motion
    me = MotionEstimator(ref, search_range=64)
    r = me.search_block(cur, 192, 192, 64, 64, subpel=False)
    assert r.mv == (0, -40 * 8), r.mv
