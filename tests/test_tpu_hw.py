"""Opt-in real-hardware conformance test (run with `-m tpu`).

The suite pins JAX to a virtual CPU mesh (conftest.py), so the accelerator
numerics path is normally exercised only by bench.py.  This test encodes a
clip in a subprocess WITHOUT the pin — device intra search, device inter
search and the device residual commit all run on the attached accelerator —
and asserts the bitstream is byte-identical to the host path and bit-exact
under dav1d.  SURVEY §4: the reference's conformance strategy applied to
the real device tier.
"""

import os
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.tpu

_DRIVER = textwrap.dedent("""
    import sys
    sys.path.insert(0, %(repo)r)
    import numpy as np
    import jax
    kinds = {d.platform for d in jax.devices()}
    if kinds == {"cpu"}:
        print("SKIP no accelerator")
        sys.exit(0)

    from svt_av1_psy_tpu.api import Encoder
    from svt_av1_psy_tpu.config import EncoderConfig

    rng = np.random.default_rng(3)
    W, H, n = 176, 144, 4
    base = (np.cumsum(rng.normal(0, 4, (H, W + 4 * n)), axis=1) + 128).clip(0, 255)
    frames = [np.clip(base[:, i * 2 : i * 2 + W]
                      + rng.normal(0, 3, (H, W)), 0, 255).astype(np.uint8)
              for i in range(n)]
    u = np.full((H // 2, W // 2), 122, np.uint8)

    def encode(**kw):
        cfg = EncoderConfig(width=W, height=H, preset=10, recon_enabled=True,
                            **kw)
        cfg.qp = 40
        enc = Encoder(cfg).init()
        for i, y in enumerate(frames):
            enc.send_picture(y, u, u.copy(), pts=i)
        enc.flush()
        pkts = []
        while (p := enc.get_packet()) is not None:
            pkts.append(p)
        return b"".join(p.data for p in pkts), pkts

    # 1. device residual commit must be byte-identical to the host commit
    #    (same mode decisions: pin the ME backend to native for both)
    bs_dev, _ = encode(commit_backend="device", inter_me_backend="native")
    bs_host, _ = encode(commit_backend="host", inter_me_backend="native")
    assert bs_dev == bs_host, "device-commit bitstream differs from host"

    # 2. device inter mode decision is a different (batched) search — not
    #    decision-identical, but its stream must be conformant: dav1d
    #    decode bit-exact vs the encoder's own recon
    bs_me, pk_me = encode(commit_backend="device", inter_me_backend="device")
    from svt_av1_psy_tpu.io import dav1d
    recons = [p.recon for p in pk_me if p.recon is not None]
    for i in range(len(recons)):
        dy, du, dv = dav1d.decode_nth(bs_me, i, W, H)
        assert np.array_equal(dy, recons[i][0]), f"frame {i} luma"
        assert np.array_equal(du, recons[i][1]), f"frame {i} U"
        assert np.array_equal(dv, recons[i][2]), f"frame {i} V"
    print("OK")
""")


def test_device_numerics_bit_exact():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME", "XLA_FLAGS")}
    out = subprocess.run([sys.executable, "-c", _DRIVER % {"repo": repo}],
                         capture_output=True, text=True, env=env,
                         timeout=3600)
    assert out.returncode == 0, out.stderr[-4000:]
    if "SKIP" in out.stdout:
        pytest.skip("no accelerator attached")
    assert "OK" in out.stdout, out.stdout
