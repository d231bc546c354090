"""SVT_LOG-analog logging, stream-info API, CLI progress/color-help
(SURVEY §5 metrics/logging/observability rows; svt_log.c,
EbSvtAv1Enc.h:1153, PSY progress mode 3)."""

import numpy as np

from svt_av1_psy_tpu.api import Encoder
from svt_av1_psy_tpu.config import EncoderConfig


def test_log_levels(capsys, monkeypatch):
    from svt_av1_psy_tpu import log

    log.set_level(log.SVT_LOG_WARN)
    log.svt_info("hidden %d", 1)
    log.svt_warn("shown %d", 2)
    err = capsys.readouterr().err
    assert "hidden" not in err and "Svt[WARN]: shown 2" in err
    log.set_level(log.SVT_LOG_INFO)


def test_stream_info():
    enc = Encoder(EncoderConfig(look_ahead_distance=0, width=64, height=64)).init()
    y = np.full((64, 64), 128, np.uint8)
    u = np.full((32, 32), 128, np.uint8)
    enc.send_picture(y, u, u.copy())
    enc.get_packet()
    info = enc.get_stream_info()
    assert info["frames_encoded"] == 1 and info["bytes_written"] > 0
    assert enc.get_stream_info(Encoder.STREAM_INFO_FIRST_PASS_STATS_OUT) is None
    enc1 = Encoder(EncoderConfig(width=64, height=64, pass_num=1)).init()
    enc1.send_picture(y, u, u.copy())
    stats = enc1.get_stream_info(Encoder.STREAM_INFO_FIRST_PASS_STATS_OUT)
    assert stats and stats.startswith(b"svt-av1-psy-tpu-stats")


def test_cli_color_help(capsys):
    from svt_av1_psy_tpu.app.cli import main

    assert main(["--color-help"]) == 0
    out = capsys.readouterr().out
    assert "--crf" in out and "[psy]" in out


def test_t35_metadata_attach():
    """Per-frame ITU-T T.35 metadata (DV RPU / HDR10+) lands as a
    METADATA OBU in the right temporal unit and the stream still decodes
    (dav1d ignores unknown T35)."""
    from svt_av1_psy_tpu.codec.metadata import dv_rpu_t35
    from svt_av1_psy_tpu.io import dav1d

    from svt_av1_psy_tpu.config import PredStructure

    enc = Encoder(EncoderConfig(look_ahead_distance=0, width=64, height=64, recon_enabled=True,
                                pred_structure=PredStructure.LOW_DELAY)).init()
    y = np.full((64, 64), 128, np.uint8)
    u = np.full((32, 32), 128, np.uint8)
    t35 = dv_rpu_t35(b"\x19\x08RPUDATA")
    enc.add_metadata(1, t35)
    pkts = []
    for i in range(2):
        enc.send_picture(y, u, u.copy(), pts=i)
        pkts.append(enc.get_packet())
    assert t35 not in pkts[0].data
    assert t35 in pkts[1].data
    if dav1d.available():
        stream = b"".join(p.data for p in pkts)
        dy, _, _ = dav1d.decode_nth(stream, 1, 64, 64)
        assert np.array_equal(dy, pkts[1].recon[0])


def test_cli_config_file(tmp_path):
    """-c/--config file parsing (app_config.c:1413): token:value lines."""
    import numpy as np

    from svt_av1_psy_tpu.app.cli import main

    y4m = tmp_path / "in.y4m"
    y = np.full((64, 64), 128, np.uint8)
    u = np.full((32, 32), 128, np.uint8)
    with open(y4m, "wb") as f:
        f.write(b"YUV4MPEG2 W64 H64 F25:1 Ip A1:1 C420jpeg\n")
        f.write(b"FRAME\n" + y.tobytes() + u.tobytes() + u.tobytes())
    cfgf = tmp_path / "enc.cfg"
    cfgf.write_text("# comment\ncrf : 40\npreset : 9\n")
    out = tmp_path / "out.ivf"
    rc = main(["-i", str(y4m), "-b", str(out), "-c", str(cfgf)])
    assert rc == 0 and out.stat().st_size > 0
