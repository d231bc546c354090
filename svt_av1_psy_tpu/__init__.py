"""svt-av1-psy-tpu: a TPU-native AV1 encoder with SVT-AV1-PSY capabilities.

This is a ground-up JAX/XLA/Pallas re-design of the capabilities of
psy-ex/svt-av1-psy (reference: /root/reference, C99 + x86 SIMD), NOT a port:

- Dense pixel work (the reference's L1 DSP layer, `Source/Lib/C_DEFAULT` +
  `Source/Lib/ASM_*`) runs as batched XLA/Pallas kernels over superblock
  tensors resident in HBM.
- Control state (GoP structure, rate control, reference management — the
  reference's 13 SRM-connected processes, `Source/Lib/Codec/*_process.c`)
  runs as a host-side pipeline issuing large per-frame device launches.
- Entropy coding (inherently serial per tile) runs on the host
  (numpy fast path + C++ native module), fed by device-computed symbols.

Public API mirrors `Source/API/EbSvtAv1Enc.h`:
  Encoder          ~ svt_av1_enc_init_handle / set_parameter / init
  Encoder.send_picture / get_packet / get_recon / stream_header / deinit
  EncoderConfig    ~ EbSvtAv1EncConfiguration
  parse_parameter  ~ svt_av1_enc_parse_parameter
"""

from .version import __version__, psy_version
from .config import EncoderConfig, parse_parameter, verify_settings
from .errors import SvtAv1Error, ErrorCode

__all__ = [
    "__version__",
    "psy_version",
    "EncoderConfig",
    "parse_parameter",
    "verify_settings",
    "SvtAv1Error",
    "ErrorCode",
    "Encoder",
]


def __getattr__(name):
    # Lazy import: the Encoder pulls in JAX; config-only users shouldn't pay.
    if name == "Encoder":
        from .api import Encoder

        return Encoder
    raise AttributeError(name)
