"""Version info (reference: svt_psy_get_version, Source/API/EbSvtAv1Enc.h:1055)."""

__version__ = "0.1.0"

# Encoder ("psy") version string exposed like svt_psy_get_version().
_PSY_VERSION = "tpu-0.1.0"


def psy_version() -> str:
    return _PSY_VERSION
