from .rate_control import RateControl, bits_per_mb, find_qindex_by_rate  # noqa: F401
