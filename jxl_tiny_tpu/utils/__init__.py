from .profiling import StageTimer, profile_trace, encode_report  # noqa: F401
from .debug import debug_mode  # noqa: F401
