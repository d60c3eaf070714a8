from .bit_writer import BitWriter  # noqa: F401
from .bit_reader import BitReader  # noqa: F401
