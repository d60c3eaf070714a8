from .pfm import read_pfm, write_pfm  # noqa: F401
