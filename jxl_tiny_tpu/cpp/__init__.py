from .build import get_lib, have_native  # noqa: F401
