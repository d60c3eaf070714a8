"""Typed error hierarchy — the host-side role of the reference's Status
bool-wrapper and JXL_FAILURE macros (base/status.h:145-244). Device-side
code never aborts (XLA programs are total; invalid lanes are masked);
failures surface at the host boundary as these exceptions."""


class JxlTinyError(Exception):
    """Base class for encoder errors."""


class InvalidInputError(JxlTinyError):
    """Bad user input: malformed PFM, invalid distance, wrong shape."""


class CapacityError(JxlTinyError):
    """A static device buffer bound was exceeded (callers bucket up/retry)."""


class BackendError(JxlTinyError):
    """Device/runtime failure (retryable at the batch-driver level)."""


class DecodeError(JxlTinyError):
    """Malformed or truncated codestream (verification decoder). Every
    defect a bitstream mutation can introduce surfaces as this type —
    over-reads, nonzero padding, wrong section sizes, bad field values
    (tests/test_fuzz_decode.py)."""
