from . import errors, profiling, progress  # noqa: F401
