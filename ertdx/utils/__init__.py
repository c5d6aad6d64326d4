from . import checkpoint, logging, profiling  # noqa: F401
