from . import timer, logging, serialization, profiler  # noqa: F401
