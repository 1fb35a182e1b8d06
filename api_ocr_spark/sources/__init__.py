from . import tables, interleave  # noqa: F401
