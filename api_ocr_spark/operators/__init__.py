from . import modes, pipeline  # noqa: F401
