from . import engine, association, postprocess  # noqa: F401
