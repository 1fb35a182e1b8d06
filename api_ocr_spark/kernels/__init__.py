from . import enhance, detection, checkbox  # noqa: F401
