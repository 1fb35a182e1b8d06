from . import png, font, render  # noqa: F401
