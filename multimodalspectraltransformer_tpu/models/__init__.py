from . import layers, mmt  # noqa: F401
