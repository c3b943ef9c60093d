from . import config, vocab  # noqa: F401
