from . import clip, matching, qformer  # noqa: F401
