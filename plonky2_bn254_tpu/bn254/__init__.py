from . import oracle, params  # noqa: F401
