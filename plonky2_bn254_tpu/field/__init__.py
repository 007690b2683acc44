from . import goldilocks, extension, ntt  # noqa: F401
