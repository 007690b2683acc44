from . import mesh, ntt  # noqa: F401
