from . import mesh, sweep  # noqa: F401
