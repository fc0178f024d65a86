from . import sim, unitree  # noqa: F401
