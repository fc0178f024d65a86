from . import so3, state, eskf  # noqa: F401
