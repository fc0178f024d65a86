from . import eig3x3  # noqa: F401
