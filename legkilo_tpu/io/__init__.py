from . import dataset, tum  # noqa: F401
