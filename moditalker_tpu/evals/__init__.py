from . import fvd, i3d, metrics  # noqa: F401
