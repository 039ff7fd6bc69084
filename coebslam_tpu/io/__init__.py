from . import tum, trajectory  # noqa: F401
