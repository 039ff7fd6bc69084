from . import tum, trajectory, checkpoint  # noqa: F401
