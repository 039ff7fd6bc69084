from . import ate, rpe  # noqa: F401
