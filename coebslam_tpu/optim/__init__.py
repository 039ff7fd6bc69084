from . import pose_gn  # noqa: F401
