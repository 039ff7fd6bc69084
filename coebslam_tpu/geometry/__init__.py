from . import so3, se3, sim3, camera  # noqa: F401
