from . import yolov5, detector  # noqa: F401
