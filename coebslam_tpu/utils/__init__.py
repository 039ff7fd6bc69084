from . import synthetic, metrics  # noqa: F401
