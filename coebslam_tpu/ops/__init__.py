from . import (  # noqa: F401
    pyramid,
    fast,
    grid_select,
    patches,
    brief,
    matching,
    extractor,
)
