from . import frame, map as map_arena, tracking  # noqa: F401
