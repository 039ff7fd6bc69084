from . import frame, map as map_arena, tracking, local_mapping, dynamic, system  # noqa: F401
