"""Navigation layer — static map provision.

TPU-native re-design of the reference's map providers
(software/src/navigation/map_provider/): recorded loop polylines are
windowed around the ego into fixed-shape local maps that the cognition
layer consumes.
"""

from dcarl_tpu.navigation.map_provider import (LoopMap, load_loop_map,
                                               synthetic_loop_map,
                                               window_static_map)

__all__ = ["LoopMap", "load_loop_map", "synthetic_loop_map",
           "window_static_map"]
from dcarl_tpu.navigation import route as route
