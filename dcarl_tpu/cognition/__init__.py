"""Cognition layer — world-model construction.

TPU-native re-design of the reference's cognition stack
(software/src/cognition/object_locator/): NearestLocator /
DrivingSpaceConstructor build a ``MapState`` from the static map +
tracked objects + ego pose at 20 Hz per vehicle; here the same
construction is a pure batched function over [K] tracked objects x
[L] lanes, running for thousands of envs per chip under one jit.
"""

from dcarl_tpu.cognition.locator import (StaticLocalMap, TrackedObjects,
                                         EgoPose, MapModel, LightSignal,
                                         StopState, TrafficLightDetection,
                                         locate_objects_in_lane,
                                         locate_traffic_lights_in_lanes,
                                         update_map_state)
from dcarl_tpu.cognition.path_buffer import PathBufferState, path_buffer_init, path_buffer_update
from dcarl_tpu.cognition.drivable import dynamic_boundary

__all__ = [
    "StaticLocalMap", "TrackedObjects", "EgoPose", "MapModel",
    "locate_objects_in_lane", "update_map_state",
    "PathBufferState", "path_buffer_init", "path_buffer_update",
    "dynamic_boundary",
]
