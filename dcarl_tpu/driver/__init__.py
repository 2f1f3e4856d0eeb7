"""Vehicle driver protocol layer (host-side).

Typed equivalents of the reference's vendor message packs
(software/src/driver/messages/*: xpmotors CAN, novatel GNSS,
continental/srr/us radar) plus the binary codecs the ROS drivers left
to vendor hardware: CAN frame bit-packing, GPCHC sentence parsing, and
radar-array ingestion into the cognition layer's array format.

Nothing here touches the TPU — this is the host edge of the stack; the
arrays it produces feed ``dcarl_tpu.cognition`` / ``dcarl_tpu.ops``.
"""

from dcarl_tpu.driver.messages import (AutoCtlReq, AutoState, AutoStateEx,
                                       EPSStatus, ESCStatus, GpChc, Header,
                                       InsPva, RadarObs)
from dcarl_tpu.driver.can_codec import (CAN_IDS, decode_frame, encode_frame)
from dcarl_tpu.driver.gnss import (geodetic_to_enu, gpchc_sentence,
                                   parse_gpchc, pose_from_inspva)
from dcarl_tpu.driver.radar import radar_to_tracked_arrays

__all__ = [
    "AutoCtlReq", "AutoState", "AutoStateEx", "EPSStatus", "ESCStatus",
    "GpChc", "Header", "InsPva", "RadarObs", "CAN_IDS", "decode_frame",
    "encode_frame", "geodetic_to_enu", "gpchc_sentence", "parse_gpchc",
    "pose_from_inspva", "radar_to_tracked_arrays",
]
