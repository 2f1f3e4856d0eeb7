from dcarl_tpu.ops import geometry as geometry
from dcarl_tpu.ops import spline as spline
from dcarl_tpu.ops import polynomial as polynomial
from dcarl_tpu.ops import kinematics as kinematics
from dcarl_tpu.ops import motion_models as motion_models
