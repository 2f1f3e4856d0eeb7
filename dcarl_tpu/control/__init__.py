from dcarl_tpu.control import controller as controller
from dcarl_tpu.control import calibration as calibration
