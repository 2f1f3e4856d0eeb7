from dcarl_tpu.control import controller as controller
