from dcarl_tpu.core import confidence as confidence
