from dcarl_tpu.planning import predictor as predictor
from dcarl_tpu.planning import werling as werling
from dcarl_tpu.planning import local_trajectory as local_trajectory
