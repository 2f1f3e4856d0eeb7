from dcarl_tpu.env import scenario as scenario
from dcarl_tpu.env import driving_env as driving_env
