from dcarl_tpu.parallel import mesh as mesh
from dcarl_tpu.parallel import sharded_store as sharded_store
from dcarl_tpu.parallel import normalize as normalize
from dcarl_tpu.parallel import distributed as distributed
from dcarl_tpu.parallel import vec_env as vec_env
