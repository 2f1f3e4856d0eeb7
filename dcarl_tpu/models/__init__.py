from dcarl_tpu.models import networks as networks
from dcarl_tpu.models import replay as replay
from dcarl_tpu.models import dqn as dqn
from dcarl_tpu.models import trustset as trustset
