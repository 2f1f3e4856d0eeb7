from dcarl_tpu.data import datasets as datasets
from dcarl_tpu.data import sampling as sampling
