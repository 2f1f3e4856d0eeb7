from dcarl_tpu.utils import logging as logging
from dcarl_tpu.utils import checkpoint as checkpoint
from dcarl_tpu.utils import nan_guard as nan_guard
