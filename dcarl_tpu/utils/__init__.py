from dcarl_tpu.utils import logging as logging
from dcarl_tpu.utils import checkpoint as checkpoint
from dcarl_tpu.utils import nan_guard as nan_guard
from dcarl_tpu.utils import monitor as monitor
from dcarl_tpu.utils import field_analysis as field_analysis
from dcarl_tpu.utils import visualize as visualize
