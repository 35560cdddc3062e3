from tensorrt_llm_tpu.parallel.mapping import Mapping  # noqa: F401
from tensorrt_llm_tpu.parallel.mesh import make_mesh  # noqa: F401
from tensorrt_llm_tpu.parallel.ops import (  # noqa: F401
    tp_all_reduce,
    tp_all_gather,
    tp_reduce_scatter,
)
