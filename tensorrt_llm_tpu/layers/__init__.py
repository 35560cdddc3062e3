from tensorrt_llm_tpu.layers.linear import (  # noqa: F401
    Linear,
    LinearMethodBase,
    UnquantizedLinearMethod,
    W4A16LinearMethod,
    W8A16LinearMethod,
    make_linear_method,
)
from tensorrt_llm_tpu.layers.embedding import Embedding  # noqa: F401
from tensorrt_llm_tpu.layers.mlp import GatedMLP  # noqa: F401
from tensorrt_llm_tpu.layers.attention import Attention  # noqa: F401
