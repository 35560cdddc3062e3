from tensorrt_llm_tpu.quantization.mode import QuantAlgo, KvCacheQuantAlgo, QuantConfig  # noqa: F401
from tensorrt_llm_tpu.quantization.quantize import (  # noqa: F401
    quantize_w4,
    quantize_w8,
    pack_w4,
    unpack_w4,
    dequantize_w4,
    dequantize_w4_any,
    pack_w4_tiled,
    unpack_w4_tiled,
    choose_block_n,
    pack_group_for,
)
