from tensorrt_llm_tpu.ops.w4a16_gemm import (  # noqa: F401
    w4a16_matmul,
    w4a16_matmul_xla,
)
